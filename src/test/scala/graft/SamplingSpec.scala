package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  test("hash sampling is deterministic and monotone in the rate") {
    val low = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    val high = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high), "raising the rate must only ADD documents")
    val again = Sampling.stratifiedSample(docs.repartition(7), "doc_id", "lang",
      Map.empty, defaultRate = 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == low, "sample must not depend on partitioning")
    // rate is approximately honored
    val n = docs.count().toDouble
    assert(math.abs(low.size / n - 0.2) < 0.08, s"${low.size} of $n at rate 0.2")
  }

  test("per-stratum rates apply to the right strata") {
    val s = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0)
    val langs = s.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.sameElements(Array("en")))
    assert(s.count() == docs.filter(col("lang") === "en").count())
  }

  test("mix plan derives capped rates; sampling honors them") {
    import SparkSpec.spark.implicits._
    // planted strata with known token totals: "big" has 4000 tokens,
    // "small" 400, "other" gets no weight
    val rows = (1L to 40L).map(i => (i, "big", 100L)) ++
      (41L to 50L).map(i => (i, "small", 40L)) ++
      (51L to 60L).map(i => (i, "other", 50L))
    val df = rows.toDF("doc_id", "source", "est_tokens")
    // budget 2000, weights: big 0.5 (target 1000 < 4000 -> rate .25),
    // small 0.5 (target 1000 > 400 -> capped at 1)
    val plan = Sampling.mixPlan(df, "source", "est_tokens",
      Map("big" -> 0.5, "small" -> 0.5), 2000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(plan("big") == ((4000L, 1000.0, 0.25)))
    assert(plan("small") == ((400L, 1000.0, 1.0)),
      "an oversubscribed stratum must cap at one full epoch")
    assert(plan("other")._3 == 0.0)
    val kept = Sampling.mixSample(df, "doc_id", "source", "est_tokens",
      Map("big" -> 0.5, "small" -> 0.5), 2000L)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // rate-1 stratum keeps everything; weight-0 stratum drops out
    assert(kept.count(_._2 == "small") == 10)
    assert(!kept.exists(_._2 == "other"))
    // the kept "big" subset is exactly the hash-bucket filter at .25
    val expectBig = Sampling.stratifiedSample(
      df.filter(col("source") === "big"), "doc_id", "source",
      Map.empty, defaultRate = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.filter(_._2 == "big").map(_._1).toSet == expectBig)
    // budget monotonicity: a bigger budget only ADDS documents
    val keptMore = Sampling.mixSample(df, "doc_id", "source",
      "est_tokens", Map("big" -> 0.5, "small" -> 0.5), 4000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.map(_._1).toSet.subsetOf(keptMore),
      "raising the budget must never churn the selected corpus")
  }

  test("epoch upsampling repeats whole epochs plus a hash fraction") {
    import SparkSpec.spark.implicits._
    // "hot": 10 docs x 100 tokens; weight 1.0 x budget 2500 -> 2.5
    // epochs. "cold": no weight -> dropped.
    val df = ((1L to 10L).map(i => (i, "hot", 100L)) ++
      (11L to 20L).map(i => (i, "cold", 100L)))
      .toDF("doc_id", "source", "est_tokens")
    // join key (source) leads the joined output's column order
    val out = Sampling.mixEpochs(df, "doc_id", "source", "est_tokens",
      Map("hot" -> 1.0), 2500L)
      .collect().map(r => (r.getLong(1), r.getString(0), r.getLong(4)))
    assert(out.forall(_._2 == "hot"), "unweighted strata drop out")
    assert(out.forall(c => c._3 == 2L || c._3 == 3L),
      "2.5 epochs = 2 or 3 copies per doc")
    assert(out.map(_._3).sum >= 20L && out.map(_._3).sum <= 30L)
    // maxEpochs caps repetition
    val capped = Sampling.mixEpochs(df, "doc_id", "source", "est_tokens",
      Map("hot" -> 1.0), 100000L, maxEpochs = 3.0)
      .collect().map(_.getLong(4))
    assert(capped.forall(_ == 3L), "rate beyond maxEpochs pins to the cap")
    // budget monotonicity per document
    val lo = Sampling.mixEpochs(df, "doc_id", "source", "est_tokens",
      Map("hot" -> 1.0), 1500L)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    val hi = Sampling.mixEpochs(df, "doc_id", "source", "est_tokens",
      Map("hot" -> 1.0), 2600L)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    lo.foreach { case (id, n) =>
      assert(hi.getOrElse(id, 0L) >= n,
        s"doc $id: raising the budget reduced copies $n -> ${hi.get(id)}")
    }
  }

  test("temperature weights flatten toward uniform as alpha drops") {
    import SparkSpec.spark.implicits._
    val df = ((1L to 90L).map(i => (i, "big", 100L)) ++
      (91L to 100L).map(i => (i, "small", 100L)))
      .toDF("doc_id", "source", "est_tokens") // big 9000, small 1000
    def weights(alpha: Double): Map[String, Double] =
      Sampling.temperatureMixPlan(df, "source", "est_tokens", alpha, 1000L)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val w1 = weights(1.0)
    assert(w1("big") == 0.9 && w1("small") == 0.1, s"alpha=1 is proportional: $w1")
    val w0 = weights(0.0)
    assert(w0("big") == 0.5 && w0("small") == 0.5, s"alpha=0 is uniform: $w0")
    val wh = weights(0.5)
    assert(wh("big") < 0.9 && wh("big") > 0.5 && wh("small") > 0.1,
      s"alpha=0.5 sits between: $wh")
    assert(math.abs(wh("big") + wh("small") - 1.0) < 1e-12)
    // plan is partition-order invariant (driver fold in sorted order)
    val again = Sampling.temperatureMixPlan(df.repartition(7), "source",
      "est_tokens", 0.5, 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(again == wh, "weights must be bit-identical under repartitioning")
    // a NULL stratum is excluded, not an NPE
    val withNull = df.union(Seq((999L, null.asInstanceOf[String], 50L))
      .toDF("doc_id", "source", "est_tokens"))
    val wn = Sampling.temperatureMixPlan(withNull, "source",
      "est_tokens", 0.5, 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(wn == wh, "null stratum must not change the mixture")
    // a zero-token stratum (incl. an all-null token column) is
    // dropped before the fold — not a NaN rate, not an NPE
    val degenerate = df.union(Seq(
      (997L, "empty", Some(0L)),
      (998L, "nulls", None: Option[Long]))
      .toDF("doc_id", "source", "est_tokens"))
    val wd = Sampling.temperatureMixPlan(degenerate, "source",
      "est_tokens", 0.5, 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(wd == wh, s"degenerate strata must vanish from the mixture: $wd")
    // every stratum degenerate -> loud failure, not an empty plan
    val none = Seq((1L, "empty", 0L)).toDF("doc_id", "source", "est_tokens")
    val err = intercept[IllegalArgumentException] {
      Sampling.temperatureMixPlan(none, "source", "est_tokens", 0.5, 1000L)
    }
    assert(err.getMessage.contains("positive tokens"))
    // non-string stratum column -> loud contract failure
    val intStratum = Seq((1L, 7, 10L)).toDF("doc_id", "source", "est_tokens")
    val err2 = intercept[IllegalArgumentException] {
      Sampling.temperatureMixPlan(intStratum, "source", "est_tokens", 0.5, 1000L)
    }
    assert(err2.getMessage.contains("string column"))
    // the guard resolves like the query does (case-insensitive by
    // default) — a column named differently only by case still works
    val wc = Sampling.temperatureMixPlan(df, "SOURCE", "est_tokens", 0.5, 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(wc == wh, "case-insensitive stratum resolution regressed")
  }

  test("packing fills bins contiguously within each shard") {
    val packed = Sampling.packSequences(
      docs.select(col("doc_id"),
        ceil(length(col("text")) / 4.0).cast("long").as("est_tokens")),
      "doc_id", "est_tokens", capacity = 1000L, shards = 4)
    assert(packed.count() == docs.count(), "every document gets a bin")
    // offsets are within capacity, shards partition the id space
    assert(packed.filter(col("token_offset") >= 1000L ||
      col("token_offset") < 0L).count() == 0)
    assert(packed.filter(col("pack_shard") =!= pmod(col("doc_id"), lit(4)))
      .count() == 0)
    // bins within a shard are dense from the shard's base id
    val binsPerShard = packed.groupBy("pack_shard")
      .agg(min("bin_id").as("lo"), countDistinct("bin_id").as("n"),
        max("bin_id").as("hi"))
      .collect()
    binsPerShard.foreach { r =>
      assert(r.getLong(3) - r.getLong(1) + 1 == r.getLong(2),
        s"bin ids must be contiguous per shard: $r")
    }
  }

  test("training shards partition the corpus into contiguous pseudorandom orders") {
    import SparkSpec.spark.implicits._
    val ids = (0L until 1000L).toDF("id").repartition(7)
    val out = Sampling.shardForTraining(ids, "id", shards = 4)
      .select("id", "shard", "shard_pos").as[(Long, Int, Int)].collect()
    // exhaustive partition: every row exactly once, shards in range
    assert(out.length == 1000 && out.map(_._1).distinct.length == 1000)
    assert(out.forall(r => r._2 >= 0 && r._2 < 4))
    // positions are contiguous 1..n within each shard
    out.groupBy(_._2).foreach { case (s, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.sameElements(1 to rows.length), s"shard $s positions: ${ps.take(5).mkString(",")}")
    }
    // roughly balanced (md5 buckets are uniform)
    assert(out.groupBy(_._2).values.forall(g => math.abs(g.size - 250) < 80))
    // the order is a real permutation, not id order
    val shard0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted, "training order must not be id order")
    // deterministic under repartitioning
    val again = Sampling.shardForTraining(ids.repartition(3), "id", 4)
      .select("id", "shard", "shard_pos").as[(Long, Int, Int)].collect()
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
  }

  test("train/val/test split is exhaustive, stable under growth, and salt-decorrelated") {
    import SparkSpec.spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val s1 = Sampling.trainValTestSplit(ids, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    // exhaustive: every row assigned to a declared split
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(s1.size == 2000)
    // fractions land near 80/10/10 (md5 buckets are uniform)
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 100, counts.toString)
    assert(math.abs(counts("val") - 200) < 60, counts.toString)
    assert(math.abs(counts("test") - 200) < 60, counts.toString)
    // growth stability: assignments of the first 500 ids are
    // unchanged when the corpus quadruples
    val s2 = Sampling.trainValTestSplit((0L until 500L).toDF("id"), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s2.forall { case (k, v) => s1(k) == v },
      "a document's split must not depend on the rest of the corpus")
    // decorrelation: the split hash must not reuse the raw id bucket,
    // else sampling within a split would be biased
    val raw = ids.withColumn("b", Sampling.hashBucket(col("id")))
      .withColumn("split",
        when(col("b") < 0.8 * 4294967296.0, "train")
          .when(col("b") < 0.9 * 4294967296.0, "val").otherwise("test"))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s1.count { case (k, v) => raw(k) == v } < 2000,
      "salted split must differ from the unsalted bucket somewhere")
    // bad fractions fail loudly
    intercept[IllegalArgumentException] {
      Sampling.trainValTestSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("weightedSample keeps rows proportionally to weight, monotone in rate") {
    import SparkSpec.spark.implicits._
    val rows = (1L to 2000L).map(i => (i,
      if (i % 4 == 0) Some(0.0)
      else if (i % 4 == 1) Some(1.0)
      else if (i % 4 == 2) Some(0.25)
      else Option.empty[Double]))
    val df = rows.toDF("id", "w")
    val keep = Sampling.weightedSample(df, "id", "w", rate = 1.0)
      .select("id").as[Long].collect().toSet
    // weight 0 and null weights never pass; weight 1 at rate 1 always
    assert(keep.forall(i => i % 4 == 1 || i % 4 == 2))
    assert(rows.count(_._2.contains(1.0)) == keep.count(_ % 4 == 1),
      "weight 1 at rate 1 keeps every row")
    // weight 0.25 keeps roughly a quarter (hash-uniform)
    val q = keep.count(_ % 4 == 2).toDouble / rows.count(_._2.contains(0.25))
    assert(q > 0.15 && q < 0.35, s"0.25-weight keep fraction $q")
    // monotone: the rate-0.3 sample is a subset of the rate-0.9 one
    val lo = Sampling.weightedSample(df, "id", "w", rate = 0.3)
      .select("id").as[Long].collect().toSet
    val hi = Sampling.weightedSample(df, "id", "w", rate = 0.9)
      .select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi), "kept set monotone in rate")
    // out-of-range weights clamp instead of over-keeping
    val wild = Seq((1L, 7.5), (2L, -3.0)).toDF("id", "w")
    val kw = Sampling.weightedSample(wild, "id", "w", rate = 1.0)
      .select("id").as[Long].collect().toSet
    assert(kw.contains(1L) && !kw.contains(2L))
  }

  test("capPerGroup keeps the cap lowest-bucket rows per group, order-independent") {
    import SparkSpec.spark.implicits._
    val rows = (1L to 20L).map(i => (i, if (i <= 17) "big" else "small"))
    val df = rows.toDF("id", "grp")
    val out = Sampling.capPerGroup(df, "id", "grp", cap = 5).collect()
    val byGrp = out.groupBy(_.getString(1)).map { case (g, rs) => g -> rs }
    assert(byGrp("big").length == 5, "oversized group capped")
    assert(byGrp("small").length == 3, "undersized group kept whole")
    // kept set = the 5 smallest cap_buckets of each group
    val bigAll = Sampling.capPerGroup(df, "id", "grp", cap = 100)
      .filter(col("grp") === "big")
      .orderBy(col("cap_bucket").asc, col("id").asc)
      .select("id").as[Long].collect().take(5).toSet
    val bigKept = out.filter(_.getString(1) == "big").map(_.getLong(0)).toSet
    assert(bigKept == bigAll, "kept = prefix of the bucket order")
    // partitioning/order independence: same kept set after reshuffle
    val shuffled = Sampling.capPerGroup(df.repartition(7, col("id")),
        "id", "grp", cap = 5)
      .collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("cap_rank"))))
      .toSet
    assert(shuffled == out.map(r =>
      (r.getLong(0), r.getInt(r.fieldIndex("cap_rank")))).toSet)
    // rank-limit filter plans as WindowGroupLimit (partial per
    // partition before the exchange — the 100 TB shape)
    val plan = Sampling.capPerGroup(df, "id", "grp", cap = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
  }
}
