package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType}

import graft.dq.DataQuality
import graft.functions.Kll

/** KLL quantile sketch: exactness in the small, the pinned
  * rank-error bound vs the exact discrete-percentile block in the
  * large, incremental merge semantics, and the dq_outliers sketch
  * companion's plan/schema contract.
  */
class QuantileSketchSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  /** 1-based rank of `est` in `sorted` under the discrete rule:
    * the number of values ≤ est (the rank the estimate actually
    * lands at — comparing against the ceil(q·n) target gives the
    * sketch's rank error).
    */
  private def rankOf(sorted: Array[Double], est: Double): Long = {
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= est) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  test("sketch is EXACT below capacity: quantiles == discretePercentiles") {
    // n = 150 < k = 200: everything sits in level 0, rank selection
    // is exact, so the sketch must agree with the exact block bit
    // for bit — regardless of partitioning (merge concatenates
    // level 0 without compacting below capacity)
    val df = (1 to 150).map(i => ("g", (i * 7 % 151).toDouble))
      .toDF("grp", "v").repartition(5)
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95)
    val exact = DataQuality.discretePercentiles(df, "grp", "v", qs)
      .collect()(0)
    val sketch = DataQuality.sketchPercentiles(df, "grp", "v", qs, 200)
      .collect()(0)
    qs.indices.foreach { i =>
      assert(sketch.getDouble(i + 1) == exact.getDouble(i + 1),
        s"q=${qs(i)._2}: sketch ${sketch.getDouble(i + 1)} != exact ${exact.getDouble(i + 1)}")
    }
  }

  test("rank-error bound pinned vs the exact block on lineitem") {
    // the continuous column the exact block is WEAK on at scale:
    // l_extendedprice is near-unique per group. k = 200 on ~60k
    // rows (sf0.001) compacts many levels deep; pin the observed
    // rank error of every estimated quartile at <= 2% of n (the
    // deterministic-alternation bound lands far below this in
    // practice; the pin catches a broken compactor, not noise)
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag").as("grp"),
        col("l_extendedprice").cast("double").as("v"))
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)
    val est = DataQuality.sketchPercentiles(li, "grp", "v", qs, 200)
      .collect().map(r => r.getString(0) -> r).toMap
    val groups = li.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    groups.foreach { case (g, n) =>
      val sorted = li.filter(col("grp") === g).select("v")
        .collect().map(_.getDouble(0)).sorted
      qs.zipWithIndex.foreach { case ((_, q), i) =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        val landed = rankOf(sorted, est(g).getDouble(i + 1))
        val err = math.abs(landed - target)
        assert(err <= 0.02 * n,
          s"group $g q=$q: rank error $err on n=$n exceeds 2%")
      }
    }
  }

  test("weight conservation: estimates account for every row") {
    // total stored weight must equal n after arbitrary insert/merge
    // interleavings — the invariant the odd-leftover rule protects.
    // Probe it through the public surface: rank of the max value
    // (q=1.0) must be n itself on any data size that forces
    // multi-level compaction.
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("grp", "v")
      .repartition(7)
    val out = DataQuality.sketchPercentiles(df, "grp", "v",
      Seq("pmax" -> 1.0), 64).collect()(0)
    // q=1.0 selects rank n: the stored maximum. The global max
    // always survives compaction at SOME level (it can only be
    // promoted, never dropped... it can be dropped if unlucky in
    // offset; but rank-1.0 must land within the bound of the max)
    assert(out.getDouble(1) >= 9800.0,
      s"rank-n estimate ${out.getDouble(1)} implausibly low")
  }

  test("incremental profile: per-batch sketches merge to the whole") {
    // write side: one sketch per (group, batch); read side: merged
    // estimates. Below capacity the composition is EXACT — equal to
    // the exact percentiles of the union — which pins the merge
    // path end to end with no tolerance band.
    val batches = (0 until 3).map { b =>
      (1 to 60).map(i => ("g", (b * 60 + i).toDouble)).toDF("grp", "v")
    }
    val perBatch = batches.map(DataQuality.profileSketch(_, "grp", "v", 512))
    val stored = perBatch.reduce(_ unionAll _)
    assert(stored.schema("sketch").dataType == BinaryType)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val merged = DataQuality.mergeProfileSketches(stored, "grp", qs, 512)
      .collect()(0)
    val exact = DataQuality.discretePercentiles(
      batches.reduce(_ unionAll _), "grp", "v", qs).collect()(0)
    assert(merged.getDouble(1) == exact.getDouble(1))
    assert(merged.getDouble(2) == exact.getDouble(2))
  }

  test("kll_merge rejects a sketch built with a different k") {
    val sk = DataQuality.profileSketch(
      Seq(("g", 1.0)).toDF("grp", "v"), "grp", "v", 64)
    val err = intercept[Exception] {
      DataQuality.mergeProfileSketches(sk, "grp", Seq("p50" -> 0.5), 128)
        .collect()
    }
    assert(err.getMessage.contains("k=64") ||
      Option(err.getCause).exists(_.getMessage.contains("k=64")))
  }

  test("NaN fails loudly at the aggregate, null is skipped") {
    // DataQuality.scorable filters NaN upstream of the operators —
    // drive the AGGREGATE directly to prove its own loud guard
    // (the repo convention: Gramian/VectorSum reject NaN per row)
    val nan = Seq(("g", 1.0), ("g", Double.NaN)).toDF("grp", "v")
    val err = intercept[Exception] {
      nan.groupBy("grp").agg(Kll.kllSketch(col("v"), 64)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(err).exists(_.contains("NaN")), msgs(err).mkString("; "))
    // null rows skip (standard aggregate semantics): n excludes them
    val withNull = Seq(("g", java.lang.Double.valueOf(1.0)),
      ("g", null.asInstanceOf[java.lang.Double]),
      ("g", java.lang.Double.valueOf(3.0))).toDF("grp", "v")
    val qs = withNull.groupBy("grp")
      .agg(Kll.kllQuantiles(Kll.kllSketch(col("v"), 64), Seq(0.5, 1.0)).as("qs"))
      .collect()(0).getSeq[Double](1)
    assert(qs == Seq(1.0, 3.0), qs.toString)
  }

  test("dq_outliers_sketch: same schema as the exact entry, fences agree on bounded data") {
    val exact = SparkEntry.queries("dq_outliers")(spark, sf)
    val sketch = SparkEntry.queries("dq_outliers_sketch")(spark, sf)
    assert(sketch.schema.map(f => (f.name, f.dataType)) ==
      exact.schema.map(f => (f.name, f.dataType)))
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    val s = sketch.collect().map(r => r.getString(0) -> r).toMap
    assert(e.keySet == s.keySet)
    e.keySet.foreach { g =>
      // row accounting is sketch-independent: n must be identical
      assert(e(g).getLong(5) == s(g).getLong(5), s"n differs for $g")
      // fences are rank estimates: quartiles within 5% relative
      Seq(1, 2).foreach { i =>
        val ev = e(g).getDouble(i)
        val sv = s(g).getDouble(i)
        assert(math.abs(sv - ev) <= 0.05 * math.abs(ev),
          s"group $g col $i: sketch $sv vs exact $ev")
      }
    }
  }

  test("sketch plan shape: no per-group value sort, partial agg on the wire") {
    val li = Tables.load(spark, sf, "lineitem")
    val plan = DataQuality.sketchPercentiles(li, "l_returnflag",
      "l_extendedprice", Seq("p50" -> 0.5)).queryExecution
      .executedPlan.toString
    // the exact block's signature is a Window over a Sort — the
    // sketch path must have NEITHER; its only wire format is the
    // ObjectHashAggregate partial/final pair
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("approx profile: no expand in the plan, HLL error within 2*rsd of exact") {
    val orders = Tables.load(spark, sf, "orders")
    val cols = Seq("o_custkey", "o_totalprice", "o_orderstatus")
    val exact = DataQuality.profile(orders, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = DataQuality.profileApprox(orders, cols, rsd = 0.02)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      // n_rows and null accounting are exact in both
      assert(approx(c).getLong(1) == exact(c).getLong(1))
      assert(approx(c).getLong(2) == exact(c).getLong(2))
      val nd = exact(c).getLong(3).toDouble
      val est = approx(c).getLong(3).toDouble
      assert(math.abs(est - nd) <= math.max(2.0, 2 * 0.02 * nd),
        s"$c: HLL estimate $est vs exact $nd exceeds 2*rsd")
    }
    // the exact profile pays an Expand per distinct-counted column;
    // the sketch profile must have NO expand anywhere
    val exactPlan = DataQuality.profile(orders, cols)
      .queryExecution.executedPlan.toString
    val approxPlan = DataQuality.profileApprox(orders, cols)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "sanity: exact multi-count-distinct should plan an Expand")
    assert(!approxPlan.contains("Expand"),
      s"approx profile must not expand:\n${approxPlan.take(2000)}")
  }

  test("equi-depth histogram: equal counts under skew, honest empty buckets on duplicates") {
    // heavy skew: 900 rows at 1.0, 100 spread over 100..199. The
    // equi-width histogram puts ~all mass in one bin; equi-depth
    // must (a) account every row, (b) render the duplicate run as
    // repeated boundaries with EMPTY follow-up buckets, not invent
    // spread that isn't there
    val rows = (1 to 900).map(_ => 1.0) ++ (0 until 100).map(i => 100.0 + i)
    val df = rows.map(Tuple1(_)).toDF("v").repartition(5)
    val out = DataQuality.equiDepthHistogram(df, "v", buckets = 4)
      .orderBy("bucket").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(3)).sum == 1000L, "every row accounted")
    // ranks 250/500/750/1000 of the sorted data: the first three all
    // land on the 1.0 run -> buckets 2 and 3 are empty (lo == hi ==
    // 1.0), bucket 4 holds everything above
    assert(out(0).getDouble(2) == 1.0 && out(0).getLong(3) == 900L)
    assert(out(1).getLong(3) == 0L && out(2).getLong(3) == 0L,
      "duplicate-spanning buckets must be empty, not fabricated")
    assert(out(3).getDouble(2) == 199.0 && out(3).getLong(3) == 100L)
    // uniform data: buckets within one distinct value of n/B each
    val uni = (1 to 1000).map(i => Tuple1(i.toDouble)).toDF("v")
    val u = DataQuality.equiDepthHistogram(uni, "v", buckets = 4)
      .collect().map(r => r.getLong(3))
    assert(u.forall(n => math.abs(n - 250L) <= 1), u.mkString(","))
    // empty / all-unscoreable input: an EMPTY profile (matching the
    // equi-width histogram), never phantom all-null bucket rows
    val none = Seq(Option.empty[Double], Some(Double.NaN)).map(Tuple1(_))
      .toDF("v")
    assert(DataQuality.equiDepthHistogram(none, "v", buckets = 4).count() == 0L)
    // per-group variant: each group's buckets account its own rows
    // (the skewed group's duplicates stay inside its profile)
    val grouped = ((1 to 900).map(_ => ("a", 1.0)) ++
      (0 until 100).map(i => ("a", 100.0 + i)) ++
      (1 to 40).map(i => ("b", i.toDouble))).toDF("g", "v")
    val byG = DataQuality.equiDepthHistogramByGroup(grouped, "g", "v", 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(4)))
    assert(byG.filter(_._1 == "a").map(_._3).sum == 1000L)
    assert(byG.filter(_._1 == "b").map(_._3).sum == 40L)
    assert(byG.filter(_._1 == "b").forall(_._3 == 10L),
      "uniform group: four equal buckets")
    // a NULL group gets its own real profile (surface, don't drop)
    val withNull = grouped.union(
      Seq((null.asInstanceOf[String], 7.0), (null.asInstanceOf[String], 9.0))
        .toDF("g", "v"))
    val nullRows = DataQuality.equiDepthHistogramByGroup(withNull, "g", "v", 4)
      .filter(col("g").isNull).collect()
    assert(nullRows.length == 4 && nullRows.map(_.getLong(4)).sum == 2L,
      nullRows.mkString(","))
  }

  test("sketch equi-depth histogram: exact counts of estimated buckets within rank error") {
    // uniform 1..10000: every bucket's count must sit within the
    // sketch's rank-error band around n/B, totals must be exact
    val n = 10000
    val df = (1 to n).map(i => Tuple1(i.toDouble)).toDF("v").repartition(8)
    val out = DataQuality.equiDepthHistogramSketch(df, "v", buckets = 4)
      .orderBy("bucket").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(3)).sum == n.toLong, "counts are exact")
    out.foreach { r =>
      assert(math.abs(r.getLong(3) - n / 4) <= 0.04 * n,
        s"bucket ${r.getInt(0)}: ${r.getLong(3)} vs ${n / 4} exceeds band")
    }
    // boundaries are monotone and the top edge covers the max
    val his = out.map(_.getDouble(2))
    assert(his.sameElements(his.sorted) && his.last == n.toDouble)
    // empty input: empty profile, same contract as the exact variant
    val none = Seq(Option.empty[Double]).map(Tuple1(_)).toDF("v")
    assert(DataQuality.equiDepthHistogramSketch(none, "v", 4).count() == 0L)
  }

  test("SQL registration: kll_sketch -> kll_merge -> kll_quantiles") {
    Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0))
      .toDF("grp", "v").createOrReplaceTempView("kll_in")
    val out = spark.sql(
      """SELECT grp, kll_quantiles(kll_merge(sk, 64), 0.5D, 1) AS qs
        |FROM (SELECT grp, kll_sketch(v, 64) AS sk FROM kll_in GROUP BY grp)
        |GROUP BY grp""".stripMargin).collect()(0)
    // q=1 as a plain INT literal must work (the natural max query)
    val qs = out.getSeq[Double](1)
    assert(qs == Seq(2.0, 4.0), qs.toString)
  }
}
