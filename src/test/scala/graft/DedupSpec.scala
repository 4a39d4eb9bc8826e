package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, VectorFunctions}
import graft.operators.{Curation, Dedup, Similarity}

class DedupSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("exact dedup keeps min id per identical text") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .orderBy("keep_doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.sameElements(Array((1L, 3L), (2L, 1L))))
  }

  test("normalized exact dedup collapses case/punct/whitespace variants") {
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),   // whitespace + case variant of 1
      (3L, "hello world."),    // punct variant of 1
      (4L, "different text"))
      .toDF("doc_id", "text")
    val out = Dedup.exactNormalized(df, "doc_id", "text")
      .orderBy("keep_doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sameElements(Array((1L, 3L, 3L), (4L, 1L, 1L))),
      s"variants must share one group: ${out.toSeq}")
    // plain exact dedup sees 4 distinct texts — the gap normalized
    // dedup exists to close
    assert(Dedup.exact(df, "doc_id", "text").count() == 4)
  }

  test("null-text documents: shingles drop the row, exact groups on null hash") {
    // pins the r11 explode_outer+filter sweep's documented deviation:
    // a null-text document contributes NO shingle row (the pre-r11
    // inner explode emitted an (id, null) row no downstream equi-join
    // or count ever matched), while the batch EXACT operator still
    // reports null-text docs as one md5(null)=null hash group
    val df = Seq((1L, "abcd"), (2L, null: String), (3L, null: String))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", n = 3).collect()
    assert(sh.forall(_.getLong(0) == 1L),
      s"null-text docs must emit no shingle rows: ${sh.mkString(",")}")
    assert(sh.map(_.getString(1)).sorted.sameElements(Array("abc", "bcd")))
    val ex = Dedup.exact(df, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(ex.length == 2, s"one real group + one null-hash group: ${ex.toSeq}")
    assert(ex.exists(g => g._1 == null && g._2 == 2L && g._3 == 2L),
      s"null-text docs form one null-hash group keeping min id: ${ex.toSeq}")
  }

  test("ngram jaccard finds planted near-duplicates") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base),
      (2L, base + " tail"),              // near-dup of 1
      (3L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramJaccardStats(df, "doc_id", "text",
      n = 5, maxDf = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 1L, "doc1 should have doc2 as near-dup") // n_near
    assert(out(1).getLong(2) == 1L)
    assert(out(2).getLong(2) == 0L)
    assert(out(0).getDouble(3) > 0.8)
  }

  test("simhash: identical texts collide, disjoint texts differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val h = df.select(HashFunctions.simhash64(split(col("text"), " ")).as("h"))
      .as[Long].collect()
    assert(h(0) == h(1) && h(0) != h(2))
    val stats = Dedup.simhashStats(df, "doc_id", "text", maxHamming = 3)
      .orderBy("doc_id").collect()
    assert(stats(0).getLong(3) == 1L, s"identical pair is near: ${stats.mkString}")
  }

  test("cosine expression matches hand computation and self-sim is 1") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(1.0f, 2.0f, 2.0f), Array(1.0f, 2.0f, 2.0f)))
      .toDF("id", "a", "b")
    val out = df.select(VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
  }

  test("minhash lsh: near-identical docs land in a shared band bucket") {
    val base = "one two three four five six seven eight nine ten " * 3
    val df = Seq((1L, base), (2L, base + "x"),
      (3L, "totally other vocabulary nothing shared at all whatsoever"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashLshStats(df, "doc_id", "text",
      n = 5, numPerm = 64, bands = 16, threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) >= 1L, "near-identical pair must be a candidate")
    assert(out(2).getLong(1) == 0L, "disjoint doc has no candidates")
  }

  test("ann brute force returns k ranked neighbors per vector") {
    val out = Similarity.annBruteForce(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding", k = 3)
    val counts = out.groupBy("vec_id").count().select(max("count"), min("count"))
      .collect()(0)
    assert(counts.getLong(0) == 3 && counts.getLong(1) == 3)
  }

  test("sorted intersect count equals array_intersect size") {
    val df = Tables.load(spark, sf, "documents").limit(50)
    val h = graft.operators.Dedup.shingleHashes(df, "doc_id", "text", 5)
    val pairs = h.as("a").crossJoin(h.as("b")).limit(500)
      .select(
        HashFunctions.sortedIntersectCount(col("a.shash"), col("b.shash")).as("fast"),
        size(array_intersect(col("a.shash"), col("b.shash"))).as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("cluster resolution assigns one canonical per near-dup cluster") {
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val df = Seq(
      (10L, base), (11L, base + "x"), (12L, base + "yy"),  // cluster -> 10
      (20L, "totally different other words entirely unrelated content"),
      (30L, "third unique document nothing shared with the others at all"),
      // identical copies: the duplicate collapse must co-cluster
      // them (Jaccard 1) under the min id without expanding pairs
      (40L, base), (41L, base),
      // sub-shingle-length duplicates: the shingler always emits at
      // least one (truncated) shingle, so these share the singleton
      // set {h("ab")} at Jaccard 1 and cluster like any duplicates
      (50L, "ab"), (51L, "ab"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupResolve(df, "doc_id", "text",
      numPerm = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    assert(out.sameElements(Array(
      (10L, 10L, false), (11L, 10L, true), (12L, 10L, true),
      (20L, 20L, false), (30L, 30L, false),
      (40L, 10L, true), (41L, 10L, true),
      (50L, 50L, false), (51L, 50L, true))), out.mkString(","))
  }

  test("cluster cap keeps a bounded number of representatives per cluster") {
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val df = Seq(
      (10L, base), (11L, base + "x"), (12L, base + "yy"), (13L, base + "zzz"),
      (20L, "totally different other words entirely unrelated content"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupClusterCap(df, "doc_id", "text",
        threshold = 0.5, maxPerCluster = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getBoolean(4)))
      .sorted
    // the 4-member cluster keeps its two lowest ids (canonical first),
    // caps the rest; the singleton keeps itself at rank 1
    assert(out.sameElements(Array(
      (10L, 10L, 1, true), (11L, 10L, 2, true),
      (12L, 10L, 3, false), (13L, 10L, 4, false),
      (20L, 20L, 1, true))), out.mkString(","))
    // cap 1 degenerates to keep-one: kept == !is_dup everywhere
    val keepOne = Dedup.dedupClusterCap(df, "doc_id", "text",
        threshold = 0.5, maxPerCluster = 1).collect()
    assert(keepOne.forall(r => r.getBoolean(4) == !r.getBoolean(2)))
    // the pre-resolved overload over a shared resolution equals the
    // self-contained form exactly — the pipeline shape that pays the
    // candidate generation + propagation once for map AND cap
    val resolved = graft.Materialize.eager(
      Dedup.dedupResolve(df, "doc_id", "text", threshold = 0.5))
    val shared = Dedup.dedupClusterCap(resolved, "doc_id", maxPerCluster = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getBoolean(4)))
      .sorted
    assert(shared.sameElements(out),
      "pre-resolved overload must equal the self-contained form")
  }

  test("cluster resolution follows transitive chains") {
    import org.apache.spark.sql.functions.col
    val ids = (1L to 6L).toDF("id")
    // chain 1-2-3-4 plus pair 5-6: min label must propagate the chain
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("ida", "idb")
    val got = Dedup.resolveClusters(ids, pairs)
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 5L), (6L, 5L))), got.mkString(","))
  }

  test("broadcast ann equals the join+window formulation exactly") {
    val e = Tables.load(spark, sf, "embeddings")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "rank", "neighbor_id", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val fast = key(Similarity.annBruteForce(e, "vec_id", "embedding", k = 4))
    val ref = key(Similarity.annBruteForceJoin(e, "vec_id", "embedding", k = 4))
    assert(fast.length == ref.length && fast.sameElements(ref),
      s"${fast.length} vs ${ref.length}; first diff: ${
        fast.zip(ref).find(p => p._1 != p._2)}")
  }

  test("decontaminate flags exactly the docs sharing a 13-gram with the benchmark") {
    import SparkSpec.spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix the quick brown fox jumps over something else"), // shares 13-grams
      (2L, "completely unrelated content with no overlap at all"),
      (3L, "quick brown cat")  // longest shared run "quick brown " = 12 < 13
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out.map(_._1).sameElements(Array(1L, 2L, 3L)))
    assert(out(0)._3 && out(0)._2 > 0, s"doc 1 shares 13-grams: ${out(0)}")
    assert(!out(1)._3 && out(1)._2 == 0, s"doc 2 is clean: ${out(1)}")
    assert(!out(2)._3, s"doc 3's overlap is shorter than 13: ${out(2)}")
  }

  test("decontaminate broadcast side is the benchmark hash set") {
    val all = Tables.load(spark, sf, "documents")
    val plan = Dedup.decontaminate(
      all.filter(org.apache.spark.sql.functions.col("source") =!= "src0"),
      all.filter(org.apache.spark.sql.functions.col("source") === "src0"),
      "doc_id", "text", 13).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("bloom decontamination path equals the exact path on the corpus split") {
    import org.apache.spark.sql.functions.col
    val all = Tables.load(spark, sf, "documents")
    val corpus = all.filter(col("source") =!= "src0")
    val bench = all.filter(col("source") === "src0")
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", 13)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    // a deliberately LEAKY fpp: plenty of bloom false positives must
    // still come out bit-identical after the exact verify join
    val bloomy = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
        13, fpp = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    assert(bloomy.sameElements(exact), "bloom prefilter must not change the result")
    // the screen sits in the corpus scan stage, below the verify join
    val plan = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text", 13)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(3000))
  }

  test("minhash duplicate collapse equals the doc-level formulation across flood regimes") {
    // the r14 collapse runs LSH on distinct contents and expands by
    // group size — value-EXACT vs the doc-level reference, including
    // flood caps that drop some of a group's buckets but not others
    val base = "one two three four five six seven eight nine ten " * 3
    val docs =
      (1 to 7).map(i => (i.toLong, base)) ++ // dup group of 7
        (10 to 11).map(i => (i.toLong, base + "x")) ++ // near-dup pair
        Seq((20L, "totally other vocabulary nothing shared here at all")) ++
        (30 to 32).map(i =>
          (i.toLong, "second duplicated group content words " * 4)) ++
        // sub-shingle-length texts: the shingler truncates to one
        // shingle, so these form a {h("ab")} group scoring Jaccard 1
        (40 to 42).map(i => (i.toLong, "ab"))
    val df = docs.toDF("doc_id", "text")
    for (cap <- Seq(3, 8, 10000)) {
      val fast = Dedup.minhashLshStats(df, "doc_id", "text", maxBucket = cap)
        .collect().map(_.toString).sorted.toSeq
      val ref = Dedup
        .minhashLshStatsUncollapsed(df, "doc_id", "text", maxBucket = cap)
        .collect().map(_.toString).sorted.toSeq
      assert(fast == ref, s"maxBucket=$cap: $fast vs $ref")
    }
    // and on the real corpus at defaults
    val real = Tables.load(spark, sf, "documents")
    val f2 = Dedup.minhashLshStats(real, "doc_id", "text")
      .collect().map(_.toString).sorted
    val r2 = Dedup.minhashLshStatsUncollapsed(real, "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(f2.sameElements(r2))
  }

  test("maxBucket cap drops flood buckets from candidate generation only") {
    val flood = (1 to 20).map(i => (i.toLong, "identical template page body " * 3))
    val base = "one two three four five six seven eight nine ten " * 2
    val near = Seq((100L, base), (101L, base + "x"))
    val df = (flood ++ near).toDF("doc_id", "text")
    val capped = Dedup.minhashLshStats(df, "doc_id", "text", maxBucket = 10)
      .collect()
    // the 20-copy flood shares every band bucket (size 20 > cap) ->
    // no candidates generated for it; the small near-dup pair's
    // buckets (size 2) are untouched
    assert(capped.filter(_.getLong(0) <= 20L).map(_.getLong(1)).sum == 0L)
    assert(capped.filter(_.getLong(0) >= 100L).forall(_.getLong(1) >= 1L))
    // the default cap is finite (10k) but far above this 20-copy
    // flood, so it still pairs the whole flood
    val full = Dedup.minhashLshStats(df, "doc_id", "text").collect()
    assert(full.filter(_.getLong(0) <= 20L).forall(_.getLong(1) == 19L))
  }

  test("ann brute force fails fast beyond its driver-collect cap") {
    val e = Tables.load(spark, sf, "embeddings")
    val err = intercept[IllegalArgumentException] {
      Similarity.annBruteForce(e, "vec_id", "embedding", k = 3,
        maxCorpusRows = 10)
    }
    assert(err.getMessage.contains("annLsh") && err.getMessage.contains("annIvf"),
      s"guard must point at the scale paths: ${err.getMessage}")
    // at or under the cap the limited collect IS the corpus: results
    // match the unguarded default exactly
    val n = e.count().toInt
    val capped = Similarity.annBruteForce(e, "vec_id", "embedding", k = 3,
      maxCorpusRows = n).collect().map(_.toString).sorted
    val default = Similarity.annBruteForce(e, "vec_id", "embedding", k = 3)
      .collect().map(_.toString).sorted
    assert(capped.sameElements(default))
  }

  test("embedding outlier gate flags the far tail, bit-stable under repartition") {
    import SparkSpec.spark.implicits._
    // 40 vectors on a tight shell plus one planted far point
    val shell = (0 until 40).map { i =>
      val a = i * 0.157
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }
    val wild = Seq((99L, Array(8.0f, -6.0f)))
    val df = (shell ++ wild).toDF("vec_id", "embedding")
    val out = Similarity.embeddingOutliers(df, "vec_id", "embedding", 2.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.filter(_._3).map(_._1).toSeq == Seq(99L),
      s"only the planted point is past 2.0: ${out.filter(_._3).mkString(",")}")
    assert(out.filter(_._1 != 99L).forall(_._2 < 1.5))
    // quantized-integer route: repartitioning cannot move a bit
    val a = out.sortBy(_._1)
    val b = Similarity.embeddingOutliers(df.repartition(7), "vec_id",
        "embedding", 2.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(a.sameElements(b), "distance must be partition-order exact")
    intercept[IllegalArgumentException] {
      Similarity.embeddingOutliers(
        Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
        "vec_id", "embedding", 1.0)
    }
  }

  test("ann recall scores hits against the truth set, ignoring extras") {
    import SparkSpec.spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("vec_id", "neighbor_id")
    // vec 1: two of three truth neighbors found plus a spurious one
    // (extras must not inflate recall); vec 2: nothing retrieved
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L))
      .toDF("vec_id", "neighbor_id")
    val out = Similarity.annRecall(truth, approx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out(0) == ((1L, 3L, 2L, 2.0 / 3.0)), out(0).toString)
    assert(out(1) == ((2L, 2L, 0L, 0.0)), out(1).toString)
    // perfect index: recall 1.0 everywhere
    val perfect = Similarity.annRecall(truth, truth).collect()
    assert(perfect.forall(_.getDouble(3) == 1.0))
    // recall is a SET measure: duplicate pairs on either side (e.g.
    // a multi-probe index reporting a neighbor twice) must not
    // change counts or denominators
    val dupApprox = approx.union(approx)
    val dupTruth = truth.union(truth)
    val dedup = Similarity.annRecall(dupTruth, dupApprox)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(dedup(0) == ((1L, 3L, 2L, 2.0 / 3.0)) &&
      dedup(1) == ((2L, 2L, 0L, 0.0)), dedup.mkString(","))
  }

  test("sampled ANN recall: probe rows equal the full audit's, mean within tolerance") {
    // the 100 TB-safe audit: exact truth only for a deterministic
    // md5-bucket probe sample. Two pins: (a) per-probe rows are
    // VALUE-IDENTICAL to the full audit's rows for the same queries
    // (the sample rule restricts, never perturbs, the truth side);
    // (b) the sampled mean estimates the full mean within a stated
    // tolerance — everything is hash-deterministic, so this is a
    // fixed property of the corpus, not a flaky draw.
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val approx = Similarity.annLsh(e, "vec_id", "embedding")
      .transform(graft.Materialize.eager) // two audits read it below
    val full = Similarity.annRecall(
      Similarity.annBruteForce(e, "vec_id", "embedding"), approx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val sampled = Similarity.annRecallSampled(e, "vec_id", "embedding",
        approx, rate = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val n = e.count()
    assert(sampled.nonEmpty && sampled.length < n,
      s"probe sample must be a strict non-empty subset: ${sampled.length}/$n")
    // rate 0.1 over a uniform hash: the probe count concentrates
    // around n/10 (loose 3x bounds — deterministic, not a draw)
    assert(sampled.length >= n / 30 && sampled.length <= n * 3 / 10,
      s"probe count ${sampled.length} implausible for rate 0.1 over $n")
    val probeIds = sampled.map(_._1).toSet
    val fullOnProbes = full.filter(r => probeIds.contains(r._1))
    assert(sampled.sameElements(fullOnProbes),
      "sampled audit rows must be value-identical to the full audit's " +
        s"probe rows (first diff: ${sampled.zip(fullOnProbes).find(p => p._1 != p._2)})")
    val meanFull = full.map(_._4).sum / full.length
    val meanSampled = sampled.map(_._4).sum / sampled.length
    assert(math.abs(meanFull - meanSampled) <= 0.2,
      f"sampled mean recall $meanSampled%.3f must track full $meanFull%.3f " +
        "within 0.2 at rate 0.1")
  }

  test("sampled ANN recall audits the IVF-PQ index: probe rows equal the full audit's") {
    // the PQ instantiation of the sampled audit (its own entry,
    // ann_recall_sampled_ivfpq, rows-only DECLARED: the PQ side's
    // Lloyd-refined quantizer is data-derived, and the driver's
    // oracle SQL is a static string — it cannot embed codebooks that
    // differ per sf dir, and regressing to an oracle-able raw-sample
    // quantizer costs the measured 9 recall points). The spec is the
    // strong engine-internal substitute: per-probe rows are
    // value-identical to the FULL PQ audit's (ann_recall_ivfpq's
    // shape) for the same probes, and the probe draw is the same
    // deterministic md5-bucket rule as the hash-green siblings.
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val approx = Similarity.annIvfPq(e, "vec_id", "embedding")
      .transform(graft.Materialize.eager) // both audits read it
    val full = Similarity.annRecall(
      Similarity.annBruteForce(e, "vec_id", "embedding"), approx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).sortBy(_._1)
    val sampled = Similarity.annRecallSampled(e, "vec_id", "embedding",
        approx, rate = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).sortBy(_._1)
    assert(sampled.nonEmpty && sampled.length < full.length,
      s"probe sample must be a strict non-empty subset: " +
        s"${sampled.length}/${full.length}")
    val probeIds = sampled.map(_._1).toSet
    val fullOnProbes = full.filter(r => probeIds.contains(r._1))
    assert(sampled.sameElements(fullOnProbes),
      "sampled PQ audit rows must be value-identical to the full " +
        s"audit's probe rows (first diff: " +
        s"${sampled.zip(fullOnProbes).find(p => p._1 != p._2)})")
    // the reranked PQ pipeline's sampled mean holds the spec-pinned
    // recall floor of the full audit on this corpus
    val meanSampled = sampled.map(t =>
      java.lang.Double.longBitsToDouble(t._4)).sum / sampled.length
    assert(meanSampled >= 0.3,
      f"sampled PQ mean recall $meanSampled%.3f below the 0.3 floor")
  }

  test("distributed brute force equals the collect form, corpus unbounded") {
    // the 100 TB form: probes broadcast, corpus scanned distributed.
    // Three pins: (a) bit-exact equality with the corpus-collect
    // baseline on the same inputs; (b) a corpus ABOVE a lowered
    // synthetic cap runs through the distributed form where the
    // collect baseline fails fast — only the PROBE side is gated;
    // (c) the probe gate itself fails fast with a message naming the
    // knob that shrinks the probe set.
    val e = Tables.load(spark, sf, "embeddings")
    val n = e.count().toInt
    val probes = e.filter(col("vec_id") % 17 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .sortBy(t => (t._1, t._2))
    val dist = key(Similarity.annBruteForceDistributed(
      probes, e.repartition(13), "vec_id", "embedding", k = 4))
    val coll = key(Similarity.annBruteForceAgainst(
      probes, e, "vec_id", "embedding", k = 4))
    assert(dist.sameElements(coll),
      s"distributed vs collect first diff: ${dist.zip(coll).find(p => p._1 != p._2)}")
    // (b): cap 10 << corpus n — the collect baseline refuses this
    // corpus, the distributed form audits it (probes fit the gate)
    val tiny = probes.limit(8)
    intercept[IllegalArgumentException] {
      Similarity.annBruteForceAgainst(tiny, e, "vec_id", "embedding",
        k = 3, maxCorpusRows = 10)
    }
    val over = key(Similarity.annBruteForceDistributed(
      tiny, e, "vec_id", "embedding", k = 3, maxProbeRows = 10))
    val overRef = key(Similarity.annBruteForceAgainst(
      tiny, e, "vec_id", "embedding", k = 3))
    assert(over.sameElements(overRef) && over.nonEmpty,
      s"corpus ($n rows) above the synthetic cap (10) must still audit")
    // (c): the probe gate
    val err = intercept[IllegalArgumentException] {
      Similarity.annBruteForceDistributed(e, e, "vec_id", "embedding",
        k = 3, maxProbeRows = 10)
    }
    assert(err.getMessage.contains("probe sample rate"),
      s"gate must point at the probe-rate knob: ${err.getMessage}")
    // NaN cosines rank first through the partial merge too (the
    // window's DESC NaN-first order must agree with the kernel's)
    import SparkSpec.spark.implicits._
    val nan = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(Float.NaN, 1.0f)), (4L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val nd = key(Similarity.annBruteForceDistributed(
      nan, nan.repartition(3), "vec_id", "embedding", k = 2))
    val nc = key(Similarity.annBruteForceAgainst(
      nan, nan, "vec_id", "embedding", k = 2))
    assert(nd.sameElements(nc), s"NaN merge: ${nd.mkString(",")} vs ${nc.mkString(",")}")
    // duplicate probe ids break the collect-form equivalence (the
    // per-probe merge is keyed by vec_id, the collect form is
    // per-ROW) — the documented precondition is enforced, not
    // silently diverged from
    val dupErr = intercept[IllegalArgumentException] {
      Similarity.annBruteForceDistributed(
        nan.unionAll(nan.limit(1)), nan, "vec_id", "embedding", k = 2)
    }
    assert(dupErr.getMessage.contains("distinct probe ids"),
      dupErr.getMessage)
  }

  test("cluster-atomic split: near-dup clusters never straddle splits") {
    // leakage-safe splitting: the draw hashes the cluster CANONICAL,
    // so train/test can never each hold a near-copy. Pins: (a) every
    // cluster maps to exactly one split; (b) a planted near-dup pair
    // shares its split; (c) singletons draw exactly the per-doc
    // trainValTestSplit assignment (canonical == own id).
    import SparkSpec.spark.implicits._
    import graft.operators.{Dedup, Sampling}
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = ((1L, dup) +: (2L, dup + " lambda") +: (10L to 40L).map { i =>
      // char-shingle-disjoint singletons: every word carries the doc
      // id, so no two docs share enough 5-grams to pair at 0.5
      (i, (0 until 8).map(j => s"tok${i}x$j").mkString(" "))
    }).toDF("doc_id", "text")
    val clusters = Dedup.dedupResolve(df, "doc_id", "text",
      threshold = 0.5, maxBucket = Int.MaxValue, minBands = 1)
    val out = Sampling.splitByCluster(clusters, "canonical")
      .select("doc_id", "canonical", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // (a) one split per cluster
    assert(out.groupBy(_._2).forall(_._2.map(_._3).distinct.length == 1),
      out.mkString(","))
    // (b) the planted pair is one cluster, hence one split
    val pair = out.filter(t => t._1 == 1L || t._1 == 2L)
    assert(pair.map(_._2).distinct.length == 1 &&
      pair.map(_._3).distinct.length == 1, pair.mkString(","))
    // (c) singleton assignment equals the per-doc split rule
    val single = Sampling.trainValTestSplit(
        df.filter(col("doc_id") >= 10L), "doc_id")
      .select("doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out.filter(_._1 >= 10L).foreach { case (id, canon, split) =>
      assert(canon == id && split == single(id), s"$id: $split vs ${single(id)}")
    }
    // every fraction is populated over enough clusters
    assert(out.map(_._3).distinct.sorted.sameElements(
      Array("test", "train", "val")) ||
      out.map(_._3).distinct.length >= 2, "splits must actually spread")
  }

  test("shingle stats fail loudly on duplicate doc ids") {
    // the candidate qualifier counts document frequency as count(1)
    // over the posting expansion — sound ONLY under the documented
    // one-row-per-id precondition. A raw change log (duplicate ids)
    // must fail with the remediation, not silently skew candidates.
    import SparkSpec.spark.implicits._
    val dup = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    for (op <- Seq("ngramJaccardStats", "ngramContainmentStats")) {
      val err = intercept[IllegalArgumentException] {
        val out =
          if (op == "ngramJaccardStats")
            graft.operators.Dedup.ngramJaccardStats(dup, "doc_id", "text")
          else graft.operators.Dedup.ngramContainmentStats(dup, "doc_id", "text")
        out.collect()
      }
      assert(err.getMessage.contains("one row per doc id") &&
        err.getMessage.contains("latestPerKey"),
        s"$op guard must name the precondition and remediation: ${err.getMessage}")
    }
    // unique ids still run (the guard is a pass-through, not a gate
    // on shape) and the skip property bypasses the check entirely
    val ok = dup.dropDuplicates("doc_id")
    assert(graft.operators.Dedup.ngramJaccardStats(ok, "doc_id", "text")
      .count() == 2)
    System.setProperty("graft.dedup.skipIdCheck", "true")
    try assert(graft.operators.Dedup
        .ngramJaccardStats(dup, "doc_id", "text").count() >= 2)
    finally System.clearProperty("graft.dedup.skipIdCheck")
  }

  test("embeddingStats fails fast beyond its all-pairs row cap") {
    val e = Tables.load(spark, sf, "embeddings")
    val err = intercept[IllegalArgumentException] {
      Dedup.embeddingStats(e, "vec_id", "embedding", maxCorpusRows = 10)
    }
    assert(err.getMessage.contains("embeddingStatsLsh"),
      s"guard must point at the bucketed scale path: ${err.getMessage}")
    // at or under the cap (and with the Int.MaxValue uncapped idiom)
    // results are identical to the default
    val n = e.count().toInt
    val capped = Dedup.embeddingStats(e, "vec_id", "embedding",
      maxCorpusRows = n).collect().map(_.toString).sorted
    val default = Dedup.embeddingStats(e, "vec_id", "embedding")
      .collect().map(_.toString).sorted
    val uncapped = Dedup.embeddingStats(e, "vec_id", "embedding",
      maxCorpusRows = Int.MaxValue).collect().map(_.toString).sorted
    assert(capped.sameElements(default) && uncapped.sameElements(default))
  }

  test("ann brute force runs uncapped when the cap is Int.MaxValue") {
    val e = Tables.load(spark, sf, "embeddings")
    // Int.MaxValue is the repo idiom for "explicitly uncapped"; a
    // naive cap+1 limit would overflow to a negative limit and throw
    val uncapped = Similarity.annBruteForce(e, "vec_id", "embedding", k = 3,
      maxCorpusRows = Int.MaxValue).collect().map(_.toString).sorted
    val default = Similarity.annBruteForce(e, "vec_id", "embedding", k = 3)
      .collect().map(_.toString).sorted
    assert(uncapped.sameElements(default))
  }

  test("ann kernels rank NaN cosines first, matching Spark's sort order") {
    // a NaN embedding yields NaN cosines; Spark's DESC sort puts NaN
    // first (NaN > +Inf in its ordering), so the bounded insertion
    // kernel must too — compare against the join+window formulation
    val e = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "rank", "neighbor_id", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .sortBy(t => (t._1, t._2))
    val fast = key(Similarity.annBruteForce(e, "vec_id", "embedding", k = 2))
    val ref = key(Similarity.annBruteForceJoin(e, "vec_id", "embedding", k = 2))
    assert(fast.sameElements(ref),
      s"kernel ${fast.mkString(",")} vs window ${ref.mkString(",")}")
    // and the NaN neighbor is indeed rank 1 for both probes
    assert(fast.filter(_._3 == 3L).forall(_._2 == 1))
  }

  test("nearest centroids kernel ranks a NaN centroid first") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val v = new GenericArrayData(Array(1.0f, 0.0f))
    val vecs = Array(Array(1.0f, 0.0f), Array(Float.NaN, 0.0f), Array(0.0f, 1.0f))
    val norms = vecs.map(c => c.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    val got = graft.functions.VectorOps.nearestCentroids(
      v, Array(1L, 2L, 3L), vecs, norms, 2).toLongArray()
    // cosines: id1 -> 1.0, id2 -> NaN, id3 -> 0.0; NaN sorts largest
    assert(got.sameElements(Array(2L, 1L)), got.mkString(","))
  }

  test("ann ivf tolerates null embedding rows") {
    // nulls must be excluded from the centroid sample (a null vector
    // cannot quantize — pre-fix this NPE'd on the driver) and flow
    // through assignment as dropped rows
    val rows = (1L to 12L).map { i =>
      if (i % 3 == 0) (i, null: Array[Float])
      else (i, Array(i.toFloat, (13 - i).toFloat))
    }
    val e = rows.toDF("vec_id", "embedding")
    val out = Similarity.annIvf(e, "vec_id", "embedding", k = 2,
      nlist = 8, nprobe = 2).collect()
    assert(out.nonEmpty)
    val nullIds = rows.filter(_._2 == null).map(_._1).toSet
    assert(out.forall(r => !nullIds.contains(r.getLong(0)) &&
      !nullIds.contains(r.getLong(2))),
      "null-vector rows must appear as neither probe nor neighbor")
  }

  test("minBands pre-filter drops pairs below the matching-band count") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val df = Seq((1L, base), (2L, base), // identical: all 16 bands match
      (3L, "separate vocabulary entirely unshared with the first pair"))
      .toDF("doc_id", "text")
    // identical docs match every band, so they survive minBands = bands
    val (_, keepAll) = Dedup.minhashCandidates(df, "doc_id", "text",
      numPerm = 64, bands = 16, minBands = 16)
    assert(keepAll.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sameElements(Array((1L, 2L))))
    // no pair can match more bands than exist: minBands = 17 empties
    val (_, none) = Dedup.minhashCandidates(df, "doc_id", "text",
      numPerm = 64, bands = 16, minBands = 17)
    assert(none.count() == 0)
  }

  test("corpus curation gates, dedups, decontaminates, and accounts") {
    val good = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim
    val good2 = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 3).trim
    val bench = "benchmark holdout sequence example row"
    val rows = Seq(
      (1L, good, "web", "en"),
      (2L, good, "web", "en"),                   // exact dup of 1 -> dedup drops
      (3L, "too short", "web", "en"),            // quality gate drops
      (4L, ("spam " * 30).trim, "web", "en"),    // repetition gate drops
      (5L, good2 + " benchmark holdout sequence example", "web", "en"), // contaminated (34-char verbatim overlap >= 30)
      (6L, good2, "books", "en"),                // survives in its own group
      (99L, bench, "src0", "en"))                // the benchmark itself
    val out = Curation.curate(rows.toDF("doc_id", "text", "source", "lang"),
      "doc_id", "text", col("source") === "src0", Seq("source", "lang"))
      .collect()
    assert(out.length == 2, out.mkString("; "))
    val web = out.find(_.getString(0) == "web").get
    assert(web.getLong(2) == 1L && web.getLong(4) == 1L,
      s"web group should keep only doc 1: $web")
    val books = out.find(_.getString(0) == "books").get
    assert(books.getLong(2) == 1L && books.getLong(4) == 6L)
    assert(web.getLong(3) == math.ceil(good.length / 4.0).toLong)
  }

  test("truncated-dimension recall: identity recalls 1.0, half dims keep real signal") {
    import org.apache.spark.sql.functions.{avg, expr => sqlExpr}
    val e = Tables.load(spark, sf, "embeddings")
    val truth = Similarity.annBruteForce(e, "vec_id", "embedding")
    def meanRecall(ap: org.apache.spark.sql.DataFrame): Double =
      Similarity.annRecall(truth, ap).agg(avg("recall")).head.getDouble(0)
    // the audit's ceiling: scoring on the full vector recalls itself
    assert(meanRecall(truth) == 1.0)
    // half the dimensions: strictly lossy on this corpus but far
    // above the k/(N-1) random floor — the truncation lever keeps
    // real ranking signal
    val half = e.select(col("vec_id"),
      sqlExpr("slice(embedding, 1, size(embedding) div 2)").as("embedding"))
    val n = e.count()
    val rec = meanRecall(Similarity.annBruteForce(half, "vec_id", "embedding"))
    val floor = 5.0 / (n - 1).toDouble
    assert(rec > 4 * floor && rec < 1.0,
      s"half-dim recall $rec vs floor $floor over $n vectors")
    // dimensionality check: the truncated side really is half-width
    assert(half.select(sqlExpr("size(embedding)")).head.getInt(0) * 2 ==
      e.select(sqlExpr("size(embedding)")).head.getInt(0))
  }

  test("split leakage audit: exact pair counts from cluster/split sizes; cluster splits leak zero") {
    import graft.operators.Sampling
    // planted assignment: cluster c1 = {1 train, 2 test, 3 train},
    // c2 = {4 val, 5 val}, c3 = {6 train} — pairs 3 + 1 + 0 = 4,
    // cross pairs: c1 contributes C(3,2) − C(2,2 trains) − C(1,2) =
    // 3 − 1 − 0 = 2, c2 contributes 0 → leak_rate 0.5
    val assigned = Seq(
      (1L, "c1", "train"), (2L, "c1", "test"), (3L, "c1", "train"),
      (4L, "c2", "val"), (5L, "c2", "val"), (6L, "c3", "train"))
      .toDF("doc_id", "canonical", "split")
    val row = Sampling.splitLeakageAudit(assigned, "canonical", "split")
      .head
    assert(row.toSeq.take(5) == Seq(6L, 3L, 2L, 4L, 2L), row.toString)
    assert(row.getDouble(5) == 0.5)
    // the structural guarantee on the real corpus: the cluster-atomic
    // split leaks ZERO pairs, over the same clusters the naive
    // per-doc split is measured against
    val clusters = Dedup.dedupResolve(
      Tables.load(spark, sf, "documents"), "doc_id", "text",
      threshold = 0.8, maxBucket = Int.MaxValue, minBands = 2)
    val safe = Sampling.splitLeakageAudit(
      Sampling.splitByCluster(clusters, "canonical"), "canonical", "split")
      .head
    val naive = Sampling.splitLeakageAudit(
      Sampling.trainValTestSplit(clusters, "doc_id"), "canonical", "split")
      .head
    assert(safe.getLong(4) == 0L,
      s"cluster-atomic split must leak zero pairs: $safe")
    assert(safe.getLong(3) == naive.getLong(3),
      "both rules audit the same pair universe")
    // an all-singleton corpus has no pairs: the rate is NULL, not 0/0
    val singletons = Seq((1L, "a", "train"), (2L, "b", "test"))
      .toDF("doc_id", "canonical", "split")
    val s0 = Sampling.splitLeakageAudit(singletons, "canonical", "split")
      .head
    assert(s0.getLong(3) == 0L && s0.isNullAt(5))
    // an EMPTY assignment frame reports integer zeros (not NULL
    // sums) with a NULL leak_rate — the scaladoc's count contract
    val e0 = Sampling.splitLeakageAudit(
      singletons.filter(col("doc_id") < 0L), "canonical", "split").head
    assert(e0.toSeq.take(5) == Seq(0L, 0L, 0L, 0L, 0L), e0.toString)
    assert(e0.isNullAt(5))
  }

  test("cluster board: one resolution serves cap, split, savings, and audit exactly") {
    import graft.operators.{DedupQueries, Sampling}
    val board = DedupQueries.queries("dedup_cluster_board")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getInt(3), r.getBoolean(4), r.getString(5), r.getLong(6)))
    val byId = board.map(b => b._1 -> b).toMap
    // cap verdicts: board columns == the standalone cap entry
    val cap = DedupQueries.queries("dedup_cluster_cap")(spark, sf)
      .select("doc_id", "canonical", "is_dup", "cluster_rank", "kept")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getInt(3), r.getBoolean(4)))
    assert(cap.length == board.length)
    cap.foreach { c =>
      val b = byId(c._1)
      assert((b._2, b._3, b._4, b._5) == ((c._2, c._3, c._4, c._5)),
        s"cap row mismatch for doc ${c._1}")
    }
    // split labels: board == the standalone leakage-safe split
    DedupQueries.queries("data_split_safe")(spark, sf)
      .select("doc_id", "split").collect()
      .foreach(r => assert(byId(r.getLong(0))._6 == r.getString(1),
        s"split mismatch for doc ${r.getLong(0)}"))
    // savings: the standalone one-row rollup reconciles from exactly
    // the board's (canonical, doc_id, n_bytes) columns
    val sv = DedupQueries.queries("dedup_cluster_savings")(spark, sf).head
    val perCluster = board.groupBy(_._2)
    val nDocs = board.length.toLong
    val nDup = nDocs - perCluster.size.toLong
    val bytesTotal = board.map(_._7).sum
    val bytesSaved = bytesTotal -
      perCluster.values.map(rows => rows.find(b => b._1 == b._2).get._7).sum
    assert((sv.getLong(0), sv.getLong(1), sv.getLong(2), sv.getLong(3),
      sv.getLong(4)) ==
      ((nDocs, perCluster.size.toLong, nDup, bytesTotal, bytesSaved)),
      s"savings rollup vs board: $sv")
    // audit: the standalone cluster-rule row reconciles from the
    // board's (canonical, split) columns through the same fold
    val boardDf = board.toSeq
      .map(b => (b._1, b._2, b._6)).toDF("doc_id", "canonical", "split")
    val fromBoard = Sampling.splitLeakageAudit(boardDf, "canonical", "split")
      .head.toSeq
    val auditRow = DedupQueries.queries("data_split_audit")(spark, sf)
      .filter(col("rule") === "cluster").head.toSeq.drop(1)
    assert(fromBoard == auditRow, s"$fromBoard vs $auditRow")
  }

  test("pre-curate gate: null-source docs face the gate instead of vanishing") {
    import graft.operators.DedupQueries
    val all = Seq(
      (1L, "ref doc", "src0"), (2L, "gated pass", "web"),
      (3L, "gated fail", "web"), (4L, "null pass", null),
      (5L, "null fail", null))
      .toDF("doc_id", "text", "source")
    val pass = Seq(2L, 4L).toDF("doc_id")
    val kept = DedupQueries.preCurateGate(all, pass)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // src0 passes unconditionally; web and NULL-source docs survive
    // iff in pass — a non-null-safe complement would drop 4 and 5
    // from both branches, losing the passing null-source doc 4
    assert(kept == Set(1L, 2L, 4L), kept.toString)
  }

  test("langid mismatch selection complements the curate gate; the gated pipeline reconciles") {
    import graft.operators.{Curation, DedupQueries, TextAnalysis, TextQueries}
    val all = Tables.load(spark, sf, "documents")
    val scored = TextQueries.queries("text_langid_ngram")(spark, sf)
    val allIds = scored.select("doc_id").as[Long].collect().toSet
    // the mismatch SELECTION is the exact complement of the strict
    // declared == guessed pass set (no null labels on this table, so
    // null-safe disagreement == strict-equality complement)
    val mism = TextQueries.queries("text_langid_mismatch")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val pass = scored
      .filter(col("lang_guess") === col("declared_lang"))
      .select("doc_id").as[Long].collect().toSet
    assert(mism == (allIds -- pass),
      s"mismatch selection must complement the pass set (${mism.size} " +
        s"vs ${(allIds -- pass).size})")
    // the composed entry IS curate over the gated frame — pinned
    // against the runtime entry map, the corpus_curate_lm contract
    val expected = Curation.curate(
        DedupQueries.preCurateGate(all,
          pass.toSeq.toDF("doc_id")),
        "doc_id", "text", col("source") === "src0",
        Seq("source", "lang"))
      .collect().map(_.toSeq).toSet
    val got = DedupQueries.queries("corpus_curate_langid")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(got == expected, "composed entry must equal curate over the " +
      "hand-gated frame")
    // reference docs always face curation regardless of their own
    // mismatch status: every src0 group present in plain curate
    // stays present under the gate
    val srcRows = got.filter(_.head == "src0")
    val plain = Curation.curate(all, "doc_id", "text",
        col("source") === "src0", Seq("source", "lang"))
      .collect().map(_.toSeq).filter(_.head == "src0").toSet
    assert(srcRows == plain, "src0 rows must pass the gate untouched")
  }

  test("curate attrition: each stage accounts its removals; the funnel reconciles with curate") {
    val good = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim
    val good2 = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 3).trim
    val contaminatedDoc = good2 + " benchmark holdout sequence example"
    val rows = Seq(
      (1L, good, "web", "en"),                 // survives
      (2L, good, "web", "en"),                 // exact dup of 1 -> stage 3
      (3L, "too short", "web", "en"),          // -> stage 1
      (4L, ("spam " * 30).trim, "web", "en"),  // -> stage 2
      (5L, contaminatedDoc, "web", "en"),      // -> stage 4
      (6L, good2, "books", "en"),              // survives
      (99L, "benchmark holdout sequence example row", "src0", "en"))
    val out = Curation.attrition(rows.toDF("doc_id", "text", "source", "lang"),
        "doc_id", "text", col("source") === "src0")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    def tok(s: String) = math.ceil(s.length / 4.0).toLong
    val (t1, t4, t5, t6) = (tok(good), tok(("spam " * 30).trim),
      tok(contaminatedDoc), tok(good2))
    // one planted failure per stage; tokens_out tracks the survivors
    assert(out.toSeq == Seq(
      (1, "quality", 6L, 5L, 1L, 2 * t1 + t4 + t5 + t6),
      (2, "repetition", 5L, 4L, 1L, 2 * t1 + t5 + t6),
      (3, "exact_dedup", 4L, 3L, 1L, t1 + t5 + t6),
      (4, "decontaminate", 3L, 2L, 1L, t1 + t6)), out.mkString("; "))
    // funnel invariants: docs_out = docs_in - docs_removed, stages chain
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 == b._3, s"stage ${b._1} docs_in must chain from ${a._1}")
    }
    assert(out.forall(t => t._4 == t._3 - t._5))
    // the stage-4 survivors are exactly curate's roll-up — same
    // gates, same order, same defaults (here on the real sf corpus)
    val corpus = Tables.load(spark, sf, "documents")
    val funnel = Curation.attrition(corpus, "doc_id", "text",
      col("source") === "src0").collect().map(r =>
        (r.getInt(0), r.getLong(3), r.getLong(5))).sortBy(_._1)
    val rollup = Curation.curate(corpus, "doc_id", "text",
        col("source") === "src0", Seq("source", "lang"))
      .agg(sum("n_docs"), sum("n_tokens")).head
    assert(funnel.last._2 == rollup.getLong(0) &&
      funnel.last._3 == rollup.getLong(1),
      s"funnel ${funnel.last} vs curate (${rollup.getLong(0)}, ${rollup.getLong(1)})")
  }

  test("ann ivf pairs carry exact cosines and probe only nprobe lists") {
    val e = Tables.load(spark, sf, "embeddings")
    val ivf = Similarity.annIvf(e, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2)
    val exact = Similarity.annBruteForce(e, "vec_id", "embedding", k = 50)
    // every IVF similarity must equal the exact pairwise cosine —
    // IVF may MISS pairs (approximate recall), never mis-score them
    val mismatch = ivf.as("i").join(exact.as("x"),
        col("i.vec_id") === col("x.vec_id") &&
        col("i.neighbor_id") === col("x.neighbor_id"))
      .filter(col("i.cos_sim") =!= col("x.cos_sim")).count()
    assert(mismatch == 0, s"$mismatch IVF pairs disagree with exact cosine")
    // ranks well-formed, no self-pairs, deterministic across runs
    val rows = ivf.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    val again = Similarity.annIvf(e, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("ivf-pq preserves ranking quality on coded candidates") {
    val e = Tables.load(spark, sf, "embeddings")
    val truth = Similarity.annBruteForce(e, "vec_id", "embedding", k = 3)
    val pq = Similarity.annIvfPq(e, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, m = 8, ksub = 64, rerank = 0)
    val rows = pq.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "self pair")
    // deterministic: same sample, same driver-refined codebooks,
    // fixed-order ADC
    val again = Similarity.annIvfPq(e, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, m = 8, ksub = 64, rerank = 0).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    def meanRecall(approx: org.apache.spark.sql.DataFrame) =
      Similarity.annRecall(truth, approx)
        .agg(org.apache.spark.sql.functions.avg("recall")).head.getDouble(0)
    // quantized scoring loses precision but must keep ranking SIGNAL
    // (well above the ~k/N random floor), and exact RERANK of the ADC
    // shortlist must recover nearly all of the gap to exact scoring
    // ON ITS OWN candidate pool (the refined cosine-k-means coarse
    // quantizer — annIvfWith on pqCoarse's centroids is that
    // ceiling; annIvf's raw-sampled quantizer is a DIFFERENT pool,
    // kept as a pool-agnostic quality bar only)
    val rPq = meanRecall(pq)
    val rRr = meanRecall(Similarity.annIvfPq(e, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, m = 8, ksub = 64, rerank = 4))
    val rIvf = meanRecall(
      Similarity.annIvf(e, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 2))
    val (cIds, cVecs) = Similarity.pqCoarse(e, "vec_id", "embedding",
      nlist = 8, ksub = 64)
    val rPool = meanRecall(Similarity.annIvfWith(e, "vec_id", "embedding",
      cIds, cVecs, k = 3, nprobe = 2))
    info(f"recall@3: adc $rPq%.4f  rerank $rRr%.4f  exact ivf $rIvf%.4f  pool ceiling $rPool%.4f")
    // projection-residual codes: measured 0.27 adc / 0.43 rerank vs
    // 0.23 / 0.37 for raw-slice codes on this corpus — the floors
    // below leave regeneration slack but would catch a fallback
    assert(rPq > 0.15, f"PQ recall degenerate: $rPq%.4f")
    assert(rRr >= rPq - 1e-12, "exact rerank cannot lose to raw ADC ranks")
    assert(rRr >= 0.8 * rIvf, f"rerank $rRr%.4f too far below ivf $rIvf%.4f")
    assert(rRr >= 0.8 * rPool,
      f"rerank $rRr%.4f too far below its own pool ceiling $rPool%.4f")
    assert(rRr <= rPool + 1e-12,
      "PQ scores a subset of its own candidate pool — it cannot beat " +
        "exact scoring on that pool")
  }

  test("ivf-pq rerank-depth curve: recall climbs to the pool ceiling (the knee)") {
    // the storage-unchanged recall lever: rerank depth widens only
    // the exact-rescore join (|probes|·rerank·k narrow rows), never
    // the coded inverted lists. The curve documents the knee — past
    // it the CANDIDATE POOL (nlist/nprobe) binds, not the codes —
    // so capacity planning reads recall-per-join-row off this spec.
    val e = Tables.load(spark, sf, "embeddings")
    val truth = Similarity.annBruteForce(e, "vec_id", "embedding")
    def meanRecall(approx: org.apache.spark.sql.DataFrame) =
      Similarity.annRecall(truth, approx)
        .agg(org.apache.spark.sql.functions.avg("recall")).head.getDouble(0)
    val depths = Seq(2, 4, 8, 16)
    val curve = depths.map(r => r -> meanRecall(
      Similarity.annIvfPq(e, "vec_id", "embedding", nprobe = 4, rerank = r)))
    // the pool ceiling: exact scoring of the SAME candidate pool
    // (same refined coarse quantizer, same nprobe)
    val (cIds, cVecs) = Similarity.pqCoarse(e, "vec_id", "embedding",
      nlist = 64, ksub = 64)
    val ceiling = meanRecall(Similarity.annIvfWith(e, "vec_id", "embedding",
      cIds, cVecs, k = 5, nprobe = 4))
    info(curve.map { case (r, v) => f"rerank=$r%d recall@5=$v%.4f" }
      .mkString("  ") + f"  pool ceiling $ceiling%.4f")
    // exact rescoring of a SUPERSET shortlist cannot lose pairs
    curve.sliding(2).foreach { case Seq((r1, v1), (r2, v2)) =>
      assert(v2 >= v1 - 1e-12,
        f"recall fell $v1%.4f -> $v2%.4f from rerank=$r1 to $r2")
    }
    // the knee: by rerank=8 the curve sits essentially ON the pool
    // ceiling — deeper shortlists buy nothing; nprobe is the next
    // lever (and costs pool size, not storage)
    assert(curve.toMap.apply(8) >= 0.95 * ceiling,
      f"rerank=8 ${curve.toMap.apply(8)}%.4f still below 95%% of " +
        f"pool ceiling $ceiling%.4f — the shortlist is mis-ranked")
    assert(curve.last._2 <= ceiling + 1e-12,
      "exact rescoring of pool candidates cannot beat exact scoring " +
        "of the whole pool")
    // pool-bound confirmation, and the shipped DEFAULTS (nprobe=8,
    // rerank=8 — both knees): doubling nprobe at the knee's rerank
    // lifts recall well above the nprobe=4 ceiling because the coded
    // lists' ~10× row-width savings pay for the extra probes
    // (measured 0.5628 — above exact annIvf's 0.44 at ITS defaults)
    val wider = meanRecall(Similarity.annIvfPq(e, "vec_id", "embedding"))
    info(f"defaults (nprobe=8 rerank=8) recall@5=$wider%.4f")
    assert(wider > ceiling - 1e-12,
      f"wider pool $wider%.4f did not reach the nprobe=4 ceiling " +
        f"$ceiling%.4f — probing is broken")
    assert(wider >= 0.50,
      f"defaults recall $wider%.4f below the 0.50 floor (measured " +
        "0.5628; the r13 defaults scored 0.41)")
  }

  test("OPQ rotation lifts ADC-rank recall, neutral at the rerank knee") {
    // the Ge et al. (CVPR 2013) rotation at identical
    // (nlist, nprobe, m, ksub): better codes at identical storage.
    // Where codes BIND (rerank=0, pure ADC ranking) the rotation
    // must lift recall; at the shipped rerank=8 knee the exact
    // rescore already recovers the candidate-pool ceiling, so the
    // rotation is measurably neutral — the documented reason
    // opqIters defaults to 0. Everything is deterministic (driver
    // Lloyd + Jacobi on fixed samples), so these are fixed corpus
    // properties, not flaky draws.
    val e = Tables.load(spark, sf, "embeddings")
    val truth = Similarity.annBruteForce(e, "vec_id", "embedding")
      .transform(graft.Materialize.eager)
    def meanRecall(approx: org.apache.spark.sql.DataFrame) =
      Similarity.annRecall(truth, approx)
        .agg(org.apache.spark.sql.functions.avg("recall")).head.getDouble(0)
    val adcPlain = meanRecall(Similarity.annIvfPq(e, "vec_id", "embedding",
      rerank = 0, opqIters = 0))
    val adcOpq = meanRecall(Similarity.annIvfPq(e, "vec_id", "embedding",
      rerank = 0, opqIters = 4))
    info(f"ADC-only: plain $adcPlain%.4f  opq $adcOpq%.4f")
    assert(adcOpq >= adcPlain + 0.005,
      f"OPQ must lift pure-ADC recall: $adcPlain%.4f -> $adcOpq%.4f " +
        "(measured +0.016 at sf0.001)")
    val kneePlain = meanRecall(Similarity.annIvfPq(e, "vec_id", "embedding"))
    val kneeOpq = meanRecall(Similarity.annIvfPq(e, "vec_id", "embedding",
      opqIters = 4))
    info(f"rerank knee: plain $kneePlain%.4f  opq $kneeOpq%.4f")
    assert(math.abs(kneeOpq - kneePlain) <= 0.02,
      f"at the rerank knee the pool binds — rotation must be ~neutral: " +
        f"$kneePlain%.4f vs $kneeOpq%.4f")
  }

  test("adc_dot kernel equals the zip_with/aggregate HOF fold") {
    val df = Seq(
      (Array(0, 2, 1), Array(Array(1.5, 2.5, 3.5), Array(0.25, 0.5, 0.75),
        Array(10.0, 20.0, 30.0))),
      (Array(1, 0, 0), Array(Array(-1.0, 4.0, 0.0), Array(2.0, 8.0, 16.0),
        Array(0.125, 64.0, 5.0))))
      .toDF("codes", "tbl")
    val out = df.select(
      graft.functions.VectorFunctions.adcDot(col("codes"), col("tbl"))
        .as("kernel"),
      aggregate(zip_with(col("codes"), col("tbl"),
          (c, t) => element_at(t, c + lit(1))),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"kernel ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
    assert(out(0).getDouble(0) == 1.5 + 0.75 + 20.0)
  }

  test("ivf maxList cap drops flooded inverted lists from the index only") {
    // the r14 guard: a mis-sized quantizer (nlist << sqrt(N)) or a
    // mass-duplicated corpus makes some inverted list corpus-scale
    // and probes x list goes quadratic (the sf10 kill). Over-cap
    // lists leave the INDEX side; their members still PROBE.
    import SparkSpec.spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    // explicit tiny quantizer so list sizes are large and knowable
    val centRows = e.orderBy("vec_id").limit(4)
      .select(col("vec_id").cast("long"), col("embedding")).collect()
    val cIds = centRows.map(_.getLong(0))
    val cVecs = centRows.map(_.getSeq[Float](1).toArray)
    val cNorms = cVecs.map(v => math.sqrt(
      v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
    val assigned = e.select(col("vec_id").cast("long").as("id"),
      graft.functions.VectorFunctions.nearestCentroids(
        col("embedding"), cIds, cVecs, cNorms, 1).getItem(0).as("mcid"))
    val cap = (e.count() / 4).toInt // mean list size; max exceeds it
    val flooded = assigned.groupBy("mcid").count()
      .filter(col("count") > cap).select("mcid").as[Long].collect().toSet
    assert(flooded.nonEmpty, s"fixture: no list exceeds $cap")
    val floodMembers = assigned
      .filter(col("mcid").isInCollection(flooded))
      .select("id").as[Long].collect().toSet
    val out = Similarity.annIvfWith(e, "vec_id", "embedding",
        cIds, cVecs, k = 3, nprobe = 2, maxList = cap)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall { case (_, nb) => !floodMembers.contains(nb) },
      "flooded-list members must not be indexed")
    assert(out.exists { case (v, _) => floodMembers.contains(v) },
      "flooded-list members must still find neighbors via their probes")
    // the default cap never fires at this SF: capped == uncapped
    val a = Similarity.annIvf(e, "vec_id", "embedding")
      .collect().map(_.toString).sorted
    val b = Similarity.annIvf(e, "vec_id", "embedding",
        maxList = Int.MaxValue)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("ivf recall rises monotonically with nprobe and reaches 1.0 at nlist") {
    val e = Tables.load(spark, sf, "embeddings")
    val truth = Similarity.annBruteForce(e, "vec_id", "embedding", k = 3)
    // nearestCentroids returns the nprobe NEAREST lists, so each probe
    // set is a prefix-superset of the smaller one: the candidate pool
    // only grows, and with exact cosines + the shared deterministic
    // top-k tie-break, mean recall@k cannot drop as nprobe rises.
    val sweep = Seq(1, 2, 4, 8).map { np =>
      val approx = Similarity.annIvf(e, "vec_id", "embedding", k = 3,
        nlist = 8, nprobe = np)
      val r = Similarity.annRecall(truth, approx)
        .agg(org.apache.spark.sql.functions.avg("recall")).head.getDouble(0)
      np -> r
    }
    info(sweep.map { case (np, r) => f"nprobe=$np%d recall=$r%.4f" }
      .mkString("  "))
    sweep.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1 - 1e-12,
        f"recall fell $r1%.4f -> $r2%.4f from nprobe=$np1 to $np2")
    }
    // probing every list makes every cross pair a candidate — the
    // index must then agree with brute force exactly, not just nearly
    assert(sweep.last._2 == 1.0,
      s"nprobe==nlist must recover the exact truth: ${sweep.last._2}")
    // and a single probe must already be useful, not degenerate
    // (measured 0.26 on the sf0.001 fixture — the floor flags a
    // collapse to near-zero, not normal single-probe selectivity)
    assert(sweep.head._2 > 0.2,
      s"nprobe=1 recall collapsed: ${sweep.head._2}")
  }

  test("embedding lsh stats are a recall-only subset of brute force") {
    val e = Tables.load(spark, sf, "embeddings")
    val exact = Dedup.embeddingStats(e, "vec_id", "embedding")
    val lsh = Dedup.embeddingStatsLsh(e, "vec_id", "embedding")
    val j = exact.as("x").join(lsh.as("l"), Seq("vec_id")).select(
      col("x.n_near").as("xn"), col("l.n_near").as("ln"),
      col("x.max_cos").as("xm"), col("l.max_cos").as("lm"))
    // bucketing can only MISS pairs: n_near never exceeds exact, and
    // any reported max_cos is <= the true max (and exactly equal when
    // the true best pair shares a bucket)
    assert(j.filter(col("ln") > col("xn")).count() == 0)
    assert(j.filter(col("lm").isNotNull && col("lm") > col("xm")).count() == 0)
    assert(lsh.count() == exact.count(), "one stats row per vector")
  }

  test("semdedup stats are a recall-only subset of brute force") {
    val e = Tables.load(spark, sf, "embeddings")
    val exact = Dedup.embeddingStats(e, "vec_id", "embedding")
    val sem = Dedup.semDedup(e, "vec_id", "embedding")
    val j = exact.as("x").join(sem.as("s"), Seq("vec_id")).select(
      col("x.n_near").as("xn"), col("s.n_near").as("sn"),
      col("x.max_cos").as("xm"), col("s.max_cos").as("sm"))
    // cluster bucketing can only MISS pairs: counts never exceed the
    // brute-force truth, reported cosines never exceed the true max
    // (every reported cosine is exact — same kernel, same pairs)
    assert(j.filter(col("sn") > col("xn")).count() == 0)
    assert(j.filter(col("sm").isNotNull && col("sm") > col("xm")).count() == 0)
    assert(sem.count() == exact.count(), "one stats row per vector")
    // keep is consistent with the reported stats: a vector with no
    // near-dup (n_near = 0) is always kept
    assert(sem.filter(col("n_near") === 0 && !col("keep")).count() == 0)
  }

  test("embedding covariance matches the closed-form answer") {
    import SparkSpec.spark.implicits._
    // exact grid values (multiples of 1e-6 quantize without loss):
    // x = [1, 2, 3, 4], y = [1, 3, 2, 4] -> var(x) = var(y) = 5/3,
    // cov(x, y) = 4/3 (sample, n-1)
    val df = Seq(
      (1L, Array(1f, 1f)), (2L, Array(2f, 3f)),
      (3L, Array(3f, 2f)), (4L, Array(4f, 4f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .embeddingCovariance(df, "vec_id", "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set((0L, 0L), (0L, 1L), (1L, 1L)),
      "upper triangle only")
    assert(math.abs(out((0L, 0L)) - 5.0 / 3) < 1e-9, out.toString)
    assert(math.abs(out((1L, 1L)) - 5.0 / 3) < 1e-9, out.toString)
    assert(math.abs(out((0L, 1L)) - 4.0 / 3) < 1e-9, out.toString)
    // an EMPTY corpus must fail loudly, not return an empty frame
    // (explode_outer keeps one row for the n<2 guard to fire on)
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      graft.operators.Similarity
        .embeddingCovariance(empty, "vec_id", "embedding").collect()
    }
    assert(err.getMessage != null &&
      (err.getMessage.contains("at least two") ||
        Option(err.getCause).exists(_.getMessage.contains("at least two"))),
      s"expected the loud precondition, got: ${err.getMessage}")
  }

  test("pca projection recovers the principal axis and whitening unit-variances it") {
    import SparkSpec.spark.implicits._
    val Similarity = graft.operators.Similarity
    // points spread along the diagonal y = x with small orthogonal
    // noise: the top principal component must be ~(1,1)/sqrt(2)
    val r = new scala.util.Random(11)
    val pts = (1 to 400).map { i =>
      val t = r.nextGaussian() * 4.0
      val noise = r.nextGaussian() * 0.1
      (i.toLong, Array((t + noise).toFloat, (t - noise).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val proj1 = Similarity.pcaProject(df, "vec_id", "embedding", k = 1)
      .select(col("vec_id"), col("projection")(0).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the projection of (x, y) onto (1,1)/sqrt2 is (x+y)/sqrt2 = t*sqrt2
    // (up to the small noise): correlation with t must be ~1
    val ts = pts.map { case (id, a) => (a(0) + a(1)) / math.sqrt(2.0) }
    val ps = pts.map { case (id, _) => proj1(id) }
    val corr = {
      val n = ts.size
      val (mt, mp) = (ts.sum / n, ps.sum / n)
      val covtp = ts.zip(ps).map { case (a, b) => (a - mt) * (b - mp) }.sum
      val st = math.sqrt(ts.map(a => (a - mt) * (a - mt)).sum)
      val sp = math.sqrt(ps.map(b => (b - mp) * (b - mp)).sum)
      covtp / (st * sp)
    }
    assert(math.abs(corr) > 0.999,
      s"top component must align with the diagonal: corr=$corr")
    // centering regression: shift every vector by a large common mean
    // — correlation/covariance are shift-invariant, so assert the
    // PROJECTIONS themselves: they must average ~0 (uncentered
    // projection would carry the huge shared Vᵀμ constant instead)
    val shifted = pts.map { case (id, a) =>
      (id, Array(a(0) + 500f, a(1) + 500f)) }.toDF("vec_id", "embedding")
    val shiftedMean = Similarity
      .pcaProject(shifted, "vec_id", "embedding", k = 1)
      .agg(avg(col("projection")(0))).collect()(0).getDouble(0)
    assert(math.abs(shiftedMean) < 1.0,
      s"projection must be centered, got mean $shiftedMean")
    // whitened 2-D projection: covariance of the output is ~identity
    val white = Similarity.pcaProject(df, "vec_id", "embedding", k = 2,
      whiten = true)
      .select(col("vec_id"),
        col("projection").cast("array<float>").as("embedding"))
    val wcov = Similarity.embeddingCovariance(white, "vec_id", "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(math.abs(wcov((0L, 0L)) - 1.0) < 0.05, wcov.toString)
    assert(math.abs(wcov((1L, 1L)) - 1.0) < 0.05, wcov.toString)
    assert(math.abs(wcov((0L, 1L))) < 0.05, wcov.toString)
  }

  test("gramian covariance is partition-order invariant (exact 128-bit merge)") {
    import SparkSpec.spark.implicits._
    // mixed-sign, non-grid values: exercises the signed quantization
    // and the carry paths of the 128-bit accumulators; repartitioning
    // reorders every partial sum, so bit-equality of the doubles
    // proves the integer accumulation is associative end to end
    // (update → serialize → merge), unlike a double sum
    val r = new scala.util.Random(7)
    val rows = (1L to 500L).map(i =>
      (i, Array.fill(8)((r.nextGaussian() * 2.0 - 1.0).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    def covMap(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.embeddingCovariance(d, "vec_id", "embedding")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .toMap
    val one = covMap(df.coalesce(1))
    val many = covMap(df.repartition(13))
    assert(one.keySet == many.keySet)
    one.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(many(k)),
        s"covariance at $k differs across partitionings: $v vs ${many(k)}")
    }
    // out-of-range components must fail loudly, not overflow silently
    val big = Seq((1L, Array(3500.0f, 0f)), (2L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      graft.operators.Similarity.embeddingCovariance(big, "vec_id", "embedding")
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("int8 quantization round-trips within half a grid step") {
    import SparkSpec.spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val q = graft.operators.Similarity
      .quantizeEmbeddings(e, "vec_id", "embedding")
    val back = graft.operators.Similarity
      .dequantizeEmbeddings(q, "scale", "qvec", "rec")
    val joined = e.select(col("vec_id"), col("embedding"))
      .join(back, Seq("vec_id"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val orig = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val qv = r.getSeq[Byte](3)
      val rec = r.getSeq[Float](4)
      assert(orig.length == qv.length && qv.length == rec.length)
      assert(qv.forall(b => b >= -127 && b <= 127),
        s"int8 range: ${qv.min}..${qv.max}")
      // per-component reconstruction error <= scale/2 (+ float eps)
      orig.zip(rec).foreach { case (x, y) =>
        assert(math.abs(x - y) <= scale / 2 + 1e-6,
          s"vec ${r.getLong(0)}: |$x - $y| > ${scale / 2}")
      }
    }
    // a zero vector quantizes to scale 0 / zeros and round-trips exact
    val z = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val zq = graft.operators.Similarity
      .quantizeEmbeddings(z, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Byte](2))).toMap
    assert(zq(1L)._1 == 0.0 && zq(1L)._2.forall(_ == 0))
    // amax component hits the grid edge exactly
    assert(zq(2L)._2 == Seq[Byte](64, -127, 32), zq(2L).toString)
    // a non-finite component fails loudly (a NaN would otherwise win
    // the amax fold and cast every qval to a silent 0)
    Seq(Float.NaN, Float.PositiveInfinity).foreach { bad =>
      val err = intercept[Exception] {
        graft.operators.Similarity.quantizeEmbeddings(
          Seq((1L, Array(1f, bad))).toDF("vec_id", "embedding"),
          "vec_id", "embedding").collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(e => e +: chain(e.getCause))
      assert(chain(err).exists(e =>
        Option(e.getMessage).exists(_.contains("non-finite"))),
        s"$bad must raise the quantize guard: $err")
    }
  }

  test("normalized embeddings are unit length; dot equals cosine") {
    import SparkSpec.spark.implicits._
    val df = Seq((1L, Array(3f, 4f, 0f)), (2L, Array(0f, 0f, 0f)),
      (3L, Array(-1f, 2f, -2f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .normalizeEmbeddings(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(0.6, 0.8, 0.0))
    assert(out(2L).forall(_ == 0.0), "zero vector maps to zeros, not NaN")
    out.filter(_._1 != 2L).values.foreach { v =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12)
    }
    // after normalization, the plain dot product IS the cosine
    val e = Tables.load(spark, sf, "embeddings").limit(20)
    val n = graft.operators.Similarity
      .normalizeEmbeddings(e, "vec_id", "embedding")
      .select(col("vec_id"),
        col("nvec").cast("array<float>").as("embedding"))
    val dots = n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        graft.functions.VectorFunctions
          .dotProduct(col("a.embedding"), col("b.embedding")).as("dot"))
      .collect()
    val cosines = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        graft.functions.VectorFunctions
          .cosineSim(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect()
    val cm = cosines.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    dots.foreach { r =>
      val c = cm((r.getLong(0), r.getLong(1)))
      assert(math.abs(r.getDouble(2) - c) < 1e-6,
        s"dot after normalize must approximate cosine: ${r.getDouble(2)} vs $c")
    }
  }

  test("kmeans recovers planted clusters, invariant to partitioning") {
    // three well-separated blobs with internal variation (so a blob
    // mean differs from any single member — centroid movement is
    // observable)
    val base = Map(0 -> Array(10f, 0f, 0f, 0f), 1 -> Array(0f, 10f, 0f, 0f),
      2 -> Array(-10f, -10f, 0f, 0f))
    val rows = for (b <- 0 to 2; i <- 0 until 20) yield
      (b * 100L + i,
        base(b).zipWithIndex.map { case (x, j) =>
          x + ((i * 7 + j) % 5) * 0.01f
        })
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, "vec_id", "embedding",
      k = 3, iters = 3)
    val assign = Similarity.kmeansAssign(df, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // each blob lands whole in one cluster; the three blobs separate
    val byBlob = assign.groupBy(_._1 / 100)
      .map { case (b, m) => b -> m.values.toSet }
    assert(byBlob.values.forall(_.size == 1), s"split blob: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, s"merged blobs: $byBlob")
    // each centroid sits inside its blob's bounding box, not on a
    // member (variation makes the quantized mean an interior point)
    cents.foreach { cv =>
      assert(cv.length == 4)
      assert(cv.forall(x => math.abs(x) <= 10.05))
    }
    // bit-exact partition-order invariance: the 128-bit integer
    // update makes the fit independent of how the corpus is split
    val cents2 = Similarity.kmeansFit(df.repartition(7), "vec_id",
      "embedding", k = 3, iters = 3)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq,
      "fit must be bit-identical under repartitioning")
    // a vector whose dimension differs from the centroids fails
    // loudly — no silent partial-distance assignment (standalone
    // assign has no update aggregate upstream to catch ragged dims)
    val ragged = Seq((1L, Array(1f, 2f))).toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      Similarity.kmeansAssign(ragged, "vec_id", "embedding", cents).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: chain(e.getCause))
    assert(chain(err).exists(e =>
      Option(e.getMessage).exists(_.contains("centroid dim"))),
      s"ragged assignment must raise the dim guard: $err")
  }

  test("kmeans keeps empty-cluster centroids; assignment ties go low") {
    // For ids below p/48271 the Lehmer hash (id*48271 mod p) is
    // strictly increasing, so the k=3 init is exactly ids 0, 1, 2 —
    // plant A, B, A there and the initial centroids are [A, B, A]
    // with a known duplicate at cluster 2. A uses components off the
    // 1e-6 grid (0.1f etc.), so an UPDATED centroid provably moves.
    val A = Array(5.1f, 0.1f, 0f, 0f)
    val B = Array(-5.1f, 0.3f, 0f, 0f)
    val rows = (0L to 11L).map(i =>
      (i, if (i == 1L || i >= 8L) B else A))
    val df = rows.toDF("vec_id", "embedding")
    // iters = 0: raw sampled centroids — every A row ties between
    // clusters 0 and 2 and must take the LOWEST index
    val raw = Similarity.kmeansFit(df, "vec_id", "embedding",
      k = 3, iters = 0)
    assert(raw.map(_.toSeq).toSeq == Seq(A, B, A).map(_.map(_.toDouble).toSeq))
    val tied = Similarity.kmeansAssign(df, "vec_id", "embedding", raw)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tied.values.forall(_ != 2), "ties must keep the lowest index")
    assert(rows.filter(r => r._2.sameElements(A))
      .forall(r => tied(r._1) == 0))
    // iters = 1: cluster 2 received no rows (the tie), so its
    // centroid stays FROZEN at the raw double-cast of A, while
    // clusters 0/1 move onto the quantized grid
    val cents = Similarity.kmeansFit(df, "vec_id", "embedding",
      k = 3, iters = 1)
    val rawA = A.map(_.toDouble).toSeq
    assert(cents(2).toSeq == rawA,
      "empty cluster must keep its previous centroid")
    assert(cents(0).toSeq != rawA,
      "non-empty cluster must move to the quantized mean")
    // expected value through the SAME op chain the fit uses:
    // exact integer sum, then /1e6, then /n (7 A rows, 5 B rows)
    def gridMean(x: Float, n: Int): Double =
      math.floor(x.toDouble * 1e6) * n / 1e6 / n
    assert(cents(0)(0) == gridMean(A(0), 7) &&
      cents(1)(0) == gridMean(B(0), 5))
  }

  test("semdedup keeps the lowest id among in-cluster near-dups") {
    // k = 1: one cluster, all pairs compared. id1 = 2×id0 (cosine
    // exactly 1), id2 orthogonal (cosine 0)
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding",
      threshold = 0.9, k = 1, iters = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4)))
      .toMap
    assert(out(0L)._2 == 1L && out(0L)._4,
      "the lowest id of a dup pair must be kept")
    assert(out(1L)._2 == 1L && !out(1L)._4,
      "the higher id of a dup pair must be dropped")
    assert(out(2L)._2 == 0L && out(2L)._4)
    assert(out(2L)._3 == Some(0.0), "orthogonal max_cos is exactly 0")
    assert(out.values.forall(_._1 == 0), "k=1 puts everything in cluster 0")
    // flood cap: a cluster above maxCluster contributes no pairs —
    // its vectors keep everything and report no near-dups
    val capped = Dedup.semDedup(df, "vec_id", "embedding",
      threshold = 0.9, k = 1, iters = 1, maxCluster = 2)
      .collect().map(r => (r.getLong(2), r.get(3), r.getBoolean(4)))
    assert(capped.forall { case (n, mc, kp) => n == 0L && mc == null && kp })
  }

  test("cross-corpus semdedup flags corpus vectors near the reference") {
    import SparkSpec.spark.implicits._
    val reference = Seq((0L, Array(1f, 0f, 0f, 0f)), (5L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2f, 0f, 0f, 0f)),  // scaled copy of ref 0 -> cos 1
      (2L, Array(0f, 0f, 1f, 0f)))  // orthogonal to both refs
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedupAgainst(corpus, reference, "vec_id", "embedding",
      threshold = 0.9, k = 1, iters = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toMap
    assert(out(1L) == ((1L, Some(1.0), true)),
      "a scaled reference copy must be flagged with cosine exactly 1")
    assert(out(2L)._1 == 0L && !out(2L)._3)
    assert(out.size == 2, "one row per CORPUS vector only")
  }

  test("simhash flood cap drops degenerate chunk buckets only") {
    import SparkSpec.spark.implicits._
    // 20 identical docs share ALL four 16-bit chunks: every chunk
    // bucket holds 20 > cap and must drop from candidate generation.
    // The distinct near-pair (100, 101) lives in its own buckets and
    // must be untouched by the cap.
    val floodText = "mass duplicated boilerplate page body text here"
    val rows = (1L to 20L).map(i => (i, floodText)) ++ Seq(
      (100L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (101L, "alpha bravo charlie delta echo foxtrot golf india"))
    val df = rows.toDF("doc_id", "text")
    val capped = Dedup.simhashStats(df, "doc_id", "text", maxBucket = 10)
    assert(capped.count() == 22, "every doc keeps a stats row")
    val byId = capped.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 20L).forall(byId(_) == 0L),
      s"flood bucket must be dropped: $byId")
    val uncapped = Dedup.simhashStats(df, "doc_id", "text",
      maxBucket = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uncapped(1L) == 19L, "uncapped flood docs see all twins")
    assert(byId(100L) == uncapped(100L) && byId(101L) == uncapped(101L),
      "non-flood docs must be unaffected by the cap")
  }

  test("capped cross-corpus dedup is a recall-only subset of uncapped") {
    import SparkSpec.spark.implicits._
    // Planted flood: 5 identical corpus docs + their ref twin share
    // every band bucket, so the corpus-side bucket holds 5 > cap=4
    // and the cap must clear their flags; the distinct pair (c9, r9)
    // sits in size-1 buckets and must keep its flag. (The r6
    // embeddingStatsLsh pattern, extended to the two-corpus join —
    // the dedup_cross_corpus ORACLE runs uncapped, so the capped
    // path's contract is pinned here instead.)
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = ((1L to 5L).map(i => (s"c$i", boiler)) :+
      ("c9", "unique sentence about vermilion zeppelins and quartz here"))
      .toDF("doc_id", "text")
    val ref = Seq(
      ("r1", boiler),
      ("r9", "unique sentence about vermilion zeppelins and quartz there"))
      .toDF("doc_id", "text")
    def byId(maxBucket: Int) =
      Dedup.dedupAgainstStats(corpus, ref, "doc_id", "text",
        threshold = 0.5, maxBucket = maxBucket)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getBoolean(3))).toMap
    val un = byId(Int.MaxValue)
    val cap = byId(4)
    assert(un.keySet == cap.keySet && cap.size == 6,
      "one row per corpus doc either way")
    assert((1L to 5L).forall(i => un(s"c$i")._2),
      s"uncapped flags the boilerplate copies: $un")
    assert((1L to 5L).forall(i => !cap(s"c$i")._2 && cap(s"c$i")._1 == 0L),
      s"cap must clear the flooded bucket's candidates: $cap")
    assert(un("c9")._2 && cap("c9")._2,
      "the small bucket's true pair survives the cap")
    // recall-only: the cap never ADDS candidates or flags
    assert(cap.forall { case (k, (n, f)) =>
      n <= un(k)._1 && (!f || un(k)._2) })
  }

  test("cross-corpus dedup flags corpus docs near-duplicating the reference") {
    import SparkSpec.spark.implicits._
    val ref = Seq(
      ("r1", "the quick brown fox jumps over the lazy dog again and again"),
      ("r2", "completely unrelated reference material about databases")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // near-copy of r1 (one word changed)
      ("c1", "the quick brown fox jumps over the lazy cat again and again"),
      // exact copy of r2
      ("c2", "completely unrelated reference material about databases"),
      // nothing like the reference
      ("c3", "vermilion zeppelins quantify xylophones beneath jagged quartz")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstStats(corpus, ref, "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(3))).toMap
    assert(out.keySet == Set("c1", "c2", "c3"), "every corpus doc reports")
    assert(out("c1")._2, s"near-copy must flag: ${out("c1")}")
    assert(out("c2")._2, s"exact copy must flag: ${out("c2")}")
    assert(!out("c3")._2 && out("c3")._1 == 0L,
      s"unrelated doc must not flag: ${out("c3")}")
    // reference docs never appear in the output (one row per CORPUS doc)
    assert(!out.contains("r1") && !out.contains("r2"))
    // flood cap: with every bucket over the cap, candidate generation
    // drops to nothing — is_dup all false, rows still all present
    val capped = Dedup.dedupAgainstStats(corpus, ref, "doc_id", "text",
      threshold = 0.5, maxBucket = 0)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(capped.values.forall(v => !v) && capped.size == 3)
  }

  test("salted cluster resolution: star graph equals unsalted, no straggler task") {
    // Viral-cluster shape: every edge is incident to id 1, so the
    // unsalted per-round neighbor join puts ALL hot-key rows in the
    // task owning key 1's partition. saltBuckets=8 must (a) produce
    // the identical result set and (b) spread that key's rows so no
    // task reads a straggler-sized shuffle block.
    val n = 100000L
    val ids = spark.range(1, n + 2).toDF("id")
    val pairs = spark.range(2, n + 2)
      .select(lit(1L).as("ida"), col("id").as("idb"))
    // Force the scenario salting exists for: a label side too big to
    // broadcast and skew AQE doesn't resolve. At test scale the label
    // frame would be auto-broadcast (no shuffle on the hot key at
    // all), AQE's skew split would shave the straggler, and its
    // small-data coalescing would merge the tiny shuffles into one
    // task — each masks the spread this spec measures.
    // 64 shuffle partitions pins the regime salting is built for:
    // P >> salts, so the 8x-replicated label side spreads thin over
    // tasks while the unsalted hot key still lands in ONE task. (At
    // P ~ salts the replication cost dominates and salting loses —
    // see the operator doc.)
    val overrides = Map(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "64")
    val prev = overrides.keys.map(k => k -> spark.conf.get(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def run(salt: Int): (Array[(Long, Long)], Long) = {
        val max = new java.util.concurrent.atomic.AtomicLong(0L)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = t.taskMetrics
            if (m != null)
              max.getAndAccumulate(m.shuffleReadMetrics.recordsRead,
                (a: Long, b: Long) => math.max(a, b))
          }
        }
        spark.sparkContext.addSparkListener(listener)
        try {
          val out = Dedup.resolveClusters(ids, pairs, saltBuckets = salt)
            .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
          // listener events are async — poll until the max stabilizes
          var prev = -1L; var cur = max.get(); var spins = 0
          while (cur != prev && spins < 50) {
            Thread.sleep(100); prev = cur; cur = max.get(); spins += 1
          }
          (out, cur)
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      val (unsalted, maxUnsalted) = run(1)
      val (salted, maxSalted) = run(8)
      assert(salted.sameElements(unsalted),
        s"salted diverges: ${salted.zip(unsalted).find(p => p._1 != p._2)}")
      assert(unsalted.forall(_._2 == 1L), "star canonicalizes to hub id 1")
      // the unsalted straggler reads every hot-key edge row in one task
      assert(maxUnsalted >= n,
        s"expected an unsalted straggler >= $n, saw $maxUnsalted")
      assert(maxSalted <= maxUnsalted / 2,
        s"salting did not spread the hot key: salted max $maxSalted " +
          s"vs unsalted max $maxUnsalted")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("dedupResolve threads saltBuckets: salted output equals default") {
    val df = Tables.load(spark, sf, "documents").limit(60)
      .select(col("doc_id"), col("text"))
    def key(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    val plain = key(Dedup.dedupResolve(df, "doc_id", "text", threshold = 0.5))
    val salted = key(Dedup.dedupResolve(df, "doc_id", "text", threshold = 0.5,
      saltBuckets = 4))
    assert(plain.sameElements(salted), "saltBuckets changed the result set")
  }

  test("srp flood cap drops oversized buckets from candidate generation only") {
    // 20 identical vectors share one SRP bucket (a mass-dup flood);
    // two distinct near-orthogonal vectors elsewhere keep their rows
    val floodVec = Array.fill(4)(1.0f)
    val rows = (1L to 20L).map(i => (i, floodVec)) ++
      Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
          (101L, Array(0.9f, 0.1f, 0.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val capped = Dedup.embeddingStatsLsh(df, "vec_id", "embedding",
      threshold = 0.4, maxBucket = 10)
    // every vector still gets a stats row; flood vectors report 0
    assert(capped.count() == 22)
    val byId = capped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 20L).forall(byId(_) == 0L), "flood bucket not dropped")
    // the small bucket's pairs survive IF 100/101 share a bucket; at
    // minimum they are unaffected by the flood drop: uncapped equals
    // capped on the non-flood ids
    val uncapped = Dedup.embeddingStatsLsh(df, "vec_id", "embedding",
      threshold = 0.4, maxBucket = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(100L) == uncapped(100L) && byId(101L) == uncapped(101L))
    assert(uncapped(1L) == 19L, "uncapped flood vectors see all twins")
    // annLsh: capped drops the flood vectors' result rows entirely
    val annCapped = Similarity.annLsh(df, "vec_id", "embedding",
      maxBucket = 10)
    assert(annCapped.filter(col("vec_id") <= 20L).count() == 0)
    val annIds = annCapped.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val annUncappedIds = Similarity.annLsh(df, "vec_id", "embedding")
      .filter(col("vec_id") >= 100L).select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(annIds == annUncappedIds, "non-flood ids unaffected by cap")
  }

  test("materialization strategy is injectable: local/reliable/persist agree") {
    // the Materialize seam backs every dedup/ANN intermediate: the
    // default localCheckpoint is not executor-loss-tolerant at
    // cluster scale, so the strategy must be swappable per session —
    // and all strategies must produce the same rows. dedupResolve
    // exercises eager sites in the signature frame, the candidate
    // pairs, AND the iterative cluster propagation.
    val df = Tables.load(spark, sf, "documents").limit(60)
      .select(col("doc_id"), col("text"))
    def key(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    def under(mode: String)(body: => Array[(Long, Long, Boolean)]) = {
      spark.conf.set(graft.Materialize.ConfKey, mode)
      try body
      finally {
        spark.conf.unset(graft.Materialize.ConfKey)
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    val local = under("local") {
      key(Dedup.dedupResolve(df, "doc_id", "text", threshold = 0.5))
    }
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_ckdir").toString)
    val reliable = under("reliable") {
      key(Dedup.dedupResolve(df, "doc_id", "text", threshold = 0.5))
    }
    val persist = under("persist") {
      // the persist strategy must TRUNCATE the logical plan like the
      // checkpoint strategies do — the iterative operators' rounds
      // nest otherwise and the plan grows exponentially. Chained
      // materializations must keep the plan a constant-depth leaf.
      val once = graft.Materialize.eager(df)
      val twice = graft.Materialize.eager(once.filter(col("doc_id") >= 0))
      def depth(d: org.apache.spark.sql.DataFrame): Int =
        d.queryExecution.logical.collect { case n => n }.size
      assert(depth(twice) <= depth(once) + 2,
        s"persist must cut lineage: ${depth(once)} -> ${depth(twice)}")
      key(Dedup.dedupResolve(df, "doc_id", "text", threshold = 0.5))
    }
    assert(local.sameElements(reliable),
      "reliable checkpoint changed the result set")
    assert(local.sameElements(persist),
      "replicated persist changed the result set")
    // an unknown mode fails loudly, not silently-local
    val err = intercept[IllegalArgumentException] {
      under("turbo") {
        key(Dedup.dedupResolve(df, "doc_id", "text", threshold = 0.5))
      }
    }
    assert(err.getMessage.contains("local|reliable|persist"))
  }

  test("ann lsh plan contains no cartesian or nested-loop join") {
    val plan = Similarity.annLsh(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // and it still produces neighbors
    val n = Similarity.annLsh(Tables.load(spark, sf, "embeddings"),
      "vec_id", "embedding").count()
    assert(n > 0)
  }

  test("dedup savings charges exactly the non-keeper bytes, within source") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "aaaa", "s1"), (2L, "aaaa", "s1"), (3L, "bb", "s1"),
      (4L, "aaaa", "s2")) // same text in s2 — NOT charged across sources
      .toDF("doc_id", "text", "source")
    val out = Dedup.dedupSavings(docs, "doc_id", "text", "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(out == Seq(
      ("s1", 3L, 2L, 1L, 10L, 4L, 1.0 / 3),
      ("s2", 1L, 1L, 0L, 4L, 0L, 0.0)), out.toString)
  }

  test("simhash map-side first-chunk pair dedup equals the distinct formulation") {
    // the batch operator now decides "first surviving colliding
    // chunk" from the two simhashes + literal flood sets instead of
    // a distinct exchange (the 10x bench's only spill); this pins
    // exact equality against the old distinct formulation across
    // flood regimes, incl. caps small enough to drop real buckets
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.DataFrame
    import graft.functions.HashFunctions
    val real = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(300)
    // synthetic mixed-flood corpus: 8 identical (all buckets flood at
    // cap 5), 3 identical (qualify), 2 near variants
    val synth = ((1 to 8).map(i => (100L + i, "alpha beta gamma delta")) ++
      (1 to 3).map(i => (200L + i, "one two three four five")) ++
      Seq((301L, "one two three four six"), (302L, "alpha beta gamma echo")))
      .toDF("doc_id", "text")
    def reference(docs: DataFrame, maxBucket: Int): Seq[String] = {
      val hashed = docs.select(col("doc_id").as("id"),
        HashFunctions.simhash64(split(col("text"), " ")).as("simhash"))
      val chunkCols = (0 until 4).map { c =>
        struct(lit(c).as("chunk"), shiftrightunsigned(col("simhash"), c * 16)
          .bitwiseAND(lit(0xffffL)).as("cval"))
      }
      val allChunks = hashed
        .select(col("id"), col("simhash"),
          explode(array(chunkCols: _*)).as("cc"))
        .select(col("id"), col("simhash"),
          col("cc.chunk").as("chunk"), col("cc.cval").as("cval"))
      val chunks =
        if (maxBucket == Int.MaxValue) allChunks
        else {
          val flood = allChunks.groupBy("chunk", "cval")
            .agg(count(lit(1)).as("_n"))
            .filter(col("_n") > maxBucket).select("chunk", "cval")
          allChunks.join(broadcast(flood), Seq("chunk", "cval"), "left_anti")
        }
      val cand = chunks.as("a").join(chunks.as("b"),
          col("a.chunk") === col("b.chunk") &&
            col("a.cval") === col("b.cval") && col("a.id") < col("b.id"))
        .select(col("a.id").as("ida"), col("b.id").as("idb"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
            .as("hamming")).distinct()
      val both = cand.select(col("ida").as("id"), col("hamming"))
        .unionByName(cand.select(col("idb").as("id"), col("hamming")))
      val per = both.groupBy("id").agg(
        count(lit(1)).as("n_candidates"),
        sum(when(col("hamming") <= 8, 1L).otherwise(0L)).as("n_near"),
        min(col("hamming")).as("min_hamming"))
      hashed.join(per, Seq("id"), "left")
        .select(col("id"), col("simhash"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("n_near"), lit(0L)).as("n_near"),
          col("min_hamming"))
        .collect().map(_.toString).sorted.toSeq
    }
    for (docs <- Seq(real, synth); cap <- Seq(2, 5, Int.MaxValue)) {
      val got = Dedup.simhashStats(docs, "doc_id", "text", maxBucket = cap)
        .collect().map(_.toString).sorted.toSeq
      assert(got == reference(docs, cap), s"mismatch at maxBucket=$cap")
    }
  }

  test("multi-probe lsh recall dominates single-probe at the same stored index") {
    val e = Tables.load(spark, sf, "embeddings")
    val truth = Similarity.annBruteForce(e, "vec_id", "embedding")
    def meanRecall(approx: org.apache.spark.sql.DataFrame) =
      Similarity.annRecall(truth, approx)
        .agg(org.apache.spark.sql.functions.avg("recall")).head.getDouble(0)
    val single = meanRecall(Similarity.annLsh(e, "vec_id", "embedding"))
    val multi = meanRecall(Similarity.annLshMultiprobe(e, "vec_id", "embedding"))
    info(f"recall@5: single-probe $single%.4f  multi-probe $multi%.4f")
    // the probe set includes the own bucket, so the candidate pool is
    // a SUPERSET — recall can never drop (measured: 0.06 -> 0.25 at
    // sf0.01 defaults, a ~4x lift for one stored index)
    assert(multi >= single - 1e-12,
      f"multi-probe $multi%.4f lost to single-probe $single%.4f")
    // deterministic, no degenerate plan
    val plan = Similarity.annLshMultiprobe(e, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val a = Similarity.annLshMultiprobe(e, "vec_id", "embedding")
      .collect().map(_.toString).sorted
    val b = Similarity.annLshMultiprobe(e, "vec_id", "embedding")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("multi-probe flood cap: capped-bucket members still probe, never index") {
    import SparkSpec.spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    // pick a cap low enough that some SRP bucket floods at this SF
    // (64 buckets over the corpus — the largest is well above mean)
    val cap = math.max(1,
      (e.count() / 64).toInt) // mean bucket size; max bucket exceeds it
    val withB = e.select(org.apache.spark.sql.functions.col("vec_id"),
      graft.functions.VectorFunctions.srpBucket(
        org.apache.spark.sql.functions.col("embedding"), 6, 42L).as("bucket"))
    val flooded = withB.groupBy("bucket")
      .count().filter(org.apache.spark.sql.functions.col("count") > cap)
      .select("bucket").as[Int].collect().toSet
    assert(flooded.nonEmpty, s"fixture: no bucket exceeds $cap — lower the cap")
    val floodMembers = withB
      .filter(org.apache.spark.sql.functions.col("bucket")
        .isInCollection(flooded))
      .select("vec_id").as[Long].collect().toSet
    val out = Similarity
      .annLshMultiprobe(e, "vec_id", "embedding", maxBucket = cap)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // index-side exclusion: a capped bucket's members are never
    // REPORTED as neighbors (probing into one finds nothing)
    assert(out.forall { case (_, nb) => !floodMembers.contains(nb) },
      "flood-capped vectors must not be indexed")
    // probe-side inclusion: capped members still PROBE their
    // Hamming-1 neighborhoods and keep that recall
    assert(out.exists { case (v, _) => floodMembers.contains(v) },
      "capped-bucket members must still find neighbors via probes")
  }

  test("containment scores a quoted fragment near 1 where Jaccard stays low") {
    import SparkSpec.spark.implicits._
    // doc 1 is a fragment fully contained in the much longer doc 2:
    // every 5-shingle of doc 1 appears in doc 2, so containment(1->2)
    // = 1.0 while Jaccard is |S1|/|S2| (small). doc 3 is unrelated.
    val frag = "the quick brown fox jumps over the lazy dog"
    val page = ("unrelated preamble text here and then " + frag +
      " followed by a long tail of other words entirely") * 1
    val docs = Seq((1L, frag), (2L, page),
      // alphabet-disjoint from every 5-gram of docs 1-2
      (3L, "zzzzz qqqqq zzzzz qqqqq zzzzz qqqqq zzzzz"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramContainmentStats(docs, "doc_id", "text",
        maxDf = 20, threshold = 0.9)
      .orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getLong(d1.fieldIndex("n_candidates")) == 1L, d1.toString)
    assert(d1.getDouble(d1.fieldIndex("max_containment")) == 1.0,
      "fragment fully contained")
    assert(d1.getLong(d1.fieldIndex("n_contained")) == 1L)
    val d2 = out(1)
    // the long page's own containment in the fragment is |S1|/|S2| < 0.9
    assert(d2.getDouble(d2.fieldIndex("max_containment")) < 0.9 &&
      d2.getLong(d2.fieldIndex("n_contained")) == 0L, d2.toString)
    // cross-check the asymmetry against the symmetric Jaccard operator
    val jac = Dedup.ngramJaccardStats(docs, "doc_id", "text", maxDf = 20)
      .orderBy("doc_id").collect()
    val j1 = jac(0)
    assert(j1.getDouble(j1.fieldIndex("max_jaccard")) < 0.9,
      "Jaccard must miss the subset duplication containment catches")
    // unrelated doc: no candidates, null max
    val d3 = out(2)
    assert(d3.getLong(d3.fieldIndex("n_candidates")) == 0L &&
      d3.isNullAt(d3.fieldIndex("max_containment")), d3.toString)
  }

  test("winnow overlap: shared-print pairs score directional MOSS overlap; prod hash keeps the plan") {
    import graft.operators.TextAnalysis
    // planted shared substring >= w + k - 1 = 11 chars: winnowing
    // GUARANTEES docs 1 and 2 share a print, so the overlap operator
    // must pair them; doc 2 is mostly the shared region (its
    // directional score dominates doc 1's — MOSS's partial-copy
    // asymmetry); doc 3 is alphabet-disjoint; 4/5 below the domain
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, "PREFIX aaaa " + shared + " SUFFIX bbbb with a long tail " +
        "of further unrelated padding words stretching onward"),
      (2L, "zz " + shared + " qq"),
      (3L, "zzzzz qqqqq wwwww qqqqq zzzzz qqqqq wwwww eeeee rrrrr"),
      (4L, "short"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.winnowOverlapStats(docs, "doc_id", "text",
        k = 8, w = 4, maxDf = 20, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    // ground truth recomputed from the print sets directly
    val prints = TextAnalysis.winnowFingerprints(docs, "doc_id", "text",
        k = 8, w = 4)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val sh12 = (prints(1L) & prints(2L)).size.toDouble
    assert(sh12 >= 1, "planted guarantee: docs 1/2 must share a print")
    assert((prints(3L) & (prints(1L) ++ prints(2L))).isEmpty)
    val d1 = out(1L); val d2 = out(2L)
    assert(d1.getLong(1) == 1L && d2.getLong(1) == 1L,
      s"exactly the planted pair: $d1 $d2")
    assert(d1.getDouble(3) == sh12 / prints(1L).size, d1.toString)
    assert(d2.getDouble(3) == sh12 / prints(2L).size, d2.toString)
    assert(d2.getDouble(3) > d1.getDouble(3),
      "the mostly-shared doc's directional overlap must dominate")
    // n_overlapping folds the same threshold the scores imply
    assert(d1.getLong(2) == (if (d1.getDouble(3) >= 0.5) 1L else 0L))
    assert(d2.getLong(2) == (if (d2.getDouble(3) >= 0.5) 1L else 0L))
    // out-of-domain and unrelated docs: zero candidates, null max
    Seq(3L, 4L, 5L).foreach { id =>
      assert(out(id).getLong(1) == 0L && out(id).isNullAt(3), out(id).toString)
    }
    // production xxhash64 variant: IDENTICAL optimized plan shape
    // (the hash literal is the only difference — no extra shuffle,
    // projection, or exchange sneaks in) and the same guarantee
    def shape(q: org.apache.spark.sql.DataFrame): Seq[String] =
      q.queryExecution.optimizedPlan.collect { case n => n.nodeName }
    assert(
      shape(TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 8, 4,
        prodHash = true)) ==
      shape(TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 8, 4)),
      "prod-hash sibling must not change the plan shape")
    val prodOut = Dedup.winnowOverlapStats(docs, "doc_id", "text",
        k = 8, w = 4, maxDf = 20, threshold = 0.5, prodHash = true)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(prodOut(1L).getLong(1) == 1L && prodOut(2L).getLong(1) == 1L,
      "the winnowing guarantee is hash-agnostic")
    assert(prodOut(2L).getDouble(3) > prodOut(1L).getDouble(3))
  }
}
