package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.operators.Events
import graft.pipeline.MergeTable
import graft.streaming.StreamingIngest

/** The incremental dedup/ANN members on keyed state (r22: split
  * from StreamingSpec for test-JVM sharding; no test was changed or
  * removed).
  */
class StreamingIncrementalDedupSpec extends SparkSpec {
  test("incremental minhash on bucketed delta-log state: folds prune to touched buckets, gold equals batch, crashes replay") {
    // Task: the incremental members' state/gold merges on the
    // BucketedTableFormat layout — key-hash bucket partition columns
    // over delta-log pruned commits, so a small fold rewrites only
    // the buckets holding its touched keys instead of the whole
    // state table (the r15-measured fold cost was dominated by
    // snapshot whole-table state merges). Pins: (a) gold equals the
    // batch recompute after every fold; (b) the small fold's docs
    // state commit REMOVES strictly fewer files than were live —
    // untouched buckets' files survive (the pruning, asserted on
    // disk, not argued); (c) crash replay (state advanced, gold
    // rolled back, batch redelivered) converges; (d) a hard-delete
    // feed folds through the stats-pruned delete path.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val sfmt = graft.pipeline.BucketedTableFormat(buckets = 8)
    val stateDir = Files.createTempDirectory("graft_bk_state").toString
    val gold = Files.createTempDirectory("graft_bk_gold").toString + "/t"
    val P = (3, 16, 4, 0.5, 10) // n, numPerm, bands, threshold, maxBucket
    var corpus = Map.empty[Long, String]
    def foldBatch(ord: Long, rows: (Long, String)*): Unit = {
      corpus ++= rows.toMap
      Dedup.minhashLshStatsIncremental(spark,
        rows.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        stateDir, gold, batchOrd = ord, n = P._1, numPerm = P._2,
        bands = P._3, threshold = P._4, maxBucket = P._5, fmt = sfmt)
    }
    def checkGoldEqualsBatch(label: String): Unit = {
      val truth = Dedup.minhashLshStats(
        corpus.toSeq.toDF("doc_id", "text").filter(col("text").isNotNull),
        "doc_id", "text", n = P._1, numPerm = P._2, bands = P._3,
        threshold = P._4, maxBucket = P._5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      val got = sfmt.read(spark, gold)
        .select(col("id"), col("n_candidates"), col("n_near"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    // fold 1: a 30-doc corpus spread over many buckets (catch-up)
    foldBatch(0L, ((1L, dupText) +: (2L to 30L).map(i =>
      (i, s"filler words number $i distinct content piece"))): _*)
    checkGoldEqualsBatch("after catch-up fold")
    val docsPath = s"$stateDir/docs"
    val liveBefore = {
      val v = graft.pipeline.DeltaLogTableFormat.currentVersion(docsPath).get
      sfmt.read(spark, docsPath).count() // sanity: table readable
      v
    }
    // fold 2: ONE new near-duplicate of doc 1 — touches one key's
    // bucket; with 8 buckets and 30 keys spread across them, the
    // pruned commit must leave most live files untouched
    foldBatch(1L, (31L, dupText))
    checkGoldEqualsBatch("after single-doc increment")
    assert(sfmt.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_near") == 1L, "doc 1 must gain its partner")
    val logDir = java.nio.file.Paths.get(docsPath, "_delta_log")
    // commit files only — the log dir also holds the format's
    // _graft_buckets.json layout sidecar
    val mergeCommit = java.nio.file.Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toInt).max
    val commitLines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(docsPath, "_delta_log", f"$mergeCommit%020d.json"))
      .asScala.filter(_.nonEmpty)
    val removed = commitLines.count(_.contains("\"remove\""))
    val priorLive = graft.pipeline.DeltaLogTableFormat
      .readVersion(spark, docsPath, liveBefore).inputFiles.length
    assert(removed > 0 && removed < priorLive,
      s"fold-2 docs commit must rewrite only touched buckets: removed " +
        s"$removed of $priorLive live files (whole-table rewrite = all)")
    // the layout column never leaks through the format's reader
    assert(!sfmt.read(spark, docsPath).columns
        .contains(graft.pipeline.BucketedTableFormat.BucketCol))
    // crash replay: state advanced, gold rolled back, batch redelivered
    def copyDir(from: String, to: String): Unit = {
      val src = Paths.get(from)
      scala.util.Using.resource(java.nio.file.Files.walk(src)) { st =>
        st.forEach { p =>
          val dest = Paths.get(to).resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(dest)
          else java.nio.file.Files.copy(p, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    def deleteDir(d: String): Unit = {
      val p = Paths.get(d)
      if (java.nio.file.Files.exists(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
          st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => java.nio.file.Files.delete(f))
        }
    }
    val goldBackup = Files.createTempDirectory("graft_bk_gbak").toString + "/t"
    copyDir(gold, goldBackup)
    foldBatch(2L, (32L, dupText)) // state AND gold advance
    deleteDir(gold); copyDir(goldBackup, gold) // gold rolled back
    foldBatch(2L, (32L, dupText)) // redelivery: same batch, same ord
    checkGoldEqualsBatch("after crash-replay")
    assert(sfmt.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_near") == 2L,
      "replay must re-verify the untouched old doc 1")
    // hard-delete feed through the stats-pruned delete path
    corpus -= 31L
    Dedup.minhashLshStatsIncremental(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      stateDir, gold, batchOrd = 3L, n = P._1, numPerm = P._2,
      bands = P._3, threshold = P._4, maxBucket = P._5,
      deletes = Some(Seq(31L).toDF("doc_id")), fmt = sfmt)
    checkGoldEqualsBatch("after hard delete")
    assert(sfmt.read(spark, gold).filter(col("id") === 31L).count() == 0)
  }

  test("incremental near-dup collapse: 100x-duplicated corpus folds at distinct-content pair cost, gold equals batch") {
    // The sf10 probe's killer shape fed to the INCREMENTAL minhash
    // member: every document duplicated 100x, every bucket
    // 100x-degenerate yet BELOW the flood cap — the regime where the
    // pre-collapse doc-level state paid pair cost quadratic in the
    // duplication factor (the last batch-vs-streaming scale
    // asymmetry). Two asserts: (a) gold equals the batch operator's
    // recompute after every fold (value-exactness of the collapse),
    // and (b) no stage of the fold shuffles more than a small LINEAR
    // multiple of the doc count — the doc-level formulation's pair
    // stage alone would shuffle ~bands * (dup^2) * families ≈ 10^6
    // records here (100^2 per band bucket), two orders of magnitude
    // past the bound.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val fmt = graft.pipeline.SnapshotTableFormat
    val stateDir = Files.createTempDirectory("graft_cl_state").toString
    val gold = Files.createTempDirectory("graft_cl_gold").toString + "/t"
    val P = (3, 16, 4, 0.5, 1000000) // n, numPerm, bands, threshold, maxBucket
    val dup = 100
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta iota", // near-dup of [0]
      "one two three four five six seven eight",
      "unrelated corpus words some other line here now")
    def family(t: Int, base: Long): Seq[(Long, String)] =
      (0 until dup).map(i => (base + i, texts(t)))
    val batch1 = family(0, 100L) ++ family(2, 300L)
    val batch2 = family(1, 500L) ++ family(3, 700L)
    var seen = Seq.empty[(Long, String)]

    def fold(b: Seq[(Long, String)], ord: Long): Unit =
      Dedup.minhashLshStatsIncremental(spark, b.toDF("doc_id", "text"),
        "doc_id", "text", stateDir, gold, batchOrd = ord,
        n = P._1, numPerm = P._2, bands = P._3,
        threshold = P._4, maxBucket = P._5)
    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_near"),
        Option(r.get(r.fieldIndex("max_jaccard"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)
    def checkGoldEqualsBatch(label: String): Unit = {
      val truth = stats(Dedup.minhashLshStats(
        seen.toDF("doc_id", "text"), "doc_id", "text",
        n = P._1, numPerm = P._2, bands = P._3,
        threshold = P._4, maxBucket = P._5), "doc_id")
      val got = stats(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth, s"$label: collapse must be value-exact " +
        s"(first diff: ${got.zip(truth).find(p => p._1 != p._2)})")
    }

    seen ++= batch1
    fold(batch1, 0L)
    checkGoldEqualsBatch("after batch 1 (200 docs, 2 distinct contents)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 100L)
        .head.getAs[Long]("n_near") == (dup - 1).toLong,
      "a duplicated doc must see its whole family")

    // fold 2 under a per-stage shuffle meter: old family [0] gains
    // 100 near partners (family [1]) — a two-family re-verify — and
    // the heaviest stage must stay linear in docs
    val maxStage = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null)
          maxStage.getAndAccumulate(m.shuffleWriteMetrics.recordsWritten,
            (a: Long, b: Long) => math.max(a, b))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      seen ++= batch2
      fold(batch2, 1L)
      // listener events are async — poll until the max stabilizes
      var prev = -1L; var cur = maxStage.get(); var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(100); prev = cur; cur = maxStage.get(); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    checkGoldEqualsBatch("after batch 2 (400 docs, 4 distinct contents)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 100L)
        .head.getAs[Long]("n_near") == (2 * dup - 1).toLong,
      "old docs must gain the whole near family without being in the batch")
    val docs = seen.size.toLong
    assert(maxStage.get() <= 10L * docs,
      s"pair work must scale with distinct contents, not docs: heaviest " +
        s"stage shuffled ${maxStage.get()} records for $docs docs " +
        s"(doc-level pairing would shuffle ~10^6)")

    // the RESOLVE member on the same killer shape: group-keyed edges
    // (star per touched group + anchor edges) must land the exact
    // batch-resolve labels across both folds
    val rState = Files.createTempDirectory("graft_cl_rstate").toString
    val rGold = Files.createTempDirectory("graft_cl_rgold").toString + "/t"
    Dedup.dedupResolveIncremental(spark, batch1.toDF("doc_id", "text"),
      "doc_id", "text", rState, rGold, batchOrd = 0L,
      n = P._1, numPerm = P._2, bands = P._3,
      threshold = P._4, maxBucket = P._5)
    Dedup.dedupResolveIncremental(spark, batch2.toDF("doc_id", "text"),
      "doc_id", "text", rState, rGold, batchOrd = 1L,
      n = P._1, numPerm = P._2, bands = P._3,
      threshold = P._4, maxBucket = P._5)
    val truthLabels = Dedup.dedupResolve(seen.toDF("doc_id", "text"),
        "doc_id", "text", n = P._1, numPerm = P._2, bands = P._3,
        threshold = P._4, maxBucket = P._5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val goldLabels = MergeTable.read(spark, rGold)
      .select(col("id"), col("canonical"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(goldLabels == truthLabels,
      s"resolve labels must equal batch recompute on the duplicated " +
        s"corpus (first diff: ${goldLabels.zip(truthLabels).find(p => p._1 != p._2)})")
  }

  test("incremental containment stats: streamed gold equals batch recompute, updates retract, crashes replay") {
    // CONTAINMENT member of the incremental family: per-doc
    // directional-containment stats maintained across micro-batches
    // must equal Dedup.ngramContainmentStats over silver-current
    // after every fold. The scenario exercises the asymmetry the
    // member exists for: a short fragment contained in a long page
    // (containment(frag->page) ~ 1 where Jaccard is low), an OLD doc
    // gaining a partner, an UPDATE retracting one, a crash between
    // the state and gold merges, a hard delete, and update-to-null.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_ct_silver").toString
    val stateDir = Files.createTempDirectory("graft_ct_state").toString
    val gold = Files.createTempDirectory("graft_ct_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_ct_ck").toString
    val P = (3, 20, 0.5) // n, maxDf, threshold

    def fold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, v) =>
        Dedup.containmentStatsIncremental(spark,
          chg.select("doc_id", "text"), "doc_id", "text",
          stateDir, gold, batchOrd = v.toLong,
          n = P._1, maxDf = P._2, threshold = P._3)
      }
    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_contained"),
        Option(r.get(r.fieldIndex("max_containment"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)
    def checkGoldEqualsBatch(label: String): Unit = {
      val truth = stats(Dedup.ngramContainmentStats(
        fmt.read(spark, silver).select("doc_id", "text")
          .filter(col("text").isNotNull), "doc_id", "text",
        n = P._1, maxDf = P._2, threshold = P._3), "doc_id")
      val got = stats(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    val page = "the quick brown fox jumps over the lazy dog"
    val frag = "quick brown fox"
    // batch 1: fragment 2 inside page 1; doc 3 unrelated
    fmt.scd1Merge(spark, silver, Seq(
        (1L, page, 0), (2L, frag, 0), (3L, "zzz yyy xxx www vvv", 0))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 1")
    assert(MergeTable.read(spark, gold).filter(col("id") === 2L)
        .head.getAs[Long]("n_contained") == 1L,
      "the fragment must report containment in the page")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_contained") == 0L,
      "the page is NOT contained in its fragment (asymmetry)")

    // batch 2: doc 4, another fragment of the page — OLD docs 1,2
    // must gain a partner without being in the batch
    fmt.scd1Merge(spark, silver,
      Seq((4L, "brown fox jumps over", 1)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 2 (old docs gain a partner)")

    // batch 3: doc 2's UPDATE leaves the family — the page loses a
    // contained partner via the content-hash retraction
    fmt.scd1Merge(spark, silver,
      Seq((2L, "totally different words now", 2))
        .toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 3 (update retracts a partnership)")

    // CRASH REPLAY: batch 4 duplicates doc 3's text, then gold is
    // rolled back to the pre-batch snapshot (state kept) and the
    // batch redelivered — the signature check must re-flag doc 3
    def copyDir(from: String, to: String): Unit = {
      val src = Paths.get(from)
      scala.util.Using.resource(java.nio.file.Files.walk(src)) { st =>
        st.forEach { p =>
          val dest = Paths.get(to).resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(dest)
          else java.nio.file.Files.copy(p, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    def deleteDir(d: String): Unit = {
      val p = Paths.get(d)
      if (java.nio.file.Files.exists(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
          st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => java.nio.file.Files.delete(f))
        }
    }
    val goldBackup = Files.createTempDirectory("graft_ct_gbak").toString + "/t"
    copyDir(gold, goldBackup)
    val b4 = Seq((5L, "zzz yyy xxx www vvv", 3)).toDF("doc_id", "text", "ord")
    fmt.scd1Merge(spark, silver, b4, Seq("doc_id"), "ord",
      compareExclude = Nil)
    Dedup.containmentStatsIncremental(spark, b4.select("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 3L,
      n = P._1, maxDf = P._2, threshold = P._3)
    deleteDir(gold); copyDir(goldBackup, gold) // gold rolled back, state kept
    assert(fold().nonEmpty, "the crashed batch must be redelivered")
    checkGoldEqualsBatch("after crash-replay of batch 4")
    assert(MergeTable.read(spark, gold).filter(col("id") === 3L)
        .head.getAs[Long]("n_contained") == 1L,
      "replay must still re-verify the untouched old doc 3")

    assert(fold().isEmpty, "caught-up consumer must re-process nothing")
    checkGoldEqualsBatch("after no-op fold")

    // hard DELETE feed: doc 4 leaves — the page loses that partner
    val delIds = Seq(4L).toDF("doc_id")
    fmt.deleteKeys(spark, silver, delIds, Seq("doc_id"))
    Dedup.containmentStatsIncremental(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 4L,
      n = P._1, maxDf = P._2, threshold = P._3, deletes = Some(delIds))
    checkGoldEqualsBatch("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("id") === 4L).count() == 0,
      "the deleted doc's gold row must disappear")

    // update TO null retracts like a delete
    fmt.scd1Merge(spark, silver,
      Seq((3L, null.asInstanceOf[String], 5)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    Dedup.containmentStatsIncremental(spark,
      Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 5L,
      n = P._1, maxDf = P._2, threshold = P._3)
    checkGoldEqualsBatch("after update-to-null retraction")
    assert(MergeTable.read(spark, gold).filter(col("id") === 3L).count() == 0,
      "the nulled doc's gold row must disappear")
  }

  test("incremental jaccard stats: gold equals batch recompute, state interops with containment") {
    // JACCARD member: same posting state and staleness machinery as
    // the containment member (shared implementation — the crash
    // replay and append-only contracts are proven there), so this
    // spec pins what is NEW: the symmetric score against the batch
    // operator after inserts, an old doc gaining a partner, an
    // update retraction and a hard delete — then proves the state
    // dir is READABLE BY THE OTHER MEMBER (same docs/shingles
    // tables, different gold).
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_jc_silver").toString
    val stateDir = Files.createTempDirectory("graft_jc_state").toString
    val gold = Files.createTempDirectory("graft_jc_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_jc_ck").toString
    val P = (3, 20, 0.1) // n, maxDf, threshold

    def fold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, v) =>
        Dedup.jaccardStatsIncremental(spark,
          chg.select("doc_id", "text"), "doc_id", "text",
          stateDir, gold, batchOrd = v.toLong,
          n = P._1, maxDf = P._2, threshold = P._3)
      }
    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_near"),
        Option(r.get(r.fieldIndex("max_jaccard"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)
    def checkGoldEqualsBatch(label: String): Unit = {
      val truth = stats(Dedup.ngramJaccardStats(
        fmt.read(spark, silver).select("doc_id", "text")
          .filter(col("text").isNotNull), "doc_id", "text",
        n = P._1, maxDf = P._2, threshold = P._3), "doc_id")
      val got = stats(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox jumps over the lazy cat"
    // batch 1: near-dup pair (high symmetric Jaccard) + unrelated
    fmt.scd1Merge(spark, silver, Seq(
        (1L, a, 0), (2L, b, 0), (3L, "zzz yyy xxx www vvv", 0))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 1")
    val g1 = MergeTable.read(spark, gold).filter(col("id") === 1L).head
    assert(g1.getAs[Long]("n_near") == 1L &&
      g1.getAs[Double]("max_jaccard") > 0.5,
      s"near-dup pair must score high symmetric jaccard: $g1")

    // batch 2: doc 4 near both — OLD docs 1,2 gain a partner
    fmt.scd1Merge(spark, silver,
      Seq((4L, "quick brown fox jumps over the lazy", 1))
        .toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 2 (old docs gain a partner)")

    // batch 3: doc 2's update leaves the family
    fmt.scd1Merge(spark, silver,
      Seq((2L, "totally different words now", 2))
        .toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 3 (update retracts a partnership)")

    // CRASH REPLAY through the JACCARD member ITSELF (the shared
    // implementation's crash contract is proven in the containment
    // spec; this closes the inheritance gap): doc 5 arrives as a
    // near-dup of doc 2's new text, state AND gold advance, then
    // gold rolls back to its pre-batch snapshot — the on-disk
    // aftermath of a consumer that merged state but crashed before
    // the gold merge. Re-running the same fold (same batchOrd) must
    // re-flag the untouched mate via the signature-vs-current-state
    // check and converge gold back to the batch truth.
    def copyDir(from: String, to: String): Unit = {
      val src = Paths.get(from)
      scala.util.Using.resource(java.nio.file.Files.walk(src)) { st =>
        st.forEach { p =>
          val dest = Paths.get(to).resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(dest)
          else java.nio.file.Files.copy(p, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    def deleteDir(d: String): Unit = {
      val p = Paths.get(d)
      if (java.nio.file.Files.exists(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
          st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => java.nio.file.Files.delete(f))
        }
    }
    val goldBackup = Files.createTempDirectory("graft_jc_gbak").toString + "/t"
    copyDir(gold, goldBackup)
    val b3b = Seq((5L, "totally different words here", 3))
      .toDF("doc_id", "text", "ord")
    fmt.scd1Merge(spark, silver, b3b, Seq("doc_id"), "ord",
      compareExclude = Nil)
    Dedup.jaccardStatsIncremental(spark, b3b.select("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 3L,
      n = P._1, maxDf = P._2, threshold = P._3)
    deleteDir(gold); copyDir(goldBackup, gold) // gold rolled back, state kept
    Dedup.jaccardStatsIncremental(spark, b3b.select("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 3L,
      n = P._1, maxDf = P._2, threshold = P._3)
    checkGoldEqualsBatch("after crash-replay of batch 3b")
    assert(MergeTable.read(spark, gold).filter(col("id") === 2L)
        .head.getAs[Long]("n_near") == 1L,
      "replay must still re-verify the untouched old doc 2")

    // hard delete: doc 4 leaves — doc 1 loses its last partner
    val delIds = Seq(4L).toDF("doc_id")
    fmt.deleteKeys(spark, silver, delIds, Seq("doc_id"))
    Dedup.jaccardStatsIncremental(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 4L,
      n = P._1, maxDf = P._2, threshold = P._3, deletes = Some(delIds))
    checkGoldEqualsBatch("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("id") === 4L).count() == 0)

    // STATE INTEROP: the containment member reads THIS state dir
    // (same docs/shingles tables) into its own gold and matches its
    // own batch operator — one inverted index serves both verdicts
    val contGold = Files.createTempDirectory("graft_jc_cgold").toString + "/t"
    val current = fmt.read(spark, silver)
      .filter(col("text").isNotNull).select("doc_id", "text")
    Dedup.containmentStatsIncremental(spark, current, "doc_id", "text",
      stateDir, contGold, batchOrd = 6L,
      n = P._1, maxDf = P._2, threshold = 0.5)
    val contTruth = Dedup.ngramContainmentStats(current, "doc_id", "text",
        n = P._1, maxDf = P._2, threshold = 0.5)
      .collect().map(_.toString).sorted.toSeq
    val contGot = MergeTable.read(spark, contGold)
      .select(col("id").as("doc_id"), col("n_candidates"),
        col("n_contained"), col("max_containment"))
      .collect().map(_.toString).sorted.toSeq
    assert(contGot == contTruth,
      s"containment over shared state: $contGot vs $contTruth")
  }

  test("incremental winnow stats: gold equals batch recompute, printless docs, append-only path") {
    // WINNOW member (the 11th): the shared posting implementation
    // with the per-doc hash set swapped to winnow prints. Crash
    // replay / delete / resync contracts are the shared machinery
    // proven by the containment spec; this pins what is NEW —
    // (a) the MOSS overlap verdict equals Dedup.winnowOverlapStats
    // over silver-current after every fold, (b) PRINTLESS short docs
    // (no prints — outside the algorithm's domain) still get a gold
    // row with 0 candidates / null max and retract cleanly on
    // update, (c) the append-only fast path handles a printless
    // batch doc (it touches no posting bucket yet must land a gold
    // row this fold).
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_wn_silver").toString
    val stateDir = Files.createTempDirectory("graft_wn_state").toString
    val gold = Files.createTempDirectory("graft_wn_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_wn_ck").toString
    val P = (4, 3, 20, 0.5) // k, w, maxDf, threshold — printless under 6 chars

    def fold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, v) =>
        Dedup.winnowStatsIncremental(spark,
          chg.select("doc_id", "text"), "doc_id", "text",
          stateDir, gold, batchOrd = v.toLong,
          k = P._1, w = P._2, maxDf = P._3, threshold = P._4)
      }
    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_overlapping"),
        Option(r.get(r.fieldIndex("max_overlap"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)
    def checkGoldEqualsBatch(label: String): Unit = {
      val truth = stats(Dedup.winnowOverlapStats(
        fmt.read(spark, silver).select("doc_id", "text")
          .filter(col("text").isNotNull), "doc_id", "text",
        k = P._1, w = P._2, maxDf = P._3, threshold = P._4), "doc_id")
      val got = stats(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    val page = "the quick brown fox jumps over the lazy dog"
    val frag = "quick brown fox jumps"
    // batch 1: fragment inside page (shared substring >> w + k - 1 =
    // 6 chars, so they MUST share a print), an unrelated doc, and a
    // PRINTLESS 4-char doc
    fmt.scd1Merge(spark, silver, Seq(
        (1L, page, 0), (2L, frag, 0), (3L, "zzz yyy xxx www vvv", 0),
        (4L, "tiny", 0))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 1")
    val g2 = MergeTable.read(spark, gold).filter(col("id") === 2L).head
    assert(g2.getAs[Long]("n_overlapping") == 1L &&
      g2.getAs[Double]("max_overlap") >= 0.5,
      s"the fragment must report winnow overlap into the page: $g2")
    val g4 = MergeTable.read(spark, gold).filter(col("id") === 4L).head
    assert(g4.getAs[Long]("n_candidates") == 0L &&
      g4.isNullAt(g4.fieldIndex("max_overlap")),
      s"a printless doc must report 0 candidates / null max: $g4")

    // batch 2: the printless doc grows text that shares the page's
    // substring — OLD doc 1 gains a partner via the retract+reinsert
    fmt.scd1Merge(spark, silver,
      Seq((4L, "jumps over the lazy dog", 1)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 2 (printless doc grows prints)")

    // batch 3: doc 2's update shrinks it BELOW the print domain —
    // the page loses a partner and doc 2 must go printless, not stale
    fmt.scd1Merge(spark, silver,
      Seq((2L, "abc", 2)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 3 (update to printless retracts)")

    // hard delete flows through like the siblings
    val delIds = Seq(4L).toDF("doc_id")
    fmt.deleteKeys(spark, silver, delIds, Seq("doc_id"))
    Dedup.winnowStatsIncremental(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 4L,
      k = P._1, w = P._2, maxDf = P._3, threshold = P._4,
      deletes = Some(delIds))
    checkGoldEqualsBatch("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("id") === 4L).count() == 0)

    // APPEND-ONLY fast path on fresh state: batch 2 carries a
    // printless doc (touches no bucket — the explicit batch-group
    // union must still land its gold row) plus a near-copy that
    // makes OLD docs re-verify
    val base = graft.pipeline.SnapshotTableFormat
    val stA = Files.createTempDirectory("graft_wn_stA").toString
    val goA = Files.createTempDirectory("graft_wn_goA").toString + "/t"
    val batches = Seq(
      Seq((1L, page), (3L, "zzz yyy xxx www vvv")),
      Seq((5L, "tiny"), (6L, frag)))
    var seen = Seq.empty[(Long, String)]
    batches.zipWithIndex.foreach { case (b, i) =>
      seen ++= b
      Dedup.winnowStatsIncremental(spark, b.toDF("doc_id", "text"),
        "doc_id", "text", stA, goA, batchOrd = i.toLong,
        k = P._1, w = P._2, maxDf = P._3, threshold = P._4,
        appendOnly = true, fmt = base)
      val truth = stats(Dedup.winnowOverlapStats(
        seen.toDF("doc_id", "text"), "doc_id", "text",
        k = P._1, w = P._2, maxDf = P._3, threshold = P._4), "doc_id")
      val got = stats(MergeTable.read(spark, goA)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth,
        s"append-only batch $i: ${got.mkString("; ")} vs ${truth.mkString("; ")}")
    }
  }

  test("incremental span stats: gold equals batch recompute, qualification flips retract, crash replays") {
    // SPAN member (the 12th): per-doc duplicated-span stats
    // maintained across micro-batches must equal
    // TextAnalysis.spanDedupStats over silver-current after every
    // fold. Own implementation (group-keyed positional print state,
    // q = total docs >= 2 per print, per-group island re-fold), so
    // this spec exercises its own contracts: a duplicate ARRIVING
    // flips q false->true for an old doc's prints (whole-doc spans
    // appear), an update retracts a partnership (q true->false — the
    // surviving doc's spans must retract), a crash between the state
    // and gold merges replays via the q-flip signature, a hard
    // delete drops df back under 2, update-to-null retracts, and a
    // printless doc holds a 0/0/null row throughout.
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_sp_silver").toString
    val stateDir = Files.createTempDirectory("graft_sp_state").toString
    val gold = Files.createTempDirectory("graft_sp_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_sp_ck").toString
    val P = (4, 3, 10) // k, w, minSpan

    def fold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, v) =>
        TextAnalysis.spanStatsIncremental(spark,
          chg.select("doc_id", "text"), "doc_id", "text",
          stateDir, gold, batchOrd = v.toLong,
          k = P._1, w = P._2, minSpan = P._3)
      }
    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("n_dup_spans"), r.getAs[Long]("dup_chars"),
        Option(r.get(r.fieldIndex("max_span_len"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)
    def checkGoldEqualsBatch(label: String): Unit = {
      val truth = stats(TextAnalysis.spanDedupStats(
        fmt.read(spark, silver).select("doc_id", "text")
          .filter(col("text").isNotNull), "doc_id", "text",
        k = P._1, w = P._2, minSpan = P._3), "doc_id")
      val got = stats(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    val page = "the quick brown fox jumps over the lazy dog"
    val frag = "quick brown fox jumps"
    val uniq = "zzzz yyyy xxxx wwww vvvv"
    // batch 1: fragment inside page (shared span), unrelated doc,
    // printless doc
    fmt.scd1Merge(spark, silver, Seq(
        (1L, page, 0), (2L, frag, 0), (3L, uniq, 0), (4L, "abc", 0))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 1")
    val g1 = MergeTable.read(spark, gold).filter(col("id") === 1L).head
    assert(g1.getAs[Long]("n_dup_spans") == 1L,
      s"the page must report the shared span: $g1")
    assert(MergeTable.read(spark, gold).filter(col("id") === 4L)
        .head.getAs[Long]("n_dup_spans") == 0L,
      "printless doc reports zero spans")

    // batch 2: doc 5 duplicates doc 3's content — q flips false→true
    // for OLD doc 3's prints without doc 3 being in the batch
    fmt.scd1Merge(spark, silver,
      Seq((5L, uniq, 1)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 2 (duplicate arrival flips q)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 3L)
        .head.getAs[Long]("n_dup_spans") == 1L,
      "the old duplicate must gain its whole-doc span")

    // batch 3: doc 2's update leaves — the page's span must retract
    // (its prints' q drops back under 2)
    fmt.scd1Merge(spark, silver,
      Seq((2L, "pppp qqqq rrrr ssss", 2)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 3 (update retracts the span)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_dup_spans") == 0L,
      "the page must lose its span when the fragment leaves")

    // CRASH REPLAY: batch 4 duplicates the page (doc 6), state
    // merges, then gold rolls back to the pre-batch snapshot — the
    // q-flip signature must re-flag the untouched old doc 1
    def copyDir(from: String, to: String): Unit = {
      val src = Paths.get(from)
      scala.util.Using.resource(java.nio.file.Files.walk(src)) { st =>
        st.forEach { p =>
          val dest = Paths.get(to).resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(dest)
          else java.nio.file.Files.copy(p, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    def deleteDir(d: String): Unit = {
      val p = Paths.get(d)
      if (java.nio.file.Files.exists(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
          st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => java.nio.file.Files.delete(f))
        }
    }
    val goldBackup = Files.createTempDirectory("graft_sp_gbak").toString + "/t"
    copyDir(gold, goldBackup)
    val b4 = Seq((6L, page, 3)).toDF("doc_id", "text", "ord")
    fmt.scd1Merge(spark, silver, b4, Seq("doc_id"), "ord",
      compareExclude = Nil)
    TextAnalysis.spanStatsIncremental(spark, b4.select("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 3L,
      k = P._1, w = P._2, minSpan = P._3)
    deleteDir(gold); copyDir(goldBackup, gold) // gold rolled back, state kept
    assert(fold().nonEmpty, "the crashed batch must be redelivered")
    checkGoldEqualsBatch("after crash-replay of batch 4")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_dup_spans") == 1L,
      "replay must re-flag the untouched old doc 1 via the q flip")

    assert(fold().isEmpty, "caught-up consumer must re-process nothing")
    checkGoldEqualsBatch("after no-op fold")

    // hard DELETE: doc 5 leaves — doc 3's df drops to 1, spans retract
    val delIds = Seq(5L).toDF("doc_id")
    fmt.deleteKeys(spark, silver, delIds, Seq("doc_id"))
    TextAnalysis.spanStatsIncremental(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 4L,
      k = P._1, w = P._2, minSpan = P._3, deletes = Some(delIds))
    checkGoldEqualsBatch("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("id") === 5L).count() == 0)
    assert(MergeTable.read(spark, gold).filter(col("id") === 3L)
        .head.getAs[Long]("n_dup_spans") == 0L,
      "the surviving duplicate must lose its span when its mate is deleted")

    // update TO null retracts like a delete — doc 6 nulls out, doc 1
    // loses its mate again
    fmt.scd1Merge(spark, silver,
      Seq((6L, null.asInstanceOf[String], 5)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    TextAnalysis.spanStatsIncremental(spark,
      Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 5L,
      k = P._1, w = P._2, minSpan = P._3)
    checkGoldEqualsBatch("after update-to-null retraction")
    assert(MergeTable.read(spark, gold).filter(col("id") === 6L).count() == 0)

    // APPEND-ONLY fast path on fresh state: the second batch brings a
    // duplicate of an old doc (two-hop q flip) plus a printless doc
    val base = graft.pipeline.SnapshotTableFormat
    val stA = Files.createTempDirectory("graft_sp_stA").toString
    val goA = Files.createTempDirectory("graft_sp_goA").toString + "/t"
    val batches = Seq(
      Seq((1L, page), (3L, uniq)),
      Seq((7L, "abc"), (8L, frag)))
    var seen = Seq.empty[(Long, String)]
    batches.zipWithIndex.foreach { case (b, i) =>
      seen ++= b
      TextAnalysis.spanStatsIncremental(spark, b.toDF("doc_id", "text"),
        "doc_id", "text", stA, goA, batchOrd = i.toLong,
        k = P._1, w = P._2, minSpan = P._3, appendOnly = true, fmt = base)
      val truth = stats(TextAnalysis.spanDedupStats(
        seen.toDF("doc_id", "text"), "doc_id", "text",
        k = P._1, w = P._2, minSpan = P._3), "doc_id")
      val got = stats(MergeTable.read(spark, goA)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth,
        s"append-only batch $i: ${got.mkString("; ")} vs ${truth.mkString("; ")}")
    }
  }

  test("append-only containment fast path: neighborhood re-verify equals batch and general path") {
    // two-hop case for the containment member: batch fragment 4
    // lands in the page's buckets, so OLD docs (not in the batch)
    // must re-verify — their stats need their other buckets' members
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val base = graft.pipeline.SnapshotTableFormat
    val fmtF = new CountingFormat(base)
    val stF = Files.createTempDirectory("graft_ao_ct_stF").toString
    val goF = Files.createTempDirectory("graft_ao_ct_goF").toString + "/t"
    val stG = Files.createTempDirectory("graft_ao_ct_stG").toString
    val goG = Files.createTempDirectory("graft_ao_ct_goG").toString + "/t"
    val P = (3, 20, 0.5) // n, maxDf, threshold

    val page = "the quick brown fox jumps over the lazy dog"
    val batches = Seq(
      Seq((1L, page), (2L, "quick brown fox"),
        (3L, "zzz yyy xxx www vvv")),
      Seq((4L, "brown fox jumps over")),
      Seq((5L, "zzz yyy xxx www vvv"), (6L, "lazy dog")))
    var seen = Seq.empty[(Long, String)]

    def run(df: org.apache.spark.sql.DataFrame, ord: Long,
            append: Boolean): Unit =
      Dedup.containmentStatsIncremental(spark, df, "doc_id", "text",
        if (append) stF else stG, if (append) goF else goG, batchOrd = ord,
        n = P._1, maxDf = P._2, threshold = P._3, appendOnly = append,
        fmt = if (append) fmtF else base)
    def stats(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_contained"),
        Option(r.get(r.fieldIndex("max_containment"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)

    batches.zipWithIndex.foreach { case (b, i) =>
      seen ++= b
      val df = b.toDF("doc_id", "text")
      run(df, i.toLong, append = true)
      run(df, i.toLong, append = false)
      val truth = stats(Dedup.ngramContainmentStats(
          seen.toDF("doc_id", "text"), "doc_id", "text",
          n = P._1, maxDf = P._2, threshold = P._3)
        .withColumnRenamed("doc_id", "id"))
      val fast = stats(MergeTable.read(spark, goF))
      assert(fast == truth, s"batch $i: fast gold must equal batch recompute")
      val gen = MergeTable.read(spark, goG).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("_shingle_sig")))
        .toSeq.sortBy(_._1)
      val fsig = MergeTable.read(spark, goF).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("_shingle_sig")))
        .toSeq.sortBy(_._1)
      assert(fsig == gen,
        s"batch $i: fast signatures must equal the general path's")
    }
    assert(MergeTable.read(spark, goF).filter(col("id") === 2L)
        .head.getAs[Long]("n_contained") >= 1L,
      "the fragment must stay contained in the page across folds")
    assert(fmtF.readsOf(goF) == 0, "the fast path must never read gold")

    // a delete feed contradicts the appendOnly declaration — loudly
    intercept[IllegalArgumentException] {
      Dedup.containmentStatsIncremental(spark,
        Seq((9L, "x y z")).toDF("doc_id", "text"), "doc_id", "text",
        stF, goF, batchOrd = 9L, appendOnly = true,
        deletes = Some(Seq(1L).toDF("doc_id")), fmt = fmtF)
    }
  }

}
