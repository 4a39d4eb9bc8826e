package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.operators.Events
import graft.pipeline.MergeTable
import graft.streaming.StreamingIngest

/** The incremental frozen-epoch members (r22: split from
  * StreamingSpec so the suite shards across forked test JVMs — one
  * 723 s suite was the wall-clock critical path of `sbt test`; no
  * test was changed or removed).
  */
class StreamingIncrementalSpec extends SparkSpec {
  test("incremental segment-dedup: streamed gold equals batch segmentDedup after every micro-batch") {
    // the frequent-segment set is STATE carried across micro-batches
    // (distinct (seg, doc) pair table): a later batch can make an old
    // segment boilerplate — the affected OLD doc must be re-cleaned —
    // and an update can retract copies and un-hot a segment, which
    // must re-clean it back. After every fold, gold must equal the
    // batch operator's full recompute over silver-current.
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_segdd_silver").toString
    val state = Files.createTempDirectory("graft_segdd_state").toString + "/t"
    val gold = Files.createTempDirectory("graft_segdd_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_segdd_ck").toString
    val segWords = 2
    val minDocs = 2

    def fold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, v) =>
        TextAnalysis.segmentDedupIncremental(spark,
          chg.select("doc_id", "text"), "doc_id", "text",
          state, gold, batchOrd = v.toLong,
          segWords = segWords, minDocs = minDocs)
      }
    def checkGoldEqualsBatch(label: String): Unit = {
      val truth = TextAnalysis.segmentDedup(
          fmt.read(spark, silver).select(col("doc_id"), col("text")),
          "doc_id", "text", segWords, minDocs)
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).sortBy(_._1)
      val got = MergeTable.read(spark, gold)
        .select("doc_id", "clean_text", "kept_segments", "removed_segments")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).sortBy(_._1)
      assert(got.sameElements(truth),
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    // texts are whole 2-word segments so boundaries align exactly
    val segA = "alpha beta"
    // batch 1: three docs, no segment shared — nothing hot
    fmt.scd1Merge(spark, silver, Seq(
        (1L, s"$segA one two", 0),
        (2L, "three four five six", 0),
        (3L, "seven eight", 0)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 1")

    // batch 2: doc 4 repeats segA -> now in 2 docs -> hot flips ON;
    // OLD doc 1 (not in the batch) must be re-cleaned from state
    fmt.scd1Merge(spark, silver, Seq(
        (4L, s"$segA nine ten", 1),
        (5L, "eleven twelve", 1)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 2 (hot flip on)")
    val d1 = MergeTable.read(spark, gold).filter(col("doc_id") === 1L)
      .select("clean_text", "removed_segments").head
    assert(d1.getString(0) == "one two" && d1.getLong(1) == 1L,
      s"doc 1 must lose the now-hot segment: $d1")

    // batch 3: doc 4's UPDATE drops segA -> count falls to 1 -> hot
    // flips OFF; doc 1 must be re-cleaned back to its full text
    fmt.scd1Merge(spark, silver,
      Seq((4L, "thirteen fourteen", 2)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 3 (hot flip off via update)")
    assert(MergeTable.read(spark, gold).filter(col("doc_id") === 1L)
        .head.getAs[String]("clean_text") == s"$segA one two",
      "doc 1 must be restored once the segment is no longer hot")

    // caught up: nothing to process, nothing changes
    assert(fold().isEmpty, "caught-up consumer must re-process nothing")
    checkGoldEqualsBatch("after no-op fold")

    // CRASH REPLAY: batch 4 re-hots the segment (doc 6 repeats segA
    // -> count back to 2). Simulate a consumer that merged the STATE
    // but crashed before the GOLD merge, exactly between the
    // operator's two writes: apply batch 4's state update by hand,
    // leave gold stale. The checkpoint never advanced, so the stream
    // redelivers batch 4 — and because staleness is detected from
    // the stored per-doc hot signature against CURRENT state (not a
    // transient before/after flip diff, which this replay would
    // lose), the redelivery must still re-clean untouched doc 1.
    val b4 = Seq((6L, s"$segA fifteen sixteen", 3))
      .toDF("doc_id", "text", "ord")
    fmt.scd1Merge(spark, silver, b4, Seq("doc_id"), "ord",
      compareExclude = Nil)
    val sfmt = graft.pipeline.SnapshotTableFormat // state/gold default
    sfmt.deleteKeys(spark, state,
      b4.select("doc_id"), Seq("doc_id"))
    sfmt.scd1Merge(spark, state,
      graft.operators.TextAnalysis
        .segmentRows(b4, "doc_id", "text", segWords)
        .select(col("doc_id"), col("seg")).distinct()
        .withColumn("_ord", lit(3L)),
      Seq("seg", "doc_id"), "_ord", compareExclude = Nil)
    assert(fold().nonEmpty, "the crashed batch must be redelivered")
    checkGoldEqualsBatch("after crash-replay of batch 4")
    assert(MergeTable.read(spark, gold).filter(col("doc_id") === 1L)
        .head.getAs[String]("clean_text") == "one two",
      "replay must still re-clean the untouched old doc")

    // hard DELETE feed: doc 6 leaves — segA's count drops below
    // minDocs, so doc 1 must be re-cleaned back to its full text and
    // doc 6's gold row must disappear
    val delIds = Seq(6L).toDF("doc_id")
    fmt.deleteKeys(spark, silver, delIds, Seq("doc_id"))
    TextAnalysis.segmentDedupIncremental(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", state, gold, batchOrd = 4L,
      segWords = segWords, minDocs = minDocs, deletes = Some(delIds))
    checkGoldEqualsBatch("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("doc_id") === 1L)
        .head.getAs[String]("clean_text") == s"$segA one two",
      "doc 1 must be restored once the deleted doc un-hots the segment")
  }

  test("incremental minhash stats: streamed gold equals batch recompute, updates retract, crashes replay") {
    // near-dup sibling of the segment-dedup case: per-doc MinHash
    // stats maintained across micro-batches must equal
    // Dedup.minhashLshStats over silver-current after every fold —
    // including untouched OLD docs whose stats change because a new
    // near-duplicate arrived, an UPDATE retracting a partnership, and
    // a crash between the state and gold merges.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_mh_silver").toString
    val stateDir = Files.createTempDirectory("graft_mh_state").toString
    val gold = Files.createTempDirectory("graft_mh_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_mh_ck").toString
    val P = (3, 16, 4, 0.5, 10) // n, numPerm, bands, threshold, maxBucket

    def fold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, v) =>
        Dedup.minhashLshStatsIncremental(spark,
          chg.select("doc_id", "text"), "doc_id", "text",
          stateDir, gold, batchOrd = v.toLong,
          n = P._1, numPerm = P._2, bands = P._3,
          threshold = P._4, maxBucket = P._5)
      }
    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_near"),
        Option(r.get(r.fieldIndex("max_jaccard"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)
    def checkGoldEqualsBatch(label: String): Unit = {
      // null-text docs are the documented deviation (excluded from
      // gold); they produce no shingles, so filtering them from the
      // batch input leaves every other doc's stats untouched
      val truth = stats(Dedup.minhashLshStats(
        fmt.read(spark, silver).select("doc_id", "text")
          .filter(col("text").isNotNull), "doc_id", "text",
        n = P._1, numPerm = P._2, bands = P._3,
        threshold = P._4, maxBucket = P._5), "doc_id")
      val got = stats(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    // batch 1: docs 1,2 identical near-dups; doc 3 unrelated
    fmt.scd1Merge(spark, silver, Seq(
        (1L, dupText, 0), (2L, dupText, 0),
        (3L, "one two three four five six seven", 0))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 1")

    // batch 2: doc 4 joins the duplicate family — OLD docs 1,2 must
    // gain a partner without being in the batch
    fmt.scd1Merge(spark, silver,
      Seq((4L, dupText, 1)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 2 (old docs gain a partner)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_near") == 2L,
      "doc 1 must see both duplicates")

    // batch 3: doc 2's UPDATE leaves the family — docs 1,4 must lose
    // the partnership (content-hash retraction), doc 2 resets
    fmt.scd1Merge(spark, silver,
      Seq((2L, "totally different words now here instead", 2))
        .toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty)
    checkGoldEqualsBatch("after batch 3 (update retracts a partnership)")

    // CRASH REPLAY: batch 4 duplicates doc 3. Run the operator so
    // state AND gold advance, then restore gold from a pre-batch
    // snapshot — the on-disk aftermath of a consumer that merged
    // state but crashed before the gold merge. The checkpoint never
    // advanced, so fold() redelivers batch 4; the signature check
    // against CURRENT state must still flag doc 3 stale.
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
    val goldBackup = Files.createTempDirectory("graft_mh_gbak").toString + "/t"
    copyDir(gold, goldBackup)
    val b4 = Seq((5L, "one two three four five six seven", 3))
      .toDF("doc_id", "text", "ord")
    fmt.scd1Merge(spark, silver, b4, Seq("doc_id"), "ord",
      compareExclude = Nil)
    Dedup.minhashLshStatsIncremental(spark, b4.select("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 3L,
      n = P._1, numPerm = P._2, bands = P._3,
      threshold = P._4, maxBucket = P._5)
    deleteDir(gold); copyDir(goldBackup, gold) // gold rolled back, state kept
    assert(fold().nonEmpty, "the crashed batch must be redelivered")
    checkGoldEqualsBatch("after crash-replay of batch 4")
    assert(MergeTable.read(spark, gold).filter(col("id") === 3L)
        .head.getAs[Long]("n_near") == 1L,
      "replay must still re-verify the untouched old doc 3")

    assert(fold().isEmpty, "caught-up consumer must re-process nothing")
    checkGoldEqualsBatch("after no-op fold")

    // hard DELETE feed: doc 4 leaves — doc 1 loses its remaining
    // partner and doc 4's own gold row disappears
    val delIds = Seq(4L).toDF("doc_id")
    fmt.deleteKeys(spark, silver, delIds, Seq("doc_id"))
    Dedup.minhashLshStatsIncremental(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 4L,
      n = P._1, numPerm = P._2, bands = P._3,
      threshold = P._4, maxBucket = P._5, deletes = Some(delIds))
    checkGoldEqualsBatch("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_candidates") == 0L,
      "doc 1 must lose its deleted partner")

    // an update TO null retracts like a delete: doc 3's content
    // leaves, doc 5 loses its partner, doc 3's gold row disappears
    fmt.scd1Merge(spark, silver,
      Seq((3L, null.asInstanceOf[String], 5)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    Dedup.minhashLshStatsIncremental(spark,
      Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", stateDir, gold, batchOrd = 5L,
      n = P._1, numPerm = P._2, bands = P._3,
      threshold = P._4, maxBucket = P._5)
    checkGoldEqualsBatch("after update-to-null retraction")
    assert(MergeTable.read(spark, gold).filter(col("id") === 3L).count() == 0,
      "the nulled doc's gold row must disappear")
    assert(MergeTable.read(spark, gold).filter(col("id") === 5L)
        .head.getAs[Long]("n_candidates") == 0L,
      "doc 5 must lose its nulled partner")
  }

  test("incremental LM familiarity: frozen-epoch model, gold equals batch, retracts, replays, deletes") {
    // the 10th incremental member (r16): reference-LM familiarity
    // with the FROZEN-EPOCH contract — the model trains once from
    // the first fold's reference rows (the IVF-centroid epoch
    // pattern) and per-doc scores are independent thereafter. Pins:
    // (a) gold equals the batch operator against the SAME frozen
    // reference after every fold; (b) a reference doc arriving LATER
    // scores like any doc but does NOT change the model (documented
    // epoch divergence from a retrained batch op); (c) update
    // re-scores, update-to-null retracts, hard delete removes;
    // (d) crash replay (same batch, same ord) converges.
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    val fmt = graft.pipeline.SnapshotTableFormat
    val work = Files.createTempDirectory("graft_lm_inc").toString
    val stateDir = s"$work/state"
    val gold = s"$work/gold"
    var live = Map.empty[Long, (String, Boolean)] // id -> (text, isRef)
    val epochRef = Seq((1L, "a b c a b"), (2L, "a b d"))
    def foldBatch(ord: Long, dels: Seq[Long],
                  rows: (Long, String, Boolean)*): Unit = {
      live ++= rows.map(r => r._1 -> (r._2, r._3)).toMap
      live --= dels
      TextAnalysis.lmFamiliarityIncremental(spark,
        rows.toSeq.toDF("doc_id", "text", "is_ref"), "doc_id", "text",
        stateDir, gold, batchOrd = ord, refFilter = col("is_ref"),
        deletes = if (dels.isEmpty) None else Some(dels.toDF("doc_id")),
        fmt = fmt)
    }
    def checkGoldEqualsBatch(label: String): Unit = {
      // batch truth: the public operator over the LIVE corpus with
      // ref flags pinned to the EPOCH membership (ids 1,2 — never
      // the current is_ref flags, which fold 3 extends)
      val epochIds = epochRef.map(_._1).toSet
      val truthDf = live.toSeq.map { case (id, (t, _)) =>
        (id, t, epochIds.contains(id)) }.toDF("doc_id", "text", "is_ref")
      val truth = TextAnalysis.lmFamiliarity(
          truthDf.filter(col("text").isNotNull), "doc_id", "text",
          col("is_ref"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(d => java.lang.Double.doubleToLongBits(
            d.asInstanceOf[Double])))).sortBy(_._1)
      val got = fmt.read(spark, gold)
        .select("id", "n_bigrams", "n_known", "sum_big", "sum_uni",
          "familiarity")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(d => java.lang.Double.doubleToLongBits(
            d.asInstanceOf[Double])))).sortBy(_._1)
      assert(got.toSeq == truth.toSeq,
        s"$label: gold ${got.mkString(";")} vs batch ${truth.mkString(";")}")
    }
    // fold 1: the epoch — reference + one corpus doc
    foldBatch(0L, Nil, (1L, "a b c a b", true), (2L, "a b d", true),
      (10L, "a b x", false))
    checkGoldEqualsBatch("after epoch fold")
    // fold 2: new corpus docs score against the frozen model
    foldBatch(1L, Nil, (11L, "a b a b", false), (12L, "q r s", false))
    checkGoldEqualsBatch("after fold 2")
    // fold 3: a LATE reference doc — scored, but the model is frozen:
    // doc 11's stored score must not move even though a retrained
    // model would change it
    val before11 = fmt.read(spark, gold).filter(col("id") === 11L)
      .head.getAs[Double]("familiarity")
    foldBatch(2L, Nil, (3L, "a b a b a b", true))
    checkGoldEqualsBatch("after late-reference fold (frozen model)")
    assert(fmt.read(spark, gold).filter(col("id") === 11L)
      .head.getAs[Double]("familiarity") == before11,
      "late reference must not retrain the epoch model")
    // fold 4: update re-scores; update-to-null retracts
    foldBatch(3L, Nil, (10L, "q q q", false),
      (12L, null.asInstanceOf[String], false))
    live -= 12L // null text leaves gold
    checkGoldEqualsBatch("after update + null retraction")
    assert(fmt.read(spark, gold).filter(col("id") === 12L).count() == 0)
    // crash replay: same batch, same ord — gold converges
    foldBatch(3L, Nil, (10L, "q q q", false))
    checkGoldEqualsBatch("after crash replay")
    // hard delete
    foldBatch(4L, Seq(11L))
    checkGoldEqualsBatch("after hard delete")
    assert(fmt.read(spark, gold).filter(col("id") === 11L).count() == 0)
  }

  test("incremental LM familiarity: epoch training is crash-atomic across its two model tables") {
    // the model is TWO tables merged sequentially (uni then big); a
    // crash between them used to wedge the state dir forever: the
    // uni-only guard skipped retraining and every later fold threw
    // at fmt.read(bigPath). The guard now re-enters training when
    // EITHER table is missing, and the redelivered epoch batch
    // converges (same batchOrd — the merges are idempotent).
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    val fmt = graft.pipeline.SnapshotTableFormat
    val work = Files.createTempDirectory("graft_lm_crash").toString
    val stateDir = s"$work/state"
    val gold = s"$work/gold"
    val epoch = Seq((1L, "a b c a b", true), (2L, "a b d", true),
      (10L, "a b x", false))
    def fold(): Unit = TextAnalysis.lmFamiliarityIncremental(spark,
      epoch.toDF("doc_id", "text", "is_ref"), "doc_id", "text",
      stateDir, gold, batchOrd = 0L, refFilter = col("is_ref"), fmt = fmt)
    fold()
    assert(fmt.exists(s"$stateDir/uni") && fmt.exists(s"$stateDir/big"))
    val truth = fmt.read(spark, gold).orderBy("id")
      .collect().map(_.toSeq).toSeq
    // simulate the crash window: uni committed, big lost
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p))(
          _.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.delete))
    }
    rmrf(java.nio.file.Paths.get(stateDir, "big"))
    assert(!fmt.exists(s"$stateDir/big"))
    // redelivery of the epoch batch must retrain BOTH tables and
    // converge to the same gold, not throw at the missing big table
    fold()
    assert(fmt.exists(s"$stateDir/uni") && fmt.exists(s"$stateDir/big"))
    assert(fmt.read(spark, gold).orderBy("id")
      .collect().map(_.toSeq).toSeq == truth,
      "redelivered epoch fold must converge after a mid-training crash")

    // DIVERGENT recovery: crash again, but the next reference-
    // carrying fold is a DIFFERENT batch (at-least-once delivery does
    // not guarantee the identical epoch batch returns first). The
    // surviving uni table still holds the crashed epoch's rows —
    // upserting alone would freeze a MIXED model matching neither
    // epoch; the recovery path must reconcile both tables to exactly
    // the retrained frame. 'zzz' exists only in the crashed epoch's
    // references: any trace of it after recovery is the stale-row bug.
    val work2 = Files.createTempDirectory("graft_lm_crash2").toString
    val state2 = s"$work2/state"
    val gold2 = s"$work2/gold"
    def fold2(ord: Long, rows: Seq[(Long, String, Boolean)]): Unit =
      TextAnalysis.lmFamiliarityIncremental(spark,
        rows.toDF("doc_id", "text", "is_ref"), "doc_id", "text",
        state2, gold2, batchOrd = ord, refFilter = col("is_ref"), fmt = fmt)
    fold2(0L, Seq((1L, "zzz yyy zzz", true), (10L, "a b", false)))
    rmrf(java.nio.file.Paths.get(state2, "big"))
    val epochB = Seq((2L, "a b c a b", true), (3L, "a b d", true),
      (11L, "a b x", false))
    fold2(1L, epochB)
    assert(fmt.read(spark, s"$state2/uni")
        .filter(col("_w1") === "zzz").count() == 0,
      "recovery must purge the crashed epoch's rows from the " +
        "surviving model table, not upsert around them")
    // the frozen model now matches epoch B alone: every epoch-B doc's
    // gold row equals the batch operator trained on exactly epoch B
    val truthB = TextAnalysis.lmFamiliarity(
        epochB.toDF("doc_id", "text", "is_ref"), "doc_id", "text",
        col("is_ref"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val goldB = fmt.read(spark, gold2)
      .filter(col("id").isin(epochB.map(_._1): _*))
      .select(col("id"), col("n_bigrams"), col("n_known"),
        col("sum_big"), col("sum_uni"), col("familiarity"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(goldB == truthB,
      s"divergent recovery must freeze epoch B's model exactly: " +
        s"$goldB vs $truthB")
  }

  test("incremental ccnet buckets: frozen model AND cutoffs, value-rule assignment, retracts, replays, deletes") {
    // the 14th incremental member (r18): CCNet terciles with the
    // FROZEN-THRESHOLD contract — tercile membership is corpus-
    // relative, so the streaming form freezes the cutoff VALUES from
    // the epoch fold's scored docs and assigns every later doc by
    // comparison. Pins: (a) pre-reference folds train nothing;
    // (b) gold equals (frozen-model familiarity, value-rule bucket)
    // after every fold; (c) boundary ties land in the HIGHER bucket
    // under the value rule (the documented divergence from exact
    // ntile terciles); (d) late reference docs move neither the
    // model nor the cuts; (e) update re-scores/re-buckets,
    // update-to-null retracts, hard delete removes, crash replay
    // converges.
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    val fmt = graft.pipeline.SnapshotTableFormat
    val work = Files.createTempDirectory("graft_ccnet_inc").toString
    val stateDir = s"$work/state"
    val gold = s"$work/gold"
    val epochRefIds = Set(1L, 2L)
    var live = Map.empty[Long, String]
    def foldBatch(ord: Long, dels: Seq[Long],
                  rows: (Long, String, Boolean)*): Unit = {
      live ++= rows.filter(_._2 != null).map(r => r._1 -> r._2).toMap
      live --= rows.filter(_._2 == null).map(_._1)
      live --= dels
      TextAnalysis.ccnetBucketsIncremental(spark,
        rows.toSeq.toDF("doc_id", "text", "is_ref"), "doc_id", "text",
        stateDir, gold, batchOrd = ord, refFilter = col("is_ref"),
        deletes = if (dels.isEmpty) None else Some(dels.toDF("doc_id")),
        fmt = fmt)
    }
    // frozen-model familiarity for any live corpus: the public batch
    // operator with ref flags pinned to the EPOCH membership
    def famOf(docs: Map[Long, String]): Map[Long, Option[Double]] =
      TextAnalysis.lmFamiliarity(
          docs.toSeq.map { case (id, t) => (id, t, epochRefIds(id)) }
            .toDF("doc_id", "text", "is_ref"),
          "doc_id", "text", col("is_ref"))
        .collect().map(r => r.getLong(0) ->
          Option(r.get(5)).map(_.asInstanceOf[Double])).toMap
    // fold 0: no reference rows — nothing trains, nothing scores
    foldBatch(0L, Nil, (9L, "pre epoch doc", false))
    assert(!fmt.exists(s"$stateDir/uni") && !fmt.exists(s"$stateDir/cuts")
      && !fmt.exists(gold), "a pre-reference fold must not train")
    live -= 9L // never scored; re-enters in fold 2
    // fold 1: the epoch — refs 1,2 plus a tied corpus pair. Scored
    // ranking: doc1, doc2, then docs 10=11 tied at the bucket-2/3
    // boundary (n=4 -> ntile sizes 2,1,1; t2 = the tied value)
    val epoch = Seq((1L, "a b c a b", true), (2L, "a b d", true),
      (10L, "a b x", false), (11L, "a b x", false))
    foldBatch(1L, Nil, epoch: _*)
    assert(fmt.exists(s"$stateDir/cuts"))
    // frozen cutoffs, recomputed independently: ntile(3) by hand over
    // the epoch fold's scored docs (fam desc, id asc)
    val epochFams = famOf(epoch.map(r => r._1 -> r._2).toMap)
    val ranked = epochFams.toSeq.flatMap { case (id, f) => f.map(id -> _) }
      .sortBy { case (id, f) => (-f, id) }
    val n = ranked.size
    val sizes = (0 until 3).map(i => n / 3 + (if (i < n % 3) 1 else 0))
    val t1 = ranked.take(sizes(0)).map(_._2).min
    val t2 = ranked.take(sizes(0) + sizes(1)).map(_._2).min
    def bucketOf(f: Option[Double]): Option[String] = f.map {
      case v if v >= t1 => "head"
      case v if v >= t2 => "middle"
      case _ => "tail"
    }
    def checkGold(label: String): Unit = {
      val fams = famOf(live)
      val truth = live.keys.toSeq.sorted.map { id =>
        (id, fams(id).map(java.lang.Double.doubleToLongBits),
          bucketOf(fams(id)))
      }
      val got = fmt.read(spark, gold)
        .select("id", "familiarity", "bucket")
        .collect().map(r => (r.getLong(0),
          Option(r.get(1)).map(d => java.lang.Double.doubleToLongBits(
            d.asInstanceOf[Double])), Option(r.getString(2))))
        .sortBy(_._1).toSeq
      assert(got == truth, s"$label: gold $got vs truth $truth")
    }
    checkGold("after epoch fold")
    // the boundary pin: docs 10 and 11 tie AT t2, so the value rule
    // lands BOTH in middle even though exact terciles would push the
    // id-tiebroken one to tail
    val b1011 = fmt.read(spark, gold)
      .filter(col("id").isin(10L, 11L)).select("bucket")
      .collect().map(_.getString(0)).toSeq
    assert(b1011 == Seq("middle", "middle"), b1011.toString)
    // fold 2: doc 9 redelivers; an in-distribution doc lands head, a
    // one-word doc keeps a NULL bucket
    foldBatch(2L, Nil, (9L, "pre epoch doc", false),
      (12L, "a b c a b", false), (13L, "solo", false))
    checkGold("after fold 2")
    assert(fmt.read(spark, gold).filter(col("id") === 12L)
      .head.getString(2) == "head")
    assert(fmt.read(spark, gold).filter(col("id") === 13L)
      .head.isNullAt(2))
    // fold 3: a LATE reference doc changes neither model nor cuts
    val cutsBefore = fmt.read(spark, s"$stateDir/cuts")
      .select("t1", "t2").head.toSeq
    foldBatch(3L, Nil, (3L, "a b a b a b", true))
    checkGold("after late-reference fold")
    assert(fmt.read(spark, s"$stateDir/cuts")
      .select("t1", "t2").head.toSeq == cutsBefore)
    // fold 4: update re-buckets; update-to-null retracts
    foldBatch(4L, Nil, (10L, "q q q", false),
      (13L, null.asInstanceOf[String], false))
    checkGold("after update + null retraction")
    assert(fmt.read(spark, gold).filter(col("id") === 13L).count() == 0)
    // crash replay converges
    foldBatch(4L, Nil, (10L, "q q q", false))
    checkGold("after crash replay")
    // hard delete
    foldBatch(5L, Seq(12L))
    checkGold("after hard delete")
    assert(fmt.read(spark, gold).filter(col("id") === 12L).count() == 0)
  }

  test("incremental DSIR: frozen-epoch model, gold equals frozen-score truth, retracts, replays, deletes, bucket guard") {
    // the 13th incremental member (r18): DSIR importance weights
    // with the frozen-epoch contract — BOTH profiles (target slice +
    // raw corpus) freeze from the first target-carrying fold, since
    // a live raw profile would stale every stored score on every
    // insert. Pins: (a) a pre-target fold trains nothing; (b) gold
    // equals dsirScore against the frozen model after every fold
    // (the shared-kernel contract); (c) a LATE target doc scores but
    // does not retrain; (d) update re-scores, update-to-null
    // retracts, hard delete removes, crash replay converges; (e) a
    // fold configured with a different bucket count refuses fast.
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    val fmt = graft.pipeline.SnapshotTableFormat
    val work = Files.createTempDirectory("graft_dsir_inc").toString
    val stateDir = s"$work/state"
    val gold = s"$work/gold"
    val B = 64
    var live = Map.empty[Long, String] // id -> non-null live text
    def foldBatch(ord: Long, dels: Seq[Long],
                  rows: (Long, String, Boolean)*): Unit = {
      live ++= rows.filter(_._2 != null).map(r => r._1 -> r._2).toMap
      live --= rows.filter(_._2 == null).map(_._1)
      live --= dels
      TextAnalysis.dsirIncremental(spark,
        rows.toSeq.toDF("doc_id", "text", "is_tgt"), "doc_id", "text",
        stateDir, gold, batchOrd = ord, targetFilter = col("is_tgt"),
        buckets = B,
        deletes = if (dels.isEmpty) None else Some(dels.toDF("doc_id")),
        fmt = fmt)
    }
    // fold 0: no target rows yet — nothing to train, nothing to score
    foldBatch(0L, Nil, (9L, "pre epoch doc", false))
    assert(!fmt.exists(s"$stateDir/model") && !fmt.exists(gold),
      "a pre-target fold must not train or score")
    live -= 9L // doc 9 was never scored; it re-enters via fold 2
    // fold 1: the epoch — target slice + corpus freeze both profiles
    val epoch = Seq((1L, "a b c a b", true), (2L, "a b d", true),
      (10L, "a b x", false))
    val frozen = TextAnalysis.dsirModel(
      epoch.toDF("doc_id", "text", "is_tgt"), "text", col("is_tgt"), B)
    def checkGold(label: String): Unit = {
      val truth = TextAnalysis.dsirScore(
          live.toSeq.toDF("doc_id", "text"), "doc_id", "text", frozen, B)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), Option(r.get(4)).map(d =>
            java.lang.Double.doubleToLongBits(d.asInstanceOf[Double]))))
        .sortBy(_._1).toSeq
      val got = fmt.read(spark, gold)
        .select("id", "n_feats", "sum_target", "sum_raw", "dsir_weight")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), Option(r.get(4)).map(d =>
            java.lang.Double.doubleToLongBits(d.asInstanceOf[Double]))))
        .sortBy(_._1).toSeq
      assert(got == truth, s"$label: gold $got vs frozen truth $truth")
    }
    foldBatch(1L, Nil, epoch.map(r => (r._1, r._2, r._3)): _*)
    assert(fmt.exists(s"$stateDir/model"))
    checkGold("after epoch fold")
    // fold 2: doc 9 redelivers and new docs score against the frozen
    // model
    foldBatch(2L, Nil, (9L, "pre epoch doc", false),
      (11L, "a b a b", false), (12L, "q r s", false))
    checkGold("after fold 2")
    // fold 3: a LATE target doc — scored, but neither profile moves:
    // doc 11's stored row must not change even though a retrained
    // model would move both its sums
    val before11 = fmt.read(spark, gold).filter(col("id") === 11L)
      .select("sum_target", "sum_raw", "dsir_weight")
      .head.toSeq
    foldBatch(3L, Nil, (3L, "a b a b a b", true))
    checkGold("after late-target fold (frozen model)")
    assert(fmt.read(spark, gold).filter(col("id") === 11L)
      .select("sum_target", "sum_raw", "dsir_weight")
      .head.toSeq == before11,
      "a late target doc must not retrain the frozen epoch model")
    // fold 4: update re-scores; update-to-null retracts
    foldBatch(4L, Nil, (10L, "q q q", false),
      (12L, null.asInstanceOf[String], false))
    checkGold("after update + null retraction")
    assert(fmt.read(spark, gold).filter(col("id") === 12L).count() == 0)
    // crash replay: same batch, same ord — gold converges
    foldBatch(4L, Nil, (10L, "q q q", false))
    checkGold("after crash replay")
    // hard delete
    foldBatch(5L, Seq(11L))
    checkGold("after hard delete")
    assert(fmt.read(spark, gold).filter(col("id") === 11L).count() == 0)
    // bucket-count drift refuses fast, naming both values
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.dsirIncremental(spark,
        Seq((13L, "a b", false)).toDF("doc_id", "text", "is_tgt"),
        "doc_id", "text", stateDir, gold, batchOrd = 6L,
        targetFilter = col("is_tgt"), buckets = 128, fmt = fmt)
    }
    assert(err.getMessage.contains("64") && err.getMessage.contains("128"),
      err.getMessage)
    checkGold("after refused mismatched fold (state untouched)")
  }

  test("incremental decontamination: frozen benchmark set, gold equals batch truth, retracts, replays, deletes, width guard") {
    // the 15th incremental member (r19): benchmark decontamination
    // with the frozen-epoch contract — benchmark sets change rarely,
    // so the distinct n-gram hash set freezes from the first
    // benchmark-carrying fold and every later fold probes its batch
    // against it. Pins: (a) a pre-benchmark fold trains nothing;
    // (b) gold equals batch decontaminate against the frozen
    // benchmark after every fold (shared-kernel contract), and
    // benchmark docs never enter gold; (c) a LATE benchmark doc does
    // not grow the frozen set; (d) update re-scores, update-to-null
    // retracts, update-INTO-benchmark retracts, hard delete removes,
    // crash replay converges; (e) a fold configured with a different
    // n-gram width refuses fast.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val fmt = graft.pipeline.SnapshotTableFormat
    val work = Files.createTempDirectory("graft_decon_inc").toString
    val stateDir = s"$work/state"
    val gold = s"$work/gold"
    val N = 5 // 5-char shingles so short fixtures can overlap
    var live = Map.empty[Long, String] // live NON-benchmark docs
    var benchDocs = Seq.empty[(Long, String)] // frozen at the epoch
    def foldBatch(ord: Long, dels: Seq[Long],
                  rows: (Long, String, Boolean)*): Unit = {
      live ++= rows.filter(r => r._2 != null && !r._3)
        .map(r => r._1 -> r._2)
      live --= rows.filter(r => r._2 == null || r._3).map(_._1)
      live --= dels
      Dedup.decontaminateIncremental(spark,
        rows.toSeq.toDF("doc_id", "text", "is_bench"), "doc_id", "text",
        stateDir, gold, batchOrd = ord, benchFilter = col("is_bench"),
        n = N,
        deletes = if (dels.isEmpty) None else Some(dels.toDF("doc_id")),
        fmt = fmt)
    }
    def checkGold(label: String): Unit = {
      val truth = Dedup.decontaminate(live.toSeq.toDF("doc_id", "text"),
          benchDocs.toDF("doc_id", "text"), "doc_id", "text", n = N)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
      val got = fmt.read(spark, gold).select("id", "n_hits", "contaminated")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
      assert(got == truth, s"$label: gold $got vs batch truth $truth")
    }
    // fold 0: no benchmark rows yet — nothing to freeze or score
    foldBatch(0L, Nil, (9L, "pre epoch corpus doc", false))
    assert(!fmt.exists(s"$stateDir/bench") && !fmt.exists(gold),
      "a pre-benchmark fold must not train or score")
    live -= 9L // doc 9 was never scored; it re-enters via fold 2
    // fold 1: the epoch — the benchmark hash set freezes, corpus
    // docs in the same fold score against it
    benchDocs = Seq((1L, "abcdefghij"), (2L, "hello bench world"))
    foldBatch(1L, Nil, (1L, "abcdefghij", true),
      (2L, "hello bench world", true),
      (10L, "xx abcdefgh yy", false), (11L, "totally unrelated", false))
    assert(fmt.exists(s"$stateDir/bench"))
    checkGold("after epoch fold")
    assert(fmt.read(spark, gold).filter(col("id").isin(1L, 2L)).count()
      == 0, "benchmark docs must never enter gold")
    // fold 2: doc 9 redelivers; one contaminated, one clean newcomer
    foldBatch(2L, Nil, (9L, "pre epoch corpus doc", false),
      (12L, "zz hello bench zz", false), (13L, "clean as can be", false))
    checkGold("after fold 2")
    // fold 3: a LATE benchmark doc — it must neither grow the frozen
    // set (doc 14 sharing only ITS text stays clean) nor enter gold
    foldBatch(3L, Nil, (3L, "uvwxyz12345", true),
      (14L, "xx uvwxyz1 yy", false))
    checkGold("after late-benchmark fold (frozen set)")
    assert(fmt.read(spark, gold).filter(col("id") === 14L)
      .head.getLong(1) == 0L,
      "a late benchmark doc must not grow the frozen epoch set")
    // fold 4: update re-scores; update-to-null retracts; an update
    // INTO the benchmark slice retracts like a null
    foldBatch(4L, Nil, (10L, "now perfectly clean", false),
      (11L, null.asInstanceOf[String], false),
      (12L, "zz hello bench zz", true))
    checkGold("after update + null retraction + bench flip")
    assert(fmt.read(spark, gold).filter(col("id").isin(11L, 12L))
      .count() == 0)
    // crash replay: same batch, same ord — gold converges
    foldBatch(4L, Nil, (10L, "now perfectly clean", false))
    checkGold("after crash replay")
    // hard delete
    foldBatch(5L, Seq(13L))
    checkGold("after hard delete")
    assert(fmt.read(spark, gold).filter(col("id") === 13L).count() == 0)
    // n-gram width drift refuses fast, naming both values
    val err2 = intercept[IllegalArgumentException] {
      Dedup.decontaminateIncremental(spark,
        Seq((15L, "whatever text", false)).toDF("doc_id", "text", "is_bench"),
        "doc_id", "text", stateDir, gold, batchOrd = 6L,
        benchFilter = col("is_bench"), n = 7, fmt = fmt)
    }
    assert(err2.getMessage.contains("5") && err2.getMessage.contains("7"),
      err2.getMessage)
    checkGold("after refused mismatched fold (state untouched)")
  }

  test("incremental langid: frozen rank profiles, gold equals frozen-score truth, retracts, replays, deletes, param guard") {
    // the 16th incremental member (r19): Cavnar–Trenkle language ID
    // with the frozen-epoch contract — per-language rank profiles
    // freeze from the first labeled-reference fold. Pins: (a) a
    // pre-reference fold trains nothing; (b) gold equals langIdScore
    // against the frozen profiles after every fold (shared-kernel
    // contract); (c) a LATE labeled doc scores but does not retrain;
    // (d) update re-scores, update-to-null retracts, hard delete
    // removes, crash replay converges; (e) a fold configured with a
    // different maxOrder or k refuses fast.
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    val fmt = graft.pipeline.SnapshotTableFormat
    val work = Files.createTempDirectory("graft_langid_inc").toString
    val stateDir = s"$work/state"
    val gold = s"$work/gold"
    val K = 50
    var live = Map.empty[Long, (String, String)] // id -> (text, label)
    def foldBatch(ord: Long, dels: Seq[Long],
                  rows: (Long, String, String, Boolean)*): Unit = {
      live ++= rows.filter(_._2 != null).map(r => r._1 -> (r._2, r._3))
      live --= rows.filter(_._2 == null).map(_._1)
      live --= dels
      TextAnalysis.langIdIncremental(spark,
        rows.toSeq.toDF("doc_id", "text", "lang", "is_ref"),
        "doc_id", "text", stateDir, gold, batchOrd = ord,
        refFilter = col("is_ref"), langLabel = col("lang"), k = K,
        deletes = if (dels.isEmpty) None else Some(dels.toDF("doc_id")),
        fmt = fmt)
    }
    // fold 0: no labeled reference rows — nothing to train or score
    foldBatch(0L, Nil, (9L, "ein vortrag ueber sprachen", "de", false))
    assert(!fmt.exists(s"$stateDir/model") && !fmt.exists(gold),
      "a pre-reference fold must not train or score")
    live -= 9L // never scored; re-enters via fold 2
    // fold 1: the epoch — labeled reference docs freeze the profiles
    val epoch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", true),
      (2L, "reading and writing are learned through practice", "en", true),
      (3L, "der schnelle braune fuchs springt und laeuft weg", "de", true),
      (4L, "wissen und weisheit kommen durch lesen und uebung", "de", true),
      (10L, "every reader should finish this book", "en", false))
    val frozen = TextAnalysis.langIdModel(
      epoch.filter(_._4).map(r => (r._1, r._2, r._3))
        .toDF("doc_id", "text", "lang"), "text", "lang", k = K)
    def checkGold(label: String): Unit = {
      val truth = TextAnalysis.langIdScore(
          live.toSeq.map(kv => (kv._1, kv._2._1, kv._2._2))
            .toDF("doc_id", "text", "lang"),
          "doc_id", "text", "lang", frozen, k = K)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
      val got = fmt.read(spark, gold)
        .select("id", "declared_lang", "n_grams", "lang_guess", "lang_dist")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(got == truth, s"$label: gold $got vs frozen truth $truth")
    }
    foldBatch(1L, Nil, epoch: _*)
    assert(fmt.exists(s"$stateDir/model"))
    checkGold("after epoch fold")
    assert(fmt.read(spark, gold).filter(col("id") === 10L)
      .head.getString(3) == "en", "held-out english doc classifies en")
    // fold 2: doc 9 redelivers and classifies against the frozen model
    foldBatch(2L, Nil, (9L, "ein vortrag ueber sprachen und worte", "de", false),
      (11L, "durch uebung und lesen lernt der fuchs", "de", false))
    checkGold("after fold 2")
    assert(fmt.read(spark, gold).filter(col("id") === 11L)
      .head.getString(3) == "de", "held-out german doc classifies de")
    // fold 3: a LATE labeled doc — scored, but the profiles must not
    // move: doc 11's stored row must not change
    val before11 = fmt.read(spark, gold).filter(col("id") === 11L)
      .select("lang_guess", "lang_dist").head.toSeq
    foldBatch(3L, Nil, (5L, "mit mehr deutschen woertern und saetzen", "de", true))
    checkGold("after late-reference fold (frozen profiles)")
    assert(fmt.read(spark, gold).filter(col("id") === 11L)
      .select("lang_guess", "lang_dist").head.toSeq == before11,
      "a late labeled doc must not retrain the frozen profiles")
    // fold 4: update re-scores; update-to-null retracts
    foldBatch(4L, Nil, (10L, "the reader finished another book", "en", false),
      (11L, null.asInstanceOf[String], null.asInstanceOf[String], false))
    checkGold("after update + null retraction")
    assert(fmt.read(spark, gold).filter(col("id") === 11L).count() == 0)
    // crash replay: same batch, same ord — gold converges
    foldBatch(4L, Nil, (10L, "the reader finished another book", "en", false))
    checkGold("after crash replay")
    // hard delete
    foldBatch(5L, Seq(9L))
    checkGold("after hard delete")
    assert(fmt.read(spark, gold).filter(col("id") === 9L).count() == 0)
    // maxOrder/k drift refuses fast, naming the stored values
    val errL = intercept[IllegalArgumentException] {
      TextAnalysis.langIdIncremental(spark,
        Seq((12L, "whatever", "en", false))
          .toDF("doc_id", "text", "lang", "is_ref"),
        "doc_id", "text", stateDir, gold, batchOrd = 6L,
        refFilter = col("is_ref"), langLabel = col("lang"), k = 40,
        fmt = fmt)
    }
    assert(errL.getMessage.contains("50") && errL.getMessage.contains("40"),
      errL.getMessage)
    checkGold("after refused mismatched fold (state untouched)")
  }

  test("incremental bpe tokenizer: frozen merge table, gold equals frozen-encode truth, retracts, replays, deletes, param guard") {
    // the 17th incremental member (r20): per-doc token counts under
    // a FROZEN-EPOCH BPE merge table — train the tokenizer once on a
    // trusted slice, token-count every new crawl under it. Pins:
    // (a) a pre-training fold trains nothing; a training fold whose
    // slice yields no words >= 2 chars skips the epoch (the r20
    // guard); (b) gold equals batch bpeTokenCountsFrozen against the
    // frozen table after every fold (shared-kernel contract);
    // (c) a LATE training doc encodes but does NOT retrain;
    // (d) update re-scores, update-to-null retracts, hard delete
    // removes, crash replay converges; (e) a fold configured with a
    // different merge count refuses fast.
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    val fmt = graft.pipeline.SnapshotTableFormat
    val work = Files.createTempDirectory("graft_bpe_inc").toString
    val stateDir = s"$work/state"
    val gold = s"$work/gold"
    val M = 2
    var live = Map.empty[Long, String]
    def foldBatch(ord: Long, dels: Seq[Long],
                  rows: (Long, String, Boolean)*): Unit = {
      live ++= rows.filter(_._2 != null).map(r => r._1 -> r._2)
      live --= rows.filter(_._2 == null).map(_._1)
      live --= dels
      TextAnalysis.bpeTokenCountsIncremental(spark,
        rows.toSeq.toDF("doc_id", "text", "is_train"),
        "doc_id", "text", stateDir, gold, batchOrd = ord,
        trainFilter = col("is_train"), merges = M,
        deletes = if (dels.isEmpty) None else Some(dels.toDF("doc_id")),
        fmt = fmt)
    }
    def frozen() = fmt.read(spark, s"$stateDir/model")
      .select("merge_rank", "lhs", "rhs")
    def checkGold(label: String): Unit = {
      val truth = TextAnalysis.bpeTokenCountsFrozen(
          live.toSeq.toDF("doc_id", "text"), "doc_id", "text", frozen())
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val got = fmt.read(spark, gold).select("id", "n_bpe_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got == truth, s"$label: gold $got vs frozen-encode $truth")
    }
    // fold 0: no training rows — nothing to train or score
    foldBatch(0L, Nil, (9L, "abab corpus text", false))
    assert(!fmt.exists(s"$stateDir/model") && !fmt.exists(gold),
      "a pre-training fold must not train or score")
    live -= 9L
    // fold 0b: a training slice with no words >= 2 chars derives an
    // EMPTY merge table — skip the epoch, don't poison it
    foldBatch(0L, Nil, (8L, "a 7 !", true))
    assert(!fmt.exists(s"$stateDir/model"),
      "a zero-word training fold must not create state")
    live -= 8L
    // fold 1: the epoch — merges freeze as (a,b) then (ab,ab)
    foldBatch(1L, Nil, (1L, "abab abab abab", true),
      (10L, "ababab fresh words", false))
    assert(fmt.exists(s"$stateDir/model"))
    assert(frozen().orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
      == Seq(("a", "b"), ("ab", "ab")), "frozen trajectory")
    checkGold("after epoch fold")
    // 'ababab' -> [abab, ab] = 2, 'fresh' -> 5 chars no merges = 5,
    // 'words' -> 5: the held-out doc counts 12 under the frozen table
    assert(fmt.read(spark, gold).filter(col("id") === 10L)
      .head.getAs[Long]("n_bpe_tokens") == 12L)
    // fold 2: new docs encode against the frozen table
    foldBatch(2L, Nil, (9L, "abab corpus text", false),
      (11L, "abcab xyz", false))
    checkGold("after fold 2")
    // fold 3: a LATE training doc encodes but must not retrain
    foldBatch(3L, Nil, (2L, "cdcd cdcd cdcd", true))
    checkGold("after late-training fold (frozen table)")
    assert(frozen().count() == 2L,
      "a late training doc must not grow the frozen merge table")
    // fold 4: update re-scores; update-to-null retracts
    foldBatch(4L, Nil, (10L, "ab ab ab", false),
      (11L, null.asInstanceOf[String], false))
    checkGold("after update + null retraction")
    assert(fmt.read(spark, gold).filter(col("id") === 11L).count() == 0)
    // crash replay: same batch, same ord — gold converges
    foldBatch(4L, Nil, (10L, "ab ab ab", false))
    checkGold("after crash replay")
    // hard delete
    foldBatch(5L, Seq(9L))
    checkGold("after hard delete")
    assert(fmt.read(spark, gold).filter(col("id") === 9L).count() == 0)
    // merge-count drift refuses fast, naming both values
    val errB = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTokenCountsIncremental(spark,
        Seq((12L, "whatever", false)).toDF("doc_id", "text", "is_train"),
        "doc_id", "text", stateDir, gold, batchOrd = 6L,
        trainFilter = col("is_train"), merges = 5, fmt = fmt)
    }
    assert(errB.getMessage.contains("2") && errB.getMessage.contains("5"),
      errB.getMessage)
    checkGold("after refused mismatched fold (state untouched)")
  }

  test("incremental phash stats: streamed gold equals batch perceptual near-dup, updates retract, replays, deletes") {
    // the 18th incremental member (r20): perceptual near-dup for
    // binary assets over the change feed — the streaming sibling of
    // multimodal_near_dedup, sharing the simhash member's fold
    // machinery verbatim. Decodable images pair through real dHash
    // (a re-encode sits at Hamming 0), undecodable payloads through
    // the MD5-prefix identity; gold must equal the batch Hamming
    // stats over live-current after every fold.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.multimodal.{ImageCodec, Multimodal}
    val state = Files.createTempDirectory("graft_ph_state").toString + "/t"
    val gold = Files.createTempDirectory("graft_ph_gold").toString + "/t"
    var live = scala.collection.immutable.SortedMap.empty[Long, Array[Byte]]

    def texture(a: Double, b: Double): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val lum = (128 + 90 * math.sin(
          2 * math.Pi * (a * x / 64 + b * y / 48))).toInt.max(0).min(255)
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
      }
      ImageCodec.encodePng(img)
    }
    val imgA = texture(1.5, 1.0)
    // same pixels through a decode+re-encode round trip: Hamming 0
    val imgA2 = ImageCodec.encodePng(ImageCodec.decode(imgA).get)
    val imgB = texture(3.0, 2.2)
    val txt1 = "identical asset payload bytes".getBytes("UTF-8")
    val txt2 = "a different asset payload".getBytes("UTF-8")

    def fold(batch: Seq[(Long, Array[Byte])], ord: Long,
             dels: Option[Seq[Long]] = None): Unit =
      Dedup.phashStatsIncremental(spark,
        batch.toDF("asset_id", "payload"), "asset_id", "payload",
        state, gold, batchOrd = ord,
        deletes = dels.map(_.toDF("asset_id")))
    def rows(df: org.apache.spark.sql.DataFrame,
             idName: String): Seq[(Long, Long, Long, Long)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("simhash"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_near"))).toSeq.sortBy(_._1)
    def check(label: String): Unit = {
      val hashed = graft.Materialize.eager(
        Multimodal.perceptualHash64(
            live.toSeq.toDF("asset_id", "payload"), "asset_id", "payload")
          .select(col("asset_id").as("id"), col("phash").as("simhash")))
      val truth = rows(
        Dedup.hammingNearDupFromHashes(hashed, "asset_id",
          maxHamming = 8, maxBucket = 10000), "asset_id")
      val got = rows(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "asset_id"), "asset_id")
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    // batch 1: an image + its re-encode (dHash twins), a distinct
    // image, an undecodable payload
    val b1 = Seq(1L -> imgA, 2L -> imgA2, 3L -> imgB, 4L -> txt1)
    live ++= b1; fold(b1, 0L); check("after batch 1")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
      .head.getAs[Long]("n_near") == 1L,
      "the re-encoded image must pair with its original")
    assert(MergeTable.read(spark, gold).filter(col("id") === 3L)
      .head.getAs[Long]("n_near") == 0L)

    // batch 2: a byte twin of the undecodable payload — OLD doc 4
    // gains a partner through the MD5 identity
    val b2 = Seq(5L -> txt1)
    live ++= b2; fold(b2, 1L); check("after batch 2 (md5 twin joins)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 4L)
      .head.getAs[Long]("n_near") == 1L)

    // batch 3: doc 2's update leaves the image family
    val b3 = Seq(2L -> txt2)
    live ++= b3; fold(b3, 2L); check("after batch 3 (update retracts)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
      .head.getAs[Long]("n_near") == 0L,
      "the original must lose its re-encode partner on update")

    // crash replay: same batch, same ord — gold converges
    fold(b3, 2L); check("after crash replay")

    // hard delete: doc 5 leaves, doc 4 loses its md5 twin
    live -= 5L; fold(Nil, 3L, dels = Some(Seq(5L)))
    check("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("id") === 5L).count() == 0)
    assert(MergeTable.read(spark, gold).filter(col("id") === 4L)
      .head.getAs[Long]("n_near") == 0L)

    // null payload retracts like an update-to-null
    live -= 3L
    fold(Seq(3L -> null.asInstanceOf[Array[Byte]]), 4L)
    check("after null retraction")
    assert(MergeTable.read(spark, gold).filter(col("id") === 3L).count() == 0)
  }

  test("frozen-epoch members with an empty DERIVED state skip the epoch instead of poisoning it") {
    // r19 advisory: a fold whose slice rows are non-empty but whose
    // DERIVED state is empty (bench texts all shorter than the
    // shingle width; reference texts all empty strings) used to
    // create an empty state table whose NULL param stamp NPE'd every
    // later fold. The contract is the benchDocs.isEmpty one: the
    // epoch has not arrived yet — train on the first fold that
    // actually yields state.
    import SparkSpec.spark.implicits._
    import graft.operators.{Dedup, TextAnalysis}
    val fmt = graft.pipeline.SnapshotTableFormat
    // decontaminate: the shingle kernel emits >=1 hash per non-null
    // text (count = max(len-n+1, 1)), so a zero-shingle epoch cannot
    // be constructed through the public API — the skip guard there
    // is defensive. What CAN exist is a state table already poisoned
    // by a pre-guard version: simulate it and pin the recoverable
    // refusal (was: NPE on the null stamp).
    val workD = Files.createTempDirectory("graft_decon_empty").toString
    fmt.scd1Merge(spark, s"$workD/state/bench",
      Seq.empty[(Long, Int, Long)].toDF("h", "n_shingle", "_ord"),
      Seq("h"), "_ord", compareExclude = Nil)
    val errD = intercept[IllegalArgumentException] {
      Dedup.decontaminateIncremental(spark,
        Seq((2L, "real corpus doc here", false))
          .toDF("doc_id", "text", "is_bench"),
        "doc_id", "text", s"$workD/state", s"$workD/gold", batchOrd = 1L,
        benchFilter = col("is_bench"), n = 5, fmt = fmt)
    }
    assert(errD.getMessage.contains("no benchmark shingles"),
      errD.getMessage)
    // langid: all-empty reference texts yield no n-grams
    val workL = Files.createTempDirectory("graft_langid_empty").toString
    TextAnalysis.langIdIncremental(spark,
      Seq((1L, "", "en", true), (2L, "ein echter satz", "de", false))
        .toDF("doc_id", "text", "lang", "is_ref"),
      "doc_id", "text", s"$workL/state", s"$workL/gold", batchOrd = 0L,
      refFilter = col("is_ref"), langLabel = col("lang"), k = 50, fmt = fmt)
    assert(!fmt.exists(s"$workL/state/model") && !fmt.exists(s"$workL/gold"),
      "a zero-gram reference fold must not create state")
    TextAnalysis.langIdIncremental(spark,
      Seq((3L, "the quick brown fox jumps", "en", true),
        (4L, "der schnelle braune fuchs springt", "de", true),
        (5L, "another quick brown fox jumps", "en", false))
        .toDF("doc_id", "text", "lang", "is_ref"),
      "doc_id", "text", s"$workL/state", s"$workL/gold", batchOrd = 1L,
      refFilter = col("is_ref"), langLabel = col("lang"), k = 50, fmt = fmt)
    assert(fmt.read(spark, s"$workL/gold").filter(col("id") === 5L)
      .head.getAs[String]("lang_guess") == "en",
      "the first usable reference fold trains and scores")
    // ...and a legacy-poisoned EMPTY model table refuses with the
    // recoverable message instead of NPE-ing on the null stamp
    val workL2 = Files.createTempDirectory("graft_langid_poison").toString
    fmt.scd1Merge(spark, s"$workL2/state/model",
      Seq.empty[(String, String, Int, Int, Int, Long)]
        .toDF("lang", "_g", "_lrank", "max_order", "top_k", "_ord"),
      Seq("lang", "_g"), "_ord", compareExclude = Nil)
    val errL = intercept[IllegalArgumentException] {
      TextAnalysis.langIdIncremental(spark,
        Seq((6L, "some text", "en", false))
          .toDF("doc_id", "text", "lang", "is_ref"),
        "doc_id", "text", s"$workL2/state", s"$workL2/gold", batchOrd = 1L,
        refFilter = col("is_ref"), langLabel = col("lang"), k = 50,
        fmt = fmt)
    }
    assert(errL.getMessage.contains("no rank profiles"), errL.getMessage)
  }

}
