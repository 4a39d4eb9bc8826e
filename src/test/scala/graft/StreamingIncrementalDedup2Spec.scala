package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.operators.Events
import graft.pipeline.MergeTable
import graft.streaming.StreamingIngest

/** Incremental dedup/ANN members, part 2 (append-only fast paths,
  * exact/embedding/simhash/IVF members) — r22 shard split; no test
  * changed or removed.
  */
class StreamingIncrementalDedup2Spec extends SparkSpec {
  test("incremental exact dedup: streamed gold equals batch recompute; vanished groups delete") {
    // simplest member of the incremental-dedup family: per-hash-group
    // gold rows (text_hash, keep_doc_id, n_copies) must equal
    // Dedup.exact over silver-current after every fold — including a
    // late duplicate growing an OLD group, an update moving a doc
    // between groups (the emptied group's gold row must be DELETED),
    // and a crash between the state and gold merges.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_ex_silver").toString
    val state = Files.createTempDirectory("graft_ex_state").toString + "/t"
    val gold = Files.createTempDirectory("graft_ex_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_ex_ck").toString

    def fold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, v) =>
        Dedup.exactDedupIncremental(spark, chg.select("doc_id", "text"),
          "doc_id", "text", state, gold, batchOrd = v.toLong)
      }
    def groups(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
      df.collect().map(r => (r.getAs[String]("text_hash"),
        r.getAs[Long]("keep_doc_id"), r.getAs[Long]("n_copies")))
        .toSeq.sortBy(_._1)
    def check(label: String): Unit = {
      // the incremental operator's documented deviation: the batch
      // operator's null-hash group (null-text docs) is excluded
      val truth = groups(Dedup.exact(
          fmt.read(spark, silver).select("doc_id", "text"),
          "doc_id", "text")
        .filter(col("text_hash").isNotNull))
      val got = groups(MergeTable.read(spark, gold))
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    // batch 1: two copies of A, one B
    fmt.scd1Merge(spark, silver, Seq(
        (1L, "text A", 0), (2L, "text A", 0), (3L, "text B", 0))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)
    assert(fold().nonEmpty); check("after batch 1")

    // batch 2: a late copy of A grows the OLD group
    fmt.scd1Merge(spark, silver,
      Seq((4L, "text A", 1)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty); check("after batch 2 (old group grows)")

    // batch 3: doc 3's update moves it into the A group — the B
    // group empties and its gold row must disappear
    fmt.scd1Merge(spark, silver,
      Seq((3L, "text A", 2)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty); check("after batch 3 (group vanishes)")
    assert(MergeTable.read(spark, gold).count() == 1,
      "only the A group may remain")

    // crash replay: batch 4 creates group C; state merges, gold rolls
    // back; redelivery must converge (signature vs current state)
    val b4 = Seq((5L, "text C", 3)).toDF("doc_id", "text", "ord")
    fmt.scd1Merge(spark, silver, b4, Seq("doc_id"), "ord",
      compareExclude = Nil)
    val sfmt = graft.pipeline.SnapshotTableFormat
    sfmt.deleteKeys(spark, state, b4.select(col("doc_id").as("id")), Seq("id"))
    sfmt.scd1Merge(spark, state,
      b4.select(col("doc_id").as("id"),
        org.apache.spark.sql.functions.md5(col("text")).as("text_hash"))
        .withColumn("_ord", lit(3L)),
      Seq("text_hash", "id"), "_ord", compareExclude = Nil)
    assert(fold().nonEmpty, "the crashed batch must be redelivered")
    check("after crash-replay of batch 4")

    assert(fold().isEmpty, "caught-up consumer must re-process nothing")
    check("after no-op fold")

    // hard DELETE feed: dropping doc 3 shrinks the A group, dropping
    // doc 5 empties group C entirely — its gold row must go too
    val delIds = Seq(3L, 5L).toDF("doc_id")
    fmt.deleteKeys(spark, silver, delIds, Seq("doc_id"))
    Dedup.exactDedupIncremental(spark,
      spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit("").as("text"))
        .limit(0),
      "doc_id", "text", state, gold, batchOrd = 4L,
      deletes = Some(delIds))
    check("after hard deletes")
    assert(MergeTable.read(spark, gold).count() == 1,
      "group C must vanish with its last member")

    // a NULL-text doc is excluded from state and gold (documented
    // deviation: a keyed merge table cannot hold the null-hash group)
    Dedup.exactDedupIncremental(spark,
      Seq((9L, null.asInstanceOf[String], 5)).toDF("doc_id", "text", "ord")
        .select(col("doc_id"), col("text")),
      "doc_id", "text", state, gold, batchOrd = 5L)
    assert(MergeTable.read(spark, gold).count() == 1,
      "a null-text doc must not add a gold group")

    // an update TO null must still RETRACT the doc's old state pair:
    // doc 1 leaves the A group, so keep moves to doc 2 and n drops
    fmt.scd1Merge(spark, silver,
      Seq((1L, null.asInstanceOf[String], 6)).toDF("doc_id", "text", "ord"),
      Seq("doc_id"), "ord", compareExclude = Nil)
    Dedup.exactDedupIncremental(spark,
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", state, gold, batchOrd = 6L)
    check("after update-to-null retraction")
    val aGroup = MergeTable.read(spark, gold).head
    assert(aGroup.getAs[Long]("keep_doc_id") == 2L &&
      aGroup.getAs[Long]("n_copies") == 2L,
      s"doc 1 must leave its group: $aGroup")
  }

  test("incremental exact dedup folds hard deletes through the streaming driver") {
    // end-to-end wiring of the delete feed: silver upserts AND hard
    // deletes flow through processAvailableWithDeletes (which owns
    // the from-version each window's delete diff needs) into the
    // incremental operator — no external offset bookkeeping
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_exd_silver").toString
    val state = Files.createTempDirectory("graft_exd_state").toString + "/t"
    val gold = Files.createTempDirectory("graft_exd_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_exd_ck").toString

    def fold(): Seq[Int] =
      MergeTableStream.processAvailableWithDeletes(spark, silver, ck,
        Seq("doc_id"), fmt) { (chg, dels, v, resync) =>
        Dedup.exactDedupIncremental(spark, chg.select("doc_id", "text"),
          "doc_id", "text", state, gold, batchOrd = v.toLong,
          deletes = Some(dels), fullResync = resync)
      }
    def check(label: String): Unit = {
      val truth = Dedup.exact(
          fmt.read(spark, silver).select("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      val got = MergeTable.read(spark, gold)
        .select("text_hash", "keep_doc_id", "n_copies")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      assert(got == truth, s"$label: $got vs $truth")
    }

    fmt.scd1Merge(spark, silver, Seq(
        (1L, "text A", 0), (2L, "text A", 0), (3L, "text B", 0))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)
    assert(fold().nonEmpty); check("after upsert batch")

    // a delete-only silver commit: the change feed is empty, the
    // delete feed carries doc 2 — its group must shrink
    fmt.deleteKeys(spark, silver, Seq(2L).toDF("doc_id"), Seq("doc_id"))
    assert(fold().nonEmpty); check("after streamed delete of doc 2")

    // deleting doc 3 empties group B — its gold row must vanish
    fmt.deleteKeys(spark, silver, Seq(3L).toDF("doc_id"), Seq("doc_id"))
    assert(fold().nonEmpty); check("after streamed delete of doc 3")
    assert(MergeTable.read(spark, gold).count() == 1)
    assert(fold().isEmpty, "caught-up consumer must re-process nothing")
  }

  test("fullResync window reconciles keyed state past a vacuumed gap") {
    // the degraded window of processAvailableWithDeletes: the
    // consumer's from-version is vacuumed past retention, so the
    // delete feed CANNOT carry keys hard-deleted inside the gap. The
    // driver flags fullResync and the incremental operator
    // reconciles state-minus-snapshot; without the flag doc 2's
    // state pair would survive forever and group A would report
    // n_copies=2 against a silver that holds one copy — permanent
    // divergence, since the full-snapshot change batch only
    // re-merges live rows and never retracts.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_rsync_silver").toString
    val state = Files.createTempDirectory("graft_rsync_state").toString + "/t"
    val gold = Files.createTempDirectory("graft_rsync_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_rsync_ck").toString
    val resyncs = scala.collection.mutable.ArrayBuffer.empty[(Int, Boolean)]
    def fold(): Seq[Int] =
      MergeTableStream.processAvailableWithDeletes(spark, silver, ck,
        Seq("doc_id"), fmt) { (chg, dels, v, resync) =>
        resyncs += ((v, resync))
        Dedup.exactDedupIncremental(spark, chg.select("doc_id", "text"),
          "doc_id", "text", state, gold, batchOrd = v.toLong,
          deletes = Some(dels), fullResync = resync)
      }
    def check(label: String): Unit = {
      val truth = Dedup.exact(
          fmt.read(spark, silver).select("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      val got = MergeTable.read(spark, gold)
        .select("text_hash", "keep_doc_id", "n_copies")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      assert(got == truth, s"$label: $got vs $truth")
    }
    fmt.scd1Merge(spark, silver, Seq(
        (1L, "text A", 0), (2L, "text A", 0), (3L, "text B", 0))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)                                          // v0
    assert(fold() == Seq(0)); check("initial fold")
    // inside the soon-vacuumed gap: doc 2 hard-deleted, doc 4 arrives
    fmt.deleteKeys(spark, silver, Seq(2L).toDF("doc_id"), Seq("doc_id")) // v1
    fmt.scd1Merge(spark, silver, Seq((4L, "text C", 2))
      .toDF("doc_id", "text", "ord"), Seq("doc_id"), "ord",
      compareExclude = Nil)                                          // v2
    // the producer vacuums past the consumer's offset: v0/v1 files
    // are gone, so v1's delete can never ride a delete feed
    assert(fmt.vacuum(silver, keepVersions = 1).nonEmpty)
    val processed = fold()
    assert(processed.nonEmpty, s"must drain to head: $processed")
    assert(resyncs.drop(1).exists(_._2),
      s"the post-vacuum window must be flagged fullResync: $resyncs")
    check("after vacuumed-gap resync")
    assert(fold().isEmpty, "caught-up consumer must re-process nothing")
  }

  test("incremental embedding near-dup: streamed gold equals batch recompute") {
    // the EMBEDDING member of the incremental family: SRP-bucketed
    // cosine stats maintained across micro-batches must equal
    // Dedup.embeddingStatsLsh over silver-current after every fold —
    // arrivals updating old vectors' stats, an update retracting a
    // partnership, a hard delete, and an update-to-null.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_emb_silver").toString
    val state = Files.createTempDirectory("graft_emb_state").toString + "/t"
    val gold = Files.createTempDirectory("graft_emb_gold").toString + "/t"
    val ck = Files.createTempDirectory("graft_emb_ck").toString
    val thr = 0.9

    def vec(x: Float, y: Float): Array[Float] = Array(x, y, 0f, 0f)
    def fold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, v) =>
        Dedup.embeddingStatsLshIncremental(spark,
          chg.select("vec_id", "embedding"), "vec_id", "embedding",
          state, gold, batchOrd = v.toLong, threshold = thr, planes = 4)
      }
    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("n_near"),
        Option(r.get(r.fieldIndex("max_cos"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)
    def check(label: String): Unit = {
      val truth = stats(Dedup.embeddingStatsLsh(
        fmt.read(spark, silver).select("vec_id", "embedding")
          .filter(col("embedding").isNotNull),
        "vec_id", "embedding", threshold = thr, planes = 4), "vec_id")
      val got = stats(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "vec_id"), "vec_id")
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    // batch 1: vectors 1,2 identical; 3 in a different direction
    fmt.scd1Merge(spark, silver, Seq(
        (1L, vec(1f, 0f), 0), (2L, vec(1f, 0f), 0), (3L, vec(-1f, 0.2f), 0))
      .toDF("vec_id", "embedding", "ord"), Seq("vec_id"), "ord",
      compareExclude = Nil)
    assert(fold().nonEmpty); check("after batch 1")

    // batch 2: vector 4 joins the duplicate family
    fmt.scd1Merge(spark, silver,
      Seq((4L, vec(1f, 0f), 1)).toDF("vec_id", "embedding", "ord"),
      Seq("vec_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty); check("after batch 2 (old vectors gain a partner)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_near") == 2L, "vec 1 must see both duplicates")

    // batch 3: vector 2 rotates away — partnership retracts via vhash
    fmt.scd1Merge(spark, silver,
      Seq((2L, vec(-1f, 0.19f), 2)).toDF("vec_id", "embedding", "ord"),
      Seq("vec_id"), "ord", compareExclude = Nil)
    assert(fold().nonEmpty); check("after batch 3 (update retracts)")

    // hard delete vector 4; then update vector 1 to a null embedding
    val delIds = Seq(4L).toDF("vec_id")
    fmt.deleteKeys(spark, silver, delIds, Seq("vec_id"))
    Dedup.embeddingStatsLshIncremental(spark,
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      "vec_id", "embedding", state, gold, batchOrd = 3L,
      threshold = thr, planes = 4, deletes = Some(delIds))
    check("after hard delete")
    fmt.scd1Merge(spark, silver,
      Seq((1L, null.asInstanceOf[Array[Float]], 4))
        .toDF("vec_id", "embedding", "ord"),
      Seq("vec_id"), "ord", compareExclude = Nil)
    Dedup.embeddingStatsLshIncremental(spark,
      Seq((1L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"),
      "vec_id", "embedding", state, gold, batchOrd = 4L,
      threshold = thr, planes = 4)
    check("after update-to-null retraction")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L).count() == 0,
      "the nulled vector's gold row must disappear")
  }

  /** TableFormat wrapper counting direct `read(path)` calls per
    * path — the structural proof of the append-only fast paths: the
    * general path reads GOLD every batch (the signature-staleness
    * probe); the fast paths never do (merges are not reads — they
    * happen inside the format).
    */
  test("append-only exact dedup fast path: equals batch and general path, never reads gold, fewer jobs") {
    // the insert-only regime (crawl ingest): the fast path must
    // produce gold IDENTICAL to both the batch recompute and the
    // general path — including the stored group signatures, so a
    // later switch back to the general path stays sound — while
    // provably skipping the general path's per-batch work: zero
    // direct gold reads, and strictly fewer Spark jobs per fold.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val base = graft.pipeline.SnapshotTableFormat
    val fmtF = new CountingFormat(base)
    val fmtG = new CountingFormat(base)
    val stF = Files.createTempDirectory("graft_ao_ex_stF").toString + "/t"
    val goF = Files.createTempDirectory("graft_ao_ex_goF").toString + "/t"
    val stG = Files.createTempDirectory("graft_ao_ex_stG").toString + "/t"
    val goG = Files.createTempDirectory("graft_ao_ex_goG").toString + "/t"

    val batches = Seq(
      Seq((1L, "text A"), (2L, "text A"), (3L, "text B")),
      Seq((4L, "text A"), (5L, "text C")),
      Seq((6L, "text B"), (7L, "text C"), (8L, "text D")))
    var seen = Seq.empty[(Long, String)]

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def countJobs(body: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      try { body; Thread.sleep(500) }
      finally spark.sparkContext.removeSparkListener(listener)
      jobs.get()
    }

    def goldRows(path: String): Seq[(String, Long, Long, Long)] =
      MergeTable.read(spark, path).collect()
        .map(r => (r.getAs[String]("text_hash"), r.getAs[Long]("keep_doc_id"),
          r.getAs[Long]("n_copies"), r.getAs[Long]("_grp_sig")))
        .toSeq.sortBy(_._1)

    batches.zipWithIndex.foreach { case (b, i) =>
      seen ++= b
      val df = b.toDF("doc_id", "text")
      val jF = countJobs {
        Dedup.exactDedupIncremental(spark, df, "doc_id", "text",
          stF, goF, batchOrd = i.toLong, appendOnly = true, fmt = fmtF)
      }
      val jG = countJobs {
        Dedup.exactDedupIncremental(spark, df, "doc_id", "text",
          stG, goG, batchOrd = i.toLong, fmt = fmtG)
      }
      val truth = seen.toDF("doc_id", "text")
        .transform(d => Dedup.exact(d, "doc_id", "text"))
        .collect().map(r => (r.getAs[String]("text_hash"),
          r.getAs[Long]("keep_doc_id"), r.getAs[Long]("n_copies")))
        .toSeq.sortBy(_._1)
      val fast = goldRows(goF)
      assert(fast.map(t => (t._1, t._2, t._3)) == truth,
        s"batch $i: fast gold must equal the batch recompute")
      assert(fast == goldRows(goG),
        s"batch $i: fast gold (incl. signatures) must equal the general path")
      if (i > 0)
        assert(jF < jG,
          s"batch $i: fast path must run fewer jobs ($jF vs $jG)")
    }
    assert(fmtF.readsOf(goF) == 0,
      "the fast path must never read gold")
    assert(fmtG.readsOf(goG) > 0,
      "the general path's staleness probe reads gold (the cost the fast path skips)")

    // a delete feed contradicts the appendOnly declaration — loudly
    intercept[IllegalArgumentException] {
      Dedup.exactDedupIncremental(spark,
        Seq((9L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        stF, goF, batchOrd = 9L, appendOnly = true,
        deletes = Some(Seq(1L).toDF("doc_id")), fmt = fmtF)
    }
  }

  test("append-only minhash fast path: neighborhood re-verify equals batch and general path") {
    // the two-hop case: batch doc 4 joins the duplicate family, so
    // OLD docs 1,2 (not in the batch) must gain a partner — their
    // re-verification needs their OTHER buckets' members too, which
    // is exactly the fast path's two-hop neighborhood
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val base = graft.pipeline.SnapshotTableFormat
    val fmtF = new CountingFormat(base)
    val stF = Files.createTempDirectory("graft_ao_mh_stF").toString
    val goF = Files.createTempDirectory("graft_ao_mh_goF").toString + "/t"
    val stG = Files.createTempDirectory("graft_ao_mh_stG").toString
    val goG = Files.createTempDirectory("graft_ao_mh_goG").toString + "/t"
    val P = (3, 16, 4, 0.5, 10) // n, numPerm, bands, threshold, maxBucket

    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val nearText = "alpha beta gamma delta epsilon zeta eta iota"
    val batches = Seq(
      Seq((1L, dupText), (2L, dupText),
        (3L, "one two three four five six seven")),
      Seq((4L, dupText)),
      Seq((5L, "one two three four five six seven"), (6L, nearText)))
    var seen = Seq.empty[(Long, String)]

    def run(df: org.apache.spark.sql.DataFrame, ord: Long,
            append: Boolean): Unit =
      Dedup.minhashLshStatsIncremental(spark, df, "doc_id", "text",
        if (append) stF else stG, if (append) goF else goG, batchOrd = ord,
        n = P._1, numPerm = P._2, bands = P._3, threshold = P._4,
        maxBucket = P._5, appendOnly = append,
        fmt = if (append) fmtF else base)
    def stats(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_near"),
        Option(r.get(r.fieldIndex("max_jaccard"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)

    batches.zipWithIndex.foreach { case (b, i) =>
      seen ++= b
      val df = b.toDF("doc_id", "text")
      run(df, i.toLong, append = true)
      run(df, i.toLong, append = false)
      val truth = stats(Dedup.minhashLshStats(
          seen.toDF("doc_id", "text"), "doc_id", "text",
          n = P._1, numPerm = P._2, bands = P._3,
          threshold = P._4, maxBucket = P._5)
        .withColumnRenamed("doc_id", "id"))
      val fast = stats(MergeTable.read(spark, goF))
      assert(fast == truth, s"batch $i: fast gold must equal batch recompute")
      val gen = MergeTable.read(spark, goG).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("_bucket_sig")))
        .toSeq.sortBy(_._1)
      val fsig = MergeTable.read(spark, goF).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("_bucket_sig")))
        .toSeq.sortBy(_._1)
      assert(fsig == gen,
        s"batch $i: fast signatures must equal the general path's")
    }
    assert(MergeTable.read(spark, goF).filter(col("id") === 1L)
        .head.getAs[Long]("n_near") == 3L,
      "old doc 1 must have gained the exact duplicates AND the near variant")
    assert(fmtF.readsOf(goF) == 0, "the fast path must never read gold")
  }

  test("append-only embedding fast path: one-hop bucket re-verify equals batch and general path") {
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val base = graft.pipeline.SnapshotTableFormat
    val fmtF = new CountingFormat(base)
    val stF = Files.createTempDirectory("graft_ao_em_stF").toString + "/t"
    val goF = Files.createTempDirectory("graft_ao_em_goF").toString + "/t"
    val stG = Files.createTempDirectory("graft_ao_em_stG").toString + "/t"
    val goG = Files.createTempDirectory("graft_ao_em_goG").toString + "/t"
    val thr = 0.9

    val a = Array(1f, 0f, 0f); val a2 = Array(0.9f, 0.1f, 0f)
    val b = Array(0f, 1f, 0f); val c = Array(-1f, 0f, 0.2f)
    val batches = Seq(
      Seq((1L, a), (2L, a2), (3L, b)),
      Seq((4L, a)),
      Seq((5L, b), (6L, c)))
    var seen = Seq.empty[(Long, Array[Float])]

    def stats(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_near"),
        Option(r.get(r.fieldIndex("max_cos")))
          .map(v => f"${v.asInstanceOf[Double]}%.6f").orNull))
        .toSeq.sortBy(_._1)

    batches.zipWithIndex.foreach { case (bt, i) =>
      seen ++= bt
      val df = bt.toDF("vec_id", "embedding")
      Dedup.embeddingStatsLshIncremental(spark, df, "vec_id", "embedding",
        stF, goF, batchOrd = i.toLong, threshold = thr, planes = 4,
        appendOnly = true, fmt = fmtF)
      Dedup.embeddingStatsLshIncremental(spark, df, "vec_id", "embedding",
        stG, goG, batchOrd = i.toLong, threshold = thr, planes = 4, fmt = base)
      val truth = stats(Dedup.embeddingStatsLsh(
          seen.toDF("vec_id", "embedding"), "vec_id", "embedding",
          threshold = thr, planes = 4)
        .withColumnRenamed("vec_id", "id"))
      assert(stats(MergeTable.read(spark, goF)) == truth,
        s"batch $i: fast gold must equal batch recompute")
      def full(p: String) = MergeTable.read(spark, p).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_near"),
          r.getAs[Long]("_bucket_sig"))).toSeq.sortBy(_._1)
      assert(full(goF) == full(goG),
        s"batch $i: fast gold (incl. signatures) must equal the general path")
    }
    assert(fmtF.readsOf(goF) == 0, "the fast path must never read gold")
  }

  test("append-only segment dedup fast path: hot flips re-clean old docs, equals batch and general path") {
    // batch 2 pushes the shared segment's doc-count over minDocs:
    // OLD docs 1,2 (not in the batch) must be re-cleaned — the fast
    // path finds them via the flipped-segment probe, with their text
    // read from gold keyed by id, never a full hot-set aggregation
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    val base = graft.pipeline.SnapshotTableFormat
    val fmtF = new CountingFormat(base)
    val stF = Files.createTempDirectory("graft_ao_sg_stF").toString + "/t"
    val goF = Files.createTempDirectory("graft_ao_sg_goF").toString + "/t"
    val stG = Files.createTempDirectory("graft_ao_sg_stG").toString + "/t"
    val goG = Files.createTempDirectory("graft_ao_sg_goG").toString + "/t"
    val (segWords, minDocs) = (2, 3)
    val segA = "common boiler"

    val batches = Seq(
      Seq((1L, s"$segA one two"), (2L, s"$segA three four")),
      Seq((3L, s"$segA five six")),
      Seq((4L, "seven eight"), (5L, s"$segA nine ten")))
    var seen = Seq.empty[(Long, String)]

    def stats(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("clean_text"), r.getAs[Long]("kept_segments"),
        r.getAs[Long]("removed_segments"))).toSeq.sortBy(_._1)

    batches.zipWithIndex.foreach { case (b, i) =>
      seen ++= b
      val df = b.toDF("doc_id", "text")
      TextAnalysis.segmentDedupIncremental(spark, df, "doc_id", "text",
        stF, goF, batchOrd = i.toLong, segWords = segWords,
        minDocs = minDocs, appendOnly = true, fmt = fmtF)
      TextAnalysis.segmentDedupIncremental(spark, df, "doc_id", "text",
        stG, goG, batchOrd = i.toLong, segWords = segWords,
        minDocs = minDocs, fmt = base)
      val truth = stats(TextAnalysis.segmentDedup(
        seen.toDF("doc_id", "text"), "doc_id", "text",
        segWords = segWords, minDocs = minDocs))
      assert(stats(MergeTable.read(spark, goF)) == truth,
        s"batch $i: fast gold must equal batch recompute")
      def full(p: String) = MergeTable.read(spark, p).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
          r.getAs[Long]("_hot_sig"))).toSeq.sortBy(_._1)
      assert(full(goF) == full(goG),
        s"batch $i: fast gold (incl. signatures) must equal the general path")
    }
    assert(MergeTable.read(spark, goF).filter(col("doc_id") === 1L)
        .head.getAs[String]("clean_text") == "one two",
      "old doc 1 must have lost the flipped hot segment")
    assert(fmtF.readsOf(goF) > 0,
      "old docs' text IS read from gold keyed by id — that read is the design")
  }

  test("incremental cluster resolution: labels equal batch dedupResolve; a bridge merges old clusters") {
    // the resolution counterpart of the incremental stats family:
    // labels maintained across insert-only micro-batches must equal
    // dedupResolve over the cumulative corpus after every fold. The
    // decisive case is the BRIDGE: a batch doc near TWO existing
    // clusters must merge them — every old member of the
    // higher-canonical cluster relabels without being in the batch,
    // through the label-level union (no historic edges stored).
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val stateDir = Files.createTempDirectory("graft_rc_state").toString
    val gold = Files.createTempDirectory("graft_rc_gold").toString + "/t"
    val thr = 0.25
    var live = scala.collection.immutable.SortedMap.empty[Long, String]

    def fold(batch: Seq[(Long, String)], ord: Long): Unit =
      Dedup.dedupResolveIncremental(spark, batch.toDF("doc_id", "text"),
        "doc_id", "text", stateDir, gold, batchOrd = ord,
        numPerm = 64, bands = 32, threshold = thr)
    def check(label: String): Unit = {
      val truth = Dedup.dedupResolve(live.toSeq.toDF("doc_id", "text"),
          "doc_id", "text", numPerm = 64, bands = 32, threshold = thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSeq.sorted
      val got = MergeTable.read(spark, gold)
        .select(col("id"), col("canonical"),
          (col("id") =!= col("canonical")).as("is_dup"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSeq.sorted
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    val t1 = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val t2 = "one two three four five six seven eight " * 4
    val bridge = ("alpha beta gamma delta epsilon zeta eta theta " +
      "one two three four five six seven eight ") * 2

    // batch 1: two separate clusters
    val b1 = Seq(10L -> t1, 11L -> (t1 + "x"), 30L -> t2, 31L -> (t2 + "z"))
    live ++= b1; fold(b1, 0L); check("after batch 1")
    // batch 2: an unrelated singleton and one more member of X
    val b2 = Seq(12L -> (t1 + "yy"), 40L -> "nothing shared with anyone at all here")
    live ++= b2; fold(b2, 1L); check("after batch 2")
    // batch 3: the bridge merges X and Y — old docs 30,31 relabel
    val b3 = Seq(20L -> bridge)
    live ++= b3; fold(b3, 2L); check("after batch 3 (bridge merge)")
    val cans = MergeTable.read(spark, gold)
      .filter(col("id").isin(10L, 11L, 12L, 20L, 30L, 31L))
      .select(col("canonical")).distinct().collect().map(_.getLong(0))
    assert(cans.toSeq == Seq(10L),
      s"the bridge must pull every member to canonical 10, got ${cans.toSeq}")

    // duplicate delivery of batch 3 converges (ord-guarded re-init)
    fold(b3, 3L); check("after duplicate delivery")

    // crash: roll labels back to pre-bridge, redeliver — the merges
    // re-derive from docs/bands state, which already holds the batch
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
    val bak = Files.createTempDirectory("graft_rc_bak").toString + "/t"
    copyDir(gold, bak)
    val b4 = Seq(13L -> (t1 + "qq"))
    live ++= b4; fold(b4, 4L)
    deleteDir(gold); copyDir(bak, gold)
    fold(b4, 5L) // redelivery after gold rollback
    check("after crash-replay of batch 4")
  }

  test("incremental simhash stats: streamed gold equals batch recompute, updates retract, crashes replay") {
    // the SIMHASH member completes the five-member incremental
    // family. Single state table (id, simhash) — chunk buckets
    // derive by projection, and the simhash doubles as the content
    // fingerprint, so an UPDATE invalidates every bucket mate with
    // no separate chash column. Gold must equal simhashStats over
    // live-current after every fold.
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val state = Files.createTempDirectory("graft_sh_state").toString + "/t"
    val gold = Files.createTempDirectory("graft_sh_gold").toString + "/t"
    var live = scala.collection.immutable.SortedMap.empty[Long, String]

    def fold(batch: Seq[(Long, String)], ord: Long,
             dels: Option[Seq[Long]] = None): Unit =
      Dedup.simhashStatsIncremental(spark, batch.toDF("doc_id", "text"),
        "doc_id", "text", state, gold, batchOrd = ord,
        deletes = dels.map(_.toDF("doc_id")))
    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("simhash"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_near"),
        Option(r.get(r.fieldIndex("min_hamming"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)
    def check(label: String): Unit = {
      val truth = stats(Dedup.simhashStats(
        live.toSeq.toDF("doc_id", "text"), "doc_id", "text"), "doc_id")
      val got = stats(MergeTable.read(spark, gold)
        .withColumnRenamed("id", "doc_id"), "doc_id")
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    // batch 1: docs 1,2 identical; doc 3 unrelated
    val b1 = Seq(1L -> dupText, 2L -> dupText,
      3L -> "one two three four five six seven")
    live ++= b1; fold(b1, 0L); check("after batch 1")

    // batch 2: doc 4 joins the family — OLD docs 1,2 gain a partner
    val b2 = Seq(4L -> dupText)
    live ++= b2; fold(b2, 1L); check("after batch 2 (old docs gain a partner)")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L)
        .head.getAs[Long]("n_near") == 2L,
      "doc 1 must see both duplicates")

    // batch 3: doc 2's UPDATE leaves the family — the simhash change
    // IS the content-fingerprint retraction
    val b3 = Seq(2L -> "totally different words now here instead")
    live ++= b3; fold(b3, 2L); check("after batch 3 (update retracts)")

    // CRASH: run batch 4 fully, roll gold back, refold — the
    // signature check against CURRENT state must re-flag the mates
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
    val bak = Files.createTempDirectory("graft_sh_bak").toString + "/t"
    copyDir(gold, bak)
    val b4 = Seq(5L -> "one two three four five six seven")
    live ++= b4; fold(b4, 3L)
    deleteDir(gold); copyDir(bak, gold)
    fold(b4, 4L) // redelivery
    check("after crash-replay of batch 4")

    // hard DELETE: doc 4 leaves — docs 1's stats shrink, 4's row goes
    live -= 4L
    fold(Seq.empty, 5L, dels = Some(Seq(4L)))
    check("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("id") === 4L).count() == 0)

    // update TO null retracts like a delete
    live -= 1L
    fold(Seq(1L -> null.asInstanceOf[String]), 6L)
    check("after update-to-null retraction")
    assert(MergeTable.read(spark, gold).filter(col("id") === 1L).count() == 0)
  }

  test("append-only simhash fast path: touched-chunk re-verify equals batch and general path") {
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val base = graft.pipeline.SnapshotTableFormat
    val fmtF = new CountingFormat(base)
    val stF = Files.createTempDirectory("graft_ao_sh_stF").toString + "/t"
    val goF = Files.createTempDirectory("graft_ao_sh_goF").toString + "/t"
    val stG = Files.createTempDirectory("graft_ao_sh_stG").toString + "/t"
    val goG = Files.createTempDirectory("graft_ao_sh_goG").toString + "/t"

    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val batches = Seq(
      Seq(1L -> dupText, 2L -> dupText,
        3L -> "one two three four five six seven"),
      Seq(4L -> dupText),
      Seq(5L -> "one two three four five six seven"))
    var live = scala.collection.immutable.SortedMap.empty[Long, String]

    def stats(df: org.apache.spark.sql.DataFrame,
              idName: String): Seq[(Long, Long, Long, Long, String)] =
      df.collect().map(r => (r.getAs[Long](idName),
        r.getAs[Long]("simhash"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_near"),
        Option(r.get(r.fieldIndex("min_hamming"))).map(_.toString).orNull))
        .toSeq.sortBy(_._1)

    batches.zipWithIndex.foreach { case (b, i) =>
      live ++= b
      val df = b.toDF("doc_id", "text")
      Dedup.simhashStatsIncremental(spark, df, "doc_id", "text",
        stF, goF, batchOrd = i.toLong, appendOnly = true, fmt = fmtF)
      Dedup.simhashStatsIncremental(spark, df, "doc_id", "text",
        stG, goG, batchOrd = i.toLong, fmt = base)
      val truth = stats(Dedup.simhashStats(
        live.toSeq.toDF("doc_id", "text"), "doc_id", "text"), "doc_id")
      assert(stats(MergeTable.read(spark, goF)
          .withColumnRenamed("id", "doc_id"), "doc_id") == truth,
        s"batch $i: fast gold must equal batch recompute")
      def full(p: String) = MergeTable.read(spark, p).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("_bucket_sig"))).toSeq.sortBy(_._1)
      assert(full(goF) == full(goG),
        s"batch $i: fast gold (incl. signatures) must equal the general path")
    }
    assert(fmtF.readsOf(goF) == 0, "the fast path must never read gold")
    intercept[IllegalArgumentException] {
      Dedup.simhashStatsIncremental(spark,
        Seq((9L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        stF, goF, batchOrd = 9L, appendOnly = true,
        deletes = Some(Seq(1L).toDF("doc_id")), fmt = fmtF)
    }
  }

  test("incremental IVF ANN: maintained gold equals batch recompute on frozen centroids") {
    // the ANN member of the incremental family: inverted lists
    // maintained delete+merge across micro-batches, per-vector
    // probe-list signatures deciding who re-queries. Gold must equal
    // annIvfWith over silver-current on the SAME epoch-frozen
    // centroids after every fold — including old vectors whose
    // neighborhood a new arrival changed, an UPDATE moving a vector
    // between lists, a crash rolled back between the members merge
    // and the gold/ledger merges, hard deletes, and update-to-null.
    import SparkSpec.spark.implicits._
    import graft.operators.Similarity
    val fmtS = graft.pipeline.SnapshotTableFormat
    val stateDir = Files.createTempDirectory("graft_ivf_state").toString
    val gold = Files.createTempDirectory("graft_ivf_gold").toString + "/t"
    val (k, nlist, nprobe) = (3, 3, 2)
    var corpus = scala.collection.immutable.SortedMap.empty[Long, Array[Float]]

    def fold(batch: Seq[(Long, Array[Float])], ord: Long,
             dels: Option[Seq[Long]] = None): Unit =
      Similarity.annIvfIncremental(spark,
        batch.toDF("vec_id", "embedding"), "vec_id", "embedding",
        stateDir, gold, batchOrd = ord, k = k, nlist = nlist,
        nprobe = nprobe, deletes = dels.map(_.toDF("vec_id")))
    def row4(r: org.apache.spark.sql.Row): (Long, Int, Long, Double) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))
    def check(label: String): Unit = {
      val centRows = fmtS.read(spark, s"$stateDir/centroids")
        .select("id", "v").orderBy("id").collect()
      val truth = Similarity.annIvfWith(
          corpus.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding",
          centRows.map(_.getLong(0)),
          centRows.map(_.getSeq[Float](1).toArray), k = k, nprobe = nprobe)
        .collect().map(row4).toSeq.sorted
      val got = MergeTable.read(spark, gold)
        .select("vec_id", "rank", "neighbor_id", "cos_sim")
        .collect().map(row4).toSeq.sorted
      assert(got == truth,
        s"$label: gold ${got.mkString("; ")} vs batch ${truth.mkString("; ")}")
    }

    // batch 1: cluster A = {1, 2}, cluster B = {3}, outlier C = {6}
    val b1 = Seq(1L -> Array(1f, 0f, 0f), 2L -> Array(0.95f, 0.05f, 0f),
      3L -> Array(0f, 1f, 0f), 6L -> Array(0f, 0f, 1f))
    corpus ++= b1; fold(b1, 0L); check("after batch 1")

    // batch 2: 4 joins A, 5 joins B — OLD probers of both lists must
    // re-query without being in the batch
    val b2 = Seq(4L -> Array(0.9f, 0.1f, 0f), 5L -> Array(0.05f, 0.95f, 0f))
    corpus ++= b2; fold(b2, 1L); check("after batch 2 (old vectors gain neighbors)")

    // batch 3: vector 2's UPDATE moves it from the A region to B —
    // A's probers lose it, B's probers gain it
    val b3 = Seq(2L -> Array(0f, 0.9f, 0.1f))
    corpus ++= b3; fold(b3, 2L); check("after batch 3 (update moves lists)")

    // CRASH: run batch 4 fully, then roll gold AND the signature
    // ledger back to their pre-batch snapshots — the on-disk
    // aftermath of a consumer that merged members and crashed. The
    // redelivered batch must converge via the stale ledger.
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
    val goldBak = Files.createTempDirectory("graft_ivf_gbak").toString + "/t"
    val sigsBak = Files.createTempDirectory("graft_ivf_sbak").toString + "/t"
    copyDir(gold, goldBak); copyDir(s"$stateDir/sigs", sigsBak)
    val b4 = Seq(7L -> Array(0.98f, 0.02f, 0f))
    corpus ++= b4; fold(b4, 3L)
    deleteDir(gold); copyDir(goldBak, gold)
    deleteDir(s"$stateDir/sigs"); copyDir(sigsBak, s"$stateDir/sigs")
    fold(b4, 4L) // redelivery
    check("after crash-replay of batch 4")

    // hard DELETE: 4 leaves — the A probers must drop it from their
    // top-k and 4's own gold rows must disappear
    corpus -= 4L
    fold(Seq.empty, 5L, dels = Some(Seq(4L)))
    check("after hard delete")
    assert(MergeTable.read(spark, gold).filter(col("vec_id") === 4L)
      .count() == 0, "the deleted vector's gold rows must go")

    // update TO null retracts like a delete
    corpus -= 6L
    Similarity.annIvfIncremental(spark,
      Seq((6L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"),
      "vec_id", "embedding", stateDir, gold, batchOrd = 6L,
      k = k, nlist = nlist, nprobe = nprobe)
    check("after update-to-null retraction")
    assert(MergeTable.read(spark, gold).filter(col("vec_id") === 6L)
      .count() == 0, "the nulled vector's gold rows must go")
  }

  test("append-only IVF ANN fast path: touched-list re-query equals batch and general path") {
    import SparkSpec.spark.implicits._
    import graft.operators.Similarity
    val base = graft.pipeline.SnapshotTableFormat
    val fmtF = new CountingFormat(base)
    val fmtG = new CountingFormat(base)
    val stF = Files.createTempDirectory("graft_ao_ivf_stF").toString
    val goF = Files.createTempDirectory("graft_ao_ivf_goF").toString + "/t"
    val stG = Files.createTempDirectory("graft_ao_ivf_stG").toString
    val goG = Files.createTempDirectory("graft_ao_ivf_goG").toString + "/t"
    val (k, nlist, nprobe) = (3, 3, 2)

    val batches = Seq(
      Seq(1L -> Array(1f, 0f, 0f), 2L -> Array(0.95f, 0.05f, 0f),
        3L -> Array(0f, 1f, 0f), 6L -> Array(0f, 0f, 1f)),
      Seq(4L -> Array(0.9f, 0.1f, 0f)),
      Seq(5L -> Array(0.05f, 0.95f, 0f), 7L -> Array(0.98f, 0.02f, 0f)))
    var corpus = scala.collection.immutable.SortedMap.empty[Long, Array[Float]]
    def row4(r: org.apache.spark.sql.Row): (Long, Int, Long, Double) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))

    batches.zipWithIndex.foreach { case (b, i) =>
      corpus ++= b
      val df = b.toDF("vec_id", "embedding")
      Similarity.annIvfIncremental(spark, df, "vec_id", "embedding",
        stF, goF, batchOrd = i.toLong, k = k, nlist = nlist,
        nprobe = nprobe, appendOnly = true, fmt = fmtF)
      Similarity.annIvfIncremental(spark, df, "vec_id", "embedding",
        stG, goG, batchOrd = i.toLong, k = k, nlist = nlist,
        nprobe = nprobe, fmt = fmtG)
      val centRows = base.read(spark, s"$stF/centroids")
        .select("id", "v").orderBy("id").collect()
      val truth = Similarity.annIvfWith(
          corpus.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding",
          centRows.map(_.getLong(0)),
          centRows.map(_.getSeq[Float](1).toArray), k = k, nprobe = nprobe)
        .collect().map(row4).toSeq.sorted
      def gr(p: String) = MergeTable.read(spark, p)
        .select("vec_id", "rank", "neighbor_id", "cos_sim")
        .collect().map(row4).toSeq.sorted
      assert(gr(goF) == truth, s"batch $i: fast gold must equal batch recompute")
      assert(gr(goF) == gr(goG), s"batch $i: fast gold must equal the general path")
    }
    // the structural saving: the fast path never consults the
    // signature ledger (affected derives from the touched lists)
    assert(fmtF.readsOf(s"$stF/sigs") == 0,
      "the fast path must never read the signature ledger")
    assert(fmtG.readsOf(s"$stG/sigs") > 0,
      "the general path's staleness probe reads the ledger every batch")
    intercept[IllegalArgumentException] {
      Similarity.annIvfIncremental(spark,
        Seq((9L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", stF, goF, batchOrd = 9L, appendOnly = true,
        deletes = Some(Seq(1L).toDF("vec_id")), fmt = fmtF)
    }
  }
}


