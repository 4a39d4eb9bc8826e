package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.operators.Events
import graft.pipeline.MergeTable
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {

  /** Split sf0.001 events into 3 chronological files with strictly
    * increasing mtimes so the file stream replays them in order (and
    * the order-guard makes the result correct even if it didn't).
    */
  private def stageEventFiles(): (String, org.apache.spark.sql.DataFrame) = {
    val src = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val cuts = Seq(
      ("1970-01-01", "2024-01-10"),
      ("2024-01-10", "2024-01-20"),
      ("2024-01-20", "2099-01-01"))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      val part = src.filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp"))
      val tmp = s"$dir/stage$i"
      part.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.filter(_.toString.endsWith(".parquet")).findFirst().get())
      val dest = Paths.get(dir, f"part$i%02d.parquet")
      Files.move(f, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    (dir, src)
  }

  test("streaming curation: quality gates + cross-batch dedup in one stream") {
    import graft.operators.TextAnalysis
    // two chronological document files; the second REPEATS a text from
    // the first under a new id — the stream must dedup it across
    // microbatches (maxFilesPerTrigger=1 forces separate batches)
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").limit(40).collect()
    val firstText = docs.head.getString(1)
    val dir = Files.createTempDirectory("graft_stream_cur").toString
    val sp = spark
    import sp.implicits._
    val half = docs.length / 2
    val fileA = docs.take(half).map(r => (r.getLong(0), r.getString(1)))
    val fileB = docs.drop(half).map(r => (r.getLong(0), r.getString(1))) :+
      (999999L, firstText)
    Seq(fileA, fileB).zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$dir/stage$i"
      rows.toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val f = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.filter(_.toString.endsWith(".parquet")).findFirst().get())
      val dest = Paths.get(dir, f"docs$i%02d.parquet")
      Files.move(f, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // the SAME gate columns corpus_curate uses — plain projections,
    // so they compose into a stream unchanged; dropDuplicates keeps
    // cross-batch state so the replayed text lands exactly once
    val qm = TextAnalysis.qualityMetrics(col("text"), Seq("the", "a")).toMap
    val gated = StreamingIngest.readStream(spark, "parquet",
        s"$dir/*.parquet", schema, Map("maxFilesPerTrigger" -> "1"))
      .filter(qm("n_words") >= 20L && qm("avg_word_len") < 8.0)
      .withColumn("_h", md5(col("text")))
      .dropDuplicates("_h")
      .select("doc_id", "text")
    val out = Files.createTempDirectory("graft_stream_cur_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_cur_ck").toString
    StreamingIngest.appendSink(gated, out, ckpt).awaitTermination(120000)
    val got = spark.read.parquet(out)
    // batch truth: gate, then count distinct surviving texts
    val batch = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").limit(40)
      .filter(qm("n_words") >= 20L && qm("avg_word_len") < 8.0)
    val wantTexts = batch.select("text").distinct().count()
    assert(got.count() == wantTexts,
      s"stream kept ${got.count()} docs, batch truth $wantTexts")
    assert(got.filter(col("text") === firstText).count() <= 1,
      "the cross-batch duplicate must survive at most once")
    assert(got.select("text").distinct().count() == got.count(),
      "no duplicate texts in the curated stream output")
  }

  test("streaming foreachBatch SCD1 merge equals batch latest-per-key") {
    val (dir, src) = stageEventFiles()
    val table = Files.createTempDirectory("graft_stream_tbl").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema, Map("maxFilesPerTrigger" -> "1"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamingIngest.mergeSink(stream, table, ckpt,
      keys = Seq("user_id"), orderBy = "ts", compareExclude = Nil)
    q.awaitTermination(120000)

    val got = MergeTable.read(spark, table)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = Cdc.latestPerKey(src, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc, col("event_type").desc,
        col("value").desc))
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.length == want.length && got.sameElements(want),
      s"stream table ${got.length} rows vs batch ${want.length}")
  }

  test("streaming merge sink routes pruned merges into a partitioned delta-log table") {
    import SparkSpec.spark.implicits._
    val fmt = graft.pipeline.DeltaLogTableFormat
    val dir = Files.createTempDirectory("graft_spr_src").toString
    val table = Files.createTempDirectory("graft_spr_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_spr_ck").toString
    // two extract files: the first seeds three buckets, the second
    // touches ONLY bucket b1 — with maxFilesPerTrigger=1 each becomes
    // its own micro-batch / pruned commit
    Seq((1L, "a", 1, "b0"), (2L, "b", 1, "b1"), (3L, "c", 1, "b2"))
      .toDF("id", "v", "ord", "bucket").coalesce(1)
      .write.parquet(s"$dir/f1.parquet")
    Seq((2L, "b9", 2, "b1"), (4L, "d", 2, "b1"))
      .toDF("id", "v", "ord", "bucket").coalesce(1)
      .write.parquet(s"$dir/f2.parquet")
    val schema = spark.read.parquet(s"$dir/*.parquet").schema
    val stream = StreamingIngest.readStream(spark, "parquet",
      s"$dir/*.parquet", schema, Map("maxFilesPerTrigger" -> "1"))
      .select("id", "v", "ord", "bucket")
    val q = StreamingIngest.mergeSink(stream, table, ckpt,
      keys = Seq("id"), orderBy = "ord", compareExclude = Nil,
      fmt = fmt, partitionBy = Seq("bucket"))
    q.awaitTermination(120000)
    val got = fmt.read(spark, table).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.sameElements(
      Array((1L, "a"), (2L, "b9"), (3L, "c"), (4L, "d"))), got.mkString(","))
    // both micro-batches committed; the second was PRUNED: b0/b2
    // files from the first commit are still the live ones
    assert(fmt.versions(table).size == 2, fmt.versions(table).toString)
    import scala.jdk.CollectionConverters._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def actions(v: Int) = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(table, "_delta_log", f"$v%020d.json"))
      .asScala.filter(_.nonEmpty).map(m.readTree).toSeq
    val added1 = actions(1).filter(_.has("add")).map(n =>
      n.get("add").get("partitionValues").get("bucket").asText()).toSet
    assert(added1 == Set("b1"),
      s"second micro-batch must rewrite only b1: $added1")
    // b0/b2 files from the first commit survive untouched
    val v0Untouched = actions(0).filter(_.has("add")).map(
      _.get("add"))
      .filter(a => a.get("partitionValues").get("bucket").asText() != "b1")
      .map(_.get("path").asText()).toSet
    val removed1 = actions(1).filter(_.has("remove")).map(
      _.get("remove").get("path").asText()).toSet
    assert(v0Untouched.nonEmpty && v0Untouched.intersect(removed1).isEmpty,
      s"untouched partitions' files must stay live: removed $removed1")
  }

  test("streaming merge sink compacts the target every optimizeEvery batches") {
    import SparkSpec.spark.implicits._
    val fmt = graft.pipeline.DeltaLogTableFormat
    val dir = Files.createTempDirectory("graft_sopt_src").toString
    val table = Files.createTempDirectory("graft_sopt_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_sopt_ck").toString
    (1 to 4).foreach { i =>
      (1 to 8).map(j => ((i * 10 + j).toLong, s"v$i-$j", i))
        .toDF("id", "v", "ord").coalesce(1)
        .write.parquet(s"$dir/f$i.parquet")
    }
    val schema = spark.read.parquet(s"$dir/*.parquet").schema
    val stream = StreamingIngest.readStream(spark, "parquet",
      s"$dir/*.parquet", schema, Map("maxFilesPerTrigger" -> "1"))
      .select("id", "v", "ord")
    // AQE coalescing off: each micro-batch merge rewrite lands one
    // file per shuffle task — the multi-file-per-commit layout real
    // cluster parallelism produces, which compaction exists to squash
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevConf = spark.conf.get(coalesceKey)
    val q = try {
      spark.conf.set(coalesceKey, "false")
      val q0 = StreamingIngest.mergeSink(stream, table, ckpt,
        keys = Seq("id"), orderBy = "ord", compareExclude = Nil,
        fmt = fmt, optimizeEvery = 2)
      q0.awaitTermination(120000)
      q0
    } finally spark.conf.set(coalesceKey, prevConf)
    assert(fmt.read(spark, table).count() == 32)
    // OPTIMIZE commits interleave with the merges in the log
    import scala.jdk.CollectionConverters._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val ops = fmt.versions(table).map { v =>
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        table, "_delta_log", f"$v%020d.json")).asScala
        .filter(_.nonEmpty).map(m.readTree)
        .find(_.has("commitInfo")).map(_.get("commitInfo")
          .get("operation").asText()).getOrElse("?")
    }
    assert(ops.count(_ == "OPTIMIZE") >= 1,
      s"periodic compaction must commit: $ops")
    // compaction squashes the multi-task rewrite layout: strictly
    // fewer live files than one-per-shuffle-task
    assert(fmt.read(spark, table).inputFiles.length < 4,
      s"live files: ${fmt.read(spark, table).inputFiles.length}")
    assert(q.lastProgress != null)
  }

  test("streaming merge sink's cadence compaction upgrades to the zorder layout") {
    import SparkSpec.spark.implicits._
    val fmt = graft.pipeline.DeltaLogTableFormat
    val dir = Files.createTempDirectory("graft_szo_src").toString
    val table = Files.createTempDirectory("graft_szo_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_szo_ck").toString
    // two micro-batches over a 10x10 grid
    (1 to 2).foreach { i =>
      (0 until 50).map { j =>
        val n = (i - 1) * 50 + j
        (n.toLong, (n % 10).toLong, (n / 10).toLong, i)
      }.toDF("id", "x", "y", "ord").coalesce(1)
        .write.parquet(s"$dir/f$i.parquet")
    }
    val schema = spark.read.parquet(s"$dir/*.parquet").schema
    val stream = StreamingIngest.readStream(spark, "parquet",
      s"$dir/*.parquet", schema, Map("maxFilesPerTrigger" -> "1"))
      .select("id", "x", "y", "ord")
    val q = StreamingIngest.mergeSink(stream, table, ckpt,
      keys = Seq("id"), orderBy = "ord", compareExclude = Nil,
      fmt = fmt, optimizeEvery = 2, zorderBy = Seq("x", "y"))
    q.awaitTermination(120000)
    assert(fmt.read(spark, table).count() == 100)
    // the cadence commit is an OPTIMIZE (layout-only)
    import scala.jdk.CollectionConverters._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val ops = fmt.versions(table).map { v =>
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        table, "_delta_log", f"$v%020d.json")).asScala
        .filter(_.nonEmpty).map(m.readTree)
        .find(_.has("commitInfo")).map(_.get("commitInfo")
          .get("operation").asText()).getOrElse("?")
    }
    assert(ops.count(_ == "OPTIMIZE") >= 1, s"zorder cadence commit: $ops")
    // layout misconfigurations fail BEFORE the stream starts
    intercept[IllegalArgumentException] {
      StreamingIngest.mergeSink(stream, table, ckpt, Seq("id"), "ord",
        fmt = fmt, clusterBy = Some("x"), zorderBy = Seq("x", "y"))
    }
    intercept[IllegalArgumentException] {
      StreamingIngest.mergeSink(stream, table, ckpt, Seq("id"), "ord",
        zorderBy = Seq("x", "y")) // snapshot format
    }
  }

  test("watermarked streaming dedup drops in-window duplicate keys") {
    val dir = Files.createTempDirectory("graft_dedup_src").toString
    import SparkSpec.spark.implicits._
    // duplicate keys planted across two files, all inside the
    // watermark delay; event_id differentiates copies
    val f1 = Seq((1L, "2024-01-01 00:00:10", "a"), (2L, "2024-01-01 00:00:20", "b"),
      (3L, "2024-01-01 00:00:30", "a")).toDF("event_id", "ts_s", "doc_key")
    val f2 = Seq((4L, "2024-01-01 00:01:00", "b"), (5L, "2024-01-01 00:01:10", "c"))
      .toDF("event_id", "ts_s", "doc_key")
    Seq(f1, f2).zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$dir/stage$i"
      df.select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("doc_key")).coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.filter(_.toString.endsWith(".parquet")).findFirst().get())
      Files.move(f, Paths.get(dir, f"dd$i%02d.parquet"))
    }
    val schema = spark.read.parquet(s"$dir/dd00.parquet").schema
    val out = Files.createTempDirectory("graft_dedup_out").toString
    val ckpt = Files.createTempDirectory("graft_dedup_ck").toString
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      schema, Map("maxFilesPerTrigger" -> "1"))
    val q = StreamingIngest.appendSink(
      StreamingIngest.dedupWithinWatermark(stream, "ts", "10 minutes",
        Seq("doc_key")), out, ckpt)
    q.awaitTermination(120000)
    val keys = spark.read.parquet(out).select("doc_key")
      .collect().map(_.getString(0)).sorted
    assert(keys.sameElements(Array("a", "b", "c")),
      s"expected one row per key, got ${keys.mkString(",")}")
  }

  test("streaming windowed agg equals batch windowed agg") {
    val (dir, src) = stageEventFiles()
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val agg = StreamingIngest.windowedAgg(stream, "ts", "1 hour", "6 hours")
    val name = s"stream_agg_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(name)
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sorted
    val want = Events.windowedAgg(src)
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sorted
    assert(got.sameElements(want), s"${got.length} vs ${want.length} windows")
  }

  test("rate anomaly scores a streaming-maintained hourly count table like batch") {
    // the decomposition contract: a stateful streaming agg maintains
    // the (event_type, hour, n_events) table — hours complete as data
    // arrives, REGARDLESS of micro-batch boundaries — and the window
    // pass scores it without re-reading events. Complete-mode memory
    // sink stands in for the merge-table materialization.
    val (dir, src) = stageEventFiles()
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val counts = Events.hourlyCounts(stream)
    val name = s"stream_anom_${System.nanoTime()}"
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def render(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(r.fieldIndex("event_type")),
        r.getTimestamp(r.fieldIndex("hour")),
        r.getLong(r.fieldIndex("n_events")),
        if (r.isNullAt(r.fieldIndex("rate_ratio"))) "null"
        else r.getDouble(r.fieldIndex("rate_ratio")).toString,
        if (r.isNullAt(r.fieldIndex("is_spike"))) "null"
        else r.getBoolean(r.fieldIndex("is_spike")).toString)).sorted
    val got = render(Events.rateAnomalyFromHourly(spark.table(name),
      trailHours = 3, minTrail = 2, factor = 2))
    val want = render(Events.rateAnomaly(src,
      trailHours = 3, minTrail = 2, factor = 2))
    assert(got.length == want.length && got.sameElements(want),
      s"${got.length} vs ${want.length} hourly rows")
  }

  test("active users score a streaming-maintained (user, day) pair table like batch") {
    // the pair table is a KEYED merge table (keys = (_k, day)), so
    // micro-batch replays and cross-batch repeats of the same
    // (user, day) are plain upsert idempotence — then the scoring
    // pass runs over the table, never the event stream
    val (dir, src) = stageEventFiles()
    val table = Files.createTempDirectory("graft_au_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_au_ck").toString
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select(col("user_id").as("_k"), to_date(col("ts")).as("day"))
      .withColumn("_ord", lit(1))
    val q = StreamingIngest.mergeSink(stream, table, ckpt,
      keys = Seq("_k", "day"), orderBy = "_ord", compareExclude = Nil)
    q.awaitTermination(120000)
    def render(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getDate(r.fieldIndex("day")).toString,
        r.getLong(r.fieldIndex("dau")),
        r.getLong(r.fieldIndex("wau")),
        r.getDouble(r.fieldIndex("stickiness")))).sorted
    val stored = graft.pipeline.MergeTable.read(spark, table)
      .select("_k", "day")
    val got = render(Events.activeUsersFromPairs(stored))
    val want = render(Events.activeUsers(src))
    assert(got.length == want.length && got.sameElements(want),
      s"${got.length} vs ${want.length} days")
  }

  test("vocabulary scores a streaming-maintained (doc, word) pair table like batch") {
    import graft.operators.TextAnalysis
    // wordCountPairs is stateless, so it rides the document stream
    // unchanged; the merge table keyed (doc_id, word) absorbs the
    // second file's REPLAY of a first-file document as an idempotent
    // same-value upsert, and the scoring pass then equals the batch
    // vocabulary over the distinct corpus
    val docsAll = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dir = Files.createTempDirectory("graft_stream_vocab").toString
    val sp = spark
    import sp.implicits._
    val half = docsAll.length / 2
    val fileA = docsAll.take(half)
    val fileB = docsAll.drop(half) :+ docsAll.head // cross-batch replay
    Seq(fileA, fileB).zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$dir/stage$i"
      rows.toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val f = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.filter(_.toString.endsWith(".parquet")).findFirst().get())
      val dest = Paths.get(dir, f"docs$i%02d.parquet")
      Files.move(f, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val table = Files.createTempDirectory("graft_vocab_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_vocab_ck").toString
    val stream = TextAnalysis.wordCountPairs(
      StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
        schema, Map("maxFilesPerTrigger" -> "1")),
      "doc_id", "text")
    val q = StreamingIngest.mergeSink(stream, table, ckpt,
      keys = Seq("doc_id", "word"), orderBy = "n", compareExclude = Nil)
    q.awaitTermination(120000)
    val stored = graft.pipeline.MergeTable.read(spark, table)
      .select("doc_id", "word", "n")
    val got = TextAnalysis.vocabFromPairs(stored, 25).collect().toSeq
    val want = TextAnalysis.vocabTopK(
      docsAll.toSeq.toDF("doc_id", "text"), "text", 25).collect().toSeq
    assert(got == want, s"streamed vocab diverges:\n$got\n$want")
  }

  test("split assignment is stateless: streaming equals batch per row") {
    // trainValTestSplit is a pure projection (no window, no state),
    // so it must run UNCHANGED on a stream and agree with the batch
    // assignment row for row — the property that lets the split ride
    // the ingest stream instead of a separate batch pass
    val (dir, src) = stageEventFiles()
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
    val assigned = graft.operators.Sampling
      .trainValTestSplit(stream, "event_id")
      .select("event_id", "split_bucket", "split")
    val name = s"stream_split_${System.nanoTime()}"
    val q = assigned.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val want = graft.operators.Sampling.trainValTestSplit(src, "event_id")
      .select("event_id", "split_bucket", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got.sameElements(want), s"${got.length} vs ${want.length} rows")
  }

  test("stateful sessionization closes sessions matching the batch operator") {
    import SparkSpec.spark.implicits._
    import graft.streaming.SessionEvent
    val (dir, src) = stageEventFiles()
    val gapSec = 12 * 3600L
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select("user_id", "event_id", "ts", "value").as[SessionEvent]
    val closed = StreamingIngest.sessionizeStateful(stream, gapSec)
    val name = s"stream_sessions_${System.nanoTime()}"
    val q = closed.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(name)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = Events.sessionize(src, gapSec)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "no sessions closed")
    assert(got.subsetOf(batch),
      s"closed sessions must match batch sessions; extras: ${(got -- batch).take(3)}")
    // every non-final session must have closed (only each user's last
    // session may still sit in the state store at end of stream)
    val users = src.select("user_id").distinct().count()
    assert(got.size >= batch.size - users,
      s"${got.size} closed vs ${batch.size} batch sessions for $users users")
  }

  test("stateful streaming funnel reproduces the batch funnel counts") {
    import SparkSpec.spark.implicits._
    import graft.streaming.FunnelEvent
    val (dir, src) = stageEventFiles()
    val steps = Seq("view", "click", "purchase")
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema, Map("maxFilesPerTrigger" -> "1")) // time-ordered batches
      .select("user_id", "event_id", "event_type", "ts").as[FunnelEvent]
    val advanced = StreamingIngest.funnelStateful(stream, steps)
    val name = s"stream_funnel_${System.nanoTime()}"
    val q = advanced.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // a user advances each step at most once, so per-step row counts
    // ARE per-step user counts; the staged files are time-ordered so
    // the greedy fold equals the batch first-touch minima exactly
    val got = spark.table(name).groupBy("step")
      .agg(count(lit(1)).as("n_users"), countDistinct(col("user_id")).as("nd"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(r => r._2 == r._3), s"duplicate advancement: ${got.toSeq}")
    val want = graft.operators.Events.funnel(src, steps)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    val gotMap = got.map(r => (r._1, r._2)).toMap
    assert(gotMap == want.filter(_._2 > 0L),
      s"stream funnel $gotMap vs batch $want")
    // the recorded step TIMES must match the batch minima per user too
    val streamT = spark.table(name)
      .select("user_id", "step", "step_ts")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getTimestamp(2))).toMap
    val batchFirst = src.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    batchFirst.foreach { case (u, t) =>
      assert(streamT((u, 1)) == t, s"user $u step-1 time drifted")
    }
  }

  test("stateful streaming debounce emits exactly the batch leaders across batches") {
    import SparkSpec.spark.implicits._
    import graft.streaming.DebounceEvent
    // gap = 1 day on the sparse synthetic stream (the batch entry's
    // setting); the staged files cut at Jan 10 / Jan 20, so bursts
    // STRADDLE micro-batch boundaries — a follower arriving in the
    // next batch is suppressed only if the (user, type) state
    // carried the previous raw event time over
    val (dir, src) = stageEventFiles()
    val gapSec = 86400L
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema, Map("maxFilesPerTrigger" -> "1")) // time-ordered batches
      .select("user_id", "event_type", "event_id", "ts", "value")
      .as[DebounceEvent]
    val kept = StreamingIngest.debounceStateful(stream, gapSec)
    val name = s"stream_debounce_${System.nanoTime()}"
    val q = kept.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(name)
      .select("user_id", "event_type", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = Events.debounce(src, gapSec)
      .select("user_id", "event_type", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want,
      s"stream leaders ${got.size} vs batch ${want.size}; " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // and the suppression is real: fewer leaders than raw events
    assert(got.size < src.count(), "debounce suppressed nothing")
  }

  test("streaming merge sink gates violating micro-batches on DQ") {
    val (dir, src) = stageEventFiles()
    val table = Files.createTempDirectory("graft_sdq_tbl").toString
    val ckpt = Files.createTempDirectory("graft_sdq_ckpt").toString
    val dqOut = Files.createTempDirectory("graft_sdq_out").toString + "/dq"
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema, Map("maxFilesPerTrigger" -> "1"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    // rule violated by every batch -> nothing may merge, results logged
    val q = StreamingIngest.mergeSink(stream, table, ckpt,
      keys = Seq("user_id"), orderBy = "ts", compareExclude = Nil,
      dqRules = Seq(graft.dq.InRange("value", 0, 0.001)),
      dqResultsPath = Some(dqOut))
    q.awaitTermination(120000)
    assert(!MergeTable.exists(table), "violating batches must not merge")
    val dq = spark.read.parquet(dqOut)
    assert(dq.count() == 3, "one DQ row per micro-batch")
    assert(dq.filter(col("passed")).count() == 0)
  }

  test("streaming sliding agg equals batch sliding agg") {
    val (dir, src) = stageEventFiles()
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val agg = StreamingIngest.slidingAgg(stream, "ts", "1 hour", "6 hours", "3 hours")
    val name = s"stream_sliding_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(name)
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sorted
    val want = Events.slidingAgg(src)
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sorted
    assert(got.sameElements(want), s"${got.length} vs ${want.length} windows")
  }

  test("streaming append sink lands every row exactly once") {
    val (dir, src) = stageEventFiles()
    val out = Files.createTempDirectory("graft_append_out").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_append_ckpt").toString
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema, Map("maxFilesPerTrigger" -> "1"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    StreamingIngest.appendSink(stream, out, ckpt).awaitTermination(120000)
    val got = spark.read.parquet(out)
    assert(got.count() == src.count(), "append sink must land all rows")
    // restart with the same checkpoint: nothing new, no duplicates
    val stream2 = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select("event_id", "ts", "user_id", "event_type", "value")
    StreamingIngest.appendSink(stream2, out, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(out).count() == src.count(),
      "checkpoint restart must not re-append")
  }

  test("inferred-schema streaming read matches the batch schema") {
    val (dir, src) = stageEventFiles()
    val stream = StreamingIngest.readStreamInferred(spark, "parquet", dir)
    val business = stream.schema.fields.map(f => f.name -> f.dataType).toMap
    src.schema.fields.foreach { f =>
      assert(business.get(f.name).contains(f.dataType),
        s"inferred stream schema missing/mismatched ${f.name}")
    }
    assert(stream.isStreaming)
  }

  test("stream-stream interval join equals the batch range join") {
    val (dir, src) = stageEventFiles()
    val purchases = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .filter(col("event_type") === "purchase")
    val clicks = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .filter(col("event_type") === "click")
    val joined = StreamingIngest.intervalJoin(purchases, clicks,
      "user_id", "ts", "ts", delay = "1 hour", lookback = "2 hours")
      .select(col("l_event_id"), col("r_event_id"))
    val name = s"stream_ssj_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val p = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"))
    val c = src.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid"))
    val want = p.join(c, p("user_id") === c("user_id") &&
        col("cts") >= col("pts") - expr("INTERVAL 2 hours") &&
        col("cts") <= col("pts"))
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(want.nonEmpty, "batch range join found no pairs — test data too sparse")
    assert(got.sameElements(want), s"${got.length} vs ${want.length} joined pairs")
  }

  test("interval join evicts state: rows plateau under an advancing watermark") {
    // 6 chronological files -> 6 micro-batches (maxFilesPerTrigger=1).
    // Each file spans days while the join keeps a ~3h time bound, so
    // the watermark advancing batch-over-batch must EVICT nearly all
    // prior state — the two-sided time bound is what makes this the
    // only stream-stream join shape whose state doesn't grow forever.
    val src = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_ssj_evict").toString
    val n = 6
    val chunks = src.withColumn("_b",
      ntile(n).over(org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to n).foreach { i =>
      val tmp = s"$dir/stage$i"
      chunks.filter(col("_b") === i).drop("_b")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.filter(_.toString.endsWith(".parquet")).findFirst().get())
      val dest = Paths.get(dir, f"part$i%02d.parquet")
      Files.move(f, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    def side(tpe: String) = StreamingIngest.readStream(spark, "parquet",
      s"$dir/*.parquet", src.schema,
      options = Map("maxFilesPerTrigger" -> "1"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .filter(col("event_type") === tpe)
    val joined = StreamingIngest.intervalJoin(side("purchase"), side("click"),
      "user_id", "ts", "ts", delay = "1 hour", lookback = "2 hours")
      .select(col("l_event_id"), col("r_event_id"))
    val name = s"stream_ssj_evict_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val progs = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(progs.length >= n - 1, s"expected ~$n state batches, saw ${progs.length}")
    val stateTotals = progs.map(_.stateOperators.map(_.numRowsTotal).sum)
    val removed = progs.map(_.stateOperators.map(_.numRowsRemoved).sum).sum
    val fedRows = progs.map(_.numInputRows).sum
    assert(removed > 0, "watermark advance must remove state rows")
    // plateau, not growth: the final batch's state retains only the
    // tail time-window, a fraction of everything fed through
    assert(stateTotals.last * 2 < fedRows,
      s"state accumulated the stream: ${stateTotals.mkString(",")} vs $fedRows fed")
    // and the audit surface exposes the eviction counters
    val rec = graft.pipeline.Audit.streamingRunRecord(spark, "ssj_evict", q)
      .filter(col("state_rows_removed") > 0)
    assert(rec.count() > 0, "run record must surface state eviction")
  }

  test("streaming medallion: bronze append then silver merge, chained") {
    // the reference's main operating mode end-to-end: files stream
    // into a bronze landing (append, availableNow), bronze streams
    // into a silver SCD1 merge — each layer checkpointed and
    // restartable independently
    val (dir, src) = stageEventFiles()
    val bronze = Files.createTempDirectory("graft_med_bronze").toString
    val silver = Files.createTempDirectory("graft_med_silver").toString
    val ck1 = Files.createTempDirectory("graft_med_ck1").toString
    val ck2 = Files.createTempDirectory("graft_med_ck2").toString

    val toBronze = StreamingIngest.readStream(spark, "parquet",
      s"$dir/*.parquet", src.schema, Map("maxFilesPerTrigger" -> "1"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    StreamingIngest.appendSink(toBronze, bronze, ck1).awaitTermination(120000)

    val toSilver = StreamingIngest.readStream(spark, "parquet",
      s"$bronze/*.parquet", src.schema, Map("maxFilesPerTrigger" -> "1"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    StreamingIngest.mergeSink(toSilver, silver, ck2,
      keys = Seq("user_id"), orderBy = "ts", compareExclude = Nil)
      .awaitTermination(120000)

    val got = MergeTable.read(spark, silver)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = Cdc.latestPerKey(src, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc, col("event_type").desc,
        col("value").desc))
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.length == want.length && got.sameElements(want),
      s"silver ${got.length} rows vs batch ${want.length}")
  }

  test("medallion gold hop: incremental MergeTable stream equals batch recompute") {
    import graft.streaming.MergeTableStream
    val (dir, src) = stageEventFiles()
    val silver = Files.createTempDirectory("graft_gold_silver").toString
    val gold = Files.createTempDirectory("graft_gold_gold").toString
    val ck1 = Files.createTempDirectory("graft_gold_ck1").toString
    val ck2 = Files.createTempDirectory("graft_gold_ck2").toString

    val toSilver = StreamingIngest.readStream(spark, "parquet",
      s"$dir/*.parquet", src.schema, Map("maxFilesPerTrigger" -> "1"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    StreamingIngest.mergeSink(toSilver, silver, ck1,
      keys = Seq("user_id"), orderBy = "ts", compareExclude = Nil)
      .awaitTermination(120000)
    val silverVersions = MergeTable.versions(silver)
    assert(silverVersions.size >= 2, "need multiple silver versions to stream")

    def foldGold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck2) { (chg, _) =>
        MergeTable.scd1Merge(spark, gold, chg, Seq("user_id"), "ts",
          compareExclude = Nil)
        ()
      }
    val processed = foldGold()
    assert(processed == silverVersions, s"must process every version: $processed")
    // caught up: a second pass is a no-op
    assert(foldGold().isEmpty, "caught-up consumer must process nothing")

    def table(path: String) = MergeTable.read(spark, path)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(table(gold).sameElements(table(silver)),
      "gold must equal the batch recompute (silver current)")

    // one more producer merge streams through as exactly one version,
    // and its change feed is exactly the merged delta — one row, not
    // the whole snapshot (unchanged copy-on-write rows cancel in the
    // version diff)
    import SparkSpec.spark.implicits._
    val extra = Seq((999999L, java.sql.Timestamp.valueOf("2099-01-01 00:00:00"),
      42424242L, "click", 1.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    MergeTable.scd1Merge(spark, silver, extra, Seq("user_id"), "ts",
      compareExclude = Nil)
    val newHead = MergeTable.versions(silver).last
    assert(MergeTableStream.changes(spark, silver,
      Some(silverVersions.last), newHead).count() == 1,
      "a one-row merge must stream as a one-row delta")
    val tail = foldGold()
    assert(tail.size == 1, s"one new version expected: $tail")
    assert(table(gold).sameElements(table(silver)),
      "gold must follow silver after the extra merge")
  }

  test("gold hop streams from a delta-log table through the same offset log") {
    import SparkSpec.spark.implicits._
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_dlt_silver").toString
    val gold = Files.createTempDirectory("graft_dlt_gold").toString
    val ck = Files.createTempDirectory("graft_dlt_ck").toString
    // seed with AQE coalescing off so the silver table lands as
    // multiple small files (the layout real cluster parallelism
    // produces) — gives the OPTIMIZE step below something to compact
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevConf = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      fmt.scd1Merge(spark, silver,
        Seq((1L, "a", 1), (2L, "b", 1)).toDF("id", "v", "ord"),
        Seq("id"), "ord")
      fmt.scd1Merge(spark, silver,
        Seq((2L, "b9", 2), (3L, "c", 2)).toDF("id", "v", "ord"),
        Seq("id"), "ord")
    } finally spark.conf.set(coalesceKey, prevConf)
    val processed = MergeTableStream.processAvailable(spark, silver, ck, fmt) {
      (df, _) => MergeTable.scd1Merge(spark, gold, df, Seq("id"), "ord"); ()
    }
    assert(processed == Seq(0, 1), s"delta-log offsets: $processed")
    val got = MergeTable.read(spark, gold).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.sameElements(Array((1L, "a"), (2L, "b9"), (3L, "c"))),
      got.mkString(","))
    // caught up: a second call processes nothing
    assert(MergeTableStream.processAvailable(spark, silver, ck, fmt)(
      (_, _) => fail("no new versions to process")).isEmpty)
    // an OPTIMIZE commit compacts files without changing rows: the
    // consumer advances its offset past it WITHOUT a diff scan —
    // dataChange=false tells it rows are identical by construction
    val opt = fmt.optimize(spark, silver).get
    val optBatches = scala.collection.mutable.Buffer.empty[(Int, Long)]
    val processedOpt =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (df, v) =>
        optBatches += ((v, df.count())); ()
      }
    assert(processedOpt == Seq(opt.version),
      s"optimize commit must advance the offset: $processedOpt")
    assert(optBatches.isEmpty,
      s"layout-only commit must not be scanned or delivered: $optBatches")
    assert(MergeTableStream.lastProcessed(ck).contains(opt.version))
    assert(MergeTable.read(spark, gold).count() == 3, "gold untouched")
    // vacuumed-past consumer: drop old versions' files, new consumer
    // falls back to full-snapshot re-delivery (idempotent downstream)
    fmt.scd1Merge(spark, silver,
      Seq((4L, "d", 3)).toDF("id", "v", "ord"), Seq("id"), "ord")
    fmt.vacuum(silver, keepVersions = 1)
    val ck2 = Files.createTempDirectory("graft_dlt_ck2").toString
    val counts = scala.collection.mutable.Buffer.empty[(Int, Long)]
    MergeTableStream.processAvailable(spark, silver, ck2, fmt) { (df, v) =>
      counts += ((v, df.count())); ()
    }
    // v0..v2 are vacuumed (still in the log, files gone): the fresh
    // consumer must skip them and re-enter at the head version with
    // the FULL current state
    assert(counts.toSeq == Seq((3, 4L)),
      s"head version must re-deliver the full snapshot: $counts")
  }

  test("pruned-merge gold hop reads only the touched partition's bytes") {
    import SparkSpec.spark.implicits._
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_feed_silver").toString
    val ck = Files.createTempDirectory("graft_feed_ck").toString
    // 8 partitions with enough padded bytes each that scan sizes are
    // measurably different between one partition and the whole table
    val pad = "x" * 200
    val base = (for (b <- 0 until 8; i <- 0 until 500)
      yield (s"$b-$i", s"v$i-$pad", 1, s"b$b")).toDF("id", "v", "ord", "bucket")
    fmt.scd1MergePruned(spark, silver, base, Seq("id"), "ord", "bucket")
    MergeTableStream.processAvailable(spark, silver, ck, fmt)((_, _) => ())
    // one-partition pruned merge: 3 changed rows inside bucket b3
    val upd = Seq(("3-1", s"w1-$pad", 2, "b3"), ("3-2", s"w2-$pad", 2, "b3"),
      ("3-3", s"w3-$pad", 2, "b3")).toDF("id", "v", "ord", "bucket")
    fmt.scd1MergePruned(spark, silver, upd, Seq("id"), "ord", "bucket")
    def bytesReadDuring[T](body: => T): (T, Long) = {
      val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) bytes.addAndGet(m.inputMetrics.bytesRead); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val out = body
        // listener events are async — poll until the sum stabilizes
        var prev = -1L; var cur = bytes.get(); var spins = 0
        while (cur != prev && spins < 50) {
          Thread.sleep(100); prev = cur; cur = bytes.get(); spins += 1
        }
        (out, cur)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val batches = scala.collection.mutable.Buffer.empty[Array[(String, String)]]
    val (_, feedBytes) = bytesReadDuring {
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (df, _) =>
        batches += df.select("id", "v").collect()
          .map(r => (r.getString(0), r.getString(1))); ()
      }
    }
    // output identical to the full-snapshot diff path
    assert(batches.map(_.toSeq.sorted) == Seq(Seq(
      ("3-1", s"w1-$pad"), ("3-2", s"w2-$pad"), ("3-3", s"w3-$pad"))),
      s"change rows wrong: ${batches.map(_.take(5).mkString(","))}")
    val (_, fullBytes) = bytesReadDuring {
      fmt.read(spark, silver).queryExecution.toRdd.count()
    }
    // the feed read the rewritten partition's new+old files (2/8-ish
    // of the table), nowhere near the two full snapshots the generic
    // diff costs
    assert(feedBytes > 0 && fullBytes > 0)
    assert(feedBytes < fullBytes,
      s"file-level feed must read less than one full scan: " +
        s"feed=$feedBytes full=$fullBytes")
  }

  test("file-level feed handles in-window schema evolution") {
    import SparkSpec.spark.implicits._
    import graft.streaming.MergeTableStream
    val fmt = graft.pipeline.DeltaLogTableFormat
    val p = Files.createTempDirectory("graft_feed_evo").toString
    val ck = Files.createTempDirectory("graft_feed_evo_ck").toString
    fmt.scd1Merge(spark, p,
      Seq((1L, "a", 1), (2L, "b", 1)).toDF("id", "v", "ord"),
      Seq("id"), "ord")
    MergeTableStream.processAvailable(spark, p, ck, fmt)((_, _) => ())
    // additive evolution inside the next window: updates carry a new
    // column; the removed (pre-evolution) files lack it and must
    // null-fill under the to-schema, exactly like the full diff
    fmt.scd1Merge(spark, p,
      Seq((2L, "b9", 2, "x2"), (3L, "c", 2, "x3"))
        .toDF("id", "v", "ord", "extra"),
      Seq("id"), "ord")
    val batches = scala.collection.mutable.Buffer.empty[Set[(Long, String, Any)]]
    MergeTableStream.processAvailable(spark, p, ck, fmt) { (df, _) =>
      assert(df.columns.contains("extra"), df.columns.mkString(","))
      batches += df.select("id", "v", "extra").collect()
        .map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet; ()
    }
    // row 1 is unchanged: evolved storage null-fills its new column
    // and the pre-evolution removed file null-fills under the
    // to-schema read, so the pair cancels — same contract as the
    // full-snapshot diff's aligned() null-fill. No spurious
    // re-delivery from evolution alone.
    assert(batches.size == 1)
    assert(batches.head == Set((2L, "b9", "x2"), (3L, "c", "x3")),
      batches.head.toString)
  }

  test("deletedKeys reports hard deletes, file-accounted on delta-log") {
    import SparkSpec.spark.implicits._
    import graft.streaming.MergeTableStream
    def run(fmt: graft.pipeline.TableFormat): Unit = {
      val p = Files.createTempDirectory("graft_delkeys").toString
      fmt.scd1Merge(spark, p,
        Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("id", "v", "ord"),
        Seq("id"), "ord")
      // full extract drops key 2, updates key 3
      fmt.scd1Merge(spark, p,
        Seq((1L, "a", 2), (3L, "c9", 2)).toDF("id", "v", "ord"),
        Seq("id"), "ord", deleteMissing = true)
      val del = MergeTableStream.deletedKeys(spark, p, 0, 1, Seq("id"), fmt)
        .collect().map(_.getLong(0)).sorted
      assert(del.sameElements(Array(2L)), s"$fmt: ${del.mkString(",")}")
      // no deletes between identical states
      fmt.scd1Merge(spark, p,
        Seq((4L, "d", 3)).toDF("id", "v", "ord"), Seq("id"), "ord")
      val none = MergeTableStream.deletedKeys(spark, p, 1, 2, Seq("id"), fmt)
      assert(none.count() == 0, s"$fmt: insert-only window has no deletes")
    }
    run(graft.pipeline.SnapshotTableFormat)
    run(graft.pipeline.DeltaLogTableFormat)
    // pruned-merge table: the file-accounted path must agree with the
    // generic full-version diff on a window with no deletes at all
    val fmt = graft.pipeline.DeltaLogTableFormat
    val p = Files.createTempDirectory("graft_delkeys_pr").toString
    val base = (for (b <- 0 until 4; i <- 0 until 20)
      yield (s"$b-$i", s"v$i", 1, s"b$b")).toDF("id", "v", "ord", "bucket")
    fmt.scd1MergePruned(spark, p, base, Seq("id"), "ord", "bucket")
    fmt.scd1MergePruned(spark, p,
      Seq(("2-1", "w", 2, "b2")).toDF("id", "v", "ord", "bucket"),
      Seq("id"), "ord", "bucket")
    val fileSide = MergeTableStream
      .deletedKeys(spark, p, 0, 1, Seq("id"), fmt)
      .collect().map(_.getString(0)).sorted
    val fullSide = fmt.readVersion(spark, p, 0).select("id").distinct()
      .join(fmt.readVersion(spark, p, 1).select("id").distinct(),
        Seq("id"), "left_anti")
      .collect().map(_.getString(0)).sorted
    assert(fileSide.sameElements(fullSide),
      s"file-accounted ${fileSide.length} vs full ${fullSide.length}")
    assert(fileSide.isEmpty, "pruned upsert window deletes nothing")
  }

  test("change feed degrades to a full snapshot for map-typed tables") {
    import SparkSpec.spark.implicits._
    import graft.streaming.MergeTableStream
    val path = Files.createTempDirectory("graft_map_silver").toString
    // maps are carried but cannot be compared (Spark rejects map
    // equality), so they ride outside the change-compare set
    def up(rows: Seq[(Long, Map[String, String], Int)]) =
      MergeTable.scd1Merge(spark, path, rows.toDF("id", "props", "ord"),
        Seq("id"), "ord", compareExclude = Seq("props"))
    up(Seq((1L, Map("a" -> "1"), 1), (2L, Map("b" -> "2"), 1))) // v0
    up(Seq((2L, Map("b" -> "3"), 2)))                           // v1
    // Spark set ops reject map columns, and diffing around the map
    // would silently miss map-only changes: the feed must re-deliver
    // the full v1 snapshot instead of throwing
    val chg = MergeTableStream.changes(spark, path, Some(0), 1)
    assert(chg.count() == 2,
      "map-typed table must fall back to full-snapshot delivery")
    assert(chg.filter(col("id") === 2L).select("ord").as[Int].head() == 2)
  }

  test("corrupt commit JSON degrades the file-level feeds instead of crashing") {
    import SparkSpec.spark.implicits._
    val fmt = graft.pipeline.DeltaLogTableFormat
    val p = Files.createTempDirectory("graft_corrupt_log").toString
    def up(rows: Seq[(Long, String, Int)]) =
      fmt.scd1Merge(spark, p, rows.toDF("id", "v", "ord"), Seq("id"), "ord")
    up(Seq((1L, "a", 1), (2L, "b", 1))) // v0
    up(Seq((2L, "b2", 2)))              // v1
    up(Seq((3L, "c", 3)))               // v2
    // sanity: intact log answers the window from file accounting
    assert(fmt.fileChanges(spark, p, 0, 2).isDefined)
    // torn write: v1's commit JSON is garbage. The window accounting
    // through it is unknown — the feed helpers must surface None (the
    // callers' degrade path), not propagate a parse exception: the
    // processNew route never sees this (readableVersions filters
    // first) but direct changes()/deletedKeys() callers do.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(p, "_delta_log", f"${1}%020d.json"),
      "{this is not json".getBytes)
    assert(fmt.fileChanges(spark, p, 0, 2).isEmpty,
      "unknown accounting must be None, not a crash")
    assert(fmt.fileDeletedKeys(spark, p, 0, 2, Seq("id")).isEmpty)
    // caller-level semantics: with the corrupt commit poisoning state
    // reconstruction (no covering checkpoint), changes() has no
    // correct answer — it must fail with the CANONICAL error naming
    // the version, not a Jackson parse stack from the fast-path probe
    val err = intercept[Exception] {
      graft.streaming.MergeTableStream
        .changes(spark, p, Some(0), 2, fmt).collect()
    }
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(5).toSeq
    assert(chain(err).exists(t => Option(t.getMessage)
        .exists(_.contains("corrupt commit JSON"))),
      s"expected the canonical corrupt-commit error, got: $err")
    // ...but a checkpoint COVERING the corrupt commit keeps the table
    // fully readable: state replay skips the torn JSON entirely
    val p2 = Files.createTempDirectory("graft_corrupt_ckpt").toString
    def up2(id: Long, ord: Int) =
      fmt.scd1Merge(spark, p2, Seq((id, s"v$id", ord))
        .toDF("id", "v", "ord"), Seq("id"), "ord")
    (0 to 10).foreach(i => up2(i + 1L, i + 1)) // v0..v10, ckpt at v10
    java.nio.file.Files.write(
      java.nio.file.Paths.get(p2, "_delta_log", f"${0}%020d.json"),
      "{torn".getBytes)
    assert(fmt.lastCheckpoint(p2).exists(_ >= 10),
      "test setup: a checkpoint must cover the corrupt commit")
    val got = graft.streaming.MergeTableStream
      .changes(spark, p2, Some(9), 10, fmt)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(11L),
      s"checkpoint-covered corrupt commit must stay readable: $got")
  }

  test("mergeSink rejects snapshot-format multi-column partitionBy eagerly") {
    import SparkSpec.spark.implicits._
    val dir = Files.createTempDirectory("graft_eager_src").toString
    Seq((1L, "a", 1, "b0", "c0")).toDF("id", "v", "ord", "p1", "p2")
      .write.parquet(s"$dir/f1.parquet")
    val schema = spark.read.parquet(s"$dir/*.parquet").schema
    val stream = StreamingIngest.readStream(spark, "parquet",
      s"$dir/*.parquet", schema)
    val table = Files.createTempDirectory("graft_eager_tbl").toString
    val ckpt = Files.createTempDirectory("graft_eager_ck").toString
    // misconfiguration must fail at CONSTRUCTION, before start():
    // the same require inside foreachBatch would only fire on the
    // first non-empty micro-batch of an already-running stream
    val err = intercept[IllegalArgumentException] {
      StreamingIngest.mergeSink(stream, table, ckpt,
        keys = Seq("id"), orderBy = "ord", compareExclude = Nil,
        fmt = graft.pipeline.SnapshotTableFormat,
        partitionBy = Seq("p1", "p2"))
    }
    assert(err.getMessage.contains("delta-log"),
      s"error must name the fix: ${err.getMessage}")
    // the delta-log format accepts the same spec (no throw at build;
    // stop immediately — behavior is covered by the pruned-sink spec)
    val q = StreamingIngest.mergeSink(stream, table, ckpt,
      keys = Seq("id"), orderBy = "ord", compareExclude = Nil,
      fmt = graft.pipeline.DeltaLogTableFormat,
      partitionBy = Seq("p1", "p2"))
    q.awaitTermination(120000)
    assert(graft.pipeline.DeltaLogTableFormat.read(spark, table).count() == 1)
  }

  test("vacuumed-past consumer falls back to a full-snapshot re-delivery") {
    import SparkSpec.spark.implicits._
    import graft.streaming.MergeTableStream
    val silver = Files.createTempDirectory("graft_vac_silver").toString
    val gold = Files.createTempDirectory("graft_vac_gold").toString
    val ck = Files.createTempDirectory("graft_vac_ck").toString
    def up(rows: Seq[(Long, String, Int)]) =
      MergeTable.scd1Merge(spark, silver, rows.toDF("id", "v", "ord"),
        Seq("id"), "ord", compareExclude = Nil)
    def foldGold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck) { (chg, _) =>
        MergeTable.scd1Merge(spark, gold, chg, Seq("id"), "ord",
          compareExclude = Nil)
        ()
      }
    up(Seq((1L, "a", 1), (2L, "b", 1)))   // v0
    assert(foldGold() == Seq(0))          // consumer at v0
    up(Seq((2L, "b2", 2)))                // v1
    up(Seq((3L, "c", 3)))                 // v2
    // producer vacuums past the consumer's offset: v0 (the from-side
    // of the next diff) is gone
    assert(MergeTable.vacuum(silver, keepVersions = 1) == Seq(0, 1))
    val processed = foldGold()
    // v1 is gone from disk: the consumer drains straight to the head
    assert(processed == Seq(2), s"must still drain the log: $processed")
    // the diff had no surviving from-snapshot -> full re-delivery,
    // absorbed by the idempotent downstream merge: gold == silver
    def table(path: String) = MergeTable.read(spark, path)
      .select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(table(gold).sameElements(table(silver)), "gold must equal silver")
  }

  test("streaming run record surfaces state-store metrics") {
    val (dir, src) = stageEventFiles()
    val stream = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      src.schema)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val agg = StreamingIngest.windowedAgg(stream, "ts", "1 hour", "6 hours")
    val name = s"stream_metrics_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rec = graft.pipeline.Audit.streamingRunRecord(spark, "agg_job", q)
    val rows = rec.collect()
    assert(rows.nonEmpty, "run record must exist")
    val stateRows = rec.filter(col("operator_name").isNotNull &&
      col("state_rows_total") > 0).collect()
    assert(stateRows.nonEmpty,
      s"watermarked agg must report state metrics: ${rows.mkString("; ")}")
    assert(rec.columns.contains("progress_json"))
    assert(rows.forall(_.getAs[String]("job_name") == "agg_job"))
  }

  test("streaming gold hop runs the CURATION composition: change feed -> gates -> dedup -> gold merge") {
    // the end-to-end pipeline shape the silver→gold delta source
    // implies: a delta-log silver documents table accretes over three
    // producer merges (including a dedup-relevant later-id duplicate
    // and an in-place text update), a change-feed consumer pushes
    // each batch through THE SAME curation gates Curation.curate
    // compiles, dedups incrementally against the accumulating gold,
    // and merges survivors — and the resulting gold must equal
    // Curation.curate's batch recompute of silver-current, rollup for
    // rollup.
    import SparkSpec.spark.implicits._
    import graft.operators.{Curation, TextAnalysis}
    import graft.streaming.MergeTableStream
    import org.apache.spark.sql.expressions.Window
    val fmt = graft.pipeline.DeltaLogTableFormat
    val silver = Files.createTempDirectory("graft_cur_silver").toString
    val gold = Files.createTempDirectory("graft_cur_gold").toString
    val ck = Files.createTempDirectory("graft_cur_ck").toString

    def goodText(i: Int): String =
      (0 until 24).map(j => s"w${i}x$j").mkString(" ")
    def doc(id: Long, lang: String, text: String, ord: Int) =
      (id, lang, text, ord)
    // batch 1: ten good docs + one that fails the word-count gate
    val b1 = (1 to 10).map(i => doc(i, if (i % 2 == 0) "en" else "de",
      goodText(i), 0)) :+ doc(11, "en", "tiny doc here", 0)
    // batch 2: new docs, a LATER-ID duplicate of doc 1's text (the
    // realistic re-crawl case — first arrival wins, which is also
    // min-id), and an in-place UPDATE of doc 2's text
    val b2 = (21 to 25).map(i => doc(i, "en", goodText(i), 1)) ++ Seq(
      doc(999, "de", goodText(1), 1),
      doc(2, "en", goodText(202), 1))
    // batch 3: more docs + a duplicate of a batch-2 text
    val b3 = (31 to 33).map(i => doc(i, "de", goodText(i), 2)) :+
      doc(998, "en", goodText(21), 2)
    // batch 4: a GATE FLIP — doc 31's update no longer passes the
    // quality gates, so the consumer must DELETE it from gold
    val b4 = Seq(doc(31, "de", "now too short", 3))
    Seq(b1, b2, b3, b4).foreach { rows =>
      fmt.scd1Merge(spark, silver,
        rows.toDF("doc_id", "lang", "text", "ord"),
        Seq("doc_id"), "ord", compareExclude = Nil)
    }

    // the consumer's gate predicate is built from the SAME column
    // builders (and defaults) Curation.curate compiles, so gate
    // decisions are bit-identical to the batch recompute
    val qm = TextAnalysis.qualityMetrics(col("text"), Seq("the", "a")).toMap
    val rm = TextAnalysis.repetitionMetrics(col("text")).toMap
    val gatePass = qm("n_words") >= 20L && qm("avg_word_len") < 8.0 &&
      rm("distinct_word_ratio") > 0.2 && rm("top_word_fraction") < 0.2

    def foldGold(): Seq[Int] =
      MergeTableStream.processAvailable(spark, silver, ck, fmt) { (chg, _) =>
        // in-batch exact dedup keep-min-id (curate's window), then
        // the cross-batch gate: a text hash already in gold under a
        // DIFFERENT doc survives only there (first arrival wins); the
        // same doc's own update passes through as an upsert
        val inBatch = chg.filter(gatePass)
          .withColumn("_h", md5(col("text")))
          .withColumn("_rn", row_number().over(
            Window.partitionBy(col("_h")).orderBy(col("doc_id").asc)))
          .filter(col("_rn") === 1).drop("_rn")
        val survivors =
          if (MergeTable.exists(gold)) {
            val goldHashes = MergeTable.read(spark, gold)
              .select(md5(col("text")).as("_h"), col("doc_id").as("_gid"))
            inBatch.join(goldHashes, Seq("_h"), "left_outer")
              .filter(col("_gid").isNull || col("_gid") === col("doc_id"))
              .drop("_gid")
          } else inBatch
        MergeTable.scd1Merge(spark, gold, survivors.drop("_h"),
          Seq("doc_id"), "ord", compareExclude = Nil)
        // gate flips: a changed row that now FAILS the gates must
        // leave gold (deleting a key gold never held is a no-op)
        val flipped = chg.filter(!gatePass).select("doc_id")
        if (MergeTable.exists(gold))
          MergeTable.deleteKeys(spark, gold, flipped, Seq("doc_id"))
        ()
      }
    val processed = foldGold()
    assert(processed.size >= 3, s"need >=3 micro-batches, got $processed")
    assert(foldGold().isEmpty, "caught-up consumer must re-process nothing")

    // document-level truth: gates + keep-min-id dedup over
    // silver-current (ids are assigned in arrival order, so min-id
    // and first-arrival coincide — the test's contract)
    val truth = fmt.read(spark, silver).filter(gatePass)
      .withColumn("_h", md5(col("text")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_h")).orderBy(col("doc_id").asc)))
      .filter(col("_rn") === 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val goldIds = MergeTable.read(spark, gold)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(goldIds.sameElements(truth),
      s"gold ${goldIds.mkString(",")} vs batch truth ${truth.mkString(",")}")
    assert(!goldIds.contains(999L) && !goldIds.contains(998L),
      "later-id duplicates must be curated out")
    assert(goldIds.contains(2L), "the updated doc must survive as itself")
    assert(!goldIds.contains(31L),
      "a gate-flipped doc must be DELETED from gold")

    // rollup-level truth: Curation.curate itself (no benchmark rows)
    // over silver-current must equal the same accounting computed
    // from the streamed gold — the composition IS the batch operator
    val want = Curation.curate(fmt.read(spark, silver), "doc_id", "text",
        benchFilter = lit(false), groupCols = Seq("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    val est = TextAnalysis.tokenMetrics(col("text")).toMap.apply("est_bpe_tokens")
    val got = MergeTable.read(spark, gold)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum(est).as("n_tokens"), min(col("doc_id")).as("first_doc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.sameElements(want),
      s"gold rollup ${got.mkString(";")} vs curate ${want.mkString(";")}")
  }

  test("streaming merge additive schema evolution: a later micro-batch widens the table") {
    // the restart-with-evolved-source shape: a stream lands schema A
    // into the table, stops; later files carry a NEW column; the
    // resumed stream (same checkpoint, evolved schema) must flow the
    // new micro-batch through mergeSink and WIDEN the table —
    // historical rows read null, new rows carry the value, nothing
    // fails. (Batch-merge evolution is proven in MergeSpec; this
    // pins the streaming writer path the reference's mergeSchema
    // option covers.)
    import SparkSpec.spark.implicits._
    val dir = Files.createTempDirectory("graft_sevo_src").toString
    val table = Files.createTempDirectory("graft_sevo_tbl").toString
    val ck = Files.createTempDirectory("graft_sevo_ck").toString

    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = s"$dir/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.filter(_.toString.endsWith(".parquet")).findFirst().get())
      val dest = Paths.get(dir, s"$name.parquet")
      Files.move(f, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(mtime))
    }
    stage("a", Seq((1L, "v1", 10), (2L, "w1", 10)).toDF("id", "v", "ord"),
      1700000000000L)
    val schemaA = spark.read.parquet(s"$dir/a.parquet").schema
    val runA = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      schemaA).select("id", "v", "ord")
    StreamingIngest.mergeSink(runA, table, ck, Seq("id"), "ord",
      compareExclude = Nil).awaitTermination(120000)
    assert(!MergeTable.read(spark, table).columns.contains("extra_col"))

    // later files carry extra_col; resume from the SAME checkpoint
    // with the evolved schema — only the new file is a micro-batch
    stage("b", Seq((2L, "w2", 20, 7.5), (3L, "x1", 20, 2.5))
      .toDF("id", "v", "ord", "extra_col"), 1700000060000L)
    val schemaB = spark.read.parquet(s"$dir/b.parquet").schema
    val runB = StreamingIngest.readStream(spark, "parquet", s"$dir/*.parquet",
      schemaB).select("id", "v", "ord", "extra_col")
    StreamingIngest.mergeSink(runB, table, ck, Seq("id"), "ord",
      compareExclude = Nil).awaitTermination(120000)

    val out = MergeTable.read(spark, table)
    assert(out.columns.contains("extra_col"), "table must widen")
    val rows = out.select("id", "v", "extra_col").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1)
    assert(rows.sameElements(Array(
      (1L, "v1", None),          // historical row: evolved column null
      (2L, "w2", Some(7.5)),     // updated through the evolved batch
      (3L, "x1", Some(2.5)))),   // inserted with the new column
      rows.mkString("; "))
  }

  test("scd2 soft-delete feed drives the gold hop: delete_time rows leave gold") {
    // the reference's SCD2 silver never shrinks — deletes surface as
    // delete_time stamps in the upsert feed. A gold consumer of that
    // feed must translate them: current rows upsert, soft-deleted
    // rows leave gold via the keyed delete, and a later re-insert of
    // the same key comes back.
    import SparkSpec.spark.implicits._
    import graft.streaming.MergeTableStream
    val silver = Files.createTempDirectory("graft_scd2_silver").toString
    val gold = Files.createTempDirectory("graft_scd2_gold").toString
    val ck = Files.createTempDirectory("graft_scd2_ck").toString
    def extract(rows: Seq[(Long, String, Int)]) =
      MergeTable.scd2Merge(spark, silver, rows.toDF("id", "v", "ord"),
        Seq("id"), "ord", deleteMissing = true, compareExclude = Nil)

    def foldGold(): Unit =
      MergeTableStream.processAvailable(spark, silver, ck) { (chg, _) =>
        val live = chg.filter(col("is_current") === 1)
          .select("id", "v", "ord")
        // soft deletes WITHOUT a same-batch re-insert: a collapsed
        // redelivery (vacuumed versions) can carry both the delete
        // row and a newer current row for one key — the current row
        // wins, so only keys with no live row in the batch delete
        val dels = chg.filter(col("delete_time").isNotNull &&
            col("is_current") === 0)
          .select("id").join(live.select("id"), Seq("id"), "left_anti")
        if (!live.isEmpty)
          MergeTable.scd1Merge(spark, gold, live, Seq("id"), "ord",
            compareExclude = Nil)
        if (MergeTable.exists(gold))
          MergeTable.deleteKeys(spark, gold, dels, Seq("id"))
        ()
      }

    extract(Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)))
    // full extract without id 2 -> soft delete; id 3 changed
    extract(Seq((1L, "a", 2), (3L, "c2", 2)))
    foldGold()
    def goldRows() = MergeTable.read(spark, gold).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(goldRows().sameElements(Array((1L, "a"), (3L, "c2"))),
      s"soft-deleted key must leave gold: ${goldRows().mkString}")

    // the key returns in a later extract -> back in gold
    extract(Seq((1L, "a", 3), (2L, "b2", 3), (3L, "c2", 3)))
    foldGold()
    assert(goldRows().sameElements(
      Array((1L, "a"), (2L, "b2"), (3L, "c2"))),
      s"re-inserted key must come back: ${goldRows().mkString}")
    // and gold always equals the silver CURRENT live projection
    val want = MergeTable.read(spark, silver)
      .filter(col("is_current") === 1).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(goldRows().sameElements(want), "gold must equal silver-current")
  }

  test("out-of-order batch cannot regress the merge table") {
    import SparkSpec.spark.implicits._
    val table = Files.createTempDirectory("graft_ooo").toString
    val newer = Seq((1L, "v2", 20)).toDF("id", "v", "ord")
    val older = Seq((1L, "v1", 10), (2L, "w1", 10)).toDF("id", "v", "ord")
    MergeTable.scd1Merge(spark, table, newer, Seq("id"), "ord", compareExclude = Nil)
    val s = MergeTable.scd1Merge(spark, table, older, Seq("id"), "ord", compareExclude = Nil)
    assert(s.inserted == 1 && s.updated == 0, s"late data must not update: $s")
    val rows = MergeTable.read(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sameElements(Array((1L, "v2"), (2L, "w1"))),
      s"late batch regressed the table: ${rows.mkString}")
  }

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
  private class CountingFormat(inner: graft.pipeline.TableFormat)
      extends graft.pipeline.TableFormat {
    val reads = scala.collection.mutable.Map.empty[String, Int]
    def readsOf(path: String): Int = reads.synchronized {
      reads.filter(_._1.startsWith(path)).values.sum
    }
    override def exists(path: String): Boolean = inner.exists(path)
    override def read(spark: org.apache.spark.sql.SparkSession,
                      path: String): org.apache.spark.sql.DataFrame = {
      reads.synchronized { reads(path) = reads.getOrElse(path, 0) + 1 }
      inner.read(spark, path)
    }
    override def readVersion(spark: org.apache.spark.sql.SparkSession,
                             path: String, version: Int) =
      inner.readVersion(spark, path, version)
    override def versions(path: String): Seq[Int] = inner.versions(path)
    override def currentVersion(path: String): Option[Int] =
      inner.currentVersion(path)
    override def scd1Merge(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           updates: org.apache.spark.sql.DataFrame,
                           keys: Seq[String], orderBy: String,
                           deleteMissing: Boolean,
                           compareExclude: Seq[String],
                           schemaEvolution: Boolean) =
      inner.scd1Merge(spark, path, updates, keys, orderBy, deleteMissing,
        compareExclude, schemaEvolution)
    override def scd2Merge(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           updates: org.apache.spark.sql.DataFrame,
                           keys: Seq[String], orderBy: String,
                           deleteMissing: Boolean,
                           compareExclude: Seq[String],
                           schemaEvolution: Boolean) =
      inner.scd2Merge(spark, path, updates, keys, orderBy, deleteMissing,
        compareExclude, schemaEvolution)
    override def deleteKeys(spark: org.apache.spark.sql.SparkSession,
                            path: String,
                            delKeys: org.apache.spark.sql.DataFrame,
                            keys: Seq[String]) =
      inner.deleteKeys(spark, path, delKeys, keys)
    override def vacuum(path: String, keepVersions: Int): Seq[Int] =
      inner.vacuum(path, keepVersions)
    override def registrableLocation(spark: org.apache.spark.sql.SparkSession,
                                     path: String): Option[String] =
      inner.registrableLocation(spark, path)
  }

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
