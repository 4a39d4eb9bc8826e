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

}
