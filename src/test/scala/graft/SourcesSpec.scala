package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

class SourcesSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sf, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def roundTrip(format: String,
                        writeOpts: Map[String, String] = Map.empty,
                        readOpts: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft_src_$format").toString + "/data"
    orders.write.options(writeOpts).format(format).save(dir)
    val back = Sources.read(spark, format, dir, readOpts)
    assert(back.count() == orders.count(), s"$format row count")
    Sources.controlColumns.foreach(c =>
      assert(back.columns.contains(c), s"$format missing control column $c"))
    assert(back.filter(col("file_path").isNull ||
      col("file_modification_time").isNull).count() == 0,
      s"$format control columns not populated")
    val sum = back.agg(org.apache.spark.sql.functions.sum(
      col("o_orderkey").cast("long"))).collect()(0).getLong(0)
    val want = orders.agg(org.apache.spark.sql.functions.sum(
      col("o_orderkey"))).collect()(0).getLong(0)
    assert(sum == want, s"$format data fidelity")
  }

  test("parquet round-trip stamps control columns")(roundTrip("parquet"))
  test("orc round-trip stamps control columns")(roundTrip("orc"))
  test("json round-trip stamps control columns")(roundTrip("json"))
  test("csv round-trip stamps control columns")(
    roundTrip("csv", Map("header" -> "true"),
      Map("header" -> "true", "inferSchema" -> "true")))

  test("text source reads lines and whole files, stamped") {
    val dir = Files.createTempDirectory("graft_src_text")
    Files.write(dir.resolve("a.txt"), "line one\nline two\n".getBytes)
    Files.write(dir.resolve("b.txt"), "solo\n".getBytes)
    val lines = Sources.read(spark, "text", dir.toString)
    assert(lines.count() == 3)
    assert(lines.columns.contains("value"))
    Sources.controlColumns.foreach(c => assert(lines.columns.contains(c)))
    assert(lines.filter(col("file_path").isNull).count() == 0)
    val whole = Sources.read(spark, "text", dir.toString,
      Map("wholetext" -> "true"))
    assert(whole.count() == 2, "wholetext = one row per file")
    assert(whole.filter(col("value").contains("line one\nline two"))
      .count() == 1)
  }

  test("binaryFile source reads media bytes with metadata, stamped") {
    val dir = Files.createTempDirectory("graft_src_bin")
    val payload = Array.tabulate[Byte](256)(_.toByte)
    Files.write(dir.resolve("img0.bin"), payload)
    Files.write(dir.resolve("skip.other"), Array[Byte](1, 2, 3))
    val media = Sources.read(spark, "binaryfile", dir.toString,
      Map("pathGlobFilter" -> "*.bin"))
    val rows = media.collect()
    assert(rows.length == 1, "glob filter selects extensions")
    val r = media.select(col("length"), col("content")).head()
    assert(r.getLong(0) == 256L)
    assert(r.getAs[Array[Byte]](1).sameElements(payload),
      "content bytes must round-trip exactly")
    Sources.controlColumns.foreach(c => assert(media.columns.contains(c)))
    assert(media.filter(col("file_path").isNull ||
      col("file_modification_time").isNull).count() == 0)
  }

  test("table reads resolve catalog-qualified three-part names") {
    val dir = Files.createTempDirectory("graft_src_cat").toString + "/t"
    orders.limit(100).write.parquet(dir)
    // external table in the session catalog: metadata only, data
    // stays at `dir` — the same registration shape a metastore holds
    spark.catalog.createTable("graft_cat_probe", dir, "parquet")
    try {
      Seq("graft_cat_probe", "default.graft_cat_probe",
        "spark_catalog.default.graft_cat_probe").foreach { name =>
        val got = Sources.read(spark, "table", name)
        assert(got.count() == 100, s"qualified read failed for $name")
      }
    } finally spark.sql("DROP TABLE IF EXISTS default.graft_cat_probe")
  }

  test("unknown format fails clearly") {
    val e = intercept[IllegalArgumentException](
      Sources.read(spark, "avro-nope", "/tmp/x"))
    assert(e.getMessage.contains("avro-nope"))
  }

  test("timestamps round-trip exactly under the production write type") {
    // GraftSession writes annotated TIMESTAMP_MICROS (GraftSession
    // .scala:30) while Verify deliberately stays on INT96 for the
    // DuckDB oracle — so the oracle harness never exercises the
    // SHIPPED session's timestamp write path. This pins it directly:
    // write + re-read under the GraftSession config (the shared test
    // session) must be value-exact at microsecond precision, across
    // pre-1970, sub-second, and null values, in a non-UTC reader
    // session timezone as well as UTC.
    assert(spark.conf.get("spark.sql.parquet.outputTimestampType") ==
      "TIMESTAMP_MICROS", "spec must run under the production write type")
    val dir = Files.createTempDirectory("graft_src_tsrt").toString + "/data"
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, TIMESTAMP'1969-12-31 23:59:59.999999'),
        |  (2L, TIMESTAMP'1970-01-01 00:00:00'),
        |  (3L, TIMESTAMP'2024-02-29 12:34:56.000001'),
        |  (4L, TIMESTAMP'2262-04-11 23:47:16.854775'),
        |  (5L, CAST(NULL AS TIMESTAMP)) AS t(id, ts)""".stripMargin)
    df.write.parquet(dir)
    val want = df.collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).sortBy(_._1)
    def got(): Seq[(Long, Option[String])] =
      spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).sortBy(_._1).toSeq
    assert(got() == want.toSeq, "µs round-trip in UTC")
    // instant semantics must survive a reader in another zone: the
    // annotated type is tz-adjusted (an instant), so re-reading under
    // a shifted session zone must yield the same micros-since-epoch
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val shifted = spark.read.parquet(dir)
        .select(col("id"), unix_micros(col("ts")).as("us")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .sortBy(_._1).toSeq
      spark.conf.set("spark.sql.session.timeZone", before)
      val wantUs = spark.sql(
        """SELECT id, unix_micros(ts) FROM VALUES
          |  (1L, TIMESTAMP'1969-12-31 23:59:59.999999'),
          |  (2L, TIMESTAMP'1970-01-01 00:00:00'),
          |  (3L, TIMESTAMP'2024-02-29 12:34:56.000001'),
          |  (4L, TIMESTAMP'2262-04-11 23:47:16.854775'),
          |  (5L, CAST(NULL AS TIMESTAMP)) AS t(id, ts)""".stripMargin)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).sortBy(_._1).toSeq
      assert(shifted == wantUs, "instant preserved across reader timezones")
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("dropControlColumns restores the business schema") {
    val dir = Files.createTempDirectory("graft_src_drop").toString + "/data"
    orders.write.parquet(dir)
    val back = Sources.dropControlColumns(Sources.readParquet(spark, dir))
    assert(back.columns.sorted.sameElements(orders.columns.sorted))
  }
}
