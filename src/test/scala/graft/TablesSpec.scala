package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.types._

/** Guards `Tables.load` against testdata regeneration changing the
  * parquet encoding of `events.ts` (it has shipped as TIMESTAMP(NANOS),
  * `timestamp[us]` NTZ, and µs-UTC across generations). Each encoding
  * is written to a scratch dir and loaded through the real loader; all
  * three must yield the same TimestampType values.
  */
class TablesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // 2024-03-01T12:34:56.789123456Z in ns — the ns tail (456) must be
  // truncated, not rounded, to match DuckDB scan-time behaviour.
  // The pinned rule is `ts div 1000` = truncation TOWARD ZERO, same
  // as the loader (Tables.scala); for the in-contract post-1970
  // epochs the testdata generator emits this equals floor division.
  // Pre-epoch ns timestamps are outside the contract (toward-zero
  // and floor diverge there, and the oracle engine's choice isn't
  // verifiable offline) — the fixture deliberately stops at 0.
  private val nsEpochs = Seq(1709296496789123456L, 1709296500000000001L, 0L)
  private def usOf(ns: Long): Long = ns / 1000L

  private def writeEvents(rows: Seq[Row], schema: StructType): String = {
    val dir = Files.createTempDirectory("graft-ts-fixture").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events.parquet"
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
    dir.getAbsolutePath
  }

  private def loadedMicros(sfDir: String): Seq[Long] = {
    val df = Tables.load(spark, sfDir, "events")
    assert(df.schema("ts").dataType === TimestampType,
      s"loader must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.select(org.apache.spark.sql.functions.unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq.sorted
  }

  private val expected = nsEpochs.map(usOf).sorted

  test("ts as int64 nanoseconds (legacy TIMESTAMP(NANOS) read path)") {
    // Spark cannot write parquet TIMESTAMP(NANOS); with
    // nanosAsLong=true the loader sees it as LongType, which is
    // exactly what a plain int64 column reads as — same branch.
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType)))
    val rows = nsEpochs.zipWithIndex.map { case (ns, i) => Row(i.toLong, ns) }
    assert(loadedMicros(writeEvents(rows, schema)) === expected)
  }

  test("ts as timestamp[us] NTZ (current testdata encoding)") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    val rows = nsEpochs.zipWithIndex.map { case (ns, i) =>
      Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(usOf(ns), 1000000L),
        (Math.floorMod(usOf(ns), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    }
    assert(loadedMicros(writeEvents(rows, schema)) === expected)
  }

  test("ts as timestamp[us] UTC-adjusted (TimestampType passthrough)") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    // Session TZ is UTC, so µs-epoch → Timestamp via timestamp_micros
    // round-trips exactly; build via DataFrame to avoid TZ ambiguity.
    val base = spark.createDataFrame(
      nsEpochs.zipWithIndex.map { case (ns, i) => Row(i.toLong, usOf(ns)) }.asJava,
      StructType(Seq(StructField("event_id", LongType), StructField("us", LongType))))
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val dir = Files.createTempDirectory("graft-ts-fixture").toFile
    dir.deleteOnExit()
    base.coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/events.parquet")
    assert(loadedMicros(dir.getAbsolutePath) === expected)
  }
}
