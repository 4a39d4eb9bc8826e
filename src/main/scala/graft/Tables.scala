package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Test-table loader: one parquet file per TPC-H-ish table under a
  * scale-factor directory (see TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as a long and truncate to microseconds with
    * exact integer division — bit-identical to DuckDB, which also
    * truncates ns→µs at scan time. (Double division would silently
    * lose precision: ns-epoch ≈ 1.7e18 > 2^53.)
    */
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val path = s"$sfDir/$table.parquet"
    if (table == "events") {
      // Set-and-leave (always the same value) — a set/restore dance
      // would race with concurrent loads on a shared session. The flag
      // only affects TIMESTAMP(NANOS) columns, which exist nowhere
      // else in the test tables, so leaving it on is inert.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(path)
  }
}
