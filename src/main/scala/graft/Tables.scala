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
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        // schema is resolved eagerly inside read(), while the conf is set
        spark.read.parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    } else spark.read.parquet(path)
  }
}
