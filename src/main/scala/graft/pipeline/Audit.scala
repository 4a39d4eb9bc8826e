package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audit-log records for write operations (capability counterpart of
  * ingest-framework/framework/src/sparkbuilder/audit/auditlogs.py:
  * one row per operation with table, op, timestamp, user, and a JSON
  * metrics payload).
  */
object Audit {
  def log(spark: SparkSession, tableName: String, operation: String,
          stats: MergeStats, jobId: String = ""): DataFrame = {
    import spark.implicits._
    Seq((tableName, operation, stats.inserted, stats.updated, stats.deleted, jobId))
      .toDF("table_name", "audit_operation", "num_inserted", "num_updated",
        "num_deleted", "job_id")
      .withColumn("audit_timestamp", current_timestamp())
      .withColumn("audit_user", expr("current_user()"))
      .withColumn("audit_info",
        to_json(struct(col("num_inserted"), col("num_updated"), col("num_deleted"))))
  }

  /** Deterministic merge-shape statistics for a prospective SCD1
    * merge, computed from key sets only (no wall-clock, oracle-able).
    */
  def mergeShape(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val tKeys = target.select(keys.map(col): _*).distinct()
    val uKeys = updates.select(keys.map(col): _*).distinct()
    val updated = tKeys.join(uKeys, keys, "left_semi").count()
    val inserted = uKeys.join(tKeys, keys, "left_anti").count()
    val unchanged = tKeys.join(uKeys, keys, "left_anti").count()
    val spark = target.sparkSession
    import spark.implicits._
    Seq((inserted, updated, unchanged))
      .toDF("num_inserted", "num_updated", "num_unchanged")
  }
}
