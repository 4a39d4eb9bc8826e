package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, current_timestamp, lit}

import graft.cdc.Cdc

final case class MergeStats(inserted: Long, updated: Long, deleted: Long)

/** Snapshot-versioned parquet table with MERGE semantics.
  *
  * Plays the role the reference delegates to Delta Lake MERGE INTO
  * (ingest-framework/framework/src/sparkbuilder/writers/
  * batch_writers.py:59-163): each merge writes a new immutable
  * snapshot directory `v=N` and atomically swaps a `_CURRENT`
  * pointer file, so readers never see partial writes and failed
  * merges leave the previous version intact. On a cluster the same
  * Cdc.scd1Merge/scd2Merge plans back onto Delta/Iceberg
  * copy-on-write; this keeps the engine dependency-free.
  *
  * Scale note: a full-snapshot rewrite per merge is the worst case;
  * partition the table (`partitionBy`) so only partitions containing
  * changed keys rewrite, and rely on AQE to size the shuffle.
  */
object MergeTable {

  private def currentVersion(path: String): Option[Int] = {
    val p = Paths.get(path, "_CURRENT")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  def exists(path: String): Boolean = currentVersion(path).isDefined

  def read(spark: SparkSession, path: String): DataFrame = {
    val v = currentVersion(path).getOrElse(
      throw new IllegalStateException(s"no current version at $path"))
    spark.read.parquet(s"$path/v=$v")
  }

  /** Write a new snapshot version and atomically swap the pointer. */
  def writeSnapshot(df: DataFrame, path: String,
                    partitionBy: Seq[String] = Nil): Int = {
    val next = currentVersion(path).getOrElse(-1) + 1
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$path/v=$next")
    val tmp = Paths.get(path, "_CURRENT.tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path, "_CURRENT"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** SCD1 merge into the table (creates it on first write). */
  def scd1Merge(spark: SparkSession, path: String, updates: DataFrame,
                keys: Seq[String], orderBy: String,
                deleteMissing: Boolean = false): MergeStats = {
    val ord = Seq(col(orderBy).desc) ++ keys.map(col(_).desc)
    if (!exists(path)) {
      val first = Cdc.latestPerKey(updates, keys, ord)
      writeSnapshot(first, path)
      MergeStats(inserted = first.count(), updated = 0, deleted = 0)
    } else {
      val target = read(spark, path)
      val merged = Cdc.scd1Merge(target, updates.select(target.columns.map(col).toIndexedSeq: _*),
        keys, ord, deleteMissing)
      // stats from one pass over key sets (cheap: keys only)
      val tKeys = target.select(keys.map(col): _*)
      val uKeys = updates.select(keys.map(col): _*).distinct()
      val updated = tKeys.join(uKeys, keys, "left_semi").count()
      val inserted = uKeys.join(tKeys, keys, "left_anti").count()
      val deleted = if (deleteMissing) tKeys.join(uKeys, keys, "left_anti").count() else 0L
      writeSnapshot(merged, path)
      MergeStats(inserted, updated, deleted)
    }
  }

  /** SCD2 merge into the table (creates it with history columns). */
  def scd2Merge(spark: SparkSession, path: String, updates: DataFrame,
                keys: Seq[String], orderBy: String,
                deleteMissing: Boolean = false): MergeStats = {
    val ord = Seq(col(orderBy).desc) ++ keys.map(col(_).desc)
    if (!exists(path)) {
      val first = Cdc.latestPerKey(updates, keys, ord)
        .withColumn("is_current", lit(1))
        .withColumn("start_time", current_timestamp())
        .withColumn("end_time", lit(null).cast("timestamp"))
        .withColumn("delete_time", lit(null).cast("timestamp"))
      writeSnapshot(first, path)
      MergeStats(inserted = first.count(), updated = 0, deleted = 0)
    } else {
      val target = read(spark, path)
      val merged = Cdc.scd2Merge(target, updates, keys, ord, deleteMissing)
      val before = target.filter(col("is_current") === 1).count()
      writeSnapshot(merged, path)
      val after = read(spark, path)
      val currentAfter = after.filter(col("is_current") === 1).count()
      val versions = after.count()
      MergeStats(
        inserted = currentAfter,
        updated = versions - currentAfter,
        deleted = after.filter(col("delete_time").isNotNull).count())
    }
  }
}
