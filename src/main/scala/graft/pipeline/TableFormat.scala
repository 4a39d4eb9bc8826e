package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sources

/** Deployment seam for the transactional-table layer.
  *
  * The reference registers Delta tables in a metastore and leans on
  * `MERGE INTO` + ACID for its upserts (ingest-framework/framework/
  * src/sparkbuilder/writers/writer.py:34-116 Delta upserts,
  * writer.py:122 `_create_external_table_from_df`). Graft's pipeline
  * operators program against THIS trait instead of a concrete
  * format, so a deployment can swap the bundled snapshot-versioned
  * parquet implementation for Delta or Iceberg by providing one
  * object — the merge PLANS (Cdc.scd1MergeTagged/scd2MergeTagged)
  * are format-independent; only commit/read mechanics differ:
  *
  *  - Delta: `read` = `spark.read.format("delta")`, merges via
  *    `DeltaTable.merge`, `vacuum` via `VACUUM`, `readVersion` via
  *    `versionAsOf`.
  *  - Iceberg: reads by table identifier, merges via `MERGE INTO`,
  *    `vacuum` = `expire_snapshots`, `readVersion` via
  *    `snapshot-id`.
  *
  * The bundled [[SnapshotTableFormat]] keeps the engine
  * dependency-free (immutable `v=N` snapshot dirs + an atomically
  * swapped `_CURRENT` pointer).
  */
trait TableFormat {

  /** Does a table exist at `path`? */
  def exists(path: String): Boolean

  /** Read the current table state. */
  def read(spark: SparkSession, path: String): DataFrame

  /** Time travel: read a specific committed version. */
  def readVersion(spark: SparkSession, path: String, version: Int): DataFrame

  /** Committed versions, ascending. */
  def versions(path: String): Seq[Int]

  /** Current committed version, if the table exists. */
  def currentVersion(path: String): Option[Int]

  /** SCD1 upsert (latest row per key wins; optional delete-missing
    * for full extracts). Creates the table on first write.
    */
  def scd1Merge(spark: SparkSession, path: String, updates: DataFrame,
                keys: Seq[String], orderBy: String,
                deleteMissing: Boolean = false,
                compareExclude: Seq[String] = Sources.controlColumns,
                schemaEvolution: Boolean = true): MergeStats

  /** SCD2 merge (history rows with is_current/start/end/delete_time).
    * Creates the table on first write.
    */
  def scd2Merge(spark: SparkSession, path: String, updates: DataFrame,
                keys: Seq[String], orderBy: String,
                deleteMissing: Boolean = false,
                compareExclude: Seq[String] = Sources.controlColumns,
                schemaEvolution: Boolean = true): MergeStats

  /** Keyed hard delete: commit a new version without the rows whose
    * keys appear in `delKeys` (DELETE FROM ... WHERE key IN feed).
    * Deleting an absent key is a no-op, so replays are idempotent —
    * the same contract as the merges. The table must exist.
    */
  def deleteKeys(spark: SparkSession, path: String, delKeys: DataFrame,
                 keys: Seq[String]): MergeStats

  /** Drop versions beyond the retention window. Returns dropped
    * version ids.
    */
  def vacuum(path: String, keepVersions: Int = 2): Seq[Int]

  /** Does committed `version` change table DATA, as opposed to a
    * pure file-layout commit (OPTIMIZE)? Streaming consumers use this
    * to skip layout-only versions WITHOUT running a change-diff scan
    * — the rows are identical by construction, and at scale the
    * avoided no-op diff is two full-table scans. Default true: the
    * snapshot format's commits are always rewrites of data state.
    */
  def isDataChange(path: String, version: Int): Boolean = true

  /** The subset of `versions(path)` whose data files are all still
    * present — i.e. the versions a consumer can actually read after
    * vacuum. The default probes each version with a read plan
    * (O(versions) state loads); formats with a cheaper answer
    * override — the streaming consumer calls this once per poll.
    */
  def readableVersions(spark: SparkSession, path: String): Seq[Int] =
    versions(path).filter(v =>
      scala.util.Try(readVersion(spark, path, v)).isSuccess)

  /** Compact small live data files into fewer, larger ones without
    * changing rows — Delta's OPTIMIZE, which the reference runs after
    * every merge (writers/writer.py:280,690 `optimize {target_table}`
    * + audit log). Default: nothing to compact — the snapshot format's
    * commits are whole-table rewrites, so its file layout is already
    * one write's worth. Manifest formats (delta-log) override.
    */
  def optimize(spark: SparkSession, path: String,
               smallFileBytes: Long = 128L << 20): Option[OptimizeStats] = None
}

/** Result of a [[TableFormat.optimize]] compaction commit. */
final case class OptimizeStats(version: Int, compacted: Int, written: Int)

/** The bundled implementation: [[MergeTable]]'s snapshot-versioned
  * parquet with an atomic `_CURRENT` pointer swap.
  */
object SnapshotTableFormat extends TableFormat {
  override def exists(path: String): Boolean = MergeTable.exists(path)

  override def read(spark: SparkSession, path: String): DataFrame =
    MergeTable.read(spark, path)

  override def readVersion(spark: SparkSession, path: String,
                           version: Int): DataFrame =
    MergeTable.readVersion(spark, path, version)

  override def versions(path: String): Seq[Int] = MergeTable.versions(path)

  override def currentVersion(path: String): Option[Int] =
    MergeTable.currentVersion(path)

  override def scd1Merge(spark: SparkSession, path: String, updates: DataFrame,
                         keys: Seq[String], orderBy: String,
                         deleteMissing: Boolean,
                         compareExclude: Seq[String],
                         schemaEvolution: Boolean): MergeStats =
    MergeTable.scd1Merge(spark, path, updates, keys, orderBy, deleteMissing,
      compareExclude, schemaEvolution)

  override def scd2Merge(spark: SparkSession, path: String, updates: DataFrame,
                         keys: Seq[String], orderBy: String,
                         deleteMissing: Boolean,
                         compareExclude: Seq[String],
                         schemaEvolution: Boolean): MergeStats =
    MergeTable.scd2Merge(spark, path, updates, keys, orderBy, deleteMissing,
      compareExclude, schemaEvolution)

  override def deleteKeys(spark: SparkSession, path: String,
                          delKeys: DataFrame, keys: Seq[String]): MergeStats =
    MergeTable.deleteKeys(spark, path, delKeys, keys)

  override def vacuum(path: String, keepVersions: Int): Seq[Int] =
    MergeTable.vacuum(path, keepVersions)

  /** Snapshot vacuum deletes whole `v=N` dirs, so every listed
    * version is readable by construction — no probing needed.
    */
  override def readableVersions(spark: SparkSession,
                                path: String): Seq[Int] = versions(path)
}
