package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** [[TableFormat]] decorator that stores a table HASH-BUCKETED by its
  * merge key over [[DeltaLogTableFormat]]'s partition-pruned commits:
  * every merge adds a `__kbucket = pmod(xxhash64(keys), buckets)`
  * column and routes through `scd1MergePruned`/`scd2MergePruned`, so
  * a fold that touches b keys rewrites only the ≈min(b, buckets)
  * buckets holding them — each 1/buckets of the table — instead of
  * the whole live set. Keyed deletes route through the stats-pruned
  * `deleteKeysPruned`. This is the scale layout for the incremental
  * dedup members' state/gold tables (SURVEY.md §2 #27-31): their
  * per-fold updates are batch-neighborhood-sized while the
  * accumulated state is corpus-sized, which is exactly the regime
  * where pruned commits win (rewrite ≈ |batch keys| · |state| /
  * buckets vs |state|).
  *
  * The bucket column is pure function of the merge keys, so the
  * pruned merges' "a key must not move partitions" contract holds by
  * construction, replay/idempotence semantics are unchanged (the
  * merge plans are the same `Cdc.scd1MergeTagged` the unpruned path
  * runs), and `read`/`readVersion` drop the column so callers see
  * exactly the schema they wrote — the layout is invisible above
  * this seam. Mirrors Delta/Iceberg bucket partition transforms
  * (`bucket(N, col)`), which exist for precisely this merge shape.
  *
  * Tables must be CREATED through this format (the first merge lays
  * down the bucket tokens); pointing it at a table written
  * unpartitioned fails fast with the pruned merges' layout check.
  * `deleteMissing` (full-extract reconciliation) needs global key
  * visibility and is refused — use an unbucketed format for full
  * extracts.
  */
final case class BucketedTableFormat(buckets: Int = 64) extends TableFormat {
  require(buckets >= 2, s"need at least 2 buckets, got $buckets")

  import BucketedTableFormat.BucketCol
  private def inner = DeltaLogTableFormat

  private def withBucket(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(!df.columns.contains(BucketCol),
      s"updates already carry reserved column $BucketCol")
    df.withColumn(BucketCol,
      pmod(xxhash64(keys.map(col): _*), lit(buckets.toLong)))
  }

  override def exists(path: String): Boolean = inner.exists(path)

  override def read(spark: SparkSession, path: String): DataFrame =
    inner.read(spark, path).drop(BucketCol)

  override def readVersion(spark: SparkSession, path: String,
                           version: Int): DataFrame =
    inner.readVersion(spark, path, version).drop(BucketCol)

  override def versions(path: String): Seq[Int] = inner.versions(path)

  override def currentVersion(path: String): Option[Int] =
    inner.currentVersion(path)

  override def scd1Merge(spark: SparkSession, path: String, updates: DataFrame,
                         keys: Seq[String], orderBy: String,
                         deleteMissing: Boolean = false,
                         compareExclude: Seq[String] = Sources.controlColumns,
                         schemaEvolution: Boolean = true): MergeStats = {
    require(!deleteMissing,
      "bucketed pruned merges cannot deleteMissing (it needs global key " +
        "visibility across all buckets) — use an unbucketed format for " +
        "full extracts")
    // onePerTuple: each touched bucket rewrites as ONE file. Without
    // it every shuffle task writes a file per bucket it holds —
    // measured at the sf10 probe as a 16k-file gold table after 3
    // commits, every subsequent read paying 16k file opens.
    inner.mergePruned(spark, path, withBucket(updates, keys), keys,
      orderBy, Seq(BucketCol), scdType = 1, compareExclude,
      onePerTuple = true)
  }

  override def scd2Merge(spark: SparkSession, path: String, updates: DataFrame,
                         keys: Seq[String], orderBy: String,
                         deleteMissing: Boolean = false,
                         compareExclude: Seq[String] = Sources.controlColumns,
                         schemaEvolution: Boolean = true): MergeStats = {
    require(!deleteMissing,
      "bucketed pruned merges cannot deleteMissing (it needs global key " +
        "visibility across all buckets) — use an unbucketed format for " +
        "full extracts")
    inner.mergePruned(spark, path, withBucket(updates, keys), keys,
      orderBy, Seq(BucketCol), scdType = 2, compareExclude,
      onePerTuple = true)
  }

  /** Stats-pruned delete: only files whose log-recorded key stats can
    * hold a delete key are rewritten — the bucketed layout makes this
    * sharper still, since each file covers one bucket of the key
    * space. The rewrite preserves the bucket tokens
    * (deleteKeysPruned's partitioned-layout contract), so later
    * pruned merges still match every live file.
    */
  override def deleteKeys(spark: SparkSession, path: String,
                          delKeys: DataFrame, keys: Seq[String]): MergeStats =
    inner.deleteKeysPruned(spark, path, delKeys, keys, onePerTuple = true)

  override def vacuum(path: String, keepVersions: Int = 2): Seq[Int] =
    inner.vacuum(path, keepVersions)

  override def isDataChange(path: String, version: Int): Boolean =
    inner.isDataChange(path, version)

  override def readableVersions(spark: SparkSession,
                                path: String): Seq[Int] =
    inner.readableVersions(spark, path)

  override def optimize(spark: SparkSession, path: String,
                        smallFileBytes: Long = 128L << 20)
      : Option[OptimizeStats] =
    inner.optimize(spark, path, smallFileBytes)

  override def registrableLocation(spark: SparkSession,
                                   path: String): Option[String] =
    inner.registrableLocation(spark, path)

  /** Registers with the USER schema — the `__kbucket` layout column
    * stays invisible to SQL clients (parquet reads columns by name,
    * so the declared-schema scan simply never materializes it).
    */
  override def registerTable(spark: SparkSession, path: String,
                             name: String): Unit =
    inner.registerTableAs(spark, path, name, read(spark, path).schema)
}

object BucketedTableFormat {
  /** Reserved layout column; stripped on every read through the
    * format. Double-underscore prefix matches the engine's other
    * internal columns.
    */
  val BucketCol = "__kbucket"
}
