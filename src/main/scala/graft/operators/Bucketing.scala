package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-elimination tools for 100 TB fact-fact joins (SURVEY.md
  * §5): bucketed co-located joins and skew salting.
  */
object Bucketing {

  /** Persist a table bucketed (and sorted) by the join key. Two
    * fact tables bucketed on the same key with the same bucket count
    * join WITHOUT any shuffle — at 100 TB the orders⨝lineitem
    * exchange disappears entirely (both scans are already hash
    * partitioned on disk). Bucketing requires the table catalog
    * (`saveAsTable`), not a bare path.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    // an in-memory catalog forgets managed tables across JVMs while
    // their files persist — clear any orphaned location first
    val loc = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$tableName"
    val dir = java.nio.file.Paths.get(loc)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir))(
        _.iterator().asScala.toSeq.reverse)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(tableName)
  }

  /** Skew-salted equi-join: the left (skewed fact) side gets a
    * deterministic salt in [0, salts) hashed from `saltBy` (a
    * high-cardinality column — NOT the join key), the right side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows now spread over `salts`
    * partitions instead of one straggler task. Result set is
    * identical to the unsalted join (verified in BucketingSpec).
    * AQE's skew-join handles moderate skew automatically; explicit
    * salting is for the pathological keys AQE can't split (e.g. one
    * key = 30% of the table).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 saltBy: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = skewed.withColumn("_salt",
      pmod(xxhash64(col(saltBy)), lit(salts)).cast("int"))
    val r = other.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
