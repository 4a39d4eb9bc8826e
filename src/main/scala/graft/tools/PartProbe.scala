package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off partition-count probe for the resolve pipeline (r22). */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val docsH = graft.Materialize.eager(
      graft.operators.Dedup.shingleHashes(docs, "doc_id", "text", 5))
    println(s"[partprobe] docsH parts=${docsH.rdd.getNumPartitions} rows=${docsH.count()}")
    val groups = graft.Materialize.eager(
      docsH.groupBy(xxhash64(col("shash")).as("chash"))
        .agg(count(lit(1)).as("gsize"), min(col("id")).as("gmin"),
          first(col("shash")).as("shash")))
    println(s"[partprobe] groups parts=${groups.rdd.getNumPartitions} rows=${groups.count()}")
    val gp = graft.operators.Dedup.groupBandPairs(groups, 64, 16, Int.MaxValue, 2)
    val t0 = System.nanoTime()
    gp.write.format("noop").mode("overwrite").save()
    println(f"[partprobe] pairs noop ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
