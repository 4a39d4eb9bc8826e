package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev triage (r21): ann_recall_ivfpq attempts degrade 2x-8x across
  * repeats inside one JVM in the bench sequence. Split each repeat
  * into construction (driver training + collects) vs execution to
  * see which side degrades. Usage: runMain graft.tools.AnnRepeatProbe
  */
object AnnRepeatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    import graft.operators.Similarity
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      val truth = Similarity.annBruteForce(e, "vec_id", "embedding")
      val t1 = System.nanoTime()
      val approx = Similarity.annIvfPq(e, "vec_id", "embedding")
      val t2 = System.nanoTime()
      val r = Similarity.annRecall(truth, approx)
      r.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      println(f"[annrepeat] $i brute=${(t1 - t0) / 1e9}%.2f ivfpq_construct=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f")
      if (sys.env.contains("ANN_PROBE_UNPERSIST")) {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
