package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing probe for the dedupResolve pipeline (r22 §6
  * triage): where do the cluster family's ~2.5 s go — the shingle
  * kernel, the group collapse, candidate generation, propagation
  * rounds, or the expansion tail? `runMain graft.tools.ResolveProbe`.
  */
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.Tables.load(spark, sfDir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[resolveprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { round =>
      println(s"[resolveprobe] === round $round ===")
      val docsH = time("1 shingleHashes scan+kernel (noop)") {
        val d = graft.operators.Dedup.shingleHashes(docs, "doc_id", "text", 5)
        noop(d); d
      }
      val dH = time("2 docsH eager checkpoint") {
        graft.Materialize.eager(docsH)
      }
      val groups = time("3 groups collapse (eager)") {
        graft.Materialize.eager(
          dH.groupBy(xxhash64(col("shash")).as("chash"))
            .agg(count(lit(1)).as("gsize"), min(col("id")).as("gmin"),
              first(col("shash")).as("shash")))
      }
      time("4 minhash+bands+pairs (noop)") {
        noop(graft.operators.Dedup.groupBandPairs(groups,
          numPerm = 64, bands = 16, maxBucket = Int.MaxValue, minBands = 2))
      }
      time("5 full dedupResolve (noop)") {
        noop(graft.operators.Dedup.dedupResolve(docs, "doc_id", "text",
          threshold = 0.8, maxBucket = Int.MaxValue, minBands = 2))
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(200)
    }
    spark.stop()
  }
}
