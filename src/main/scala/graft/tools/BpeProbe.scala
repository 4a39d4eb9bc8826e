package graft.tools
import org.apache.spark.sql.SparkSession

/** BPE trainer merge-count probe: `runMain graft.tools.BpeProbe
  * [merges] [runs]` over `SPARK_GRAFT_SF_DIR`'s documents — measures
  * the documented O(merges) driver-synchronized-job bound
  * (TextAnalysis.bpeTrain scaladoc) at production-ish merge counts,
  * reporting total wall and the amortized per-merge cost so TIMINGS
  * can state whether fixed job overhead or vocabulary work dominates.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val merges = if (args.nonEmpty) args(0).toInt else 100
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      val table = graft.operators.TextAnalysis
        .bpeTrain(docs, "text", merges = merges)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpeprobe] run $r: merges=$merges learned=${table.length} " +
        f"total=$secs%.1f s per-merge=${secs / math.max(table.length, 1)}%.3f s")
    }
    spark.stop()
  }
}
