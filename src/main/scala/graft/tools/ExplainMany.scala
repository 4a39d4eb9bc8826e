package graft.tools
import org.apache.spark.sql.SparkSession

/** Batch plan dump for the optimization-round plan artifacts:
  * `runMain graft.tools.ExplainMany <outDir> <suffix> <q1,q2,...>`
  * writes `<outDir>/<query>_<suffix>.txt` with the formatted plan of
  * each named query (one shared session — the plans are identical to
  * per-query runs, construction-time jobs excepted).
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
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
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
      try w.println(plan) finally w.close()
      println(s"[explainmany] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
