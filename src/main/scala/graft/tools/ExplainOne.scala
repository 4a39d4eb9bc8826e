package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump for perf triage:
  * `runMain graft.tools.ExplainOne <query> [final]`.
  * Default prints the pre-execution formatted plan; `final` executes
  * the query first and prints the AQE-final plan (the one that
  * actually ran — broadcast decisions live here).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val showFinal = args.length > 1 && args(1) == "final"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (showFinal) {
      df.queryExecution.toRdd.count()
      println(s"[explainone] $name FINAL (post-AQE) plan:")
      println(df.queryExecution.executedPlan.toString)
    } else {
      println(s"[explainone] $name formatted plan:")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
