package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for perf triage: `runMain graft.tools.BenchOne <query> [n]`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").limit(1).collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"[benchone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
