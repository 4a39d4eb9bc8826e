package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage langid timing triage (scratch): model build, doc
  * profile, distance aggregate, full query.
  */
object LangidProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[langidprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    import graft.operators.TextAnalysis
    t("model")(TextAnalysis.langIdModel(
      docs.filter(col("source") === "src0"), "text", "lang").count())
    t("docProf")(docs.select(col("doc_id"),
      explode(graft.functions.HashFunctions
        .charNgramProfile(col("text"), 3, 300)).as("_p")).count())
    (1 to 2).foreach { _ =>
      t("full")(TextAnalysis.languageIdNgram(docs, "doc_id", "text",
        "lang", col("source") === "src0").count())
    }
    spark.stop()
  }
}
