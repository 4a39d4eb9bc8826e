package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev triage: stage-by-stage timing of the span-dedup pipeline at a
  * given SF dir — where do the seconds go between the winnow kernel,
  * the positional variant, the document-frequency aggregate, and the
  * island fold? Usage: runMain graft.tools.SpanProbe <sfDir>
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[span-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    t("warm scan")(docs.count())
    t("winnowFingerprints (min-only) count")(
      graft.operators.TextAnalysis.winnowFingerprints(
        docs, "doc_id", "text", 8, 4).count())
    t("winnowAnchorPositions count")(
      graft.operators.TextAnalysis.winnowAnchorPositions(
        docs, "doc_id", "text", 8, 4).count())
    val sel = t("sel materialize")(graft.Materialize.eagerBulk(
      graft.operators.TextAnalysis.winnowAnchorPositions(
        docs, "doc_id", "text", 8, 4)
        .select(col("doc_id").as("id"), col("pos"), col("fingerprint"))))
    println(s"[span-probe] sel rows ${sel.count()}")
    val shared = t("df aggregate")(graft.Materialize.eager(
      sel.groupBy(col("fingerprint"))
        .agg(min(col("id")).as("_lo"), max(col("id")).as("_hi"))
        .filter(col("_lo") =!= col("_hi")).select(col("fingerprint"))))
    println(s"[span-probe] shared prints ${shared.count()}")
    val anchors = t("anchors semi-join materialize")(graft.Materialize.eagerBulk(
      sel.join(shared, Seq("fingerprint"), "left_semi")
        .select(col("id"), col("pos"))))
    println(s"[span-probe] anchors ${anchors.count()}")
    t("island fold + join")(
      graft.operators.TextAnalysis.spanDedupStats(
        docs, "doc_id", "text").count())
    // the winnow OVERLAP pair verdict, oracle hash vs production hash
    // — quantifies the remaining md5 gram tax end to end
    t("winnowOverlapStats md5")(
      graft.operators.Dedup.winnowOverlapStats(
        docs, "doc_id", "text").count())
    t("winnowOverlapStats xxhash64 (prodHash)")(
      graft.operators.Dedup.winnowOverlapStats(
        docs, "doc_id", "text", prodHash = true).count())
    t("spanDedupClean")(
      graft.operators.TextAnalysis.spanDedupClean(
        docs, "doc_id", "text").count())
    spark.stop()
  }
}
