package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timings for the span-dedup pipeline (r22 triage). */
object SpanPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[spanprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { round =>
      println(s"[spanprobe] === round $round ===")
      val anchors = graft.operators.TextAnalysis
        .winnowAnchorPositions(docs, "doc_id", "text", 8, 4, false)
        .select(col("doc_id").as("id"), col("pos"), col("fingerprint"))
      time("1 anchor kernel scan (noop)") { noop(anchors) }
      val sel = time("2 eagerBulk checkpoint") {
        graft.Materialize.eagerBulk(anchors)
      }
      time("3 df agg + semi + islands (noop, from ckpt)") {
        val shared = sel.groupBy(col("fingerprint"))
          .agg(min(col("id")).as("_lo"), max(col("id")).as("_hi"))
          .filter(col("_lo") =!= col("_hi")).select(col("fingerprint"))
        noop(sel.join(shared, Seq("fingerprint"), "left_semi")
          .select(col("id"), col("pos")))
      }
      time("4 full text_span_dedup (noop)") {
        noop(graft.operators.TextAnalysis.spanDedupStats(
          docs, "doc_id", "text", 8, 4, 30, false))
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(150)
    }
    spark.stop()
  }
}
