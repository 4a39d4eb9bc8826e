package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{avg, col}

import graft.operators.Similarity

/** Dev tool: IVF-PQ recall measurement grid — the accept/reject
  * evidence for code-quality levers (OPQ rotation iterations ×
  * rerank depth) at identical (nlist, nprobe, m, ksub). Prints one
  * line per cell: mean recall@5 vs the exact brute-force truth.
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RecallProbe <sfDir>")
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .transform(graft.Materialize.eager)
    val truth = Similarity.annBruteForce(e, "vec_id", "embedding")
      .transform(graft.Materialize.eager)
    def recall(opq: Int, rerank: Int): Double =
      Similarity.annRecall(truth,
          Similarity.annIvfPq(e, "vec_id", "embedding",
            rerank = rerank, opqIters = opq))
        .agg(avg(col("recall"))).head.getDouble(0)
    for (rerank <- Seq(0, 2, 8); opq <- Seq(0, 4, 8)) {
      val t0 = System.nanoTime()
      val r = recall(opq, rerank)
      println(f"[recall-probe] rerank=$rerank%2d opqIters=$opq%2d " +
        f"recall@5=$r%.4f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
