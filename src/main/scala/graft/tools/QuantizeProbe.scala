package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B probe for the quantize guard cost (not part of the
  * library surface; run via `runMain graft.tools.QuantizeProbe`).
  */
object QuantizeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def noGuard(df: DataFrame): DataFrame = {
      val v = col("embedding").cast("array<double>")
      val amax = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
      df.select(col("vec_id"), (amax / lit(127.0)).as("scale"), v.as("_v"))
        .select(col("vec_id"), col("scale"),
          transform(col("_v"), x =>
            when(col("scale") === 0.0, lit(0L))
              .otherwise(floor(x / col("scale") + lit(0.5)))
              .cast("tinyint")).as("qvec"))
    }
    def existsGuard(df: DataFrame): DataFrame = {
      val v = col("embedding").cast("array<double>")
      val amax = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
      val nonFinite = exists(v, x => isnan(x) || abs(x) > lit(Double.MaxValue))
      df.select(col("vec_id"),
          when(nonFinite, raise_error(concat(lit("bad "), col("vec_id").cast("string"))))
            .otherwise(amax / lit(127.0)).as("scale"), v.as("_v"))
        .select(col("vec_id"), col("scale"),
          transform(col("_v"), x =>
            when(col("scale") === 0.0, lit(0L))
              .otherwise(floor(x / col("scale") + lit(0.5)))
              .cast("tinyint")).as("qvec"))
    }
    def scalarGuard(df: DataFrame): DataFrame =
      graft.operators.Similarity.quantizeEmbeddings(df, "vec_id", "embedding")

    def bench(name: String, mk: DataFrame => DataFrame, explode: Boolean,
              outer: Boolean = false): Unit = {
      val times = (1 to 5).map { _ =>
        val base = mk(e)
        val q = if (explode) base.select(col("vec_id"), col("scale"),
          (if (outer) posexplode_outer(col("qvec")) else posexplode(col("qvec")))
            .as(Seq("component", "qval"))) else base
        val t0 = System.nanoTime()
        q.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-22s explode=$explode%-5s outer=$outer%-5s " +
        times.map(t => f"$t%.3f").mkString(" "))
    }
    if (sys.env.contains("PROBE_EXPLAIN")) {
      Seq("noGuard" -> noGuard _, "existsGuard" -> existsGuard _,
        "scalarGuard" -> scalarGuard _).foreach { case (n, mk) =>
        println(s"===== $n + explode =====")
        println(mk(e).select(col("vec_id"), col("scale"),
          posexplode(col("qvec")).as(Seq("component", "qval")))
          .queryExecution.optimizedPlan.treeString)
      }
    } else for (_ <- 1 to 2) {
      bench("noGuard", noGuard, explode = true)
      bench("existsGuard", existsGuard, explode = true)
      bench("scalarGuard", scalarGuard, explode = true)
      bench("noGuard", noGuard, explode = true, outer = true)
      bench("existsGuard", existsGuard, explode = true, outer = true)
      bench("scalarGuard", scalarGuard, explode = true, outer = true)
    }
    spark.stop()
  }
}
