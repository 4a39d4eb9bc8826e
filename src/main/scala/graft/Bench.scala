package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds.
  *
  * Materializes via `queryExecution.toRdd.count()` — this executes the
  * FULL physical plan including every projected column (a plain
  * `df.count()` would let Catalyst prune all output columns and
  * measure a different, narrower plan).
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3,
  * back-to-back) and reports the MEDIAN — single-shot timings drifted
  * 1.3-2.2x round-over-round on sub-second queries, drowning real
  * regressions in noise. The first (cold, codegen-compiling) run is
  * reported separately under "cold" so cold-start regressions stay
  * visible; "total" is the sum of medians.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing (codegen compiler, parquet
    // reader, shuffle machinery, broadcast env): otherwise the
    // alphabetically-first query is charged several hundred ms of
    // one-time JVM init and timings aren't comparable across queries.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").limit(1).collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val attempts: Seq[Option[Double]] = (1 to runsPer).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count()
              Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      (name, attempts)
    }
    def median(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    // A crashed RUN must be distinguishable in the JSON itself
    // (stderr is not part of the bench artifact): a query with any
    // failed attempt is listed under "failed" — even if other
    // attempts succeeded (a cold-run-only crash must not hide behind
    // a healthy warm median). -1 marks all-runs-failed medians and a
    // failed cold attempt.
    val qs = results.map { case (k, ts) =>
      val ok = ts.flatten
      "\"" + k + "\":" + (if (ok.nonEmpty) median(ok) else -1.0)
    }.mkString("{", ",", "}")
    val cold = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.head.getOrElse(-1.0)
    }.mkString("{", ",", "}")
    val failed = results.collect {
      case (k, ts) if ts.exists(_.isEmpty) => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val total = results.collect {
      case (_, ts) if ts.flatten.nonEmpty => median(ts.flatten)
    }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$cold,"runs":$runsPer,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
