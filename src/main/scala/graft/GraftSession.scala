package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * Local runs use `local[N]` with shuffle partitions sized to cores
  * (not Spark's default 200); on a real cluster the same builder is
  * used without a master and AQE re-sizes shuffles at runtime.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Parquet pushdown is on by default; pin the settings that the
      // engine's plans depend on so cluster-side overrides can't
      // silently regress scan pruning.
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // Spark still DEFAULTS to deprecated INT96 timestamps on write;
      // arrow-based readers surface those as nanoseconds, which
      // diverges from every µs-native engine. Annotated µs is the
      // portable on-disk contract.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // InferFiltersFromGenerate adds `size(arr)>0 AND isnotnull(arr)`
      // under every non-outer explode; when the array is computed in
      // the same stage (shingles, minhash signatures, quantized
      // vectors — this engine's bread and butter), predicate pushdown
      // substitutes the FULL array expression into both conjuncts, and
      // higher-order folds are CodegenFallback with no cross-operator
      // CSE — the whole computation runs 3× per row (r11 probe:
      // quantize+explode 2.3 s → 0.08 s without the rule). The rule's
      // only upside — pruning rows before Generate on STORED array
      // columns — doesn't apply here (explode drops null/empty arrays
      // itself; no semantics change).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // r22: the compiled-codegen-class cache defaults to 100 entries
      // — a 178-query workload (each query tens of codegen units)
      // thrashes it, so repeated plans pay janino recompilation on
      // the driver every run. Sized to the workload, not the host:
      // entries are compiled class references, bounded memory.
      .config("spark.sql.codegen.cache.maxEntries", "2000")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${sys.props.getOrElse("user.name", "u")}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
