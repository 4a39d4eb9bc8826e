package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.cdc.Cdc
import graft.dq._
import graft.pipeline._
import graft.sources.Sources

/** Oracle-checked queries exercising the ingestion-pipeline surface
  * (SURVEY.md §2 #11-21): transform chains, templated SQL, diffs,
  * CDC compaction/apply, SCD merges, DQ, audit, metadata stamping.
  *
  * Each query is DETERMINISTIC (no wall-clock) so the driver's DuckDB
  * oracle can replay it; the event-time cutoff 2024-01-15 splits the
  * events table into a "target state" half and an "update feed" half
  * to exercise merge semantics on real data.
  */
object PipelineQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  private val T0 = "2024-01-15 00:00:00"

  /** Deterministic CDC ordering used by every events-derived merge. */
  private def evOrd: Seq[Column] = Seq(col("ts").desc, col("event_id").desc)

  private def preState(spark: SparkSession, dir: String): DataFrame =
    Cdc.latestPerKey(
      t(spark, dir, "events").filter(col("ts") < lit(T0).cast("timestamp")),
      Seq("user_id"), evOrd)
      .select(col("user_id"), col("event_type"), col("value"))

  private def postFeed(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").filter(col("ts") >= lit(T0).cast("timestamp"))

  /** #11 Config-driven transform chain: the whole chain folds into ONE
    * Catalyst plan — the Where still pushes to the parquet scan even
    * though renames/casts/normalizes follow it in config order.
    */
  def pipeTransformChain(spark: SparkSession, dir: String): DataFrame = {
    val chain = Pipeline.of(
      Where("l_quantity > 30"),
      Select(Seq("l_orderkey", "l_partkey", "l_quantity",
        "l_extendedprice", "l_tax", "l_shipdate")),
      Rename(Seq("l_orderkey" -> "Order Key", "l_partkey" -> "Part Key")),
      NormalizeCols,
      LowercaseCols,
      Cast(Seq("l_extendedprice" -> "decimal(18,2)", "l_tax" -> "decimal(18,2)")),
      WithColumnExpr("gross",
        "CAST(l_extendedprice * (CAST(1 AS DECIMAL(18,2)) + l_tax) AS DOUBLE)"),
      WithColumnExpr("ship_date", "CAST(l_shipdate AS DATE)"),
      Drop(Seq("l_shipdate", "l_extendedprice", "l_tax")))
    chain(t(spark, dir, "lineitem"))
  }

  /** #12b MS-Access SQL transform, end-to-end: translate a legacy
    * Access query — brackets, IIf, &-concat, TOP, #date# literal,
    * Access LIKE wildcards, a table rename — through
    * [[graft.pipeline.AccessSql]] (the reference's sql-converter:
    * ms_access_to_databricks_sql.py:7) and EXECUTE the result on the
    * lake table. The oracle is the hand-written ANSI equivalent, so
    * the translation is value-verified, not just string-compared.
    */
  def pipeAccessSql(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("graft_access_orders")
    val access =
      """SELECT TOP 20 [o_orderkey],
        |  IIf([o_totalprice] > 150000, "big", "small") AS bucket,
        |  UCase([o_orderstatus]) & "-" & [o_orderpriority] AS tag
        |FROM legacy_orders
        |WHERE [o_orderpriority] LIKE "1*" AND [o_orderdate] >= #1/1/1995#
        |ORDER BY [o_orderkey]""".stripMargin
    spark.sql(graft.pipeline.AccessSql.translate(access,
      Map("legacy_orders" -> "graft_access_orders")))
  }

  /** #12 Templated SQL transform over a registered view. */
  def pipeSqlTransform(spark: SparkSession, dir: String): DataFrame =
    SqlTransform(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM {{table_view}}
        |WHERE l_returnflag = '{{flag}}'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
      Map("flag" -> "R"))(t(spark, dir, "lineitem"))

  /** #13 Brute-force changed-row diff: synthetic extract vs snapshot
    * derived from orders by key-modulus filters (inserts where
    * key%3=0, deletes where key%5=0, updates where key%7=0).
    */
  def pipeBruteForceDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val price = col("o_totalprice").cast(DecimalType(18, 2))
    val snapshot = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), price.as("price"))
    val source = o.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 7 === 0, price + lit(1).cast(DecimalType(18, 2)))
          .otherwise(price).as("price"))
    BruteForceDiff.diff(source, snapshot, Seq("o_orderkey"))
      .withColumn("price", col("price").cast("double"))
  }

  /** #14 CDC latest-per-key compaction over the event stream. */
  def cdcLatestPerKey(spark: SparkSession, dir: String): DataFrame =
    Cdc.latestPerKey(t(spark, dir, "events"), Seq("user_id"), evOrd)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts"))

  /** #15 CDC op-split apply: error events act as deletes, everything
    * else upserts; latest op per key wins.
    */
  def cdcApplyOps(spark: SparkSession, dir: String): DataFrame = {
    val feed = postFeed(spark, dir)
      .withColumn("op", when(col("event_type") === "error", "delete")
        .otherwise("upsert"))
    Cdc.applyOps(preState(spark, dir), feed, Seq("user_id"), "op", evOrd)
  }

  /** #16 SCD1 merge (tagged): pre-cutoff state merged with the
    * post-cutoff feed; the `merge_action` column exposes the
    * insert/update/unchanged/keep decision for each key.
    */
  def scd1Merge(spark: SparkSession, dir: String): DataFrame =
    Cdc.scd1MergeTagged(preState(spark, dir), postFeed(spark, dir),
      Seq("user_id"), evOrd)
      .withColumnRenamed("_action", "merge_action")

  /** #17 SCD2 history from event time (deterministic — no wall-clock):
    * each event is a version row with [start,end) validity.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    Cdc.scd2History(
      t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts")),
      Seq("user_id"), "ts", Seq(col("event_id").asc))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("start_time"), col("end_time"), col("is_current"))

  /** #18 DQ per-column profile (completeness + cardinality, one pass). */
  def dqMetrics(spark: SparkSession, dir: String): DataFrame =
    DataQuality.profile(t(spark, dir, "orders"),
      Seq("o_custkey", "o_totalprice", "o_orderstatus"))

  /** Sketch companion of [[dqMetrics]]: HLL cardinalities, no
    * expand — the wide-schema profile (rows-only driver check;
    * error pinned vs exact in QuantileSketchSpec).
    */
  def dqMetricsApprox(spark: SparkSession, dir: String): DataFrame =
    DataQuality.profileApprox(t(spark, dir, "orders"),
      Seq("o_custkey", "o_totalprice", "o_orderstatus"))

  /** #19 DQ rule evaluation: N rules, ONE aggregate pass. */
  def dqRules(spark: SparkSession, dir: String): DataFrame =
    DataQuality.evaluate(t(spark, dir, "lineitem"), Seq(
      NotNull("l_orderkey"),
      Unique("l_orderkey"),
      InRange("l_quantity", 1, 50),
      InSet("l_returnflag", Seq("A", "N", "R")),
      MatchesRegex("l_linestatus", "^[OF]$"),
      CustomPredicate("negative_price", "l_extendedprice < 0")))

  /** DQ distribution profile: equi-width histogram (exact bounds,
    * clamped top edge, engine-exact bin arithmetic).
    */
  def dqHistogram(spark: SparkSession, dir: String): DataFrame =
    DataQuality.histogram(t(spark, dir, "lineitem"), "l_extendedprice",
      bins = 10)

  /** DQ equi-depth (quantile-bucket) histogram: the skew-readable
    * distribution profile (integer-exact rank boundaries, one
    * distinct-value shuffle; value-exact oracle).
    */
  def dqHistogramDepth(spark: SparkSession, dir: String): DataFrame =
    DataQuality.equiDepthHistogram(t(spark, dir, "lineitem"),
      "l_extendedprice", buckets = 8)

  /** Scale-path equi-depth profile: KLL-estimated boundaries + exact
    * binning counts (rows-only — sketch estimates aren't SQL).
    */
  def dqHistogramDepthSketch(spark: SparkSession, dir: String): DataFrame =
    DataQuality.equiDepthHistogramSketch(t(spark, dir, "lineitem"),
      "l_extendedprice", buckets = 8)

  /** DQ per-group equi-depth profile: quantile buckets per return
    * flag (each group's own distribution, skew-readable).
    */
  def dqHistogramDepthGroup(spark: SparkSession, dir: String): DataFrame =
    DataQuality.equiDepthHistogramByGroup(t(spark, dir, "lineitem"),
      "l_returnflag", "l_extendedprice", buckets = 4)

  /** DQ referential integrity: every lineitem must resolve to an
    * order (orphan/null accounting; unreferenced parents reported).
    */
  def dqReferential(spark: SparkSession, dir: String): DataFrame =
    DataQuality.referentialIntegrity(
      t(spark, dir, "lineitem"), "l_orderkey",
      t(spark, dir, "orders"), "o_orderkey")

  /** DQ robust outlier accounting: Tukey fences per return flag.
    * Exact quartiles (oracle-able); [[dqOutliersSketch]] is the
    * 100-TB path for continuous columns.
    */
  def dqOutliers(spark: SparkSession, dir: String): DataFrame =
    DataQuality.iqrOutliers(t(spark, dir, "lineitem"),
      "l_returnflag", "l_extendedprice")

  /** Sketch companion of [[dqOutliers]]: fences from mergeable KLL
    * quartile estimates — partial-agg shape, no per-group
    * distinct-value sort, the plan that survives a continuous
    * column at 100×. Rows-only driver check (merge-order-dependent
    * estimates, like the other sketches); the rank-error bound vs
    * the exact block is pinned in QuantileSketchSpec.
    */
  def dqOutliersSketch(spark: SparkSession, dir: String): DataFrame =
    DataQuality.iqrOutliersSketch(t(spark, dir, "lineitem"),
      "l_returnflag", "l_extendedprice")

  /** Week-over-week value-distribution drift on the events stream:
    * week of Jan 1 (reference) vs week of Jan 8 (current), fixed
    * [0, 500) bounds, 10 bins, total-variation-ready shares.
    */
  def dqDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val ref = e.filter(col("ts") >= "2024-01-01" && col("ts") < "2024-01-08")
    val cur = e.filter(col("ts") >= "2024-01-08" && col("ts") < "2024-01-15")
    DataQuality.distributionDrift(ref, cur, "value",
      lo = 0.0, hi = 500.0, bins = 10)
  }

  /** #18g Exact correlation profiler: Pearson r between the lineitem
    * measures, one aggregate pass — see
    * [[graft.dq.DataQuality.correlationMatrix]] for the exact-moment
    * / closed-form design that makes a float statistic oracle-exact.
    */
  def dqCorr(spark: SparkSession, dir: String): DataFrame =
    DataQuality.correlationMatrix(t(spark, dir, "lineitem"), Seq(
      "l_quantity" -> "l_extendedprice",
      "l_quantity" -> "l_discount",
      "l_extendedprice" -> "l_discount"))

  /** #18h Functional-dependency profile over the part dimension: one
    * exact FD (the key), one coarse and one weak near-dependency —
    * the normalization-candidate report.
    */
  def dqFuncdep(spark: SparkSession, dir: String): DataFrame =
    DataQuality.functionalDependencies(t(spark, dir, "part"), Seq(
      "p_partkey" -> "p_brand",
      "p_brand" -> "p_type",
      "p_name" -> "p_brand"))

  /** #18i Leading-digit (Benford screening) profile of order totals. */
  def dqBenford(spark: SparkSession, dir: String): DataFrame =
    DataQuality.benfordProfile(t(spark, dir, "orders"), "o_totalprice")

  /** #18j Chi-square contingency cells: is the language mix
    * independent of the source? Per-cell rows keep every value a
    * fixed order-free float tree (cross-engine hash-exact); the
    * summed statistic is the consumer's one-liner.
    */
  def dqChisq(spark: SparkSession, dir: String): DataFrame =
    DataQuality.chiSquareCells(t(spark, dir, "documents"),
      "source", "lang")

  /** #18k Two-sample Kolmogorov–Smirnov: do urgent and low-priority
    * orders draw the same total-price distribution? The dq family's
    * numeric drift test (chi-square covers categorical).
    */
  def dqKs(spark: SparkSession, dir: String): DataFrame =
    DataQuality.ksTest(t(spark, dir, "orders"), "o_totalprice",
      "o_orderpriority", "1-URGENT", "5-LOW")

  /** #20 Audit merge-shape record: single-join plan, no actions. */
  def auditLog(spark: SparkSession, dir: String): DataFrame = {
    val target = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val updates = t(spark, dir, "orders").select(col("o_custkey").as("custkey"))
    Audit.mergeShape(target, updates, Seq("custkey"))
  }

  /** #21 Ingest metadata stamping (rows-only oracle: absolute paths
    * and mtimes are environment-dependent, so the check is shape).
    */
  def ingestMetadata(spark: SparkSession, dir: String): DataFrame =
    Sources.readParquet(spark, s"$dir/lineitem.parquet")
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("file_modification_time").isNull, 1L).otherwise(0L))
          .as("n_null_mtime"),
        sum(when(col("row_creation_time").isNull, 1L).otherwise(0L))
          .as("n_null_created"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_transform_chain" -> (pipeTransformChain _),
    "pipe_sql_transform" -> (pipeSqlTransform _),
    "pipe_access_sql" -> (pipeAccessSql _),
    "pipe_brute_force_diff" -> (pipeBruteForceDiff _),
    "cdc_latest_per_key" -> (cdcLatestPerKey _),
    "cdc_apply_ops" -> (cdcApplyOps _),
    "scd1_merge" -> (scd1Merge _),
    "scd2_history" -> (scd2History _),
    "dq_metrics" -> (dqMetrics _),
    "dq_metrics_approx" -> (dqMetricsApprox _),
    "dq_rules" -> (dqRules _),
    "dq_histogram" -> (dqHistogram _),
    "dq_histogram_depth" -> (dqHistogramDepth _),
    "dq_histogram_depth_group" -> (dqHistogramDepthGroup _),
    "dq_histogram_depth_sketch" -> (dqHistogramDepthSketch _),
    "dq_referential" -> (dqReferential _),
    "dq_outliers" -> (dqOutliers _),
    "dq_outliers_sketch" -> (dqOutliersSketch _),
    "dq_drift" -> (dqDrift _),
    "dq_corr" -> (dqCorr _),
    "dq_funcdep" -> (dqFuncdep _),
    "dq_benford" -> (dqBenford _),
    "dq_chisq" -> (dqChisq _),
    "dq_ks" -> (dqKs _),
    "audit_log" -> (auditLog _),
    "ingest_metadata" -> (ingestMetadata _))

  private val preSql =
    """SELECT user_id, event_type, value FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1""".stripMargin

  private val postSql =
    """SELECT user_id, event_type, value FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // first-significant-digit via the same fixed-depth power-of-10
    // IEEE normalization chain as the Spark side (a CTE per step so
    // neither engine duplicates the CASE operand); the share total
    // runs over the <=9-row aggregated frame
    // the full |sources| x |langs| grid (missing cells observed 0),
    // expected = row·col/N and contribution (o−e)²/e in the same
    // fixed float tree as the Spark side
    "dq_chisq" ->
      """WITH base AS (
        |  SELECT source, lang FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL),
        |o AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS observed
        |      FROM base GROUP BY source, lang),
        |ra AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS row_total
        |       FROM base GROUP BY source),
        |cb AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS col_total
        |       FROM base GROUP BY lang),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
        |grid AS (
        |  SELECT ra.source, cb.lang,
        |    COALESCE(o.observed, 0) AS observed,
        |    ra.row_total, cb.col_total,
        |    CAST(ra.row_total * cb.col_total AS DOUBLE)
        |      / CAST(n.nn AS DOUBLE) AS expected
        |  FROM ra CROSS JOIN cb CROSS JOIN n
        |  LEFT JOIN o ON o.source = ra.source AND o.lang = cb.lang)
        |SELECT source, lang, observed, row_total, col_total, expected,
        |  (CAST(observed AS DOUBLE) - expected)
        |    * (CAST(observed AS DOUBLE) - expected) / expected
        |    AS contribution
        |FROM grid""".stripMargin,
    // KS: per-value exact counts, running CDFs over ONE window (the
    // Spark side replays the same values through its bucketed
    // distributed prefix sum), one IEEE division per CDF point,
    // argmax by (ks_d DESC, value ASC) LIMIT 1
    "dq_ks" ->
      """WITH base AS (
        |  SELECT CAST(o_totalprice AS DOUBLE) AS v, o_orderpriority AS g
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |    AND o_totalprice IS NOT NULL),
        |c AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM base GROUP BY v),
        |n AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |             CAST(SUM(cb) AS BIGINT) AS nb FROM c),
        |e AS (
        |  SELECT v,
        |    CAST(SUM(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cca,
        |    CAST(SUM(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS ccb
        |  FROM c)
        |SELECT n.na AS n_a, n.nb AS n_b,
        |  abs(CAST(cca AS DOUBLE) / CAST(n.na AS DOUBLE)
        |    - CAST(ccb AS DOUBLE) / CAST(n.nb AS DOUBLE)) AS ks_d,
        |  v AS ks_at
        |FROM e CROSS JOIN n
        |ORDER BY ks_d DESC, ks_at ASC LIMIT 1""".stripMargin,
    "dq_benford" -> {
      val pows = Seq(256, 128, 64, 32, 16, 8, 4, 2, 1)
      val upCtes = pows.zipWithIndex.map { case (p, i) =>
        s"s${i + 1} AS (SELECT CASE WHEN v < 1e${1 - p} THEN v * 1e$p ELSE v END AS v FROM s$i)"
      }
      val downCtes = pows.zipWithIndex.map { case (p, i) =>
        s"s${i + 10} AS (SELECT CASE WHEN v >= 1e$p THEN v / 1e$p ELSE v END AS v FROM s${i + 9})"
      }
      val ctes = (Seq(
        """s0 AS (
          |  SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
          |  WHERE o_totalprice > 0 AND NOT isnan(CAST(o_totalprice AS DOUBLE))
          |    AND CAST(o_totalprice AS DOUBLE) <= 1.7976931348623157e308)""".stripMargin)
        ++ upCtes ++ downCtes ++ Seq(
        "d AS (SELECT substring(CAST(CAST(floor(v) AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM s18)",
        "c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit)"))
        .mkString(",\n")
      s"""WITH $ctes
         |SELECT digit, n,
         |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share
         |FROM c""".stripMargin
    },
    // pure distinct counting; strength divides exact longs once
    "dq_funcdep" -> {
      def row(det: String, dep: String) =
        s"""SELECT '$det' AS determinant, '$dep' AS dependent,
           |  CAST(COUNT(DISTINCT $det) AS BIGINT) AS n_det,
           |  CAST(COUNT(DISTINCT ($det, $dep)) AS BIGINT) AS n_pairs,
           |  COUNT(DISTINCT $det) = COUNT(DISTINCT ($det, $dep)) AS fd_holds,
           |  CAST(COUNT(DISTINCT $det) AS DOUBLE)
           |    / CAST(COUNT(DISTINCT ($det, $dep)) AS DOUBLE) AS strength
           |FROM part""".stripMargin
      Seq(("p_partkey", "p_brand"), ("p_brand", "p_type"),
        ("p_name", "p_brand"))
        .map { case (a, b) => row(a, b) }.mkString("\nUNION ALL\n")
    },
    // exact decimal moments; closed-form corr in doubles with the
    // same op order as the Spark side (see correlationMatrix)
    "dq_corr" -> {
      def mom(x: String, y: String, i: Int) =
        s"""SUM(CAST($x AS DECIMAL(18,2))) AS sx$i,
           |  SUM(CAST($y AS DECIMAL(18,2))) AS sy$i,
           |  SUM(CAST($x AS DECIMAL(18,2)) * CAST($y AS DECIMAL(18,2))) AS sxy$i,
           |  SUM(CAST($x AS DECIMAL(18,2)) * CAST($x AS DECIMAL(18,2))) AS sxx$i,
           |  SUM(CAST($y AS DECIMAL(18,2)) * CAST($y AS DECIMAL(18,2))) AS syy$i""".stripMargin
      def row(x: String, y: String, i: Int) =
        s"""SELECT '$x' AS col_x, '$y' AS col_y, n,
           |  (CAST(n AS DOUBLE) * CAST(sxy$i AS DOUBLE) - CAST(sx$i AS DOUBLE) * CAST(sy$i AS DOUBLE))
           |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx$i AS DOUBLE) - CAST(sx$i AS DOUBLE) * CAST(sx$i AS DOUBLE))
           |     * sqrt(CAST(n AS DOUBLE) * CAST(syy$i AS DOUBLE) - CAST(sy$i AS DOUBLE) * CAST(sy$i AS DOUBLE))) AS corr
           |FROM m""".stripMargin
      val pairs = Seq(("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"), ("l_extendedprice", "l_discount"))
      s"""WITH m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  ${pairs.zipWithIndex.map { case ((x, y), i) => mom(x, y, i) }.mkString(",\n  ")}
         |  FROM lineitem)
         |${pairs.zipWithIndex.map { case ((x, y), i) => row(x, y, i) }.mkString("\nUNION ALL\n")}""".stripMargin
    },
    // shares divide exact longs as doubles once; fixed [0,500)x10
    // bins so both engines bin identically (see distributionDrift)
    "dq_drift" ->
      """WITH r AS (
        |  SELECT least(9, greatest(0,
        |      CAST(floor((CAST(value AS DOUBLE) - 0.0) / 50.0) AS INT))) AS bin
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |    AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
        |c AS (
        |  SELECT least(9, greatest(0,
        |      CAST(floor((CAST(value AS DOUBLE) - 0.0) / 50.0) AS INT))) AS bin
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |    AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
        |rb AS (SELECT bin, CAST(count(*) AS BIGINT) AS ref_n FROM r GROUP BY bin),
        |cb AS (SELECT bin, CAST(count(*) AS BIGINT) AS cur_n FROM c GROUP BY bin),
        |j AS (
        |  SELECT COALESCE(rb.bin, cb.bin) AS bin,
        |    COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n
        |  FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
        |t AS (
        |  SELECT *, SUM(ref_n) OVER () AS rt, SUM(cur_n) OVER () AS ct
        |  FROM j)
        |SELECT CAST(bin AS INT) AS bin, CAST(bin * 50.0 AS DOUBLE) AS bin_lo,
        |  CAST((bin + 1) * 50.0 AS DOUBLE) AS bin_hi, ref_n, cur_n,
        |  CAST(ref_n AS DOUBLE) / rt AS ref_share,
        |  CAST(cur_n AS DOUBLE) / ct AS cur_share,
        |  abs(CAST(ref_n AS DOUBLE) / rt - CAST(cur_n AS DOUBLE) / ct)
        |    AS share_diff
        |FROM t""".stripMargin,
    "pipe_transform_chain" ->
      """SELECT l_orderkey AS order_key, l_partkey AS part_key, l_quantity,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS gross,
        |  CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem WHERE l_quantity > 30""".stripMargin,
    "pipe_access_sql" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS bucket,
        |  upper(o_orderstatus) || '-' || o_orderpriority AS tag
        |FROM orders
        |WHERE o_orderpriority LIKE '1%' AND o_orderdate >= DATE'1995-01-01'
        |ORDER BY o_orderkey LIMIT 20""".stripMargin,
    "pipe_sql_transform" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "pipe_brute_force_diff" ->
      """WITH snapshot AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |source AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 7 = 0
        |         THEN CAST(o_totalprice AS DECIMAL(18,2)) + CAST(1 AS DECIMAL(18,2))
        |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |j AS (
        |  SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |    s.o_custkey AS o_custkey, CAST(s.price AS DOUBLE) AS price,
        |    CASE WHEN t.o_orderkey IS NULL THEN 'insert'
        |         WHEN s.o_orderkey IS NULL THEN 'delete'
        |         WHEN s.o_custkey IS DISTINCT FROM t.o_custkey
        |           OR s.price IS DISTINCT FROM t.price THEN 'update' END AS diff_type
        |  FROM source s FULL OUTER JOIN snapshot t ON s.o_orderkey = t.o_orderkey)
        |SELECT * FROM j WHERE diff_type IS NOT NULL""".stripMargin,
    "cdc_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "cdc_apply_ops" ->
      s"""WITH pre AS ($preSql), post AS ($postSql)
         |SELECT user_id, event_type, value FROM pre
         |WHERE user_id NOT IN (SELECT user_id FROM post)
         |UNION ALL
         |SELECT user_id, event_type, value FROM post WHERE event_type <> 'error'""".stripMargin,
    "scd1_merge" ->
      s"""WITH pre AS ($preSql), post AS ($postSql),
         |j AS (
         |  SELECT t.user_id AS t_uid, s.user_id AS s_uid,
         |    t.event_type AS t_et, t.value AS t_v,
         |    s.event_type AS s_et, s.value AS s_v
         |  FROM post s FULL OUTER JOIN pre t ON s.user_id = t.user_id),
         |a AS (
         |  SELECT *, CASE WHEN t_uid IS NULL THEN 'insert'
         |    WHEN s_uid IS NULL THEN 'keep'
         |    WHEN s_et IS DISTINCT FROM t_et OR s_v IS DISTINCT FROM t_v THEN 'update'
         |    ELSE 'unchanged' END AS merge_action FROM j)
         |SELECT COALESCE(s_uid, t_uid) AS user_id,
         |  CASE WHEN merge_action IN ('insert','update') THEN s_et ELSE t_et END AS event_type,
         |  CASE WHEN merge_action IN ('insert','update') THEN s_v ELSE t_v END AS value,
         |  merge_action
         |FROM a""".stripMargin,
    "scd2_history" ->
      """SELECT user_id, event_id, event_type, value,
        |  CAST(ts AS TIMESTAMP) AS start_time,
        |  CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP) AS end_time,
        |  CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM events""".stripMargin,
    "dq_metrics" ->
      """SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', COUNT(*),
        |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(*),
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders""".stripMargin,
    "dq_histogram" ->
      """WITH b AS (
        |  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
        |         max(CAST(l_extendedprice AS DOUBLE)) AS hi
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |w AS (SELECT lo, hi, (hi - lo) / 10 AS w FROM b),
        |x AS (
        |  SELECT least(9, CAST(floor(
        |      (CAST(l.l_extendedprice AS DOUBLE) - w.lo) / w.w) AS INT)) AS bin,
        |    w.lo, w.w
        |  FROM lineitem l, w WHERE l.l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l.l_extendedprice AS DOUBLE)))
        |SELECT CAST(bin AS INT) AS bin, lo + bin * w AS bin_lo,
        |  lo + (bin + 1) * w AS bin_hi,
        |  COUNT(*) AS n
        |FROM x GROUP BY bin, lo, w""".stripMargin,
    "dq_histogram_depth" ->
      """WITH vals AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cnt AS (SELECT v, COUNT(*) AS c FROM vals GROUP BY v),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM cnt),
        |tot AS (SELECT COUNT(*) AS n FROM vals),
        |b AS (
        |  SELECT CAST(i AS INT) AS bucket,
        |    (SELECT MIN(v) FROM cum, tot WHERE cum >= (n * i + 7) // 8) AS hi,
        |    (SELECT MIN(cum) FROM cum, tot
        |     WHERE cum >= (n * i + 7) // 8) AS chi
        |  FROM generate_series(1, 8) AS t(i))
        |SELECT bucket, LAG(hi) OVER (ORDER BY bucket) AS lo, hi,
        |  CAST(chi - COALESCE(LAG(chi) OVER (ORDER BY bucket), 0)
        |    AS BIGINT) AS n
        |FROM b WHERE hi IS NOT NULL""".stripMargin,
    "dq_histogram_depth_group" ->
      """WITH vals AS (
        |  SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
        |cnt AS (SELECT g, v, COUNT(*) AS c FROM vals GROUP BY g, v),
        |cum AS (
        |  SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY g) AS n
        |  FROM cnt),
        |b AS (
        |  SELECT grps.g AS l_returnflag, CAST(i AS INT) AS bucket,
        |    (SELECT MIN(v) FROM cum
        |     WHERE cum.g IS NOT DISTINCT FROM grps.g
        |       AND cum >= (n * i + 3) // 4) AS hi,
        |    (SELECT MIN(cum) FROM cum
        |     WHERE cum.g IS NOT DISTINCT FROM grps.g
        |       AND cum >= (n * i + 3) // 4) AS chi
        |  FROM (SELECT DISTINCT g FROM vals) grps, generate_series(1, 4) t(i))
        |SELECT l_returnflag, bucket,
        |  LAG(hi) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS lo, hi,
        |  CAST(chi - COALESCE(
        |    LAG(chi) OVER (PARTITION BY l_returnflag ORDER BY bucket), 0)
        |    AS BIGINT) AS n
        |FROM b""".stripMargin,
    "dq_referential" ->
      """WITH c AS (
        |  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT DISTINCT o_orderkey AS k, TRUE AS p FROM orders),
        |j AS (
        |  SELECT COALESCE(c.k, p.k) AS k, c.cn AS cn, p.p AS p
        |  FROM c FULL OUTER JOIN p ON c.k = p.k)
        |SELECT
        |  CAST(COALESCE(SUM(cn), 0) AS BIGINT) AS n_child_rows,
        |  CAST(COALESCE(SUM(CASE WHEN k IS NULL THEN cn END), 0) AS BIGINT)
        |    AS n_null_keys,
        |  CAST(COALESCE(SUM(CASE WHEN k IS NOT NULL AND p IS NULL THEN cn END),
        |    0) AS BIGINT) AS n_orphans,
        |  CAST(COUNT(CASE WHEN p AND k IS NOT NULL THEN 1 END) AS BIGINT)
        |    AS n_parent_keys,
        |  CAST(COUNT(CASE WHEN p AND k IS NULL THEN 1 END) AS BIGINT)
        |    AS n_null_parent_keys,
        |  CAST(COUNT(CASE WHEN p AND k IS NOT NULL AND cn IS NULL THEN 1 END)
        |    AS BIGINT) AS n_unreferenced_parents,
        |  COALESCE(SUM(CASE WHEN k IS NOT NULL AND p IS NULL THEN cn END), 0)
        |      = 0
        |    AND COALESCE(SUM(CASE WHEN k IS NULL THEN cn END), 0) = 0
        |    AS passed
        |FROM j""".stripMargin,
    "dq_outliers" ->
      """WITH c AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v, COUNT(*) AS cnt
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE)) GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v,
        |    SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    SUM(cnt) OVER (PARTITION BY g) AS n
        |  FROM c),
        |q AS (
        |  SELECT g,
        |    CAST(MIN(CASE WHEN cum >= ceil(n * 0.25) THEN v END) AS DOUBLE) AS q1,
        |    CAST(MIN(CASE WHEN cum >= ceil(n * 0.75) THEN v END) AS DOUBLE) AS q3
        |  FROM cum GROUP BY g),
        |b AS (
        |  SELECT g, q1, q3,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        |  FROM q)
        |SELECT l.l_returnflag, b.q1, b.q3, b.lo, b.hi,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN CAST(l.l_extendedprice AS DOUBLE) < b.lo
        |       OR CAST(l.l_extendedprice AS DOUBLE) > b.hi
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM lineitem l JOIN b ON b.g IS NOT DISTINCT FROM l.l_returnflag
        |WHERE l.l_extendedprice IS NOT NULL
        |  AND NOT isnan(CAST(l.l_extendedprice AS DOUBLE))
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    "dq_rules" ->
      """SELECT 'not_null(l_orderkey)' AS rule_name, 'l_orderkey' AS column_name,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |  SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed FROM lineitem
        |UNION ALL
        |SELECT 'unique(l_orderkey)', 'l_orderkey', COUNT(*),
        |  CAST(COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) AS BIGINT),
        |  COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) = 0 FROM lineitem
        |UNION ALL
        |SELECT 'in_range(l_quantity,1.0,50.0)', 'l_quantity', COUNT(*),
        |  CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
        |  SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0 FROM lineitem
        |UNION ALL
        |SELECT 'in_set(l_returnflag)', 'l_returnflag', COUNT(*),
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT),
        |  SUM(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) = 0 FROM lineitem
        |UNION ALL
        |SELECT 'matches_regex(l_linestatus)', 'l_linestatus', COUNT(*),
        |  CAST(SUM(CASE WHEN l_linestatus IS NULL OR NOT regexp_matches(l_linestatus, '^[OF]$') THEN 1 ELSE 0 END) AS BIGINT),
        |  SUM(CASE WHEN l_linestatus IS NULL OR NOT regexp_matches(l_linestatus, '^[OF]$') THEN 1 ELSE 0 END) = 0 FROM lineitem
        |UNION ALL
        |SELECT 'negative_price', '', COUNT(*),
        |  CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT),
        |  SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) = 0 FROM lineitem""".stripMargin,
    "audit_log" ->
      """WITH t AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |u AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
        |SELECT
        |  CAST(SUM(CASE WHEN t.custkey IS NOT NULL AND u.custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS num_matched,
        |  CAST(SUM(CASE WHEN t.custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS num_inserted,
        |  CAST(SUM(CASE WHEN u.custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS num_untouched
        |FROM t FULL OUTER JOIN u ON t.custkey = u.custkey""".stripMargin)
    // ingest_metadata: rows-only (absolute file paths + mtimes are
    // environment-dependent) — intentionally omitted from oracleSql.
}
