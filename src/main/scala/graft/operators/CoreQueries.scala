package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators over the TPC-H-ish tables.
  *
  * Oracle-parity rules (SURVEY.md §6): money math runs in
  * DECIMAL(18,2) (exact, associative — immune to parallel summation
  * order) and final aggregates are cast to DOUBLE, which is
  * bit-identical between Spark and DuckDB. Every window/top-K has a
  * deterministic tiebreak.
  */
object CoreQueries {

  /** Cast a raw double money/measure column to exact decimal. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def one: Column = lit(1).cast(DecimalType(18, 2))

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** #1 Group-by aggregation (TPC-H Q1 shape): partial aggregation
    * (map-side combine) makes this a single shuffle of one row per
    * (flag, status) per partition — scales linearly to any SF.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
          * (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** #2 Filter + projection; both reach the parquet scan
    * (PushedFilters + 4-column ReadSchema — asserted in PlanSpec).
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_shipdate").cast("date").as("ship_date"))

  /** #3 Multi-way join + agg. customer is a fact-scale table (15M
    * rows at sf100) so it carries NO broadcast hint — AQE picks
    * broadcast when the runtime size is under the threshold and falls
    * back to shuffle join at scale. orders⨝lineitem shuffles on the
    * join key (at 100 TB this is the bucketed-join candidate).
    *
    * Lineitem is PRE-AGGREGATED per orderkey below the join —
    * aggregation pushdown Catalyst doesn't do on its own. Decimal
    * money sums are exact and associative, so regrouping cannot
    * change the answer (the DuckDB oracle proves it); the join then
    * carries one row per order instead of ~4 lineitems, the
    * orderkey hash partitioning from the groupBy is reused by the
    * join exchange, and n_orders becomes a plain count — the 3x
    * countDistinct expand disappears.
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val liAgg = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .as("order_rev"))
    liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
      .groupBy(col("c_mktsegment"))
      .agg(
        // one pre-agg row per order -> count == count distinct
        count(col("o_orderkey")).as("n_orders"),
        sum(col("order_rev")).cast("double").as("revenue"))
  }

  /** #4 Broadcast dimension join chain (no shuffle for the dims). */
  def q4BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    s.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(dec(col("s_acctbal"))).cast("double").as("total_acctbal"))
  }

  /** #5 Top-N per key via row_number with deterministic tiebreak. */
  def q5WindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** #6 Distinct / count-distinct (expand-based multi-distinct). */
  def q6Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      count(lit(1)).as("n_rows"))

  /** #6b Sketch companion to q6: HLL++ approx distinct counts. At
    * 100 TB the exact 3-way countDistinct expands every row 3x before
    * the shuffle; the sketch version shuffles fixed-size registers
    * instead. relativeSD 0.02 (~6 KB per sketch): measured ≤1% error
    * on these key distributions, and the per-row register-buffer
    * update is ~6x cheaper than rsd=0.01's 24 KB buffer (HLL++ is an
    * ImperativeAggregate — the buffer write, not the hash, dominates).
    * Rows-only (DuckDB's HLL differs) but deterministic: register
    * merges are commutative.
    */
  def q6ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("n_parts_approx"),
      approx_count_distinct(col("l_suppkey"), 0.02).as("n_supps_approx"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("n_orders_approx"),
      count(lit(1)).as("n_rows"))

  /** #7 Semi/anti join: EXISTS / NOT EXISTS per market segment. */
  def q7SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_orders"))
    val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
  }

  /** #8 Conditional (pivot-style) aggregation over the event stream. */
  def q8ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    def cnt(tpe: String) = sum(when(col("event_type") === tpe, 1L).otherwise(0L))
    t(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(
        cnt("click").as("n_click"),
        cnt("view").as("n_view"),
        cnt("purchase").as("n_purchase"),
        cnt("signup").as("n_signup"),
        cnt("error").as("n_error"),
        sum(when(col("event_type") === "purchase", dec(col("value")))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("purchase_value"))
  }

  /** #9 ROLLUP hierarchical aggregation (region → nation → total). */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
  }

  /** #10 Global top-K with rank. `orderBy.limit` plans as
    * TakeOrderedAndProject (per-partition top-K + driver merge of K
    * rows) — no global shuffle; the rank window then runs over just
    * K rows, unlike a naive global row_number which would move the
    * whole table to one partition.
    */
  def q10TopKOrders(spark: SparkSession, dir: String): DataFrame = {
    val topK = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      .limit(20)
    // The rank window runs over exactly K=20 rows (post-limit), so a
    // single partition is the intent, not an accident — partition on
    // a constant to declare that (and keep WindowExec's
    // all-data-to-one-partition warning out of 100 TB job logs, where
    // it must stay a real alarm). pmod(key, 1) rather than lit(0):
    // a foldable key is optimized out, re-emptying the partition spec.
    val w = Window.partitionBy(pmod(col("o_orderkey"), lit(1)))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    topK.withColumn("rank", row_number().over(w))
  }

  /** #10d Count-of-counts distribution (TPC-H Q13 shape): how many
    * customers placed 0, 1, 2, … orders — the classic skew-profile
    * query. Scale shape: orders pre-aggregate to one row per
    * customer key BEFORE the join (map-side combine), so the left
    * join moves |customers| + |ordering customers| rows, never
    * |orders|; zero-order customers fall out of the left join's
    * nulls; the second aggregate lands on |distinct counts| groups.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("_n"))
    t(spark, dir, "customer").select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("_n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** #11c Exact per-group percentiles: the value at 1-based rank
    * ceil(q*n) of the sorted group — SQL-standard percentile_disc.
    * (Built-in continuous percentiles interpolate with
    * engine-specific float op order and are not bit-comparable;
    * discrete selection returns an actual data value, which is.)
    *
    * Computed over per-VALUE counts, not per-row ranks: groupBy
    * (group, value) first (partial agg, one shuffle of the distinct
    * values), then a running count over the distinct-value frame
    * picks the smallest value whose cumulative count reaches the
    * rank — identical values by definition. The low-cardinality
    * group key means a per-ROW rank window would sort the whole
    * table on |groups| tasks; the distinct-value frame is orders of
    * magnitude smaller at any scale. CARDINALITY BOUND: each group's
    * distinct-value set still sorts in one task (l_quantity: 50
    * gridded values — fine); a continuous near-unique column at
    * corpus scale needs the sketch shape instead —
    * [[q11ApproxPercentiles]] (GK) or
    * [[graft.dq.DataQuality.sketchPercentiles]] (KLL), both
    * partial-agg, no distinct-value shuffle.
    */
  def q11Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    // rank selection is the shared engine-exact block — ONE
    // implementation (DataQuality.discretePercentiles) serves this
    // query and the DQ outlier fences
    def pcts(sortCol: String, out: Seq[(String, Double)]): DataFrame =
      graft.dq.DataQuality.discretePercentiles(li, "l_returnflag",
        sortCol, out)
    pcts("l_quantity", Seq("median_qty" -> 0.5, "p95_qty" -> 0.95))
      .join(pcts("l_extendedprice",
        Seq("median_price" -> 0.5, "p95_price" -> 0.95)), Seq("l_returnflag"))
  }

  /** #10e Scalar-subquery max join-back (TPC-H Q15 shape): the
    * supplier(s) whose quarter revenue equals the global maximum.
    * Decorrelation shape: revenue aggregates ONCE per supplier
    * (map-side combine over the shipdate-pruned scan), the global max
    * folds that |suppliers|-sized frame to ONE row, and a broadcast
    * cross join + equality filter replaces the correlated
    * `WHERE total_rev = (SELECT max(...))` — at 100 TB the only
    * corpus-sized pass is the filtered lineitem scan. The equality
    * compares exact DECIMALs (never doubles), so ties are exact on
    * both engines; the output casts to double only after the filter.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .as("_rev"))
    // constant-key equi-join: the one-row scalar frame broadcasts as
    // a BroadcastHashJoin (a keyless cross join would plan BNLJ and
    // trip the blanket all-pairs alarm PlanSpec keeps strict).
    // pmod(col, 1) rather than lit(1): a foldable key is optimized
    // out and the join degenerates back to BNLJ (the q10 lesson).
    val mx = rev.agg(max(col("_rev")).as("_mx"))
      .withColumn("_k", pmod(col("_mx") * lit(0), lit(1)).cast("int"))
    rev.withColumn("_k", pmod(col("l_suppkey"), lit(1)).cast("int"))
      .join(broadcast(mx), Seq("_k")).filter(col("_rev") === col("_mx"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("_rev").cast("double").as("total_rev"))
  }

  /** #10f Correlated-aggregate decorrelation (TPC-H Q17 shape):
    * revenue lost to small-quantity lines — lineitems of a narrow
    * part family whose quantity is under 20% of that part's average
    * line quantity. The textbook form runs a correlated
    * `(SELECT 0.2*avg(l_quantity) WHERE l_partkey = outer)` per row;
    * here the per-part aggregate computes ONCE (partial agg on the
    * partkey shuffle) and joins back. The threshold comparison
    * cross-multiplies to stay in exact integers/decimals —
    * `qty * 5 * n < sum_qty` instead of `qty < 0.2 * (sum/n)` — so
    * no float division participates in row selection on either
    * engine; `/ 7.0` happens once on the final exact decimal.
    */
  def q17SmallQtyRev(spark: SparkSession, dir: String): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_brand") === "Brand#23" && col("p_size") <= 25)
      .select(col("p_partkey"))
    val li = t(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("_pk"))
      .agg(sum(dec(col("l_quantity"))).as("_sum_qty"),
        count(lit(1)).as("_n"))
    li.join(perPart, col("l_partkey") === col("_pk"))
      .filter(dec(col("l_quantity")) * lit(5) * col("_n") < col("_sum_qty"))
      .agg(count(lit(1)).as("n_small"),
        (sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"))
  }

  /** #10g Correlated-threshold semi-join (TPC-H Q20 shape): suppliers
    * who moved more than a threshold quantity of some single part in
    * 1995. The correlated `EXISTS (SELECT .. HAVING sum(qty) > T)`
    * decorrelates to: pre-aggregate lineitem per (suppkey, partkey)
    * — partial agg folds the corpus to the supplier×part key space
    * before the shuffle — filter the threshold, project distinct
    * suppkeys (already grouped, no second shuffle), LEFT SEMI join
    * supplier. The semi join moves only the qualifying key set.
    */
  def q20HeavyParts(spark: SparkSession, dir: String): DataFrame = {
    val heavy = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("_q"))
      .filter(col("_q") > lit(50).cast(DecimalType(18, 2)))
      .select(col("l_suppkey"))
    t(spark, dir, "supplier")
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  /** #10h EXISTS / NOT-EXISTS profile decorrelation (TPC-H Q21
    * shape): per supplier, the number of multi-supplier orders where
    * that supplier was the UNIQUE last shipper. The textbook form is
    * one EXISTS (another supplier in the order) plus two NOT EXISTS
    * (no later line; no other supplier sharing the final date) — all
    * correlated on the outer row; the oracle states exactly that
    * form, and the hash match proves this decorrelation: fold
    * lineitem to one row per (order, supplier) with its max shipdate,
    * then ONE exchange on orderkey computes the order max date,
    * supplier count, and at-max supplier count as three chained
    * windows, and a codegen filter picks the unique laggards. At
    * 100 TB there are two narrow shuffles (key+date rows), no
    * correlated re-scans.
    */
  def q21LastShipper(spark: SparkSession, dir: String): DataFrame = {
    val sm = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("_smx"))
    val w = Window.partitionBy(col("l_orderkey"))
    val qualified = sm
      .withColumn("_mx", max(col("_smx")).over(w))
      .withColumn("_ns", count(lit(1)).over(w))
      .withColumn("_natmax",
        sum(when(col("_smx") === col("_mx"), 1L).otherwise(0L)).over(w))
      .filter(col("_smx") === col("_mx") && col("_ns") > 1 &&
        col("_natmax") === 1L)
    qualified.groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  /** #10j HAVING-subquery join-back (TPC-H Q18 shape): orders whose
    * total line quantity crosses a threshold, with their customers.
    * The textbook `o_orderkey IN (SELECT .. HAVING sum > T)` plus a
    * correlated scalar for the quantity column collapses to ONE
    * per-order aggregate that serves both the membership test (the
    * filter) and the output column — the aggregate's orderkey hash
    * partitioning feeds the orders join exchange directly, and the
    * HAVING filter cuts the frame to the qualifying keys before
    * anything joins. Threshold compare is exact decimal.
    */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val qty = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("_q"))
      .filter(col("_q") > lit(250).cast(DecimalType(18, 2)))
    qty.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("_q").cast("double").as("total_qty"))
  }

  /** #10k Conditional revenue share (TPC-H Q14 shape): the fraction
    * of one month's revenue from promo-type parts. lineitem prunes to
    * the month at the scan, pre-projects the two needed columns, and
    * joins part WITHOUT a broadcast hint (part is dimension-shaped
    * here but fact-scale at sf100 — the q3 rule: AQE decides). The
    * conditional and total sums fold in ONE aggregate; the share is
    * two IEEE ops on the exact decimal totals.
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .select(col("l_partkey"), (dec(col("l_extendedprice")) *
        (one - dec(col("l_discount")))).as("_rev"))
    li.join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("_rev"))
          .otherwise(lit(0).cast(DecimalType(38, 4)))).as("_promo"),
        sum(col("_rev")).as("_total"))
      .select(col("_promo").cast("double").as("promo_rev"),
        col("_total").cast("double").as("total_rev"),
        ((lit(100.0) * col("_promo").cast("double")) /
          col("_total").cast("double")).as("promo_share"))
  }

  /** #10l NOT-IN exclusion + grouped distinct (TPC-H Q16 shape):
    * supplier variety per part profile, excluding blacklisted
    * suppliers. The `NOT IN (SELECT ..)` exclusion is a LEFT ANTI
    * join against the (tiny, pre-filtered) blacklist — the oracle
    * states the subquery form; note NOT IN is only anti-join-equal
    * because the blacklist key is non-null by construction. The
    * part-supplier bridge pre-DISTINCTs (l_partkey, l_suppkey) so
    * the attribute join and the final per-profile distinct count
    * work on the collapsed pair set, not raw lineitems.
    */
  def q16PartSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val blacklist = t(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val bridge = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(blacklist), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    val parts = t(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#23" && col("p_type") =!= "PROMO")
    bridge.join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** #10m Disjunctive join predicate (TPC-H Q19 shape): revenue from
    * three OR'd (brand, size-range, quantity-range) profiles. The
    * disjunction references BOTH sides, so it cannot become a join
    * key — it rides the equi-join on partkey as a codegen residual;
    * what CAN push down does: Catalyst factors the common
    * `l_quantity <= 30` / `p_size <= 50` style bounds toward the
    * scans while the OR stays post-join. One aggregate, exact
    * decimals.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part")
    def profile(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(profile("Brand#12", 1, 15, 1, 11) ||
        profile("Brand#23", 16, 30, 10, 20) ||
        profile("Brand#34", 31, 50, 20, 30))
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
  }

  /** #10i Global-scalar anti-join (TPC-H Q22 shape): high-balance
    * customers dormant since the cutoff, rolled up per nation. The
    * scalar subquery (global positive-balance average) folds to ONE
    * broadcast row; the above-average test cross-multiplies
    * `acctbal * n > sum` so the average is never materialized as a
    * float on either engine; dormancy is a LEFT ANTI join against
    * the date-pruned orders keys (the anti side carries only
    * custkeys). Every corpus pass is a pruned scan; nothing
    * correlated re-executes.
    */
  def q22DormantValue(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    // constant-key scalar join — see q15TopSupplier's note on BNLJ
    val stats = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("_s"), count(lit(1)).as("_n"))
      .withColumn("_k", pmod(col("_n"), lit(1)).cast("int"))
    val recent = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.withColumn("_k", pmod(col("c_custkey"), lit(1)).cast("int"))
      .join(broadcast(stats), Seq("_k"))
      .filter(dec(col("c_acctbal")) * col("_n") > col("_s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_dormant"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
  }

  /** #10n Correlated min-per-group scalar (TPC-H Q2 shape): for each
    * sized part, the EUROPE supplier(s) whose offer price equals that
    * part's regional minimum — the last classic
    * correlated-scalar-per-group shape in the family. The reference
    * schema's bridge is partsupp; this corpus derives it from
    * lineitem (cost(part, supp) = min(l_extendedprice), one
    * exact-decimal groupBy fold). The textbook correlated
    * `cost = (SELECT min(cost) .. WHERE partkey = outer AND region)`
    * decorrelates to ONE window min over the region-filtered bridge
    * — the partkey exchange serves both the min and the at-min
    * filter, no join-back — with the supplier⨝nation⨝region
    * dimension chain broadcast and the size-filtered part join last
    * (smallest frame). Exact-decimal equality picks ties on both
    * engines.
    */
  def q2MinCostSupp(spark: SparkSession, dir: String): DataFrame = {
    val eur = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val bridge = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec(col("l_extendedprice"))).as("_cost"))
    val w = Window.partitionBy(col("l_partkey"))
    bridge.join(eur, col("l_suppkey") === col("s_suppkey"))
      .withColumn("_mn", min(col("_cost")).over(w))
      .filter(col("_cost") === col("_mn"))
      // part is dimension-shaped here but fact-scale at sf100 — the
      // q3/q14 rule: no broadcast hint, AQE decides
      .join(t(spark, dir, "part").filter(col("p_size") === 15),
        col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("p_type"),
        col("_cost").cast("double").as("supply_cost"))
  }

  /** #10o Returned-item revenue top-K (TPC-H Q10 shape): the 20
    * customers losing the most revenue to returns in a quarter.
    * Scale shape: revenue aggregates per CUSTKEY first — the
    * returnflag-pruned lineitem⨝quarter-pruned orders join collapses
    * to |returning customers| rows BEFORE any wide attribute joins —
    * then customer attaches on the aggregate, nation broadcasts, and
    * the top-20 plans as TakeOrderedAndProject (never a global
    * sort). Ordering compares the EXACT decimal revenue with a
    * custkey tiebreak, so the kept 20 are engine-stable; the output
    * casts to double after selection.
    */
  def q10ReturnedItem(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .as("_r"))
      .join(t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("_r")).as("_rev"))
    rev.join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("_rev").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"), col("_rev").cast("double").as("revenue"))
  }

  /** #10p Order-priority class counts (TPC-H Q12 shape): per line
    * class, how many shipped lines belong to urgent-priority orders
    * vs the rest. The reference's shipmode column is absent from
    * this corpus, so the class is l_returnflag — the SHAPE (fact⨝
    * fact join + CASE-bucketed counts onto a tiny group frame) is
    * what the row exercises. Scale shape: lineitem pre-aggregates to
    * (orderkey, class, n) counts BEFORE the orders join — the ~4:1
    * line-per-order fold happens map-side, the orderkey shuffle
    * moves counted keys, and the CASE sums land on |classes| rows.
    */
  def q12PriorityClass(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("l_returnflag"))
      .agg(count(lit(1)).as("_n"))
    val urgent = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    perOrder
      .join(t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(urgent, col("_n")).otherwise(0L)).as("high_line_count"),
        sum(when(!urgent, col("_n")).otherwise(0L)).as("low_line_count"))
  }

  /** #10q Region-local supplier volume (TPC-H Q5 shape): revenue by
    * nation for a year's orders where customer and supplier sit in
    * the SAME nation of one region — the classic 6-way star join
    * with a cross-dimension correlation (c_nationkey = s_nationkey)
    * that cannot fold into any single equi-join. Scale shape: orders
    * prune to the year at the scan; the two fact joins
    * (orders⨝customer on custkey, ⨝lineitem on orderkey) shuffle
    * narrow projections; supplier attaches on suppkey with the
    * nation correlation as a residual (dimension-shaped — the q3
    * rule, AQE decides broadcast); the region-filtered nation list
    * broadcasts. One aggregate onto |nations| rows, exact decimals.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .as("_rev")),
        col("o_orderkey") === col("l_orderkey"))
      .join(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("_rev")).cast("double").as("revenue"))
  }

  /** #10r Bilateral shipping volume (TPC-H Q7 shape): revenue
    * between two trading nations per direction per year. The
    * disjunctive nation-pair predicate references BOTH dimension
    * chains, so (like q19's) it rides as a post-join residual; both
    * nation lookups broadcast, the year projects with EXTRACT once,
    * and the aggregate lands on 2 directions × |years| rows.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nat = t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .as("_rev"))
    li.join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("_snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("_snk"))
      .join(broadcast(nat.select(col("n_nationkey").as("_cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("_cnk"))
      .filter((col("supp_nation") === "NATION_18" &&
        col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" &&
          col("cust_nation") === "NATION_18"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        expr("EXTRACT(YEAR FROM l_shipdate)").cast("long").as("l_year"))
      .agg(sum(col("_rev")).cast("double").as("revenue"))
  }

  /** #10s National market share (TPC-H Q8 shape): one nation's
    * suppliers' share of a region's market for a part family, per
    * order year. The share is a conditional-over-total ratio INSIDE
    * each year group — the same exact-decimal-sums-then-one-division
    * discipline as q14 — and the nation name needed only for the
    * CASE rides the broadcast supplier-nation join. The part family
    * filter broadcasts against lineitem FIRST (the most selective
    * cut), then orders/customer/region constrain the market.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_type") === "STANDARD").select(col("p_partkey"))
    val marketCust = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(t(spark, dir, "nation")
        .join(broadcast(t(spark, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNat = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    t(spark, dir, "lineitem")
      // the family filter keeps ~1/6 of part — fact-scale at sf100,
      // so no broadcast hint (the q3/q14 rule: AQE decides)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .as("_rev"))
      .join(t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(marketCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppNat, col("l_suppkey") === col("s_suppkey"))
      .groupBy(expr("EXTRACT(YEAR FROM o_orderdate)").cast("long")
        .as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", col("_rev"))
          .otherwise(lit(0).cast(DecimalType(38, 4)))).as("_nat"),
        sum(col("_rev")).as("_total"))
      .select(col("o_year"),
        col("_nat").cast("double").as("nation_rev"),
        col("_total").cast("double").as("total_rev"),
        (col("_nat").cast("double") / col("_total").cast("double"))
          .as("mkt_share"))
  }

  /** #10t Priority EXISTS profile (TPC-H Q4 shape): orders of a
    * quarter with at least one LATE line (shipped > 60 days after
    * the order), counted per priority. The textbook correlated
    * `EXISTS (SELECT .. WHERE l_orderkey = o_orderkey AND late)`
    * decorrelates to ONE left-semi join whose condition carries the
    * equi-key plus the cross-table lateness residual — the semi join
    * moves only (orderkey, shipdate) and stops at the first match
    * per order, and the count lands on |priorities| rows.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    o.join(t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** #10u Forecast revenue scan (TPC-H Q6 shape): one filtered scan,
    * one aggregate, ZERO joins — the query exists to prove the
    * predicate set (year range + discount band + quantity cap)
    * reaches the parquet reader as PushedFilters and the revenue
    * folds map-side in exact decimals. The whole plan is scan →
    * partial agg → single-row exchange.
    */
  def q6RevenueForecast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 10)
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"))

  /** #10v Product-line profit (TPC-H Q9 shape): per (supplier
    * nation, order year), revenue minus cost for one part family.
    * The reference costs from partsupp; this corpus prices cost as
    * `p_retailprice · l_quantity` (the same join topology — part is
    * the cost carrier). Scale shape: the name-filtered part list
    * broadcasts against lineitem FIRST, profit is computed per line
    * in exact decimals BEFORE any further join, orders attaches only
    * (orderkey, orderdate), supplier's nation broadcasts, and the
    * aggregate lands on |nations|×|years| rows.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"), col("p_retailprice"))
    t(spark, dir, "lineitem")
      // name-filtered part is ~1/6 of the table — fact-scale at
      // sf100, no broadcast hint (AQE decides)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) -
          dec(col("p_retailprice")) * dec(col("l_quantity"))).as("_profit"))
      .join(t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        expr("EXTRACT(YEAR FROM o_orderdate)").cast("long").as("o_year"))
      .agg(sum(col("_profit")).cast("double").as("profit"))
  }

  /** #10w Important-stock HAVING-vs-global-scalar (TPC-H Q11 shape):
    * parts whose traded value through one nation's suppliers exceeds
    * a fraction of that nation's total. The correlated
    * `HAVING sum(v) > (SELECT sum(v) * 0.0001 FROM same)` folds the
    * global total to ONE broadcast row (the q22 constant-key
    * pattern) and the fraction test cross-multiplies —
    * `value · 10000 > total` — so the comparison stays in exact
    * decimals on both engines; the per-part aggregate is one
    * partial-agg shuffle of the nation-filtered lines.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
        .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val lines = t(spark, dir, "lineitem")
      // the key list is supplier/|nations| — fact-scale growth, so
      // the semi join carries no broadcast hint (AQE decides)
      .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("l_partkey"), dec(col("l_extendedprice")).as("_v"))
    val vals = lines.groupBy(col("l_partkey")).agg(sum(col("_v")).as("_pv"))
    val total = vals.agg(sum(col("_pv")).as("_t"))
      .withColumn("_k", pmod(col("_t") * lit(0), lit(1)).cast("int"))
    vals.withColumn("_k", pmod(col("l_partkey"), lit(1)).cast("int"))
      .join(broadcast(total), Seq("_k"))
      .filter(col("_pv") * lit(10000) > col("_t"))
      .select(col("l_partkey"), col("_pv").cast("double").as("part_value"))
  }

  /** Sketch companion of #11c (the q6_approx pattern): single-pass
    * Greenwald-Khanna quantile summaries via `percentile_approx` —
    * one partial-aggregable sketch per group instead of the
    * distinct-value window, the right trade when an error bound is
    * acceptable at 100 TB. Engine-specific sketch (not oracle-able,
    * rows-only driver check); the error bound vs the exact operator
    * is asserted in CoreQueriesSpec.
    */
  def q11ApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").groupBy(col("l_returnflag")).agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
        .as("median_qty_approx"),
      percentile_approx(col("l_quantity"), lit(0.95), lit(10000))
        .as("p95_qty_approx"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("median_price_approx"),
      percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
        .as("p95_price_approx"))

  /** queries-map fragment for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_broadcast_join" -> (q4BroadcastJoin _),
    "q5_window_topn" -> (q5WindowTopN _),
    "q6_distinct" -> (q6Distinct _),
    "q6_approx_distinct" -> (q6ApproxDistinct _),
    "q7_semi_anti" -> (q7SemiAnti _),
    "q8_conditional_agg" -> (q8ConditionalAgg _),
    "q9_rollup" -> (q9Rollup _),
    "q10_topk_orders" -> (q10TopKOrders _),
    "q11_percentiles" -> (q11Percentiles _),
    "q11_approx_percentiles" -> (q11ApproxPercentiles _),
    "q13_custdist" -> (q13CustDist _),
    "q14_promo_share" -> (q14PromoShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_part_suppliers" -> (q16PartSuppliers _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q17_small_qty_rev" -> (q17SmallQtyRev _),
    "q18_big_orders" -> (q18BigOrders _),
    "q20_heavy_parts" -> (q20HeavyParts _),
    "q21_last_shipper" -> (q21LastShipper _),
    "q22_dormant_value" -> (q22DormantValue _),
    "q2_min_cost_supp" -> (q2MinCostSupp _),
    "q10_returned_item" -> (q10ReturnedItem _),
    "q12_priority_class" -> (q12PriorityClass _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q6_revenue_forecast" -> (q6RevenueForecast _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_stock" -> (q11ImportantStock _))

  /** DuckDB-parity oracle SQL (same aliases, same decimal math).
    * The q15/q17/q20/q21/q22 oracles deliberately state the TEXTBOOK
    * correlated-subquery forms — the hash match proves the Spark
    * side's decorrelated plans compute the same relation.
    */
  val oracleSql: Map[String, String] = Map(
    // TEXTBOOK correlated scalar-min form (TPC-H Q2), bridge derived
    // from lineitem; runnable by BOTH DuckDB and Spark SQL — the
    // in-engine equivalence spec replays it through spark.sql
    "q2_min_cost_supp" ->
      """WITH bridge AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, p_type,
        |  CAST(ps.cost AS DOUBLE) AS supply_cost
        |FROM part, supplier s, bridge ps, nation n, region r
        |WHERE p_partkey = ps.partkey AND s_suppkey = ps.suppkey
        |  AND p_size = 15
        |  AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps.cost = (
        |    SELECT MIN(ps2.cost)
        |    FROM bridge ps2, supplier s2, nation n2, region r2
        |    WHERE ps2.partkey = p_partkey
        |      AND s2.s_suppkey = ps2.suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')""".stripMargin,
    // TEXTBOOK correlated EXISTS form (TPC-H Q4) — the hash match
    // proves the semi-join decorrelation; dialect-common, replayed
    // in-Spark by the equivalence spec
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 10""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
        |FROM lineitem, part, orders, supplier, nation
        |WHERE l_partkey = p_partkey AND p_name LIKE '%widget%'
        |  AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)""".stripMargin,
    // TEXTBOOK correlated global-scalar HAVING (TPC-H Q11), stated
    // with the cross-multiplied exact-decimal fraction test
    "q11_important_stock" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 > (
        |  SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_3')""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
        |GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)""".stripMargin,
    // conditional-over-total inside each year group: exact decimal
    // sums, one IEEE division (the q14 discipline)
    "q8_market_share" ->
      """WITH m AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        |    SUM(CASE WHEN n2.n_name = 'NATION_2'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(38,4)) END) AS nat,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total
        |  FROM lineitem, part, orders, customer, nation n1, region, supplier, nation n2
        |  WHERE l_partkey = p_partkey AND p_type = 'STANDARD'
        |    AND l_orderkey = o_orderkey
        |    AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND r_name = 'ASIA'
        |    AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY EXTRACT(YEAR FROM o_orderdate))
        |SELECT o_year, CAST(nat AS DOUBLE) AS nation_rev,
        |  CAST(total AS DOUBLE) AS total_rev,
        |  CAST(nat AS DOUBLE) / CAST(total AS DOUBLE) AS mkt_share
        |FROM m""".stripMargin,
    // top-20 kept by EXACT decimal revenue + custkey tiebreak, cast
    // to double only after selection
    "q10_returned_item" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(r AS DOUBLE) AS revenue
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY r DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q12_priority_class" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |    OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
        |    AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,
    "q14_promo_share" ->
      """WITH m AS (
        |  SELECT
        |    SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(38,4)) END) AS promo,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01')
        |SELECT CAST(promo AS DOUBLE) AS promo_rev,
        |  CAST(total AS DOUBLE) AS total_rev,
        |  (100.0 * CAST(promo AS DOUBLE)) / CAST(total AS DOUBLE) AS promo_share
        |FROM m""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_rev
        |FROM supplier JOIN rev ON l_suppkey = s_suppkey
        |WHERE r = (SELECT MAX(r) FROM rev)""".stripMargin,
    "q17_small_qty_rev" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem l1
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23' AND p_size <= 25
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5
        |      * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |    < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l3 WHERE l3.l_partkey = l1.l_partkey)""".stripMargin,
    "q16_part_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q19_disjunctive" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 31 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q18_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |        FROM lineitem WHERE l_orderkey = o_orderkey) AS DOUBLE) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(250 AS DECIMAL(18,2)))""".stripMargin,
    "q20_heavy_parts" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey
        |    AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(50 AS DECIMAL(18,2)))""".stripMargin,
    "q21_last_shipper" ->
      """WITH laggard AS (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1
        |  WHERE EXISTS (
        |      SELECT 1 FROM lineitem l2
        |      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (
        |      SELECT 1 FROM lineitem l3
        |      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_shipdate > l1.l_shipdate)
        |    AND NOT EXISTS (
        |      SELECT 1 FROM lineitem l4
        |      WHERE l4.l_orderkey = l1.l_orderkey AND l4.l_suppkey <> l1.l_suppkey
        |        AND l4.l_shipdate = l1.l_shipdate))
        |SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier JOIN laggard ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name""".stripMargin,
    "q22_dormant_value" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_dormant,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |WHERE CAST(c_acctbal AS DECIMAL(18,2))
        |      * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
        |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_nationkey""".stripMargin,
    "q13_custdist" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY o_custkey),
        |cc AS (
        |  SELECT COALESCE(per.n, 0) AS c_count
        |  FROM customer LEFT JOIN per ON c_custkey = o_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM cc GROUP BY c_count""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_quantity > 45""".stripMargin,
    "q3_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY c_mktsegment""".stripMargin,
    "q4_broadcast_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q5_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q6_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  COUNT(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q7_semi_anti" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
        |  CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS without_orders
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q8_conditional_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
        |FROM events
        |GROUP BY CAST(date_trunc('day', ts) AS DATE)""".stripMargin,
    "q9_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q10_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(rank AS INT) AS rank
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey DESC) AS rank
        |  FROM orders) WHERE rank <= 20""".stripMargin,
    "q11_percentiles" -> {
      def pcts(c: String, med: String, p95: String) =
        s"""SELECT l_returnflag,
           |    MAX(CASE WHEN rn = CEIL(n * 0.5) THEN $c END) AS $med,
           |    MAX(CASE WHEN rn = CEIL(n * 0.95) THEN $c END) AS $p95
           |  FROM (
           |    SELECT l_returnflag, $c,
           |      ROW_NUMBER() OVER (PARTITION BY l_returnflag
           |        ORDER BY $c ASC, l_orderkey ASC, l_linenumber ASC) AS rn,
           |      COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           |    FROM lineitem)
           |  WHERE rn = CEIL(n * 0.5) OR rn = CEIL(n * 0.95)
           |  GROUP BY l_returnflag""".stripMargin
      s"""WITH qa AS (
         |  ${pcts("l_quantity", "median_qty", "p95_qty")}),
         |pa AS (
         |  ${pcts("l_extendedprice", "median_price", "p95_price")})
         |SELECT qa.l_returnflag, median_qty, p95_qty, median_price, p95_price
         |FROM qa JOIN pa ON pa.l_returnflag = qa.l_returnflag""".stripMargin
    })
}
