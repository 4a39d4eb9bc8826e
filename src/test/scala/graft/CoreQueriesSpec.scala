package graft

import org.apache.spark.sql.functions._

class CoreQueriesSpec extends SparkSpec {

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("decorrelated plans equal their textbook correlated forms, Spark-executed") {
    // The q15/q17/q20/q21/q22 oracles state the correlated-subquery
    // textbook shapes in ANSI SQL. Running that SAME SQL through
    // Spark's own analyzer (which supports correlated EXISTS / scalar
    // subqueries) and comparing to the hand-decorrelated DataFrame
    // plans proves the rewrite within one engine — no cross-engine
    // float question can hide a semantic difference here.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { tname =>
      Tables.load(spark, sf, tname).createOrReplaceTempView(tname)
    }
    Seq("q2_min_cost_supp", "q4_order_priority", "q5_local_supplier",
      "q6_revenue_forecast", "q7_volume_shipping", "q8_market_share",
      "q9_product_profit", "q10_returned_item", "q11_important_stock",
      "q12_priority_class",
      "q15_top_supplier", "q16_part_suppliers", "q17_small_qty_rev",
      "q18_big_orders", "q19_disjunctive", "q20_heavy_parts",
      "q21_last_shipper", "q22_dormant_value").foreach { q =>
      val decorr = SparkEntry.queries(q)(spark, sf)
      val correlated = spark.sql(SparkEntry.oracleSql(q))
      val cols = decorr.columns.sorted.map(col(_))
      val a = decorr.select(cols: _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = correlated.select(cols: _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.length == b.length, s"$q: ${a.length} vs ${b.length} rows")
      a.zip(b).foreach { case (ra, rb) => assert(ra == rb, s"$q row diff: $ra vs $rb") }
    }
  }

  test("every query has matching oracle column names (sorted)") {
    // oracle SQL aliases must match Spark output columns exactly
    SparkEntry.oracleSql.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"oracleSql for unknown query $name")
    }
  }

  test("q1 aggregates are exact-decimal derived") {
    val row = SparkEntry.queries("q1_agg")(spark, sf)
      .filter(col("l_returnflag") === "A" || col("l_returnflag") === "N")
      .agg(sum("count_order")).collect()(0)
    assert(row.getLong(0) > 0)
  }

  test("q5 window top-n keeps at most 3 rows per customer") {
    val mx = SparkEntry.queries("q5_window_topn")(spark, sf)
      .groupBy("o_custkey").count().agg(max("count")).collect()(0).getLong(0)
    assert(mx <= 3)
  }

  test("q10 returns exactly 20 ranked orders") {
    val df = SparkEntry.queries("q10_topk_orders")(spark, sf)
    assert(df.count() == 20)
    assert(df.agg(max("rank")).collect()(0).getInt(0) == 20)
  }

  test("q6 approx distinct is within 5% of exact") {
    val exact = SparkEntry.queries("q6_distinct")(spark, sf).collect()(0)
    val approx = SparkEntry.queries("q6_approx_distinct")(spark, sf).collect()(0)
    (0 until 3).foreach { i =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) / e < 0.05, s"col $i: approx $a vs exact $e")
    }
  }

  test("q11 approx percentiles stay within 5% of the exact operator") {
    val exact = SparkEntry.queries("q11_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val approx = SparkEntry.queries("q11_approx_percentiles")(spark, sf)
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      (0 until 4).foreach { i =>
        val a = r.getDouble(i + 1)
        assert(math.abs(a - e(i)) / e(i) < 0.05,
          s"${r.getString(0)} col $i: approx $a vs exact ${e(i)}")
      }
    }
  }

  test("q11 rank-selection percentiles match a hand computation") {
    val got = SparkEntry.queries("q11_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val byFlag = Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byFlag.foreach { case (flag, vs) =>
      val (med, p95) = got(flag)
      assert(med == vs(math.ceil(vs.length * 0.5).toInt - 1),
        s"median for $flag")
      assert(p95 == vs(math.ceil(vs.length * 0.95).toInt - 1),
        s"p95 for $flag")
    }
  }

  test("q7 semi+anti counts partition the customer set") {
    val c = Tables.load(spark, sf, "customer").count()
    val df = SparkEntry.queries("q7_semi_anti")(spark, sf)
    val tot = df.agg(sum(col("with_orders") + col("without_orders"))).collect()(0).getLong(0)
    assert(tot == c)
  }

  test("correlation matrix hits the closed-form endpoints and tracks built-in corr") {
    import SparkSpec.spark.implicits._
    // y = 2x + 1 -> r = 1; z = -x -> r = -1. The closed form lands a
    // few ULPs off ±1 (sqrt(a)*sqrt(b) != sqrt(ab) in floats) — the
    // operator's guarantee is cross-ENGINE bit-identity of that
    // float path (the oracle proves it), not symbolic exactness
    val lin = Seq((1.0, 3.0, -1.0), (2.0, 5.0, -2.0), (3.0, 7.0, -3.0),
      (4.0, 9.0, -4.0)).toDF("x", "y", "z")
    val r = graft.dq.DataQuality.correlationMatrix(lin,
      Seq("x" -> "y", "x" -> "z")).orderBy("col_y").collect()
      .map(row => (row.getString(0), row.getString(1), row.getDouble(3))).toSeq
    assert(r.map(_._1) == Seq("x", "x") && r.map(_._2) == Seq("y", "z"))
    assert(math.abs(r(0)._3 - 1.0) < 1e-12 && math.abs(r(1)._3 + 1.0) < 1e-12,
      r.toString)
    // against Spark's own streaming corr on real data: the two
    // algorithms differ in float path but must agree to ~1e-9
    val li = Tables.load(spark, sf, "lineitem")
    val exact = graft.dq.DataQuality.correlationMatrix(li,
      Seq("l_quantity" -> "l_extendedprice")).collect()(0).getDouble(3)
    val builtin = li.agg(corr(col("l_quantity"), col("l_extendedprice")))
      .collect()(0).getDouble(0)
    assert(math.abs(exact - builtin) < 1e-9, s"$exact vs $builtin")
  }

  test("functional dependencies: exact FD, violated FD, strength ratio") {
    import SparkSpec.spark.implicits._
    // k -> v holds (k unique); v -> w fails on v=1 mapping to {x,y}
    val t = Seq((1, 1, "x"), (2, 1, "y"), (3, 2, "x")).toDF("k", "v", "w")
    val out = graft.dq.DataQuality.functionalDependencies(t,
      Seq("k" -> "v", "v" -> "w")).orderBy("determinant").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getDouble(5))).toSeq
    assert(out == Seq(
      ("k", 3L, 3L, true, 1.0),
      ("v", 2L, 3L, false, 2.0 / 3)), out.toString)
  }

  test("benford profile buckets by first significant digit") {
    import SparkSpec.spark.implicits._
    // 1.5, 19.0, 0.00123 -> '1'; 250.0, 2.3 -> '2'; fractional and
    // beyond-long values take their SIGNIFICANT digit (0.5 -> '5',
    // 9.3e18 > Long.MaxValue -> '9', 4.9e-324 subnormal -> '4');
    // 0 and negatives excluded
    val t = Seq(1.5, 19.0, 250.0, 2.3, 0.0, -77.0,
      0.00123, 0.5, 9.3e18, 4.9e-324).toDF("v")
    val out = graft.dq.DataQuality.benfordProfile(t, "v")
      .orderBy("digit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(("1", 3L, 3.0 / 8), ("2", 2L, 2.0 / 8),
      ("4", 1L, 1.0 / 8), ("5", 1L, 1.0 / 8), ("9", 1L, 1.0 / 8)),
      out.toString)
  }

  test("chi-square cells cover the full grid with exact marginals and the planted statistic") {
    import SparkSpec.spark.implicits._
    // planted 2x2 (+ a level with a structurally-missing cell):
    // x/p=30 x/q=10 y/p=10 y/q=30 -> e=20 everywhere, chi2 = 4*5 = 20
    // z appears only with p -> the (z,q) cell is emitted with
    // observed 0 and a real expected count
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q")) ++
      Seq.fill(8)(("z", "p")) ++ Seq(("w", null.asInstanceOf[String]))
    val out = graft.dq.DataQuality
      .chiSquareCells(rows.toDF("a", "b"), "a", "b")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(out.size == 6, s"3 levels x 2 levels = 6 cells: ${out.keys}")
    // null categories are excluded entirely (no 'w' row, no null col)
    assert(!out.keys.exists(k => k._1 == "w" || k._2 == null))
    val n = 88.0
    def cell(o: Long, ra: Long, cb: Long): (Long, Long, Long, Double, Double) = {
      val e = (ra * cb).toDouble / n
      val d = o.toDouble - e
      (o, ra, cb, e, d * d / e)
    }
    assert(out(("x", "p")) == cell(30, 40, 48))
    assert(out(("z", "q")) == cell(0, 8, 40), "missing cell must appear")
    // the summed statistic over the 2x2 sub-table is the textbook 20
    val sub = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
    val chi2of2x2 = {
      // recompute on the x/y-only table for the closed-form check
      val o2 = graft.dq.DataQuality.chiSquareCells(
        rows.filter(r => r._1 == "x" || r._1 == "y").toDF("a", "b"),
        "a", "b").collect().map(_.getDouble(6)).sum
      o2
    }
    assert(math.abs(chi2of2x2 - 20.0) < 1e-9, chi2of2x2.toString)
    assert(sub.forall(out.contains))
  }

  test("ks statistic: planted distributions give the hand-computed supremum") {
    import SparkSpec.spark.implicits._
    import graft.dq.DataQuality
    // a = {1,2,3,4}, b = {3,4,5,6}: D = 0.5, attained at v ∈ {2,3,4}
    // — the tiebreak must pick the SMALLEST attaining value (2)
    val rows = (Seq(1, 2, 3, 4).map(v => (v.toDouble, "a")) ++
      Seq(3, 4, 5, 6).map(v => (v.toDouble, "b"))).toDF("v", "g")
    val r = DataQuality.ksTest(rows, "v", "g", "a", "b").head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 4L)))
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 2.0, r.toString)
    // the bucketed distributed prefix sum equals the degenerate
    // single-bucket path bit for bit
    val r1 = DataQuality.ksTest(rows, "v", "g", "a", "b", buckets = 1).head
    assert(r1.toSeq == r.toSeq)
    // identical samples: D = 0 at the smallest observed value
    val same = Seq((1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b"))
      .toDF("v", "g")
    val r0 = DataQuality.ksTest(same, "v", "g", "a", "b").head
    assert(r0.getDouble(2) == 0.0 && r0.getDouble(3) == 1.0)
    // disjoint samples: D = 1 at a's maximum
    val dis = Seq((1.0, "a"), (2.0, "a"), (5.0, "b"), (6.0, "b"))
      .toDF("v", "g")
    val rd = DataQuality.ksTest(dis, "v", "g", "a", "b").head
    assert(rd.getDouble(2) == 1.0 && rd.getDouble(3) == 2.0)
    // an empty selection yields an empty frame, not a NULL row
    assert(DataQuality.ksTest(same.filter(col("v") < 0), "v", "g",
      "a", "b").isEmpty)
    // ONE-group-empty selections too (r19 advisory): Spark's NULL
    // division would emit a garbage (n, 0, null, v) row where an
    // IEEE engine computes inf/NaN — a latent cross-engine split
    assert(DataQuality.ksTest(same.filter(col("g") === "a"), "v", "g",
      "a", "b").isEmpty)
    assert(DataQuality.ksTest(same.filter(col("g") === "b"), "v", "g",
      "a", "b").isEmpty)
  }

  test("ks equi-depth routing survives a planted far outlier") {
    import SparkSpec.spark.implicits._
    import graft.dq.DataQuality
    // 1000 well-behaved values + one 9e18 sentinel: the r19
    // equi-width bounds (min/max) collapsed everything but the
    // sentinel into bucket 0 — a near-corpus-sized single-task
    // window. Equi-depth splits from the KLL sketch of the DISTINCT
    // values must spread them over many buckets regardless.
    val vals = (1 to 1000).map(_.toDouble) :+ 9e18
    val rows = (vals.map(v => (v, "a")) ++
      vals.filter(_ <= 500).map(v => (v, "b"))).toDF("v", "g")
    // correctness first: F_a jumps by 1/1001 per value, F_b by 1/500
    // up to 500 then flat; D is attained at v=500:
    // |500/1001 - 500/500| = 501/1001
    val r = DataQuality.ksTest(rows, "v", "g", "a", "b", buckets = 16).head
    assert((r.getLong(0), r.getLong(1)) == ((1001L, 500L)))
    assert(math.abs(r.getDouble(2) - (1.0 - 500.0 / 1001.0)) < 1e-12 &&
      r.getDouble(3) == 500.0, r.toString)
    // the routing property itself, on the same public kernels the
    // operator composes: quantile splits of the distinct values put
    // the population in >1 bucket (equi-width put 1001 of 1001 in
    // bucket 0)
    val distinct = vals.toDF("v")
    val qs = (1 until 16).map(_.toDouble / 16)
    val splits = distinct
      .agg(graft.functions.Kll.kllSketch(col("v")).as("s"))
      .select(graft.functions.Kll.kllQuantiles(col("s"), qs).as("q"))
      .head.getSeq[Double](0)
    val populated = distinct
      .select(graft.functions.HashFunctions.sortedUpperBound(
        typedLit(splits), col("v")).as("b"))
      .distinct().count()
    assert(populated > 1, s"equi-depth routing left $populated bucket(s)")
    // kernel boundary cases: upper bound is count of splits <= v,
    // NaN routes past every split (sort-order consistent)
    val k = Seq((Array(1.0, 2.0, 2.0, 5.0), 2.0)).toDF("s", "v")
      .select(graft.functions.HashFunctions.sortedUpperBound(
        col("s"), col("v"))).head.getInt(0)
    assert(k == 3)
    val kn = Seq((Array(1.0, 2.0), Double.NaN)).toDF("s", "v")
      .select(graft.functions.HashFunctions.sortedUpperBound(
        col("s"), col("v"))).head.getInt(0)
    assert(kn == 2)
    val ke = Seq((Array.empty[Double], 7.0)).toDF("s", "v")
      .select(graft.functions.HashFunctions.sortedUpperBound(
        col("s"), col("v"))).head.getInt(0)
    assert(ke == 0)
  }

  test("near-dup cluster savings price keep-canonical-only exactly") {
    import SparkSpec.spark.implicits._
    import graft.operators.Dedup
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val b = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 3
    // cluster {1,2,3} (identical), {4,5} (identical), {6} singleton
    val df = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b), (6L, a + b))
      .toDF("doc_id", "text")
    val r = Dedup.dedupClusterSavings(df, "doc_id", "text",
      threshold = 0.8, maxBucket = Int.MaxValue, minBands = 2).head
    val (ba, bb) = (a.getBytes("UTF-8").length.toLong,
      b.getBytes("UTF-8").length.toLong)
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 3L,
      r.toString)
    assert(r.getLong(3) == 3 * ba + 2 * bb + (ba + bb))
    assert(r.getLong(4) == 2 * ba + bb, "save every non-canonical byte")
    assert(r.getDouble(5) == 3.0 / 6.0)
    assert(r.getDouble(6) == (2 * ba + bb).toDouble / (4 * ba + 3 * bb))
  }

  test("value concentration keeps exactly ceil(n*pct/100) top users") {
    import SparkSpec.spark.implicits._
    import java.sql.Timestamp
    // 10 purchase users with values 10..1 -> top 10% = 1 user, share
    // 10/55; the non-purchase event must not count
    val rows = (1 to 10).map(i =>
      (i.toLong, "purchase", (11 - i).toDouble,
        Timestamp.valueOf("2024-01-01 10:00:00"))) :+
      (99L, "view", 1000.0, Timestamp.valueOf("2024-01-01 10:00:00"))
    val e = rows.toDF("user_id", "event_type", "value", "ts")
    val r = graft.operators.Events.valueConcentration(e, topPct = 10).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4)) == ((10L, 1L, 10.0, 55.0, 10.0 / 55.0)), r.toString)
  }

  test("iqr outliers flag exactly the fence-crossers") {
    import SparkSpec.spark.implicits._
    val rows = ((1 to 11).map(i => ("g", i.toDouble)) :+ ("g", 100.0)) ++
      Seq(("h", 5.0), ("h", 5.0), ("h", 6.0)) ++
      // a NaN must be excluded like a null, and a NULL group must
      // get its own fences row, not silently vanish from the join
      Seq(("g", Double.NaN)) ++
      Seq((null.asInstanceOf[String], 1.0),
        (null.asInstanceOf[String], 2.0),
        (null.asInstanceOf[String], 3.0))
    val df = rows.toDF("grp", "v")
    val out = graft.dq.DataQuality.iqrOutliers(df, "grp", "v")
      .collect().map(r => Option(r.getString(0)) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(5), r.getLong(6))).toMap
    // g: 12 scorable values sorted 1..11,100 (the NaN is out);
    // q1 = rank ceil(12*.25)=3 -> 3.0, q3 = rank ceil(12*.75)=9 ->
    // 9.0; fences [3-9, 9+9] = [-6, 18] -> exactly the 100.0 is out
    assert(out(Some("g")) == ((3.0, 9.0, 12L, 1L)), out.toString)
    // h: tight group, no outliers
    assert(out(Some("h"))._4 == 0L)
    // null group: own row, 3 rows accounted, none outlying
    assert(out(None)._3 == 3L && out(None)._4 == 0L, out.toString)
  }

  test("referential integrity accounts orphans, null keys, and unreferenced parents") {
    import SparkSpec.spark.implicits._
    // children: 2 rows -> parent 1, 1 row -> parent 2, 2 ORPHAN rows
    // -> key 9 (orphans weighted by multiplicity), 1 null-key row;
    // parents: 1, 2, and an unreferenced 3
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.dq.DataQuality
      .referentialIntegrity(child, "fk", parent, "pk").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getBoolean(6)) ==
      ((6L, 1L, 2L, 3L, 0L, 1L, false)), r.toString)
    // clean FK: passes, unreferenced parents alone do not fail it
    val clean = graft.dq.DataQuality.referentialIntegrity(
      Seq(1L, 1L, 2L).toDF("fk"), "fk", parent, "pk").collect()(0)
    assert(clean.getBoolean(6) && clean.getLong(5) == 1L, clean.toString)
    // a NULL parent PK is a parent-side defect: surfaced in its own
    // column, not folded into parent keys or unreferenced counts
    val nullPk = graft.dq.DataQuality.referentialIntegrity(
      Seq(1L, 2L).toDF("fk"), "fk",
      Seq(Some(1L), Some(2L), None).toDF("pk"), "pk").collect()(0)
    assert((nullPk.getLong(3), nullPk.getLong(4), nullPk.getLong(5),
      nullPk.getBoolean(6)) == ((2L, 1L, 0L, true)), nullPk.toString)
  }

  test("histogram bins cover the range, clamp the max, total the rows") {
    import SparkSpec.spark.implicits._
    // values 0..9 into 10 width-0.9 bins: floor(k/0.9) is distinct
    // for k = 0..8 and the max value is exactly the top edge, which
    // must CLAMP into bin 9, not bin 10. A NaN is excluded like null.
    val df = ((0 to 9).map(_.toDouble) :+ Double.NaN).toDF("x")
    val h = graft.dq.DataQuality.histogram(df, "x", bins = 10)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(3)))
      .toMap
    assert(h.keySet == (0 to 9).toSet)
    assert(h.values.forall(_._2 == 1L))
    assert(h(0)._1 == 0.0 && math.abs(h(9)._1 - 8.1) < 1e-12)
    // bin counts total the non-null rows on real data
    val li = Tables.load(spark, sf, "lineitem")
    val hist = graft.dq.DataQuality.histogram(li, "l_extendedprice", 10)
    assert(hist.agg(sum("n")).head().getLong(0) ==
      li.filter(col("l_extendedprice").isNotNull).count())
    // a constant column degenerates to ONE bin, not NaN bins
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val ch = graft.dq.DataQuality.histogram(const, "x", 10).collect()
    assert(ch.length == 1 && ch(0).getInt(0) == 0 && ch(0).getLong(3) == 3L)
  }

  test("q13 count-of-counts conserves customers and orders") {
    val out = SparkEntry.queries("q13_custdist")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.load(spark, sf, "customer").count()
    val nOrders = Tables.load(spark, sf, "orders").count()
    assert(out.map(_._2).sum == nCust, "every customer lands in one bucket")
    assert(out.map { case (c, d) => c * d }.sum == nOrders,
      "buckets weighted by order count recover the orders table")
    // zero-order customers surface explicitly iff any exist
    val zeros = out.find(_._1 == 0L).map(_._2).getOrElse(0L)
    val ordering = Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(zeros == nCust - ordering, s"zero bucket $zeros")
  }

  test("distribution drift reports exact shares and edge-clamped bins") {
    import SparkSpec.spark.implicits._
    // ref: uniform over bins 0 and 1 (4 rows each); cur: shifted to
    // bin 1 (2) and bin 3 (6), plus an out-of-range value clamping
    // into the top bin and nulls/NaN dropped
    val ref = Seq(1.0, 2.0, 3.0, 4.0, 11.0, 12.0, 13.0, 14.0).toDF("v")
    val cur = Seq(Some(11.0), Some(12.0), Some(31.0), Some(32.0),
      Some(33.0), Some(34.0), Some(35.0), Some(36.0), Some(99.0),
      None, Some(Double.NaN)).toDF("v")
    val out = graft.dq.DataQuality
      .distributionDrift(ref, cur, "v", lo = 0.0, hi = 40.0, bins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    // cur has 9 scorable rows: bins 1->2, 3->6, and 99.0 clamps to 3
    assert(out.toSeq == Seq(
      (0, 4L, 0L, 0.5, 0.0, 0.5),
      (1, 4L, 2L, 0.5, 2.0 / 9, 0.5 - 2.0 / 9),
      (3, 0L, 7L, 0.0, 7.0 / 9, 7.0 / 9)), out.toSeq.toString)
    // total variation = half the share_diff sum, here (0.5+...)/2
    val tv = out.map(_._6).sum / 2
    assert(math.abs(tv - (0.5 + (0.5 - 2.0 / 9) + 7.0 / 9) / 2) < 1e-15)
  }
}
