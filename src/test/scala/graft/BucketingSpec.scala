package graft

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val o = Tables.load(spark, sf, "orders")
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    Bucketing.writeBucketed(o, "graft_orders_b", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(li, "graft_lineitem_b", Seq("l_orderkey"), 8)
    // force the fact-fact (sort-merge) path: at real scale neither
    // side broadcasts, which is exactly when bucketing pays off
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n${plan.take(2500)}")
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the unsalted result") {
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = Bucketing.saltedJoin(o, c, Seq("o_custkey"),
      saltBy = "o_orderkey", salts = 7)
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.sameElements(plain))
  }

  test("AQE splits the straggler partition of a skewed fact-fact join") {
    // the q3 shape at its worst: one orderkey carrying a large share
    // of the fact table. AQE's runtime skew-join must split the hot
    // partition instead of leaving one straggler task — the mechanism
    // graft relies on for moderate skew (Bucketing.saltedJoin is the
    // explicit fallback for the pathological keys AQE can't split).
    val setConf = Seq(
      // force the fact-fact sort-merge path (broadcast hides skew)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // test-scale skew thresholds: the defaults (256 MB) would never
      // mark a unit-test partition as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16kb")
    val prev = setConf.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      setConf.foreach { case (k, v) => spark.conf.set(k, v) }
      val pad = "x" * 200
      val hot = spark.range(60000).select(lit(1L).as("o_orderkey"),
        concat(lit(pad), col("id").cast("string")).as("payload"))
      val cold = spark.range(2, 2000).select(col("id").as("o_orderkey"),
        lit(pad).as("payload"))
      val fact = hot.unionByName(cold)
      val dim = spark.range(1, 2000).select(col("id").as("l_orderkey"),
        lit("d").as("detail"))
      // global agg: a groupBy on the join key would REQUIRE the hash
      // distribution the skew split breaks, so AQE would (correctly)
      // refuse to split; the global count has no such requirement.
      // summing payload length keeps the wide column in the shuffle
      // (column pruning would otherwise shrink the hot partition
      // below the skew threshold)
      val agg = fact.join(dim, col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
      val rows = agg.collect()
      // correctness under the split: every joined row survives
      assert(rows.head.getLong(0) == 60000L + 1998L, rows.head.toString)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(3000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("out-of-order deletes for unseen keys are dropped") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val feed = Seq(
      (1L, "x", "delete"), // valid: key exists
      (9L, "y", "delete"), // out-of-order: key never seen -> dropped
      (3L, "c", "insert")
    ).toDF("id", "v", "op")
    val guarded = Cdc.dropUnmatchedDeletes(feed, target, Seq("id"), "op")
    val ops = guarded.select("id", "op").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(ops.sameElements(Array((1L, "delete"), (3L, "insert"))))
  }
}
