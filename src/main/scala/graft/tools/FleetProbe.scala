package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: scale probe for the CONFIG-DRIVEN incremental-dedup
  * fleet ([[graft.streaming.IncrementalDedupJob.runAll]]) — the
  * reference's whole operating model (one generic job + a control
  * table; add a corpus by inserting a row) under sf10 traffic.
  * [[IncrementalProbe]] probes members individually via direct
  * library calls; THIS probe drives several members from ONE control
  * table through the real path: silver delta-log change feed →
  * per-member checkpointed version walk → keyed state + gold, with
  * one member on `bucketed:N` state so the layout-spec guard sees
  * scale traffic.
  *
  * Two waves: the catch-up fold (whole corpus as silver v0) runs
  * through `runAll` end to end; then a duplicate-heavy increment
  * (1000 new ids over 10 existing contents — the killer shape)
  * merges as v1 and each control row is parsed and timed
  * individually, so TIMINGS gets per-member fold costs from the
  * same table. State dirs are per-member by construction; the probe
  * asserts the walked versions and gold row counts agree across
  * members at the end.
  *
  * Usage: runMain graft.tools.FleetProbe <sfDir> <workDir>
  */
object FleetProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: FleetProbe <sfDir> <workDir>")
    val Array(sfDir, workDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfmt = graft.pipeline.DeltaLogTableFormat
    val silver = s"$workDir/silver"
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    println(s"[fleet-probe] corpus $n docs from $sfDir")

    var t0 = System.nanoTime()
    sfmt.scd1Merge(spark, silver, docs.withColumn("_ord", lit(0L)),
      Seq("doc_id"), "_ord", compareExclude = Nil)
    println(f"[fleet-probe] silver v0 merge: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // the fleet: eleven members, one on bucketed:64 state (the
    // pruned delta-log layout whose spec guard must see sf10 merges)
    // and five frozen-epoch members (dsir + ccnet + decontaminate +
    // langid + bpe — epochs train from wave 1); phash runs the md5
    // degradation path over the text payloads (the binary-asset
    // member under text-silver traffic)
    def cfgJson(member: String, extra: String = ""): String =
      s"""{"member": "$member", "silverPath": "$silver",
         |"checkpoint": "$workDir/$member/ck",
         |"stateDir": "$workDir/$member/state",
         |"goldPath": "$workDir/$member/gold",
         |"idCol": "doc_id", "contentCol": "text",
         |"silverFormat": "delta-log"$extra}"""
        .stripMargin.replace("\n", " ")
    val rows = Seq(
      cfgJson("exact"),
      cfgJson("minhash", """, "stateFormat": "bucketed:64""""),
      cfgJson("containment"),
      cfgJson("winnow"),
      cfgJson("span"),
      cfgJson("dsir",
        """, "params": {"targetWhere": "doc_id % 10 = 0"}"""),
      cfgJson("ccnet",
        """, "params": {"refWhere": "doc_id % 10 = 0"}"""),
      cfgJson("decontaminate",
        """, "params": {"benchWhere": "doc_id % 10 = 0"}"""),
      cfgJson("langid",
        """, "params": {"refWhere": "doc_id % 10 = 0", "langExpr": """ +
          """"CASE WHEN doc_id % 3 = 0 THEN 'a' WHEN doc_id % 3 = 1 """ +
          """THEN 'b' ELSE 'c' END"}"""),
      cfgJson("bpe",
        """, "params": {"trainWhere": "doc_id % 10 = 0", "merges": "16"}"""),
      cfgJson("phash"))
    val control = rows.map((_, true)).toDF("config_json", "enabled")

    // wave 1: catch-up fold, the real fleet API end to end
    t0 = System.nanoTime()
    val outcomes = graft.streaming.IncrementalDedupJob.runAll(spark, control)
    println(f"[fleet-probe] wave 1 (catch-up, runAll over ${rows.length} members): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    outcomes.foreach {
      case (key, Right(vs)) => println(s"[fleet-probe]   $key folded $vs")
      case (key, Left(e)) => sys.error(s"fleet member $key failed: $e")
    }

    // duplicate-heavy increment: 1000 NEW ids over 10 existing
    // contents (IncrementalProbe's killer shape), merged as v1
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val hot = docs.select(col("text")).distinct().orderBy(col("text"))
      .limit(10).collect().map(_.getString(0))
    val inc = (0 until 1000)
      .map(i => (maxId + 1 + i, hot(i % hot.length))).toDF("doc_id", "text")
    sfmt.scd1Merge(spark, silver, inc.withColumn("_ord", lit(1L)),
      Seq("doc_id"), "_ord", compareExclude = Nil)

    // wave 2: per-member fold timings from the SAME control table
    val cfgs = control.select(col("config_json")).collect().map(_.getString(0))
      .map(graft.pipeline.ConfigHandler.parseIncrementalDedup)
    cfgs.foreach { cfg =>
      val t1 = System.nanoTime()
      val vs = graft.streaming.IncrementalDedupJob.run(spark, cfg)
      println(f"[fleet-probe] wave 2 ${cfg.member}: " +
        f"${(System.nanoTime() - t1) / 1e9}%.1f s (folded $vs)")
      require(vs == Seq(1), s"${cfg.member} must fold exactly v1, got $vs")
    }

    // cross-member gold sanity (state dirs never collided, every
    // feed walked both versions): per-doc members hold one row per
    // live doc id; the exact member's gold is keyed per DISTINCT
    // content (text_hash); the decontaminate member's universe is
    // the NON-benchmark slice (benchmark docs never enter gold — the
    // r19 probe's check missed this and tripped AFTER printing the
    // per-member numbers TIMINGS quotes; fixed r20 so the probe
    // exits 0 end to end)
    val silverCur = sfmt.read(spark, silver)
    val perDoc = silverCur.count()
    val perContent = silverCur.select(col("text")).distinct().count()
    val perNonBench = silverCur.filter(expr("NOT (doc_id % 10 = 0)")).count()
    cfgs.foreach { cfg =>
      val rowsG = cfg.stateFormat.read(spark, cfg.goldPath).count()
      val expected = cfg.member match {
        case "exact" => perContent
        case "decontaminate" => perNonBench
        case _ => perDoc
      }
      println(s"[fleet-probe] ${cfg.member} gold rows $rowsG")
      require(rowsG == expected,
        s"${cfg.member} gold $rowsG != expected $expected")
    }
    spark.stop()
  }
}
