package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: scale probe for the GROUP-KEYED incremental near-dup
  * members on a duplication-heavy corpus — the sf10 killer shape fed
  * to the streaming path. Fold 1 is the catch-up fold (the whole
  * corpus in one batch); fold 2 is a duplicate-heavy increment (new
  * doc ids over EXISTING contents — the shape whose doc-level pair
  * cost was quadratic in the duplication factor). Prints wall
  * seconds per fold.
  *
  * Usage: runMain graft.tools.IncrementalProbe <sfDir> <workDir> [fmt]
  * where fmt is `snapshot` (default) or `bucketed[:N]` — the
  * key-hash-bucketed delta-log pruned layout ([[graft.pipeline
  * .BucketedTableFormat]]) whose fold-2 merges rewrite touched
  * buckets only.
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      "usage: IncrementalProbe <sfDir> <workDir> [snapshot|bucketed[:N]]")
    val Array(sfDir, workDir) = args.take(2)
    val fmt: graft.pipeline.TableFormat = args.lift(2) match {
      case None | Some("snapshot") => graft.pipeline.SnapshotTableFormat
      case Some("bucketed") => graft.pipeline.BucketedTableFormat()
      case Some(s) if s.startsWith("bucketed:") =>
        graft.pipeline.BucketedTableFormat(s.stripPrefix("bucketed:").toInt)
      case Some(other) => sys.error(s"unknown fmt $other")
    }
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
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val stateDir = s"$workDir/state"
    val gold = s"$workDir/gold"
    def fold(label: String, batch: org.apache.spark.sql.DataFrame,
             ord: Long): Unit = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.minhashLshStatsIncremental(spark, batch,
        "doc_id", "text", stateDir, gold, batchOrd = ord, fmt = fmt)
      println(f"[inc-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    println(s"[inc-probe] corpus $n docs from $sfDir")
    // duplicate-heavy increment: 1000 NEW ids over 10 existing
    // contents — every new doc lands in maximal existing groups
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val hot = docs.select(col("text")).distinct().orderBy(col("text")).limit(10)
      .collect().map(_.getString(0))
    import spark.implicits._
    val inc = (0 until 1000)
      .map(i => (maxId + 1 + i, hot(i % hot.length))).toDF("doc_id", "text")

    fold("minhash fold1 catch-up (whole corpus)", docs, 0L)
    fold("minhash fold2 duplicate-heavy increment (1000 docs, 10 contents)",
      inc, 1L)
    // narrow increment: the steady-state streaming micro-batch shape
    // (10 keys). Under the bucketed layout this touches ≤10 of the
    // state/gold buckets — the fold where pruned merges beat the
    // snapshot whole-table rewrite hardest.
    val narrow = (0 until 10)
      .map(i => (maxId + 2000 + i, hot(i % 2))).toDF("doc_id", "text")
    fold("minhash fold3 narrow increment (10 docs, 2 contents)", narrow, 2L)
    val goldRows = fmt.read(spark, gold).count()
    println(s"[inc-probe] minhash gold rows $goldRows")

    def foldSim(label: String, batch: org.apache.spark.sql.DataFrame,
                ord: Long): Unit = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.simhashStatsIncremental(spark, batch,
        "doc_id", "text", s"$workDir/sim_state", s"$workDir/sim_gold",
        batchOrd = ord, fmt = fmt)
      println(f"[inc-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    foldSim("simhash fold1 catch-up", docs, 0L)
    foldSim("simhash fold2 increment", inc, 1L)

    def foldCont(label: String, batch: org.apache.spark.sql.DataFrame,
                 ord: Long): Unit = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.containmentStatsIncremental(spark, batch,
        "doc_id", "text", s"$workDir/ct_state", s"$workDir/ct_gold",
        batchOrd = ord, fmt = fmt)
      println(f"[inc-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    foldCont("containment fold1 catch-up", docs, 0L)
    foldCont("containment fold2 increment", inc, 1L)

    def foldRes(label: String, batch: org.apache.spark.sql.DataFrame,
                ord: Long): Unit = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.dedupResolveIncremental(spark, batch,
        "doc_id", "text", s"$workDir/rs_state", s"$workDir/rs_gold",
        batchOrd = ord, fmt = fmt)
      println(f"[inc-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    foldRes("resolve fold1 catch-up", docs, 0L)
    foldRes("resolve fold2 increment", inc, 1L)
    spark.stop()
  }
}
