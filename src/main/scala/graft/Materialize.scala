package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization seam for intermediate frames that later plan
  * stages reuse (dedup signature frames, candidate pairs, iterative
  * cluster rounds, curation survivors).
  *
  * The engine's default is `localCheckpoint`: it truncates lineage
  * (the iterative operators NEED that — without it every round's
  * plan embeds every prior round's) and is the fastest option in a
  * single-JVM run. But lineage-truncated blocks live ONLY on
  * executors: on a 1000-executor cluster one lost executor fails the
  * whole job instead of recomputing, because there is no lineage
  * left to recompute FROM. So the strategy is injectable per session
  * through runtime conf — the same seam a cluster submit script
  * already uses:
  *
  *   - `spark.graft.materialize=local` (default): eager
  *     `localCheckpoint` — fastest, not executor-loss-tolerant.
  *   - `spark.graft.materialize=reliable`: `Dataset.checkpoint` into
  *     the context's checkpoint dir (call
  *     `sc.setCheckpointDir` to an HDFS/object-store path first) —
  *     survives any executor loss; one write+read of the frame.
  *   - `spark.graft.materialize=persist`: replicated
  *     `MEMORY_AND_DISK_2` persist of the computed RDD, re-wrapped
  *     as a fresh DataFrame — the LOGICAL plan truncates (the
  *     iterative operators require that: without the cut every
  *     propagation round's plan embeds all previous rounds' and the
  *     driver OOMs in analysis long before data size matters) while
  *     the RDD lineage stays recomputable (lost blocks rebuild or
  *     read the replica) without the checkpoint-dir round trip. The
  *     frames materialized here are small relative to their inputs
  *     (signatures, candidate ids), so 2× replicas are cheap;
  *     RDD-level persist means the ContextCleaner reclaims blocks
  *     once a round's frame becomes unreachable.
  *
  * All strategies yield the same rows; DedupSpec proves operator
  * equality across them.
  */
object Materialize {

  val ConfKey = "spark.graft.materialize"

  /** Materialize now (runs a job) — the shape the operators use so a
    * frame feeding two downstream branches evaluates once.
    */
  def eager(df: DataFrame): DataFrame = strategy(df, eagerEval = true)

  /** Cut lineage without forcing evaluation yet (the benchmark-
    * isolation shape where the first action pays the cost).
    */
  def lazily(df: DataFrame): DataFrame = strategy(df, eagerEval = false)

  /** Materialize a BULK frame — one whose row count rivals the corpus
    * (posting expansions, positional print sets) rather than the
    * usual signature/candidate frames. Same lineage-truncation
    * semantics as [[eager]], but stored DISK_ONLY: a corpus-sized
    * deserialized MEMORY_AND_DISK checkpoint fills the protected
    * storage region of unified memory, and the 32-way aggregate
    * stages that read it next starve to a hard
    * UNABLE_TO_ACQUIRE_MEMORY (measured: the sf10 span-dedup probe's
    * 58M-row print frame killed the document-frequency aggregate at
    * the default heap; DISK_ONLY reads back compact unsafe rows and
    * exerts no storage pressure). `reliable` already lands on stable
    * storage; `persist` keeps its replica semantics on disk.
    */
  def eagerBulk(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "local"    => df.localCheckpoint(true, StorageLevel.DISK_ONLY)
      case "reliable" => df.checkpoint(true)
      case "persist" =>
        val r = df.rdd.persist(StorageLevel.DISK_ONLY_2)
        r.count()
        df.sparkSession.createDataFrame(r, df.schema)
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be local|reliable|persist, got '$other'")
    }

  /** Construct independent frames concurrently (r21, guide §2.6:
    * overlap independent jobs). Several operators run driver-
    * synchronized work at CONSTRUCTION time — eager materializations,
    * bounded collects, driver-side quantizer training — and a
    * composition that builds such branches sequentially serializes
    * those jobs even though Spark's scheduler would happily overlap
    * them (the next branch's tasks back-fill executors the previous
    * branch's tail leaves idle). Each thunk must be independent of
    * the others; results return in input order, so compositions stay
    * deterministic. Exceptions propagate to the caller.
    */
  def inParallel[A](thunks: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future, blocking}
    import scala.concurrent.duration._
    import scala.util.{Failure, Try}
    if (thunks.sizeIs <= 1) return thunks.map(_())
    // r22 hardening (ADVICE): (a) pool threads have no active
    // SparkSession — a construction-time SparkSession.active /
    // SQLConf.get inside a thunk would silently read the DEFAULT
    // session's conf under multi-session use, so the caller's session
    // is re-activated in every branch; (b) thunks run driver-
    // synchronized Spark collects, so they are wrapped in blocking{}
    // (the global pool spawns a compensating thread instead of
    // starving if compositions ever nest); (c) ALL branches are
    // awaited before the first failure rethrows — fail-fast left
    // orphaned branches creating localCheckpoint blocks AFTER the
    // caller (e.g. a failed Bench attempt's finally) had unpersisted
    // everything, contaminating the next attempt; (d) the Inf await
    // is now a generous finite timeout so a hung branch names itself
    // instead of hanging the composition forever.
    val session = org.apache.spark.sql.SparkSession.getActiveSession
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = thunks.map(t => Future {
      session.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      blocking { t() }
    })
    val results = fs.map(f => Try(Await.result(f, 1.hour)))
    results.collectFirst { case Failure(e) => throw e }
    results.map(_.get)
  }

  private def strategy(df: DataFrame, eagerEval: Boolean): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "local"    => df.localCheckpoint(eagerEval)
      case "reliable" => df.checkpoint(eagerEval)
      case "persist" =>
        // RDD-level persist + re-wrap, NOT Dataset.persist: the
        // Dataset cache is plan-keyed (never auto-cleaned, and the
        // uncut plan is exactly what the iterative callers cannot
        // carry); wrapping the persisted RDD in a fresh DataFrame
        // truncates the logical plan like a checkpoint does while
        // keeping RDD lineage for executor-loss recompute
        val r = df.rdd.persist(StorageLevel.MEMORY_AND_DISK_2)
        if (eagerEval) r.count()
        df.sparkSession.createDataFrame(r, df.schema)
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be local|reliable|persist, got '$other'")
    }
}
