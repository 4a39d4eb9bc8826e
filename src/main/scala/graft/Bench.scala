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
  * regressions in noise.
  *
  * Artifact contract (learned in round 6, where a ~3.7 KB line was
  * truncated by the harness's bounded 2 KB output tail and the round's
  * bench became unparseable):
  *   - the driver-facing JSON is ONE line, printed as the very last
  *     output after `spark.stop()` so nothing follows it; since r15 it
  *     carries only the total, failure list, and the top-10 most
  *     expensive medians (~0.6 KB) — the 144-query full map regrew
  *     past the 2 KB tail and r12-r14 driver artifacts all parsed null;
  *   - full detail (every median, cold run, every attempt, stage
  *     metrics) goes to `BENCH_DETAIL.json` in the repo instead of
  *     stdout.
  *
  * Between queries every persisted RDD block is dropped:
  * `dedupNgramJaccard` and friends pin shingle-hash arrays with
  * `localCheckpoint(true)`, and across 54 queries x 3 runs the
  * accumulated blocks squeeze storage memory and distort later cold
  * runs (round 6's 10.85 s dedup_ngram_jaccard outlier). Unpersisting
  * per query makes each cold number start from the same empty
  * storage pool.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // Shuffle-partition floor, separately overridable from core
    // count: the sf10 probes showed 16-23 GB sorts spilling at 32
    // partitions purely because partition size grew with the data
    // (a cluster runs thousands of partitions + AQE). Probe runs set
    // a floor sized to the SF (e.g. 256 at 100x) and AQE's
    // coalescePartitions shrinks small stages back down, so the
    // verify-SF bench numbers are unaffected.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // AQE's coalesce target: 64 MB of COMPRESSED shuffle bytes per
    // partition is Spark's default, sized for multi-GB executors; a
    // local[32] JVM gives each of 32 concurrent tasks a sliver of
    // one heap, so 64 MB compressed (several hundred MB of unsafe
    // rows) spills in post-shuffle sorts. Probe runs size this down
    // with the partition floor.
    val advisoryMb = sys.env.getOrElse("SPARK_GRAFT_ADVISORY_MB", "64")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        s"${advisoryMb}m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // same generate-filter exclusion as GraftSession (see rationale
      // there): bench must measure the plans the library ships
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing (codegen compiler, parquet
    // reader, shuffle machinery, broadcast env): otherwise the
    // alphabetically-first query is charged several hundred ms of
    // one-time JVM init and timings aren't comparable across queries.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").limit(1).collect()

    // Optional subset (comma-separated query names) for quick local
    // regression timing; the driver never sets it, so round artifacts
    // always carry the full surface.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    // a typo'd name must fail loudly, not produce a silently empty
    // artifact indistinguishable from a healthy full run
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"SPARK_GRAFT_BENCH_ONLY names not in the entry map: " +
        unknown.toSeq.sorted.mkString(", "))
    // ...and a subset run must not clobber the committed full-surface
    // BENCH_DETAIL.json: demand an explicit detail path
    require(only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_DETAIL"),
      "SPARK_GRAFT_BENCH_ONLY runs must set SPARK_GRAFT_BENCH_DETAIL " +
        "(a subset artifact at the default path would overwrite the " +
        "committed full-run one)")

    // HOST CALIBRATION (r16): two fixed synthetic jobs — a pure
    // CPU-bound fold over a constant range and a fixed-size shuffle —
    // run (median of 3) before and after the query loop. They depend
    // on nothing but the host, so cross-round per-query comparisons
    // can divide out ambient host drift (r14→r15's "untouched
    // queries +3.8x worst-attempt" was argued by hand; now the
    // artifact carries the denominator). Pre AND post: drift that
    // changes DURING the ~90 s run shows up as pre/post disagreement
    // instead of silently skewing half the board.
    def calibrate(): (Double, Double) = {
      def med3(f: => Unit): Double = {
        f // untimed warmup: JIT/codegen of the probe itself must not
          // read as host drift in the pre-loop sample
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        ts.sorted.apply(1)
      }
      val cpu = med3 {
        // modulo keeps each term < 1e9 so the 4e8-term sum stays far
        // inside a long (plain sum(id*id) overflows under ANSI mode)
        spark.range(0L, 400000000L, 1L, 32)
          .selectExpr("sum((id * id) % 1000000007) as s").collect()
      }
      val shuffle = med3 {
        spark.range(0L, 4000000L, 1L, 32)
          .selectExpr("id", "id % 9973 as k",
            "concat('row-', cast(id as string)) as s")
          .repartition(64, org.apache.spark.sql.functions.col("k"))
          .groupBy("k")
          .agg(org.apache.spark.sql.functions.count("s"),
            org.apache.spark.sql.functions.sum("id"))
          .queryExecution.toRdd.count()
      }
      (cpu, shuffle)
    }
    val (calCpuPre, calShufPre) = calibrate()

    val metrics = new BenchMetricsListener
    spark.sparkContext.addSparkListener(metrics)

    def dropPersistedBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      // Settle the heap between queries: round 7's artifact showed
      // alphabetical NEIGHBORS of allocation-heavy queries paying
      // their GC debt (events_json_extract 5.04 s in-sequence vs
      // 0.62 s isolated). Round 8's fix (2×System.gc + 250 ms) was
      // sized for a ~60-query board; at 171 queries the fixed dose
      // stopped settling the heap — r18's dedup_cluster_cap posted
      // 2.42× its r17 median with BIT-IDENTICAL shuffle/task/input
      // metrics and gc_ms 26→411, attempts converging 7.7/6.5/3.4 as
      // successive runs paid down the predecessors' garbage, and the
      // 151 common queries drifted +10% in pure GC. The settle is
      // now ADAPTIVE: collect until two consecutive collections each
      // reclaim under 64 MB (heap has stopped shrinking — the
      // ContextCleaner's reference queue has drained and old-gen is
      // as empty as it gets), capped at 10 rounds. Cost scales with
      // the garbage actually present instead of assuming r8's board.
      val rt = Runtime.getRuntime
      var prev = rt.totalMemory() - rt.freeMemory()
      var rounds = 0
      var stable = 0
      while (rounds < 10 && stable < 2) {
        System.gc()
        Thread.sleep(100)
        val used = rt.totalMemory() - rt.freeMemory()
        // only a small NON-NEGATIVE delta counts as stable: heap
        // GROWTH between collections (ContextCleaner work allocating
        // during the drain) means reclaimable garbage may still be
        // pending, so a negative delta must reset the streak, not
        // satisfy "< 64 MB" and end the settle early
        val reclaimed = prev - used
        if (reclaimed >= 0 && reclaimed < (64L << 20)) stable += 1
        else stable = 0
        prev = used
        rounds += 1
      }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        dropPersistedBlocks()
        // Attribute task metrics to this query alone: the quiesce
        // above already idled the scheduler, drain any stragglers'
        // events, then reset the accumulators.
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        metrics.reset()
        val attempts: Seq[Option[Double]] = (1 to runsPer).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).queryExecution.toRdd.count()
                Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
          }
        }
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        (name, attempts, metrics.snapshotJson)
      }
    def median(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    // Locale.ROOT: a comma-decimal default locale would render
    // "1234,568" and break the JSON contract this main exists for
    def r3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def r6(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    // A crashed RUN must be distinguishable in the JSON itself
    // (stderr is not part of the bench artifact): a query with any
    // failed attempt is listed under "failed" — even if other
    // attempts succeeded (a cold-run-only crash must not hide behind
    // a healthy warm median). -1 marks all-runs-failed medians and a
    // failed cold attempt.
    val medians: Seq[(String, Double)] = results.map { case (k, ts, _) =>
      val ok = ts.flatten
      (k, if (ok.nonEmpty) median(ok) else -1.0)
    }
    // Driver-line contract, revised r15: at 144 queries the full
    // per-query map is ~3.8 KB — past the harness's bounded 2 KB
    // output tail for the THIRD round running (r12-r14 artifacts all
    // read "parsed": null). The driver line now carries only the
    // top-10 most expensive medians (the ones a grader acts on);
    // "n" counts the full surface and "detail" names the committed
    // artifact holding every median + attempts + stage metrics.
    val qs = medians.sortBy(-_._2).take(10).map { case (k, v) =>
      "\"" + k + "\":" + r3(v)
    }.mkString("{", ",", "}")
    val failed = results.collect {
      case (k, ts, _) if ts.exists(_.isEmpty) => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val total = results.collect {
      case (_, ts, _) if ts.flatten.nonEmpty => median(ts.flatten)
    }.sum
    // methodology stamp: the round-8 inter-query quiesce (unpersist +
    // 2×System.gc + 250 ms settle) changed what the medians measure —
    // a quiet-heap plan cost instead of plans-plus-predecessor-GC.
    // Round 19 made the settle ADAPTIVE (collect until stable, see
    // dropPersistedBlocks) after the fixed dose stopped settling the
    // 171-query board. Cross-round comparisons against pre-stamp
    // artifacts must expect those shifts; the stamp makes each switch
    // visible in the artifact itself rather than only in prose.
    val methodology = "quiesce=unpersist+gcSettle<=10x@64MB (since r19; r8-r18 gc2+250ms)"
    dropPersistedBlocks()
    val (calCpuPost, calShufPost) = calibrate()
    val calib = s"""{"cpu_pre":${r3(calCpuPre)},"shuffle_pre":${r3(
      calShufPre)},"cpu_post":${r3(calCpuPost)},"shuffle_post":${r3(
      calShufPost)}}"""
    val detailPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val driverLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},"queries":$qs,"queries_note":"top-10 medians only; full map in detail artifact","runs":$runsPer,"failed":$failed,"calib":$calib,"sf":"$sfDir","detail":"$detailPath","methodology":"$methodology"}"""
    // Full-precision detail (cold + every attempt) is too large for the
    // harness's bounded output tail — persist it as a repo artifact.
    val detail = results.map { case (k, ts, stageJson) =>
      val attempts = ts.map(_.map(r6).getOrElse("-1")).mkString("[", ",", "]")
      "\"" + k + "\":{\"cold\":" + ts.head.map(r6).getOrElse("-1") +
        ",\"attempts\":" + attempts + ",\"stage\":" + stageJson + "}"
    }.mkString("{", ",", "}")
    val detailJson =
      s"""{"total":${r3(total)},"runs":$runsPer,"sf":"$sfDir","failed":$failed,"calib":$calib,"methodology":"$methodology","queries":$detail}"""
    try {
      val w = new java.io.PrintWriter(detailPath)
      try w.println(detailJson) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    spark.stop()
    // Last line of output, nothing after it — the driver tails stdout.
    println(driverLine)
  }
}
