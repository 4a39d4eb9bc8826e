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
      // match GraftSession (r22): 100-entry codegen cache thrashes
      // under a 178-query board and later attempts re-pay janino
      .config("spark.sql.codegen.cache.maxEntries", "2000")
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

    // SELF-ADJUDICATION (r20): two consecutive rounds of driver
    // artifacts diverged from quiet-host ground truth on identical
    // plans (r18: GC debt; r19: a 216 s host stall inside one
    // query's attempts), and each time the noise had to be argued by
    // hand from calib stamps and stage metrics. The artifact now
    // carries the discard discipline itself:
    //   - per query, when successful WARM attempts (the cold first
    //     attempt is excluded: plan compile + codegen legitimately
    //     run it 3-5x over warm, and the median is warm-dominated
    //     anyway) disperse more than DISP_BOUND (max/min > 3 with
    //     the max >= 0.3 s — sub-0.3 s queries flap on scheduler
    //     jitter and are below the cross-round comparison floor
    //     anyway), up to `maxExtra` extra attempts run so the MEDIAN
    //     converges past the outlier; queries still dispersed after
    //     that are flagged "unstable" in the detail artifact;
    //   - a ~30 ms pure-JVM host probe (fixed arithmetic fold, no
    //     Spark) runs before EVERY query, giving the detail artifact
    //     a host-health TIMELINE: a load window that opens after the
    //     pre-calib and closes before the post-calib — invisible to
    //     the endpoint probes by construction — shows up as elevated
    //     probe_ms exactly on the queries it inflated (validated by
    //     a deliberately mid-run-loaded run; see TIMINGS r20);
    //   - the driver line carries a "noise" verdict: directional
    //     pre/post calib slowdown ratios, the probe timeline's
    //     median/max, a mechanical calib_degraded flag, re-attempt
    //     and unstable counts, and the worst dispersion — so a
    //     degraded-host run identifies ITSELF instead of presenting
    //     stall-inflated medians with quiet-run authority.
    // Stage metrics snapshot after the FIRST runsPer attempts only:
    // cross-round "bit-identical shuffle/task/input" triage assumes
    // a fixed attempt count, and extra attempts must not inflate it.
    val maxExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_EXTRA", "3").toInt
    val DISP_BOUND = 3.0
    val DISP_FLOOR_SEC = 0.3
    // warm slice: everything after the cold first attempt
    def warmOf(ts: Seq[Option[Double]]): Seq[Double] = ts.drop(1).flatten
    def dispersionOf(ok: Seq[Double]): Double =
      if (ok.size >= 2 && ok.min > 0) ok.max / ok.min else 1.0
    def disperses(ok: Seq[Double]): Boolean =
      ok.size >= 2 && ok.max >= DISP_FLOOR_SEC && dispersionOf(ok) > DISP_BOUND
    // the per-query host probe: a fixed driver-side arithmetic fold,
    // deliberately Spark-free so it measures nothing but CPU
    // contention on this machine at this instant (~30 ms quiet; the
    // observed failure mode is another JVM sharing the host, which
    // is CPU+memory-bandwidth contention this fold feels directly)
    var probeSink = 0L
    def hostProbeMs(): Double = {
      val t0 = System.nanoTime()
      var s = 0L; var i = 0L
      while (i < 20000000L) { s += (i * i) % 1000000007L; i += 1 }
      probeSink ^= s // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    hostProbeMs(); hostProbeMs() // JIT-compile the probe itself
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        dropPersistedBlocks()
        // Attribute task metrics to this query alone: the quiesce
        // above already idled the scheduler, drain any stragglers'
        // events, then reset the accumulators.
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        val probeMs = hostProbeMs()
        metrics.reset()
        def attempt(): Option[Double] = {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).queryExecution.toRdd.count()
                Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
          }
          finally {
            // Inter-ATTEMPT unpersist (r21 measurement fix): each
            // attempt constructs a FRESH plan, so blocks a previous
            // attempt localCheckpointed are dead weight — never
            // reused, but squeezing unified memory until later
            // attempts of materialization-heavy queries degrade
            // (ann_recall_ivfpq measured 2.1 s -> 17.4 s across six
            // attempts as its own dead checkpoints accumulated; the
            // dispersion re-attempt rule then RAISED the median the
            // re-runs were meant to stabilize). r22: the unpersist
            // alone did not stop the escalation — materialization-
            // heavy queries still drifted 3 -> 9 s across attempts
            // (r22 baseline corpus_curate_dsir [3.3, 9.5, 5.6];
            // corpus_curate_langid warm attempts rose monotonically)
            // because each attempt also leaves broadcast pieces and
            // shuffle state that only the ContextCleaner reclaims,
            // and it only acts after a driver GC. The adaptive GC
            // settle therefore now runs per ATTEMPT (outside the
            // timed window), exactly like the per-query quiesce.
            dropPersistedBlocks()
          }
        }
        var attempts: Seq[Option[Double]] = (1 to runsPer).map(_ => attempt())
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        val stageJson = metrics.snapshotJson
        var extra = 0
        while (extra < maxExtra && disperses(warmOf(attempts))) {
          attempts = attempts :+ attempt()
          extra += 1
        }
        (name, attempts, stageJson, extra, probeMs)
      }
    if (probeSink == Long.MinValue) System.err.println("[bench] probe sink")
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
    val medians: Seq[(String, Double)] = results.map { case (k, ts, _, _, _) =>
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
      case (k, ts, _, _, _) if ts.exists(_.isEmpty) => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val total = results.collect {
      case (_, ts, _, _, _) if ts.flatten.nonEmpty => median(ts.flatten)
    }.sum
    // methodology stamp: the round-8 inter-query quiesce (unpersist +
    // 2×System.gc + 250 ms settle) changed what the medians measure —
    // a quiet-heap plan cost instead of plans-plus-predecessor-GC.
    // Round 19 made the settle ADAPTIVE (collect until stable, see
    // dropPersistedBlocks) after the fixed dose stopped settling the
    // 171-query board. Cross-round comparisons against pre-stamp
    // artifacts must expect those shifts; the stamp makes each switch
    // visible in the artifact itself rather than only in prose.
    val methodology = "quiesce=unpersist+gcSettle<=10x@64MB per attempt (r22; per query since r8/r19, interAttemptUnpersist r21); dispersion>3x re-runs<=3 + noise verdict (since r20)"
    dropPersistedBlocks()
    val (calCpuPost, calShufPost) = calibrate()
    val calib = s"""{"cpu_pre":${r3(calCpuPre)},"shuffle_pre":${r3(
      calShufPre)},"cpu_post":${r3(calCpuPost)},"shuffle_post":${r3(
      calShufPost)}}"""
    // The noise verdict (see the self-adjudication block above):
    // calib slowdown is DIRECTIONAL post/pre of each probe pair —
    // the probes depend on nothing but the host, so post/pre > 1.15
    // means the machine got slower DURING the run (quiet-host
    // history maxes at 1.07; r19's degraded driver run read shuffle
    // 0.563 -> 0.689 = 1.22 while 12 queries "regressed" on
    // bit-identical stage metrics; r16's first catch read
    // 0.529 -> 1.030). Directional because the CPU probe's pre
    // sample is structurally ~1.8x SLOWER than post on every quiet
    // run (whole-JVM warmup the probe's own warmup lap can't cover)
    // — a symmetric max/min ratio would cry wolf every round.
    // Dispersion/unstable counts surface mid-run stalls even when
    // the calib endpoints happen to land quiet.
    def slowdown(pre: Double, post: Double): Double =
      if (pre > 0) post / pre else 1.0
    val calibDriftCpu = slowdown(calCpuPre, calCpuPost)
    val calibDriftShuf = slowdown(calShufPre, calShufPost)
    // ABSOLUTE bands catch a run that was loaded from the start (or
    // through both calib endpoints), where the directional ratio
    // stays flat: each probe is fixed work, so exceeding the worst
    // quiet-host sample in four rounds of artifact history by ~25%
    // (shuffle: 0.69 r16-r19 worst incl. the degraded r19 post →
    // band 0.85; cpu pre: 0.28 worst → band 0.40) means the machine
    // is contended at that endpoint. Overridable per host.
    val shufBand = sys.env.getOrElse("SPARK_GRAFT_CALIB_SHUF_BAND",
      "0.85").toDouble
    val cpuBand = sys.env.getOrElse("SPARK_GRAFT_CALIB_CPU_BAND",
      "0.40").toDouble
    val calibOverBand = math.max(calShufPre, calShufPost) > shufBand ||
      math.max(calCpuPre, calCpuPost) > cpuBand
    val unstable = results.collect {
      case (k, ts, _, _, _) if disperses(warmOf(ts)) => k
    }
    val nReattempted = results.count(_._4 > 0)
    val maxDisp = (1.0 +: results.map(r => dispersionOf(warmOf(r._2)))).max
    // the probe timeline's verdict: the median is this run's quiet
    // floor; a max >= 2x it means a contended WINDOW existed inside
    // the run even if both calib endpoints were quiet (quiet-run
    // max/med measured 1.12; a 28-spinner-on-32-core load read 2.43;
    // a co-tenant JVM stall reads far past that)
    val probes = results.map(_._5)
    val probeMed = if (probes.nonEmpty) median(probes) else 0.0
    val probeMax = if (probes.nonEmpty) probes.max else 0.0
    val probeWindow = probeMed > 0 && probeMax / probeMed >= 2.0
    val calibDegraded = calibDriftCpu > 1.15 || calibDriftShuf > 1.15 ||
      calibOverBand || probeWindow
    val noise =
      s"""{"calib_slowdown_cpu":${r3(calibDriftCpu)},"calib_slowdown_shuffle":${
        r3(calibDriftShuf)},"calib_over_band":$calibOverBand,"probe_med_ms":${
        r3(probeMed)},"probe_max_ms":${r3(probeMax)},"probe_window":$probeWindow,"calib_degraded":$calibDegraded,"n_reattempted":$nReattempted,"n_unstable":${
        unstable.size},"max_dispersion":${r3(maxDisp)},"unstable":${
        unstable.take(5).map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val detailPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val driverLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},"queries":$qs,"queries_note":"top-10 medians only; full map in detail artifact","runs":$runsPer,"failed":$failed,"calib":$calib,"noise":$noise,"sf":"$sfDir","detail":"$detailPath","methodology":"$methodology"}"""
    // Full-precision detail (cold + every attempt) is too large for the
    // harness's bounded output tail — persist it as a repo artifact.
    val detail = results.map { case (k, ts, stageJson, extra, probeMs) =>
      val attempts = ts.map(_.map(r6).getOrElse("-1")).mkString("[", ",", "]")
      val disp = dispersionOf(warmOf(ts))
      "\"" + k + "\":{\"cold\":" + ts.head.map(r6).getOrElse("-1") +
        ",\"attempts\":" + attempts +
        ",\"dispersion\":" + r3(disp) +
        ",\"extra_attempts\":" + extra +
        ",\"unstable\":" + disperses(warmOf(ts)) +
        ",\"probe_ms\":" + r3(probeMs) +
        ",\"stage\":" + stageJson + "}"
    }.mkString("{", ",", "}")
    val detailJson =
      s"""{"total":${r3(total)},"runs":$runsPer,"sf":"$sfDir","failed":$failed,"calib":$calib,"noise":$noise,"methodology":"$methodology","queries":$detail}"""
    try {
      val w = new java.io.PrintWriter(detailPath)
      try w.println(detailJson) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    spark.stop()
    // Last line of output, nothing after it — the driver tails stdout.
    println(driverLine)
  }
}
