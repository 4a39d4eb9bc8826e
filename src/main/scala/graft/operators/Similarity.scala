package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions, VectorOps}

/** Output row of the ANN operators. */
final case class Neighbor(vec_id: Long, rank: Int, neighbor_id: Long,
                          cos_sim: Double)

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 #32-33).
  *
  * `annBruteForce` is the exact baseline: an all-pairs nested-loop
  * join whose cost is O(N^2 * d) — correct at oracle scale, a
  * non-starter at 100 TB. `annLsh` is the scale path: each vector
  * gets a signed-random-projection bucket id (codegen'd SrpBucket
  * expression, deterministic plane weights — no broadcast matrix),
  * the join becomes an equi-join on the bucket id (a plain hash
  * shuffle that AQE can size), and top-K runs inside buckets. Recall
  * is tunable via `planes` (fewer planes = bigger buckets = higher
  * recall, more compute).
  */
object Similarity {

  /** Bounded insertion top-k by (cos desc via nanCmp, id asc) — the
    * single kernel both brute-force formulations share, so their tie
    * and NaN behavior cannot drift apart. nanCmp ranks NaN first,
    * matching Spark's DESC sort (DedupSpec pins the equivalence).
    */
  private final class BoundedTopK(k: Int) extends Serializable {
    val ids = new Array[Long](k)
    val cos = new Array[Double](k)
    var filled = 0
    def insert(cid: Long, c: Double): Unit = {
      var pos = filled
      while (pos > 0 && {
        val cmp = VectorOps.nanCmp(cos(pos - 1), c)
        cmp < 0 || (cmp == 0 && ids(pos - 1) > cid)
      }) pos -= 1
      if (pos < k) {
        val last = math.min(filled, k - 1)
        var m = last
        while (m > pos) { ids(m) = ids(m - 1); cos(m) = cos(m - 1); m -= 1 }
        ids(pos) = cid; cos(pos) = c
        if (filled < k) filled += 1
      }
    }
  }

  private def topKWithin(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** #32 Exact top-K neighbors by cosine. The corpus (id, vector,
    * norm) triples are broadcast once (64-dim floats: ~0.5 KB/vector
    * — fine up to ~1M vectors) and each partition scans it with a
    * bounded insertion buffer per probe vector: one pass, no 4M-row
    * pair materialization, no window sort. Norms are precomputed per
    * VECTOR, so the N² inner loop runs one accumulation stream (dot)
    * instead of three (dot+na+nb) — same doubles bit-for-bit, since
    * each sum covers the same elements in the same order. Exact same
    * results as the join+window formulation (asserted in DedupSpec);
    * beyond broadcastable corpus sizes, annLsh is the path.
    *
    * `maxCorpusRows` bounds the driver collect: the corpus is fetched
    * through a `limit(cap + 1)` (no extra counting scan — at or under
    * the cap the limited collect IS the full corpus) and the call
    * fails fast when the cap is exceeded, instead of OOMing the
    * driver mid-collect. The default (1M × ~0.5 KB/vector ≈ 0.5 GB)
    * is the edge of comfortable broadcast territory.
    */
  def annBruteForce(df: DataFrame, idCol: String, vecCol: String,
                    k: Int = 5, maxCorpusRows: Int = 1000000): DataFrame =
    annBruteForceAgainst(df, df, idCol, vecCol, k, maxCorpusRows)

  /** [[annBruteForce]] generalized to a QUERY frame scored against a
    * (possibly different) CANDIDATE corpus — the shape a sampled
    * recall audit needs at scale: exact top-k for a probe subset of
    * queries, each scanning the full corpus once (cost linear in
    * |queries|·|corpus|, not |corpus|²). Self-matches are excluded
    * by id, so running it with `queries` ⊆ `corpus` yields exactly
    * the corresponding [[annBruteForce]] rows.
    *
    * This is the TINY-CORPUS baseline: it collects and broadcasts the
    * corpus (gated by `maxCorpusRows`) while distributing the probe
    * scan. When the corpus is the big side — every sampled audit at
    * scale — use [[annBruteForceDistributed]], which flips the data
    * movement (broadcast probes, scan corpus) and leaves the corpus
    * unbounded; results are value-identical.
    */
  def annBruteForceAgainst(queries: DataFrame, corpus: DataFrame,
                           idCol: String, vecCol: String,
                           k: Int = 5, maxCorpusRows: Int = 1000000): DataFrame = {
    require(maxCorpusRows > 0, "maxCorpusRows must be positive")
    val spark = queries.sparkSession
    import spark.implicits._
    val e = queries.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
    val corpusDs = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
    // Int.MaxValue means "explicitly uncapped" (the idiom the error
    // message invites); +1 would overflow it into a negative limit
    val collected =
      if (maxCorpusRows == Int.MaxValue) corpusDs.collect()
      else corpusDs.limit(maxCorpusRows + 1).collect()
    require(collected.length <= maxCorpusRows,
      s"annBruteForce is the exact O(N^2) baseline and collects the corpus " +
        s"to the driver; it exceeds maxCorpusRows=$maxCorpusRows here. Use " +
        s"the bucketed scale paths instead: Similarity.annLsh (SRP-bucket " +
        s"equi-join) or Similarity.annIvf (inverted-file lists), or raise " +
        s"the cap explicitly if the driver can hold the corpus.")
    val bcast = spark.sparkContext.broadcast(
      collected.map { case (id, v) => (id, v, normF(v)) })
    e.mapPartitions { rows =>
      val cand = bcast.value
      rows.flatMap { case (id, v) =>
        val na = normF(v)
        val top = new BoundedTopK(k)
        var c = 0
        while (c < cand.length) {
          val (cid, cv, nb) = cand(c)
          if (cid != id) {
            val cos =
              if (na == 0.0 || nb == 0.0) 0.0
              else dotF(v, cv) / (math.sqrt(na) * math.sqrt(nb))
            top.insert(cid, cos)
          }
          c += 1
        }
        (0 until top.filled).map(r => Neighbor(id, r + 1, top.ids(r), top.cos(r)))
      }
    }.toDF()
  }

  /** The 100 TB-runnable exact-truth form: broadcast the (small by
    * construction) PROBE set and scan the CORPUS distributed — the
    * exact mirror of [[annBruteForceAgainst]]'s data movement. Each
    * corpus partition folds its rows into one bounded top-k buffer
    * per probe (memory = |probes|·k, independent of corpus size),
    * emits ≤ k partial rows per probe, and a final per-probe top-k
    * merge over those ≤ partitions·k rows picks the global answer.
    * Result rows are value-identical to [[annBruteForceAgainst]] for
    * the same inputs: a global top-k row is necessarily in its own
    * partition's top-k, and the (cos desc via nanCmp, id asc)
    * comparator is total over the distinct neighbor ids, so the
    * merge order cannot change the set (DedupSpec pins equality).
    * The equivalence REQUIRES one probe row per id — the collect form
    * emits an independent top-k per probe ROW while this form's final
    * per-probe merge is keyed by vec_id, so duplicate probe ids would
    * collapse into one ranked list; probe-id uniqueness is enforced
    * below rather than silently diverging.
    *
    * `maxProbeRows` gates the one remaining driver collect — the
    * probe side, which a sampled audit makes small by construction
    * (rate·N). The corpus side is UNBOUNDED: this is the form that
    * audits a billion-vector corpus instead of failing its gate.
    */
  def annBruteForceDistributed(queries: DataFrame, corpus: DataFrame,
                               idCol: String, vecCol: String,
                               k: Int = 5,
                               maxProbeRows: Int = 1000000): DataFrame = {
    require(maxProbeRows > 0, "maxProbeRows must be positive")
    val spark = queries.sparkSession
    import spark.implicits._
    val probeDs = queries
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
    // same limit(cap + 1) idiom as the corpus-collect baseline:
    // Int.MaxValue = explicitly uncapped, +1 would overflow it
    val collected =
      if (maxProbeRows == Int.MaxValue) probeDs.collect()
      else probeDs.limit(maxProbeRows + 1).collect()
    require(collected.length <= maxProbeRows,
      s"annBruteForceDistributed broadcasts the PROBE set to every " +
        s"executor; it exceeds maxProbeRows=$maxProbeRows here. Lower the " +
        s"probe sample rate (the corpus side is unbounded — only probes " +
        s"are gated), or raise the cap explicitly if executors can hold " +
        s"the probe set.")
    // one row per probe id: the documented precondition for collect-
    // form equivalence (see scaladoc) — fail fast instead of merging
    // duplicate ids into one ranked list
    require(collected.iterator.map(_._1).toSet.size == collected.length,
      "annBruteForceDistributed needs distinct probe ids (duplicate ids " +
        "would collapse into one merged top-k, diverging from the " +
        "per-row collect form) — dedupe the probe set first")
    val bcast = spark.sparkContext.broadcast(
      collected.map { case (id, v) => (id, v, normF(v)) })
    val corpusDs = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
    val partials = corpusDs.mapPartitions { rows =>
      val pr = bcast.value
      val np = pr.length
      if (np == 0 || !rows.hasNext) Iterator.empty
      else {
        val bufs = Array.fill(np)(new BoundedTopK(k))
        while (rows.hasNext) {
          val (cid, cv) = rows.next()
          val nb = normF(cv)
          var p = 0
          while (p < np) {
            val (pid, pv, na) = pr(p)
            if (cid != pid) {
              val cos =
                if (na == 0.0 || nb == 0.0) 0.0
                else dotF(pv, cv) / (math.sqrt(na) * math.sqrt(nb))
              bufs(p).insert(cid, cos)
            }
            p += 1
          }
        }
        (0 until np).iterator.flatMap { p =>
          val b = bufs(p)
          (0 until b.filled).iterator.map(r => (pr(p)._1, b.ids(r), b.cos(r)))
        }
      }
    }.toDF("vec_id", "neighbor_id", "cos_sim")
    topKWithin(partials, k)
  }

  /** Centroid-distance outlier gate: flag vectors whose L2 distance
    * from the corpus mean exceeds `threshold` — the embedding-space
    * cleaning pass that catches mis-embedded/corrupt rows (a zeroed
    * or wild vector sits far from the data shell). Engine-exact by
    * the same quantized-integer route as k-means/covariance: one
    * [[graft.functions.QuantizedVectorSum]] pass gives exact
    * per-dimension sums, and each vector's squared distance is the
    * INTEGER Σ(n·qᵢ − sxᵢ)² folded in decimal — no float mean ever
    * materializes, so partition order cannot move a bit. The
    * distance is sqrt(Σ)/(n·10⁶), back in embedding units. Two
    * passes total: the sum aggregate and one projection.
    */
  def embeddingOutliers(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val e = df.select(col(idCol), col(vecCol).as("_v"))
      .filter(col("_v").isNotNull)
    val s = e.agg(VectorFunctions.quantizedVectorSum(col("_v")).as("s"))
      .select(col("s.n"), col("s.sx")).head()
    val n = s.getLong(0)
    require(n > 0, "embeddingOutliers needs at least one vector")
    // exact sums fit a long far beyond any real corpus (n·10⁶·|x|
    // per dimension); longValueExact fails loudly rather than wrap
    val sums = array(s.getSeq[java.math.BigDecimal](1)
      .map(d => lit(d.longValueExact())): _*)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val qs = transform(col("_v"),
      x => floor(x.cast("double") * lit(1000000.0)).cast("long"))
    val diffs = zip_with(qs, sums, (q, sxi) => lit(n) * q - sxi)
    val d2 = aggregate(diffs, lit(java.math.BigDecimal.ZERO).cast(dec),
      (acc, d) => acc + d.cast(dec) * d.cast(dec))
    val dist = sqrt(d2.cast("double")) / lit(n.toDouble * 1000000.0)
    e.select(col(idCol), dist.as("dist"),
      (dist > threshold).as("is_outlier"))
  }

  /** Recall@k harness for the ANN family: per query vector, the
    * fraction of the exact ground-truth neighbor set an approximate
    * result retrieved. Takes any two (vec_id, neighbor_id) frames,
    * so it scores LSH vs brute force, IVF vs brute force, or one
    * approximate index against another after a parameter change —
    * the accept/reject evidence for every recall/latency trade the
    * ANN operators expose. Both sides are reduced to DISTINCT pairs
    * first: recall is a set measure, and a multi-probe index that
    * reports a neighbor twice must not count it twice (nor may a
    * duplicated truth row inflate the denominator). The join carries
    * k·N rows per side (the RESULTS, never the corpus); at 100 TB
    * the ground truth comes from the brute-force baseline on a
    * sampled query subset, which is exactly how recall is audited in
    * production ANN systems.
    */
  def annRecall(truth: DataFrame, approx: DataFrame): DataFrame =
    truth.select(col("vec_id"), col("neighbor_id")).distinct()
      .join(approx.select(col("vec_id"), col("neighbor_id"),
        lit(1).as("_hit")).distinct(),
        Seq("vec_id", "neighbor_id"), "left")
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_true"), count(col("_hit")).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_true"))

  /** SAMPLED recall@k audit — the form that is itself 100 TB-runnable:
    * exact ground truth is computed only for a deterministic probe
    * sample of queries (each probe scans the corpus once — cost
    * linear in |probes|·|corpus|, where the full audit's exact side
    * is |corpus|²), and the approximate index's results are scored on
    * exactly that subset. The probe rule is the engine's standard
    * hash-bucket draw ([[Sampling.hashBucket]]: salted md5 → uniform
    * [0, 2³²) bucket, keep iff bucket < rate·2³²) — no RNG, stable
    * under re-runs/repartitioning, monotone in `rate` (raising the
    * rate EXTENDS the probe set), portable to any engine with md5,
    * and salted so it decorrelates from every other bucket use of the
    * id. Per-probe rows are value-identical to the full audit's rows
    * for the same queries (the truth side is the same exact top-k);
    * the sampled MEAN recall estimates the full mean with the usual
    * √|probes| error — DedupSpec pins both properties.
    *
    * The truth side runs [[annBruteForceDistributed]]: the sampled
    * PROBE set (small by construction — rate·N, gated by
    * `maxProbeRows`) is broadcast, the CORPUS is scanned distributed
    * and is unbounded. Nothing corpus-sized ever reaches the driver,
    * so the audit itself is 100 TB-runnable, not just linear-cost.
    */
  def annRecallSampled(df: DataFrame, idCol: String, vecCol: String,
                       approx: DataFrame, k: Int = 5, rate: Double = 0.1,
                       salt: String = "annprobe",
                       maxProbeRows: Int = 1000000): DataFrame = {
    require(rate > 0 && rate <= 1.0, s"rate must be in (0, 1], got $rate")
    val bucket = Sampling.hashBucket(
      concat(lit(s"$salt:"), col(idCol).cast("string")))
    val probes = df.filter(bucket < rate * 4294967296.0)
    val truth = annBruteForceDistributed(probes, df, idCol, vecCol,
      k, maxProbeRows)
    // semi-join the approx side down to the probes BEFORE its
    // distinct: recall only reads probe rows, and the distinct would
    // otherwise shuffle the full k·N result set
    annRecall(truth,
      approx.join(probes.select(col(idCol).cast("long").as("vec_id")),
        Seq("vec_id"), "left_semi"))
  }

  /** Reference join+window formulation of #32 (kept for the
    * result-equality spec and as the shape that works when neither
    * side broadcasts).
    */
  def annBruteForceJoin(df: DataFrame, idCol: String, vecCol: String,
                        k: Int = 5): DataFrame = {
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val half = e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"),
        VectorFunctions.cosineSim(col("a.v"), col("b.v")).as("cos_sim"))
    val pairs = half
      .select(col("ida").as("vec_id"), col("idb").as("neighbor_id"), col("cos_sim"))
      .unionByName(half.select(col("idb").as("vec_id"),
        col("ida").as("neighbor_id"), col("cos_sim")))
    topKWithin(pairs, k)
  }

  /** Same op order as VectorOps.dot/selfNorm so results are
    * bit-identical to the Column-expression formulations.
    */
  private def dotF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    dot
  }

  private def normF(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val x = a(i).toDouble; s += x * x; i += 1 }
    s
  }

  /** Cosine from a pair dot and per-vector norms — the column-side
    * twin of the kernel above (and of VectorOps.cosine's zero-norm
    * contract).
    *
    * CONTRACT: vectors must share one fixed dimension (the embeddings
    * schema guarantees it). The dot runs over the shared prefix while
    * each norm covers its full vector, so a truncated/corrupt row
    * would yield a deflated cosine here but a prefix cosine from
    * VectorOps.cosine — equal-length input is what makes the two
    * formulations (and the DuckDB oracles) bit-identical.
    */
  private[operators] def cosFromParts(dot: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot / (sqrt(na) * sqrt(nb)))

  /** IVF-style ANN (inverted-file index), the second scale path next
    * to `annLsh`. A deterministic multiplicative-hash sample of
    * `nlist` vectors serves as the coarse quantizer: every vector is
    * assigned to its nearest centroid (= its inverted list) and each
    * probe vector searches the `nprobe` nearest lists. The assignment
    * join broadcasts only the nlist centroid rows (bounded small —
    * it is a BroadcastNestedLoopJoin by shape but O(N*nlist) by
    * cost), and the candidate join is an EQUI-join on centroid id:
    * at 100 TB the inverted lists are plain hash partitions, no
    * all-pairs step anywhere. Recall tunes via nprobe/nlist.
    *
    * Centroids come from a reproducible Lehmer-hash sample rather than
    * k-means: Lloyd refinement averages floats in partition order,
    * which is not reproducible across engines/runs (so not
    * oracle-able); at scale you would refine on a driver-side sample
    * and accept approximate centroids. List assignment is a single
    * codegen'd `NearestCentroids` projection over the plan-embedded
    * centroid arrays (nlist rows, collected once — the quantizer is
    * driver-sized by construction, exactly like a trained k-means
    * model) that emits each row's top-nprobe list ids nearest-first:
    * no crossJoin, no window, no N×nlist intermediate. The assigned
    * frame is materialized once (graft.Materialize seam) — both the
    * inverted lists (element 0 = nearest centroid) and the exploded
    * N×nprobe probe set read from it, so the scan and the
    * assignment kernel run exactly once.
    *
    * `nlist = 0` (the default) AUTO-SIZES the quantizer to
    * clamp(⌈√N⌉, 64, 4096) — the standard IVF sizing rule. A fixed
    * nlist quietly turns quadratic as the corpus grows: total pair
    * cost is Σ|list|·|probers| ≈ N²·nprobe/nlist, so sf10 (2M
    * vectors) at the old fixed 64 ground through ~10¹¹ pairs (199 s,
    * 92 GB spill) where √N sizing (1414 lists) keeps mean lists at
    * √N. The upper clamp bounds the plan-embedded centroid array
    * (4096 × d floats ≈ 1 MB at d=64); beyond it bring a trained
    * quantizer via [[annIvfWith]]. The auto rule is mirrored in the
    * SQL oracle as a subquery LIMIT (both engines' sqrt are
    * correctly-rounded IEEE, so the integer agrees), and at the
    * verify SF it evaluates to the old 64 exactly.
    */
  def annIvf(df: DataFrame, idCol: String, vecCol: String,
             k: Int = 5, nlist: Int = 0, nprobe: Int = 4,
             maxList: Int = 10000): DataFrame = {
    val nl =
      if (nlist > 0) nlist
      else math.max(64, math.min(4096,
        math.ceil(math.sqrt(df.count().toDouble)).toLong)).toInt
    // Lehmer-style modular hash picks the sample: (id mod p) * a mod p
    // with p = 2^31-1 never exceeds ~1.04e14, so it cannot overflow
    // int64 for ANY id (a raw Knuth multiply would — an
    // ArithmeticException under ANSI mode at snowflake-scale ids)
    // The sample job carries only (id, v): norms for the nlist chosen
    // centroids are folded on the driver with the SAME accumulation
    // order as the SelfNorm kernel (bit-identical doubles), so the
    // TakeOrdered scan does no per-row norm work
    val centRows = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull) // a null vector cannot quantize
      .orderBy(pmod(pmod(col("id"), lit(2147483647L)) * lit(48271L),
        lit(2147483647L)).asc, col("id").asc)
      .limit(nl)
      .collect()
    annIvfWith(df, idCol, vecCol,
      centRows.map(_.getLong(0)),
      centRows.map(_.getSeq[Float](1).toArray), k, nprobe, maxList)
  }

  /** [[annIvf]] with an EXPLICIT coarse quantizer — the IVF query
    * given trained centroids. Exposed separately so an epoch-frozen
    * index ([[annIvfIncremental]]) and its batch recompute share one
    * quantizer, and so a caller can bring a better-trained one
    * (k-means on a driver-side sample) than the default Lehmer draw.
    */
  def annIvfWith(df: DataFrame, idCol: String, vecCol: String,
                 centIds: Array[Long], centVecs: Array[Array[Float]],
                 k: Int = 5, nprobe: Int = 4,
                 maxList: Int = 10000): DataFrame = {
    val centNorms = centVecs.map(normF)
    val e = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      VectorFunctions.selfNorm(col(vecCol)).as("nn"))
    val assigned = e
      .withColumn("cids", VectorFunctions.nearestCentroids(col("v"),
        centIds, centVecs, centNorms, nprobe))
      .transform(graft.Materialize.eager)
    // maxList is the degenerate-inverted-list guard the other
    // bucketed generators carry (capFloodBuckets): a mis-sized
    // quantizer (nlist ≪ √N) or a mass-duplicated corpus makes some
    // list corpus-scale, and probes × that list is the quadratic the
    // r14 sf10 probe hit (nlist=64 over 2M vectors: ~31k-row lists,
    // ~2.5e11 pairs, 31 GB of sort spill before the kill). Over-cap
    // lists leave the INDEX side only — their members still probe
    // (the multi-probe lesson), so they keep the recall their other
    // probed lists offer. The primary scale lever remains sizing
    // nlist ≈ √N; the cap is the guard for the corpus nobody
    // anticipated. The incremental member's batch-equality contract
    // is against the UNCAPPED recompute — pass Int.MaxValue when
    // comparing at a scale where the cap fires.
    val lists = capFloodBuckets(
      assigned
        .select(col("cids").getItem(0).as("mcid"),
          col("id").as("neighbor_id"), col("v").as("mv"),
          col("nn").as("mn")),
      maxList, "mcid")
    val probes = assigned
      .select(col("id"), col("v"), col("nn"), explode(col("cids")).as("cid"))
    val pairs = probes.join(lists,
        col("cid") === col("mcid") && col("id") =!= col("neighbor_id"))
      .select(col("id").as("vec_id"), col("neighbor_id"),
        cosFromParts(VectorFunctions.dotProduct(col("v"), col("mv")),
          col("nn"), col("mn")).as("cos_sim"))
    topKWithin(pairs, k)
  }

  /** The deterministic Lehmer-ordered training sample both PQ
    * quantizer levels draw from — one bounded collect (`n` rows of
    * (id, v), ordered by the same modular hash as [[annIvf]]'s
    * centroid draw so index builds stay reproducible across runs
    * and engines).
    */
  private def pqSample(df: DataFrame, idCol: String, vecCol: String,
                       n: Int): Array[Array[Float]] =
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .orderBy(pmod(pmod(col("id"), lit(2147483647L)) * lit(48271L),
        lit(2147483647L)).asc, col("id").asc)
      .limit(n)
      .collect()
      .map(_.getSeq[Float](1).toArray)

  /** Driver-side cosine k-means refinement of the coarse quantizer:
    * Lloyd iterations where assignment is the EXECUTORS' OWN
    * [[graft.functions.VectorOps.nearestCentroids]] kernel
    * (nprobe=1 — cosine, NaN-ordered, lowest-id ties) and the update
    * is the fixed-order double mean, so the refinement is exactly
    * reproducible and train-time assignment ≡ index-time assignment.
    * Empty clusters keep their previous centroid (they can re-fill
    * as neighbors move). Magnitude of the mean is irrelevant under
    * cosine assignment, so no explicit normalization step is needed.
    */
  private[operators] def refineCoarseCosine(train: Array[Array[Float]],
                                            nlist: Int,
                                            iters: Int = 10): Array[Array[Float]] = {
    val d = train.head.length
    var cents = train.take(math.min(nlist, train.length)).map(_.clone())
    val ids = Array.tabulate(cents.length)(_.toLong)
    var it = 0
    while (it < iters) {
      val norms = cents.map(normF)
      val sums = Array.fill(cents.length, d)(0.0)
      val cnts = new Array[Long](cents.length)
      train.foreach { v =>
        val c = graft.functions.VectorOps.nearestCentroids(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
          ids, cents, norms, 1).getLong(0).toInt
        var i = 0
        while (i < d) { sums(c)(i) += v(i).toDouble; i += 1 }
        cnts(c) += 1L
      }
      cents = Array.tabulate(cents.length) { c =>
        if (cnts(c) == 0L) cents(c)
        else Array.tabulate(d)(i => (sums(c)(i) / cnts(c)).toFloat)
      }
      it += 1
    }
    cents
  }

  /** The coarse quantizer [[annIvfPq]] trains — exposed so callers
    * (and the recall spec) can run [[annIvfWith]] on the IDENTICAL
    * refined centroids: that is the exact-scored ceiling for the
    * PQ pipeline's candidate pool. Ids are list indices 0..nlist-1
    * (synthetic — nothing downstream needs row ids).
    */
  def pqCoarse(df: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 64, ksub: Int = 64): (Array[Long], Array[Array[Float]]) = {
    val train = pqSample(df, idCol, vecCol, math.max(4 * nlist, 4 * ksub))
    require(train.nonEmpty, "pqCoarse: empty corpus")
    val cents = refineCoarseCosine(train, nlist)
    (Array.tabulate(cents.length)(_.toLong), cents)
  }

  /** IVF-PQ ANN: [[annIvf]]'s inverted-list candidate generation with
    * PRODUCT-QUANTIZED scoring (Jégou et al. 2011, the billion-scale
    * pairing) — the candidate side of the shuffle carries `m` small
    * codes plus one norm instead of the full d-float vector. At d=64
    * floats that is 256 B → ~24 B per list member: the inverted
    * lists, which at 100 TB ARE the data volume, shrink ~10×, while
    * probes score candidates by ADC table lookups (asymmetric
    * distance: the probe keeps its exact vector, each of its m
    * sub-slices is dotted against all ksub codewords ONCE per probe
    * row, and a candidate costs m array lookups + a fixed-order sum).
    *
    * BOTH quantizer levels are trained on one deterministic Lehmer
    * sample (parameter-bounded: max(4·nlist, 4·ksub) rows, never
    * corpus-sized) and Lloyd-refined ON THE DRIVER — single-threaded
    * fixed-order folds, so unlike a distributed Lloyd
    * (partition-order float averaging, the [[annIvf]] rationale) the
    * refinement is exactly reproducible. The COARSE level is
    * cosine-k-means ([[pqCoarse]]): unlike [[annIvf]], whose
    * raw-sampled centroids are pinned by its kernel-exact SQL
    * oracle, this entry is rows-only declared, so it can afford the
    * better quantizer — refined lists lift candidate-pool recall,
    * the binding constraint once rerank recovers exact scores
    * (measured on the sf0.01 corpus at nlist=64/nprobe=4: reranked
    * mean recall@5 0.34 with raw-slice codes on the sampled
    * quantizer → 0.43 with projection-residual codes on the refined
    * one, at
    * identical m/ksub/nprobe). Every float op is
    * fixed-order, so the output is deterministic (rows-only entry;
    * recall floor vs brute force is spec-pinned).
    *
    * `approx_cos` reconstructs cosine from the ADC dot and the EXACT
    * stored norms, so it can slightly exceed [-1, 1] (the
    * reconstruction is not the original vector) — ranking quality is
    * what PQ preserves, not the score value. d must divide by m.
    *
    * `opqIters` > 0 learns an OPQ rotation (Ge et al., CVPR 2013)
    * of the residual space before sub-quantization — better codes at
    * identical storage. MEASURED on the 64-d corpora (sf0.001 and
    * sf0.01, identical nlist/nprobe/m/ksub): pure ADC ranking
    * (rerank=0) lifts recall@5 0.383→0.399 / 0.368→0.383 at 4
    * iterations, rerank=2 lifts ~1 point — but at the SHIPPED
    * rerank=8 knee the rotation is exactly neutral (0.5628→0.5616 /
    * 0.5460→0.5460): the exact-rescored shortlist already recovers
    * its candidate-pool ceiling, so the POOL binds, not the codes
    * (nprobe is the lever there). Default 0 — the default pipeline
    * sits at that knee, and the rotation costs a driver fit plus d
    * dot kernels per row for a provably-zero recall return;
    * DedupSpec pins both sides of this measurement.
    *
    * `rerank` > 0 runs the standard two-stage IVF-PQ pipeline: ADC
    * prunes each probe's candidates to a rerank·k shortlist, and
    * only shortlist pairs fetch exact vectors back (an id equi-join
    * moving |probes|·rerank·k narrow rows) for exact-cosine
    * re-scoring, while the inverted-list shuffle stays coded.
    * `rerank = 0` returns raw ADC ranks (projection-residual codes —
    * see [[graft.functions.VectorOps.pqEncode]]).
    *
    * Default depths sit at the MEASURED knee (DedupSpec's
    * rerank-depth curve, sf0.01): rerank=8 is where the reranked
    * recall lands exactly ON the exact-scored ceiling of its own
    * candidate pool (0.4348 at nprobe=4 — deeper shortlists buy
    * nothing), so past it only the POOL binds — and nprobe=8 spends
    * the ~10× row-width savings of the coded lists on twice the
    * probes (8 probes × ~24 B rows ≈ 0.8× the shuffle bytes of
    * exact IVF's 4 × 256 B), lifting recall@5 to 0.5628 — ABOVE
    * exact [[annIvf]] at its own defaults (0.44). Neither knob
    * touches stored bytes; both are query-time trades.
    */
  def annIvfPq(df: DataFrame, idCol: String, vecCol: String,
               k: Int = 5, nlist: Int = 0, nprobe: Int = 8,
               m: Int = 8, ksub: Int = 64, rerank: Int = 8,
               maxList: Int = 10000, opqIters: Int = 0): DataFrame = {
    // nlist = 0 auto-sizes to clamp(⌈√N⌉, 64, 1024) — the annIvf
    // sizing rule with a LOWER clamp: this quantizer is driver-Lloyd
    // TRAINED (O(sample·nlist·d) single-threaded, vs annIvf's free
    // draw), and 1024 keeps the fit in seconds. Beyond the clamp,
    // train outside and use the building blocks directly.
    val nl =
      if (nlist > 0) nlist
      else math.max(64, math.min(1024,
        math.ceil(math.sqrt(df.count().toDouble)).toLong)).toInt
    val trainVecs = pqSample(df, idCol, vecCol,
      math.max(4 * nl, 4 * ksub))
    require(trainVecs.nonEmpty, "annIvfPq: empty corpus")
    val centVecs = refineCoarseCosine(trainVecs, nl)
    val centIds = Array.tabulate(centVecs.length)(_.toLong)
    val centNorms = centVecs.map(normF)
    val d = trainVecs.head.length
    require(d % m == 0, s"annIvfPq: dim $d must divide by m=$m")
    val dsub = d / m
    // RESIDUAL training set (standard IVF-PQ, Jégou et al. 2011
    // §III): each sample vector is residualized against its own
    // coarse centroid — THE SAME kernel the executors use for list
    // assignment (nprobe=1 through VectorOps.nearestCentroids), so
    // training and encoding agree bit-for-bit. Residuals concentrate
    // sub-vector variance near the origin; on this corpus the switch
    // from raw slices lifted reranked recall@3 0.37 → parity with
    // exact-scored IVF on the same candidate pool (the PQ ceiling).
    val trainRes: Array[Array[Float]] = trainVecs.map { vec =>
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(vec)
      val cid = graft.functions.VectorOps.nearestCentroids(
        ad, centIds, centVecs, centNorms, 1).getLong(0)
      val alpha = graft.functions.VectorOps.projCoeff(
        ad, cid, centIds, centVecs, centNorms)
      val cv = centVecs(centIds.indexOf(cid))
      Array.tabulate(vec.length)(i =>
        (vec(i).toDouble - alpha * cv(i).toDouble).toFloat)
    }
    // OPQ (Ge et al., CVPR 2013): learn an orthogonal rotation of
    // the RESIDUAL space that minimizes sub-quantization error, so
    // the m independent codebooks see balanced, decorrelated slices.
    // dot(q, r) = dot(Rq, Rr) for orthogonal R, so the ADC identity
    // is unchanged — members store codes of the ROTATED residual,
    // probes build their tables from the ROTATED query. Identity
    // when opqIters = 0 (the pre-r15 pipeline, bit-for-bit).
    val rot: Option[Array[Array[Float]]] =
      if (opqIters <= 0) None
      else Some(opqRotation(trainRes, m, ksub, opqIters))
    def rotated(x: Array[Float]): Array[Float] = rot match {
      case None => x
      case Some(r) =>
        Array.tabulate(x.length) { i =>
          var s = 0.0; var j = 0
          while (j < x.length) { s += r(i)(j).toDouble * x(j).toDouble; j += 1 }
          s.toFloat
        }
    }
    // codebooks(j)(c): (rotated) residual sub-slice j, Lloyd-refined
    // on the driver (sequential fixed-order folds — reproducible)
    val codebooks: Array[Array[Array[Float]]] =
      trainPqCodebooks(trainRes.map(rotated), m, ksub)
    // the encode/table side needs the member residual and the probe
    // vector in the SAME rotated frame: rotate centroids once (the
    // residual R(v - αc) = Rv - α·Rc, and α is rotation-invariant),
    // and add a per-row rotated-vector projection (d codegen'd dot
    // kernels against literal rotation rows) only when OPQ is on
    val encCentVecs = rot.map(_ => centVecs.map(rotated)).getOrElse(centVecs)
    val encCentNorms = encCentVecs.map(normF)
    val e0 = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      VectorFunctions.selfNorm(col(vecCol)).as("nn"))
    val e = rot match {
      case None => e0.withColumn("rv", col("v"))
      case Some(r) =>
        e0.withColumn("rv", array(r.indices.map(i =>
          VectorFunctions.dotProduct(col("v"), typedLit(r(i)))
            .cast("float")): _*))
    }
    // probe-side ADC dot tables (m × ksub sub-dots): computed ONCE
    // per vector INSIDE the materialized assignment — behind the
    // explode they would re-evaluate per probed list (nprobe×), and
    // the m·ksub sub-dots are ~ksub/m full-dim dots, the dominant
    // per-row cost. The materialization stores m·ksub doubles per
    // row (4 KB at the defaults) — the classic PQ trade: pay table
    // memory once, score candidates by lookup. The probe side is NOT
    // residualized: dot(q, v) = α·dot(q, c) + Σ_j dot(q_j, r_j)
    // exactly — the correction term rides in `cdots`, one double per
    // probed list, computed against the same embedded quantizer, and
    // the member's α is one stored double.
    val tables = array((0 until m).map { j =>
      array(codebooks(j).indices.map { c =>
        VectorFunctions.dotProduct(
          slice(col("rv"), j * dsub + 1, dsub),
          typedLit(codebooks(j)(c)))
      }: _*)
    }: _*)
    val assigned = e
      .withColumn("cids", VectorFunctions.nearestCentroids(col("v"),
        centIds, centVecs, centNorms, nprobe))
      .withColumn("codes", VectorFunctions.pqEncode(col("rv"),
        col("cids").getItem(0), centIds, encCentVecs, encCentNorms,
        codebooks))
      .withColumn("alpha", VectorFunctions.projCoeff(col("v"),
        col("cids").getItem(0), centIds, centVecs, centNorms))
      .withColumn("cdots", VectorFunctions.centroidDots(col("v"),
        col("cids"), centIds, centVecs))
      .withColumn("tbl", tables)
      .transform(graft.Materialize.eager)
    // candidate side: codes + norm + projection scale only — still
    // the ~10x-narrower shuffle; maxList = the same degenerate-list
    // guard as annIvfWith (index side only, members still probe)
    val lists = capFloodBuckets(
      assigned
        .select(col("cids").getItem(0).as("mcid"),
          col("id").as("neighbor_id"), col("codes").as("mcodes"),
          col("nn").as("mn"), col("alpha").as("malpha")),
      maxList, "mcid")
    val probes = assigned
      .select(col("id"), col("nn"), col("tbl"),
        explode(arrays_zip(col("cids"), col("cdots"))).as("pz"))
      .select(col("id"), col("nn"), col("tbl"),
        col("pz.cids").as("cid"), col("pz.cdots").as("cdot"))
    // allocation-free codegen kernel — the HOF zip_with+aggregate
    // form allocates an array per PAIR and dominated the pair scan
    val adc = VectorFunctions.adcDot(col("mcodes"), col("tbl"))
    val pairs = probes.join(lists,
        col("cid") === col("mcid") && col("id") =!= col("neighbor_id"))
      .select(col("id").as("vec_id"), col("neighbor_id"),
        cosFromParts(col("malpha") * col("cdot") + adc,
          col("nn"), col("mn")).as("cos_sim"))
    if (rerank <= 0) topKWithin(pairs, k)
    else {
      // standard IVF-PQ + rerank: ADC prunes each probe's candidates
      // to a rerank·k shortlist (the only place full lists exist),
      // then ONLY shortlist pairs fetch exact vectors back by id and
      // re-score with the exact cosine — the wide-vector join moves
      // |probes|·rerank·k rows, never the inverted lists
      val shortlist = topKWithin(pairs, rerank * k)
        .select(col("vec_id"), col("neighbor_id"))
      val exact = shortlist
        .join(e.select(col("id").as("vec_id"), col("v").as("pv"),
          col("nn").as("pn")), Seq("vec_id"))
        .join(e.select(col("id").as("neighbor_id"), col("v").as("qv"),
          col("nn").as("qn")), Seq("neighbor_id"))
        .select(col("vec_id"), col("neighbor_id"),
          cosFromParts(VectorFunctions.dotProduct(col("pv"), col("qv")),
            col("pn"), col("qn")).as("cos_sim"))
      topKWithin(exact, k)
    }
  }

  /** Driver-side Lloyd for the PQ sub-codebooks: `pts` are full-dim
    * (rotated) residuals; one ksub-codeword book per dsub slice.
    * Sequential fixed-order folds — exactly reproducible, unlike a
    * distributed Lloyd's partition-order float averaging.
    */
  private def trainPqCodebooks(pts: Array[Array[Float]], m: Int,
                               ksub: Int): Array[Array[Array[Float]]] = {
    val d = pts.head.length
    val dsub = d / m
    Array.tabulate(m) { j =>
      val sub = pts.map(_.slice(j * dsub, (j + 1) * dsub))
      var cents = pts.take(math.min(ksub, pts.length))
        .map(_.slice(j * dsub, (j + 1) * dsub))
      var it = 0
      while (it < 10) {
        val sums = Array.fill(cents.length, dsub)(0.0)
        val cnts = new Array[Long](cents.length)
        sub.foreach { p =>
          val best = nearestCodeword(p, 0, cents, dsub)
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i).toDouble; i += 1 }
          cnts(best) += 1L
        }
        cents = Array.tabulate(cents.length) { c =>
          if (cnts(c) == 0L) cents(c) // empty cluster keeps its codeword
          else Array.tabulate(dsub)(i => (sums(c)(i) / cnts(c)).toFloat)
        }
        it += 1
      }
      cents
    }
  }

  /** Nearest codeword (L2) for the dsub-slice of `p` starting at
    * `off` — the driver twin of the executor-side PQ assignment.
    */
  private def nearestCodeword(p: Array[Float], off: Int,
                              book: Array[Array[Float]], dsub: Int): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < book.length) {
      var s = 0.0; var i = 0
      while (i < dsub) {
        val diff = p(off + i).toDouble - book(c)(i).toDouble
        s += diff * diff; i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** OPQ-NP rotation (Ge et al., "Optimized Product Quantization",
    * CVPR 2013 — the non-parametric alternation): learn an
    * orthogonal R minimizing Σ‖R·xᵢ − x̂ᵢ‖², x̂ the PQ
    * reconstruction of R·xᵢ. Each iteration (a) Lloyd-trains the m
    * sub-codebooks on the rotated residuals, (b) reconstructs, and
    * (c) solves the orthogonal Procrustes step R = U·Vᵀ from
    * M = Σ x̂ xᵀ — SVD obtained through the existing symmetric
    * Jacobi ([[jacobiEigen]]): MᵀM = V·S²·Vᵀ, U = M·V·S⁻¹. All on
    * the driver over the parameter-bounded training sample;
    * deterministic (fixed-order folds, Jacobi on a fixed matrix).
    * Falls back to the last good rotation if M degenerates (tiny
    * singular values — e.g. a rank-collapsed residual cloud).
    * Returns R row-major: `rotated_i = dot(R(i), x)`.
    */
  private[operators] def opqRotation(train: Array[Array[Float]], m: Int,
                                     ksub: Int,
                                     iters: Int): Array[Array[Float]] = {
    val d = train.head.length
    val dsub = d / m
    var r: Array[Array[Float]] =
      Array.tabulate(d, d)((i, j) => if (i == j) 1.0f else 0.0f)
    def rotate(x: Array[Float]): Array[Float] =
      Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += r(i)(j).toDouble * x(j).toDouble; j += 1 }
        s.toFloat
      }
    var it = 0
    var degenerate = false
    while (it < iters && !degenerate) {
      val xr = train.map(rotate)
      val books = trainPqCodebooks(xr, m, ksub)
      // M = Σ x̂ xᵀ over the ORIGINAL residuals
      val mm = Array.ofDim[Double](d, d)
      var n = 0
      while (n < train.length) {
        val x = train(n); val z = xr(n)
        val xh = new Array[Double](d)
        var j = 0
        while (j < m) {
          val c = books(j)(nearestCodeword(z, j * dsub, books(j), dsub))
          var i = 0
          while (i < dsub) { xh(j * dsub + i) = c(i).toDouble; i += 1 }
          j += 1
        }
        var i = 0
        while (i < d) {
          if (xh(i) != 0.0) {
            var jj = 0
            while (jj < d) { mm(i)(jj) += xh(i) * x(jj).toDouble; jj += 1 }
          }
          i += 1
        }
        n += 1
      }
      // Procrustes: MᵀM = V S² Vᵀ (Jacobi), U = M V S⁻¹, R = U Vᵀ
      val b = Array.tabulate(d, d) { (i, j) =>
        var s = 0.0; var kk = 0
        while (kk < d) { s += mm(kk)(i) * mm(kk)(j); kk += 1 }
        s
      }
      val (vals, vecs) = jacobiEigen(b)
      val maxVal = vals.max
      if (maxVal <= 0.0) degenerate = true
      else {
        val s = vals.map(v => math.sqrt(math.max(v, 0.0)))
        if (s.exists(_ < 1e-9 * math.sqrt(maxVal))) degenerate = true
        else {
          // u(:,c) = M v(:,c) / s(c)
          val u = Array.ofDim[Double](d, d)
          var c = 0
          while (c < d) {
            var i = 0
            while (i < d) {
              var acc = 0.0; var kk = 0
              while (kk < d) { acc += mm(i)(kk) * vecs(kk)(c); kk += 1 }
              u(i)(c) = acc / s(c)
              i += 1
            }
            c += 1
          }
          r = Array.tabulate(d, d) { (i, j) =>
            var acc = 0.0; var kk = 0
            while (kk < d) { acc += u(i)(kk) * vecs(j)(kk); kk += 1 }
            acc.toFloat
          }
        }
      }
      it += 1
    }
    r
  }

  /** Incremental [[annIvf]] — IVF inverted-list maintenance across
    * micro-batches, the ANN member of the incremental gold-hop
    * family (same keyed-state + signature-staleness design as
    * [[Dedup.exactDedupIncremental]] and siblings; same k / nlist /
    * nprobe across calls).
    *
    * The coarse quantizer is FROZEN per epoch: the first non-empty
    * batch draws the same Lehmer sample [[annIvf]] would (from that
    * batch) and writes `stateDir/centroids`; every later batch
    * reuses it. Centroid drift would re-assign every list at once —
    * that is a rebuild, not an increment; re-train by starting a new
    * `stateDir` epoch. Batch-recompute equality therefore holds
    * against [[annIvfWith]] on the SAME centroids, not against
    * [[annIvf]]'s corpus-dependent draw.
    *
    * State under `stateDir`: `members` (id, v, nn, vhash, mcid,
    * cids) keyed on id, delete-then-merge per batch — mcid is the
    * vector's inverted list, cids its nprobe probe lists; `sigs`
    * (id, _probe_sig) — the staleness LEDGER, one row per live
    * vector. A vector's signature is the XOR over its probe lists
    * of the list's member signature (bit_xor over xxhash64(mcid,
    * id, vhash) — list id folded into the member hash, the family
    * rule), so any member arriving in / leaving / updating inside
    * any probed list flags every prober stale. The ledger is
    * written LAST: a crash between the gold and ledger merges
    * leaves the old signatures in place, so the replayed batch
    * re-queries the same vectors instead of going permanently
    * stale (the family's crash-self-heal argument, split across
    * two tables).
    *
    * Gold: [[annIvf]]'s (vec_id, rank, neighbor_id, cos_sim) rows
    * keyed (vec_id, rank), refreshed delete-then-merge per affected
    * vector. Per batch only stale-or-batch vectors re-query — the
    * equi-join probes their lists straight from state. The
    * per-batch O(|members| × nprobe) signature aggregation is the
    * price of exact update/delete retraction; `appendOnly` drops it
    * to the touched-list neighborhood (members never move lists on
    * an insert-only corpus, so only probers of lists the batch
    * landed in can change). Contract as the family: a delete feed
    * under `appendOnly` throws; a `fullResync` window degrades to
    * the general path. NULL vectors are excluded from state and
    * gold; an update TO null retracts like a delete.
    */
  def annIvfIncremental(spark: SparkSession, batch: DataFrame,
                        idCol: String, vecCol: String,
                        stateDir: String, goldPath: String,
                        batchOrd: Long,
                        k: Int = 5, nlist: Int = 64, nprobe: Int = 4,
                        deletes: Option[DataFrame] = None,
                        fullResync: Boolean = false,
                        appendOnly: Boolean = false,
                        fmt: graft.pipeline.TableFormat =
                          graft.pipeline.SnapshotTableFormat): Unit = {
    require(!(appendOnly && deletes.nonEmpty),
      "appendOnly declares an insert-only corpus; a delete feed " +
        "contradicts it — drop the flag and use the general path")
    val centsPath = s"$stateDir/centroids"
    val membersPath = s"$stateDir/members"
    val sigsPath = s"$stateDir/sigs"
    val batchAll = graft.Materialize.eager(
      Dedup.oneRowPerId(batch.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v")), "id", Seq("v")))
    val batchVecs = batchAll.filter(col("v").isNotNull)

    // epoch quantizer: train once, then frozen (replays skip — the
    // exists guard makes the write idempotent at window granularity)
    if (!fmt.exists(centsPath)) {
      if (batchVecs.isEmpty) return
      fmt.scd1Merge(spark, centsPath,
        batchVecs.select(col("id"), col("v"))
          .orderBy(pmod(pmod(col("id"), lit(2147483647L)) * lit(48271L),
            lit(2147483647L)).asc, col("id").asc)
          .limit(nlist).withColumn("_ord", lit(batchOrd)),
        Seq("id"), "_ord", compareExclude = Nil)
    }
    val centRows = fmt.read(spark, centsPath).select(col("id"), col("v"))
      .orderBy(col("id")).collect() // nlist rows — driver-sized
    val centIds = centRows.map(_.getLong(0))
    val centVecs = centRows.map(_.getSeq[Float](1).toArray)
    val centNorms = centVecs.map(normF)
    def assign(df: DataFrame): DataFrame = df
      .select(col("id"), col("v"),
        VectorFunctions.selfNorm(col("v")).as("nn"),
        xxhash64(col("v")).as("vhash"),
        VectorFunctions.nearestCentroids(col("v"), centIds, centVecs,
          centNorms, nprobe).as("cids"))
      .withColumn("mcid", col("cids").getItem(0))

    if (appendOnly && !fullResync) {
      if (batchVecs.isEmpty) return
      val assignedBatch = graft.Materialize.eager(assign(batchVecs))
      fmt.scd1Merge(spark, membersPath,
        assignedBatch.withColumn("_ord", lit(batchOrd)),
        Seq("id"), "_ord", compareExclude = Nil)
      val members = fmt.read(spark, membersPath)
      // new members land in their mcid lists only — the affected set
      // is every vector probing a touched list (incl. the batch:
      // a vector's own mcid is among its probe lists)
      val touched = assignedBatch.select(col("mcid").as("cid")).distinct()
      val affected = graft.Materialize.eager(
        members.select(col("id"), explode(col("cids")).as("cid"))
          .join(touched, Seq("cid"), "left_semi")
          .select(col("id")).distinct())
      // signatures for the affected only: aggregate just the lists
      // they probe (full membership of those lists is in state)
      val affLists = members.join(affected, Seq("id"), "left_semi")
        .select(explode(col("cids")).as("cid")).distinct()
      val listSigs = graft.Materialize.eager(
        members.join(affLists, col("mcid") === col("cid"), "left_semi")
          .groupBy(col("mcid"))
          .agg(expr("bit_xor(xxhash64(mcid, id, vhash))").as("_lsig")))
      val vecSigs = members.join(affected, Seq("id"), "left_semi")
        .select(col("id"), explode(col("cids")).as("cid"))
        .join(listSigs.withColumnRenamed("mcid", "cid"), Seq("cid"),
          "left_outer")
        .groupBy(col("id"))
        .agg(bit_xor(coalesce(col("_lsig"), lit(0L))).as("_sig_now"))
      ivfRefresh(spark, members, affected, vecSigs, None,
        goldPath, sigsPath, batchOrd, k, fmt)
      return
    }

    val delIds = Dedup.combinedDeletes(spark, deletes, idCol, "id",
      fullResync, membersPath, batchAll.select(col("id")), fmt)
    val drops = graft.Materialize.eager(
      delIds.fold(batchAll.filter(col("v").isNull).select(col("id")))(
        _.unionByName(batchAll.filter(col("v").isNull).select(col("id"))))
        .distinct())
    if (!batchAll.isEmpty) {
      if (fmt.exists(membersPath))
        fmt.deleteKeys(spark, membersPath,
          batchAll.select(col("id")).distinct(), Seq("id"))
      if (!batchVecs.isEmpty)
        fmt.scd1Merge(spark, membersPath,
          assign(batchVecs).withColumn("_ord", lit(batchOrd)),
          Seq("id"), "_ord", compareExclude = Nil)
    }
    delIds.foreach { d =>
      if (fmt.exists(membersPath) && !d.isEmpty)
        fmt.deleteKeys(spark, membersPath, d, Seq("id"))
    }
    if (!fmt.exists(membersPath)) return // empty first batch

    val members = fmt.read(spark, membersPath)
    val listSigs = graft.Materialize.eager(
      members.groupBy(col("mcid"))
        .agg(expr("bit_xor(xxhash64(mcid, id, vhash))").as("_lsig")))
    val vecSigs = graft.Materialize.eager(
      members.select(col("id"), explode(col("cids")).as("cid"))
        .join(listSigs.withColumnRenamed("mcid", "cid"), Seq("cid"),
          "left_outer")
        .groupBy(col("id"))
        .agg(bit_xor(coalesce(col("_lsig"), lit(0L))).as("_sig_now")))
    val affectedAll =
      if (fmt.exists(sigsPath))
        fmt.read(spark, sigsPath).select(col("id"), col("_probe_sig"))
          .join(vecSigs, Seq("id"), "left_outer")
          .filter(!(col("_probe_sig") <=> coalesce(col("_sig_now"), lit(0L))))
          .select(col("id"))
          .unionByName(batchVecs.select(col("id"))).distinct()
      else vecSigs.select(col("id")) // bootstrap: everything once
    val affected = graft.Materialize.eager(
      if (drops.isEmpty) affectedAll
      else affectedAll.join(drops, Seq("id"), "left_anti"))
    ivfRefresh(spark, members, affected, vecSigs,
      if (drops.isEmpty) None else Some(drops),
      goldPath, sigsPath, batchOrd, k, fmt)
  }

  /** Shared tail of [[annIvfIncremental]]'s two paths: re-query the
    * affected vectors against the inverted lists, refresh their gold
    * rows delete-then-merge, then write the signature ledger LAST
    * (the crash-ordering invariant) and clear dropped ids.
    */
  private def ivfRefresh(spark: SparkSession, members: DataFrame,
                         affected: DataFrame, vecSigs: DataFrame,
                         drops: Option[DataFrame],
                         goldPath: String, sigsPath: String,
                         batchOrd: Long, k: Int,
                         fmt: graft.pipeline.TableFormat): Unit = {
    val probes = members.join(affected, Seq("id"), "left_semi")
      .select(col("id"), col("v"), col("nn"), explode(col("cids")).as("cid"))
    val lists = members.select(col("mcid").as("cid"),
      col("id").as("neighbor_id"), col("v").as("mv"), col("nn").as("mn"))
    val pairs = probes.join(lists, Seq("cid"))
      .filter(col("id") =!= col("neighbor_id"))
      .select(col("id").as("vec_id"), col("neighbor_id"),
        cosFromParts(VectorFunctions.dotProduct(col("v"), col("mv")),
          col("nn"), col("mn")).as("cos_sim"))
    val newTop = graft.Materialize.eager(
      topKWithin(pairs, k).withColumn("_ord", lit(batchOrd)))
    if (fmt.exists(goldPath) && !affected.isEmpty)
      fmt.deleteKeys(spark, goldPath,
        affected.select(col("id").as("vec_id")), Seq("vec_id"))
    if (!newTop.isEmpty)
      fmt.scd1Merge(spark, goldPath, newTop, Seq("vec_id", "rank"), "_ord",
        compareExclude = Nil)
    drops.foreach { d =>
      if (fmt.exists(goldPath) && !d.isEmpty)
        fmt.deleteKeys(spark, goldPath,
          d.select(col("id").as("vec_id")), Seq("vec_id"))
    }
    // the LEDGER goes last: see annIvfIncremental's crash argument
    if (!affected.isEmpty)
      fmt.scd1Merge(spark, sigsPath,
        affected.join(vecSigs, Seq("id"), "left_outer")
          .select(col("id"),
            coalesce(col("_sig_now"), lit(0L)).as("_probe_sig"),
            lit(batchOrd).as("_ord")),
        Seq("id"), "_ord", compareExclude = Nil)
    drops.foreach { d =>
      if (fmt.exists(sigsPath) && !d.isEmpty)
        fmt.deleteKeys(spark, sigsPath, d, Seq("id"))
    }
    ()
  }

  /** #33 LSH-bucketed top-K: equi-join on SRP bucket, top-K within.
    * Norms ride the (tiny) bucket rows so in-bucket pairs compute one
    * dot each. The plan must contain NO cartesian/nested-loop join —
    * asserted in PlanSpec.
    *
    * `maxBucket` guards the m²/2 explosion of a degenerate bucket
    * (mass-duplicated or near-collinear vectors): buckets larger
    * than the cap are dropped from candidate generation entirely —
    * their vectors report no neighbors (a recall trade, same as
    * Dedup.bucketPairs' cap) instead of one task computing a
    * quadratic bucket. The bucket-id space is 2^planes, so the
    * flood set is a tiny broadcast anti-join, not a shuffle.
    *
    * `planes = 0` (the default) AUTO-SIZES the bucket space:
    * smallest planes in [6, 24] with N ≤ 512·2^planes, so expected
    * bucket size stays ~512 regardless of corpus scale — a FIXED
    * plane count quietly degenerates exactly like a fixed IVF nlist
    * (in-bucket pair cost Σ|b|² ≈ N²/2^planes; the r14 sf10 probe:
    * 2M vectors over 2⁶ buckets = every bucket ~31k, everything
    * either flood-dropped or ground through the cap boundary). The
    * rule is INTEGER-only (a log2-based rule could disagree across
    * engines near a boundary — log2 is not correctly rounded) and
    * replays in the SQL oracle as a static-range MIN; at every
    * verify SF it evaluates to the old 6 exactly.
    */
  def annLsh(df: DataFrame, idCol: String, vecCol: String,
             k: Int = 5, planes: Int = 0, seed: Long = 42L,
             maxBucket: Int = 10000): DataFrame = {
    val pl = resolvePlanes(planes, df)
    // LAZY checkpoint: the SRP projection feeds the flood count plus
    // both join sides (4 plan references) and must evaluate once —
    // but building the frame must stay side-effect-free (plan
    // inspection, conditional pipelines), so materialization waits
    // for the first action instead of running a job here. No
    // observe() rides this frame, so lazy is safe (cf. the eager
    // requirement in resolveClusters).
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.selfNorm(col(vecCol)).as("nn"),
      VectorFunctions.srpBucket(col(vecCol), pl, seed).as("bucket"))
      .transform(graft.Materialize.lazily)
    val kept = capFloodBuckets(e, maxBucket)
    val pairs = kept.as("a").join(kept.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        cosFromParts(VectorFunctions.dotProduct(col("a.v"), col("b.v")),
          col("a.nn"), col("b.nn")).as("cos_sim"))
    topKWithin(pairs, k)
  }

  /** Multi-probe [[annLsh]] (Lv et al. 2007, the standard recall
    * lever for hyperplane LSH): each vector probes its own SRP
    * bucket PLUS the `planes` buckets at Hamming distance 1 — a
    * vector near a hyperplane lands on one side, its neighbors on
    * the other, and the single-bit flips recover exactly those
    * split pairs. Equivalent recall to ~(planes+1) independent hash
    * tables at the storage/build cost of ONE: the index side of the
    * join is unchanged (each vector is stored once, under its own
    * bucket), only the probe side explodes ×(planes+1) — and probe
    * rows are (id, v, nn, pbucket), so the shuffle grows by the
    * probe fan-out, never by a second copy of the corpus. A pair
    * can match through at most one probe (XOR flips are distinct),
    * so no post-join dedup is needed. Flood-capped buckets are
    * excluded from the INDEX side ONLY: probing into one finds
    * nothing, but a capped bucket's own members still probe their
    * Hamming-1 neighborhoods (the probe side builds from the
    * UNCAPPED frame), so mass-duplicated vectors keep the recall
    * their flipped buckets offer — the cap costs their intra-bucket
    * pairs, never their whole neighborhood. The flood members'
    * probe fan-out is bounded: each probe row joins into kept
    * buckets of ≤ maxBucket rows. Kernel-exact oracle: the SQL
    * replays the bucket, the bit flips, and the sequential-fold
    * cosine bit-for-bit.
    */
  def annLshMultiprobe(df: DataFrame, idCol: String, vecCol: String,
                       k: Int = 5, planes: Int = 0, seed: Long = 42L,
                       maxBucket: Int = 10000): DataFrame = {
    val pl = resolvePlanes(planes, df)
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.selfNorm(col(vecCol)).as("nn"),
      VectorFunctions.srpBucket(col(vecCol), pl, seed).as("bucket"))
      .transform(graft.Materialize.lazily)
    val kept = capFloodBuckets(e, maxBucket)
    val flips = lit(0) +: (0 until pl).map(p => lit(1 << p))
    val probes = e.select(col("id"), col("v"), col("nn"),
      explode(array(flips.map(f => col("bucket").bitwiseXOR(f)): _*))
        .as("pbucket"))
    val pairs = probes.as("a").join(kept.as("b"),
        col("a.pbucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        cosFromParts(VectorFunctions.dotProduct(col("a.v"), col("b.v")),
          col("a.nn"), col("b.nn")).as("cos_sim"))
    topKWithin(pairs, k)
  }

  /** Smallest planes in [6, 24] with n ≤ 512·2^planes — the SRP
    * bucket-space sizing rule (expected bucket ≈ 512 docs at any
    * corpus scale). Pure integer arithmetic so the SQL oracle's
    * replay agrees exactly; 6 at every verify SF. `planes > 0`
    * passes through (explicit override; the incremental embedding
    * member NEEDS a fixed plane count across batches).
    */
  private[operators] def resolvePlanes(planes: Int, df: DataFrame): Int =
    if (planes > 0) planes
    else {
      val n = df.count()
      var p = 6
      while (p < 24 && n > (512L << p)) p += 1
      p
    }

  /** Drop rows whose bucket (SRP bucket, k-means cluster, simhash
    * chunk — any bounded-cardinality candidate key) holds more than
    * `maxBucket` vectors. The distinct bucket ids are bounded small,
    * so the flood set is broadcast and the filter is a hash
    * anti-join with no extra shuffle of the fact side.
    */
  private[operators] def capFloodBuckets(e: DataFrame, maxBucket: Int,
                                         bucketCol: String = "bucket"): DataFrame =
    if (maxBucket == Int.MaxValue) e
    else {
      val flood = e.groupBy(bucketCol).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > maxBucket).select(bucketCol)
      e.join(broadcast(flood), Seq(bucketCol), "left_anti")
    }

  /** Project embeddings onto their top-`k` principal components,
    * optionally whitened (unit variance per component) — the
    * preprocessing that restores meaning to cosine thresholds on an
    * anisotropic embedding space, and the classic dimensionality cut
    * before ANN indexing.
    *
    * Division of labor follows the data sizes: the covariance matrix
    * is computed DISTRIBUTED (see [[embeddingCovariance]] — the only
    * part that touches all N rows), its D×D result (a few thousand
    * doubles) is collected and eigendecomposed on the driver with
    * cyclic Jacobi rotations — the textbook symmetric-eigen algorithm
    * (Golub & Van Loan §8.5), exact enough in ~5 sweeps for
    * covariance matrices — and the D×k projection ships back as a
    * LITERAL in a `transform`/`aggregate` column expression: the
    * per-row projection stays inside whole-stage codegen, no UDF, no
    * broadcast join, no second pass over the corpus for the fit.
    *
    * Output: (idCol, projection array[k]). Deterministic: Jacobi on
    * a fixed matrix is deterministic, and each component's sign is
    * canonicalized (largest-|loading| coordinate positive).
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 k: Int, whiten: Boolean = false,
                 eps: Double = 1e-9): DataFrame = {
    // ONE corpus pass for the whole fit: the Gramian aggregate
    // (graft.functions.EmbeddingGramian) carries count, per-dim
    // means AND the exact covariance sums in a single fixed-size
    // buffer (the quantization-range guard fires per row inside its
    // update) — round 7 ran three separate jobs (dim-stats scan,
    // covariance count, covariance sums) over the same rows, two
    // full corpus scans too many at 100 TB.
    val g = df.agg(graft.functions.VectorFunctions.gramian(col(vecCol))
        .as("g"))
      .select(col("g.n"), col("g.means"), col("g.pairs")).head()
    val n = g.getLong(0)
    require(n >= 2, "pca needs at least two vectors")
    val mean: Array[Double] = g.getSeq[Double](1).toArray
    val d = mean.length
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    // covariance of the quantized values from the exact decimal sums,
    // same IEEE expression as embeddingCovariance's column form
    val nD = n.toDouble
    val a = Array.ofDim[Double](d, d)
    g.getSeq[org.apache.spark.sql.Row](2).foreach { p =>
      val (i, j) = (p.getLong(0).toInt, p.getLong(1).toInt)
      val c = ((p.getDecimal(2).doubleValue -
        p.getDecimal(3).doubleValue * p.getDecimal(4).doubleValue / nD)
        / (nD - 1.0)) / 1e12
      a(i)(j) = c; a(j)(i) = c
    }
    // dimension means (of the 1e-6-quantized components — identical
    // to the raw means within the grid): PCA is defined on CENTERED
    // data — projecting raw vectors would add the large shared
    // constant Vᵀμ to every output (for anisotropic spaces with a big
    // common mean, exactly the every-pair-looks-alike pathology this
    // op exists to fix). By linearity Vᵀ(x−μ) = Vᵀx − Vᵀμ, so
    // centering is a per-component constant subtracted after the dot
    // product.
    val (eigVals, eigVecs) = jacobiEigen(a)
    // top-k by eigenvalue, sign-canonicalized columns
    val order = eigVals.indices.sortBy(i => -eigVals(i)).take(k)
    val proj: Seq[Seq[Double]] = order.map { c =>
      val v = Array.tabulate(d)(r => eigVecs(r)(c))
      val dom = v.indices.maxBy(i => math.abs(v(i)))
      val sign = if (v(dom) < 0) -1.0 else 1.0
      val scale =
        if (whiten) sign / math.sqrt(math.max(eigVals(c), eps)) else sign
      v.map(_ * scale).toSeq
    }
    val offsets: Seq[Double] =
      proj.map(v => v.zip(mean).map { case (w, m) => w * m }.sum)
    val projLit = typedLit(proj)
    val offLit = typedLit(offsets)
    df.select(col(idCol),
      transform(sequence(lit(0), lit(k - 1)), kk =>
        aggregate(
          zip_with(col(vecCol).cast("array<double>"),
            element_at(projLit, kk + 1), (x, w) => x * w),
          lit(0.0), (acc, v) => acc + v) - element_at(offLit, kk + 1))
        .as("projection"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: each
    * SWEEP visits every (p, q) pair in order and applies a Givens
    * rotation wherever the off-diagonal entry is non-negligible —
    * O(D³) per sweep with no per-rotation pivot search (the classical
    * max-pivot variant pays an O(D²) scan per rotation, O(D⁴)
    * overall), converging in a handful of sweeps (Golub & Van Loan
    * §8.5). The stop criterion is RELATIVE — off-diagonal Frobenius
    * norm below 1e-12 of the matrix norm — so large-magnitude
    * covariance matrices terminate instead of chasing an absolute
    * threshold under their floating-point noise floor. Returns
    * (eigenvalues, eigenvectors-as-columns). Runs on the DRIVER —
    * fine for embedding dims, which is exactly why the covariance
    * collect is justified.
    */
  private[operators] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      math.sqrt(2.0 * s)
    }
    val frob = math.sqrt(
      (for (i <- 0 until d; j <- 0 until d) yield a(i)(j) * a(i)(j)).sum)
    val tol = 1e-12 * math.max(frob, Double.MinPositiveValue)
    var sweeps = 0
    while (d >= 2 && offNorm > tol && sweeps < 50) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > tol / d) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 // theta == 0 -> 45-degree rotation
            case x   => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val (aip, aiq) = (a(i)(p), a(i)(q))
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (j <- 0 until d) {
          val (apj, aqj) = (a(p)(j), a(q)(j))
          a(p)(j) = c * apj - s * aqj
          a(q)(j) = s * apj + c * aqj
        }
        for (i <- 0 until d) {
          val (vip, viq) = (v(i)(p), v(i)(q))
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      sweeps += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Sample covariance matrix of the embedding space (upper triangle,
    * 0-based dims) — the anisotropy diagnostic run before trusting
    * cosine similarity on a new embedding column: a dominant
    * principal direction makes every pair look alike and near-dup
    * thresholds meaningless.
    *
    * Numerics are built for ENGINE-EXACT reproducibility. Components
    * are quantized onto a fixed grid with `floor(x · 10⁶)` — floor is
    * TIE-FREE, unlike any rounding cast (a double→decimal cast
    * tie-breaks HALF_UP in Spark but not in every engine, and one
    * tied term already desyncs a cross-row sum). All sums accumulate
    * in exact 128-bit integers (associative — independent of
    * partition order, unlike double sums), and one fixed IEEE
    * expression (Sxx − Sx·Sy/N)/(N−1)/10¹² produces the covariance of
    * the quantized values; with unit-scale embeddings the 1e-6 grid
    * perturbs covariances at the 1e-6 level, far below any anisotropy
    * signal. |component| < 3000 is enforced per row inside the
    * aggregate (quantized products must fit a signed 64-bit long).
    *
    * Scale shape: ONE pass, one custom TypedImperativeAggregate
    * ([[graft.functions.EmbeddingGramian]]) folding each partition
    * into a fixed D²/2-cell buffer — only the ~34 KB buffers move at
    * the final merge; no row explosion, no join, no count job, no
    * driver matrix. (The round-7 formulation exploded D²/2 rows per
    * vector — 2,080 at D=64 — through a hash aggregate: correct, but
    * a 2,000× row amplification whose allocation churn measurably
    * taxed every query scheduled after it in a shared JVM.)
    */
  def embeddingCovariance(df: DataFrame, idCol: String,
                          vecCol: String): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(vecCol),
      s"missing column: needs $idCol and $vecCol")
    val nD = col("n").cast("double")
    // explode_OUTER: an empty corpus evals the Gramian to n=0 with
    // zero pairs, and a plain explode would emit zero rows — the
    // n<2 guard could never fire and the misconfigured pipeline
    // would pass the diagnostic silently. The outer variant emits
    // one null-pair row for exactly that case, which the guard
    // converts into the loud error.
    df.agg(graft.functions.VectorFunctions.gramian(col(vecCol)).as("g"))
      .select(col("g.n").as("n"), explode_outer(col("g.pairs")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        when(col("n") < 2,
          raise_error(lit("covariance needs at least two vectors")))
          .otherwise(((col("p.sxx").cast("double") -
            col("p.sa").cast("double") * col("p.sb").cast("double") / nD)
            / (nD - lit(1.0))) / lit(1e12)).as("cov"))
  }

  /** Symmetric int8 quantization of an embedding column — the
    * 4×-storage cut (float32 → int8 + one double scale per vector)
    * applied before archiving or ANN-indexing a 100 TB embedding
    * corpus. Per-vector scaling (scale = max|xᵢ| / 127) keeps the
    * error relative to each vector's own magnitude; reconstruction
    * `q · scale` is within scale/2 of the input per component.
    *
    * Everything is a deterministic codegen'd projection — the amax
    * fold, the divide, and the tie-free `floor(x/scale + 0.5)` grid
    * (round-half-up: unlike `round`, floor has no half-to-even
    * tie-break to desync engines) reproduce bit-identically anywhere
    * IEEE doubles do, so the operator carries a full value-exact
    * oracle. A zero vector quantizes to scale 0 and zeros
    * (dequantize maps it back to exact zeros).
    *
    * Output: (idCol, scale double, qvec array<tinyint>). No shuffle,
    * no aggregate — scan-shaped at any scale.
    */
  def quantizeEmbeddings(df: DataFrame, idCol: String,
                         vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val amax = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
    // loud non-finite guard (the repo's aggregate convention), read
    // off the amax fold itself rather than a second array scan: one
    // NaN component makes amax NaN (NaN wins greatest in Spark's
    // ordering) and ±Inf drives amax past MaxValue — so testing the
    // scalar catches every non-finite input at zero extra per-row
    // cost. (Without it, NaN→tinyint is a silent 0 — corrupt output.)
    df.select(col(idCol), amax.as("_amax"), v.as("_v"))
      .select(col(idCol),
        when(isnan(col("_amax")) || col("_amax") > lit(Double.MaxValue),
          raise_error(concat(
            lit("quantize: non-finite component in vector "),
            col(idCol).cast("string"))))
          .otherwise(col("_amax") / lit(127.0)).as("scale"), col("_v"))
      .select(col(idCol), col("scale"),
        transform(col("_v"), x =>
          when(col("scale") === 0.0, lit(0L))
            .otherwise(floor(x / col("scale") + lit(0.5)))
            .cast("tinyint")).as("qvec"))
  }

  /** Inverse of [[quantizeEmbeddings]]: `q · scale` back to float32
    * (the storage round-trip; error ≤ scale/2 per component plus
    * float rounding).
    */
  def dequantizeEmbeddings(df: DataFrame, scaleCol: String,
                           qvecCol: String, outCol: String): DataFrame =
    df.withColumn(outCol,
      transform(col(qvecCol), q =>
        (q.cast("double") * col(scaleCol)).cast("float")))

  /** L2 unit-normalization of an embedding column — the standard
    * preprocessing before cosine-threshold dedup or dot-product ANN
    * (post-normalization, dot IS cosine, so index structures can
    * skip per-pair norm work). Pure codegen projection: the norm is
    * the same `SelfNorm` fold every cosine here uses, each component
    * divides by one correctly-rounded sqrt — engine-exact, scan-
    * shaped. Zero vectors map to zeros (no NaN propagation).
    */
  def normalizeEmbeddings(df: DataFrame, idCol: String,
                          vecCol: String): DataFrame = {
    val nn = VectorFunctions.selfNorm(col(vecCol))
    df.select(col(idCol), nn.as("_nn"),
        col(vecCol).cast("array<double>").as("_v"))
      .select(col(idCol),
        when(col("_nn") === 0.0,
          transform(col("_v"), _ => lit(0.0)))
          .otherwise(transform(col("_v"), x => x / sqrt(col("_nn"))))
          .as("nvec"))
  }

  /** Reproducible distributed k-means (Lloyd) over an embedding
    * column — corpus bucketing for curriculum mixes, per-cluster
    * sampling quotas, and the trained coarse quantizer [[annIvf]]'s
    * hash-sampled one approximates.
    *
    * The classic objection to oracle-checking Lloyd is that the
    * centroid update is a float MEAN — partition-order arithmetic
    * that no second engine replays exactly. Here the update is the
    * [[graft.functions.QuantizedVectorSum]] aggregate: components
    * quantize onto the tie-free `floor(x · 10⁶)` grid, sums
    * accumulate exactly in 128-bit integers, and each centroid
    * component is then the single correctly-rounded double
    * `sx / 10⁶ / n` — so every iteration, and therefore the whole
    * fit, is bit-reproducible across runs, partitionings, AND
    * engines (the DuckDB oracle replays the full unrolled
    * iteration chain, hash-exact).
    *
    * Per-iteration shape at 100 TB: assignment is one codegen'd
    * projection against the plan-embedded k×D centroid matrix (no
    * join, no shuffle), the update is a k-group partial aggregate
    * shipping one D-length buffer per partition, and the driver
    * holds k×D doubles — Lloyd's textbook cost of one corpus pass
    * per iteration, nothing more.
    *
    * Init: the same Lehmer-hash sample as [[annIvf]]'s quantizer
    * (deterministic, SQL-expressible, no RNG). Empty clusters keep
    * their previous centroid. Ties in assignment keep the lowest
    * cluster index. Iteration count is FIXED (`iters`), not
    * convergence-gated: a data-dependent stop would make the
    * round-trip depend on float comparisons no oracle should chase,
    * and pretraining-scale corpora run a budgeted pass count anyway.
    *
    * Returns the k×D centroid matrix, cluster index = sample rank.
    */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
                k: Int = 8, iters: Int = 2): Array[Array[Double]] = {
    require(k >= 1, "k must be positive")
    require(iters >= 0, "iters must be non-negative")
    val e = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
    // Lehmer-style modular hash, same overflow-safe form as annIvf
    val lehmer = pmod(pmod(col("id"), lit(2147483647L)) * lit(48271L),
      lit(2147483647L))
    var cents: Array[Array[Double]] = e
      .orderBy(lehmer.asc, col("id").asc)
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(cents.nonEmpty, "k-means needs at least one vector")
    var it = 0
    while (it < iters) {
      val sums = e
        .groupBy(graft.functions.VectorFunctions
          .nearestCentroidIdx(col("v"), cents).as("cluster"))
        .agg(graft.functions.VectorFunctions
          .quantizedVectorSum(col("v")).as("s"))
        .select(col("cluster"), col("s.n"), col("s.sx"))
        .collect()
      val next = cents.map(_.clone()) // empty clusters keep position
      sums.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(1)
        val sx = r.getSeq[java.math.BigDecimal](2)
        // the exact same expression shape as the Gramian means:
        // correctly-rounded decimal→double, then /1e6, then /n
        next(c) = sx.map(_.doubleValue / 1e6 / n).toArray
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Assign every vector to its nearest [[kmeansFit]] centroid:
    * (idCol, cluster int). One codegen'd projection — scan-shaped.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   cents: Array[Array[Double]]): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        graft.functions.VectorFunctions
          .nearestCentroidIdx(col(vecCol), cents).as("cluster"))

  /** Fit + assign in one call (the query-entry composition). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int = 8, iters: Int = 2): DataFrame =
    kmeansAssign(df, idCol, vecCol, kmeansFit(df, idCol, vecCol, k, iters))
}
