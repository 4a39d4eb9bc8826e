package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, octet_length, pmod, posexplode_outer}

import graft.Tables

/** Query entries for the dedup + similarity operators (#27-33),
  * each with a full value-exact DuckDB oracle.
  *
  * The hash/float oracles replicate the engine's kernels in portable
  * SQL: 64-bit wraparound multiplication is done in HUGEINT via a
  * hi/lo-32 split (DuckDB errors on BIGINT overflow instead of
  * wrapping), unsigned shifts/xor run in the UBIGINT domain, and
  * float math mirrors the Scala kernels' exact fold order with
  * `list_reduce` (sequential fold == the kernels' accumulation loop,
  * so doubles are BIT-identical — no tolerance needed). Byte-level
  * hashing uses `ascii(substr(...))`, valid because the test corpus
  * is ASCII (asserted by the octet_length==length check in
  * TESTDATA.md; same assumption as the text_fingerprint oracle).
  */
object DedupQueries {

  /** (u * const) mod 2^64 in HUGEINT via hi/lo-32 split of the
    * constant — u*const can reach 2^128 which overflows HUGEINT, but
    * u*lo32 and u*hi32 stay under 2^96.
    */
  private def mulmod64(u: String, hi: Long, lo: Long): String =
    s"""CAST((
       |    (CAST($u AS HUGEINT) * $lo) % 18446744073709551616 +
       |    ((CAST($u AS HUGEINT) * $hi) % 4294967296) * 4294967296
       |  ) % 18446744073709551616 AS UBIGINT)""".stripMargin

  /** FNV-1a 64 of a string column's bytes (HashOps.fnv1a64): fold
    * xor-then-multiply over the ascii codes; 0x100000001b3 is 40 bits
    * so the product fits HUGEINT without a split.
    */
  private[operators] def fnvSql(strCol: String): String =
    s"""list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
       |      list_transform(range(1, length($strCol) + 1),
       |        i -> CAST(ascii(substr($strCol, CAST(i AS INT), 1)) AS UBIGINT))),
       |      (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211)
       |                     % 18446744073709551616 AS UBIGINT))""".stripMargin

  /** Exact-order cosine (VectorOps.cosine): sequential list_reduce
    * folds == the kernel's single accumulation loop, bit-identical
    * doubles.
    */
  private val selfNormSql =
    """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (acc, v) -> acc + v)""".stripMargin

  private val cosSql =
    """CASE WHEN a.nn = 0.0 OR b.nn = 0.0 THEN 0.0
      |         ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1, len(a.embedding) + 1),
      |             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |           (acc, v) -> acc + v) / (sqrt(a.nn) * sqrt(b.nn)) END""".stripMargin

  /** Shared CTE chain reproducing ShingleHashes64 -> MinHashSignature
    * -> band buckets -> verified candidate pairs (Dedup.
    * minhashCandidates + pairJaccard). Spark buckets on
    * xxhash64(band slice); the oracle buckets on the slice VALUES —
    * identical partitioning (hash equality == slice equality).
    * MinHash mins compare as SIGNED longs (Java `<`), hence the
    * unsigned->signed reinterpretation before `min`.
    */
  /** CTEs through `bandkeys` (shingles → FNV mix → minhash signature
    * → per-band key lists) — shared by the within-corpus pair CTEs
    * and the cross-corpus candidate CTE.
    */
  private def minhashSigCtes(): String = {
    val fnv = fnvSql("shingle")
    val mix1a = mulmod64("xor(f, f >> 30)", 3210233709L, 484763065L)
    val mix1b = mulmod64("xor(z, z >> 27)", 2496678331L, 321982955L)
    val mix2a = mulmod64("xor(z0, z0 >> 30)", 3210233709L, 484763065L)
    val mix2b = mulmod64("xor(z1, z1 >> 27)", 2496678331L, 321982955L)
    s"""sh0 AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(
       |      range(1, greatest(length(text) - 4, 1) + 1),
       |      pos -> substr(text, CAST(pos AS INT), 5)))) AS shingle
       |  FROM documents),
       |fnv AS (
       |  SELECT doc_id, $fnv AS f
       |  FROM sh0),
       |mx1 AS (SELECT doc_id, $mix1a AS z FROM fnv),
       |mx2 AS (SELECT doc_id, $mix1b AS z FROM mx1),
       |shash AS (SELECT DISTINCT doc_id, xor(z, z >> 31) AS h FROM mx2),
       |sig AS (
       |  SELECT doc_id, CAST(p AS INT) AS p,
       |    min(CAST(CASE WHEN m >= 9223372036854775808
       |        THEN CAST(m AS HUGEINT) - 18446744073709551616
       |        ELSE CAST(m AS HUGEINT) END AS BIGINT)) AS sigp
       |  FROM (
       |    SELECT doc_id, p, xor(z2, z2 >> 31) AS m
       |    FROM (
       |      SELECT doc_id, p, $mix2b AS z2
       |      FROM (
       |        SELECT doc_id, p, $mix2a AS z1
       |        FROM (
       |          SELECT s.doc_id, CAST(t.p AS INT) AS p,
       |            CAST((CAST(s.h AS HUGEINT) + 42 +
       |              (CAST(t.p AS HUGEINT) * 11400714819323198485) % 18446744073709551616
       |            ) % 18446744073709551616 AS UBIGINT) AS z0
       |          FROM shash s, range(64) t(p)) q0) q1) q2) q3
       |  GROUP BY doc_id, p),
       |bandkeys AS (
       |  SELECT doc_id, CAST(p // 4 AS INT) AS band, list(sigp ORDER BY p) AS bkey
       |  FROM sig GROUP BY doc_id, CAST(p // 4 AS INT))""".stripMargin
  }

  private def minhashCtes(minBands: Int = 1): String =
    s"""${minhashSigCtes()},
       |cand AS (
       |  SELECT a.doc_id AS ida, b.doc_id AS idb
       |  FROM bandkeys a JOIN bandkeys b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING COUNT(*) >= $minBands),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shash GROUP BY doc_id),
       |shared AS (
       |  SELECT c.ida, c.idb, COUNT(*) AS sh
       |  FROM cand c
       |  JOIN shash sa ON sa.doc_id = c.ida
       |  JOIN shash sb ON sb.doc_id = c.idb AND sb.h = sa.h
       |  GROUP BY c.ida, c.idb)""".stripMargin

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** The shared pre-curation gate: reference (src0) docs pass
    * through untouched, every OTHER doc — including null-source
    * docs — survives only if its doc_id is in `pass`. The non-target
    * branch is the NULL-SAFE complement (`!(source <=> 'src0')`):
    * `=!=` would silently drop null-source docs from both branches,
    * while the oracle's `source = 'src0' OR doc_id IN (pass)` keeps
    * them when they pass the gate.
    */
  private[graft] def preCurateGate(all: DataFrame,
                                   pass: DataFrame): DataFrame =
    // r22 NOTE (measured, then reverted): VERDICT r21 hypothesized
    // the pass subplan (langid/lm/dsir scoring) re-evaluates per
    // curate consumer and asked for a Materialize seam here. A/B
    // under the per-attempt-settled bench disproved it — the old
    // composition already evaluates the scoring subplan once
    // (corpus_curate_lm ≈ lm + curate standalone: 1.7 ≈ 0.5 + 1.3 s;
    // corpus_curate_langid ≈ 4.2 ≈ langid 3.3 + curate ~1 s), and an
    // eager checkpoint of the pass frame ADDED a blocking round-trip
    // and made corpus_curate_langid escalate 5.6 -> 7.5 s across
    // attempts. The r21 driver medians that suggested duplication
    // were attempt-escalation noise (fixed in Bench, r22).
    all.filter(col("source") === "src0").unionByName(
      all.filter(!(col("source") <=> "src0"))
        .join(pass, Seq("doc_id"), "left_semi"))

  // r21: truth and approx sides of a recall audit are independent
  // job chains (brute force collects the corpus; IVF/PQ count,
  // sample and train at construction) — build them concurrently so
  // the scheduler overlaps those driver-synchronized jobs (guide
  // §2.6); results identical.
  private def recallPair(truth: => org.apache.spark.sql.DataFrame,
                         approx: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val fs = graft.Materialize.inParallel(Seq(() => truth, () => approx))
    Similarity.annRecall(fs(0), fs(1))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d), "doc_id", "text")),
    "dedup_savings" -> ((s, d) =>
      Dedup.dedupSavings(docs(s, d), "doc_id", "text", "source")),
    "dedup_exact_normalized" -> ((s, d) =>
      Dedup.exactNormalized(docs(s, d), "doc_id", "text")),
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardStats(docs(s, d), "doc_id", "text")),
    "dedup_containment" -> ((s, d) =>
      Dedup.ngramContainmentStats(docs(s, d), "doc_id", "text")),
    // the MOSS verdict over winnow fingerprint sets: shared-print
    // candidate pairs (rare-print posting index), directional
    // |shared|/|own prints| overlap — the pairing consumer of
    // text_winnow's generation side (md5 prints here, so the oracle
    // replays them; production callers flip prodHash)
    "dedup_winnow" -> ((s, d) =>
      Dedup.winnowOverlapStats(docs(s, d), "doc_id", "text")),
    // maxBucket = uncapped, explicitly: the SQL oracles have no bucket
    // cap, so the oracle callers opt out of the operator's finite
    // flood-guard default to stay bit-comparable at any SF
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshStats(docs(s, d), "doc_id", "text",
        maxBucket = Int.MaxValue)),
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashStats(docs(s, d), "doc_id", "text")),
    "dedup_embedding" -> ((s, d) =>
      Dedup.embeddingStats(embs(s, d), "vec_id", "embedding")),
    "dedup_embedding_lsh" -> ((s, d) =>
      Dedup.embeddingStatsLsh(embs(s, d), "vec_id", "embedding")),
    // 0.8 is the conventional near-dup resolution threshold (weaker
    // similarity is analysis signal, not a drop decision); it also
    // keeps the cluster graph sparse on shared-vocabulary corpora.
    // minBands = 2: at threshold 0.8 a true pair matches ~6.5 of the
    // 16 bands in expectation, so single-band collisions are noise —
    // the oracle's cand CTE applies the same HAVING COUNT(*) >= 2
    "dedup_clusters" -> ((s, d) =>
      Dedup.dedupResolve(docs(s, d), "doc_id", "text", threshold = 0.8,
        maxBucket = Int.MaxValue, minBands = 2)),
    // leakage-safe train/val/test split: the split draw hashes the
    // near-dup cluster CANONICAL, so a cluster can never straddle
    // splits (train/test near-copies = silent eval contamination)
    "data_split_safe" -> ((s, d) => {
      val clusters = Dedup.dedupResolve(docs(s, d), "doc_id", "text",
        threshold = 0.8, maxBucket = Int.MaxValue, minBands = 2)
      Sampling.splitByCluster(clusters, "canonical")
        .select("doc_id", "canonical", "split_bucket", "split")
    }),
    // the leakage AUDIT over the same clusters: a naive per-doc hash
    // split leaks near-dup pairs across the boundary, the
    // cluster-atomic split provably leaks zero — counted from
    // per-cluster per-split sizes, no pair ever materializes
    "data_split_audit" -> ((s, d) => {
      // r22 (guide §1.2/§5): the naive and cluster audits are two
      // union branches that each embed the full resolution plan, so
      // the stages after dedupResolve's last internal seam (the
      // members/groups/labels joins) evaluated once per branch.
      // Materialize the per-doc cluster frame once — the
      // dedup_cluster_board shape; rows identical by construction.
      val clusters = graft.Materialize.eager(
        Dedup.dedupResolve(docs(s, d), "doc_id", "text",
          threshold = 0.8, maxBucket = Int.MaxValue, minBands = 2))
      val naive = Sampling.trainValTestSplit(clusters, "doc_id")
      val safe = Sampling.splitByCluster(clusters, "canonical")
      Sampling.splitLeakageAudit(naive, "canonical", "split")
        .select(lit("naive").as("rule"), col("*"))
        .unionByName(
          Sampling.splitLeakageAudit(safe, "canonical", "split")
            .select(lit("cluster").as("rule"), col("*")))
    }),
    // cap-don't-erase policy: at most 2 representatives per cluster
    "dedup_cluster_cap" -> ((s, d) =>
      Dedup.dedupClusterCap(docs(s, d), "doc_id", "text", threshold = 0.8,
        maxPerCluster = 2, maxBucket = Int.MaxValue, minBands = 2)),
    // the COMPOSED cluster board — the production shape of the whole
    // cluster family: ONE materialized resolution serves the cluster
    // map, the cap verdict, the leakage-safe split, and the byte
    // accounting in a single per-doc frame (the standalone entries
    // above each re-run the propagation by the driver's one-query-
    // per-entry contract; a real pipeline runs THIS). Spec-pinned
    // equal to every standalone operator it composes; the savings
    // and audit aggregates reconcile from exactly these columns.
    "dedup_cluster_board" -> ((s, d) => {
      val dd = docs(s, d)
      val resolved = graft.Materialize.eager(
        Dedup.dedupResolve(dd, "doc_id", "text", threshold = 0.8,
          maxBucket = Int.MaxValue, minBands = 2))
      Dedup.dedupClusterCap(resolved, "doc_id", maxPerCluster = 2)
        .join(Sampling.splitByCluster(resolved, "canonical")
          .select(col("doc_id"), col("split")), Seq("doc_id"))
        .join(dd.select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes")),
          Seq("doc_id"))
        .select(col("doc_id"), col("canonical"), col("is_dup"),
          col("cluster_rank"), col("kept"), col("split"), col("n_bytes"))
    }),
    // embedding-space anisotropy diagnostic (decimal-exact sums ->
    // engine-exact covariance)
    "embedding_covariance" -> ((s, d) =>
      Similarity.embeddingCovariance(embs(s, d), "vec_id", "embedding")),
    // centroid-distance cleaning gate; 1.01 sits at ~p97 of the
    // shell radius on this corpus, flagging the far tail
    "embedding_outliers" -> ((s, d) =>
      Similarity.embeddingOutliers(embs(s, d), "vec_id", "embedding",
        threshold = 1.01)),
    // PCA whitening (driver Jacobi on the D x D covariance, literal
    // projection matrix in a codegen'd transform/aggregate) — no SQL
    // oracle (eigendecomposition), spec-verified closed-form instead.
    // Output is SCALAR rows (vec_id, component, value), not an array
    // column: the driver's rows-only check row-sorts in pandas, and
    // an array column is unhashable there (r7's only erroring entry).
    // posexplode_OUTER everywhere an expensive computed array is
    // exploded: plain posexplode lets InferFiltersFromGenerate add
    // `size(arr)>0 AND isnotnull(arr)`, and predicate pushdown then
    // substitutes the FULL array expression into the filter — the
    // higher-order aggregate folds are CodegenFallback with no CSE,
    // so the whole computation re-runs per conjunct (r11 probe:
    // quantize 2.3 s → 0.08 s from this one change). Embedding
    // vectors are fixed-width non-null, so inner/outer are
    // row-identical here.
    "embedding_pca_whiten" -> ((s, d) =>
      Similarity.pcaProject(embs(s, d), "vec_id", "embedding",
        k = 16, whiten = true)
        .select(col("vec_id"),
          posexplode_outer(col("projection")).as(Seq("component", "value")))),
    // int8 storage quantization — scalar rows (the pca lesson: the
    // driver's row-sort cannot hash an array column), full value-exact
    // oracle (amax fold, scale divide, and the tie-free round-half-up
    // grid are all deterministic IEEE)
    "embedding_quantize" -> ((s, d) =>
      Similarity.quantizeEmbeddings(embs(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          posexplode_outer(col("qvec")).as(Seq("component", "qval")))),
    // SemDeDup: k-means clusters as candidate buckets, exact cosine
    // within — the published embedding-dedup recipe, end-to-end
    // engine-exact (the oracle replays fit + assignment + cosines)
    "dedup_semantic" -> ((s, d) =>
      Dedup.semDedup(embs(s, d), "vec_id", "embedding")),
    // cross-corpus SemDeDup: every fifth vector plays the reference
    // (training-set) side; the quantizer fits on the reference only
    "dedup_semantic_cross" -> ((s, d) => {
      val all = embs(s, d)
      Dedup.semDedupAgainst(
        all.filter(pmod(col("vec_id"), lit(5)) =!= 0),
        all.filter(pmod(col("vec_id"), lit(5)) === 0),
        "vec_id", "embedding")
    }),
    // reproducible Lloyd: exact-integer centroid updates make every
    // iteration engine-exact, so the full unrolled fit replays in
    // DuckDB hash-green (the float-mean objection the IVF quantizer
    // ducked by hash-sampling is solved, not avoided)
    "embedding_kmeans" -> ((s, d) =>
      Similarity.kmeans(embs(s, d), "vec_id", "embedding",
        k = 8, iters = 2)),
    "embedding_kmeans_centroids" -> ((s, d) => {
      import s.implicits._
      Similarity.kmeansFit(embs(s, d), "vec_id", "embedding",
          k = 8, iters = 2)
        .zipWithIndex.toSeq
        .flatMap { case (cv, c) =>
          cv.zipWithIndex.map { case (x, i) => (c, i, x) }
        }
        .toDF("cluster", "component", "value")
    }),
    // L2 normalization — scalar rows, value-exact oracle (SelfNorm
    // fold + one sqrt divide per component)
    "embedding_normalize" -> ((s, d) =>
      Similarity.normalizeEmbeddings(embs(s, d), "vec_id", "embedding")
        .select(col("vec_id"),
          posexplode_outer(col("nvec")).as(Seq("component", "value")))),
    "ann_bruteforce_topk" -> ((s, d) =>
      Similarity.annBruteForce(embs(s, d), "vec_id", "embedding")),
    "ann_lsh_topk" -> ((s, d) =>
      Similarity.annLsh(embs(s, d), "vec_id", "embedding")),
    "ann_lsh_multiprobe" -> ((s, d) =>
      Similarity.annLshMultiprobe(embs(s, d), "vec_id", "embedding")),
    // recall of the multi-probe index — same storage as ann_lsh,
    // ~(planes+1)-table candidate coverage
    "ann_recall_lsh_multiprobe" -> ((s, d) => {
      val e = embs(s, d)
      recallPair(
        Similarity.annBruteForce(e, "vec_id", "embedding"),
        Similarity.annLshMultiprobe(e, "vec_id", "embedding"))
    }),
    // recall@k audit of the LSH index against the exact truth —
    // the accept/reject evidence for every ANN parameter trade
    "ann_recall" -> ((s, d) => {
      val e = embs(s, d)
      recallPair(
        Similarity.annBruteForce(e, "vec_id", "embedding"),
        Similarity.annLsh(e, "vec_id", "embedding"))
    }),
    // Matryoshka-style truncation audit: top-k recall when scoring
    // on only the FIRST HALF of each embedding — the 2x storage/
    // compute lever dimension-truncated indexes buy, with its recall
    // cost measured instead of assumed. Exact brute force on both
    // sides; the truncated cosine re-norms implicitly (the kernel
    // computes norms of whatever vector it gets)
    "ann_recall_truncated" -> ((s, d) => {
      val e = embs(s, d)
      val half = e.select(col("vec_id"),
        expr("slice(embedding, 1, size(embedding) div 2)").as("embedding"))
      recallPair(
        Similarity.annBruteForce(e, "vec_id", "embedding"),
        Similarity.annBruteForce(half, "vec_id", "embedding"))
    }),
    // SAMPLED recall audit — the 100 TB-safe form: exact truth only
    // for a deterministic md5-bucket probe sample (rate 0.1, salted),
    // per-probe rows value-identical to ann_recall's
    "ann_recall_sampled" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.annRecallSampled(e, "vec_id", "embedding",
        Similarity.annLsh(e, "vec_id", "embedding"))
    }),
    // the sampled audit against the IVF index — same distributed
    // exact-truth side (probes broadcast, corpus unbounded), scoring
    // the other stored index family
    "ann_recall_sampled_ivf" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.annRecallSampled(e, "vec_id", "embedding",
        Similarity.annIvf(e, "vec_id", "embedding"))
    }),
    // the sampled audit against the IVF-PQ index — rows-only like
    // every PQ entry (the Lloyd-refined quantizer is data-derived;
    // a static oracle SQL cannot embed per-corpus codebooks, and the
    // oracle-able raw-sample quantizer costs the measured 9 recall
    // points). DedupSpec pins the strong internal property instead:
    // per-probe rows value-identical to the full PQ audit's
    "ann_recall_sampled_ivfpq" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.annRecallSampled(e, "vec_id", "embedding",
        Similarity.annIvfPq(e, "vec_id", "embedding"))
    }),
    // the same audit for the IVF index (inverted lists + nprobe)
    "ann_recall_ivf" -> ((s, d) => {
      val e = embs(s, d)
      recallPair(
        Similarity.annBruteForce(e, "vec_id", "embedding"),
        Similarity.annIvf(e, "vec_id", "embedding"))
    }),
    "ann_ivf_topk" -> ((s, d) =>
      Similarity.annIvf(embs(s, d), "vec_id", "embedding")),
    // IVF-PQ: inverted lists carry m+norm-byte codes, ADC scoring;
    // deterministic (fixed-order in-row float folds) but the oracle
    // would have to replay the whole two-level quantizer in SQL —
    // declared rows-only, recall floor spec-pinned vs brute force
    "ann_ivfpq_topk" -> ((s, d) =>
      Similarity.annIvfPq(embs(s, d), "vec_id", "embedding")),
    // recall@k of the two-stage IVF-PQ pipeline vs brute force —
    // rows-only (the PQ side has no SQL oracle), floor spec-pinned
    "ann_recall_ivfpq" -> ((s, d) => {
      val e = embs(s, d)
      recallPair(
        Similarity.annBruteForce(e, "vec_id", "embedding"),
        Similarity.annIvfPq(e, "vec_id", "embedding"))
    }),
    // full curation pipeline: quality + repetition gates -> exact
    // dedup -> decontamination vs the src0 benchmark -> per
    // (source, lang) doc/token accounting
    "corpus_curate" -> ((s, d) =>
      Curation.curate(docs(s, d), "doc_id", "text",
        col("source") === "src0", Seq("source", "lang"))),
    // the same pipeline's gate-by-gate attrition funnel: docs and
    // estimated tokens entering/surviving/removed per stage; the
    // stage-4 docs_out row reconciles exactly with corpus_curate's
    // roll-up totals (spec-pinned)
    "curate_attrition" -> ((s, d) =>
      Curation.attrition(docs(s, d), "doc_id", "text",
        col("source") === "src0")),
    // curation with the CCNet-style LM pre-gate composed in front:
    // non-reference docs below familiarity 0.031 (vs the src0 bigram
    // model) drop BEFORE the quality/dedup/decontamination pipeline;
    // reference docs pass through untouched (they must stay visible
    // to curate's decontamination side)
    "corpus_curate_lm" -> ((s, d) => {
      val all = docs(s, d)
      val pass = TextAnalysis.lmFamiliarity(all, "doc_id", "text",
          col("source") === "src0")
        .filter(col("familiarity") >= 0.031).select(col("doc_id"))
      Curation.curate(preCurateGate(all, pass), "doc_id", "text",
        col("source") === "src0", Seq("source", "lang"))
    }),
    // curation with the DSIR importance pre-gate (the lm-gate
    // pattern): non-target docs below the median-ish weight 0.775
    // drop BEFORE the pipeline; target docs pass through (they must
    // stay visible to decontamination)
    "corpus_curate_dsir" -> ((s, d) => {
      val all = docs(s, d)
      val pass = TextAnalysis.dsirWeights(all, "doc_id", "text",
          col("source") === "src0")
        .filter(col("dsir_weight") >= 0.775).select(col("doc_id"))
      Curation.curate(preCurateGate(all, pass), "doc_id", "text",
        col("source") === "src0", Seq("source", "lang"))
    }),
    // curation with the langid-MISMATCH pre-gate (CCNet's mislabel
    // filter pressed into the pipeline, the lm-gate pattern):
    // non-reference docs whose declared language disagrees with the
    // char-ngram classifier's guess drop BEFORE the
    // quality/dedup/decontamination stages; reference docs pass
    // through (they must stay visible to decontamination). Strict
    // equality as the pass condition: an 'und' guess (no grams) or a
    // null declared label cannot CONFIRM the label, so those drop —
    // text_langid_mismatch is this gate's complement as a selection
    "corpus_curate_langid" -> ((s, d) => {
      val all = docs(s, d)
      val pass = TextAnalysis.languageIdNgram(all, "doc_id", "text",
          "lang", col("source") === "src0")
        .filter(col("lang_guess") === col("declared_lang"))
        .select(col("doc_id"))
      Curation.curate(preCurateGate(all, pass), "doc_id", "text",
        col("source") === "src0", Seq("source", "lang"))
    }),
    // near-dup ROI over the resolved clusters: what keep-canonical-
    // only would save — the fuzzy sibling of dedup_savings
    "dedup_cluster_savings" -> ((s, d) =>
      Dedup.dedupClusterSavings(docs(s, d), "doc_id", "text",
        threshold = 0.8, maxBucket = Int.MaxValue, minBands = 2)),
    // benchmark decontamination: docs from src0 play the eval set,
    // everything else is the training corpus; n=13 exact overlap
    "dedup_decontaminate" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.decontaminate(
        all.filter(col("source") =!= "src0"),
        all.filter(col("source") === "src0"),
        "doc_id", "text", n = 13)
    }),
    // the same decontamination through the Bloom-prefilter scale
    // path (benchmark too big to broadcast): identical output by
    // construction, so it shares the exact oracle
    "dedup_decontaminate_bloom" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.decontaminateBloom(
        all.filter(col("source") =!= "src0"),
        all.filter(col("source") === "src0"),
        "doc_id", "text", n = 13)
    }),
    // cross-corpus near-dedup: same corpus/reference split, but BOTH
    // sides scale (LSH band equi-join, no broadcast) — "dedup the new
    // crawl against the existing training set"
    "dedup_cross_corpus" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.dedupAgainstStats(
        all.filter(col("source") =!= "src0"),
        all.filter(col("source") === "src0"),
        "doc_id", "text", maxBucket = Int.MaxValue)
    }))

  private val minhashStatsSql: String =
    s"""WITH ${minhashCtes()},
       |jac AS (
       |  SELECT c.ida, c.idb,
       |    CAST(COALESCE(s.sh, 0) AS DOUBLE) /
       |      (za.n + zb.n - COALESCE(s.sh, 0)) AS jaccard
       |  FROM cand c
       |  LEFT JOIN shared s ON s.ida = c.ida AND s.idb = c.idb
       |  JOIN sizes za ON za.doc_id = c.ida
       |  JOIN sizes zb ON zb.doc_id = c.idb),
       |per AS (
       |  SELECT id, COUNT(*) AS n_candidates,
       |    CAST(SUM(CASE WHEN jaccard >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
       |    max(jaccard) AS max_jaccard
       |  FROM (SELECT ida AS id, jaccard FROM jac
       |        UNION ALL SELECT idb AS id, jaccard FROM jac)
       |  GROUP BY id)
       |SELECT d.doc_id,
       |  COALESCE(p.n_candidates, 0) AS n_candidates,
       |  COALESCE(p.n_near, 0) AS n_near,
       |  p.max_jaccard
       |FROM documents d LEFT JOIN per p ON p.id = d.doc_id""".stripMargin

  /** Connected components of the verified >=0.8 pairs: a recursive
    * CTE computes the min id reachable from each node — the fixpoint
    * Dedup.resolveClusters's label propagation converges to.
    */
  private val clustersSql: String =
    s"""WITH RECURSIVE ${minhashCtes(minBands = 2)},
       |near AS (
       |  SELECT c.ida, c.idb
       |  FROM cand c
       |  LEFT JOIN shared s ON s.ida = c.ida AND s.idb = c.idb
       |  JOIN sizes za ON za.doc_id = c.ida
       |  JOIN sizes zb ON zb.doc_id = c.idb
       |  WHERE CAST(COALESCE(s.sh, 0) AS DOUBLE)
       |        / (za.n + zb.n - COALESCE(s.sh, 0)) >= 0.8),
       |edges AS (
       |  SELECT ida AS src, idb AS dst FROM near
       |  UNION ALL SELECT idb, ida FROM near),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
       |SELECT id AS doc_id, min(r) AS canonical, min(r) != id AS is_dup
       |FROM reach GROUP BY id""".stripMargin

  /** SimHash (HashOps.simhash64): FNV-1a per whitespace token, +/-1
    * votes per bit, sign -> bit; candidates share one of the four
    * 16-bit chunks; hamming = bit_count(xor). All in the UBIGINT
    * domain; the output column reinterprets as signed to match the
    * engine's LongType. The flood cap (chunk buckets > 10000 dropped
    * from candidate generation, simhashStats' default — never hit at
    * oracle SF) is mirrored in the flood/chunks CTEs.
    */
  private val simhashSql: String = {
    val fnv = fnvSql("tok")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |fnv AS (
       |  SELECT doc_id, $fnv AS h
       |  FROM tok),
       |votes AS (
       |  SELECT doc_id, CAST(b AS INT) AS b,
       |    SUM(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM fnv, range(64) t(b)
       |  GROUP BY doc_id, b),
       |sim AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b ELSE 0 END) AS UBIGINT) AS u
       |  FROM votes GROUP BY doc_id),
       |chunksall AS (
       |  SELECT doc_id, u, CAST(c AS INT) AS chunk,
       |    (u >> (CAST(c AS INT) * 16)) & 65535 AS cval
       |  FROM sim, range(4) t(c)),
       |flood AS (
       |  SELECT chunk, cval FROM chunksall
       |  GROUP BY chunk, cval HAVING count(*) > 10000),
       |chunks AS (
       |  SELECT c.* FROM chunksall c ANTI JOIN flood f
       |    ON c.chunk = f.chunk AND c.cval = f.cval),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ida, a.u AS ua, b.doc_id AS idb, b.u AS ub
       |  FROM chunks a JOIN chunks b
       |    ON a.chunk = b.chunk AND a.cval = b.cval AND a.doc_id < b.doc_id),
       |ham AS (
       |  SELECT ida, idb, CAST(bit_count(xor(ua, ub)) AS INT) AS hamming FROM cand),
       |per AS (
       |  SELECT id, COUNT(*) AS n_candidates,
       |    CAST(SUM(CASE WHEN hamming <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
       |    min(hamming) AS min_hamming
       |  FROM (SELECT ida AS id, hamming FROM ham
       |        UNION ALL SELECT idb AS id, hamming FROM ham)
       |  GROUP BY id)
       |SELECT s.doc_id,
       |  CAST(CASE WHEN s.u >= 9223372036854775808
       |       THEN CAST(s.u AS HUGEINT) - 18446744073709551616
       |       ELSE CAST(s.u AS HUGEINT) END AS BIGINT) AS simhash,
       |  COALESCE(p.n_candidates, 0) AS n_candidates,
       |  COALESCE(p.n_near, 0) AS n_near,
       |  p.min_hamming
       |FROM sim s LEFT JOIN per p ON p.id = s.doc_id""".stripMargin
  }

  private val embeddingStatsSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $selfNormSql AS nn
       |  FROM embeddings),
       |c AS (
       |  SELECT a.vec_id AS ida, b.vec_id AS idb,
       |    $cosSql AS cos
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
       |per AS (
       |  SELECT id,
       |    CAST(SUM(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
       |    max(cos) AS max_cos
       |  FROM (SELECT ida AS id, cos FROM c UNION ALL SELECT idb AS id, cos FROM c)
       |  GROUP BY id)
       |SELECT e.vec_id, COALESCE(per.n_near, 0) AS n_near, per.max_cos
       |FROM e LEFT JOIN per ON per.id = e.vec_id""".stripMargin

  private val annBruteForceSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $selfNormSql AS nn
       |  FROM embeddings),
       |c AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $cosSql AS cos_sim
       |  FROM e a JOIN e b ON a.vec_id != b.vec_id),
       |r AS (
       |  SELECT vec_id, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM c)
       |SELECT vec_id, rank, neighbor_id, cos_sim FROM r WHERE rank <= 5""".stripMargin

  /** SRP bucket (VectorOps.srpBucket): the splitmix-style mix of
    * (seed=42, plane, dim) gives Rademacher weights; the per-plane
    * dot is the same sequential fold. Dim count (64) matches the
    * embeddings tables; the engine reads the true array length.
    */
  /** CTE chain reproducing VectorOps.srpBucket + per-vector norms:
    * `e(vec_id, embedding, bucket, nn)`. Shared by the LSH ANN and
    * LSH embedding-stats oracles.
    */
  /** The r14 auto-planes rule in pure integer SQL: smallest p in
    * [6, 24] with N ≤ 512·2^p — static range + MIN, no log2 (not
    * correctly rounded, could disagree across engines at a
    * boundary). Evaluates to 6 at every verify SF.
    */
  private val autoPlanesSql: String =
    """(SELECT CAST(MIN(p) AS INT) FROM range(6, 25) t(p)
      |    WHERE p = 24 OR (SELECT count(*) FROM embeddings)
      |      <= 512 * (CAST(1 AS BIGINT) << CAST(p AS INT)))"""
      .stripMargin

  private def srpBucketCtes(planesSql: String): String = {
    val mixA = mulmod64("xor(z0, z0 >> 33)", 4283543511L, 3981806797L)
    val mixB = mulmod64("xor(z1, z1 >> 33)", 3301882366L, 444984403L)
    s"""params AS (
       |  SELECT CAST(p AS INT) AS p, CAST(i AS INT) AS i,
       |    CAST(42 + p * 4294967296 + i AS UBIGINT) AS z0
       |  FROM range(24) t1(p), range(64) t2(i)
       |  WHERE p < $planesSql),
       |m1 AS (SELECT p, i, $mixA AS z1 FROM params),
       |m2 AS (SELECT p, i, $mixB AS z2 FROM m1),
       |wt AS (
       |  SELECT p, list(CASE WHEN xor(z2, z2 >> 33) % 2 = 0 THEN 1.0 ELSE -1.0 END
       |                 ORDER BY i) AS wl
       |  FROM m2 GROUP BY p),
       |acc AS (
       |  SELECT e.vec_id, wt.p,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(e.embedding) + 1),
       |        i -> wt.wl[i] * CAST(e.embedding[i] AS DOUBLE))),
       |      (a, x) -> a + x) AS dot
       |  FROM embeddings e, wt),
       |buck AS (
       |  SELECT vec_id,
       |    CAST(SUM(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
       |  FROM acc GROUP BY vec_id),
       |e AS (
       |  SELECT em.vec_id, em.embedding, b.bucket, $selfNormSql AS nn
       |  FROM embeddings em JOIN buck b ON b.vec_id = em.vec_id)""".stripMargin
  }

  // ek mirrors Similarity.capFloodBuckets: buckets over maxBucket
  // (default 10000 — never hit at oracle SF, semantics pinned anyway)
  // are dropped from candidate generation only
  private val floodCapCte: String =
    """ek AS (
      |  SELECT * FROM e WHERE bucket NOT IN (
      |    SELECT bucket FROM e GROUP BY bucket HAVING count(*) > 10000))"""
      .stripMargin

  // multi-probe: each vector probes its own bucket + the 6 one-bit
  // flips; the index side stays ek (stored once, flood-capped) but
  // the PROBE side builds from the uncapped e — capped-bucket
  // members still probe their Hamming-1 neighborhoods; XOR flips are
  // distinct so no pair dedup is needed — mirrors
  // Similarity.annLshMultiprobe exactly
  private val annLshMultiprobeSql: String =
    s"""WITH ${srpBucketCtes(autoPlanesSql)},
       |$floodCapCte,
       |pr AS (
       |  SELECT vec_id, embedding, nn, xor(bucket, CAST(f AS INT)) AS pbucket
       |  FROM e, (SELECT 0 AS f UNION ALL
       |           SELECT CAST(1 AS BIGINT) << CAST(p AS INT)
       |           FROM range(24) t(p) WHERE p < $autoPlanesSql) t(f)),
       |c AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $cosSql AS cos_sim
       |  FROM pr a JOIN ek b ON a.pbucket = b.bucket AND a.vec_id != b.vec_id),
       |r AS (
       |  SELECT vec_id, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM c)
       |SELECT vec_id, rank, neighbor_id, cos_sim FROM r WHERE rank <= 5""".stripMargin

  private val annLshSql: String =
    s"""WITH ${srpBucketCtes(autoPlanesSql)},
       |$floodCapCte,
       |c AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $cosSql AS cos_sim
       |  FROM ek a JOIN ek b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
       |r AS (
       |  SELECT vec_id, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM c)
       |SELECT vec_id, rank, neighbor_id, cos_sim FROM r WHERE rank <= 5""".stripMargin

  private val embeddingLshStatsSql: String =
    s"""WITH ${srpBucketCtes(autoPlanesSql)},
       |$floodCapCte,
       |c AS (
       |  SELECT a.vec_id AS ida, b.vec_id AS idb, $cosSql AS cos
       |  FROM ek a JOIN ek b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |per AS (
       |  SELECT id,
       |    CAST(SUM(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
       |    max(cos) AS max_cos
       |  FROM (SELECT ida AS id, cos FROM c UNION ALL SELECT idb AS id, cos FROM c)
       |  GROUP BY id)
       |SELECT e.vec_id, COALESCE(per.n_near, 0) AS n_near, per.max_cos
       |FROM e LEFT JOIN per ON per.id = e.vec_id""".stripMargin

  /** IVF oracle (Similarity.annIvf): same Knuth-hash centroid sample,
    * nearest-centroid assignment and nprobe probing with the
    * bit-exact sequential-fold cosine; ranks agree because the
    * underlying doubles agree bit-for-bit and ties break on ids.
    * The subquery LIMIT replays the r14 auto-nlist rule
    * (clamp(⌈√N⌉, 64, 4096) — both engines' sqrt are correctly-
    * rounded IEEE so the integer agrees; = 64 at every verify SF)
    * and the flood-cap CTE mirrors maxList=10000 (never fires at
    * verify SF, semantics pinned like the LSH ek CTE).
    */
  private val annIvfSql: String =
    s"""WITH e AS (
       |  SELECT vec_id AS id, embedding, $selfNormSql AS nn
       |  FROM embeddings),
       |cent AS (
       |  SELECT id AS cid, embedding, nn FROM e
       |  ORDER BY ((id % 2147483647) * 48271) % 2147483647 ASC, id ASC
       |  LIMIT (SELECT GREATEST(64, LEAST(4096,
       |    CAST(ceil(sqrt(count(*))) AS BIGINT))) FROM e)),
       |rr AS (
       |  SELECT a.id, a.embedding, a.nn, b.cid,
       |    ROW_NUMBER() OVER (PARTITION BY a.id
       |      ORDER BY $cosSql DESC, b.cid ASC) AS crank
       |  FROM e a, cent b),
       |l0 AS (
       |  SELECT cid, id AS neighbor_id, embedding, nn FROM rr WHERE crank = 1),
       |lists AS (
       |  SELECT * FROM l0 WHERE cid NOT IN (
       |    SELECT cid FROM l0 GROUP BY cid HAVING count(*) > 10000)),
       |probes AS (
       |  SELECT cid, id, embedding, nn FROM rr WHERE crank <= 4),
       |pairs AS (
       |  SELECT a.id AS vec_id, b.neighbor_id, $cosSql AS cos_sim
       |  FROM probes a JOIN lists b
       |    ON a.cid = b.cid AND a.id != b.neighbor_id),
       |r AS (
       |  SELECT vec_id, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM pairs)
       |SELECT vec_id, rank, neighbor_id, cos_sim FROM r WHERE rank <= 5""".stripMargin

  /** Decontamination oracle joins on the 13-gram STRINGS — the engine
    * joins on their 64-bit hashes; the two agree unless FNV+mix
    * collides two distinct 13-grams inside one document (≈ |doc|²/2^64,
    * and any such event would be deterministic and caught here).
    */
  private val decontaminateSql: String = {
    def shingles13(where: String) =
      s"""SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(length(text) - 12, 1) + 1),
         |    pos -> substr(text, CAST(pos AS INT), 13)))) AS sh
         |  FROM documents WHERE $where""".stripMargin
    s"""WITH corp AS (
       |  ${shingles13("source != 'src0'")}),
       |bench AS (
       |  SELECT DISTINCT sh FROM (${shingles13("source = 'src0'")})),
       |hits AS (
       |  SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
       |  FROM corp c JOIN bench b ON b.sh = c.sh
       |  GROUP BY c.doc_id)
       |SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       |  COALESCE(h.n_hits, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
       |WHERE d.source != 'src0'""".stripMargin
  }

  /** Curation oracle: replays the quality/repetition gates, keep-min
    * exact dedup, and 13-gram decontamination with the same fragments
    * the standalone oracles use, then rolls up.
    */
  private val corpusCurateSql: String = corpusCurateSqlFrom("documents")

  /** [[corpusCurateSql]] parameterized over the source relation so a
    * pre-gate (the LM familiarity composition) can replace the raw
    * table. Emits the CTE LIST + final select WITHOUT the leading
    * `WITH` keyword so callers can prepend their own CTEs.
    */
  private def corpusCurateCtesFrom(rel: String): String = {
    // 30-char decontamination grams (~5 words): the verbatim-leak
    // scale, vs the 13-char overlap COUNTER in dedup_decontaminate
    def shingles30(where: String) =
      s"""SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(length(text) - 29, 1) + 1),
         |    pos -> substr(text, CAST(pos AS INT), 30)))) AS sh
         |  FROM $rel WHERE $where""".stripMargin
    s"""m AS (
       |  SELECT doc_id, source, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS awl,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       |    CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
       |      w -> len(list_filter(string_split(text, ' '), x -> x = w)))) AS BIGINT) AS top_cnt,
       |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est,
       |    md5(text) AS h
       |  FROM $rel
       |  WHERE source != 'src0'),
       |g AS (
       |  SELECT * FROM m
       |  WHERE n_words >= 20 AND awl < 8.0
       |    AND CAST(n_distinct AS DOUBLE) / n_words > 0.2
       |    AND CAST(top_cnt AS DOUBLE) / n_words < 0.2),
       |k AS (SELECT h, min(doc_id) AS doc_id FROM g GROUP BY h),
       |kept AS (SELECT g.* FROM g JOIN k ON k.h = g.h AND k.doc_id = g.doc_id),
       |corp AS (
       |  ${shingles30("source != 'src0'")}),
       |bench AS (
       |  SELECT DISTINCT sh FROM (${shingles30("source = 'src0'")})),
       |hits AS (
       |  SELECT DISTINCT c.doc_id FROM corp c JOIN bench b ON b.sh = c.sh),
       |clean AS (
       |  SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM hits))
       |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(est) AS BIGINT) AS n_tokens, min(doc_id) AS first_doc
       |FROM clean GROUP BY source, lang""".stripMargin
  }

  private def corpusCurateSqlFrom(rel: String): String =
    s"WITH ${corpusCurateCtesFrom(rel)}"

  /** The attrition funnel over corpus_curate's exact gate/dedup/
    * decontamination fragments: each document labeled with its FIRST
    * failing stage (null gates coalesce to fail, matching the Spark
    * side), then the 4-row funnel via conditional counts. The CROSS
    * JOIN is oracle-side only — the Spark plan reshapes a ≤5-row
    * aggregate through a constant-key broadcast join.
    */
  private val attritionSql: String = {
    def shingles30(where: String) =
      s"""SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(length(text) - 29, 1) + 1),
         |    pos -> substr(text, CAST(pos AS INT), 30)))) AS sh
         |  FROM documents WHERE $where""".stripMargin
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS awl,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       |    CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
       |      w -> len(list_filter(string_split(text, ' '), x -> x = w)))) AS BIGINT) AS top_cnt,
       |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est,
       |    md5(text) AS h
       |  FROM documents
       |  WHERE source != 'src0'),
       |lab0 AS (
       |  SELECT doc_id, est, h,
       |    CASE
       |      WHEN NOT COALESCE(n_words >= 20 AND awl < 8.0, FALSE) THEN 1
       |      WHEN NOT COALESCE(CAST(n_distinct AS DOUBLE) / n_words > 0.2
       |        AND CAST(top_cnt AS DOUBLE) / n_words < 0.2, FALSE) THEN 2
       |      ELSE 0 END AS ff0
       |  FROM m),
       |kd AS (SELECT h, min(doc_id) AS keeper FROM lab0 WHERE ff0 = 0 GROUP BY h),
       |lab1 AS (
       |  SELECT l.doc_id, l.est,
       |    CASE WHEN l.ff0 > 0 THEN l.ff0
       |         WHEN l.doc_id <> k.keeper THEN 3 ELSE 0 END AS ff1
       |  FROM lab0 l LEFT JOIN kd k ON k.h = l.h),
       |corp AS (
       |  ${shingles30("source != 'src0'")}),
       |bench AS (
       |  SELECT DISTINCT sh FROM (${shingles30("source = 'src0'")})),
       |hits AS (
       |  SELECT DISTINCT c.doc_id FROM corp c JOIN bench b ON b.sh = c.sh),
       |lab AS (
       |  SELECT l.doc_id, l.est,
       |    CASE WHEN l.ff1 > 0 THEN l.ff1
       |         WHEN h2.doc_id IS NOT NULL THEN 4 ELSE 0 END AS ff
       |  FROM lab1 l LEFT JOIN hits h2 ON h2.doc_id = l.doc_id),
       |stages(stage_idx, stage) AS (VALUES
       |  (1, 'quality'), (2, 'repetition'),
       |  (3, 'exact_dedup'), (4, 'decontaminate'))
       |SELECT s.stage_idx, s.stage,
       |  CAST(COUNT(CASE WHEN l.ff = 0 OR l.ff >= s.stage_idx THEN 1 END)
       |    AS BIGINT) AS docs_in,
       |  CAST(COUNT(CASE WHEN l.ff = 0 OR l.ff > s.stage_idx THEN 1 END)
       |    AS BIGINT) AS docs_out,
       |  CAST(COUNT(CASE WHEN l.ff = s.stage_idx THEN 1 END)
       |    AS BIGINT) AS docs_removed,
       |  CAST(COALESCE(SUM(CASE WHEN l.ff = 0 OR l.ff > s.stage_idx
       |    THEN l.est END), 0) AS BIGINT) AS tokens_out
       |FROM stages s CROSS JOIN lab l
       |GROUP BY s.stage_idx, s.stage
       |ORDER BY s.stage_idx""".stripMargin
  }

  private val crossCorpusSql: String =
    s"""WITH ${minhashSigCtes()},
       |corpusd AS (SELECT doc_id FROM documents WHERE source <> 'src0'),
       |refd AS (SELECT doc_id FROM documents WHERE source = 'src0'),
       |cand AS (
       |  SELECT a.doc_id AS ida, b.doc_id AS idb
       |  FROM bandkeys a
       |  JOIN corpusd ca ON ca.doc_id = a.doc_id
       |  JOIN bandkeys b ON a.band = b.band AND a.bkey = b.bkey
       |  JOIN refd rf ON rf.doc_id = b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING COUNT(*) >= 1),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shash GROUP BY doc_id),
       |shared AS (
       |  SELECT c.ida, c.idb, COUNT(*) AS sh
       |  FROM cand c
       |  JOIN shash sa ON sa.doc_id = c.ida
       |  JOIN shash sb ON sb.doc_id = c.idb AND sb.h = sa.h
       |  GROUP BY c.ida, c.idb),
       |jac AS (
       |  SELECT c.ida,
       |    CAST(COALESCE(s.sh, 0) AS DOUBLE) /
       |      (za.n + zb.n - COALESCE(s.sh, 0)) AS jaccard
       |  FROM cand c
       |  LEFT JOIN shared s ON s.ida = c.ida AND s.idb = c.idb
       |  JOIN sizes za ON za.doc_id = c.ida
       |  JOIN sizes zb ON zb.doc_id = c.idb),
       |per AS (
       |  SELECT ida AS doc_id, COUNT(*) AS n_ref_candidates,
       |    max(jaccard) AS max_ref_jaccard
       |  FROM jac GROUP BY ida)
       |SELECT d.doc_id,
       |  COALESCE(p.n_ref_candidates, 0) AS n_ref_candidates,
       |  p.max_ref_jaccard,
       |  COALESCE(p.max_ref_jaccard, 0) >= 0.1 AS is_dup_of_ref
       |FROM documents d
       |LEFT JOIN per p ON p.doc_id = d.doc_id
       |WHERE d.source <> 'src0'""".stripMargin

  // covariance oracle: identical operation shapes to the Spark plan —
  // tie-free floor(x*1e6) quantization (a rounding cast tie-breaks
  // differently across engines), exact integer-decimal sums, then one
  // fixed IEEE expression for the final covariance
  /** Shared quantized-per-dimension CTEs (floor(x·10⁶) grid + exact
    * decimal sums) — the engine-exactness-critical text BOTH the
    * covariance and centroid-distance oracles replay; the null
    * filter mirrors the aggregates' update() skipping null vectors.
    */
  private val quantizedEmbeddingCtes: String =
    """x AS (
      |  SELECT vec_id,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
      |      AS BIGINT) AS q,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |s AS (
      |  SELECT i, SUM(CAST(q AS DECIMAL(38,0))) AS sx
      |  FROM x GROUP BY i),
      |n AS (
      |  SELECT COUNT(*) AS n FROM embeddings
      |  WHERE embedding IS NOT NULL)""".stripMargin

  /** Recall@k oracle template: the brute-force truth joined against
    * any approximate index's oracle (nested-WITH CTE composition).
    */
  /** The sampled audit's probe rule in DuckDB: same salted-md5
    * hash bucket as Sampling.hashBucket (first 8 hex chars → uniform
    * [0, 2³²)), keep iff bucket < rate·2³². `ref` is the query-side
    * vec_id reference.
    */
  private def annProbeFilterSql(ref: String): String =
    s"""CAST(('0x' || substr(md5('annprobe:' || CAST($ref AS VARCHAR)), 1, 8)) AS BIGINT)
       |    < 0.1 * 4294967296.0""".stripMargin

  /** [[annRecallSql]] with the exact-truth side restricted to the
    * deterministic probe sample — per-probe rows are value-identical
    * to the full audit's (same exact top-k per query), so the
    * composed CTE oracle stays hash-exact.
    */
  private def annRecallSampledSql(approxSql: String): String =
    s"""WITH bf AS (
       |WITH e AS (
       |  SELECT vec_id, embedding, $selfNormSql AS nn
       |  FROM embeddings),
       |c AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $cosSql AS cos_sim
       |  FROM e a JOIN e b ON a.vec_id != b.vec_id
       |  WHERE ${annProbeFilterSql("a.vec_id")}),
       |r AS (
       |  SELECT vec_id, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM c)
       |SELECT vec_id, rank, neighbor_id, cos_sim FROM r WHERE rank <= 5
       |), ap AS (
       |$approxSql
       |)
       |SELECT bf.vec_id, CAST(COUNT(*) AS BIGINT) AS n_true,
       |  CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
       |  CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
       |FROM bf LEFT JOIN ap
       |  ON ap.vec_id = bf.vec_id AND ap.neighbor_id = bf.neighbor_id
       |GROUP BY bf.vec_id""".stripMargin

  private def annRecallSql(approxSql: String): String =
    s"""WITH bf AS (
       |$annBruteForceSql
       |), ap AS (
       |$approxSql
       |)
       |SELECT bf.vec_id, CAST(COUNT(*) AS BIGINT) AS n_true,
       |  CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
       |  CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
       |FROM bf LEFT JOIN ap
       |  ON ap.vec_id = bf.vec_id AND ap.neighbor_id = bf.neighbor_id
       |GROUP BY bf.vec_id""".stripMargin

  private val embeddingCovarianceSql: String =
    s"""WITH $quantizedEmbeddingCtes,
      |p AS (
      |  SELECT a.i AS i, b.i AS j,
      |    SUM(CAST(a.q * b.q AS DECIMAL(38,0))) AS sxx
      |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY a.i, b.i)
      |SELECT CAST(p.i - 1 AS BIGINT) AS i, CAST(p.j - 1 AS BIGINT) AS j,
      |  ((CAST(p.sxx AS DOUBLE) -
      |     CAST(sa.sx AS DOUBLE) * CAST(sb.sx AS DOUBLE)
      |       / (SELECT CAST(n AS DOUBLE) FROM n))
      |    / ((SELECT CAST(n AS DOUBLE) FROM n) - 1)) / 1000000000000.0 AS cov
      |FROM p
      |JOIN s sa ON sa.i = p.i
      |JOIN s sb ON sb.i = p.j""".stripMargin

  /** Quantization oracle (Similarity.quantizeEmbeddings): the
    * sequential amax fold mirrors Spark's `aggregate` fold order
    * (greatest/abs are order-free anyway on NaN-free input), and
    * floor(x/scale + 0.5) is the same tie-free grid. DuckDB's
    * double→TINYINT cast rounds rather than truncates, but floor's
    * result is integral so the cast is exact.
    */
  private val embeddingQuantizeSql: String =
    """WITH s AS (
      |  SELECT vec_id,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
      |      (a, x) -> greatest(a, x)) / 127.0 AS scale,
      |    embedding
      |  FROM embeddings),
      |x AS (
      |  SELECT vec_id, scale,
      |    CAST(unnest(embedding) AS DOUBLE) AS x,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM s)
      |SELECT vec_id, scale, CAST(i - 1 AS INT) AS component,
      |  CAST(CASE WHEN scale = 0.0 THEN 0
      |       ELSE floor(x / scale + 0.5) END AS TINYINT) AS qval
      |FROM x""".stripMargin

  /** Unrolled Lloyd oracle (Similarity.kmeansFit/kmeans). Every step
    * is engine-exact by construction: the Lehmer init sort is integer
    * arithmetic, the assignment distance is the kernel's sequential
    * `(x − c)²` fold (list_reduce == the left-to-right accumulation
    * loop of VectorOps.nearestCentroidIdx, bit-identical doubles),
    * ties resolve `ORDER BY dist ASC, cluster ASC` == the kernel's
    * strict-< ascending scan, and the centroid update sums the SAME
    * `floor(x·10⁶)` integers (order-free, HUGEINT == the aggregate's
    * 128-bit cells) before the one correctly-rounded
    * `s / 1e6 / n` double divide chain. Empty clusters COALESCE to
    * their previous centroid, mirroring the fit loop.
    */
  private def kmeansDistCte(dName: String, cPrev: String,
                            src: String = "eb"): String =
    s"""$dName AS (
       |  SELECT e.vec_id, c.cluster,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(e.embedding) + 1),
       |        j -> (CAST(e.embedding[j] AS DOUBLE) - c.cv[j])
       |           * (CAST(e.embedding[j] AS DOUBLE) - c.cv[j]))),
       |      (acc, v) -> acc + v) AS dist
       |  FROM $src e, $cPrev c)""".stripMargin

  /** `fitPred` restricts the FIT side (init sample + Lloyd updates)
    * — TRUE for within-corpus k-means, a subset predicate for the
    * cross-corpus fit-on-reference variant. Assignment CTEs built
    * on top of these may still assign any row of `eb`.
    */
  private def kmeansCtes(k: Int, iters: Int,
                         fitPred: String = "TRUE"): String = {
    val lehmer = "(vec_id % 2147483647) * 48271 % 2147483647"
    val init =
      s"""eb AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |fb AS (SELECT * FROM eb WHERE $fitPred),
         |init AS (
         |  SELECT vec_id, embedding FROM fb
         |  ORDER BY $lehmer ASC, vec_id ASC LIMIT $k),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (
         |      ORDER BY $lehmer ASC, vec_id ASC) AS INT) - 1 AS cluster,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM init)""".stripMargin
    val iterCtes = (1 to iters).map { t =>
      val p = t - 1
      s"""${kmeansDistCte(s"d$t", s"c$p", "fb")},
         |a$t AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM d$t) WHERE rn = 1),
         |x$t AS (
         |  SELECT a.cluster,
         |    CAST(generate_subscripts(e.embedding, 1) - 1 AS INT) AS component,
         |    CAST(unnest(e.embedding) AS DOUBLE) AS x
         |  FROM a$t a JOIN eb e USING (vec_id)),
         |s$t AS (
         |  SELECT cluster, component,
         |    SUM(CAST(floor(x * 1000000.0) AS HUGEINT)) AS s,
         |    COUNT(*) AS n
         |  FROM x$t GROUP BY cluster, component),
         |n$t AS (
         |  SELECT cluster,
         |    list(CAST(s AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)
         |         ORDER BY component) AS cv
         |  FROM s$t GROUP BY cluster),
         |c$t AS (
         |  SELECT p.cluster, COALESCE(u.cv, p.cv) AS cv
         |  FROM c$p p LEFT JOIN n$t u USING (cluster))""".stripMargin
    }
    (Seq(init) ++ iterCtes).mkString(",\n")
  }

  private def kmeansAssignSql(k: Int, iters: Int): String =
    s"""WITH ${kmeansCtes(k, iters)},
       |${kmeansDistCte("df", s"c$iters")}
       |SELECT vec_id, CAST(cluster AS INT) AS cluster FROM (
       |  SELECT vec_id, cluster, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
       |  FROM df) WHERE rn = 1""".stripMargin

  private def kmeansCentroidsSql(k: Int, iters: Int): String =
    s"""WITH ${kmeansCtes(k, iters)}
       |SELECT cluster,
       |  CAST(generate_subscripts(cv, 1) - 1 AS INT) AS component,
       |  unnest(cv) AS value
       |FROM c$iters""".stripMargin

  /** SemDeDup oracle: the unrolled-Lloyd chain, the final
    * assignment, then exact in-cluster cosines (same fold order as
    * the kernels) and the greedy min-id keep decision. The cap CTE
    * mirrors maxCluster=10000 (never hit at oracle SF, semantics
    * pinned anyway).
    */
  private val semDedupSql: String =
    s"""WITH ${kmeansCtes(8, 2)},
       |${kmeansDistCte("dfin", "c2")},
       |af AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT vec_id, cluster, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
       |    FROM dfin) WHERE rn = 1),
       |en AS (
       |  SELECT e.vec_id, e.embedding, a.cluster, $selfNormSql AS nn
       |  FROM eb e JOIN af a USING (vec_id)),
       |ek AS (
       |  SELECT * FROM en WHERE cluster NOT IN (
       |    SELECT cluster FROM en GROUP BY cluster HAVING count(*) > 10000)),
       |cp AS (
       |  SELECT a.vec_id AS ida, b.vec_id AS idb, $cosSql AS cos
       |  FROM ek a JOIN ek b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
       |u AS (
       |  SELECT ida AS id, idb AS nid, cos FROM cp
       |  UNION ALL SELECT idb AS id, ida AS nid, cos FROM cp),
       |per AS (
       |  SELECT id,
       |    CAST(SUM(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
       |    MAX(cos) AS max_cos,
       |    CAST(SUM(CASE WHEN cos >= 0.4 AND nid < id THEN 1 ELSE 0 END) AS BIGINT) AS n_smaller
       |  FROM u GROUP BY id)
       |SELECT e.vec_id, e.cluster,
       |  COALESCE(p.n_near, 0) AS n_near, p.max_cos,
       |  COALESCE(p.n_smaller, 0) = 0 AS keep
       |FROM en e LEFT JOIN per p ON p.id = e.vec_id""".stripMargin

  /** Normalization oracle: the selfNorm fold then one
    * `x / sqrt(nn)` per component — every op correctly rounded on
    * both engines. Zero vectors pin to exact zeros.
    */
  private val embeddingNormalizeSql: String =
    s"""WITH s AS (
       |  SELECT vec_id, embedding, $selfNormSql AS nn FROM embeddings),
       |x AS (
       |  SELECT vec_id, nn,
       |    CAST(unnest(embedding) AS DOUBLE) AS x,
       |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS component
       |  FROM s)
       |SELECT vec_id, component,
       |  CASE WHEN nn = 0.0 THEN 0.0 ELSE x / sqrt(nn) END AS value
       |FROM x""".stripMargin

  /** Cross-corpus SemDeDup oracle: the fit CTEs run on the
    * reference subset (fitPred), the final assignment covers all
    * vectors, and the candidate join crosses the per-side
    * flood-capped corpus/reference splits.
    */
  private val semDedupCrossSql: String =
    s"""WITH ${kmeansCtes(8, 2, "vec_id % 5 = 0")},
       |${kmeansDistCte("dfin", "c2")},
       |af AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT vec_id, cluster, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
       |    FROM dfin) WHERE rn = 1),
       |en AS (
       |  SELECT e.vec_id, e.embedding, a.cluster, $selfNormSql AS nn
       |  FROM eb e JOIN af a USING (vec_id)),
       |corx AS (SELECT * FROM en WHERE NOT (vec_id % 5 = 0)),
       |refx AS (SELECT * FROM en WHERE vec_id % 5 = 0),
       |cork AS (
       |  SELECT * FROM corx WHERE cluster NOT IN (
       |    SELECT cluster FROM corx GROUP BY cluster HAVING count(*) > 10000)),
       |refk AS (
       |  SELECT * FROM refx WHERE cluster NOT IN (
       |    SELECT cluster FROM refx GROUP BY cluster HAVING count(*) > 10000)),
       |cp AS (
       |  SELECT a.vec_id AS id, $cosSql AS cos
       |  FROM cork a JOIN refk b ON a.cluster = b.cluster),
       |per AS (
       |  SELECT id,
       |    CAST(SUM(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_near,
       |    MAX(cos) AS max_ref_cos
       |  FROM cp GROUP BY id)
       |SELECT c.vec_id, c.cluster,
       |  COALESCE(p.n_ref_near, 0) AS n_ref_near, p.max_ref_cos,
       |  COALESCE(p.max_ref_cos, 0.0) >= 0.4 AS is_dup_of_ref
       |FROM corx c LEFT JOIN per p ON p.id = c.vec_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "embedding_normalize" -> embeddingNormalizeSql,
    "dedup_semantic" -> semDedupSql,
    "dedup_semantic_cross" -> semDedupCrossSql,
    "embedding_kmeans" -> kmeansAssignSql(8, 2),
    "embedding_kmeans_centroids" -> kmeansCentroidsSql(8, 2),
    "embedding_quantize" -> embeddingQuantizeSql,
    "corpus_curate" -> corpusCurateSql,
    "curate_attrition" -> attritionSql,
    // the LM familiarity CTEs (shared with text_lm_familiarity) feed
    // a gated relation into the SAME curate CTE list
    "corpus_curate_lm" ->
      s"""WITH ${TextQueries.lmFamiliarityCtes},
         |gated AS (
         |  SELECT d.* FROM documents d
         |  WHERE d.source = 'src0'
         |     OR d.doc_id IN (
         |       SELECT doc_id FROM fam WHERE familiarity >= 0.031)),
         |${corpusCurateCtesFrom("gated")}""".stripMargin,
    // the DSIR CTEs as the pre-gate, then corpus_curate's CTEs over
    // the gated relation — the corpus_curate_lm composition pattern
    "corpus_curate_dsir" ->
      s"""WITH ${TextQueries.dsirCtes},
         |gated AS (
         |  SELECT d.* FROM documents d
         |  WHERE d.source = 'src0'
         |     OR d.doc_id IN (
         |       SELECT doc_id FROM dsir WHERE dsir_weight >= 0.775)),
         |${corpusCurateCtesFrom("gated")}""".stripMargin,
    // the langid scored frame as the pre-gate (strict declared ==
    // guessed pass), then corpus_curate's CTEs over the gated
    // relation — the same composition pattern
    "corpus_curate_langid" ->
      s"""WITH q AS (
         |${TextQueries.langidNgramSql}
         |),
         |gated AS (
         |  SELECT d.* FROM documents d
         |  WHERE d.source = 'src0'
         |     OR d.doc_id IN (
         |       SELECT doc_id FROM q WHERE lang_guess = declared_lang)),
         |${corpusCurateCtesFrom("gated")}""".stripMargin,
    // same clusters CTE; keeper = the canonical (the true min id),
    // bytes via strlen (octet length), one-row roll-up
    "dedup_cluster_savings" ->
      s"""WITH r AS (
         |$clustersSql
         |),
         |sz AS (
         |  SELECT r.canonical, r.doc_id,
         |    CAST(strlen(d.text) AS BIGINT) AS b
         |  FROM r JOIN documents d ON d.doc_id = r.doc_id),
         |pc AS (
         |  SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(b) AS BIGINT) AS bytes,
         |    CAST(SUM(CASE WHEN doc_id = canonical THEN b ELSE 0 END)
         |      AS BIGINT) AS keep
         |  FROM sz GROUP BY canonical)
         |SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(n - 1) AS BIGINT) AS n_dup,
         |  CAST(SUM(bytes) AS BIGINT) AS bytes_total,
         |  CAST(SUM(bytes - keep) AS BIGINT) AS bytes_saved,
         |  CASE WHEN SUM(n) = 0 THEN NULL
         |    ELSE CAST(SUM(n - 1) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
         |  END AS dup_rate,
         |  CASE WHEN SUM(bytes) = 0 THEN NULL
         |    ELSE CAST(SUM(bytes - keep) AS DOUBLE)
         |      / CAST(SUM(bytes) AS DOUBLE)
         |  END AS bytes_saved_rate
         |FROM pc""".stripMargin,
    "dedup_decontaminate" -> decontaminateSql,
    // the Bloom path promises bit-identical output; same oracle
    "dedup_decontaminate_bloom" -> decontaminateSql,
    "dedup_cross_corpus" -> crossCorpusSql,
    "embedding_covariance" -> embeddingCovarianceSql,
    "embedding_outliers" ->
      s"""WITH $quantizedEmbeddingCtes,
        |d AS (
        |  SELECT x.vec_id,
        |    SUM(CAST(CAST((SELECT n FROM n) * x.q - s.sx AS HUGEINT)
        |      * CAST((SELECT n FROM n) * x.q - s.sx AS HUGEINT) AS HUGEINT))
        |      AS d2
        |  FROM x JOIN s ON s.i = x.i GROUP BY x.vec_id)
        |SELECT vec_id,
        |  sqrt(CAST(CAST(d2 AS DECIMAL(38,0)) AS DOUBLE))
        |    / ((SELECT n FROM n) * 1000000.0) AS dist,
        |  sqrt(CAST(CAST(d2 AS DECIMAL(38,0)) AS DOUBLE))
        |    / ((SELECT n FROM n) * 1000000.0) > 1.01 AS is_outlier
        |FROM d""".stripMargin,
    "dedup_minhash_lsh" -> minhashStatsSql,
    "dedup_clusters" -> clustersSql,
    // same cluster CTE; the split draw is the standard salted-md5
    // rule applied to the CANONICAL id
    "data_split_safe" ->
      s"""WITH r AS (
         |$clustersSql
         |)
         |SELECT doc_id, canonical,
         |  CAST(('0x' || substr(md5('split:' || CAST(canonical AS VARCHAR)), 1, 8))
         |    AS BIGINT) AS split_bucket,
         |  CASE WHEN CAST(('0x' || substr(md5('split:' || CAST(canonical AS VARCHAR)), 1, 8))
         |         AS BIGINT) < 0.8 * 4294967296.0 THEN 'train'
         |       WHEN CAST(('0x' || substr(md5('split:' || CAST(canonical AS VARCHAR)), 1, 8))
         |         AS BIGINT) < (0.8 + 0.1) * 4294967296.0 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM r""".stripMargin,
    // same clusters CTE; both split rules labeled per doc, then the
    // audit folds per-cluster per-split sizes into pair counts —
    // cross = C(n,2) − Σ_s C(n_s,2), exact integer // division
    "data_split_audit" ->
      s"""WITH r AS (
         |$clustersSql
         |),
         |lab AS (
         |  SELECT canonical,
         |    CASE WHEN nb < 0.8 * 4294967296.0 THEN 'train'
         |         WHEN nb < (0.8 + 0.1) * 4294967296.0 THEN 'val'
         |         ELSE 'test' END AS naive_split,
         |    CASE WHEN cb < 0.8 * 4294967296.0 THEN 'train'
         |         WHEN cb < (0.8 + 0.1) * 4294967296.0 THEN 'val'
         |         ELSE 'test' END AS cluster_split
         |  FROM (SELECT canonical,
         |      CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
         |        1, 8)) AS BIGINT) AS nb,
         |      CAST(('0x' || substr(md5('split:' || CAST(canonical AS VARCHAR)),
         |        1, 8)) AS BIGINT) AS cb
         |    FROM r)),
         |aud(rule, split, canonical) AS (
         |  SELECT 'naive', naive_split, canonical FROM lab
         |  UNION ALL
         |  SELECT 'cluster', cluster_split, canonical FROM lab),
         |cs AS (
         |  SELECT rule, canonical, split, CAST(COUNT(*) AS BIGINT) AS ns
         |  FROM aud GROUP BY rule, canonical, split),
         |pc AS (
         |  SELECT rule, canonical, CAST(SUM(ns) AS BIGINT) AS n,
         |    CAST(SUM((ns * (ns - 1)) // 2) AS BIGINT) AS same
         |  FROM cs GROUP BY rule, canonical)
         |SELECT rule, CAST(SUM(n) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_multi_clusters,
         |  CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS n_pairs,
         |  CAST(SUM((n * (n - 1)) // 2 - same) AS BIGINT) AS n_cross_pairs,
         |  CASE WHEN SUM((n * (n - 1)) // 2) = 0 THEN NULL
         |    ELSE CAST(SUM((n * (n - 1)) // 2 - same) AS DOUBLE)
         |      / CAST(SUM((n * (n - 1)) // 2) AS DOUBLE)
         |  END AS leak_rate
         |FROM pc GROUP BY rule""".stripMargin,
    "dedup_cluster_cap" ->
      s"""WITH r AS (
         |$clustersSql
         |)
         |SELECT doc_id, canonical, is_dup,
         |  CAST(row_number() OVER (
         |    PARTITION BY canonical ORDER BY doc_id ASC) AS INT)
         |    AS cluster_rank,
         |  row_number() OVER (
         |    PARTITION BY canonical ORDER BY doc_id ASC) <= 2 AS kept
         |FROM r""".stripMargin,
    // one clusters CTE serving cap rank + canonical-hash split +
    // byte accounting — the composed board's oracle
    "dedup_cluster_board" ->
      s"""WITH r AS (
         |$clustersSql
         |)
         |SELECT r.doc_id, r.canonical, r.is_dup,
         |  CAST(row_number() OVER (
         |    PARTITION BY canonical ORDER BY r.doc_id ASC) AS INT)
         |    AS cluster_rank,
         |  row_number() OVER (
         |    PARTITION BY canonical ORDER BY r.doc_id ASC) <= 2 AS kept,
         |  CASE WHEN CAST(('0x' || substr(md5('split:' ||
         |         CAST(canonical AS VARCHAR)), 1, 8)) AS BIGINT)
         |         < 0.8 * 4294967296.0 THEN 'train'
         |       WHEN CAST(('0x' || substr(md5('split:' ||
         |         CAST(canonical AS VARCHAR)), 1, 8)) AS BIGINT)
         |         < (0.8 + 0.1) * 4294967296.0 THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(strlen(d.text) AS BIGINT) AS n_bytes
         |FROM r JOIN documents d ON d.doc_id = r.doc_id""".stripMargin,
    "dedup_simhash" -> simhashSql,
    "dedup_embedding" -> embeddingStatsSql,
    "dedup_embedding_lsh" -> embeddingLshStatsSql,
    "ann_bruteforce_topk" -> annBruteForceSql,
    "ann_lsh_topk" -> annLshSql,
    "ann_lsh_multiprobe" -> annLshMultiprobeSql,
    "ann_recall_lsh_multiprobe" -> annRecallSql(annLshMultiprobeSql),
    "ann_recall" -> annRecallSql(annLshSql),
    // the same brute-force CTE over half-truncated embeddings (the
    // kernel re-norms whatever vector it gets, so truncation is one
    // list_slice)
    "ann_recall_truncated" -> annRecallSql(
      s"""WITH temb AS (
         |  SELECT vec_id, list_slice(embedding, 1, len(embedding) // 2)
         |    AS embedding
         |  FROM embeddings),
         |${annBruteForceSql.stripPrefix("WITH ")
             .replace("FROM embeddings", "FROM temb")}""".stripMargin),
    "ann_recall_sampled" -> annRecallSampledSql(annLshSql),
    "ann_recall_sampled_ivf" -> annRecallSampledSql(annIvfSql),
    "ann_recall_ivf" -> annRecallSql(annIvfSql),
    "ann_ivf_topk" -> annIvfSql,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    // within-source keep-one ROI: bytes_saved = non-keeper bytes
    "dedup_savings" ->
      """WITH g AS (
        |  SELECT source, md5(text) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS bytes,
        |    CAST(MIN(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS keep_bytes
        |  FROM documents GROUP BY source, md5(text))
        |SELECT source,
        |  CAST(SUM(n) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_unique,
        |  CAST(SUM(n - 1) AS BIGINT) AS n_dup,
        |  CAST(SUM(bytes) AS BIGINT) AS bytes_total,
        |  CAST(SUM(bytes - keep_bytes) AS BIGINT) AS bytes_saved,
        |  CAST(SUM(n - 1) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_rate
        |FROM g GROUP BY source""".stripMargin,
    "dedup_exact_normalized" ->
      """SELECT
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS norm_hash,
        |  min(doc_id) AS keep_doc_id, COUNT(*) AS n_copies,
        |  COUNT(DISTINCT md5(text)) AS n_raw_variants
        |FROM documents GROUP BY 1""".stripMargin,
    // text_winnow's print CTEs (same positional salted-md5 gram
    // hashes, window minima, DISTINCT tie collapse) composed with the
    // containment verdict shape: rare prints (df <= 20; df >= 2
    // implied by the pair join) qualify candidate pairs, the metric
    // divides the shared-print count by EACH side's own print count
    "dedup_winnow" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(text) - 7, 0) + 1),
        |      i -> CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 1, 8))
        |        AS BIGINT)) AS hs
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(hs) - 3, 0) + 1),
        |    j -> list_min(list_slice(hs, j, j + 3)))) AS fingerprint
        |  FROM h WHERE len(hs) >= 4),
        |fp AS (SELECT DISTINCT doc_id AS id, fingerprint FROM m),
        |sizes AS (SELECT id, count(*) AS np FROM fp GROUP BY id),
        |rare AS (SELECT fingerprint FROM fp GROUP BY fingerprint
        |         HAVING count(*) <= 20),
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb
        |  FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.id < b.id
        |  WHERE a.fingerprint IN (SELECT fingerprint FROM rare)),
        |shared AS (
        |  SELECT c.ida, c.idb, count(*) AS shared
        |  FROM cand c
        |  JOIN fp sa ON sa.id = c.ida
        |  JOIN fp sb ON sb.id = c.idb AND sb.fingerprint = sa.fingerprint
        |  GROUP BY c.ida, c.idb),
        |ov AS (
        |  SELECT ida, idb,
        |    CAST(shared AS DOUBLE) / za.np AS ov_a,
        |    CAST(shared AS DOUBLE) / zb.np AS ov_b
        |  FROM shared
        |  JOIN sizes za ON za.id = ida
        |  JOIN sizes zb ON zb.id = idb),
        |per AS (
        |  SELECT id, count(*) AS n_candidates,
        |    CAST(SUM(CASE WHEN overlap >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_overlapping,
        |    max(overlap) AS max_overlap
        |  FROM (SELECT ida AS id, ov_a AS overlap FROM ov
        |        UNION ALL SELECT idb AS id, ov_b AS overlap FROM ov)
        |  GROUP BY id)
        |SELECT d.doc_id,
        |  COALESCE(p.n_candidates, 0) AS n_candidates,
        |  COALESCE(p.n_overlapping, 0) AS n_overlapping,
        |  p.max_overlap
        |FROM documents d LEFT JOIN per p ON p.id = d.doc_id""".stripMargin,
    // same shingle/rare-candidate CTEs as dedup_ngram_jaccard; the
    // metric divides the shared count by EACH side's own set size
    // (directional containment), thresholded at 0.5
    "dedup_containment" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id AS id, substr(text, CAST(i AS INT), 5) AS shingle
        |  FROM documents, UNNEST(range(1, greatest(length(text) - 3, 2))) AS t(i)),
        |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 20),
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        |  WHERE a.shingle IN (SELECT shingle FROM rare)),
        |shared AS (
        |  SELECT c.ida, c.idb, count(*) AS shared
        |  FROM cand c
        |  JOIN sh sa ON sa.id = c.ida
        |  JOIN sh sb ON sb.id = c.idb AND sb.shingle = sa.shingle
        |  GROUP BY c.ida, c.idb),
        |cont AS (
        |  SELECT ida, idb,
        |    CAST(shared AS DOUBLE) / za.n_sh AS cont_a,
        |    CAST(shared AS DOUBLE) / zb.n_sh AS cont_b
        |  FROM shared
        |  JOIN sizes za ON za.id = ida
        |  JOIN sizes zb ON zb.id = idb),
        |per AS (
        |  SELECT id, count(*) AS n_candidates,
        |    CAST(SUM(CASE WHEN containment >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_contained,
        |    max(containment) AS max_containment
        |  FROM (SELECT ida AS id, cont_a AS containment FROM cont
        |        UNION ALL SELECT idb AS id, cont_b AS containment FROM cont)
        |  GROUP BY id)
        |SELECT d.doc_id,
        |  COALESCE(p.n_candidates, 0) AS n_candidates,
        |  COALESCE(p.n_contained, 0) AS n_contained,
        |  p.max_containment
        |FROM documents d LEFT JOIN per p ON p.id = d.doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id AS id, substr(text, CAST(i AS INT), 5) AS shingle
        |  FROM documents, UNNEST(range(1, greatest(length(text) - 3, 2))) AS t(i)),
        |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 20),
        |cand AS (
        |  SELECT DISTINCT a.id AS ida, b.id AS idb
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        |  WHERE a.shingle IN (SELECT shingle FROM rare)),
        |shared AS (
        |  SELECT c.ida, c.idb, count(*) AS shared
        |  FROM cand c
        |  JOIN sh sa ON sa.id = c.ida
        |  JOIN sh sb ON sb.id = c.idb AND sb.shingle = sa.shingle
        |  GROUP BY c.ida, c.idb),
        |jac AS (
        |  SELECT ida, idb,
        |    CAST(shared AS DOUBLE) / (za.n_sh + zb.n_sh - shared) AS jaccard
        |  FROM shared
        |  JOIN sizes za ON za.id = ida
        |  JOIN sizes zb ON zb.id = idb),
        |per AS (
        |  SELECT id, count(*) AS n_candidates,
        |    CAST(SUM(CASE WHEN jaccard >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
        |    max(jaccard) AS max_jaccard
        |  FROM (SELECT ida AS id, jaccard FROM jac
        |        UNION ALL SELECT idb AS id, jaccard FROM jac)
        |  GROUP BY id)
        |SELECT d.doc_id,
        |  COALESCE(p.n_candidates, 0) AS n_candidates,
        |  COALESCE(p.n_near, 0) AS n_near,
        |  p.max_jaccard
        |FROM documents d LEFT JOIN per p ON p.id = d.doc_id""".stripMargin)
}
