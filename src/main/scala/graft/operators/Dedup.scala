package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, VectorFunctions}

/** Deduplication operators for LLM training-data pipelines
  * (SURVEY.md §2 #27-31): exact, n-gram Jaccard, MinHash+LSH,
  * SimHash, and embedding-cosine near-dup.
  *
  * Scale shape (the point of every design choice here): no operator
  * ever joins on raw text or compares all pairs. Candidates come from
  * equi-joins on small keys (rare shingles, LSH band hashes, SimHash
  * chunks, SRP buckets); only candidate pairs are verified against
  * the full sets. Shuffles carry (id, small-key) projections, never
  * documents.
  */
object Dedup {

  /** Distinct character n-gram shingles per document: (id, shingle).
    * Generated inside codegen (sequence+transform+explode — no UDF);
    * the projection drops the text before anything shuffles.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(transform(
        sequence(lit(1), greatest(length(col(textCol)) - (n - 1), lit(1))),
        i => col(textCol).substr(i, lit(n))))).as("shingle"))

  /** #27 Exact dedup: hash-groupBy keep-min-id. The shuffle carries
    * (md5, id) pairs only.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Verify candidate pairs against full shingle sets and aggregate
    * per-document stats. Shared tail of the Jaccard-style near-dup
    * operators: candidates (ida < idb) -> true Jaccard -> per-doc
    * (n_candidates, n_near, max_jaccard), left-joined back so every
    * document reports (0 candidates => nulls/zeroes, never a dropped
    * row).
    */
  private def jaccardPairStats(df: DataFrame, idCol: String, sh: DataFrame,
                               cand: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val shared = cand
      .join(sh.as("sa"), col("sa.id") === col("ida"))
      .join(sh.as("sb"), col("sb.id") === col("idb") &&
        col("sb.shingle") === col("sa.shingle"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("shared"))
    val jac = shared
      .join(sizes.as("za"), col("za.id") === col("ida"))
      .join(sizes.as("zb"), col("zb.id") === col("idb"))
      .select(col("ida"), col("idb"),
        (col("shared").cast("double") /
          (col("za.n_sh") + col("zb.n_sh") - col("shared"))).as("jaccard"))
    val both = jac.select(col("ida").as("id"), col("jaccard"))
      .unionByName(jac.select(col("idb").as("id"), col("jaccard")))
    val per = both.groupBy("id").agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("jaccard") >= threshold, 1L).otherwise(0L)).as("n_near"),
      max(col("jaccard")).as("max_jaccard"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        col("max_jaccard"))
  }

  /** #28 N-gram Jaccard near-dup. Candidates = pairs sharing at least
    * one RARE shingle (document frequency <= maxDf): frequent
    * shingles carry no discriminative signal and would make the
    * shingle self-join quadratic in the corpus size, so they are
    * excluded from candidate generation (not from verification).
    */
  def ngramJaccardStats(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 5, maxDf: Int = 20,
                        threshold: Double = 0.1): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("shingle")
    val rsh = sh.join(rare, Seq("shingle"))
    val cand = rsh.as("a").join(rsh.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb")).distinct()
    jaccardPairStats(df, idCol, sh, cand, threshold)
  }

  /** #29 MinHash+LSH near-dup: numPerm permutations approximated by
    * seeded xxhash64 over shingles (min per seed), banded into
    * `bands` groups whose hashes become the LSH bucket keys. The
    * shuffle carries (band, bandHash, id) — never shingle sets; only
    * band-collision pairs are verified with true Jaccard.
    */
  def minhashLshStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, numPerm: Int = 64, bands: Int = 16,
                      threshold: Double = 0.1): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide evenly into bands")
    val r = numPerm / bands
    val sh = shingles(df, idCol, textCol, n)
    val sigCols = (0 until numPerm).map(p =>
      min(xxhash64(col("shingle"), lit(p))).as(s"h$p"))
    val sigs = sh.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * r until (b + 1) * r).map(p => col(s"h$p")): _*).as("bhash"))
    }
    val bandRows = sigs
      .select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))
    val cand = bandRows.as("a").join(bandRows.as("b"),
      col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb")).distinct()
    jaccardPairStats(df, idCol, sh, cand, threshold)
  }

  /** #30 SimHash near-dup: 64-bit SimHash (custom codegen'd Catalyst
    * expression) bucketed on its four 16-bit chunks — by pigeonhole,
    * any pair within Hamming distance 3 shares a chunk; candidates
    * are verified with bit_count(xor).
    */
  def simhashStats(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      HashFunctions.simhash64(split(col(textCol), " ")).as("simhash"))
    val chunkCols = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("simhash"), c * 16)
          .bitwiseAND(lit(0xffffL)).as("cval"))
    }
    val chunks = hashed
      .select(col("id"), col("simhash"), explode(array(chunkCols: _*)).as("cc"))
      .select(col("id"), col("simhash"), col("cc.chunk").as("chunk"),
        col("cc.cval").as("cval"))
    val cand = chunks.as("a").join(chunks.as("b"),
      col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("a.simhash").as("ha"),
        col("b.id").as("idb"), col("b.simhash").as("hb")).distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
    val both = cand.select(col("ida").as("id"), col("hamming"))
      .unionByName(cand.select(col("idb").as("id"), col("hamming")))
    val per = both.groupBy("id").agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("hamming") <= maxHamming, 1L).otherwise(0L)).as("n_near"),
      min(col("hamming")).as("min_hamming"))
    hashed.join(per, Seq("id"), "left")
      .select(col("id").as(idCol), col("simhash"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        col("min_hamming"))
  }

  /** #31 Embedding-cosine near-dup, brute-force all-pairs baseline
    * (the correctness oracle for the LSH path — see
    * Similarity.annLsh for the shape that survives 100 TB).
    */
  def embeddingStats(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.4): DataFrame = {
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"),
        VectorFunctions.cosineSim(col("a.v"), col("b.v")).as("cos"))
    val both = pairs.select(col("ida").as("id"), col("cos"))
      .unionByName(pairs.select(col("idb").as("id"), col("cos")))
    val per = both.groupBy("id").agg(
      sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_near"),
      max(col("cos")).as("max_cos"))
    e.select(col("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_near"), lit(0L)).as("n_near"), col("max_cos"))
  }
}
