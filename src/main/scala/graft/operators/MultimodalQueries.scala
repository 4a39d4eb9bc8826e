package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.multimodal.Multimodal

/** Query entry for the multimodal binary-column surface (#38). The
  * decode-stub feature extraction is covered by MultimodalSpec; this
  * query oracle-checks the binary payload plumbing (byte lengths,
  * content hashes, typed metadata).
  */
object MultimodalQueries {

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.metaQuery(
      Multimodal.assetsFromDocuments(Tables.load(spark, dir, "documents")))

  /** Frame-sampling plumbing (oracle covers the explode shape; the
    * stub frame_hash is spec-verified — xxhash64 isn't portable SQL).
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.assetsFromDocuments(Tables.load(spark, dir, "documents")),
      everyN = 30)
      .select("asset_id", "media_type", "n_frames", "frame_idx")

  /** Aspect-fit resize planning into a 256×256 box (pure metadata
    * arithmetic — oracle-exact; pixel execution is spec-verified).
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(
      Multimodal.assetsFromDocuments(Tables.load(spark, dir, "documents")),
      maxW = 256, maxH = 256)

  /** Audio resample planning to a 8 kHz target (pure metadata + byte
    * arithmetic in int64 `div` — oracle-exact; the fixture's audio
    * rate is 16 kHz so the downsample branch actually fires).
    */
  def multimodalResample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resamplePlan(
      Multimodal.assetsFromDocuments(Tables.load(spark, dir, "documents")),
      targetRate = 8000)

  /** Exact asset dedup by payload content hash WITHIN each media
    * type (bytes matching across types is coincidence, not
    * duplication): the binary sibling of `dedup_exact` — one
    * hash-groupBy with map-side combine, the shuffle carries
    * (md5, type, id, bytes), never payloads. `bytes_saved` is the
    * dedup ROI a storage planner reads off directly.
    */
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Multimodal.assetsFromDocuments(Tables.load(spark, dir, "documents"))
      .groupBy(md5(col("payload")).as("payload_md5"), col("media_type"))
      .agg(min(col("asset_id")).as("keep_asset_id"),
        count(lit(1)).as("n_copies"),
        max(length(col("payload"))).cast("long").as("n_bytes"))
      .withColumn("bytes_saved", (col("n_copies") - 1L) * col("n_bytes"))
  }

  /** Perceptual NEAR-dup for binary assets — the asset-side sibling
    * of the five text near-dup operators: 64-bit dHash per asset
    * ([[Multimodal.perceptualHashes]]; MD5-prefix degradation for
    * undecodable payloads), then per media type the SAME chunk-
    * bucket/flood-cap/exact-collapse Hamming pipeline SimHash uses
    * ([[Dedup.hammingNearDupFromHashes]] — by pigeonhole any pair
    * within Hamming 3 shares a 16-bit chunk; verified by
    * bit_count(xor)). Types pair independently (an audio clip's
    * bytes colliding with an image is coincidence, not duplication
    * — the [[multimodalDedup]] scoping rule), as three small
    * invocations of the shared machinery unioned back: |types| is a
    * fixed 3, so this costs three bounded job groups, never a
    * per-type plan explosion. The text fixture exercises the MD5
    * path end-to-end against the DuckDB oracle (hash-exact, the
    * portable-md5 recipe); the decode path — real images re-encoded,
    * rescaled, gamma-shifted pairing within radius — is
    * MultimodalSpec-pinned.
    */
  def multimodalNearDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val assets = Multimodal
      .assetsFromDocuments(Tables.load(spark, dir, "documents"))
      .as[Multimodal.MediaAsset]
    // one decode pass over the payloads, reused by every per-type
    // invocation AND the final join
    val hashes = graft.Materialize.eager(
      Multimodal.perceptualHashes(assets).toDF())
    // r22 (guide §2): ONE media_type-KEYED invocation of the shared
    // Hamming machinery instead of three per-type invocations — the
    // r21 shape overlapped the 9 driver-synchronized jobs (3 group
    // materializations + 3 flood collects + 3 candidate checkpoints)
    // with inParallel but still made 3 passes over the hash frame
    // and was the board's most unstable entry (warm attempts
    // 1.8–9.8 s). The keyed pass is 3 jobs and one pass; per-key
    // results are value-identical to the per-type union
    // (KeyedHammingSpec pins it; the oracle replays the per-type
    // composition and stays green).
    val stats = Dedup.hammingNearDupFromHashesKeyed(
      hashes.select(col("asset_id").as("id"), col("media_type"),
        col("phash").as("simhash")),
      "id", "media_type", maxHamming = 8, maxBucket = 10000)
    hashes.join(
        stats.select(col("id").as("asset_id"), col("n_candidates"),
          col("n_near"), col("min_hamming")),
        Seq("asset_id"))
      .select(col("asset_id"), col("media_type"), col("decoded"),
        col("phash"), col("n_candidates"), col("n_near"),
        col("min_hamming"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_dedup" -> (multimodalDedup _),
    "multimodal_near_dedup" -> (multimodalNearDedup _),
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_resize" -> (multimodalResize _),
    "multimodal_resample" -> (multimodalResample _))

  val oracleSql: Map[String, String] = Map(
    // the MD5-degradation path end to end: phash = first 8 md5 bytes
    // (the portable-md5 recipe, 64-bit form), chunk buckets / flood
    // cap / distinct pairs / bit_count(xor) verify replayed per
    // media_type — the simhash oracle's shape with the type key.
    // decoded is constant false on the text fixture (nothing parses
    // as an image); the decode path is MultimodalSpec-pinned.
    "multimodal_near_dedup" ->
      """WITH ph AS (
        |  SELECT doc_id AS asset_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(('0x' || substr(md5(text), 1, 16)) AS UBIGINT) AS u
        |  FROM documents),
        |chunksall AS (
        |  SELECT asset_id, media_type, u, CAST(c AS INT) AS chunk,
        |    (u >> (CAST(c AS INT) * 16)) & 65535 AS cval
        |  FROM ph, range(4) t(c)),
        |flood AS (
        |  SELECT media_type, chunk, cval FROM chunksall
        |  GROUP BY media_type, chunk, cval HAVING count(*) > 10000),
        |chunks AS (
        |  SELECT c.* FROM chunksall c ANTI JOIN flood f
        |    ON c.media_type = f.media_type AND c.chunk = f.chunk
        |   AND c.cval = f.cval),
        |cand AS (
        |  SELECT DISTINCT a.asset_id AS ida, a.u AS ua,
        |    b.asset_id AS idb, b.u AS ub
        |  FROM chunks a JOIN chunks b
        |    ON a.media_type = b.media_type AND a.chunk = b.chunk
        |   AND a.cval = b.cval AND a.asset_id < b.asset_id),
        |ham AS (
        |  SELECT ida, idb, CAST(bit_count(xor(ua, ub)) AS INT) AS hamming
        |  FROM cand),
        |per AS (
        |  SELECT id, COUNT(*) AS n_candidates,
        |    CAST(SUM(CASE WHEN hamming <= 8 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_near,
        |    min(hamming) AS min_hamming
        |  FROM (SELECT ida AS id, hamming FROM ham
        |        UNION ALL SELECT idb AS id, hamming FROM ham)
        |  GROUP BY id)
        |SELECT p.asset_id, p.media_type, false AS decoded,
        |  CAST(CASE WHEN p.u >= 9223372036854775808
        |       THEN CAST(p.u AS HUGEINT) - 18446744073709551616
        |       ELSE CAST(p.u AS HUGEINT) END AS BIGINT) AS phash,
        |  COALESCE(per.n_candidates, 0) AS n_candidates,
        |  COALESCE(per.n_near, 0) AS n_near,
        |  per.min_hamming
        |FROM ph p LEFT JOIN per ON per.id = p.asset_id""".stripMargin,
    // md5(text) == md5 of the utf-8 payload bytes (the cast the
    // Spark side applies); media_type replays the doc_id % 3 rule
    "multimodal_dedup" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    md5(text) AS payload_md5,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT payload_md5, media_type,
        |  min(asset_id) AS keep_asset_id,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  max(n_bytes) AS n_bytes,
        |  (CAST(count(*) AS BIGINT) - 1) * max(n_bytes) AS bytes_saved
        |FROM a GROUP BY payload_md5, media_type""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  CAST((doc_id % 16 + 1) * 64 AS INT) AS width,
        |  CAST((doc_id % 9 + 1) * 64 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN (doc_id % 100 + 1) * 30 ELSE 0 END AS INT) AS n_frames
        |FROM documents""".stripMargin,
    "multimodal_resize" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST((doc_id % 16 + 1) * 64 AS INT) AS width,
        |    CAST((doc_id % 9 + 1) * 64 AS INT) AS height
        |  FROM documents),
        |t AS (
        |  SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS scale
        |  FROM a)
        |SELECT asset_id, media_type, width, height,
        |  CAST(CASE WHEN media_type = 'image'
        |       THEN greatest(floor(width * scale), 1.0) ELSE width END AS INT)
        |    AS target_w,
        |  CAST(CASE WHEN media_type = 'image'
        |       THEN greatest(floor(height * scale), 1.0) ELSE height END AS INT)
        |    AS target_h,
        |  CAST(CASE WHEN media_type = 'image'
        |       THEN greatest(floor(width * scale), 1.0) ELSE width END AS INT)
        |      != width
        |    OR CAST(CASE WHEN media_type = 'image'
        |       THEN greatest(floor(height * scale), 1.0) ELSE height END AS INT)
        |      != height AS resized,
        |  CAST(CAST(CASE WHEN media_type = 'image'
        |       THEN greatest(floor(width * scale), 1.0) ELSE width END AS BIGINT)
        |    * CAST(CASE WHEN media_type = 'image'
        |       THEN greatest(floor(height * scale), 1.0) ELSE height END
        |       AS BIGINT) * 3 AS BIGINT) AS est_bytes_out
        |FROM t""".stripMargin,
    "multimodal_resample" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |t AS (
        |  SELECT asset_id, media_type, sample_rate,
        |    CAST(CASE WHEN media_type = 'audio' AND sample_rate > 0
        |         THEN n_bytes // 2 ELSE 0 END AS BIGINT) AS n_samples_in,
        |    CAST(CASE WHEN media_type = 'audio' AND sample_rate > 0
        |         THEN least(sample_rate, 8000) ELSE sample_rate END AS INT)
        |      AS target_rate
        |  FROM a)
        |SELECT asset_id, media_type, sample_rate, n_samples_in, target_rate,
        |  coalesce(target_rate != sample_rate, false) AS resampled,
        |  CAST(CASE WHEN sample_rate > 0
        |       THEN (n_samples_in * target_rate) // sample_rate
        |       ELSE 0 END AS BIGINT) AS est_samples_out,
        |  CAST(CASE WHEN sample_rate > 0
        |       THEN (n_samples_in * target_rate) // sample_rate
        |       ELSE 0 END * 2 AS BIGINT) AS est_bytes_out
        |FROM t""".stripMargin,
    "multimodal_frames" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(CASE WHEN doc_id % 3 = 2 THEN (doc_id % 100 + 1) * 30 ELSE 0 END AS INT) AS n_frames
        |  FROM documents)
        |SELECT asset_id, media_type, n_frames,
        |  unnest(CASE WHEN media_type = 'video'
        |         THEN range(0, CAST(n_frames AS BIGINT), 30)
        |         ELSE [CAST(0 AS BIGINT)] END) AS frame_idx
        |FROM a""".stripMargin)
}
