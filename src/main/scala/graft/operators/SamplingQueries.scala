package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-checked sampling + packing queries over the documents
  * corpus (training-data pipeline surface beyond SURVEY §2's 38).
  */
object SamplingQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  private val rates = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)
  private val defaultRate = 0.1

  def dataSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(docs(spark, dir), "doc_id", "lang",
      rates, defaultRate)
      .select("doc_id", "lang", "source", "sample_bucket")

  def dataPack(spark: SparkSession, dir: String): DataFrame =
    Sampling.packSequences(
      docs(spark, dir).select(col("doc_id"), col("lang"),
        ceil(length(col("text")) / 4.0).cast("long").as("est_tokens")),
      "doc_id", "est_tokens", capacity = 2048L, shards = 8)

  // mixture targets: src0 is oversubscribed at sf0.01 (0.30 × 8000
  // > its ~2k tokens), exercising the rate-1 epoch cap in the driver
  // check; unweighted sources drop out
  private val mixWeights = Map("src0" -> 0.30, "src1" -> 0.05,
    "src2" -> 0.05)
  private val mixBudget = 8000L

  private def docsWithTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"), col("source"),
      ceil(length(col("text")) / 4.0).cast("long").as("est_tokens"))

  def dataMixPlan(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixPlan(docsWithTokens(spark, dir), "source", "est_tokens",
      mixWeights, mixBudget)

  def dataMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixSample(docsWithTokens(spark, dir), "doc_id", "source",
      "est_tokens", mixWeights, mixBudget)
      .select("doc_id", "source", "est_tokens", "sample_bucket")

  /** Epoch-aware upsampling: src0 at weight 0.60 against its ~2k
    * tokens (sf0.01) derives ~2.4 epochs — whole repeats plus a
    * fractional hash sample; src1 stays sub-epoch.
    */
  def dataMixEpochs(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixEpochs(docsWithTokens(spark, dir), "doc_id", "source",
      "est_tokens", Map("src0" -> 0.60, "src1" -> 0.05), mixBudget)
      .select("doc_id", "source", "est_tokens", "sample_bucket", "n_copies")

  def dataMixTemperaturePlan(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMixPlan(docsWithTokens(spark, dir), "source",
      "est_tokens", alpha = 0.5, budgetTokens = mixBudget)

  def dataMixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val d = docsWithTokens(spark, dir)
    Sampling.applyMixPlan(d, "doc_id", "source",
      Sampling.temperatureMixPlan(d, "source", "est_tokens",
        alpha = 0.5, budgetTokens = mixBudget))
      .select("doc_id", "source", "est_tokens", "sample_bucket")
  }

  /** Crawl-style per-source frequency cap: at most 10 docs per
    * source, drawn by salted hash (unbiased within-group sample).
    */
  def sourceCap(spark: SparkSession, dir: String): DataFrame =
    Sampling.capPerGroup(docs(spark, dir).select("doc_id", "source"),
      "doc_id", "source", cap = 10)

  /** Quality-weighted sampling: keep probability ∝ alpha ratio,
    * scaled by a 0.5 base rate.
    */
  def dataSampleWeighted(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(
      docs(spark, dir).select(col("doc_id"), col("source"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text"))).as("weight")),
      "doc_id", "weight", rate = 0.5)

  /** Deterministic 80/10/10 split assignment over the corpus. */
  def dataSplit(spark: SparkSession, dir: String): DataFrame =
    Sampling.trainValTestSplit(docs(spark, dir), "doc_id")
      .select("doc_id", "lang", "source", "split_bucket", "split")

  /** Deterministic 8-shard training-order permutation. */
  def dataShard(spark: SparkSession, dir: String): DataFrame =
    Sampling.shardForTraining(docs(spark, dir).select("doc_id", "source"),
      "doc_id", shards = 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_sample" -> (dataSample _),
    "data_split" -> (dataSplit _),
    "data_shard" -> (dataShard _),
    "data_pack" -> (dataPack _),
    "data_mix_plan" -> (dataMixPlan _),
    "data_mix" -> (dataMix _),
    "data_mix_temperature_plan" -> (dataMixTemperaturePlan _),
    "data_mix_temperature" -> (dataMixTemperature _),
    "data_mix_epochs" -> (dataMixEpochs _),
    "source_cap" -> (sourceCap _),
    "data_sample_weighted" -> (dataSampleWeighted _))

  /** Shared mix CTEs: per-source token totals -> weights -> the
    * capped rate. `CAST(SUM AS BIGINT)` pins DuckDB's HUGEINT sum
    * back to Spark's long; the weight CASE casts to DOUBLE so the
    * rate arithmetic is the same double chain
    * (weight · budget, then / tokens_have) on both engines.
    */
  private val mixCtes: String =
    """t AS (
      |  SELECT doc_id, source,
      |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS sample_bucket
      |  FROM documents),
      |p AS (
      |  SELECT source, CAST(SUM(est_tokens) AS BIGINT) AS tokens_have,
      |    CAST(CASE source WHEN 'src0' THEN 0.30 WHEN 'src1' THEN 0.05
      |         WHEN 'src2' THEN 0.05 ELSE 0.0 END AS DOUBLE) AS weight
      |  FROM t GROUP BY source),
      |r AS (
      |  SELECT source, tokens_have, weight,
      |    weight * 8000.0 AS tokens_target,
      |    least(1.0, weight * 8000.0 / tokens_have) AS rate
      |  FROM p)""".stripMargin

  /** Temperature (alpha = 0.5) mix CTEs: the normalizer is an
    * ORDERED list fold (ORDER BY source == the driver's
    * sorted-stratum fold), sqrt is correctly rounded on both
    * engines, and every later expression repeats the same
    * left-associated double chain as temperatureMixPlan.
    */
  private val temperatureCtes: String =
    """t AS (
      |  SELECT doc_id, source,
      |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS sample_bucket
      |  FROM documents),
      |p AS (
      |  SELECT source, CAST(SUM(est_tokens) AS BIGINT) AS tokens_have
      |  FROM t GROUP BY source),
      |z AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(sqrt(CAST(tokens_have AS DOUBLE)) ORDER BY source)),
      |    (a, x) -> a + x) AS z
      |  FROM p),
      |r AS (
      |  SELECT source, tokens_have,
      |    sqrt(CAST(tokens_have AS DOUBLE)) / z.z AS weight,
      |    sqrt(CAST(tokens_have AS DOUBLE)) / z.z * 8000.0 AS tokens_target,
      |    least(1.0, sqrt(CAST(tokens_have AS DOUBLE)) / z.z * 8000.0
      |      / tokens_have) AS rate
      |  FROM p, z)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // keep iff bucket < (clamped weight * rate) * 2^32 — the same
    // left-associated double chain as weightedSample
    "data_sample_weighted" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS weight,
        |    CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS sample_bucket
        |  FROM documents)
        |SELECT doc_id, source, weight, sample_bucket
        |FROM t
        |WHERE sample_bucket <
        |  least(1.0, greatest(0.0, weight)) * 0.5 * 4294967296.0""".stripMargin,
    "source_cap" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS cap_bucket
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, cap_bucket,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY cap_bucket ASC, doc_id ASC) AS INT)
        |      AS cap_rank
        |  FROM t)
        |SELECT doc_id, source, cap_bucket, cap_rank
        |FROM r WHERE cap_rank <= 10""".stripMargin,
    "data_mix_epochs" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS sample_bucket
        |  FROM documents),
        |p AS (
        |  SELECT source, CAST(SUM(est_tokens) AS BIGINT) AS tokens_have,
        |    CAST(CASE source WHEN 'src0' THEN 0.60 WHEN 'src1' THEN 0.05
        |         ELSE 0.0 END AS DOUBLE) AS weight
        |  FROM t GROUP BY source),
        |r AS (
        |  SELECT source,
        |    least(CAST(4.0 AS DOUBLE), weight * 8000.0 / tokens_have) AS epochs
        |  FROM p),
        |x AS (
        |  SELECT t.doc_id, t.source, t.est_tokens, t.sample_bucket,
        |    CAST(floor(r.epochs) AS BIGINT) +
        |      CASE WHEN t.sample_bucket <
        |        (r.epochs - floor(r.epochs)) * 4294967296.0
        |      THEN 1 ELSE 0 END AS n_copies
        |  FROM t JOIN r USING (source))
        |SELECT doc_id, source, est_tokens, sample_bucket, n_copies
        |FROM x WHERE n_copies > 0""".stripMargin,
    "data_mix_temperature_plan" ->
      s"""WITH $temperatureCtes
         |SELECT source, tokens_have, weight, tokens_target, rate
         |FROM r""".stripMargin,
    "data_mix_temperature" ->
      s"""WITH $temperatureCtes
         |SELECT t.doc_id, t.source, t.est_tokens, t.sample_bucket
         |FROM t JOIN r USING (source)
         |WHERE t.sample_bucket < r.rate * 4294967296.0""".stripMargin,
    "data_mix_plan" ->
      s"""WITH $mixCtes
         |SELECT source, tokens_have, weight, tokens_target, rate
         |FROM r""".stripMargin,
    "data_mix" ->
      s"""WITH $mixCtes
         |SELECT t.doc_id, t.source, t.est_tokens, t.sample_bucket
         |FROM t JOIN r USING (source)
         |WHERE t.sample_bucket < r.rate * 4294967296.0""".stripMargin,
    "data_split" ->
      """SELECT doc_id, lang, source,
        |  CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) AS split_bucket,
        |  CASE WHEN CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |         AS BIGINT) < 0.8 * 4294967296.0 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |         AS BIGINT) < (0.8 + 0.1) * 4294967296.0 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "data_shard" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS shard_bucket
        |  FROM documents)
        |SELECT doc_id, source, shard_bucket,
        |  CAST(shard_bucket % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY shard_bucket % 8
        |    ORDER BY shard_bucket ASC, doc_id ASC) AS INT) AS shard_pos
        |FROM t""".stripMargin,
    "data_sample" ->
      """SELECT doc_id, lang, source,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS sample_bucket
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |  < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 WHEN 'fr' THEN 0.25
        |              ELSE 0.1 END * 4294967296.0""".stripMargin,
    "data_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
        |    CAST(doc_id % 8 AS INT) AS pack_shard
        |  FROM documents),
        |c AS (
        |  SELECT *, COALESCE(SUM(est_tokens) OVER (
        |    PARTITION BY pack_shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM t)
        |SELECT doc_id, lang, est_tokens, pack_shard,
        |  pack_shard * 1000000 + CAST(cb // 2048 AS BIGINT) AS bin_id,
        |  CAST(cb % 2048 AS BIGINT) AS token_offset
        |FROM c""".stripMargin)
}
