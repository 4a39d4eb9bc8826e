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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_sample" -> (dataSample _),
    "data_pack" -> (dataPack _))

  val oracleSql: Map[String, String] = Map(
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
