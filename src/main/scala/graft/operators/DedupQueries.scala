package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Query entries for the dedup + similarity operators (#27-33).
  * dedup_exact and dedup_ngram_jaccard have full DuckDB oracles; the
  * hash/LSH/float operators are rows-only (seeded hash families and
  * IEEE float rank ties aren't portably expressible in DuckDB SQL)
  * but every output is still fully deterministic.
  */
object DedupQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d), "doc_id", "text")),
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardStats(docs(s, d), "doc_id", "text")),
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshStats(docs(s, d), "doc_id", "text")),
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashStats(docs(s, d), "doc_id", "text")),
    "dedup_embedding" -> ((s, d) =>
      Dedup.embeddingStats(embs(s, d), "vec_id", "embedding")),
    // 0.8 is the conventional near-dup resolution threshold (weaker
    // similarity is analysis signal, not a drop decision); it also
    // keeps the cluster graph sparse on shared-vocabulary corpora
    "dedup_clusters" -> ((s, d) =>
      Dedup.dedupResolve(docs(s, d), "doc_id", "text", threshold = 0.8)),
    "ann_bruteforce_topk" -> ((s, d) =>
      Similarity.annBruteForce(embs(s, d), "vec_id", "embedding")),
    "ann_lsh_topk" -> ((s, d) =>
      Similarity.annLsh(embs(s, d), "vec_id", "embedding")))

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
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
