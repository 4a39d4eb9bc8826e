package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

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

  private def topKWithin(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** #32 Exact top-K neighbors by cosine, brute force. Cosine is
    * symmetric, so each unordered pair is scored once (a.id < b.id)
    * and mirrored for ranking — half the kernel work of the naive
    * a != b cross join.
    */
  def annBruteForce(df: DataFrame, idCol: String, vecCol: String,
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

  /** #33 LSH-bucketed top-K: equi-join on SRP bucket, top-K within.
    * The plan must contain NO cartesian/nested-loop join — asserted
    * in PlanSpec.
    */
  def annLsh(df: DataFrame, idCol: String, vecCol: String,
             k: Int = 5, planes: Int = 6, seed: Long = 42L): DataFrame = {
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.srpBucket(col(vecCol), planes, seed).as("bucket"))
    val pairs = e.as("a").join(e.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        VectorFunctions.cosineSim(col("a.v"), col("b.v")).as("cos_sim"))
    topKWithin(pairs, k)
  }
}
