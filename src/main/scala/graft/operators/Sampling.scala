package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling + sequence packing for training-data pipelines.
  *
  * Both are pure projections/windows — no RNG (hash-deterministic
  * sampling reproduces exactly across runs, engines, and cluster
  * sizes, and lets a later run EXTEND a sample by raising the rate:
  * the kept set is monotone in the rate).
  */
object Sampling {

  /** Uniform [0, 2^32) bucket from the md5 of the id — portable
    * across engines (md5 is everywhere; xxhash64 is not).
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic stratified sampling: keep a row iff its hash
    * bucket falls below the stratum's rate. One codegen'd filter —
    * no sampleBy/RNG, so the sample is stable under re-runs and
    * repartitioning, and rates can differ per stratum (e.g. keep
    * all rare-language documents, 10% of English).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, v).otherwise(acc)
    }
    df.withColumn("sample_bucket", hashBucket(col(idCol)))
      .filter(col("sample_bucket") < rate * 4294967296.0)
  }

  /** Deterministic WEIGHTED sampling: keep a row iff its salted hash
    * bucket falls below `weight · rate · 2³²`, where `weight` is a
    * per-row [0, 1] column (a quality score) — each row's keep
    * probability is proportional to its weight, so the sample
    * soft-prefers high-quality documents instead of hard-gating on a
    * threshold (the quality-weighted regime pretraining mixes use
    * between "keep all" and "top-quantile only"). Same determinism
    * contract as [[stratifiedSample]]: no RNG, stable under re-runs
    * and repartitioning, kept set monotone in `rate`, and the salt
    * decorrelates from every other bucket use of the id. One
    * codegen'd projection + filter — no shuffle at any corpus size.
    * Weights are clamped into [0, 1]; null weights drop the row.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     rate: Double = 1.0,
                     salt: String = "wsample"): DataFrame = {
    require(rate > 0 && rate <= 1.0, s"rate must be in (0, 1], got $rate")
    val w = least(lit(1.0), greatest(lit(0.0), col(weightCol).cast("double")))
    df.withColumn("sample_bucket",
        hashBucket(concat(lit(s"$salt:"), col(idCol).cast("string"))))
      .filter(col("sample_bucket") < w * rate * 4294967296.0)
  }

  /** Per-group frequency cap — the crawl-pipeline "at most N pages
    * per domain" rule: within each group keep the `cap` rows with the
    * LOWEST salted hash buckets (a deterministic uniform draw, so the
    * kept set is an unbiased within-group sample, stable under
    * re-runs and — unlike rank-by-id — unbiased under id assignment
    * order; the id tiebreak only disambiguates bucket collisions).
    *
    * Scale shape: the rank-≤-cap filter plans as WindowGroupLimit —
    * each partition locally retains cap rows per group before the
    * exchange, so the shuffle carries at most cap·|groups| rows per
    * partition, never the corpus. No collect, no skew sensitivity
    * beyond the window's own hash partitioning.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  cap: Int, salt: String = "cap"): DataFrame = {
    require(cap >= 1, "cap must be positive")
    val bucket = hashBucket(concat(lit(s"$salt:"), col(idCol).cast("string")))
    df.withColumn("cap_bucket", bucket)
      .withColumn("cap_rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("cap_bucket").asc, col(idCol).asc)))
      .filter(col("cap_rank") <= cap)
  }

  /** Deterministic train/val/test assignment: each row lands in the
    * named fraction whose cumulative [0, 1) interval contains its
    * salted hash bucket. Pure per-row projection — no shuffle, no
    * RNG, stable under re-runs, repartitioning, and corpus growth
    * (a document's split never changes when other documents arrive,
    * the property that keeps eval sets honest across crawls). The
    * salt decorrelates the split from every other hash-bucket use of
    * the same id (e.g. [[stratifiedSample]]), so sampling inside a
    * split stays unbiased.
    */
  def trainValTestSplit(df: DataFrame, idCol: String,
                        fractions: Seq[(String, Double)] =
                          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                        salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val bucket = hashBucket(concat(lit(s"$salt:"), col(idCol).cast("string")))
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val assign = fractions.init.zip(cuts).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), cut), acc) =>
        when(col("split_bucket") < cut * 4294967296.0, name).otherwise(acc)
    }
    df.withColumn("split_bucket", bucket)
      .withColumn("split", assign)
  }

  /** LEAKAGE-SAFE split: the split draw hashes the near-dup CLUSTER
    * CANONICAL instead of the doc id, so every member of a duplicate
    * cluster lands in the SAME split — the classic eval-contamination
    * failure (train and test each holding a near-copy of the same
    * document, silently inflating eval scores) becomes structurally
    * impossible instead of merely unlikely. Input is any
    * (id, canonical) cluster frame — [[graft.operators.Dedup
    * .dedupResolve]]'s output is the intended producer — and the
    * assignment is the same salted-md5 rule as [[trainValTestSplit]]
    * applied to the canonical, so singleton docs (their own
    * canonical) draw exactly as the per-doc split would. One narrow
    * projection over the cluster frame: the expensive part is the
    * clustering the pipeline already ran.
    */
  def splitByCluster(clusters: DataFrame, canonicalCol: String,
                     fractions: Seq[(String, Double)] =
                       Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                     salt: String = "split"): DataFrame =
    trainValTestSplit(clusters, canonicalCol, fractions, salt)

  /** Split LEAKAGE AUDIT — how many near-duplicate pairs straddle a
    * split boundary under a given assignment. The number every
    * benchmark-integrity review asks for: a train/test near-copy is
    * silent eval contamination, [[splitByCluster]] makes it
    * structurally impossible, and this operator PROVES it (or
    * measures the damage of a naive per-doc split).
    *
    * `assigned` carries one row per document with its near-dup
    * cluster canonical and its split label. Cross-split pairs are
    * counted from per-cluster per-split COUNTS — for a cluster of n
    * docs with n_s per split, cross = C(n,2) − Σ_s C(n_s,2) — so no
    * pair ever materializes: two integer aggregates at any corpus
    * size, exact BIGINT arithmetic (`div 2` on the always-even
    * products), one IEEE division to the rate. Output is ONE row:
    * (n_docs, n_clusters, n_multi_clusters, n_pairs, n_cross_pairs,
    * leak_rate) where n_pairs counts within-cluster pairs and
    * leak_rate = cross/pairs (NULL when the corpus has no near-dup
    * pairs at all).
    */
  def splitLeakageAudit(assigned: DataFrame, canonicalCol: String,
                        splitCol: String): DataFrame = {
    val perCS = assigned.groupBy(col(canonicalCol), col(splitCol))
      .agg(count(lit(1)).as("_ns"))
    val perC = perCS.groupBy(col(canonicalCol))
      .agg(sum(col("_ns")).as("_n"),
        sum(expr("(_ns * (_ns - 1)) div 2")).as("_same"))
      .withColumn("_pairs", expr("(_n * (_n - 1)) div 2"))
    perC.agg(
        coalesce(sum(col("_n")), lit(0L)).as("n_docs"),
        count(lit(1)).as("n_clusters"),
        coalesce(sum(when(col("_n") > 1L, 1L).otherwise(0L)), lit(0L))
          .as("n_multi_clusters"),
        coalesce(sum(col("_pairs")), lit(0L)).as("n_pairs"),
        coalesce(sum(col("_pairs") - col("_same")), lit(0L))
          .as("n_cross_pairs"))
      .select(col("n_docs"), col("n_clusters"), col("n_multi_clusters"),
        col("n_pairs"), col("n_cross_pairs"),
        when(col("n_pairs") === 0L, lit(null).cast("double"))
          .otherwise(col("n_cross_pairs").cast("double") /
            col("n_pairs").cast("double")).as("leak_rate"))
  }

  /** Deterministic training-order sharding: the "globally shuffle
    * the corpus for training" pass, reduced to ONE hash exchange.
    * Each row's salted hash bucket picks a shard (`bucket mod
    * shards`) and orders it within the shard (`shard_pos` = rank by
    * (bucket, id)) — a reproducible pseudorandom permutation with no
    * global sort, no RNG state, and no driver involvement. At write
    * time this is exactly `repartition(shard)` +
    * `sortWithinPartitions(bucket, id)`: the window below reuses
    * that same partitioning, so position assignment costs nothing
    * beyond the exchange the layout already needs. Sequential reads
    * of shard files then replay a shuffled order epoch after epoch.
    */
  def shardForTraining(df: DataFrame, idCol: String, shards: Int,
                       salt: String = "shard"): DataFrame = {
    require(shards >= 1, "shards must be positive")
    val bucket = hashBucket(concat(lit(s"$salt:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shard_bucket").asc, col(idCol).asc)
    df.withColumn("shard_bucket", bucket)
      .withColumn("shard", pmod(col("shard_bucket"), lit(shards.toLong)).cast("int"))
      .withColumn("shard_pos", row_number().over(w))
  }

  /** Token-budgeted mixture planning: given target mixture weights
    * (share of the training budget per stratum — source, language,
    * quality band) and a total token budget, derive the
    * deterministic per-stratum sampling rate
    * `min(1, weight · budget / tokens_have)`. A stratum with fewer
    * tokens than its target caps at rate 1 (one full epoch — the
    * operator surfaces the shortfall in `tokens_target` vs
    * `tokens_have` instead of silently re-weighting; up-sampling is
    * a repetition policy, not a filter's job). Strata without a
    * weight get rate 0 and drop out.
    *
    * One k-group aggregate over the corpus — the plan itself is
    * stratum-cardinality-sized.
    */
  def mixPlan(df: DataFrame, stratumCol: String, tokensCol: String,
              weights: Map[String, Double], budgetTokens: Long): DataFrame = {
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, v).otherwise(acc)
    }
    df.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).as("tokens_have"))
      .withColumn("weight", w)
      .withColumn("tokens_target", col("weight") * lit(budgetTokens.toDouble))
      .withColumn("rate",
        least(lit(1.0), col("tokens_target") / col("tokens_have")))
  }

  /** Temperature-derived mixture weights: `w_s ∝ tokens_s^alpha`,
    * normalized — the multilingual/multi-source sampling standard
    * (alpha < 1 flattens the natural distribution so low-resource
    * strata aren't drowned; alpha = 1 is proportional, alpha = 0
    * uniform). Same output shape as [[mixPlan]] with the weights
    * computed instead of given.
    *
    * Determinism: the per-stratum token counts are exact longs; the
    * normalizer folds on the DRIVER in sorted-stratum order (the
    * plan is stratum-cardinality-sized — collecting it is the
    * operator's design, as with every model-sized fit here), so the
    * weight doubles are bit-reproducible across partitionings and —
    * for alpha = 0.5, which routes through correctly-rounded
    * `sqrt` — across engines too (`pow` carries no such guarantee:
    * other alphas remain deterministic per-platform but are not
    * oracle-grade).
    */
  def temperatureMixPlan(df: DataFrame, stratumCol: String,
                         tokensCol: String, alpha: Double,
                         budgetTokens: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    // the driver fold reads the stratum as a string — enforce the
    // contract loudly instead of a ClassCastException mid-fold.
    // Resolve through the analyzer (df.select), not df.schema(name):
    // the latter is case-SENSITIVE and would reject a column the
    // query itself resolves fine under Spark's default rules.
    require(df.select(col(stratumCol)).schema.head.dataType ==
        org.apache.spark.sql.types.StringType,
      s"temperatureMixPlan: $stratumCol must be a string column")
    // a NULL stratum can't be named in a mixture: exclude it (the
    // explicit-weights mixPlan gives unnamed strata weight 0 — same
    // outcome) instead of NPE-ing the driver fold's sort. Null token
    // rows are excluded the same way (an all-null stratum would sum
    // to NULL and NPE getLong), and a ZERO-token stratum is dropped
    // before the fold: it contributes nothing to a token mixture,
    // and its rate would otherwise be target/0 = NaN silently
    // propagated into the plan.
    val counts = df.filter(col(stratumCol).isNotNull &&
        col(tokensCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).as("tokens_have"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 > 0L)
      .sortBy(_._1)
    require(counts.nonEmpty,
      "temperatureMixPlan: no stratum has positive tokens")
    val pows = counts.map { case (s, n) =>
      val p =
        if (alpha == 0.5) math.sqrt(n.toDouble)
        else math.pow(n.toDouble, alpha)
      (s, n, p)
    }
    val z = pows.foldLeft(0.0)((acc, t) => acc + t._3)
    val rows = pows.map { case (s, n, p) =>
      val weight = p / z
      val target = weight * budgetTokens.toDouble
      (s, n, weight, target, math.min(1.0, target / n))
    }
    val sp = df.sparkSession
    import sp.implicits._
    rows.toSeq.toDF(stratumCol, "tokens_have", "weight",
      "tokens_target", "rate")
  }

  /** Keep a row iff its hash bucket falls below its stratum's rate
    * from a mix plan ([[mixPlan]] or [[temperatureMixPlan]]). The
    * plan joins back as a BROADCAST (stratum cardinality) and the
    * kept set is hash-deterministic and monotone in the budget:
    * raising the budget only ADDS documents, so growing a mixture
    * never churns the previously selected corpus.
    */
  def applyMixPlan(df: DataFrame, idCol: String, stratumCol: String,
                   plan: DataFrame): DataFrame =
    df.join(broadcast(plan.select(col(stratumCol), col("rate"))),
        Seq(stratumCol))
      .withColumn("sample_bucket", hashBucket(col(idCol)))
      .filter(col("sample_bucket") < col("rate") * 4294967296.0)

  /** [[mixPlan]] + [[applyMixPlan]] in one call. Two corpus passes
    * total (count + filter — inherent to budget-relative rates).
    */
  def mixSample(df: DataFrame, idCol: String, stratumCol: String,
                tokensCol: String, weights: Map[String, Double],
                budgetTokens: Long): DataFrame =
    applyMixPlan(df, idCol, stratumCol,
      mixPlan(df, stratumCol, tokensCol, weights, budgetTokens))

  /** Epoch-aware upsampling — the repetition policy [[mixPlan]]'s
    * rate-1 cap defers to. Where a stratum's target exceeds its
    * tokens, `epochs = min(maxEpochs, weight·budget/tokens)` may
    * pass 1: every document repeats `floor(epochs)` times and the
    * fractional epoch is a hash-bucket sample, so `n_copies` is
    * per-document deterministic, partition-invariant, and MONOTONE
    * in the budget (raising the budget never reduces any document's
    * repeat count — stable curriculum growth). `maxEpochs` bounds
    * repetition of tiny high-weight strata (the memorization
    * guard). Rows with zero copies drop out.
    *
    * Output: input columns + sample_bucket + n_copies (a repeat
    * COUNT — materializing the copies is the trainer's
    * concatenation step, not a filter's).
    */
  def mixEpochs(df: DataFrame, idCol: String, stratumCol: String,
                tokensCol: String, weights: Map[String, Double],
                budgetTokens: Long, maxEpochs: Double = 4.0): DataFrame = {
    require(maxEpochs >= 1.0, "maxEpochs must be at least 1")
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, v).otherwise(acc)
    }
    val plan = df.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).as("tokens_have"))
      .withColumn("epochs", least(lit(maxEpochs),
        w * lit(budgetTokens.toDouble) / col("tokens_have")))
    df.join(broadcast(plan.select(col(stratumCol), col("epochs"))),
        Seq(stratumCol))
      .withColumn("sample_bucket", hashBucket(col(idCol)))
      .withColumn("n_copies",
        floor(col("epochs")) +
          when(col("sample_bucket") <
            (col("epochs") - floor(col("epochs"))) * 4294967296.0, 1L)
            .otherwise(0L))
      .filter(col("n_copies") > 0L)
      .drop("epochs")
  }

  /** Contiguous-fill sequence packing: shard the corpus (so the
    * running sum is a PARTITIONED window — a global cumsum would
    * serialize 100 TB through one task), order within shard, and
    * assign each document to the token-capacity bin its running
    * offset lands in. Documents may straddle bins (contiguous-fill
    * model, the dominant packing used for LLM pretraining batches);
    * `token_offset` says where in the bin the document starts.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    capacity: Long, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("pack_shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pack_shard", pmod(col(idCol), lit(shards)).cast("int"))
      .withColumn("_cum_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin_id",
        col("pack_shard") * 1000000L +
          floor(col("_cum_before") / capacity.toDouble).cast("long"))
      .withColumn("token_offset", col("_cum_before") % capacity)
      .drop("_cum_before")
  }
}
