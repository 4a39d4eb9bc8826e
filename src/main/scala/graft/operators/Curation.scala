package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs, wired from the engine's own operators —
  * quality gates (TextAnalysis), Gopher repetition gates, exact
  * dedup keep-min-id (Dedup.exact semantics), benchmark
  * decontamination (Dedup.decontaminate), and a token budget
  * accounting roll-up.
  *
  * Scale shape: the gates are one codegen'd projection (no shuffle);
  * dedup shuffles (md5, id) pairs only; decontamination broadcasts
  * the benchmark shingle set; the final roll-up is a partial-agg
  * groupBy. Nothing here is more expensive than its standalone
  * operator — composition adds no extra passes over the text.
  */
object Curation {

  /** Keep the top `frac` of every group by score — "top 30 % by
    * quality per language", the relative curation gate used when an
    * absolute threshold would gut low-resource groups. Ranking is
    * `row_number` over (score desc, id asc) — fully deterministic
    * under ties — against a per-group `ceil(count · frac)` cutoff,
    * so every non-empty group keeps at least one document.
    *
    * One shuffle on the group key; both windows share that
    * partitioning (Catalyst plans a single exchange + sort). A
    * dominant group serializes through one task's sort — at corpus
    * scale prefer finer groups (e.g. language × source) over one
    * global stratum, same guidance as every windowed operator here.
    */
  def topQuantileByGroup(df: DataFrame, groupCol: String,
                         scoreCol: String, idCol: String,
                         frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")
    // unscoreable rows are OUT of the gate entirely — both out of
    // the ranking AND out of the per-group quota: counting them in
    // `_n` would inflate every cutoff, and at a quantile deep
    // enough they'd pass a 'top quality' gate themselves
    val scored = df.filter(col(scoreCol).isNotNull)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val cw = Window.partitionBy(col(groupCol))
    scored.withColumn("q_rank", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(cw))
      .filter(col("q_rank") <= ceil(col("_n") * lit(frac)))
      .drop("_n")
  }

  /** Budget-capped curation: per group, keep the best documents
    * (score desc, id asc — deterministic under ties) until the
    * NEXT document would overflow the group's token budget, i.e.
    * keep while the running token total INCLUDING the candidate
    * stays ≤ budget. The greedy prefix rule every "fill each
    * domain's share of the training mix with its best data" pass
    * uses — the token-denominated complement of the fraction-
    * denominated [[topQuantileByGroup]].
    *
    * One group-keyed exchange shared by the rank and running-sum
    * windows (same partitioning, same ordering — one sort). A
    * document larger than the remaining budget blocks everything
    * behind it (prefix rule, not knapsack): the deliberate,
    * deterministic reading, and the one an auditor can replay.
    * Output adds (budget_rank, tokens_cum) to the kept rows.
    */
  def tokenBudgetByGroup(df: DataFrame, groupCol: String,
                         scoreCol: String, tokensCol: String,
                         idCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val scored = df.filter(col(scoreCol).isNotNull &&
      col(tokensCol).isNotNull)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    scored.withColumn("budget_rank", row_number().over(w))
      .withColumn("tokens_cum", sum(col(tokensCol)).over(w))
      .filter(col("tokens_cum") <= budget)
  }

  /** Filter, dedup, and decontaminate a corpus, then account the
    * surviving documents and estimated tokens per group.
    *
    * @param benchFilter rows matching this are the held-out benchmark
    *                    (decontamination reference), excluded from
    *                    the curated output
    * @param groupCols   accounting grain of the output roll-up
    * @param contamN     decontamination gram length in CHARS; 30
    *                    chars ~ 5 words, the verbatim-leak scale (13
    *                    chars ~ 2 words flags mere shared vocabulary)
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             benchFilter: Column, groupCols: Seq[String],
             stopwords: Seq[String] = Seq("the", "a"),
             minWords: Long = 20L, maxAvgWordLen: Double = 8.0,
             minDistinctRatio: Double = 0.2,
             maxTopWordFraction: Double = 0.2,
             contamN: Int = 30): DataFrame = {
    val corpus = docs.filter(not(benchFilter))
    val bench = docs.filter(benchFilter)
    // the SAME column builders as text_quality / text_repetition, so
    // gate decisions are bit-identical to the standalone operators
    val qm = TextAnalysis.qualityMetrics(col(textCol), stopwords).toMap
    val rm = TextAnalysis.repetitionMetrics(col(textCol)).toMap
    val est = TextAnalysis.tokenMetrics(col(textCol)).toMap.apply("est_bpe_tokens")
    // exact-dedup keep-min-id via ONE window pass (a groupBy+self-join
    // would evaluate the gate projection — including the per-doc
    // O(words²) top-word scan — twice); the survivors are materialized
    // once and feed both decontamination shingling and the final join
    // r22 (guide §4.4's duplication disease, expression form): as a
    // plain .filter(...) the gate conjunction lands in a FilterExec,
    // which does NO subexpression elimination — the word-freq-stats
    // kernel (referenced by two repetition metrics) scanned every
    // document twice. Computing the single gate BOOLEAN inside a
    // Project (where whole-stage codegen CSE dedups the kernel) and
    // filtering on the generated column keeps one evaluation; the
    // one-element explode is the predicate-pushdown barrier that
    // stops the optimizer substituting the expression back into the
    // filter (the langIdScore pattern). filter(gate) on a NULL gate
    // (null text) drops the row in both forms — value-identical.
    val gate = qm("n_words") >= minWords &&
      qm("avg_word_len") < maxAvgWordLen &&
      rm("distinct_word_ratio") > minDistinctRatio &&
      rm("top_word_fraction") < maxTopWordFraction
    val kept = corpus
      .select(col("*"), explode(array(gate)).as("_pass"))
      .filter(col("_pass")).drop("_pass")
      .withColumn("_est", est)
      .withColumn("_h", md5(col(textCol)))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_h")).orderBy(col(idCol).asc)))
      .filter(col("_rn") === 1).drop("_rn")
      .transform(graft.Materialize.eager)
    // decontaminate only the kept survivors — dropping a doc the gates
    // or dedup already removed is a no-op, so shingling the full
    // corpus would be wasted text passes
    val contaminated = Dedup
      .decontaminate(kept, bench, idCol, textCol, contamN)
      .filter(col("contaminated")).select(col(idCol))
    val clean = kept.join(contaminated, Seq(idCol), "left_anti")
    clean.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_est")).as("n_tokens"),
        min(col(idCol)).as("first_doc"))
  }

  /** Attrition FUNNEL for the [[curate]] pipeline: per stage, how
    * many documents (and estimated tokens) enter, survive, and are
    * removed — the gate-by-gate accounting every production curation
    * run reports ("quality cut 12 %, dedup cut 31 %, decontamination
    * cut 0.4 %"), and the first thing an operator reads when a
    * corpus shrinks unexpectedly at 100 TB.
    *
    * Same gates, same order, same defaults as [[curate]], so the
    * stage-4 `docs_out`/`tokens_out` row reconciles exactly with
    * `corpus_curate`'s roll-up totals (spec-pinned). Each document
    * is labeled with its FIRST failing stage (1 = quality, 2 =
    * repetition, 3 = exact duplicate, 4 = contaminated, 0 =
    * survived); a single conditional aggregation to the ≤5-row
    * per-label table then reshapes into the 4-row funnel through a
    * constant-key broadcast join (the q15 pmod shape — never a
    * cartesian). Dedup keep-min-id is ONE window ordered (gate-pass
    * desc, id asc): a gate-passer with rank 1 is its hash group's
    * keeper, failed docs sort behind every passer and keep their
    * earlier label.
    *
    * Scale shape: identical passes to [[curate]] (one gate
    * projection, the md5 window, survivor-only shingling against
    * the broadcast benchmark set) plus one ≤5-row aggregate — the
    * funnel costs nothing beyond the pipeline it audits.
    */
  def attrition(docs: DataFrame, idCol: String, textCol: String,
                benchFilter: Column,
                stopwords: Seq[String] = Seq("the", "a"),
                minWords: Long = 20L, maxAvgWordLen: Double = 8.0,
                minDistinctRatio: Double = 0.2,
                maxTopWordFraction: Double = 0.2,
                contamN: Int = 30): DataFrame = {
    val corpus = docs.filter(not(benchFilter))
    val bench = docs.filter(benchFilter)
    val qm = TextAnalysis.qualityMetrics(col(textCol), stopwords).toMap
    val rm = TextAnalysis.repetitionMetrics(col(textCol)).toMap
    val est = TextAnalysis.tokenMetrics(col(textCol)).toMap.apply("est_bpe_tokens")
    // null text must FAIL stage 1, not skate through on three-valued
    // logic — coalesce each gate to false
    val qPass = coalesce(qm("n_words") >= minWords &&
      qm("avg_word_len") < maxAvgWordLen, lit(false))
    val rPass = coalesce(rm("distinct_word_ratio") > minDistinctRatio &&
      rm("top_word_fraction") < maxTopWordFraction, lit(false))
    val w = Window.partitionBy(col("_h"))
      .orderBy(col("_pass").desc, col(idCol).asc)
    val labeled0 = corpus
      .select(col(idCol), col(textCol), est.as("_est"),
        qPass.as("_q"), rPass.as("_r"), md5(col(textCol)).as("_h"))
      .withColumn("_pass", col("_q") && col("_r"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_ff0",
        when(!col("_q"), 1).when(!col("_r"), 2)
          .when(col("_rn") > 1, 3).otherwise(0))
      .transform(graft.Materialize.eager)
    // decontaminate only the survivors — same economy as curate
    val contaminated = Dedup
      .decontaminate(labeled0.filter(col("_ff0") === 0), bench,
        idCol, textCol, contamN)
      .filter(col("contaminated"))
      .select(col(idCol), lit(true).as("_c"))
    val labeled = labeled0
      .join(contaminated, Seq(idCol), "left")
      .select(col("_est"),
        when(col("_ff0") > 0, col("_ff0"))
          .when(coalesce(col("_c"), lit(false)), 4)
          .otherwise(0).as("_ff"))
    // the q15 pmod shape: a runtime-constant key Catalyst cannot
    // fold away (lit(0) = lit(0) folds to `true` and the join
    // degenerates to a BroadcastNestedLoopJoin — the PlanSpec guard)
    val byFail = labeled.groupBy(col("_ff"))
      .agg(count(lit(1)).as("_n"), sum(col("_est")).as("_tok"))
      .withColumn("_k", pmod(col("_ff"), lit(1)).cast("int"))
    val spark = docs.sparkSession
    import spark.implicits._
    val stages = Seq((1, "quality"), (2, "repetition"),
      (3, "exact_dedup"), (4, "decontaminate"))
      .toDF("stage_idx", "stage")
      .withColumn("_k", pmod(col("stage_idx"), lit(1)).cast("int"))
    stages.join(broadcast(byFail), Seq("_k"))
      .groupBy(col("stage_idx"), col("stage"))
      .agg(
        coalesce(sum(when(col("_ff") === 0 ||
          col("_ff") >= col("stage_idx"), col("_n"))), lit(0L)).as("docs_in"),
        coalesce(sum(when(col("_ff") === 0 ||
          col("_ff") > col("stage_idx"), col("_n"))), lit(0L)).as("docs_out"),
        coalesce(sum(when(col("_ff") === col("stage_idx"), col("_n"))),
          lit(0L)).as("docs_removed"),
        coalesce(sum(when(col("_ff") === 0 ||
          col("_ff") > col("stage_idx"), col("_tok"))), lit(0L))
          .as("tokens_out"))
      .orderBy(col("stage_idx"))
  }

  /** CCNet-style head/middle/tail bucketing (Wenzek et al. 2020,
    * public): per group (per language, the CCNet grain), rank
    * documents by reference-LM familiarity and cut the scored set
    * into TERCILES — `head` is the most in-distribution third,
    * `tail` the least. CCNet ships these buckets instead of a hard
    * gate so downstream consumers choose their own quality/quantity
    * trade-off; the score is [[TextAnalysis.lmFamiliarity]]'s
    * rational form (higher = more familiar, so `head` = highest
    * familiarity = CCNet's lowest-perplexity bucket).
    *
    * `ntile(3)` over (familiarity desc, id asc) is deterministic
    * under ties and splits remainders toward `head` — the standard
    * SQL contract on both engines. Documents the model cannot score
    * (≤1 word: zero bigrams, NULL familiarity) keep their row with a
    * NULL bucket rather than polluting the tail tercile.
    *
    * Scale shape: the familiarity joins (model is distinct-bigram-
    * sized), then ONE exchange on the group key for the tercile
    * window over doc-count rows (id + score only, no text). A
    * dominant group serializes through one task's sort — same
    * guidance as [[topQuantileByGroup]]: prefer finer strata
    * (language × source) at corpus scale. The scored frame is
    * materialized once so the scored/unscored branches don't
    * recompute the model joins.
    */
  def familiarityBuckets(docs: DataFrame, idCol: String, textCol: String,
                         groupCol: String, refFilter: Column): DataFrame = {
    val fam = TextAnalysis
      .lmFamiliarity(docs, idCol, textCol, refFilter)
      .select(col(idCol), col("familiarity"))
    val scored = docs.select(col(idCol), col(groupCol))
      .join(fam, Seq(idCol))
      .transform(graft.Materialize.eager)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("familiarity").desc, col(idCol).asc)
    val nn = scored.filter(col("familiarity").isNotNull)
      .withColumn("bucket_idx", ntile(3).over(w))
      .withColumn("bucket",
        when(col("bucket_idx") === 1, "head")
          .when(col("bucket_idx") === 3, "tail")
          .otherwise("middle"))
    val un = scored.filter(col("familiarity").isNull)
      .withColumn("bucket_idx", lit(null).cast("int"))
      .withColumn("bucket", lit(null).cast("string"))
    nn.unionByName(un)
  }
}
