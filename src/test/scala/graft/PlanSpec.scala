package graft

/** Plan-shape assertions: the optimizations the engine's 100 TB story
  * depends on must be visible in the actual plans, not just intended.
  */
class PlanSpec extends SparkSpec {

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q2 filter and projection reach the parquet scan") {
    val plan = formatted("q2_filter_project")
    assert(plan.contains("PushedFilters:") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\].*"),
      s"shipdate filter not pushed:\n${plan.take(3000)}")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity[^\\]]*\\].*"),
      "quantity filter not pushed")
    // ReadSchema must be the 4 needed columns, not the whole table
    val read = plan.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(!read.contains("l_extendedprice") && !read.contains("l_comment"),
      s"scan reads unneeded columns: $read")
  }

  test("pipe_transform_chain pushes its Where through the whole chain") {
    val plan = formatted("pipe_transform_chain")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity[^\\]]*\\].*"),
      "config-chain filter must reach the scan through rename/cast/normalize")
  }

  test("q3 carries no forced broadcast on the fact-scale customer table") {
    val analyzed = SparkEntry.queries("q3_join_agg")(spark, sf)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      "customer must not be hint-broadcast; AQE decides at runtime")
  }

  test("q4 dimension joins broadcast (no shuffle for dims)") {
    val plan = SparkEntry.queries("q4_broadcast_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q10 plans as TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("q10_topk_orders")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q6_revenue_forecast: all three predicates reach the parquet scan") {
    val plan = formatted("q6_revenue_forecast")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(plan.matches(s"(?s).*PushedFilters: \\[[^\\]]*$c[^\\]]*\\].*"),
        s"$c not pushed:\n${plan.take(2000)}")
    }
  }

  test("q10_returned_item: top-20 is TakeOrderedAndProject after the agg") {
    val plan = SparkEntry.queries("q10_returned_item")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q2_min_cost_supp: dims broadcast, min is one window (no join-back)") {
    val plan = SparkEntry.queries("q2_min_cost_supp")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("q1 keeps partial (map-side) aggregation") {
    val plan = SparkEntry.queries("q1_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final aggregates, got $aggs:\n${plan.take(1500)}")
  }

  test("text analysis and dedup shingle plans stay UDF-free") {
    Seq("text_fingerprint", "text_quality", "dedup_exact").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
        s"$q plan contains a UDF")
    }
  }

  test("no query in the entry map plans a cartesian or nested-loop join") {
    // the blanket 100 TB guard: any all-pairs physical join that
    // sneaks into a plan is a scale regression, wherever it hides
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q plans a CartesianProduct")
      // exceptions: the documented O(N²) baselines intentionally
      // compare all pairs (broadcast side is the whole corpus)
      val exemptAllPairs =
        Set("dedup_embedding", "ann_bruteforce_topk")
      if (!exemptAllPairs.contains(q))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$q plans a BroadcastNestedLoopJoin")
    }
  }

  test("rank filters trigger WindowGroupLimit pushdown (bounded per-key top-N)") {
    // Catalyst's InferWindowGroupLimit turns `row_number <= k` into a
    // bounded per-group limit BEFORE the full window sort — the
    // difference between "top-5 per key" costing O(n log k) and
    // materializing every group at 100 TB. Assert it fires for the
    // per-key top-N family.
    Seq("q5_window_topn", "ann_lsh_topk").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$q window rank filter did not infer a group limit:\n${plan.take(2500)}")
    }
  }

  test("scalar-subquery decorrelations broadcast their one-row frame as a hash join") {
    // q15/q22 replace `WHERE x = (SELECT max..)` / `> (SELECT avg..)`
    // with a one-row aggregate joined on a non-foldable constant key:
    // must plan BroadcastHashJoin, never BNLJ (a foldable lit(1) key
    // gets optimized out and degenerates the join — the q10 lesson)
    Seq("q15_top_supplier", "q22_dormant_value").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its scalar BHJ")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q scalar join degenerated to BNLJ:\n${plan.take(2000)}")
    }
  }

  test("q20/q22 existence predicates plan as semi/anti hash joins") {
    val p20 = SparkEntry.queries("q20_heavy_parts")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p20.contains("LeftSemi"), s"q20 EXISTS must be a semi join:\n${p20.take(1500)}")
    val p22 = SparkEntry.queries("q22_dormant_value")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p22.contains("LeftAnti"), s"q22 NOT EXISTS must be an anti join:\n${p22.take(1500)}")
  }

  test("q21 chained windows share one orderkey exchange") {
    // max/count/at-max-count all partition by l_orderkey: one hash
    // exchange must feed the whole window chain (the funnel pattern)
    val plan = SparkEntry.queries("q21_last_shipper")(spark, sf)
      .queryExecution.executedPlan.toString
    val orderKeyExchanges = "Exchange hashpartitioning\\(l_orderkey#\\d+,"
      .r.findAllIn(plan).size
    assert(orderKeyExchanges <= 1,
      s"window chain re-shuffled on orderkey $orderKeyExchanges times:\n${plan.take(2500)}")
  }

  test("decontaminate pushes the source filter to the parquet scan") {
    val plan = formatted("dedup_decontaminate")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*source[^\\]]*\\].*"),
      s"source filter not pushed:\n${plan.take(3000)}")
  }

  test("ann_ivf assigns lists in one projection: no crossJoin, one window") {
    // the IVF index build must NOT materialize N×nlist rows: list
    // assignment is the codegen'd NearestCentroids projection, so the
    // only Window left is the final per-probe top-K (and it carries a
    // WindowGroupLimit)
    val plan = SparkEntry.queries("ann_ivf_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"IVF index build reintroduced an all-pairs join:\n${plan.take(2000)}")
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows <= 1, s"expected at most the top-K window, got $windows")
    assert(plan.contains("WindowGroupLimit"),
      "final top-K window lost its group limit")
  }

  test("mix plans join back as broadcasts, never shuffling the corpus") {
    Seq("data_mix", "data_mix_temperature", "data_mix_epochs").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$q must broadcast its stratum-rate plan:\n${plan.take(2000)}")
      assert(!plan.contains("SortMergeJoin"),
        s"$q shuffle-joins the corpus against a k-row plan")
    }
  }

  test("kmeans assignment is a pure projection: no join in the plan") {
    val plan = SparkEntry.queries("embedding_kmeans")(spark, sf)
      .queryExecution.executedPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin").foreach(j =>
      assert(!plan.contains(j),
        s"kmeans assignment must embed centroids in the projection, found $j"))
  }

  test("per-document kernels are scan-shaped: no exchange anywhere") {
    Seq("text_dup_ngrams", "embedding_normalize", "embedding_quantize")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"$q is per-row math and must not shuffle:\n${plan.take(2000)}")
      }
  }

  test("span dedup plans no WindowExec: islands fold in-row") {
    // the span family's island assembly is an in-row HOF fold over
    // per-doc anchor arrays — a regression to the gaps-and-islands
    // WINDOW formulation (global (id, pos) sort + WindowExec)
    // measured ~1.6× slower at the sf10 probe and must not creep
    // back; same pin for the winnow overlap verdict, whose pairing
    // is posting joins + aggregates, never a window
    Seq("text_span_dedup", "text_span_clean", "dedup_winnow").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$q must not plan a window:\n${plan.take(2500)}")
    }
  }

  test("top-quantile gate shares one exchange across both windows") {
    val plan = SparkEntry.queries("curate_top_quantile")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"rank and count windows must share the group-key exchange, got $exchanges:\n${plan.take(2500)}")
  }

  test("token-budget gate shares one exchange across rank and running-sum windows") {
    val plan = SparkEntry.queries("curate_token_budget")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"row_number and sum windows must share the group-key exchange, got $exchanges:\n${plan.take(2500)}")
  }

  test("discrete percentiles: the window pair shares ONE group-key exchange") {
    // the exact-percentile block is two logical windows (cumulative
    // count ordered by value, group total) over the distinct-value
    // frame — both partitioned by the group key, so the physical
    // plan must carry exactly TWO exchanges total: the (group,
    // value) partial-agg shuffle and ONE shared group-key shuffle
    // for the pair. A third exchange means the windows stopped
    // sharing their partitioning.
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sf, "lineitem")
    val plan = graft.dq.DataQuality.discretePercentiles(li,
      "l_returnflag", "l_extendedprice",
      Seq("p50" -> 0.5, "p95" -> 0.95))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2,
      s"expected (group,value) shuffle + one shared group shuffle, got $exchanges:\n${plan.take(2500)}")
  }

  test("custom expressions run inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val proj = Tables.load(spark, sf, "documents")
      .select(graft.functions.HashFunctions.simhash64(split(col("text"), " ")))
    val plan = proj.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1)"), s"simhash projection fell out of codegen:\n$plan")
    val cos = Tables.load(spark, sf, "embeddings")
      .select(graft.functions.VectorFunctions.cosineSim(col("embedding"), col("embedding")))
    assert(cos.queryExecution.executedPlan.toString.contains("*(1)"),
      "cosine projection fell out of codegen")
    val ngrams = Tables.load(spark, sf, "documents")
      .select(graft.functions.HashFunctions.wordNgrams(col("text"), 5),
        graft.functions.HashFunctions.dupNgramCounts(col("text"), 3))
    assert(ngrams.queryExecution.executedPlan.toString.contains("*(1)"),
      "word-ngram kernels fell out of codegen")
  }

  test("no inferred generate-filter re-runs a computed array, even without the rule exclusion") {
    // GraftSession excludes InferFiltersFromGenerate, but library
    // users bring their own sessions: every operator that explodes a
    // same-stage computed array must use the _outer + output-filter
    // shape, so that on a VANILLA session no Filter in the optimized
    // plan embeds a higher-order fold (the 3×-recompute pathology the
    // r11 probe measured at 2.3 s vs 0.08 s on quantize).
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import org.apache.spark.sql.functions._
    val vanilla = spark.newSession()
    vanilla.conf.set("spark.sql.optimizer.excludedRules", "")
    val docs = vanilla.read.parquet(s"$sf/documents.parquet")
    val embs = vanilla.read.parquet(s"$sf/embeddings.parquet")
    val plans = Map(
      "shingles" -> graft.operators.Dedup
        .shingles(docs, "doc_id", "text", 5),
      "decontaminate" -> graft.operators.Dedup
        .decontaminate(docs, docs.limit(10), "doc_id", "text"),
      "segment_dedup" -> graft.operators.TextAnalysis
        .segmentDedup(docs, "doc_id", "text"),
      "vocab" -> graft.operators.TextAnalysis.vocabTopK(docs, "text"),
      "tfidf" -> graft.operators.TextAnalysis
        .tfidfTopTerms(docs, "doc_id", "text"),
      "chunk" -> graft.operators.TextAnalysis.chunk(docs, "doc_id", "text"),
      "quantize_exploded" -> graft.operators.Similarity
        .quantizeEmbeddings(embs, "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          posexplode_outer(col("qvec")).as(Seq("component", "qval"))),
      "frames" -> graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.assetsFromDocuments(docs)))
    plans.foreach { case (name, df) =>
      val offending = df.queryExecution.optimizedPlan.collect {
        case f: LFilter
            if f.condition.exists(_.isInstanceOf[HigherOrderFunction]) => f
      }
      assert(offending.isEmpty,
        s"$name: a Filter re-runs a higher-order fold on a vanilla " +
          s"session:\n${offending.headOption.getOrElse("")}")
    }
  }
}
