package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TextQueries}

class TextAnalysisSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("occurrences counts non-overlapping literal matches") {
    val df = Seq("the cat the dog the", "nothing here", "").toDF("t")
    val out = df.select(TextAnalysis.occurrences(col("t"), "the").as("n"))
      .as[Long].collect()
    assert(out.sameElements(Array(3L, 0L, 0L)))
  }

  test("fingerprint is a deterministic rolling hash") {
    val df = Seq("abc", "abd", "abc").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t")).as("f")).as[Long].collect()
    assert(fps(0) == fps(2) && fps(0) != fps(1))
    // hand-computed: ((0*31+97)*31+98)*31+99 = 96354 % 1000000007
    assert(fps(0) == (('a'.toInt * 31 + 'b'.toInt) * 31 + 'c'.toInt).toLong)
  }

  test("codegen fingerprint equals the HOF fold on the corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val bad = docs.select(
      TextAnalysis.fingerprint(col("text")).as("fast"),
      TextAnalysis.fingerprintHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }

  test("language guess is a stable argmax with und fallback") {
    val df = Seq("merge batch join join", "xyzzy", "the table row").toDF("text")
    val scores = TextAnalysis.languageScores(col("text"), Seq(
      "en" -> Seq("the"), "de" -> Seq("merge", "batch"), "zh" -> Seq("join")))
    val out = df.select(TextAnalysis.languageGuess(scores).as("g")).as[String].collect()
    assert(out.sameElements(Array("de", "und", "en"))) // de ties zh at 2 → first wins
  }

  test("token and quality metrics are self-consistent on sf0.001") {
    val q = TextQueries.textTokens(spark, sf)
    assert(q.filter(col("re_tokens") < col("ws_tokens")).count() == 0,
      "regex tokens can never be fewer than whitespace tokens on this corpus")
    val bad = TextQueries.textQuality(spark, sf)
      .filter(col("alpha_ratio") > 1.0 || col("stopword_ratio") < 0.0).count()
    assert(bad == 0)
  }

  test("chunking covers every char with the declared overlap") {
    import SparkSpec.spark.implicits._
    val text = ("abcdefghij" * 35).take(340) // 340 chars
    val df = Seq((7L, text), (8L, "tiny")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, "doc_id", "text", size = 200, overlap = 50)
      .orderBy("doc_id", "chunk_id").collect()
    // doc 7: ceil((340-50)/150) = 2 chunks at 1..200 and 151..340
    val d7 = out.filter(_.getLong(0) == 7L)
    assert(d7.length == 2)
    assert(d7(0).getLong(2) == 1L && d7(0).getLong(4) == 200L)
    assert(d7(1).getLong(2) == 151L && d7(1).getLong(4) == 190L)
    assert(d7(0).getString(3) == text.substring(0, 200))
    assert(d7(1).getString(3) == text.substring(150, 340))
    // overlap region appears in both chunks
    assert(d7(0).getString(3).takeRight(50) == d7(1).getString(3).take(50))
    // short doc still yields exactly one chunk
    val d8 = out.filter(_.getLong(0) == 8L)
    assert(d8.length == 1 && d8(0).getString(3) == "tiny")
    // reconstruction: dropping each chunk's leading overlap (after the
    // first) and concatenating rebuilds the document exactly
    val rebuilt = d7.zipWithIndex.map { case (r, i) =>
      if (i == 0) r.getString(3) else r.getString(3).drop(50) }.mkString
    assert(rebuilt == text)
  }

  test("pii redaction scrubs emails, phones, and ip addresses") {
    import SparkSpec.spark.implicits._
    val df = Seq(
      (1L, "mail jane.doe+x@corp.example.org or 555-123-4567 via 192.168.0.1"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val counts = TextAnalysis.piiCounts(col("text"))
    val out = df.select(
      col("doc_id") +: TextAnalysis.redact(col("text")).as("r") +:
        counts.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id").collect()
    val r1 = out(0).getString(1)
    assert(r1 == "mail <EMAIL> or <PHONE> via <IP>", r1)
    assert(out(0).getLong(2) == 1L && out(0).getLong(3) == 1L &&
      out(0).getLong(4) == 1L)
    assert(out(1).getString(1) == "no pii here at all")
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == 0L &&
      out(1).getLong(4) == 0L)
  }

  test("tfidf top terms rank rare terms above common ones") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      ("d1", "common zebra zebra"),
      ("d2", "common common quartz quartz"),
      ("d3", "common plain words here")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    val byDoc = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // zebra (tf=2, df=1 -> score 6) beats common (tf=1, df=3 ->
    // score 1); quartz (tf=2, df=1) dominates d2 the same way
    assert(byDoc("d1").head == "zebra", byDoc("d1").toString)
    assert(byDoc("d2").head == "quartz", byDoc("d2").toString)
    // every doc reports exactly k (or fewer if vocabulary is smaller)
    assert(out.groupBy(_._1).forall(_._2.length <= 2))
    assert(byDoc.keySet == Set("d1", "d2", "d3"))
  }

  test("vocab top-K is ordered, deterministic, and plans as TakeOrdered") {
    import SparkSpec.spark.implicits._
    val df = Seq("b a a", "a c b", "c a b").toDF("text")
    val out = TextAnalysis.vocabTopK(df, "text", k = 2)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.sameElements(Array(("a", 4L), ("b", 3L))), rows.mkString(","))
    val plan = TextAnalysis.vocabTopK(
      Tables.load(spark, sf, "documents"), "text", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-K must not global-sort: ${plan.take(1500)}")
  }

  test("top-quantile gate keeps ceil(frac*n) per group, ties by id") {
    import SparkSpec.spark.implicits._
    // group a: 10 docs scored by id parity then value; group b: 3
    // docs all TIED on score -> rank must fall back to doc_id
    val rows = (1L to 10L).map(i => (i, "a", i.toDouble)) ++
      Seq((21L, "b", 5.0), (22L, "b", 5.0), (23L, "b", 5.0))
    val df = rows.toDF("doc_id", "grp", "score")
    val out = graft.operators.Curation
      .topQuantileByGroup(df, "grp", "score", "doc_id", 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    val a = out.filter(_._2 == "a").map(_._1).sorted.toSeq
    val b = out.filter(_._2 == "b").map(_._1).sorted.toSeq
    assert(a == Seq(8L, 9L, 10L), s"top 3 of 10 by score: $a") // ceil(3.0)=3
    assert(b == Seq(21L), s"ceil(0.9)=1, tie broken by lowest id: $b")
    assert(out.forall(_._3 >= 1))
    // frac = 1 keeps everything
    assert(graft.operators.Curation
      .topQuantileByGroup(df, "grp", "score", "doc_id", 1.0).count() == 13)
    // unscoreable rows are excluded from BOTH the rank and the
    // quota: the group-a cutoff stays ceil(10*0.3)=3 and the null
    // row can never pass the gate
    val withNull = rows.toDF("doc_id", "grp", "score")
      .union(Seq((30L, "a", null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "grp", "score"))
    val kept = graft.operators.Curation
      .topQuantileByGroup(withNull, "grp", "score", "doc_id", 0.3)
      .filter(col("grp") === "a")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(8L, 9L, 10L),
      s"null row must not inflate the quota or pass the gate: $kept")
    // ...even at frac = 1, where a counted null WOULD have passed
    val all = graft.operators.Curation
      .topQuantileByGroup(withNull, "grp", "score", "doc_id", 1.0)
    assert(all.count() == 13 && all.filter(col("doc_id") === 30L).count() == 0)
  }

  test("token-budget gate keeps the greedy best prefix per group") {
    import SparkSpec.spark.implicits._
    // group a: scores 5..1 with 400 tokens each under budget 1000:
    // keep the best two (cum 400, 800); the third would hit 1200.
    // group b: first doc alone overflows -> the whole group is out
    // (prefix rule: an oversized best doc blocks everything behind).
    // group c: exact fit at the boundary stays IN (<=, not <)
    val rows = Seq(
      (1L, "a", 5.0, 400L), (2L, "a", 4.0, 400L), (3L, "a", 3.0, 400L),
      (4L, "a", 2.0, 400L),
      (10L, "b", 9.0, 1500L), (11L, "b", 8.0, 100L),
      (20L, "c", 1.0, 1000L))
    val df = rows.toDF("doc_id", "grp", "score", "toks")
    val out = graft.operators.Curation
      .tokenBudgetByGroup(df, "grp", "score", "toks", "doc_id", 1000L)
      .collect().map(r => (r.getLong(0), r.getInt(4), r.getLong(5))).sorted
    assert(out.toSeq == Seq((1L, 1, 400L), (2L, 2, 800L), (20L, 1, 1000L)),
      out.mkString(","))
    // ties on score fall back to doc_id: the LOWER id fills the budget
    val tied = Seq((31L, "t", 1.0, 600L), (30L, "t", 1.0, 600L))
      .toDF("doc_id", "grp", "score", "toks")
    val t = graft.operators.Curation
      .tokenBudgetByGroup(tied, "grp", "score", "toks", "doc_id", 600L)
      .collect().map(_.getLong(0)).toSeq
    assert(t == Seq(30L), s"tie must break to the lower id: $t")
    // null score or null tokens: out of the gate, not counted
    val withNull = rows.toDF("doc_id", "grp", "score", "toks").union(
      Seq((40L, "a", null.asInstanceOf[java.lang.Double], 100L))
        .toDF("doc_id", "grp", "score", "toks"))
    val kept = graft.operators.Curation
      .tokenBudgetByGroup(withNull, "grp", "score", "toks", "doc_id", 1000L)
      .filter(col("grp") === "a").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L), s"null-scored rows must not enter: $kept")
  }

  test("dup-ngram kernel matches the explode/groupBy formulation") {
    import SparkSpec.spark.implicits._
    // planted: "a b a b a b" has 3-grams [a b a, b a b, a b a, b a b]
    // -> total 4, 2 distinct dups, 4 dup occurrences, fraction 1.0
    val planted = Seq(
      (1L, "a b a b a b"),
      (2L, "all words here are quite distinct tokens"),
      (3L, "x y"), // shorter than n -> zeros, NULL fraction
      (4L, "one two three one two three one two four"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dupNgramStats(planted, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4))))
      .toMap
    assert(out(1L) == ((4L, 2L, 4L, Some(1.0))))
    assert(out(2L) == ((5L, 0L, 0L, Some(0.0))))
    assert(out(3L) == ((0L, 0L, 0L, None)),
      "short docs must pin to zeros with a NULL fraction")
    // the repeated cycle duplicates three distinct shingles
    // (one-two-three, two-three-one, three-one-two), twice each
    assert(out(4L)._1 == 7L && out(4L)._2 == 3L && out(4L)._3 == 6L)
    // cross-check the kernel against the explode/groupBy formulation
    // on real corpus text (same item definition: wordNgrams)
    val d = Tables.load(spark, sf, "documents").limit(50)
    val kernel = TextAnalysis.dupNgramStats(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val exploded = d.select(col("doc_id"),
        explode(graft.functions.HashFunctions.wordNgrams(col("text"), 3)).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(
        sum("count").as("total"),
        sum(when(col("count") > 1, col("count")).otherwise(0L)).as("dup"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kernel == exploded, "kernel and shuffle formulation must agree")
  }

  test("word_ngrams kernel equals the split/slice/concat_ws formulation") {
    import SparkSpec.spark.implicits._
    // edge corpus: doubled/leading/trailing spaces (empty words),
    // exact-length, short, empty, and multibyte text
    val docs = Seq(
      "a b c d e f g", "a  b c d e", " a b c d e", "a b c d e ",
      "a b c d e", "a b c d", "", "  ", "äöü ß € x y z", "one")
      .toDF("text")
    val n = 5
    val words = split(col("text"), " ")
    val hof = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(col("text"),
      graft.functions.HashFunctions.wordNgrams(col("text"), n).as("k"),
      hof.as("h")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"kernel != HOF for '${r.getString(0)}'")
    }
  }

  test("misra-gries boilerplate sweep honors the n/(k+1) guarantee") {
    import SparkSpec.spark.implicits._
    // exact n-gram counts built with the SAME shingle kernel the
    // operator uses, so the guarantee is checked against its own
    // item definition
    def exactCounts(df: DataFrame, n: Int): Map[String, Long] = {
      val sh = graft.functions.HashFunctions.wordNgrams(col("text"), n)
      df.select(explode(sh).as("s")).groupBy("s").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // planted boilerplate: 200 copies of one 9-word sentence (its
    // five 5-grams have true count 200) over a unique-word filler
    // tail; k = 32 puts the guarantee threshold n/(k+1) = 1600/33
    // ≈ 48 well below 200, so all five MUST surface
    val boiler = "subscribe to our newsletter for daily updates delivered now"
    val docs = ((1 to 200).map(_ => boiler) ++
      (1 to 100).map(i => (0 until 10).map(j => s"u${i}w$j").mkString(" ")))
      .toDF("text").repartition(7) // force cross-partition merges
    val exact = exactCounts(docs, 5)
    val nTotal = exact.values.sum
    val out = TextAnalysis.boilerplateNgrams(docs, "text", n = 5, k = 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.forall(_._3 == nTotal),
      s"n_ngrams must be the true item total: ${out.take(3).mkString}")
    val err = nTotal / 33 // n/(k+1)
    out.foreach { case (ngram, est, _) =>
      val truth = exact(ngram)
      assert(est <= truth, s"$ngram: est $est above truth $truth")
      assert(truth - est <= err, s"$ngram: error ${truth - est} > $err")
    }
    val present = out.map(_._1).toSet
    exact.filter(_._2 > err).keys.foreach { hh =>
      assert(present.contains(hh), s"heavy hitter '$hh' missing")
    }
    // the five boilerplate shingles are exactly the count-200 items
    assert(exact.count(_._2 == 200L) == 5)
    // order contract: count desc, ngram asc
    val ests = out.map(x => (-x._2, x._1)).toSeq
    assert(ests == ests.sorted, "output must be (est desc, ngram asc)")
  }

  test("segment dedup removes planted cross-doc boilerplate, keeps unique text in order") {
    // 10 docs: a shared 5-word banner + a unique 5-word body + a
    // unique 3-word tail (ragged last segment). One doc is banner-only.
    val banner = "subscribe to our mailing list"
    val docs = (0 until 10).map { i =>
      if (i == 9) (i.toLong, banner)
      else (i.toLong, s"$banner unique body for doc $i tail w$i end")
    }.toDF("doc_id", "text").repartition(4)
    val out = TextAnalysis.segmentDedup(docs, "doc_id", "text",
        segWords = 5, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 10, "every doc must survive the gate")
    (0 until 9).foreach { i =>
      val r = out(i)
      // banner gone, body + ragged tail intact and in order
      assert(r.getString(1) == s"unique body for doc $i tail w$i end", r.toString)
      assert(r.getLong(2) == 2L && r.getLong(3) == 1L, r.toString)
    }
    // the banner-only doc survives as an empty string, fully removed
    assert(out(9).getString(1) == "" && out(9).getLong(2) == 0L &&
      out(9).getLong(3) == 1L, out(9).toString)
    // minDocs above the plant's spread: nothing is removed
    val loose = TextAnalysis.segmentDedup(docs, "doc_id", "text",
        segWords = 5, minDocs = 11)
      .agg(sum("removed_segments")).collect()(0).getLong(0)
    assert(loose == 0L, "minDocs > corpus spread must remove nothing")
  }

  test("segment dedup: null text segments as the empty string and can go hot") {
    // pins the r11 coalesce in segmentRows: a null-text document
    // keeps its output row (one "" segment) instead of dropping from
    // the result, and with enough null/empty-text docs the "" segment
    // crosses minDocs and is REMOVED like any other boilerplate —
    // the documented deviation from pre-r11 (whose null segment never
    // matched the hot set)
    val one = Seq((1L, null: String), (2L, "real words here"))
      .toDF("doc_id", "text")
    val lone = TextAnalysis.segmentDedup(one, "doc_id", "text",
        segWords = 5, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(lone.length == 2, "the null-text doc must keep its row")
    assert(lone(0).getString(1) == "" && lone(0).getLong(2) == 1L &&
      lone(0).getLong(3) == 0L,
      s"a lone null-text doc keeps its single empty segment: ${lone(0)}")
    val many = Seq((1L, null: String), (2L, null: String), (3L, ""),
      (4L, "real words here")).toDF("doc_id", "text")
    val hot = TextAnalysis.segmentDedup(many, "doc_id", "text",
        segWords = 5, minDocs = 3)
      .orderBy("doc_id").collect()
    (0 until 3).foreach { i =>
      assert(hot(i).getString(1) == "" && hot(i).getLong(2) == 0L &&
        hot(i).getLong(3) == 1L,
        s"three ''-segment docs cross minDocs=3, segment removed: ${hot(i)}")
    }
    assert(hot(3).getLong(3) == 0L, s"real doc untouched: ${hot(3)}")
  }

  test("bpe pair stats count adjacent pairs weighted by word frequency") {
    import SparkSpec.spark.implicits._
    // "ab" x3 (as two docs contribute 2+1 occurrences), "abc" x1,
    // "aaa" x1; punctuation/digits split words; 1-char words dropped
    val docs = Seq(
      (1L, "ab ab. abc a"),
      (2L, "ab aaa, 7x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(docs, "text", k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // pair "ab": words ab(freq 3) + abc(freq 1) -> 4 occurrences,
    //   2 word types; "aa": word aaa has TWO aa positions -> 2 occ,
    //   1 type; "bc": abc -> 1; "x" from "7x" splits to empty (digit
    //   separator) + "x" (len 1, dropped)
    assert(out == Seq(("ab", 4L, 2L), ("aa", 2L, 1L), ("bc", 1L, 1L)),
      out.toString)
    // deterministic order: count desc then pair asc, stable top-K
    assert(out.map(_._1) == Seq("ab", "aa", "bc"))
  }

  test("bpe trainer learns the Sennrich example's merge trajectory") {
    import SparkSpec.spark.implicits._
    // the classic BPE walkthrough corpus: low x5, lower x2,
    // newest x6, widest x3 (word frequencies planted via repetition)
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", merges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand-computed: (e,s)=9 ties (s,t)=9 -> (e,s) wins on lhs;
    // then (es,t)=9; then (l,o)=7 ties (o,w)=7 -> (l,o); then the
    // fold having built "lo", (lo,w)=7
    assert(out(0) == ((1, "e", "s", 9L)), out.mkString(","))
    assert(out(1) == ((2, "es", "t", 9L)), out.mkString(","))
    assert(out(2) == ((3, "l", "o", 7L)), out.mkString(","))
    assert(out(3) == ((4, "lo", "w", 7L)), out.mkString(","))
  }

  test("bpe merge application is greedy left-to-right, non-overlapping") {
    import SparkSpec.spark.implicits._
    // one word "aaaa" (freq 1): pair (a,a) counts every adjacent
    // position = 3; the merge folds greedily -> [aa, aa], so round 2
    // counts (aa,aa)=1 — overlap-counted stats, non-overlap apply
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", merges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1, "a", "a", 3L)), out.mkString(","))
    assert(out(1) == ((2, "aa", "aa", 1L)), out.mkString(","))
    // odd run: "aaaaa" -> [aa, aa, a]; (aa,aa)=1 and (aa,a)=1, tie
    // broken rhs asc: "a" < "aa"
    val odd = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val o2 = TextAnalysis.bpeTrain(odd, "text", merges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(o2(1) == ((2, "aa", "a", 1L)), o2.mkString(","))
  }

  test("bpe trainer stops at vocabulary saturation; encode matches the fold") {
    import SparkSpec.spark.implicits._
    // "ab" saturates after one merge: no pairs remain anywhere
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", merges = 5).collect()
    assert(out.length == 1 && out(0).getString(1) == "a")
    val enc = TextAnalysis.bpeEncodeTopK(docs, "text", merges = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(enc.toSeq == Seq(("ab", 3L)), enc.mkString(","))
  }

  test("bpe token counts sum final-state sequence lengths per doc") {
    import SparkSpec.spark.implicits._
    // vocab: ab(x3), cd(x1). merge 1 = (a,b); merge 2 = (c,d).
    // doc 1: "ab ab cd" -> ab(1)+ab(1)+cd(1) = 3 tokens;
    // doc 2: "ab x 7" -> ab(1) + dropped + dropped = 1;
    // doc 3: no qualifying words -> 0
    val docs = Seq((1L, "ab ab cd"), (2L, "ab x 7"), (3L, "z 9 !"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", merges = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 0L), out.toString)
    // fewer merges -> never fewer tokens (merges only shrink seqs)
    val out0 = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", merges = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out0 == Map(1L -> 4L, 2L -> 1L, 3L -> 0L), out0.toString)
  }

  test("frozen-table encode equals training state on the corpus and handles new words") {
    import SparkSpec.spark.implicits._
    // on the TRAINING corpus the frozen encode must replay the
    // training trajectory bit for bit (shared bpeMergeOnce kernel)
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val m = 6
    val table = TextAnalysis.bpeTrain(docs, "text", merges = m)
    val trained = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val frozen = TextAnalysis
      .bpeTokenCountsFrozen(docs, "doc_id", "text", table)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(frozen == trained,
      "encode under the trained table must equal the training state")
    // a NEW word encodes under the frozen merges in rank order:
    // train on "abab"-heavy text -> merges (a,b) then (ab,ab);
    // the unseen word "ababab" encodes greedily to [abab, ab] = 2,
    // "abcab" to [ab, c, ab] = 3, "xyz" (no merges apply) to 3
    val train = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    val t2 = TextAnalysis.bpeTrain(train, "text", merges = 2)
    assert(t2.collect().map(r => (r.getString(1), r.getString(2))).toSeq
      == Seq(("a", "b"), ("ab", "ab")))
    val fresh = Seq((10L, "ababab abcab xyz"))
      .toDF("doc_id", "text")
    val enc = TextAnalysis
      .bpeTokenCountsFrozen(fresh, "doc_id", "text", t2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(enc == Map(10L -> (2L + 3L + 3L)), enc.toString)
  }

  test("bpe rank-1 merge equals the standalone pair-stats top row") {
    val docs = Tables.load(spark, sf, "documents")
    val top = TextAnalysis.bpePairStats(docs, "text", k = 1).collect()(0)
    val m1 = TextAnalysis.bpeTrain(docs, "text", merges = 1).collect()(0)
    assert(m1.getString(1) + m1.getString(2) == top.getString(0))
    assert(m1.getLong(3) == top.getLong(1))
  }

  test("oov rate counts exactly the words outside the top-K vocabulary") {
    import SparkSpec.spark.implicits._
    // corpus vocab by count: a(4) b(3) c(1) zq(1) -> top-2 = {a, b}
    // (count desc, word asc tiebreak puts c before zq at equal count,
    // but K=2 keeps only a and b)
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a a b b zq"),
      (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
      .toSeq
    assert(out == Seq(
      (1L, 4L, 1L, 1.0 / 4),
      (2L, 5L, 1L, 1.0 / 5),
      (3L, 0L, 0L, null)), out.toString)
  }

  test("word-count pairs: in-row fold equals explode/groupBy; vocab recomposes") {
    import SparkSpec.spark.implicits._
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
      .unionByName(Seq((888888L, null.asInstanceOf[String]),
        (888889L, "")).toDF("doc_id", "text"))
    val pairs = TextAnalysis.wordCountPairs(docs, "doc_id", "text")
    val viaGroupBy = docs
      .select(col("doc_id"), explode_outer(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
    assert(pairs.exceptAll(viaGroupBy).isEmpty && viaGroupBy.exceptAll(pairs).isEmpty,
      "stateless pair fold diverges from the groupBy formulation")
    assert(pairs.filter(col("doc_id") >= 888888L).count() == 0,
      "null/empty text must yield no pairs")
    // the scoring pass over pairs reproduces the batch vocabulary
    val a = TextAnalysis.vocabFromPairs(pairs, 25).collect().toSeq
    val b = TextAnalysis.vocabTopK(docs, "text", 25).collect().toSeq
    assert(a == b, s"vocabFromPairs diverges:\n$a\n$b")
  }

  test("collocation lift is the exact count ratio, ranked like PMI") {
    import SparkSpec.spark.implicits._
    // unigrams: x:3 y:3 z:3, N=9; bigrams with count>=2:
    // "x y":2 and "y z":2, both lift = 2*9/(3*3) = 2.0 — the equal
    // lift pins the deterministic bigram-asc tiebreak too
    val docs = Seq((1L, "x y x"), (2L, "x y z"), (3L, "z y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocationsTopK(docs, "text", minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4))).toSeq
    assert(out == Seq(("x y", 2L, 2.0), ("y z", 2L, 2.0)), out.toString)
  }

  test("vocab stats count hapax and type/token ratio exactly") {
    import SparkSpec.spark.implicits._
    // words: a(3) b(2) c(1) d(1) -> vocab 4, tokens 7, hapax 2
    val docs = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabStats(docs, "text").collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getDouble(3), out.getDouble(4)) ==
      ((4L, 7L, 2L, 2.0 / 4, 4.0 / 7)), out.toString)
  }

  test("rarity score sums exact corpus frequencies with OOV as zero") {
    import SparkSpec.spark.implicits._
    // corpus counts: a(4) b(3) c(1) zq(1); top-2 vocab = {a:4, b:3}
    val docs = Seq(
      (1L, "a a b c"),    // 4+4+3+0 = 11 over 4 words
      (2L, "a a b b zq")) // 4+4+3+3+0 = 14 over 5 words
      .toDF("doc_id", "text")
    val out = TextAnalysis.rarityScore(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out == Seq(
      (1L, 4L, 11L, 11.0 / 4),
      (2L, 5L, 14L, 14.0 / 5)), out.toString)
  }

  test("simpson diversity is exact at the closed-form endpoints") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "a a a"),   // one word repeated -> 0
      (2L, "a b c"),   // all distinct -> 1 - 3/9 = 2/3
      (3L, "a a b"))   // 1 - (4+1)/9 = 4/9
      .toDF("doc_id", "text")
    val m = TextAnalysis.diversityMetrics(col("text"))
    val out = docs.select(col("doc_id") +: m.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      (1L, 3L, 0.0),
      (2L, 3L, 1.0 - 3.0 / 9),
      (3L, 3L, 1.0 - 5.0 / 9)), out.toString)
  }

  test("lm familiarity: exact smoothed bigram ratios against a reference corpus") {
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    // reference (ref=true): "a b", "a b c" -> unigrams a:2 b:2 c:1
    // (V=3), bigrams "a b":2, "b c":1
    val df = Seq(
      (1L, "a b", true),      // bigrams: "a b"(cb 2, cu(a) 2)
      (2L, "a b c", true),    // "a b"(2,2), "b c"(1,2)
      (3L, "a b x", false),   // "a b"(2,2), "b x"(0,2)
      (4L, "z z", false),     // "z z"(0,0)
      (5L, "solo", false),    // no bigrams
      (6L, null.asInstanceOf[String], false))
      .toDF("doc_id", "text", "is_ref")
    val out = TextAnalysis.lmFamiliarity(df, "doc_id", "text", col("is_ref"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Double]))).sortBy(_._1)
    val V = 3L
    def fam(sumBig: Long, sumUni: Long, n: Long): Option[Double] =
      if (n == 0) None
      else Some((sumBig + n).toDouble / (sumUni + n * V).toDouble)
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 2L, 2L, fam(2, 2, 1)),
      (2L, 2L, 2L, 3L, 4L, fam(3, 4, 2)),
      (3L, 2L, 1L, 2L, 4L, fam(2, 4, 2)),
      (4L, 1L, 0L, 0L, 0L, fam(0, 0, 1)),
      (5L, 0L, 0L, 0L, 0L, None),
      (6L, 0L, 0L, 0L, 0L, None)), out.mkString(","))
    // score is a probability-mass ratio: always in (0, 1], and the
    // fully in-distribution doc outscores the OOV one
    val scores = out.flatMap(_._6)
    assert(scores.forall(s => s > 0.0 && s <= 1.0), scores.mkString(","))
    assert(out(0)._6.get > out(3)._6.get, "in-distribution > OOV")
    // deterministic under repartitioning (integer sums, one division)
    val again = TextAnalysis.lmFamiliarity(df.repartition(5), "doc_id",
        "text", col("is_ref"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(5)).map(d => java.lang.Double.doubleToLongBits(
          d.asInstanceOf[Double])))).sortBy(_._1)
    assert(again.sameElements(out.map(t =>
      (t._1, t._6.map(java.lang.Double.doubleToLongBits)))))
  }

  test("winnowing: shared substrings guarantee shared fingerprints, selection is sparse") {
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    // two documents sharing one long substring (>= w + k - 1 = 11
    // chars guarantees >= 1 shared fingerprint), one unrelated doc
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val df = Seq(
      (1L, "PREFIX aaaa " + shared + " SUFFIX bbbb"),
      (2L, "zz " + shared + " qq"),
      (3L, "completely different content with no overlap at all xyz"),
      (4L, "short"), // below k + w - 1: no fingerprints
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(df, "doc_id", "text",
      k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the guarantee: docs 1 and 2 share at least one fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared substring must fingerprint")
    // the unrelated doc shares nothing with either
    assert((byDoc(3L) & (byDoc(1L) ++ byDoc(2L))).isEmpty)
    // short/null docs emit nothing (the algorithm's domain)
    assert(!byDoc.contains(4L) && !byDoc.contains(5L))
    // sparsity: far fewer fingerprints than gram positions (the
    // ~2/(w+1) density is the algorithm's point)
    val grams1 = df.filter(col("doc_id") === 1L)
      .head.getString(1).length - 7
    assert(byDoc(1L).size < grams1 / 2,
      s"${byDoc(1L).size} fingerprints over $grams1 grams is not sparse")
    // deterministic under repartitioning
    val again = TextAnalysis.winnowFingerprints(df.repartition(3),
        "doc_id", "text", k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == out.toSet)
  }

  test("span dedup: planted shared spans are found with bounded boundaries, separated spans stay separate") {
    import SparkSpec.spark.implicits._
    import graft.operators.TextAnalysis
    val (k, w) = (8, 4)
    val slack = w + k - 1 // the documented per-end boundary tolerance
    // two spans planted across documents; fillers share no 8-gram
    // with anything (distinct character sets per filler)
    val s1 = "the quick brown fox jumps over the lazy dog again and again" // 60
    val s2 = "pack my box with five dozen liquor jugs right now please ok" // 60
    val df = Seq(
      // doc 1 carries BOTH spans, separated by > w + k - 1 unique
      // chars — they must report as TWO spans, not merge
      (1L, "AAAA BBBB CCCC " + s1 + " DDDD EEEE FFFF GGGG " + s2 +
        " HHHH IIII"),
      (2L, "zzzz xxxx " + s1 + " yyyy wwww"), // span 1's partner
      (3L, "qqqq rrrr " + s2 + " ssss tttt"), // span 2's partner
      (4L, "1111 2222 3333 4444 5555 6666 7777 8888 9999 0000"), // unrelated
      (5L, "short"), // below the k + w - 1 print domain
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanDedupStats(df, "doc_id", "text",
        k = k, w = w, minSpan = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(_._1)
    val byDoc = out.map(t => t._1 -> t).toMap
    // doc 1: exactly two spans, each within the boundary contract of
    // its planted 60-char span (undershoot < slack per end, and the
    // separating unique filler prevents an overshoot past the mate)
    assert(byDoc(1L)._2 == 2L, s"doc 1 must report 2 spans: ${byDoc(1L)}")
    assert(byDoc(1L)._4.get >= s1.length - 2 * slack &&
      byDoc(1L)._4.get <= s1.length + 2 * slack,
      s"span length must track the planted span: ${byDoc(1L)}")
    // partners report their single span
    assert(byDoc(2L)._2 == 1L && byDoc(3L)._2 == 1L,
      s"partners must each report one span: ${byDoc(2L)} ${byDoc(3L)}")
    assert(byDoc(2L)._4.get >= s1.length - 2 * slack,
      s"partner span must cover the planted extent: ${byDoc(2L)}")
    // unrelated / printless / null docs report 0 spans, null max
    for (id <- Seq(4L, 5L, 6L))
      assert(byDoc(id) == ((id, 0L, 0L, None)), s"doc $id: ${byDoc(id)}")
    // dup_chars sums the spans
    assert(byDoc(1L)._3 >= 2 * (s1.length - 2 * slack) &&
      byDoc(1L)._3 <= 2 * (s1.length + 2 * slack),
      s"dup_chars must sum both spans: ${byDoc(1L)}")
    // deterministic under repartitioning
    val again = TextAnalysis.spanDedupStats(df.repartition(3), "doc_id",
        "text", k = k, w = w, minSpan = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).sortBy(_._1)
    assert(again.sameElements(out))
    // prodHash variant: same spans (the guarantee is hash-agnostic)
    val prod = TextAnalysis.spanDedupStats(df, "doc_id", "text",
        k = k, w = w, minSpan = 20, prodHash = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(prod.map(_._2).sameElements(out.map(_._2)),
      "xxhash64 anchors must find the same planted spans")

    // EXCISION (spanDedupClean): same span frame, so removed_chars
    // must equal the stats operator's dup_chars doc for doc, the
    // kept text must be the original minus exactly those chars, and
    // the planted span's interior must be gone from every carrier
    val orig = df.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)))).toMap
    val clean = TextAnalysis.spanDedupClean(df, "doc_id", "text",
        k = k, w = w, minSpan = 20)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2))).sortBy(_._1)
    assert(clean.map(t => (t._1, t._3)).sameElements(
      out.map(t => (t._1, t._3))),
      s"removed_chars must equal stats dup_chars: ${clean.mkString("; ")}")
    clean.foreach { case (id, ct, removed) =>
      assert(ct.map(_.length).getOrElse(0) + removed ==
        orig(id).map(_.length).getOrElse(0),
        s"doc $id: kept + removed must partition the original")
      // the planted spans' interiors (boundary slack trimmed) are cut
      val core1 = s1.substring(slack, s1.length - slack)
      val core2 = s2.substring(slack, s2.length - slack)
      if (id <= 3L) {
        assert(!ct.exists(_.contains(core1)) || id == 3L,
          s"doc $id must lose span 1's interior")
        assert(!ct.exists(_.contains(core2)) || id == 2L,
          s"doc $id must lose span 2's interior")
      } else assert(ct == orig(id), s"doc $id must pass through untouched")
    }
  }

  test("dsir weights: rational importance score reconciles from its integer sums") {
    import SparkSpec.spark.implicits._
    // target slice: doc 1. 16 distinct grams across the corpus hash
    // into 16 distinct buckets (verified in DuckDB), so the expected
    // integer sums below are collision-free ground truth
    val df = Seq(
      (1L, "a b c a b", true),  // target: a:2 b:2 c:1, "a b":2 "b c":1 "c a":1
      (2L, "a b c", false),     // pure target vocabulary
      (3L, "x y z w q", false), // disjoint vocabulary
      (4L, "solo", false),      // one word: one feature, no bigrams
      (5L, null.asInstanceOf[String], false))
      .toDF("doc_id", "text", "is_tgt")
    val out = TextAnalysis.dsirWeights(df, "doc_id", "text", col("is_tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(_._1).toSeq
    // n_feats = 2·words − 1 (unigrams + bigrams); null text scores 0
    // features and a NULL weight
    assert(out.map(t => (t._1, t._2, t._3)) == Seq(
      (1L, 9L, 15L), (2L, 5L, 8L), (3L, 9L, 0L), (4L, 1L, 0L),
      (5L, 0L, 0L)), out.mkString(","))
    assert(out(4)._5.isEmpty, "null text must carry a NULL weight")
    // totals are bucket-independent (T = Σ n_feats over the target
    // slice, R = over the corpus): reconcile every weight from the
    // returned integer sums, bit for bit — the fixed three-division
    // tree of the scaladoc
    val T = 9L
    val R = out.map(_._2).sum
    def w(st: Long, sr: Long, n: Long): Double =
      ((st + n).toDouble / (T + 1024L).toDouble) /
        ((sr + n).toDouble / (R + 1024L).toDouble)
    out.filter(_._2 > 0).foreach { t =>
      assert(java.lang.Double.doubleToLongBits(t._5.get) ==
        java.lang.Double.doubleToLongBits(w(t._3, t._4, t._2)),
        s"doc ${t._1}: ${t._5.get} != ${w(t._3, t._4, t._2)}")
    }
    // the "importance" reading: target-vocabulary docs outscore
    // disjoint-vocabulary docs, whose target mass is smoothing only
    assert(out(0)._5.get > out(2)._5.get && out(1)._5.get > out(2)._5.get)
    // deterministic under repartitioning (integer sums + fixed tree)
    val again = TextAnalysis.dsirWeights(df.repartition(5), "doc_id",
        "text", col("is_tgt"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(4)).map(d => java.lang.Double.doubleToLongBits(
          d.asInstanceOf[Double])))).sortBy(_._1).toSeq
    assert(again == out.map(t =>
      (t._1, t._5.map(java.lang.Double.doubleToLongBits))))
  }

  test("ccnet buckets: per-group terciles ordered by familiarity, NULL bucket for unscoreable docs") {
    import SparkSpec.spark.implicits._
    import graft.operators.Curation
    val df = Seq(
      (0L, "a b c d", "en", true), // the reference — also bucketed
      (1L, "a b c d", "en", false), // identical to the reference
      (2L, "a b c x", "en", false),
      (3L, "a b x y", "en", false),
      (4L, "a x y z", "en", false),
      (5L, "x y z w", "en", false),
      (6L, "p q r s", "en", false),
      (7L, "solo", "en", false),    // zero bigrams: unscoreable
      (8L, "a b c d", "fr", false),
      (9L, "x y z q", "fr", false))
      .toDF("doc_id", "text", "lang", "is_ref")
    val out = Curation.familiarityBuckets(df, "doc_id", "text", "lang",
      col("is_ref")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Int]),
        Option(r.getString(4))))
    assert(out.length == 10, "one row per input document")
    // the unscoreable doc keeps its row with NULL score AND bucket
    val solo = out.find(_._1 == 7L).get
    assert(solo._3.isEmpty && solo._4.isEmpty && solo._5.isEmpty)
    // en: 7 scored docs cut 3/2/2 (ntile remainders go to head)
    val en = out.filter(t => t._2 == "en" && t._4.nonEmpty)
    assert(en.count(_._4.get == 1) == 3 && en.count(_._4.get == 2) == 2 &&
      en.count(_._4.get == 3) == 2, en.mkString(","))
    // terciles respect the score order: head >= middle >= tail
    def scores(b: Int) = en.filter(_._4.get == b).map(_._3.get)
    assert(scores(1).min >= scores(2).max && scores(2).min >= scores(3).max)
    // the reference-identical docs are the most familiar: both head
    assert(out.filter(t => t._1 <= 1L).forall(_._5.contains("head")))
    // labels follow the index mapping everywhere
    assert(out.filter(_._4.nonEmpty).forall(t => t._5.get == (t._4.get match {
      case 1 => "head"; case 3 => "tail"; case _ => "middle" })))
    // a 2-doc group fills buckets 1..2: head and middle, no tail —
    // the standard ntile small-group contract, spec-pinned
    val fr = out.filter(_._2 == "fr")
    assert(fr.flatMap(_._4).sorted.sameElements(Array(1, 2)))
    assert(fr.find(_._1 == 8L).get._5.contains("head") &&
      fr.find(_._1 == 9L).get._5.contains("middle"))
  }

  test("dsir resampling keeps exactly the hash-thresholded set, proportional to weight") {
    // independent recompute: the kept set must equal {doc : md5
    // bucket of 'dsirsample:<id>' < (w/wmax)·rate·2³²} with weights
    // from the (spec-trusted) batch operator and buckets from
    // java.security MessageDigest — no Spark expression reuse
    val d = Tables.load(spark, sf, "documents")
    val w = TextAnalysis.dsirWeights(d, "doc_id", "text",
        col("source") === "src0")
      .collect().flatMap(r => Option(r.get(4)).map(v =>
        r.getLong(0) -> v.asInstanceOf[Double])).toMap
    val wmax = w.values.max
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dsirsample:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val expected = w.collect {
      case (id, wt) if bucket(id) < wt / wmax * 0.5 * 4294967296.0 => id
    }.toSet
    val got = graft.operators.TextQueries
      .queries("data_sample_dsir")(SparkSpec.spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"kept ${got.size} vs expected ${expected.size}; " +
        s"diff ${(got diff expected) ++ (expected diff got)}")
    assert(got.nonEmpty && got.size < w.size,
      "rate 0.5 over varied weights must keep a strict non-empty subset")
  }

  test("bpe compression rolls up exactly the per-doc trained-tokenizer counts") {
    val d = Tables.load(spark, sf, "documents")
    val perDoc = TextAnalysis.bpeTokenCounts(d, "doc_id", "text", merges = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val meta = d.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("ch"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val out = graft.operators.TextQueries
      .queries("bpe_compression")(SparkSpec.spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    meta.groupBy(_._2).foreach { case (src, rows) =>
      val (nd, nc, nt) = (rows.size.toLong, rows.map(_._3).sum,
        rows.map(t => perDoc(t._1)).sum)
      val (gnd, gnc, gnt, gcpt) = out(src)
      assert((gnd, gnc, gnt) == ((nd, nc, nt)), s"source $src")
      assert(java.lang.Double.doubleToLongBits(gcpt) ==
        java.lang.Double.doubleToLongBits(nc.toDouble / nt.toDouble),
        s"source $src chars_per_token")
    }
  }

  test("char-ngram langid beats the marker heuristic on held-out real-language docs") {
    // real-language fixtures: a labeled reference slice to train on
    // and HELD-OUT sentences to classify. The held-out sentences
    // share almost no words with the training slice — orthographic
    // char-bigram profiles (sch/ij/é/ción...) are what must carry.
    val train = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and runs away"),
      ("en", "a journey of a thousand miles begins with a single step forward"),
      ("en", "knowledge and wisdom are gathered through reading and practice"),
      ("de", "der schnelle braune fuchs springt über den faulen hund und läuft weg"),
      ("de", "eine reise von tausend meilen beginnt mit einem einzigen schritt"),
      ("de", "wissen und weisheit sammelt man durch lesen und übung"),
      ("fr", "le rapide renard brun saute par dessus le chien paresseux puis s'enfuit"),
      ("fr", "un voyage de mille lieues commence par un premier pas en avant"),
      ("fr", "le savoir et la sagesse viennent de la lecture et de la pratique"),
      ("es", "el rápido zorro marrón salta sobre el perro perezoso y huye corriendo"),
      ("es", "un viaje de mil millas comienza con un solo paso adelante"),
      ("es", "el conocimiento y la sabiduría se adquieren leyendo y practicando"))
    val heldOut = Seq(
      ("en", "practical experience helps programmers debug tricky software quickly"),
      ("en", "every reader should finish this book before winter arrives"),
      ("de", "praktische erfahrung hilft beim schnellen beheben schwieriger fehler"),
      ("de", "jeder leser sollte dieses buch vor dem winter fertig lesen"),
      ("fr", "une expérience pratique aide à corriger rapidement des erreurs difficiles"),
      ("fr", "chaque lecteur devrait finir ce livre avant l'hiver prochain"),
      ("es", "una experiencia práctica ayuda a corregir errores difíciles rápidamente"),
      ("es", "cada lector debería terminar este libro antes del invierno próximo"))
    val rows = (train.map(t => (t._1, t._2, true)) ++
      heldOut.map(t => (t._1, t._2, false))).zipWithIndex
      .map { case ((l, t, r), i) => (i.toLong, l, t, r) }
    val df = rows.toDF("doc_id", "lang", "text", "is_ref")
    val byId = TextAnalysis.languageIdNgram(df, "doc_id", "text",
        "lang", col("is_ref"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val testIds = rows.filter(!_._4).map(r => (r._1, r._2))
    val ngramRight = testIds.count { case (id, l) => byId(id) == l }
    // the marker heuristic with FAIR language-appropriate markers
    // (the production markers are synthetic-corpus words and would
    // score everything 'und' — a hollow comparison)
    val markers = Seq(
      "en" -> Seq("the", "and", "of"), "de" -> Seq("der", "und", "die"),
      "fr" -> Seq("le", "et", "les"), "es" -> Seq("el", "y", "los"))
    val scores = TextAnalysis.languageScores(col("text"), markers)
    val markerById = df.filter(!col("is_ref"))
      .select(col("doc_id"), TextAnalysis.languageGuess(scores).as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val markerRight = testIds.count { case (id, l) => markerById(id) == l }
    assert(ngramRight >= 7,
      s"ngram model got $ngramRight/8: ${testIds.map(t => byId(t._1))}")
    assert(ngramRight > markerRight,
      s"ngram $ngramRight/8 must beat markers $markerRight/8 " +
        s"(markers guessed ${testIds.map(t => markerById(t._1))})")
  }
}
