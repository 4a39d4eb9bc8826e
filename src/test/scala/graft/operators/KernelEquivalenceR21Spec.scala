package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r21 optimization round: the compiled kernels that replaced
  * interpreted HOF chains must be VALUE-IDENTICAL to the declarative
  * reference forms — these are the equivalence pins for the winnow
  * anchor kernel, the word-frequency stats kernel, and the
  * char-n-gram count kernel, exercised over adversarial texts
  * (multibyte UTF-8, empty, single-char, doubled spaces, ties from
  * repeated grams) plus the real sf0.001 corpus.
  */
class KernelEquivalenceR21Spec extends SparkSpec {

  private def textsDf = {
    val adversarial = Seq(
      null.asInstanceOf[String], "", " ", "  ", "a", "ab",
      "abcdefgh", "abcdefghi", "aaaaaaaaaaaaaaaa",
      "the quick brown fox jumps over the lazy dog",
      "the the the the the the the the",
      "ünïcödé tëxt wïth mültibyte çhärs: 日本語のテキスト断片です",
      "mixed 日本 asciiと multibyte 混在 text with spaces",
      "x" * 600,
      ("abc " * 50).trim,
      "tab\tand\nnewline chars stay bytes")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).limit(200)
      .collect().map(_.getString(0)).toSeq
    val spk = spark
    import spk.implicits._
    (adversarial ++ docs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("winnow anchor kernel == HOF reference (md5 path)") {
    val df = textsDf
    val kern = TextAnalysis.winnowAnchorPositions(df, "id", "text", 8, 4)
    val hof = TextAnalysis.winnowAnchorPositionsHof(df, "id", "text", 8, 4)
    assert(kern.exceptAll(hof).isEmpty && hof.exceptAll(kern).isEmpty)
    assert(kern.count() > 0)
  }

  test("winnow anchor kernel == HOF reference (xxhash64 path)") {
    val df = textsDf
    val kern = TextAnalysis.winnowAnchorPositions(df, "id", "text", 8, 4,
      prodHash = true)
    val hof = TextAnalysis.winnowAnchorPositionsHof(df, "id", "text", 8, 4,
      prodHash = true)
    assert(kern.exceptAll(hof).isEmpty && hof.exceptAll(kern).isEmpty)
    assert(kern.count() > 0)
  }

  test("winnow anchor kernel == HOF reference (k=2, w=1 edge params)") {
    val df = textsDf
    val kern = TextAnalysis.winnowAnchorPositions(df, "id", "text", 2, 1)
    val hof = TextAnalysis.winnowAnchorPositionsHof(df, "id", "text", 2, 1)
    assert(kern.exceptAll(hof).isEmpty && hof.exceptAll(kern).isEmpty)
  }

  test("word_freq_stats == HOF word statistics") {
    val df = textsDf
    val words = split(col("text"), " ")
    val hof = df.select(col("id"),
      size(words).cast("long").as("n_words"),
      size(array_distinct(words)).cast("long").as("n_distinct"),
      aggregate(array_distinct(words), lit(0L),
        (acc, w) => greatest(acc,
          size(filter(words, x => x === w)).cast("long"))).as("top_count"),
      aggregate(array_distinct(words), lit(0L),
        (acc, w) => acc + {
          val c = size(filter(words, x => x === w)).cast("long")
          c * c
        }).as("sum_sq"))
    val st = graft.functions.TextStatsFunctions.wordFreqStats(col("text"))
    val kern = df.select(col("id"),
      st.getField("n_words").as("n_words"),
      st.getField("n_distinct").as("n_distinct"),
      st.getField("top_count").as("top_count"),
      st.getField("sum_sq").as("sum_sq"))
    assert(kern.exceptAll(hof).isEmpty && hof.exceptAll(kern).isEmpty)
  }

  test("char_ngram_counts == explode+count of the charNgrams reference") {
    val df = textsDf
    val allGrams = concat(
      (1 to 3).map(n => TextAnalysis.charNgrams(col("text"), n)): _*)
    val hof = df.select(col("id"), explode(allGrams).as("_g"))
      .groupBy("id", "_g").agg(count(lit(1)).as("_c"))
    val kern = df.select(col("id"),
        explode(graft.functions.TextStatsFunctions
          .charNgramCounts(col("text"), 3)).as("_gc"))
      .select(col("id"), col("_gc._g").as("_g"), col("_gc._c").as("_c"))
    assert(kern.exceptAll(hof).isEmpty && hof.exceptAll(kern).isEmpty)
  }

  test("span dedup stats over the corpus match pre-kernel values") {
    // anchor the whole span pipeline end-to-end on real data: the
    // kernel swap must leave every derived span stat bit-identical;
    // values cross-checked against the HOF-built span frame
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val now = TextAnalysis.spanDedupStats(docs, "doc_id", "text", 8, 4, 30)
    // reference: identical pipeline with the HOF anchor source
    val sel = TextAnalysis.winnowAnchorPositionsHof(docs, "doc_id", "text", 8, 4)
      .select(col("doc_id").as("id"), col("pos"), col("fingerprint"))
    val shared = sel.groupBy(col("fingerprint"))
      .agg(min(col("id")).as("_lo"), max(col("id")).as("_hi"))
      .filter(col("_lo") =!= col("_hi")).select(col("fingerprint"))
    val anchors = sel.join(shared, Seq("fingerprint"), "left_semi")
      .select(col("id"), col("pos"))
    val perRef = TextAnalysis.islandSpans(anchors, "id", 8, 4, 30)
    val refStats = TextAnalysis.spanStatsOf(perRef, "id")
    val ref = docs.select(col("doc_id").as("id")).join(refStats, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        col("max_span_len"))
    assert(now.exceptAll(ref).isEmpty && ref.exceptAll(now).isEmpty)
  }
}
