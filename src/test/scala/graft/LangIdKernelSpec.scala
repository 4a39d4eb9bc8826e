package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Equivalence pin for the r22 in-row Cavnar–Trenkle scorer:
  * [[TextAnalysis.langIdScore]] (broadcast CtModel, one projection)
  * must reproduce [[TextAnalysis.langIdScoreJoinReference]] (the r21
  * explode → ×langs grid → (doc, lang) aggregate → ranking window
  * form) row for row — distances, argmin tiebreaks, the 'und'/NULL
  * zero-gram contract, and the empty-model contract.
  */
class LangIdKernelSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("in-row scorer == join/window reference on the corpus fixture") {
    val docs = Tables.load(spark, sf, "documents")
    val model = TextAnalysis.langIdModel(
      docs.filter(col("source") === "src0"), "text", "lang")
      .transform(graft.Materialize.eager)
    val got = TextAnalysis.langIdScore(docs, "doc_id", "text", "lang", model)
    val ref = TextAnalysis.langIdScoreJoinReference(
      docs, "doc_id", "text", "lang", model)
    assert(canon(got) == canon(ref))
  }

  test("argmin ties break lang-ascending in BINARY order; zero-gram docs are und/NULL") {
    val sparkS = spark
    import sparkS.implicits._
    // 'B' (0x42) sorts before 'a' (0x61) in binary order but after in
    // many case-insensitive collations — identical profiles for both
    // langs make EVERY document a tie, so the guess pins the order
    val model = Seq(
      ("a", "xy", 1), ("a", "yz", 2),
      ("B", "xy", 1), ("B", "yz", 2),
      ("c", "qq", 1)).toDF("lang", "_g", "_lrank")
    val docs = Seq(
      (1L, "xyz", "a"),       // grams hit a and B equally -> tie -> B
      (2L, "qqq", "c"),       // hits only c
      (3L, "", "a"),          // zero grams -> und/NULL
      (4L, null, null),       // null text -> und/NULL
      (5L, "ßü€", "B"),       // multibyte, no model grams: all-miss tie
      (6L, "xyqq", "c")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langIdScore(docs, "doc_id", "text", "lang", model)
    val ref = TextAnalysis.langIdScoreJoinReference(
      docs, "doc_id", "text", "lang", model)
    assert(canon(got) == canon(ref))
    val byId = got.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(3) == "B") // binary tiebreak, not 'a'
    assert(byId(3L).getString(3) == "und" && byId(3L).isNullAt(4))
    assert(byId(4L).getString(3) == "und" && byId(4L).isNullAt(4))
    assert(byId(5L).getString(3) == "B") // all-miss: k*n for every lang, tie
  }

  test("empty model yields an empty frame with the contract schema") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq((1L, "xyz", "a")).toDF("doc_id", "text", "lang")
    val model = Seq.empty[(String, String, Int)].toDF("lang", "_g", "_lrank")
    val got = TextAnalysis.langIdScore(docs, "doc_id", "text", "lang", model)
    assert(got.isEmpty)
    assert(got.columns.toSeq == Seq("doc_id", "declared_lang", "n_grams",
      "lang_guess", "lang_dist"))
  }
}
