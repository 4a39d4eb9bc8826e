package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Equivalence pin for the r22 word-segments kernel:
  * [[TextAnalysis.segmentRows]] (codegen'd zero-copy spans) must
  * reproduce [[TextAnalysis.segmentRowsHof]] (the interpreted
  * transform/slice/array_join reference) row for row — including the
  * empty/null-text one-""-segment contract, doubled/leading/trailing
  * spaces (empty words re-join into the same byte span), exact
  * segWords multiples, and multibyte UTF-8.
  */
class SegmentKernelSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("word-segments kernel == HOF reference on adversarial texts and the corpus") {
    val sparkS = spark
    import sparkS.implicits._
    val adversarial = Seq(
      null.asInstanceOf[String], "", " ", "  ", "a", "a b",
      "a b c d e", "a b c d e f", "a b c d e f g h i j k",
      "the  doubled  spaces case", " leading and trailing ",
      "ünïcödé tëxt wïth mültibyte çhärs 日本語 の テキスト 断片",
      ("w " * 23).trim, ("x" * 50 + " ") * 7)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val corpus = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(adversarial, corpus); segWords <- Seq(1, 3, 5)) {
      val got = TextAnalysis.segmentRows(df, "doc_id", "text", segWords)
      val ref = TextAnalysis.segmentRowsHof(df, "doc_id", "text", segWords)
      assert(canon(got) == canon(ref), s"segWords=$segWords mismatch")
    }
  }

  test("segmentDedup end to end is unchanged by the kernel") {
    val docs = Tables.load(spark, sf, "documents")
    val got = TextAnalysis.segmentDedup(docs, "doc_id", "text",
      segWords = 5, minDocs = 3)
    // reference recompute through the HOF rows, same downstream shape
    val segs = TextAnalysis.segmentRowsHof(docs, "doc_id", "text", 5)
    val hot = segs.groupBy("seg")
      .agg(countDistinct(col("doc_id")).as("_docs"))
      .filter(col("_docs") >= 3).select(col("seg"))
    val ref = TextAnalysis.cleanAgainstHot(segs, hot, "doc_id")
    assert(canon(got) == canon(ref))
  }
}
