package graft

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
}
