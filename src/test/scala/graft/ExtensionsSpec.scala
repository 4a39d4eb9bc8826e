package graft

class ExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from plain SQL") {
    Tables.load(spark, sf, "documents").createOrReplaceTempView("ext_docs")
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("ext_embs")

    val sim = spark.sql(
      "SELECT simhash64(split(text, ' ')) AS h FROM ext_docs LIMIT 5")
      .collect()
    assert(sim.length == 5 && sim.forall(!_.isNullAt(0)))

    val cos = spark.sql(
      """SELECT cosine_sim(embedding, embedding) AS c
        |FROM ext_embs LIMIT 3""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12))

    val sh = spark.sql(
      "SELECT size(shingle_hashes(text, 5)) AS n FROM ext_docs LIMIT 3")
      .collect().map(_.getInt(0))
    assert(sh.forall(_ > 0))

    val mh = spark.sql(
      """SELECT size(minhash_sig(shingle_hashes(text), 32)) AS n
        |FROM ext_docs LIMIT 3""".stripMargin)
      .collect().map(_.getInt(0))
    assert(mh.forall(_ == 32))

    val bucket = spark.sql(
      "SELECT srp_bucket(embedding, 6) AS b FROM ext_embs LIMIT 10")
      .collect().map(_.getInt(0))
    assert(bucket.forall(b => b >= 0 && b < 64))

    val ph = spark.sql(
      "SELECT poly_hash(text) AS h FROM ext_docs LIMIT 3")
      .collect().map(_.getLong(0))
    assert(ph.forall(h => h >= 0 && h < 1000000007L))

    // dot(v, v) == self_norm(v) by definition
    val dn = spark.sql(
      """SELECT dot_product(embedding, embedding) AS d,
        |  self_norm(embedding) AS n FROM ext_embs LIMIT 5""".stripMargin)
      .collect()
    assert(dn.forall(r => r.getDouble(0) == r.getDouble(1)))

    // word_ngrams: a 7-word doc has 3 5-grams
    val wn = spark.sql(
      "SELECT size(word_ngrams('a b c d e f g', 5)) AS n").head().getInt(0)
    assert(wn == 3)

    // dup_ngram_counts over a repeated cycle
    val dc = spark.sql(
      "SELECT dup_ngram_counts('a b a b a b', 3).dup_occurrences AS d")
      .head().getLong(0)
    assert(dc == 4L)

    // aggregates: the sketch and the exact vector sum from plain SQL
    val hh = spark.sql(
      """SELECT heavy_hitters(split(text, ' '), 8) AS s
        |FROM ext_docs""".stripMargin).head()
    assert(hh.getStruct(0).getLong(0) > 0, "n_items must count tokens")
    val qs = spark.sql(
      """SELECT quantized_vector_sum(embedding).n AS n FROM ext_embs""")
      .head().getLong(0)
    assert(qs == Tables.load(spark, sf, "embeddings").count())
    val gr = spark.sql(
      "SELECT embedding_gramian(embedding).n AS n FROM ext_embs")
      .head().getLong(0)
    assert(gr == qs)
  }

  test("non-literal parameters are rejected with a clear error") {
    Tables.load(spark, sf, "documents").createOrReplaceTempView("ext_docs2")
    val e = intercept[Exception](spark.sql(
      "SELECT shingle_hashes(text, CAST(n_chars AS INT)) FROM ext_docs2")
      .collect())
    assert(e.getMessage.contains("integer literal"))
  }
}
