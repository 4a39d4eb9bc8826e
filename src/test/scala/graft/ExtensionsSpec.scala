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

    // PQ ADC lookup-sum and the sorted-merge intersect kernel
    val adc = spark.sql(
      "SELECT adc_dot(array(1, 0), array(array(1.0d, 2.0d), array(3.0d, 4.0d))) AS d")
      .head().getDouble(0)
    assert(adc == 5.0, s"adc_dot: $adc") // tables[0][1] + tables[1][0]
    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L, 9L)) AS n")
      .head().getInt(0)
    assert(ic == 2, s"sorted_intersect_count: $ic")
  }

  test("non-literal parameters are rejected with a clear error") {
    Tables.load(spark, sf, "documents").createOrReplaceTempView("ext_docs2")
    val e = intercept[Exception](spark.sql(
      "SELECT shingle_hashes(text, CAST(n_chars AS INT)) FROM ext_docs2")
      .collect())
    assert(e.getMessage.contains("integer literal"))
  }

  test("hash kernels are byte-correct on multilingual text") {
    // the kernels operate on UTF8String BYTES; the oracle board only
    // exercises the ASCII corpus (DedupQueries' ascii(substr(...))
    // formulations are ASCII-scoped by design). These cases pin the
    // multilingual contract instead: for CJK, emoji (surrogate
    // pairs), combining characters, RTL text, and mixed scripts, each
    // kernel must equal an independent JVM reference computed from
    // java.lang.String's UTF-8 encoding, byte for byte.
    import SparkSpec.spark.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.functions.HashFunctions
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.{col, split}

    val texts = Seq(
      "你好世界 深度学习 模型",   // CJK with spaces
      "日本語のテキスト",                   // Japanese, no spaces
      "café café naïve",                                    // precomposed vs combining
      "😀🙏🎉 emoji 👍 mix",        // surrogate pairs
      "مرحبا بالعالم", // Arabic (RTL)
      "mixed 中文 and ascii and 🤖",
      "à",                                                             // shorter than n
      "")                                                                   // empty
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")

    def mix(x0: Long): Long = {
      var z = x0
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def fnv(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    def refShingles(s: String, n: Int): Seq[Long] = {
      val b = s.getBytes(UTF_8)
      val count = math.max(b.length - n + 1, 1)
      (0 until count).map { i =>
        mix(fnv(java.util.Arrays.copyOfRange(b, i, math.min(i + n, b.length))))
      }.distinct.sorted
    }
    def refPoly(s: String, mult: Long, mod: Long): Long =
      s.getBytes(UTF_8).foldLeft(0L)((acc, b) => (acc * mult + (b & 0xffL)) % mod)
    def refSimhash(tokens: Seq[String]): Long = {
      val counts = new Array[Int](64)
      tokens.foreach { t =>
        val h = fnv(t.getBytes(UTF_8))
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (counts(b) > 0) acc | (1L << b) else acc)
    }

    val n = 5
    val got = df.select(col("id"),
        HashFunctions.shingleHashes(col("text"), n).as("sh"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        HashFunctions.simhash64(split(col("text"), " ")).as("sim"))
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[scala.collection.Seq[Long]]("sh").toSeq,
        r.getAs[Long]("fp"), r.getAs[Long]("sim")))
      .sortBy(_._1)

    got.foreach { case (i, sh, fp, sim) =>
      val t = texts(i.toInt)
      assert(sh == refShingles(t, n),
        s"shingle_hashes diverges from the UTF-8 byte reference on: $t")
      assert(fp == refPoly(t, 31L, 1000000007L),
        s"poly_hash fingerprint diverges from the UTF-8 byte reference on: $t")
      assert(sim == refSimhash(t.split(" ").toSeq),
        s"simhash64 diverges from the UTF-8 byte reference on: $t")
    }

    // combining-vs-precomposed are DIFFERENT byte sequences and must
    // hash differently (no implicit normalization inside the kernels)
    val nfc = "caf\u00e9"   // precomposed
    val nfd = "cafe\u0301"  // combining acute
    assert(refPoly(nfc, 31L, 1000000007L) != refPoly(nfd, 31L, 1000000007L))
    val kernelPair = Seq((0L, nfc), (1L, nfd)).toDF("id", "text")
      .select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().sortBy(_.getAs[Long]("id")).map(_.getAs[Long]("fp"))
    assert(kernelPair(0) != kernelPair(1),
      "the kernel must distinguish NFC from NFD byte sequences")
  }
}
