package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** SparkSessionExtensions registration for graft's custom Catalyst
  * expressions, so plain SQL users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * (On a cluster, set `spark.sql.extensions=graft.functions.GraftExtensions`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def longArg(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, _)          => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b)")
        CosineSimilarity(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("srp_bucket"),
      info("srp_bucket", "srp_bucket(v[, planes[, seed]]) - SRP-LSH bucket id"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 3, "srp_bucket(v[, planes[, seed]])")
        val planes = if (args.length > 1) intArg(args(1), "srp_bucket", 2) else 6
        val seed = if (args.length > 2) longArg(args(2), "srp_bucket", 3) else 42L
        SrpBucket(args(0), planes, seed)
      }))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens)")
        SimHash64(args(0))
      }))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text[, n]) - distinct byte n-gram hashes"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2, "shingle_hashes(text[, n])")
        val n = if (args.length > 1) intArg(args(1), "shingle_hashes", 2) else 5
        ShingleHashes64(args(0), n)
      }))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shash[, numPerm[, seed]]) - MinHash signature"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 3, "minhash_sig(shash[, numPerm[, seed]])")
        val perm = if (args.length > 1) intArg(args(1), "minhash_sig", 2) else 64
        val seed = if (args.length > 2) longArg(args(2), "minhash_sig", 3) else 42L
        MinHashSignature(args(0), perm, seed)
      }))
    e.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(text[, mult[, mod]]) - rolling polynomial hash"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 3, "poly_hash(text[, mult[, mod]])")
        val mult = if (args.length > 1) longArg(args(1), "poly_hash", 2) else 31L
        val mod = if (args.length > 2) longArg(args(2), "poly_hash", 3) else 1000000007L
        PolyHash64(args(0), mult, mod)
      }))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double dot of two float arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b)")
        DotProduct(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("self_norm"),
      info("self_norm", "self_norm(v) - sum of squares of a float array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "self_norm(v)")
        SelfNorm(args(0))
      }))
    e.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text[, n]) - n-word shingles in one byte scan"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2, "word_ngrams(text[, n])")
        val n = if (args.length > 1) intArg(args(1), "word_ngrams", 2) else 5
        WordNgrams(args(0), n)
      }))
    e.injectFunction((FunctionIdentifier("dup_ngram_counts"),
      info("dup_ngram_counts",
        "dup_ngram_counts(text[, n]) - per-doc duplicate n-gram accounting struct"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2, "dup_ngram_counts(text[, n])")
        val n = if (args.length > 1) intArg(args(1), "dup_ngram_counts", 2) else 3
        DupNgramCounts(args(0), n)
      }))
    e.injectFunction((FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters",
        "heavy_hitters(items[, k]) - Misra-Gries sketch aggregate over string arrays"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2, "heavy_hitters(items[, k])")
        val k = if (args.length > 1) intArg(args(1), "heavy_hitters", 2) else 32
        HeavyHitters(args(0), k).toAggregateExpression()
      }))
    e.injectFunction((FunctionIdentifier("quantized_vector_sum"),
      info("quantized_vector_sum",
        "quantized_vector_sum(v) - exact 128-bit per-dimension sum aggregate"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "quantized_vector_sum(v)")
        QuantizedVectorSum(args(0)).toAggregateExpression()
      }))
    e.injectFunction((FunctionIdentifier("embedding_gramian"),
      info("embedding_gramian",
        "embedding_gramian(v) - one-pass exact moment/Gramian aggregate"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "embedding_gramian(v)")
        EmbeddingGramian(args(0)).toAggregateExpression()
      }))
    e.injectFunction((FunctionIdentifier("adc_dot"),
      info("adc_dot",
        "adc_dot(codes, tables) - PQ asymmetric dot: sum_j tables[j][codes[j]]"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "adc_dot(codes, tables)")
        AdcDot(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection size of two sorted distinct bigint arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count(a, b)")
        SortedIntersectCount(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("kll_sketch"),
      info("kll_sketch",
        "kll_sketch(x[, k]) - mergeable KLL quantile sketch aggregate (binary)"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2, "kll_sketch(x[, k])")
        val k = if (args.length > 1) intArg(args(1), "kll_sketch", 2) else 200
        KllSketch(args(0), k).toAggregateExpression()
      }))
    e.injectFunction((FunctionIdentifier("kll_merge"),
      info("kll_merge",
        "kll_merge(sketch[, k]) - merge stored kll_sketch binaries"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2, "kll_merge(sketch[, k])")
        val k = if (args.length > 1) intArg(args(1), "kll_merge", 2) else 200
        KllMerge(args(0), k).toAggregateExpression()
      }))
    e.injectFunction((FunctionIdentifier("kll_quantiles"),
      info("kll_quantiles",
        "kll_quantiles(sketch, q1[, q2...]) - rank-select estimates from a sketch"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "kll_quantiles(sketch, q1[, q2...])")
        val qs = args.tail.map {
          case Literal(v: Double, DoubleType) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          // the boundary query q=1 written naturally as an int
          case Literal(v: Int, IntegerType) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"kll_quantiles: q must be a numeric literal, got $other")
        }
        KllQuantiles(args(0), qs)
      }))
  }
}
