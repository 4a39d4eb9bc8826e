package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels (see VectorOps for the codegen pattern). */
object HashOps {

  /** FNV-1a 64-bit over UTF-8 bytes — endian/platform independent. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over a token array: each token's FNV-1a hash
    * votes +/-1 per bit position; the sign of each counter becomes
    * the output bit. Near-duplicate documents land within a small
    * Hamming distance, so candidate pairs come from equi-joins on
    * 16-bit chunks (pigeonhole: distance <= 3 guarantees one equal
    * chunk of four) instead of an all-pairs comparison.
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object HashOpsShingle {

  private def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distinct 64-bit hashes of all byte n-grams of `text` in one
    * pass: a rolling FNV-1a window per position, dedup via sort.
    * The hot kernel of the near-dup operators — interpreted
    * higher-order `transform(sequence(...))` over a corpus is 50-100x
    * slower than this loop because HOFs never enter codegen.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val count = math.max(bytes.length - n + 1, 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0xcbf29ce484222325L
      val end = math.min(i + n, bytes.length)
      var k = i
      while (k < end) { h ^= (bytes(k) & 0xffL); h *= 0x100000001b3L; k += 1 }
      out(i) = mix(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < count) {
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  /** MinHash signature over a shingle-hash array: `numPerm` seeded
    * splitmix re-hashes, min per permutation — one tight loop, no
    * per-permutation shuffle or interpreted lambda.
    */
  def minhashSignature(shash: ArrayData, numPerm: Int, seed: Long): ArrayData = {
    val sig = new Array[Long](numPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shash.numElements()
    var i = 0
    while (i < n) {
      val h = shash.getLong(i)
      var p = 0
      while (p < numPerm) {
        val z = mix(h + seed + p * 0x9e3779b97f4a7c15L)
        if (z < sig(p)) sig(p) = z
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

object PolyOps {
  /** Polynomial rolling hash over the byte sequence:
    * fold (acc * mult + byte) % mod — byte-for-byte the value the
    * interpreted aggregate(transform(sequence...)) fold produces on
    * ASCII text (ascii(char) == byte), at codegen loop speed.
    */
  def polyHash(s: UTF8String, mult: Long, mod: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * mult + (bytes(i) & 0xffL)) % mod
      i += 1
    }
    acc
  }
}

/** `poly_hash(text)`: codegen'd Rabin-Karp document fingerprint. */
case class PolyHash64(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(text: Any): Any =
    PolyOps.polyHash(text.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.PolyOps.polyHash($t, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object SetOps {
  /** Intersection size of two SORTED distinct long arrays: one linear
    * merge, zero allocation — vs array_intersect which builds a hash
    * set per row (interpreted, allocation-heavy). The verify kernel
    * of the Jaccard operators (ShingleHashes64 output is sorted).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Number of elements <= v in a SORTED (non-decreasing) double
    * array — the binary-search bucket router for quantile split
    * points (O(log n) per row vs a 1000-element HOF scan). NaN
    * routes past every split (bucket = len), matching Spark's and
    * DuckDB's NaN-greatest sort order, so the bucket index stays
    * monotone in the column's sort order.
    */
  def sortedUpperBound(splits: ArrayData, v: Double): Int = {
    val n = splits.numElements()
    if (java.lang.Double.isNaN(v)) return n
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (splits.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** `sorted_intersect_count(a, b)`: codegen'd merge-intersect size. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `sorted_upper_bound(splits, v)`: codegen'd binary-search count of
  * sorted split points <= v — quantile-bucket routing.
  */
case class SortedUpperBound(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_upper_bound"

  override protected def nullSafeEval(splits: Any, v: Any): Any =
    SetOps.sortedUpperBound(splits.asInstanceOf[ArrayData],
      v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.SetOps.sortedUpperBound($s, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedUpperBound =
    copy(left = newLeft, right = newRight)
}

/** `shingle_hashes(text)`: codegen'd distinct byte-n-gram hash set. */
case class ShingleHashes64(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "shingle length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(text: Any): Any =
    HashOpsShingle.shingleHashes(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.HashOpsShingle.shingleHashes($t, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes64 =
    copy(child = newChild)
}

object WordNgramOps {

  /** All n-WORD shingles of a single-space-tokenized text in ONE
    * byte scan. Byte-for-byte equal to
    * `concat_ws(" ", slice(split(text, " "), i, n))` for every i —
    * a word shingle of single-space-separated words IS the byte
    * range from its first word's start to its last word's end
    * (empty words from doubled/leading spaces included, exactly as
    * `split` keeps them) — but without the per-position
    * slice-array/concat allocations of the HOF formulation, and the
    * emitted strings WRAP the row's byte buffer (zero copies).
    * A 0x20 byte never occurs inside a UTF-8 multibyte sequence, so
    * the space scan is encoding-safe.
    */
  /** Byte offsets of every word start (split-on-single-space
    * semantics: word count = spaces + 1, empty words included) plus
    * a `len + 1` sentinel, so a shingle over words [s, s+n) spans
    * bytes [starts(s), starts(s+n) − 1). The ONE definition both
    * [[wordNgrams]] and [[DupNgramOps.dupNgramCounts]] share — their
    * outputs must stay byte-for-byte aligned for the FNV-over-bytes
    * hashes to keep matching the emitted shingle strings.
    */
  private[functions] def wordStarts(bytes: Array[Byte]): Array[Int] = {
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val starts = new Array[Int](spaces + 2)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(spaces + 1) = len + 1
    starts
  }

  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = wordStarts(bytes)
    val m = starts.length - 1 // word count, as split(" ") defines it
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var s = 0
    while (s <= m - n) {
      val from = starts(s)
      out(s) = UTF8String.fromBytes(bytes, from, starts(s + n) - 1 - from)
      s += 1
    }
    new GenericArrayData(out)
  }
}

object DupNgramOps {

  /** Per-document duplicate word-n-gram accounting in ONE byte scan
    * + one small sort: (n_ngrams, dup_ngrams, dup_occurrences) where
    * `dup_ngrams` counts distinct shingles occurring more than once
    * and `dup_occurrences` their total occurrences — the numerators
    * of the RefinedWeb/Gopher duplicated-n-gram gates. Shingles are
    * identified by their FNV-1a 64 over the shingle's exact bytes
    * (identical to hashing the [[WordNgramOps.wordNgrams]] string),
    * so an oracle replaying the FNV fold counts the same values.
    * No shuffle: the whole metric is a per-row projection — the
    * (doc, gram) groupBy formulation would shuffle the corpus.
    */
  def dupNgramCounts(text: UTF8String, n: Int): InternalRow = {
    val bytes = text.getBytes
    val starts = WordNgramOps.wordStarts(bytes)
    val m = starts.length - 1
    if (m < n)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val total = m - n + 1
    var i = 0
    val hs = new Array[Long](total)
    var s = 0
    while (s < total) {
      var h = 0xcbf29ce484222325L
      var k = starts(s)
      val until = starts(s + n) - 1
      while (k < until) { h ^= (bytes(k) & 0xffL); h *= 0x100000001b3L; k += 1 }
      hs(s) = h
      s += 1
    }
    java.util.Arrays.sort(hs)
    var dupNgrams = 0L
    var dupOcc = 0L
    var run = 1L
    i = 1
    while (i <= total) {
      if (i < total && hs(i) == hs(i - 1)) run += 1
      else {
        if (run > 1L) { dupNgrams += 1L; dupOcc += run }
        run = 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](total.toLong, dupNgrams, dupOcc))
  }
}

/** `dup_ngram_counts(text)`: codegen'd per-document duplicate
  * n-gram accounting (struct: n_ngrams, dup_ngrams,
  * dup_occurrences).
  */
case class DupNgramCounts(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle word count must be positive")
  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = false),
    StructField("dup_ngrams", LongType, nullable = false),
    StructField("dup_occurrences", LongType, nullable = false)))
  override def prettyName: String = "dup_ngram_counts"

  override protected def nullSafeEval(text: Any): Any =
    DupNgramOps.dupNgramCounts(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.DupNgramOps.dupNgramCounts($t, $n)")

  override protected def withNewChildInternal(newChild: Expression): DupNgramCounts =
    copy(child = newChild)
}

/** `word_ngrams(text)`: codegen'd n-word shingle array (the
  * boilerplate-sketch item stream — see WordNgramOps for the exact
  * `split`/`slice`/`concat_ws` equivalence).
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle word count must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(text: Any): Any =
    WordNgramOps.wordNgrams(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.WordNgramOps.wordNgrams($t, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `minhash_sig(shash)`: codegen'd MinHash signature. */
case class MinHashSignature(child: Expression, numPerm: Int, seed: Long)
    extends UnaryExpression {
  require(numPerm > 0, "numPerm must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(shash: Any): Any =
    HashOpsShingle.minhashSignature(shash.asInstanceOf[ArrayData], numPerm, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.HashOpsShingle.minhashSignature($s, $numPerm, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `simhash64(tokens)`: codegen'd 64-bit SimHash of an
  * `array<string>` token column (SURVEY.md §2 #30).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(tokens: Any): Any =
    HashOps.simhash64(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.HashOps.simhash64($t)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Binary (UTF-8 byte) ordering for UTF8String sorts. Spark 4's
  * `UTF8String.compareTo` guards EVERY call with
  * `SparkEnvUtils.isTesting` — a `System.getenv` lookup that
  * string-encodes the variable name per comparison — so a
  * `Arrays.sort` over the natural ordering spends most of its time
  * reading the process environment (measured: the charNgramProfile
  * sort was ~10× slower than the same sort through this comparator).
  * `binaryCompare` is the exact order compareTo delegates to.
  */
object Utf8Order {
  val Binary: java.util.Comparator[UTF8String] =
    new java.util.Comparator[UTF8String] {
      override def compare(a: UTF8String, b: UTF8String): Int =
        a.binaryCompare(b)
    }
}

object CharNgramOps {

  /** Per-document Cavnar–Trenkle char-n-gram RANK PROFILE in one
    * tight pass: char-offset scan (UTF-8 lead bytes), all 1..maxOrder
    * grams as zero-copy byte spans, binary-order span sort,
    * run-length distinct counts, stable top-`k` by (count desc, gram
    * asc) — the stable sort over the gram-ascending distinct list IS
    * the tiebreak. Returns struct(gram, rank) rows in rank order,
    * 1-based.
    *
    * Exists because the declarative formulations measured wrong at
    * scale: exploding every gram occurrence through a (doc, gram)
    * aggregate + per-doc window shuffles ~|chars|·maxOrder corpus
    * rows for a ≤k-row-per-doc result, and the in-row HOF chain
    * (array_sort + run-length filter) pays per-element expression
    * overhead ~100× this loop. Binary UTF8String order == both
    * engines' binary string collation, so the oracle's groupBy +
    * row_number replay ranks identically.
    */
  def charNgramProfile(text: UTF8String, maxOrder: Int, k: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var numChars = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xc0) != 0x80) numChars += 1; i += 1 }
    val starts = new Array[Int](numChars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(numChars) = len
    var total = 0
    var o = 1
    while (o <= maxOrder) { if (numChars >= o) total += numChars - o + 1; o += 1 }
    if (total == 0) return new GenericArrayData(Array.empty[Any])
    val grams = new Array[UTF8String](total)
    var g = 0
    o = 1
    while (o <= maxOrder) {
      var s = 0
      while (s + o <= numChars) {
        grams(g) = UTF8String.fromBytes(bytes, starts(s),
          starts(s + o) - starts(s))
        g += 1
        s += 1
      }
      o += 1
    }
    java.util.Arrays.sort(grams, Utf8Order.Binary)
    val dg = new Array[UTF8String](total)
    val dc = new Array[Int](total)
    var m = 0
    i = 0
    while (i < total) {
      var j = i + 1
      while (j < total && grams(j) == grams(i)) j += 1
      dg(m) = grams(i)
      dc(m) = j - i
      m += 1
      i = j
    }
    val idx = new Array[Integer](m)
    i = 0
    while (i < m) { idx(i) = i; i += 1 }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      if (dc(b.intValue) != dc(a.intValue)) dc(b.intValue) - dc(a.intValue)
      else a.intValue - b.intValue)
    val kk = math.min(k, m)
    val out = new Array[Any](kk)
    i = 0
    while (i < kk) {
      out(i) = new GenericInternalRow(
        Array[Any](dg(idx(i).intValue), i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `char_ngram_profile(text)`: codegen'd per-document
  * Cavnar–Trenkle top-k char-n-gram rank profile
  * (array of struct(_g, _drank), rank order).
  */
case class CharNgramProfile(child: Expression, maxOrder: Int, k: Int)
    extends UnaryExpression {
  require(maxOrder >= 1 && k >= 1, "need maxOrder >= 1 and k >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_g", StringType, nullable = false),
    StructField("_drank", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_ngram_profile"

  override protected def nullSafeEval(text: Any): Any =
    CharNgramOps.charNgramProfile(text.asInstanceOf[UTF8String], maxOrder, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.CharNgramOps.charNgramProfile($t, $maxOrder, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramProfile =
    copy(child = newChild)
}

object HashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes64(ColumnBridge.expression(text), n))

  def minhashSignature(shash: Column, numPerm: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shash), numPerm, seed))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def polyHash(text: Column, mult: Long = 31L, mod: Long = 1000000007L): Column =
    ColumnBridge.column(PolyHash64(ColumnBridge.expression(text), mult, mod))

  def wordNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))

  def dupNgramCounts(text: Column, n: Int): Column =
    ColumnBridge.column(DupNgramCounts(ColumnBridge.expression(text), n))

  def charNgramProfile(text: Column, maxOrder: Int, k: Int): Column =
    ColumnBridge.column(
      CharNgramProfile(ColumnBridge.expression(text), maxOrder, k))

  def sortedUpperBound(splits: Column, v: Column): Column =
    ColumnBridge.column(SortedUpperBound(
      ColumnBridge.expression(splits), ColumnBridge.expression(v)))
}
