package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word-frequency statistics in ONE byte scan + one
  * small sort — the compiled replacement for the interpreted
  * `aggregate(array_distinct(words), ...)` chains in
  * repetitionMetrics / diversityMetrics, whose per-distinct-word
  * `filter(words, _ === w)` rescan is O(distinct · n) with full
  * expression-tree interpretation per element.
  *
  * Word semantics are exactly `split(text, " ")`: words are the
  * byte runs between single spaces, EMPTY words from doubled /
  * leading / trailing spaces included, word count = spaces + 1
  * (the [[WordNgramOps.wordStarts]] contract — shared helper).
  * Frequencies come from a binary sort of zero-copy word spans +
  * run-length count: equality of UTF-8 byte sequences IS string
  * equality, so counts are bit-identical to the HOF form's.
  *
  * Output struct: (n_words, n_distinct, top_count, sum_sq) — all
  * exact longs; `sum_sq` = Σ count² over distinct words (the
  * Gini–Simpson numerator), `top_count` = max single-word count.
  */
object WordFreqOps {

  def wordFreqStats(text: UTF8String): GenericInternalRow = {
    val bytes = text.getBytes
    val starts = WordNgramOps.wordStarts(bytes)
    val m = starts.length - 1 // word count == spaces + 1
    val words = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      val from = starts(i)
      words(i) = UTF8String.fromBytes(bytes, from, starts(i + 1) - 1 - from)
      i += 1
    }
    java.util.Arrays.sort(words, Utf8Order.Binary)
    var nDistinct = 0L
    var top = 0L
    var sumSq = 0L
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && words(j) == words(i)) j += 1
      val c = (j - i).toLong
      nDistinct += 1L
      if (c > top) top = c
      sumSq += c * c
      i = j
    }
    new GenericInternalRow(Array[Any](m.toLong, nDistinct, top, sumSq))
  }
}

/** `word_freq_stats(text)`: codegen'd per-document word-frequency
  * statistics (struct: n_words, n_distinct, top_count, sum_sq).
  */
case class WordFreqStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))
  override def prettyName: String = "word_freq_stats"

  override protected def nullSafeEval(text: Any): Any =
    WordFreqOps.wordFreqStats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.WordFreqOps.wordFreqStats($t)")

  override protected def withNewChildInternal(newChild: Expression): WordFreqStats =
    copy(child = newChild)
}

/** Distinct char-n-gram COUNTS per document (orders 1..maxOrder
  * pooled) in one pass — the model-training side of the langid
  * family. Where [[CharNgramOps.charNgramProfile]] ranks and keeps
  * the top k, this emits EVERY distinct gram with its occurrence
  * count, so the per-language model aggregate can sum per-doc
  * counts instead of exploding every gram OCCURRENCE through an
  * interpreted `transform(sequence(...))` + corpus-row shuffle:
  * rows shipped drop from Σ|doc grams| to Σ|doc distinct grams|,
  * and the per-element interpretation disappears.
  */
object CharNgramCountOps {

  /** Single-pass distinct+count over the sorted gram span array. */
  def charNgramCounts(text: UTF8String, maxOrder: Int): ArrayData = {
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
    val items = new java.util.ArrayList[Any]()
    i = 0
    while (i < total) {
      var j = i + 1
      while (j < total && grams(j) == grams(i)) j += 1
      items.add(new GenericInternalRow(
        Array[Any](grams(i), (j - i).toLong)))
      i = j
    }
    new GenericArrayData(items.toArray)
  }
}

/** `char_ngram_counts(text)`: codegen'd distinct char-n-gram counts
  * (array of struct(_g, _c), orders 1..maxOrder pooled).
  */
case class CharNgramCounts(child: Expression, maxOrder: Int)
    extends UnaryExpression {
  require(maxOrder >= 1, "need maxOrder >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_g", StringType, nullable = false),
    StructField("_c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_ngram_counts"

  override protected def nullSafeEval(text: Any): Any =
    CharNgramCountOps.charNgramCounts(
      text.asInstanceOf[UTF8String], maxOrder)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.CharNgramCountOps.charNgramCounts($t, $maxOrder)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramCounts =
    copy(child = newChild)
}

/** Disjoint `segWords`-word segments of a document as ZERO-COPY byte
  * spans (r22) — the compiled replacement for segmentRows'
  * interpreted `transform(sequence(...), i => array_join(slice(
  * split(text, " "), ...), " "))` chain, which allocated a word
  * array, per-segment slice copies, and a joined string per segment
  * with full per-element expression interpretation, twice per
  * document (the hot-segment aggregate and the reassembly join both
  * consume the rows).
  *
  * Span identity: `split(text, " ")` words are the byte runs between
  * SINGLE spaces (empty words included), so any CONTIGUOUS word
  * slice re-joined with " " is exactly the original byte span from
  * the first word's start to the last word's end — doubled spaces
  * reproduce themselves through the empty words. Segment count =
  * ceil(words / segWords) (≥ 1: split of "" is [""], one empty
  * segment), segments in order — bit-identical to the HOF form
  * (KernelEquivalenceR21Spec-style pin in SegmentKernelSpec).
  */
object WordSegmentOps {

  def wordSegments(text: UTF8String, segWords: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = WordNgramOps.wordStarts(bytes)
    val m = starts.length - 1
    val nseg = (m + segWords - 1) / segWords
    val out = new Array[Any](nseg)
    var s = 0
    while (s < nseg) {
      val w0 = s * segWords
      val last = math.min(w0 + segWords, m) - 1
      val from = starts(w0)
      out(s) = UTF8String.fromBytes(bytes, from, starts(last + 1) - 1 - from)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_segments(text, segWords)`: codegen'd disjoint word segments
  * (array<string>, in document order; index = seg_idx).
  */
case class WordSegments(child: Expression, segWords: Int)
    extends UnaryExpression {
  require(segWords >= 1, "need segWords >= 1")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_segments"

  override protected def nullSafeEval(text: Any): Any =
    WordSegmentOps.wordSegments(text.asInstanceOf[UTF8String], segWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.WordSegmentOps.wordSegments($t, $segWords)")

  override protected def withNewChildInternal(newChild: Expression): WordSegments =
    copy(child = newChild)
}

object TextStatsFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def wordFreqStats(text: Column): Column =
    ColumnBridge.column(WordFreqStats(ColumnBridge.expression(text)))

  def charNgramCounts(text: Column, maxOrder: Int): Column =
    ColumnBridge.column(CharNgramCounts(
      ColumnBridge.expression(text), maxOrder))

  def wordSegments(text: Column, segWords: Int): Column =
    ColumnBridge.column(WordSegments(
      ColumnBridge.expression(text), segWords))
}
