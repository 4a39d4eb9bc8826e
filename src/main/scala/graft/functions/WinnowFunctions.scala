package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing anchor selection as ONE compiled byte scan.
  *
  * The declarative formulation ([[graft.operators.TextAnalysis
  * .winnowAnchorPositionsHof]]) builds the per-position gram-hash
  * array with `transform(sequence(...))` and selects window minima
  * with `filter`/`aggregate` run folds — all higher-order functions,
  * which never enter whole-stage codegen: every element evaluates a
  * full interpreted expression tree, and each md5 gram hash
  * additionally materializes a 32-char hex string that `conv` then
  * re-parses. At the r21 baseline that chain was the single most
  * expensive kernel on the board (text_span_dedup / text_span_clean /
  * text_winnow / dedup_winnow all sit on it).
  *
  * This kernel computes the identical (pos, fingerprint) set in one
  * pass over the row's bytes:
  *
  *   - char starts by UTF-8 lead-byte scan (== `substr` char
  *     semantics, code-point indexed);
  *   - per k-gram hash: the first 4 MD5 digest bytes as an unsigned
  *     big-endian int — BIT-IDENTICAL to
  *     `conv(substring(md5(gram), 1, 8), 16, 10)` (the first 8 hex
  *     chars ARE the first 4 digest bytes) without the hex
  *     round-trip, one thread-cached MessageDigest; or, for
  *     `prodHash`, xxhash64 with Spark's seed 42 over the gram's
  *     exact bytes — the value `xxhash64(gram)` computes;
  *   - per-position run-length selection (L = consecutive strictly
  *     greater hashes to the left, R = consecutive greater-or-equal
  *     to the right, both capped at w − 1; position i anchors iff
  *     some w-window inside [i − L, i + R] has i as its leftmost
  *     minimum) — the same characterization the HOF form folds,
  *     as two plain loops.
  *
  * Returns an EMPTY array (explode drops the row, exactly like the
  * HOF form's null-propagating `when` guards) when the text has
  * fewer than k chars or fewer than w grams. Equivalence to the HOF
  * form is property-pinned in KernelEquivalenceR21Spec.
  *
  * UTF-8 caveat (r22, documented): character positions step by
  * counting non-continuation bytes ((b & 0xc0) != 0x80), while
  * Spark's length/substring — the HOF reference and the SQL oracle —
  * step via UTF8String.numBytesForFirstByte. The two agree on every
  * well-formed UTF-8 sequence and can disagree on malformed bytes
  * (overlong/truncated sequences), so kernel == reference is pinned
  * for well-formed text only — the corpus contract. The same applies
  * to CharNgramOps.charNgramProfile.
  */
object WinnowOps {

  private val Empty = new GenericArrayData(Array.empty[Any])

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def anchorPairs(text: UTF8String, k: Int, w: Int,
                  prodHash: Boolean): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var numChars = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xc0) != 0x80) numChars += 1; i += 1 }
    val nG = numChars - (k - 1)
    if (nG < 1 || nG < w) return Empty
    val starts = new Array[Int](numChars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(numChars) = len

    val hs = new Array[Long](nG)
    if (prodHash) {
      i = 0
      while (i < nG) {
        hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.fromBytes(bytes, starts(i),
            starts(i + k) - starts(i)), 42L)
        i += 1
      }
    } else {
      val d = md5.get()
      i = 0
      while (i < nG) {
        d.reset()
        d.update(bytes, starts(i), starts(i + k) - starts(i))
        val dig = d.digest()
        hs(i) = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        i += 1
      }
    }

    // selection: per position j (0-based), L/R run lengths capped at
    // w-1; selected iff max(j-L, j-(w-1), 0) <= min(j, j+R-(w-1), nG-w)
    val sel = new Array[Boolean](nG)
    var nSel = 0
    if (w == 1) {
      java.util.Arrays.fill(sel, true)
      nSel = nG
    } else {
      var j = 0
      while (j < nG) {
        var l = 0
        while (l < w - 1 && j - l - 1 >= 0 && hs(j - l - 1) > hs(j)) l += 1
        var r = 0
        while (r < w - 1 && j + r + 1 < nG && hs(j + r + 1) >= hs(j)) r += 1
        val sMin = math.max(math.max(j - l, j - (w - 1)), 0)
        val sMax = math.min(math.min(j, j + r - (w - 1)), nG - w)
        if (sMin <= sMax) { sel(j) = true; nSel += 1 }
        j += 1
      }
    }
    val out = new Array[Any](nSel)
    var o = 0
    i = 0
    while (i < nG) {
      if (sel(i)) {
        out(o) = new GenericInternalRow(Array[Any]((i + 1).toLong, hs(i)))
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `winnow_anchor_pairs(text)`: codegen'd positional winnow
  * selection — array of struct(pos, h), 1-based char positions.
  */
case class WinnowAnchorPairs(child: Expression, k: Int, w: Int,
                             prodHash: Boolean)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, "need k >= 2 and w >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_anchor_pairs"

  override protected def nullSafeEval(text: Any): Any =
    WinnowOps.anchorPairs(text.asInstanceOf[UTF8String], k, w, prodHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.WinnowOps.anchorPairs($t, $k, $w, $prodHash)")

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchorPairs =
    copy(child = newChild)
}

object WinnowFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def winnowAnchorPairs(text: Column, k: Int, w: Int,
                        prodHash: Boolean): Column =
    ColumnBridge.column(WinnowAnchorPairs(
      ColumnBridge.expression(text), k, w, prodHash))
}
