package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

object HashFunctions {
  def simhash64(tokens: Column): Column = org.apache.spark.sql.graftbridge.ColumnBridge.column(
    SimHash64(org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens)))
}
