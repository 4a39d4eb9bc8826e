package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable per-partition state of [[EmbeddingGramian]]: exact 128-bit
  * two's-complement accumulators (hi/lo word pairs) for the per-dim
  * quantized sums and the upper-triangle quantized product sums, plus
  * row count. `d = -1` marks the empty buffer (dimension unknown
  * until the first row).
  */
final class GramianBuffer(var d: Int, var n: Long,
                          var sxHi: Array[Long], var sxLo: Array[Long],
                          var sxxHi: Array[Long], var sxxLo: Array[Long])

/** One-pass Gramian/moment aggregate over an `array<float>` embedding
  * column — the distributed half of [[graft.operators.Similarity]]'s
  * covariance and PCA operators.
  *
  * Replaces the round-7 formulation that exploded D²/2 product ROWS
  * per vector through a hash aggregate (D=64 ⇒ 2,080 short-lived rows
  * per input row — measurable GC pressure on every query scheduled
  * after it in a shared JVM, and a needless 2,000× row amplification
  * ahead of the shuffle at any scale). Here each partition folds its
  * rows into ONE fixed-size buffer (D²/2 + D accumulators, ~34 KB at
  * D=64) and the only movement is the final buffer merge — the
  * textbook partial-aggregation shape with nothing but the buffer on
  * the wire.
  *
  * Numerics are identical to the explode formulation, bit for bit:
  * components quantize onto the tie-free `floor(x · 10⁶)` grid, the
  * quantized longs multiply exactly (|q| < 3·10⁹ enforced below, so
  * |q·q| < 9·10¹⁸ fits a signed 64-bit product), and sums accumulate
  * in 128-bit two's complement — associative integer math, immune to
  * partition order, exact past 10¹⁸ rows. The emitted sums are
  * `decimal(38,0)` (2¹²⁷ < 10³⁸·²) and the correctly-rounded
  * decimal→double cast downstream matches DuckDB's DECIMAL(38,0)
  * cast, which is what keeps the covariance oracle hash-green.
  *
  * Output (one struct): n, per-dim means of the QUANTIZED values
  * (deterministic, unlike a raw double sum), and the upper-triangle
  * pairs (i, j, sxx, sa, sb) ready for the covariance expression —
  * so covariance AND the PCA fit (count + means + covariance) need
  * exactly one pass over the corpus. The quantization-range guard
  * is enforced per row by the `require` in `update`, not via an
  * output field.
  */
case class EmbeddingGramian(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  import EmbeddingGramian._

  // AbstractDataType is private[sql] in Spark 4 — the covariant
  // Seq[DataType] override is the public-API way to declare this
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = false
  override def dataType: DataType = schema
  override def prettyName: String = "embedding_gramian"

  override def createAggregationBuffer(): GramianBuffer =
    new GramianBuffer(-1, 0L, null, null, null, null)

  override def update(b: GramianBuffer, input: InternalRow): GramianBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (b.d < 0) {
      val npairs = d * (d + 1) / 2
      b.d = d
      b.sxHi = new Array[Long](d); b.sxLo = new Array[Long](d)
      b.sxxHi = new Array[Long](npairs); b.sxxLo = new Array[Long](npairs)
    } else require(b.d == d,
      s"embedding dimension changed mid-corpus: ${b.d} then $d — the " +
        "Gramian is defined over one fixed dimension")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      require(!arr.isNullAt(i), "null embedding component")
      val x = arr.getFloat(i).toDouble
      val ax = math.abs(x)
      // quantization precondition: |q| stays under ~3e9 so q*q fits a
      // signed 64-bit product. NaN fails this check too (NaN < 3000
      // is false), so non-finite embeddings surface here, not as a
      // silently wrong covariance.
      require(ax < 3000.0,
        s"embedding component $x out of the quantization range " +
          "(|x| < 3000) — rescale the column before covariance/PCA")
      q(i) = math.floor(x * 1e6).toLong
      addSigned(b.sxHi, b.sxLo, i, q(i))
      i += 1
    }
    var k = 0
    i = 0
    while (i < d) {
      val qi = q(i)
      var j = i
      while (j < d) {
        addSigned(b.sxxHi, b.sxxLo, k, qi * q(j))
        j += 1; k += 1
      }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(b: GramianBuffer, o: GramianBuffer): GramianBuffer = {
    if (o.d < 0) return b
    if (b.d < 0) return o
    require(b.d == o.d,
      s"embedding dimension changed across partitions: ${b.d} vs ${o.d}")
    var i = 0
    while (i < b.d) { add128(b.sxHi, b.sxLo, i, o.sxHi(i), o.sxLo(i)); i += 1 }
    var k = 0
    val npairs = b.sxxHi.length
    while (k < npairs) {
      add128(b.sxxHi, b.sxxLo, k, o.sxxHi(k), o.sxxLo(k)); k += 1
    }
    b.n += o.n
    b
  }

  override def eval(b: GramianBuffer): Any = {
    if (b.d < 0)
      return new GenericInternalRow(Array[Any](0L,
        new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any])))
    val d = b.d
    val sx = Array.tabulate(d)(i => toBigInt(b.sxHi(i), b.sxLo(i)))
    val means = new GenericArrayData(Array.tabulate[Any](d)(i =>
      sx(i).doubleValue / 1e6 / b.n))
    val sxDec = sx.map(bi => Decimal(BigDecimal(bi), 38, 0))
    val pairs = new Array[Any](d * (d + 1) / 2)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        pairs(k) = new GenericInternalRow(Array[Any](
          i.toLong, j.toLong,
          Decimal(BigDecimal(toBigInt(b.sxxHi(k), b.sxxLo(k))), 38, 0),
          sxDec(i), sxDec(j)))
        j += 1; k += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](b.n, means,
      new GenericArrayData(pairs)))
  }

  override def serialize(b: GramianBuffer): Array[Byte] = {
    if (b.d < 0) {
      val bb = ByteBuffer.allocate(4)
      bb.putInt(-1)
      return bb.array()
    }
    val npairs = b.sxxHi.length
    val bb = ByteBuffer.allocate(4 + 8 + (b.d * 2 + npairs * 2) * 8)
    bb.putInt(b.d); bb.putLong(b.n)
    var i = 0
    while (i < b.d) { bb.putLong(b.sxHi(i)); bb.putLong(b.sxLo(i)); i += 1 }
    var k = 0
    while (k < npairs) { bb.putLong(b.sxxHi(k)); bb.putLong(b.sxxLo(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramianBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    if (d < 0) return createAggregationBuffer()
    val n = bb.getLong
    val npairs = d * (d + 1) / 2
    val sxHi = new Array[Long](d); val sxLo = new Array[Long](d)
    val sxxHi = new Array[Long](npairs); val sxxLo = new Array[Long](npairs)
    var i = 0
    while (i < d) { sxHi(i) = bb.getLong; sxLo(i) = bb.getLong; i += 1 }
    var k = 0
    while (k < npairs) { sxxHi(k) = bb.getLong; sxxLo(k) = bb.getLong; k += 1 }
    new GramianBuffer(d, n, sxHi, sxLo, sxxHi, sxxLo)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EmbeddingGramian =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EmbeddingGramian =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): EmbeddingGramian =
    copy(child = newChild)
}

object EmbeddingGramian {

  val pairType: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("sxx", DecimalType(38, 0), nullable = false),
    StructField("sa", DecimalType(38, 0), nullable = false),
    StructField("sb", DecimalType(38, 0), nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("means", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("pairs", ArrayType(pairType, containsNull = false),
      nullable = false)))

  /** Accumulate a signed 64-bit value into 128-bit cell `k`:
    * sign-extend to 128 and add with carry. The carry-out of the
    * unsigned low-word add is the standard bit identity
    * `((a & b) | ((a | b) & ~sum)) >>> 63`. Shared with
    * [[QuantizedVectorSum]] (the k-means update aggregate).
    */
  @inline private[functions] def addSigned(hi: Array[Long], lo: Array[Long], k: Int,
                                p: Long): Unit = {
    val l0 = lo(k)
    val l1 = l0 + p
    val carry = ((l0 & p) | ((l0 | p) & ~l1)) >>> 63
    lo(k) = l1
    hi(k) += (p >> 63) + carry
  }

  /** Add the 128-bit value (bhi, blo) into cell `k`. */
  @inline private[functions] def add128(ahi: Array[Long], alo: Array[Long], k: Int,
                             bhi: Long, blo: Long): Unit = {
    val l0 = alo(k)
    val l1 = l0 + blo
    val carry = ((l0 & blo) | ((l0 | blo) & ~l1)) >>> 63
    alo(k) = l1
    ahi(k) += bhi + carry
  }

  /** The 128-bit (hi, lo) accumulator as an exact BigInteger:
    * 16 bytes big-endian IS its two's-complement encoding.
    */
  private[functions] def toBigInt(hi: Long, lo: Long): java.math.BigInteger = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(hi); bb.putLong(lo)
    new java.math.BigInteger(bb.array())
  }
}
