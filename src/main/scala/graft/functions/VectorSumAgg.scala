package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable state of [[QuantizedVectorSum]]: 128-bit accumulators for
  * the per-dimension quantized component sums plus the vector count.
  * `d = -1` marks the empty buffer.
  */
final class VectorSumBuffer(var d: Int, var n: Long,
                            var sxHi: Array[Long], var sxLo: Array[Long])

/** Exact per-dimension sum of an `array<float>` column — the k-means
  * centroid-update aggregate (the D-vector little sibling of
  * [[EmbeddingGramian]]'s D²/2 moment buffer).
  *
  * A float mean folds in partition order, so a Lloyd update built on
  * `avg` would drift between runs, cluster layouts, and engines —
  * which is exactly why the IVF quantizer settled for hash-sampled
  * centroids (`Similarity.annIvf`). This aggregate restores Lloyd:
  * components quantize onto the tie-free `floor(x · 10⁶)` grid
  * (identical to the Gramian's), quantized longs sum in 128-bit
  * two's complement — associative, partition-order-free, exact past
  * 10¹⁸ rows — and the centroid `sx / 10⁶ / n` is then ONE
  * correctly-rounded double both Spark and DuckDB reproduce bit for
  * bit. Per partition the state is a single D-length buffer; only
  * buffers cross the wire (classic partial aggregation).
  *
  * Output (one struct): n, sx as `decimal(38,0)` per dimension.
  */
case class QuantizedVectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSumBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  import EmbeddingGramian.{add128, addSigned, toBigInt}

  // AbstractDataType is private[sql] in Spark 4 — covariant override
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = false
  override def dataType: DataType = QuantizedVectorSum.schema
  override def prettyName: String = "quantized_vector_sum"

  override def createAggregationBuffer(): VectorSumBuffer =
    new VectorSumBuffer(-1, 0L, null, null)

  override def update(b: VectorSumBuffer, input: InternalRow): VectorSumBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (b.d < 0) {
      b.d = d
      b.sxHi = new Array[Long](d); b.sxLo = new Array[Long](d)
    } else require(b.d == d,
      s"embedding dimension changed mid-corpus: ${b.d} then $d")
    var i = 0
    while (i < d) {
      require(!arr.isNullAt(i), "null embedding component")
      val x = arr.getFloat(i).toDouble
      // same guard as the Gramian: keeps the quantized magnitude
      // bounded and rejects NaN (NaN < 3000 is false) loudly
      require(math.abs(x) < 3000.0,
        s"embedding component $x out of the quantization range " +
          "(|x| < 3000) — rescale the column before k-means")
      addSigned(b.sxHi, b.sxLo, i, math.floor(x * 1e6).toLong)
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(b: VectorSumBuffer, o: VectorSumBuffer): VectorSumBuffer = {
    if (o.d < 0) return b
    if (b.d < 0) return o
    require(b.d == o.d,
      s"embedding dimension changed across partitions: ${b.d} vs ${o.d}")
    var i = 0
    while (i < b.d) { add128(b.sxHi, b.sxLo, i, o.sxHi(i), o.sxLo(i)); i += 1 }
    b.n += o.n
    b
  }

  override def eval(b: VectorSumBuffer): Any = {
    if (b.d < 0)
      return new GenericInternalRow(Array[Any](0L,
        new GenericArrayData(Array.empty[Any])))
    val sx = new GenericArrayData(Array.tabulate[Any](b.d)(i =>
      Decimal(BigDecimal(toBigInt(b.sxHi(i), b.sxLo(i))), 38, 0)))
    new GenericInternalRow(Array[Any](b.n, sx))
  }

  override def serialize(b: VectorSumBuffer): Array[Byte] = {
    if (b.d < 0) {
      val bb = ByteBuffer.allocate(4)
      bb.putInt(-1)
      return bb.array()
    }
    val bb = ByteBuffer.allocate(4 + 8 + b.d * 16)
    bb.putInt(b.d); bb.putLong(b.n)
    var i = 0
    while (i < b.d) { bb.putLong(b.sxHi(i)); bb.putLong(b.sxLo(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    if (d < 0) return createAggregationBuffer()
    val n = bb.getLong
    val sxHi = new Array[Long](d); val sxLo = new Array[Long](d)
    var i = 0
    while (i < d) { sxHi(i) = bb.getLong; sxLo(i) = bb.getLong; i += 1 }
    new VectorSumBuffer(d, n, sxHi, sxLo)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantizedVectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantizedVectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantizedVectorSum =
    copy(child = newChild)
}

object QuantizedVectorSum {

  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", ArrayType(DecimalType(38, 0), containsNull = false),
      nullable = false)))
}
