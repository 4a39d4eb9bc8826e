package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One level of a KLL sketch: a growable primitive double array
  * (no boxing on the per-row hot path). Items at level `i` carry
  * weight 2^i.
  */
final class KllLevel(var a: Array[Double], var size: Int) {
  def append(x: Double): Unit = {
    if (size == a.length) {
      val grown = new Array[Double](math.max(8, a.length * 2))
      System.arraycopy(a, 0, grown, 0, size)
      a = grown
    }
    a(size) = x
    size += 1
  }
  def appendAll(o: KllLevel): Unit = {
    var i = 0
    while (i < o.size) { append(o.a(i)); i += 1 }
  }
}

/** Mutable state of [[KllSketch]]/[[KllMerge]]: the level hierarchy,
  * the true item count, the alternating compaction offset, and the
  * cached level-0 capacity (the only per-row check; full capacities
  * recompute on the compress path, once per ~cap0 inserts).
  */
final class KllBuffer(val k: Int, var n: Long, var coin: Boolean,
                      val levels: mutable.ArrayBuffer[KllLevel],
                      var cap0: Int)

/** Mergeable per-group quantile sketch — the KLL compactor hierarchy
  * (Karnin, Lang, Liberty, FOCS 2016) with MRL-style deterministic
  * alternating compaction, over any numeric column cast to double.
  *
  * This is the scale path for per-group percentiles that
  * [[graft.dq.DataQuality.discretePercentiles]] cannot offer on a
  * CONTINUOUS near-unique column: the exact block shuffles each
  * group's distinct values and sorts them in one task per group —
  * fine for bounded-cardinality columns, a straggler/OOM when the
  * distinct count tracks the corpus. Here each partition folds its
  * rows into one O(k·log(n/k)) buffer, only buffers cross the wire,
  * and no per-group sort ever exceeds the top level's k items —
  * the partial-aggregation shape, same as [[EmbeddingGramian]] /
  * [[QuantizedVectorSum]].
  *
  * Mechanics: level `i` holds items of weight 2^i; level capacities
  * follow the KLL geometric rule cap(l) = max(2, ceil(k·(2/3)^d))
  * where d is the depth below the top level. An over-capacity level
  * sorts (primitive sort, ≤ k items) and promotes every other item
  * to the level above, alternating the survivor offset per
  * compaction (an odd last item stays put, conserving total weight
  * exactly: sum of weights == n always). Merge concatenates levels
  * then runs one upward compress pass — associative up to the
  * alternation state, so estimates depend on merge order (like
  * [[HeavyHitters]], the query entry is rows-only) but the rank
  * error bound does not: with the deterministic coin each compaction
  * at level l displaces a rank by at most 2^(l-1), giving the
  * classic sum_l m_l·2^(l-1) ≤ O(log²(n/k)/k)·n deterministic bound.
  * QuantileSketchSpec pins the observed bound against the exact
  * block on real data.
  *
  * The aggregate's OUTPUT is the serialized sketch itself
  * (`binary`), not the quantile values — that is what makes it an
  * incremental-profiling column: store one sketch row per (group,
  * ingest batch), then [[KllMerge]] folds stored sketches across
  * batches and [[KllQuantiles]] answers rank queries at read time,
  * without re-scanning history. Reference capability counterpart:
  * the DQ layer's distribution checks
  * (ingest-framework/framework/src/sparkbuilder/dq/dq.py), which
  * re-scan the table per profiling run.
  */
case class KllSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 8, "kll_sketch: k must be >= 8")

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): KllBuffer = Kll.empty(k)

  override def update(b: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      // loud guard, matching the repo's aggregate convention
      // (Gramian/VectorSum reject NaN per row): a NaN sorts
      // unpredictably and would silently poison every rank
      require(!x.isNaN, "kll_sketch: NaN value — filter NaN upstream")
      Kll.insert(b, x)
    }
    b
  }

  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = Kll.merge(b, o)

  override def eval(b: KllBuffer): Any = Kll.serialize(b)

  override def serialize(b: KllBuffer): Array[Byte] = Kll.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketch =
    copy(child = newChild)
}

/** Merge aggregate over STORED [[KllSketch]] binaries — the read
  * side of the incremental-profiling column: per-batch sketches
  * written at ingest time fold into one summary without touching
  * the underlying rows again. All inputs must share this
  * aggregate's `k` (enforced loudly; a mixed-k merge would have an
  * undefined error bound).
  */
case class KllMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 8, "kll_merge: k must be >= 8")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"

  override def createAggregationBuffer(): KllBuffer = Kll.empty(k)

  override def update(b: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val o = Kll.deserialize(v.asInstanceOf[Array[Byte]])
      require(o.k == k,
        s"kll_merge: sketch built with k=${o.k}, merger expects k=$k")
      Kll.merge(b, o)
    }
    b
  }

  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = Kll.merge(b, o)
  override def eval(b: KllBuffer): Any = Kll.serialize(b)
  override def serialize(b: KllBuffer): Array[Byte] = Kll.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMerge =
    copy(child = newChild)
}

/** Rank-selection query over a serialized [[KllSketch]]: for each
  * requested q, the stored value at estimated 1-based rank
  * ceil(q·n) — the SAME discrete rank rule as
  * [[graft.dq.DataQuality.discretePercentiles]], so exact-vs-sketch
  * rank error is directly comparable. Runs once per GROUP row after
  * aggregation (never per input row), so eval-mode is fine here —
  * CodegenFallback by design, outside any hot codegen span.
  * Returns array<double>; null elements for an empty sketch.
  */
case class KllQuantiles(child: Expression, qs: Seq[Double])
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
    "kll_quantiles: each q must be in (0, 1]")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "kll_quantiles"

  override def nullSafeEval(input: Any): Any = {
    val b = Kll.deserialize(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(Kll.quantileValues(b, qs))
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

object Kll {

  private val Shrink = 2.0 / 3.0

  def empty(k: Int): KllBuffer =
    new KllBuffer(k, 0L, false,
      mutable.ArrayBuffer(new KllLevel(new Array[Double](8), 0)), k)

  /** KLL geometric capacity: k at the top level, shrinking by 2/3
    * per level of depth below it, floored at 2.
    */
  private def capacity(k: Int, numLevels: Int, level: Int): Int = {
    val depth = numLevels - 1 - level
    math.max(2, math.ceil(k * math.pow(Shrink, depth)).toInt)
  }

  def insert(b: KllBuffer, x: Double): Unit = {
    b.levels(0).append(x)
    b.n += 1
    if (b.levels(0).size >= b.cap0) compress(b)
  }

  /** One upward pass: compact every over-capacity level. A
    * compaction empties its level (bar one odd leftover) into the
    * level above, so a single pass restores every capacity; the
    * pass also covers a top level created mid-pass.
    */
  private def compress(b: KllBuffer): Unit = {
    var l = 0
    while (l < b.levels.size) {
      if (b.levels(l).size >= capacity(b.k, b.levels.size, l))
        compactLevel(b, l)
      l += 1
    }
    b.cap0 = capacity(b.k, b.levels.size, 0)
  }

  /** Sort the level, promote every other item (alternating survivor
    * offset per compaction — the deterministic coin), keep an odd
    * last item in place. Total weight is conserved exactly.
    */
  private def compactLevel(b: KllBuffer, l: Int): Unit = {
    val lev = b.levels(l)
    java.util.Arrays.sort(lev.a, 0, lev.size)
    if (l + 1 == b.levels.size)
      b.levels += new KllLevel(new Array[Double](8), 0)
    val up = b.levels(l + 1)
    val even = lev.size - (lev.size & 1)
    val offset = if (b.coin) 1 else 0
    b.coin = !b.coin
    var i = offset
    while (i < even) { up.append(lev.a(i)); i += 2 }
    if ((lev.size & 1) == 1) {
      lev.a(0) = lev.a(lev.size - 1)
      lev.size = 1
    } else lev.size = 0
  }

  def merge(b: KllBuffer, o: KllBuffer): KllBuffer = {
    while (b.levels.size < o.levels.size)
      b.levels += new KllLevel(new Array[Double](8), 0)
    var l = 0
    while (l < o.levels.size) { b.levels(l).appendAll(o.levels(l)); l += 1 }
    b.n += o.n
    b.coin ^= o.coin
    compress(b)
    b
  }

  /** All stored (value, weight) pairs sorted by value. */
  private def weighted(b: KllBuffer): (Array[Double], Array[Long]) = {
    var total = 0
    b.levels.foreach(total += _.size)
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    var idx = 0
    var l = 0
    while (l < b.levels.size) {
      val lev = b.levels(l)
      val w = 1L << l
      var i = 0
      while (i < lev.size) { vs(idx) = lev.a(i); ws(idx) = w; idx += 1; i += 1 }
      l += 1
    }
    // indirect sort by value, carrying weights
    val order = Array.range(0, total).sortBy(i => vs(i))
    (order.map(i => vs(i)), order.map(i => ws(i)))
  }

  /** Estimated value at 1-based rank ceil(q·n) for each q (the
    * discretePercentiles rank rule); null when the sketch is empty.
    */
  def quantileValues(b: KllBuffer, qs: Seq[Double]): Array[Any] = {
    if (b.n == 0L) return qs.map(_ => null: Any).toArray
    val (vs, ws) = weighted(b)
    qs.map { q =>
      val rank = math.max(1L, math.ceil(q * b.n).toLong)
      var cum = 0L
      var i = 0
      var out = vs(vs.length - 1)
      var found = false
      while (i < vs.length && !found) {
        cum += ws(i)
        if (cum >= rank) { out = vs(i); found = true }
        i += 1
      }
      out: Any
    }.toArray
  }

  def serialize(b: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeLong(b.n)
    out.writeBoolean(b.coin)
    out.writeInt(b.levels.size)
    b.levels.foreach { lev =>
      out.writeInt(lev.size)
      var i = 0
      while (i < lev.size) { out.writeDouble(lev.a(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = in.readInt()
    val n = in.readLong()
    val coin = in.readBoolean()
    val numLevels = in.readInt()
    val levels = mutable.ArrayBuffer.empty[KllLevel]
    var l = 0
    while (l < numLevels) {
      val size = in.readInt()
      val a = new Array[Double](math.max(8, size))
      var i = 0
      while (i < size) { a(i) = in.readDouble(); i += 1 }
      levels += new KllLevel(a, size)
      l += 1
    }
    new KllBuffer(k, n, coin, levels, capacity(k, numLevels, 0))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: KLL sketch aggregate of a double column. */
  def kllSketch(value: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketch(ColumnBridge.expression(value), k).toAggregateExpression())

  /** Column API: merge stored sketch binaries (same k). */
  def kllMerge(sketch: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllMerge(ColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Column API: rank-select quantile estimates from a sketch. */
  def kllQuantiles(sketch: Column, qs: Seq[Double]): Column =
    ColumnBridge.column(
      KllQuantiles(ColumnBridge.expression(sketch), qs))
}
