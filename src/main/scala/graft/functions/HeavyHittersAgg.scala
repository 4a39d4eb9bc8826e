package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable state of [[HeavyHitters]]: at most `k` counters (stored
  * in OFFSET form — the logical Misra-Gries counter of `item` is
  * `counts(item) - delta`, see the update loop), the shared
  * decrement offset, an exact-or-lower bound on the smallest stored
  * value (purge trigger), and the total item count. Keys are
  * UTF8String (content-hashed, cloned at insert) so the dominant
  * miss path probes without a per-occurrence UTF-16 decode.
  */
final class HeavyHittersBuffer(val k: Int, var n: Long, var delta: Long,
                               var minStored: Long,
                               val counts: mutable.HashMap[UTF8String, Long])

/** Misra-Gries heavy-hitters sketch over an `array<string>` column —
  * the bounded-memory companion to the exact vocabulary top-K, for
  * item spaces too large to shuffle (word n-grams over a 100 TB
  * corpus have cardinality on the order of the corpus itself;
  * boilerplate detection needs only the few thousand frequent ones).
  *
  * Classic Misra-Gries per partition (k counters: hit → increment,
  * miss with spare capacity → insert, miss at capacity → decrement
  * all, drop zeros — the decrement-all implemented as a shared
  * OFFSET bump, so the dominant miss path is O(1) amortized instead
  * of O(k); counters are algebraically identical) plus the
  * mergeable-summaries combine (Agarwal et
  * al., PODS 2012): sum two summaries, and if more than k items
  * remain, subtract the (k+1)-th largest count from all and keep the
  * positive ones. The combined guarantee is the sketch's defining
  * contract, independent of partitioning and merge order:
  *
  *   est(x) ≤ true(x)  and  true(x) − est(x) ≤ n/(k+1)
  *
  * so every item with true frequency above n/(k+1) is present. The
  * EXACT estimates do depend on merge order (decrements interleave
  * differently), which is why the query entry is rows-only: the
  * guarantee is spec-proven against exact counts instead of
  * oracle-hashed.
  *
  * Scale shape: each partition folds into one ≤k-entry map; only
  * those maps cross the wire. No shuffle of the item space, ever —
  * the property the exact top-K (one (item) shuffle of per-partition
  * partial counts) cannot offer once items stop fitting a shuffle.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 1, "k must be positive")

  // AbstractDataType is private[sql] in Spark 4 — covariant override
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHitters.schema
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): HeavyHittersBuffer =
    new HeavyHittersBuffer(k, 0L, 0L, Long.MaxValue, mutable.HashMap.empty)

  /** Remove entries whose logical count is zero (stored ≤ delta) and
    * recompute the exact minimum stored value. O(k), but triggered
    * only when `delta` crosses `minStored` — each scan removes at
    * least one entry (or tightens a stale bound after a
    * hit-on-the-minimum), so the cost amortizes against the inserts
    * that refill the map.
    */
  private def purge(b: HeavyHittersBuffer): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    var mn = Long.MaxValue
    b.counts.foreach { case (key, c) =>
      if (c <= b.delta) dead += key else if (c < mn) mn = c
    }
    dead.foreach(b.counts.remove)
    b.minStored = mn
  }

  override def update(b: HeavyHittersBuffer,
                      input: InternalRow): HeavyHittersBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        // probe with the buffer-backed UTF8String (content equals/
        // hashCode) — no decode, no copy on the dominant miss path;
        // clone() only when the item actually enters the map
        val item = arr.getUTF8String(i)
        b.n += 1
        b.counts.get(item) match {
          case Some(c) => b.counts(item) = c + 1
          case None if b.counts.size < b.k =>
            b.counts(item.clone()) = b.delta + 1
            if (b.delta + 1 < b.minStored) b.minStored = b.delta + 1
          case None =>
            // miss at capacity: the classic decrement-all becomes a
            // shared-offset bump — O(1) instead of O(k), which IS
            // the hot path on a near-unique item stream (a corpus'
            // shingle space). Entries the bump kills (stored ≤
            // delta) are purged the moment they appear.
            b.delta += 1
            if (b.minStored <= b.delta) purge(b)
        }
      }
      i += 1
    }
    b
  }

  /** Logical (offset-resolved) counts of the live entries. */
  private def logical(b: HeavyHittersBuffer): Iterator[(UTF8String, Long)] =
    b.counts.iterator.collect {
      case (key, c) if c > b.delta => (key, c - b.delta)
    }

  override def merge(b: HeavyHittersBuffer,
                     o: HeavyHittersBuffer): HeavyHittersBuffer = {
    // normalize b to logical form first: merge math runs on true
    // Misra-Gries counters, not offset-form stored values
    if (b.delta != 0L) {
      val flat = logical(b).toArray
      b.counts.clear()
      flat.foreach { case (key, c) => b.counts(key) = c }
      b.delta = 0L
    }
    logical(o).foreach { case (item, c) =>
      b.counts(item) = b.counts.getOrElse(item, 0L) + c
    }
    b.n += o.n
    if (b.counts.size > b.k) {
      // mergeable-summaries prune: subtract the (k+1)-th largest
      // count from everything, keep the strictly positive
      val sorted = b.counts.values.toArray
      java.util.Arrays.sort(sorted)
      val sub = sorted(sorted.length - (b.k + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b.counts.foreach { case (key, c) =>
        if (c - sub <= 0L) dead += key else b.counts(key) = c - sub
      }
      dead.foreach(b.counts.remove)
    }
    b.minStored = if (b.counts.isEmpty) Long.MaxValue else b.counts.values.min
    b
  }

  override def eval(b: HeavyHittersBuffer): Any = {
    // deterministic presentation: count desc, item asc (UTF8String
    // binary order — Spark SQL's own string ordering)
    val items = logical(b).toArray.sortWith { (a, x) =>
      a._2 > x._2 || (a._2 == x._2 && a._1.compareTo(x._1) < 0)
    }
    val rows: Array[Any] = items.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    }
    new GenericInternalRow(Array[Any](b.n, new GenericArrayData(rows)))
  }

  override def serialize(b: HeavyHittersBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val flat = logical(b).toArray
    out.writeLong(b.n)
    out.writeInt(flat.length)
    flat.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val counts = mutable.HashMap.empty[UTF8String, Long]
    var mn = Long.MaxValue
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val c = in.readLong()
      counts(UTF8String.fromBytes(buf)) = c
      if (c < mn) mn = c
      i += 1
    }
    new HeavyHittersBuffer(k, n, 0L, mn, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

object HeavyHitters {

  val schema: StructType = StructType(Seq(
    StructField("n_items", LongType, nullable = false),
    StructField("hitters", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  /** Column API: Misra-Gries summary of an `array<string>` column. */
  def heavyHitters(items: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      HeavyHitters(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(items), k)
        .toAggregateExpression())
}
