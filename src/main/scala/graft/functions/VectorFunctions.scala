package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernels shared by interpreted eval and generated code.
  * Generated Java calls these through the static forwarders on the
  * companion class (JIT inlines them), so the expressions stay inside
  * whole-stage codegen with a tight primitive loop — no boxing, no
  * Scala closures, no UDF serialization.
  */
object VectorOps {

  /** Cosine similarity of two float vectors, accumulated in double.
    * Zero-norm or length-mismatched inputs yield 0.0 (callers filter
    * on the score, so a "no signal" zero beats a null-propagation
    * special case).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product of two float vectors, accumulated in double — the
    * pair-loop half of `cosine`. When norms are precomputed once per
    * vector (`selfNorm`), pair similarity costs one accumulation
    * stream instead of three; `dot/(sqrt(na)*sqrt(nb))` is
    * bit-identical to `cosine` because each sum runs over the same
    * elements in the same order.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var i = 0
    while (i < n) {
      d += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    d
  }

  /** ADC (asymmetric-distance) dot: sum over subquantizers of the
    * probe's precomputed table entry for the candidate's code —
    * `Σ_j tables[j][codes[j]]` in one allocation-free loop (the HOF
    * zip_with+aggregate formulation allocates an intermediate array
    * per PAIR, and pairs are the N²-shaped frame in IVF-PQ).
    * Fixed iteration order keeps the double sum deterministic.
    */
  def adcDot(codes: ArrayData, tables: ArrayData): Double = {
    val m = math.min(codes.numElements(), tables.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      s += tables.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    s
  }

  /** Sum of squares of a float vector, accumulated in double. */
  def selfNorm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    s
  }

  /** Dot of an ArrayData vector against a plain float[] (the
    * broadcast-centroid side of `nearestCentroids`). Same element
    * order and double accumulation as `dot`, so the cosines built
    * from it are bit-identical to the DotProduct column formulation.
    */
  def dotVA(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var d = 0.0
    var i = 0
    while (i < n) {
      d += a.getFloat(i).toDouble * b(i).toDouble
      i += 1
    }
    d
  }

  /** Top-`nprobe` centroid ids for a vector, nearest-first — the IVF
    * coarse-quantizer assignment as ONE codegen'd pass over the
    * (small, plan-embedded) centroid arrays. Replaces the
    * crossJoin(N×nlist) + row_number window formulation: the 64×
    * intermediate never exists, each row emits its nprobe list ids
    * directly. Ordering matches `ORDER BY cos DESC, cid ASC`
    * bit-for-bit: cosine = dotVA/(sqrt(na)*sqrt(nb)) with the same
    * sequential folds, ties broken by ascending centroid id via the
    * bounded insertion sort (the `annBruteForce` kernel shape), and
    * NaN cosines ranked first per `nanCmp` — the same order Spark's
    * sort gives them.
    */
  /** Spark's DoubleType sort order (`Utils.nanSafeCompareDoubles`):
    * NaN compares larger than everything incl. +Inf, NaN == NaN,
    * and -0.0 == 0.0. The insertion sorts below must use this — a
    * plain `<` would sink NaN cosines to the tail while a Spark
    * `ORDER BY cos DESC` ranks them first.
    */
  @inline def nanCmp(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1 else -1
  }

  def nearestCentroids(v: ArrayData, centIds: Array[Long],
                       centVecs: Array[Array[Float]],
                       centNorms: Array[Double], nprobe: Int): ArrayData = {
    val na = selfNorm(v)
    val topIds = new Array[Long](nprobe)
    val topCos = new Array[Double](nprobe)
    var filled = 0
    var c = 0
    while (c < centIds.length) {
      val cid = centIds(c)
      val nb = centNorms(c)
      val cos =
        if (na == 0.0 || nb == 0.0) 0.0
        else dotVA(v, centVecs(c)) / (math.sqrt(na) * math.sqrt(nb))
      var pos = filled
      while (pos > 0 && {
        val cmp = nanCmp(topCos(pos - 1), cos)
        cmp < 0 || (cmp == 0 && topIds(pos - 1) > cid)
      }) pos -= 1
      if (pos < nprobe) {
        val last = math.min(filled, nprobe - 1)
        var m = last
        while (m > pos) {
          topIds(m) = topIds(m - 1); topCos(m) = topCos(m - 1); m -= 1
        }
        topIds(pos) = cid; topCos(pos) = cos
        if (filled < nprobe) filled += 1
      }
      c += 1
    }
    val out = new Array[Long](filled)
    System.arraycopy(topIds, 0, out, 0, filled)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Index of the nearest centroid by squared Euclidean distance —
    * the Lloyd assignment step as one codegen'd pass over the
    * (k-bounded, plan-embedded) centroid matrix. Centroids are
    * DOUBLE: the k-means update produces them from exact decimal
    * sums, and keeping full precision here is what lets the DuckDB
    * oracle replay the assignment bit-for-bit ((x − c)² accumulated
    * left-to-right, floats widened exactly). Ties keep the LOWEST
    * cluster index (strict `<` while scanning ascending), matching
    * `ORDER BY dist ASC, cluster ASC`; a NaN distance never beats
    * the +Inf seed, so an all-NaN row lands in cluster 0 — though
    * the update aggregate rejects non-finite components anyway.
    */
  def nearestCentroidIdx(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      // a truncated distance loop would silently assign from a
      // PARTIAL distance when a vector's dimension differs from the
      // centroids' (kmeansAssign / iters=0 paths have no aggregate
      // upstream to catch ragged dims) — fail loudly instead
      val n = cv.length
      require(v.numElements() == n,
        s"kmeans assign: vector dim ${v.numElements()} != centroid dim $n")
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = v.getFloat(i).toDouble - cv(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  /** Signed-random-projection bucket id: `planes` Rademacher (+/-1)
    * hyperplanes with weights derived from a splitmix64-style mix of
    * (seed, plane, dim) — deterministic on every executor, no
    * broadcast weight matrix needed. Returns an int in
    * [0, 2^planes). Cosine-similar vectors collide with high
    * probability (SRP-LSH), so an equi-join on the bucket id replaces
    * the all-pairs cross join.
    */
  def srpBucket(v: ArrayData, planes: Int, seed: Long): Int = {
    val d = v.numElements()
    var bucket = 0
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        var z = seed + (p.toLong << 32) + i.toLong
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
        z = z ^ (z >>> 33)
        val w = if ((z & 1L) == 0L) 1.0 else -1.0
        acc += w * v.getFloat(i)
        i += 1
      }
      if (acc >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Projection coefficient onto a coarse centroid:
    * `α = dot(v, c) / |c|²` (0 for a zero centroid) — the
    * Gram-Schmidt scale that makes the PQ residual `v − αc`
    * ORTHOGONAL to the centroid, so `|r|² = |v|² − α²|c|² ≤ |v|²`
    * unconditionally. Classic IVF-PQ subtracts the unscaled
    * centroid, which only shrinks residuals when centroids are
    * k-means MEANS under L2; this engine's coarse quantizer is
    * cosine over sampled vectors, where `v − c` can be LARGER than
    * `v` (measured: raw-slice codes beat unscaled residuals here).
    * The projection form restores the variance-concentration
    * guarantee for any centroid magnitude, at the cost of one stored
    * double per member and a per-pair fused multiply in the score:
    * `dot(q, v) = α·dot(q, c) + dot(q, r)` exactly.
    */
  def projCoeff(v: ArrayData, cid: Long, centIds: Array[Long],
                centVecs: Array[Array[Float]],
                centNorms: Array[Double]): Double = {
    var ci = 0
    while (ci < centIds.length && centIds(ci) != cid) ci += 1
    require(ci < centIds.length, s"proj coeff: unknown coarse centroid id $cid")
    val nb = centNorms(ci)
    if (nb == 0.0) 0.0 else dotVA(v, centVecs(ci)) / nb
  }

  /** PQ projection-residual encoding: the m codeword indices of
    * `v − αc` where `c` is the vector's coarse centroid (looked up
    * by id in the plan-embedded quantizer) and `α` the [[projCoeff]]
    * scale — IVF-PQ encodes residuals, not raw slices (Jégou et al.
    * 2011 §III: residuals concentrate sub-vector variance around
    * the origin, so the same m/ksub budget quantizes far finer; the
    * projection scale adapts that to a cosine coarse quantizer).
    * One pass: the residual lives in registers
    * dimension-by-dimension (double-precision subtract, matching the
    * driver-side training fold exactly), each sub-block scans its
    * ksub codebook by squared L2 with ties to the lowest index.
    */
  def pqEncode(v: ArrayData, cid: Long, centIds: Array[Long],
               centVecs: Array[Array[Float]],
               centNorms: Array[Double],
               codebooks: Array[Array[Array[Float]]]): ArrayData = {
    var ci = 0
    while (ci < centIds.length && centIds(ci) != cid) ci += 1
    require(ci < centIds.length, s"pq encode: unknown coarse centroid id $cid")
    val cv = centVecs(ci)
    val d = v.numElements()
    require(d == cv.length,
      s"pq encode: vector dim $d != centroid dim ${cv.length}")
    val nb = centNorms(ci)
    val alpha = if (nb == 0.0) 0.0 else dotVA(v, cv) / nb
    val m = codebooks.length
    val dsub = d / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val off = j * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          // float-rounded like the driver-side training residuals,
          // so a training vector encodes exactly as it trained
          val r = (v.getFloat(off + i).toDouble
            - alpha * cv(off + i).toDouble).toFloat.toDouble
          val diff = r - w(i).toDouble
          acc += diff * diff
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** Per-probe coarse-correction dots: `dot(v, centroid[cid])` for
    * each probed list id, aligned with the `cids` array — the
    * first-order term of the residual ADC score
    * `dot(q, v) ≈ dot(q, c) + Σ_j tables[j][codes[j]]`. The nlist
    * id scan and the nprobe dots are both parameter-bounded; same
    * accumulation order as `dotVA`, so adding the exact stored norms
    * reproduces the [[cosine]] denominator bit-for-bit.
    */
  def centroidDots(v: ArrayData, cids: ArrayData, centIds: Array[Long],
                   centVecs: Array[Array[Float]]): ArrayData = {
    val n = cids.numElements()
    val out = new Array[Double](n)
    var p = 0
    while (p < n) {
      val cid = cids.getLong(p)
      var ci = 0
      while (ci < centIds.length && centIds(ci) != cid) ci += 1
      require(ci < centIds.length,
        s"centroid dots: unknown coarse centroid id $cid")
      out(p) = dotVA(v, centVecs(ci))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `cosine_sim(a, b)`: codegen'd cosine similarity over
  * `array<float>` embedding columns. The scalar kernel of the
  * dedup-embedding and ANN operators (SURVEY.md §2 #31-33).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `srp_bucket(v)`: signed-random-projection LSH bucket id for an
  * `array<float>` embedding (the shuffle key of the bucketed ANN
  * path — join on this instead of cross-joining the corpus).
  */
case class SrpBucket(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {
  require(planes > 0 && planes <= 30, "planes must be in [1,30]")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_bucket"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.srpBucket(v.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorOps.srpBucket($v, $planes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

/** `nearest_centroids(v)`: top-`nprobe` centroid ids for an
  * `array<float>` vector, nearest-first by (cosine desc, cid asc).
  * The centroid arrays ride the expression itself (a reference
  * object in the generated class — the coarse quantizer is bounded
  * at `nlist` rows by construction, so plan-embedding it is the
  * broadcast), which turns IVF list assignment into a single
  * codegen'd projection instead of a crossJoin + window.
  */
case class NearestCentroids(child: Expression, centIds: Array[Long],
                            centVecs: Array[Array[Float]],
                            centNorms: Array[Double], nprobe: Int)
    extends UnaryExpression {
  require(nprobe > 0, "nprobe must be positive")
  require(centIds.length == centVecs.length && centIds.length == centNorms.length,
    "centroid arrays must align")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.nearestCentroids(v.asInstanceOf[ArrayData], centIds, centVecs,
      centNorms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
    val vecs = ctx.addReferenceObj("centVecs", centVecs, "float[][]")
    val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorOps.nearestCentroids($v, $ids, $vecs, $norms, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** `nearest_centroid_idx(v)`: Lloyd assignment — index of the
  * nearest centroid by squared Euclidean distance over a
  * plan-embedded double[][] centroid matrix (k rows, driver-bounded
  * by construction: it IS the model). Ties keep the lowest index.
  */
case class NearestCentroidIndex(child: Expression,
                                cents: Array[Array[Double]])
    extends UnaryExpression {
  require(cents.nonEmpty, "at least one centroid required")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_idx"

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.nearestCentroidIdx(v.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorOps.nearestCentroidIdx($v, $cs)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidIndex =
    copy(child = newChild)
}

/** `dot_product(a, b)`: codegen'd double dot product over
  * `array<float>` columns — pair with precomputed `self_norm` columns
  * so N² similarity loops do one accumulation stream, not three.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `adc_dot(codes, tables)`: codegen'd PQ asymmetric-distance dot —
  * `Σ_j tables[j][codes[j]]` over (`array<int>`, `array<array<double>>`)
  * with no per-row allocation (see [[VectorOps.adcDot]]).
  */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_dot"

  override protected def nullSafeEval(c: Any, t: Any): Any =
    VectorOps.adcDot(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.VectorOps.adcDot($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)
}

/** `pq_encode(v, cid)`: codegen'd IVF-PQ projection-residual encoder
  * — the m codeword indices of `v − αc` over plan-embedded coarse
  * quantizer + codebooks (see [[VectorOps.pqEncode]]).
  */
case class PqEncode(left: Expression, right: Expression,
                    centIds: Array[Long], centVecs: Array[Array[Float]],
                    centNorms: Array[Double],
                    codebooks: Array[Array[Array[Float]]])
    extends BinaryExpression {
  require(centIds.length == centVecs.length && centIds.length == centNorms.length,
    "centroid arrays must align")
  require(codebooks.nonEmpty, "at least one subquantizer required")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any, cid: Any): Any =
    VectorOps.pqEncode(v.asInstanceOf[ArrayData], cid.asInstanceOf[Long],
      centIds, centVecs, centNorms, codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
    val vecs = ctx.addReferenceObj("centVecs", centVecs, "float[][]")
    val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, (v, cid) =>
      s"graft.functions.VectorOps.pqEncode($v, $cid, $ids, $vecs, $norms, $cbs)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `proj_coeff(v, cid)`: codegen'd Gram-Schmidt projection scale of a
  * vector onto its coarse centroid (see [[VectorOps.projCoeff]]).
  */
case class ProjCoeff(left: Expression, right: Expression,
                     centIds: Array[Long], centVecs: Array[Array[Float]],
                     centNorms: Array[Double])
    extends BinaryExpression {
  require(centIds.length == centVecs.length && centIds.length == centNorms.length,
    "centroid arrays must align")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "proj_coeff"

  override protected def nullSafeEval(v: Any, cid: Any): Any =
    VectorOps.projCoeff(v.asInstanceOf[ArrayData], cid.asInstanceOf[Long],
      centIds, centVecs, centNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
    val vecs = ctx.addReferenceObj("centVecs", centVecs, "float[][]")
    val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    defineCodeGen(ctx, ev, (v, cid) =>
      s"graft.functions.VectorOps.projCoeff($v, $cid, $ids, $vecs, $norms)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ProjCoeff =
    copy(left = newLeft, right = newRight)
}

/** `centroid_dots(v, cids)`: codegen'd per-probe coarse-correction
  * dots for residual ADC scoring (see [[VectorOps.centroidDots]]).
  */
case class CentroidDots(left: Expression, right: Expression,
                        centIds: Array[Long], centVecs: Array[Array[Float]])
    extends BinaryExpression {
  require(centIds.length == centVecs.length, "centroid arrays must align")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_dots"

  override protected def nullSafeEval(v: Any, cids: Any): Any =
    VectorOps.centroidDots(v.asInstanceOf[ArrayData],
      cids.asInstanceOf[ArrayData], centIds, centVecs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
    val vecs = ctx.addReferenceObj("centVecs", centVecs, "float[][]")
    defineCodeGen(ctx, ev, (v, cids) =>
      s"graft.functions.VectorOps.centroidDots($v, $cids, $ids, $vecs)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidDots =
    copy(left = newLeft, right = newRight)
}

/** `self_norm(a)`: codegen'd sum of squares of an `array<float>`. */
case class SelfNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "self_norm"

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.selfNorm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.selfNorm($a)")

  override protected def withNewChildInternal(newChild: Expression): SelfNorm =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for the vector expressions. */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      CosineSimilarity(org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      DotProduct(org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  def adcDot(codes: Column, tables: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      AdcDot(org.apache.spark.sql.graftbridge.ColumnBridge.expression(codes),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(tables)))

  def selfNorm(a: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SelfNorm(org.apache.spark.sql.graftbridge.ColumnBridge.expression(a)))

  def srpBucket(v: Column, planes: Int = 6, seed: Long = 42L): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SrpBucket(org.apache.spark.sql.graftbridge.ColumnBridge.expression(v), planes, seed))

  def nearestCentroids(v: Column, centIds: Array[Long],
                       centVecs: Array[Array[Float]],
                       centNorms: Array[Double], nprobe: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NearestCentroids(org.apache.spark.sql.graftbridge.ColumnBridge.expression(v),
        centIds, centVecs, centNorms, nprobe))

  def pqEncode(v: Column, cid: Column, centIds: Array[Long],
               centVecs: Array[Array[Float]], centNorms: Array[Double],
               codebooks: Array[Array[Array[Float]]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      PqEncode(org.apache.spark.sql.graftbridge.ColumnBridge.expression(v),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(cid),
        centIds, centVecs, centNorms, codebooks))

  def projCoeff(v: Column, cid: Column, centIds: Array[Long],
                centVecs: Array[Array[Float]],
                centNorms: Array[Double]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ProjCoeff(org.apache.spark.sql.graftbridge.ColumnBridge.expression(v),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(cid),
        centIds, centVecs, centNorms))

  def centroidDots(v: Column, cids: Column, centIds: Array[Long],
                   centVecs: Array[Array[Float]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      CentroidDots(org.apache.spark.sql.graftbridge.ColumnBridge.expression(v),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(cids),
        centIds, centVecs))

  def nearestCentroidIdx(v: Column, cents: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NearestCentroidIndex(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v), cents))

  /** Exact per-dimension quantized sum of an `array<float>` column
    * (see [[QuantizedVectorSum]]) — the k-means centroid update.
    */
  def quantizedVectorSum(v: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      QuantizedVectorSum(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v))
        .toAggregateExpression())

  /** One-pass exact moment/Gramian aggregate over an `array<float>`
    * column (see [[EmbeddingGramian]]) — the distributed input of
    * covariance and PCA.
    */
  def gramian(v: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      EmbeddingGramian(org.apache.spark.sql.graftbridge.ColumnBridge.expression(v))
        .toAggregateExpression())
}
