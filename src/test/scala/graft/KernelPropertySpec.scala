package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Kll, SetOps, VectorOps}

/** Randomized property checks over the PURE kernels — seeded
  * `scala.util.Random` loops (deterministic, offline-safe) asserting
  * each kernel against an independent naive reference on thousands of
  * generated inputs. These run JVM-only (no Spark session), so they
  * cover input regions the DataFrame specs never construct:
  * subnormals, adversarial magnitudes, degenerate arrays.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("sortedIntersectCount equals Set intersection on random sorted arrays") {
    val r = rng(0xC0FFEE)
    (1 to 2000).foreach { _ =>
      val a = Array.fill(r.nextInt(40))(r.nextInt(30).toLong).distinct.sorted
      val b = Array.fill(r.nextInt(40))(r.nextInt(30).toLong).distinct.sorted
      val got = SetOps.sortedIntersectCount(
        new GenericArrayData(a), new GenericArrayData(b))
      val want = a.toSet.intersect(b.toSet).size
      assert(got == want, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("kll is EXACT below capacity for any insert/merge partitioning") {
    val r = rng(0xBEEF)
    (1 to 300).foreach { _ =>
      val k = 50 + r.nextInt(150)
      val n = 1 + r.nextInt(k - 1) // strictly sub-capacity
      val xs = Array.fill(n)(r.nextDouble() * 1000 - 500)
      // random partitioning into 1..4 buffers, then merges
      val nb = 1 + r.nextInt(4)
      val bufs = Array.fill(nb)(Kll.empty(k))
      xs.foreach(x => Kll.insert(bufs(r.nextInt(nb)), x))
      val merged = bufs.reduce(Kll.merge)
      val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
      val got = Kll.quantileValues(merged, qs)
      val sorted = xs.sorted
      qs.zipWithIndex.foreach { case (q, i) =>
        val rank = math.max(1L, math.ceil(q * n).toLong).toInt
        assert(got(i) == sorted(rank - 1),
          s"q=$q n=$n k=$k got=${got(i)} want=${sorted(rank - 1)}")
      }
      assert(merged.n == n)
    }
  }

  test("kll weight conservation holds through compaction at any size") {
    val r = rng(0x5EED)
    (1 to 50).foreach { _ =>
      val k = 20 + r.nextInt(40)
      val n = k * (2 + r.nextInt(20)) // force compactions
      val b = Kll.empty(k)
      (1 to n).foreach(_ => Kll.insert(b, r.nextDouble()))
      assert(b.n == n)
      // total stored weight = sum over levels of size * 2^level == n
      val w = b.levels.zipWithIndex.map { case (lev, l) =>
        lev.size.toLong << l
      }.sum
      assert(w == n, s"weight $w != n $n (k=$k)")
    }
  }

  test("srp buckets are deterministic and in range for random vectors") {
    val r = rng(0xABCD)
    (1 to 500).foreach { _ =>
      val planes = 1 + r.nextInt(16)
      val v = new GenericArrayData(Array.fill(8 + r.nextInt(56))(
        (r.nextFloat() - 0.5f) * 10f))
      val b1 = VectorOps.srpBucket(v, planes, 42L)
      val b2 = VectorOps.srpBucket(v, planes, 42L)
      assert(b1 == b2 && b1 >= 0 && b1 < (1 << planes))
    }
  }

  test("nearestCentroids returns the naive top-nprobe under the nanCmp order") {
    val r = rng(0xFACE)
    (1 to 300).foreach { _ =>
      val d = 4 + r.nextInt(12)
      val nc = 2 + r.nextInt(10)
      val nprobe = 1 + r.nextInt(nc)
      val cents = Array.fill(nc)(Array.fill(d)((r.nextFloat() - 0.5f) * 4f))
      val ids = Array.tabulate(nc)(i => (i * 7 + 3).toLong) // non-trivial ids
      val norms = cents.map(c => c.map(x => x.toDouble * x).sum)
      val v = Array.fill(d)((r.nextFloat() - 0.5f) * 4f)
      val got = VectorOps.nearestCentroids(
        new GenericArrayData(v), ids, cents, norms, nprobe)
      val gotIds = (0 until got.numElements()).map(got.getLong)
      // naive reference: cosine per centroid with the same fold order,
      // sorted by (cos desc via nanCmp, id asc)
      val va = new GenericArrayData(v)
      val cos = (0 until nc).map { c =>
        val na = VectorOps.selfNorm(va)
        val nb = norms(c)
        val x = if (na == 0.0 || nb == 0.0) 0.0
          else VectorOps.dotVA(va, cents(c)) / (math.sqrt(na) * math.sqrt(nb))
        (ids(c), x)
      }
      val want = cos.sortWith { case ((ida, ca), (idb, cb)) =>
        val cmp = VectorOps.nanCmp(ca, cb)
        if (cmp != 0) cmp > 0 else ida < idb
      }.take(nprobe).map(_._1)
      assert(gotIds == want, s"got=$gotIds want=$want cos=$cos")
    }
  }

  test("pq projection residual is orthogonal and never longer than the vector") {
    val r = rng(0xD00D)
    (1 to 300).foreach { _ =>
      val d = 8
      val nc = 4
      val cents = Array.fill(nc)(Array.fill(d)((r.nextFloat() - 0.5f) * 4f))
      val ids = Array.tabulate(nc)(_.toLong)
      val norms = cents.map(c => c.map(x => x.toDouble * x).sum)
      val v = Array.fill(d)((r.nextFloat() - 0.5f) * 4f)
      val va = new GenericArrayData(v)
      val cid = VectorOps.nearestCentroids(va, ids, cents, norms, 1).getLong(0)
      val alpha = VectorOps.projCoeff(va, cid, ids, cents, norms)
      val c = cents(cid.toInt)
      val rvec = Array.tabulate(d)(i => v(i).toDouble - alpha * c(i).toDouble)
      val dotRC = rvec.zip(c).map { case (x, y) => x * y.toDouble }.sum
      val n2v = v.map(x => x.toDouble * x).sum
      val n2r = rvec.map(x => x * x).sum
      // Gram-Schmidt: r ⊥ c (up to float noise), |r|² ≤ |v|²
      assert(math.abs(dotRC) < 1e-4 * math.sqrt(norms(cid.toInt)) + 1e-9,
        s"residual not orthogonal: $dotRC")
      assert(n2r <= n2v + 1e-9, s"|r|²=$n2r > |v|²=$n2v")
      // codes deterministic and in range
      val cb = Array.fill(4)(Array.fill(16)(Array.fill(2)(
        (r.nextFloat() - 0.5f) * 2f)))
      val codes1 = VectorOps.pqEncode(va, cid, ids, cents, norms, cb)
      val codes2 = VectorOps.pqEncode(va, cid, ids, cents, norms, cb)
      (0 until 4).foreach { j =>
        assert(codes1.getInt(j) == codes2.getInt(j))
        assert(codes1.getInt(j) >= 0 && codes1.getInt(j) < 16)
      }
    }
  }

  test("benford normalization lands on the true first significant digit") {
    // replicate the DataFrame chain's IEEE op sequence in plain scala
    // (same literals, same order) and check against an exact
    // BigDecimal reference for magnitudes across the whole double
    // range — incl. subnormals and beyond-long values, the two
    // regions the old integer-substring form got wrong
    val pows = Seq(256, 128, 64, 32, 16, 8, 4, 2, 1)
    def chainDigit(x: Double): Int = {
      var v = x
      pows.foreach { p =>
        if (v < s"1e${1 - p}".toDouble) v *= s"1e$p".toDouble
      }
      pows.foreach { p =>
        if (v >= s"1e$p".toDouble) v /= s"1e$p".toDouble
      }
      v.toLong.toString.charAt(0) - '0'
    }
    def trueDigit(x: Double): Int =
      new java.math.BigDecimal(x).unscaledValue.toString
        .dropWhile(_ == '-').head - '0'
    val r = rng(0x1D16)
    (1 to 5000).foreach { _ =>
      // mantissa away from digit boundaries (the chain's ±few-ulp
      // rounding makes exact-boundary values legitimately ambiguous)
      val mant = 1.001 + r.nextDouble() * 8.997
      val e = r.nextInt(600) - 300
      val x = mant * math.pow(10, e)
      if (x > 0 && !x.isInfinite) {
        assert(chainDigit(x) == trueDigit(x),
          f"x=$x%.17g chain=${chainDigit(x)} true=${trueDigit(x)}")
      }
    }
    // pinned edge cases
    assert(chainDigit(4.9e-324) == trueDigit(4.9e-324)) // subnormal
    assert(chainDigit(9.3e18) == 9) // beyond long range
    assert(chainDigit(1.7e308) == 1) // near max double
  }
}
