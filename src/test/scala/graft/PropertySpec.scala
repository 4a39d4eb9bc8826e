package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Randomized invariants (fixed seed — reproducible) for the
  * operators whose correctness is arithmetic, not data-dependent:
  * randomized inputs catch the edge cases fixtures miss (empty
  * overlap, size==overlap+1, single-word docs, all-duplicate
  * corpora).
  */
class PropertySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def randDoc(r: Random): String =
    Seq.fill(1 + r.nextInt(60))(
      Iterator.fill(1 + r.nextInt(8))(('a' + r.nextInt(26)).toChar).mkString)
      .mkString(" ")

  test("chunking always reconstructs the document exactly") {
    val r = new Random(42)
    (1 to 25).foreach { _ =>
      val size = 20 + r.nextInt(100)
      val overlap = r.nextInt(size min 20)
      val texts = Seq.fill(5)(randDoc(r))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = TextAnalysis.chunk(df, "doc_id", "text", size, overlap)
        .collect().groupBy(_.getLong(0))
      texts.zipWithIndex.foreach { case (t, i) =>
        val cs = chunks(i.toLong).sortBy(_.getLong(1))
        val rebuilt = cs.zipWithIndex.map { case (row, j) =>
          if (j == 0) row.getString(3) else row.getString(3).drop(overlap)
        }.mkString
        assert(rebuilt == t, s"size=$size overlap=$overlap len=${t.length}")
        cs.init.foreach(row => assert(row.getLong(4) == size.toLong,
          s"non-final chunk must be full-size (size=$size overlap=$overlap)"))
      }
    }
  }

  test("exact dedup partitions ids: groups count every copy, keeper is min id") {
    val r = new Random(7)
    (1 to 10).foreach { _ =>
      val texts = Seq.fill(30)(s"document variant number ${r.nextInt(6)}")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.exact(df, "doc_id", "text").collect()
      assert(out.map(_.getLong(2)).sum == texts.length)
      assert(out.length == texts.distinct.length)
      out.foreach { row =>
        val keep = row.getLong(1)
        val ids = texts.zipWithIndex.collect {
          case (t, i) if t == texts(keep.toInt) => i.toLong }
        assert(keep == ids.min, "keeper must be the min id of its text group")
      }
    }
  }

  test("approx percentiles honor the Greenwald-Khanna rank-error bound") {
    // percentile_approx(col, q, accuracy) contracts that the returned
    // value's RANK in the sorted group is within n/accuracy of the
    // target rank ceil(q*n) — the sketch's actual guarantee, stronger
    // and better-defined than a value-relative tolerance (which a
    // heavy-tailed column can violate while the sketch is in
    // contract). Pin it against the exact operator's data so a silent
    // sketch regression can't hide behind the rows-only driver check.
    val approx = SparkEntry.queries("q11_approx_percentiles")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val rows = Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    val byFlag = rows.groupBy(_.getString(0))
    val accuracy = 10000.0 // must match q11ApproxPercentiles' literal
    byFlag.foreach { case (flag, rs) =>
      val qty = rs.map(_.getDouble(1)).sorted
      val price = rs.map(_.getDouble(2)).sorted
      val n = rs.length
      val rankErr = math.max(1.0, n / accuracy) // floor of 1 for ties
      def check(sorted: Array[Double], q: Double, got: Double,
                label: String): Unit = {
        // rank range of `got` among the sorted values (ties span)
        val lo = sorted.indexWhere(_ >= got) + 1         // first rank ≥ got
        val hi = sorted.lastIndexWhere(_ <= got) + 1     // last rank ≤ got
        assert(lo >= 1 && hi >= 1, s"$label: $got outside data range")
        val target = math.ceil(q * n)
        val dist =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0.0
        assert(dist <= rankErr,
          s"$flag $label: value $got at ranks [$lo,$hi], target $target, " +
            s"rank error $dist > bound $rankErr (n=$n)")
      }
      check(qty, 0.5, approx(flag)(0), "median_qty")
      check(qty, 0.95, approx(flag)(1), "p95_qty")
      check(price, 0.5, approx(flag)(2), "median_price")
      check(price, 0.95, approx(flag)(3), "p95_price")
    }
  }

  test("stats-pruned point reads find every value across adversarial unicode") {
    // regression hardening for the round-7 UTF-8 stat-order fix:
    // whatever ends up in a file's string min/max, a point read for a
    // value the file CONTAINS must never be stats-pruned. The pool
    // mixes the order-sensitive ranges: ASCII, Latin-1, U+E000..U+FFFF
    // (sorts above surrogates in UTF-16, below supplementary in
    // UTF-8), and supplementary characters.
    val r = new Random(7)
    val pool: IndexedSeq[String] = IndexedSeq(
      "", "a", "zz", "~tilde", "é", "ÿ", "éÿ", "",
      "�", "￿", "😀", "😀zz",
      "ab😀", "𐀀", "mixed😁")
    val fmt = graft.pipeline.DeltaLogTableFormat
    (1 to 3).foreach { trial =>
      val p = java.nio.file.Files.createTempDirectory("graft_uni").toString
      val rows = (1 to 40).map(i =>
        (i.toLong, pool(r.nextInt(pool.size)), 1))
      fmt.scd1Merge(spark, p, rows.toDF("id", "s", "ord"), Seq("id"), "ord")
      val byValue = rows.groupBy(_._2).view.mapValues(_.size).toMap
      byValue.foreach { case (v, n) =>
        val got = fmt.readEqual(spark, p, "s", v).count()
        assert(got == n,
          s"trial $trial: value ${v.codePoints().toArray.mkString("+")} " +
            s"expected $n rows, got $got")
      }
    }
  }

  test("cross-corpus dedup agrees with exact jaccard on clear-margin corpora") {
    // random corpora of shared-phrase documents; every corpus doc is
    // either a near-copy of some reference doc (one word changed in a
    // long text -> jaccard well above threshold) or fresh random text
    // (shared 5-gram collisions are possible, but thresholded jaccard
    // stays low) — the LSH path must flag exactly the near-copies
    val r = new Random(31)
    (1 to 3).foreach { trial =>
      val refDocs = (1 to 10).map(i => (s"r$i", randDoc(r) + " " + randDoc(r)))
      val corpus = (1 to 15).map { i =>
        if (i % 3 == 0) {
          // near-copy: replace one word of a random reference doc
          val src = refDocs(r.nextInt(refDocs.size))._2.split(" ")
          val idx = r.nextInt(src.length)
          (s"c$i", src.updated(idx, "zzzz").mkString(" "), true)
        } else (s"c$i", randDoc(r) + " " + randDoc(r), false)
      }
      import SparkSpec.spark.implicits._
      val out = graft.operators.Dedup.dedupAgainstStats(
        corpus.map(c => (c._1, c._2)).toDF("doc_id", "text"),
        refDocs.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.5, maxBucket = Int.MaxValue)
        .collect().map(r2 => r2.getString(0) -> r2.getBoolean(3)).toMap
      // exact reference: character-5-gram jaccard against every ref doc
      def shingles(t: String): Set[String] =
        (0 to math.max(t.length - 5, 0)).map(p =>
          t.substring(p, math.min(p + 5, t.length))).toSet
      corpus.foreach { case (id, text, isCopy) =>
        val sh = shingles(text)
        val maxJ = refDocs.map { case (_, rt) =>
          val rs = shingles(rt)
          val inter = sh.intersect(rs).size.toDouble
          inter / (sh.size + rs.size - inter)
        }.max
        if (maxJ >= 0.6)
          assert(out(id), s"trial $trial: $id jaccard $maxJ must flag")
        if (maxJ < 0.4)
          assert(!out(id), s"trial $trial: $id jaccard $maxJ must not flag")
        if (isCopy) assert(out(id), s"trial $trial: near-copy $id must flag")
      }
    }
  }

  test("lloyd iterations never worsen the clustering objective") {
    // Lloyd's invariant: each assignment+update round minimizes the
    // within-cluster sum of squares given the other half, so the
    // objective is non-increasing — up to the 1e-6 centroid
    // quantization. Its FIRST-ORDER effect on the objective is
    // Σ_v Σ_i 2·|v_i − c_i|·ε with ε ≤ 1e-6: for this corpus
    // (120 vectors, D = 8, |v − c| a few units per dim) that bounds
    // around 1e-2 absolute, hence the slack below — NOT the
    // negligible-looking ε² term alone. Random corpus, fixed seed;
    // objective computed exactly on the driver.
    val r = new Random(101)
    val vecs = (1 to 120).map { i =>
      val blob = r.nextInt(4)
      (i.toLong, Array.tabulate(8)(j =>
        (blob * 3.0 + r.nextGaussian() * 0.7 + j * 0.1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val raw = vecs.map(_._2.map(_.toDouble)).toArray
    def obj(cents: Array[Array[Double]]): Double =
      raw.map { v =>
        cents.map { c =>
          v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        }.min
      }.sum
    val objs = (0 to 3).map(it => obj(graft.operators.Similarity
      .kmeansFit(df, "vec_id", "embedding", k = 4, iters = it)))
    objs.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev * (1 + 1e-9) + 1e-2,
        s"objective rose across an iteration: $objs")
    }
    assert(objs.last < objs.head,
      s"three iterations should improve a random 4-blob corpus: $objs")
  }

  test("redaction is idempotent and leaves no matchable pii behind") {
    val r = new Random(13)
    val piis = Seq("a.b@c.io", "555-123-4567", "10.0.0.1", "x@y.org more", "")
    (1 to 10).foreach { _ =>
      val t = s"${randDoc(r)} ${piis(r.nextInt(piis.length))}"
      val df = Seq((1L, t)).toDF("doc_id", "text")
      val a = df.select(TextAnalysis.redact(col("text")).as("r"))
        .collect()(0).getString(0)
      val b = Seq((1L, a)).toDF("doc_id", "text")
        .select(TextAnalysis.redact(col("text")).as("r"))
        .collect()(0).getString(0)
      assert(a == b, "redact must be a fixpoint after one pass")
      val counts = Seq((1L, a)).toDF("doc_id", "text")
        .select(TextAnalysis.piiCounts(col("text")).map(_._2): _*)
        .collect()(0)
      (0 until 3).foreach(i => assert(counts.getLong(i) == 0L,
        s"pattern $i still matches after redaction of: $t"))
    }
  }
}
