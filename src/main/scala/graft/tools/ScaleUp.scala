package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger test corpus from an existing SF dir
  * by unioning `factor` key-shifted copies of every table — the
  * self-run scale probe the round logs call "sf1.0 from sf0.1".
  * Every `*key` / `*_id` column shifts by `copy * 100M` (cast back
  * to its source type; base ids < 10M and 9 * 100M + 10M fits int),
  * so referential integrity holds WITHIN each copy: joins match at
  * the same per-row rate as the source and the fact/dim ratios are
  * preserved. Dim tables (region/nation) scale too — 10 copies of a
  * 25-row dim is still a broadcast dim. Non-key values (text,
  * vectors, timestamps) are duplicated verbatim, which makes the
  * dedup family see a 10x-duplicated corpus — the dup-heavy regime
  * those operators exist for.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor> [offset]
  *
  * `offset` (default 1e8) must exceed every base id and
  * `(factor-1)·offset + maxBaseId` must fit the NARROWEST key
  * column type: region/nation keys are int32, so the factor-100
  * sf10 probe passes 1e7 (max shifted id ≈ 9.9e8 < 2³¹; base ids
  * < 2e5, so copies cannot collide). An overflowing cast fails the
  * job loudly (ANSI CAST_OVERFLOW) rather than wrapping.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleUp <srcDir> <dstDir> <factor> [offset]")
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1 && factor <= 128, "factor must be in [1, 128]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val offset = if (args.length == 4) args(3).toLong else 100000000L
    require(offset >= 1L, "offset must be positive")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val keyCols = df.columns.filter(c => c.endsWith("key") || c.endsWith("_id"))
      // the documented precondition CHECKED against the data, not a
      // constant: an offset at or below a base id makes copy k's
      // shifted range overlap copy k+1's — silently colliding keys,
      // phantom duplicate groups, inflated join rates
      if (keyCols.nonEmpty) {
        val longs = keyCols.map(c => col(c).cast("long")).toIndexedSeq
        val perRowMax = if (longs.size == 1) longs.head else greatest(longs: _*)
        // max() over an empty table is null — report the empty source
        // explicitly instead of letting getLong(0) NPE
        val maxRow = df.select(perRowMax.as("m")).agg(max(col("m"))).head
        require(!maxRow.isNullAt(0),
          s"$t: source table is empty — nothing to scale at $src/$t.parquet")
        val maxBase = maxRow.getLong(0)
        require(offset > maxBase,
          s"$t: offset $offset must exceed every base id (max $maxBase) " +
            "or shifted copies collide")
      }
      val copies = (0 until factor).map { i =>
        keyCols.foldLeft(df) { (d, c) =>
          d.withColumn(c,
            (col(c).cast("long") + lit(i * offset)).cast(df.schema(c).dataType))
        }
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x$factor written")
    }
    spark.stop()
  }
}
