package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway triage: run one entry-map query at a given SF dir and
  * show rows. Usage: runMain graft.tools.QuickCheck <name> <dir> [n]
  */
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val n = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-quickcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val rows = df.collect()
      println(s"rows=${rows.length}")
      rows.take(n).foreach(println)
    } finally spark.stop()
  }
}
