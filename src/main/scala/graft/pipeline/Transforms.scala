package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Config-driven transformation algebra.
  *
  * Same capability surface as the reference's transformation queue
  * (ingest-framework/framework/src/sparkbuilder/transformations/
  * common_transformations.py, sql_transformation.py,
  * python_transformation.py, and builder/engine.py:36-46), but as a
  * typed ADT folded over a DataFrame: every step is a `Column`/SQL
  * expression so the *whole* chain stays one Catalyst plan —
  * filters still push to the scan no matter how many steps precede
  * them in config order.
  */
sealed trait Transform {
  def apply(df: DataFrame): DataFrame
}

/** SQL-predicate filter (reference `where`). */
final case class Where(condition: String) extends Transform {
  def apply(df: DataFrame): DataFrame = df.where(condition)
}

/** Projection (reference `select`). */
final case class Select(cols: Seq[String]) extends Transform {
  def apply(df: DataFrame): DataFrame = df.select(cols.map(col): _*)
}

/** Column removal (reference `drop`). */
final case class Drop(cols: Seq[String]) extends Transform {
  def apply(df: DataFrame): DataFrame = df.drop(cols: _*)
}

/** Ordered rename (reference `rename`; order matters for chained renames). */
final case class Rename(mapping: Seq[(String, String)]) extends Transform {
  def apply(df: DataFrame): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
}

/** Type casts (reference engine.py `datatype_conversion` / `cast_column`). */
final case class Cast(mapping: Seq[(String, String)]) extends Transform {
  def apply(df: DataFrame): DataFrame =
    mapping.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }
}

/** Rename + cast in one config row (reference `rename_and_cast_columns`). */
final case class RenameAndCast(specs: Seq[(String, String, String)]) extends Transform {
  def apply(df: DataFrame): DataFrame =
    specs.foldLeft(df) { case (d, (from, to, tpe)) =>
      d.withColumn(from, col(from).cast(tpe)).withColumnRenamed(from, to)
    }
}

/** Computed column from a SQL expression (reference `pyspark_function`,
  * generalized: any expression rather than one whitelisted F.* call).
  */
final case class WithColumnExpr(name: String, sqlExpr: String) extends Transform {
  def apply(df: DataFrame): DataFrame = df.withColumn(name, expr(sqlExpr))
}

/** Snake-case / identifier-safe column names (reference `normalize_cols`). */
case object NormalizeCols extends Transform {
  def apply(df: DataFrame): DataFrame = {
    val renamed = df.columns.map { c =>
      c.trim.replaceAll("\\s+", "_").replaceAll("[^A-Za-z0-9_]", "")
    }
    df.toDF(renamed.toIndexedSeq: _*)
  }
}

/** Lower-case all column names (reference `column_names_to_lower`). */
case object LowercaseCols extends Transform {
  def apply(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)
}

/** Templated SQL over the running DataFrame (reference `sql`
  * transformation: registers the frame as `{{table_view}}` and runs
  * arbitrary SQL against it).
  */
final case class SqlTransform(sql: String, substitutions: Map[String, String] = Map.empty)
    extends Transform {
  def apply(df: DataFrame): DataFrame = {
    val view = s"graft_sql_view_${SqlTransform.viewCounter.incrementAndGet()}"
    df.createOrReplaceTempView(view)
    val rendered = substitutions.foldLeft(sql.replace("{{table_view}}", view)) {
      case (s, (k, v)) => s.replace(s"{{$k}}", v)
    }
    df.sparkSession.sql(rendered)
  }
}

object SqlTransform {
  /** Monotonic view names — identityHashCode could collide across
    * frames (or recur after GC) and silently rebind a view mid-plan.
    */
  private[pipeline] val viewCounter = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** Escape hatch: arbitrary DataFrame function (reference `py`
  * transformation dispatching to a registered function).
  */
final case class FnTransform(fn: DataFrame => DataFrame) extends Transform {
  def apply(df: DataFrame): DataFrame = fn(df)
}

/** Changed-row diff against a reference snapshot (reference
  * `brute_force_subtract`, brute_force_comparison.py:3-25). Returns
  * rows of `df` that are new or differ from `snapshot` on any
  * non-key column, plus rows deleted from the snapshot — i.e. the
  * minimal change set a merge would need to apply. One shuffle on
  * the keys; column comparison is null-safe (`<=>`).
  */
final case class BruteForceDiff(snapshot: DataFrame, keys: Seq[String]) extends Transform {
  def apply(df: DataFrame): DataFrame = BruteForceDiff.diff(df, snapshot, keys)
}

/** Image resize planning as a config pipeline step
  * ([[graft.multimodal.Multimodal.resizePlan]]): aspect-preserving
  * fit into `maxW`×`maxH`, one codegen'd projection over the typed
  * asset metadata. Stateless, so the SAME config step runs batch or
  * streaming (`StreamingIngest.runConfig`). JSON: `{"type":
  * "resize_plan", "max_width": N, "max_height": N}`.
  */
final case class ResizePlan(maxW: Int, maxH: Int) extends Transform {
  def apply(df: DataFrame): DataFrame =
    graft.multimodal.Multimodal.resizePlan(df, maxW, maxH)
}

/** Audio resample planning as a config pipeline step
  * ([[graft.multimodal.Multimodal.resamplePlan]]): exact int64
  * sample-count math toward `targetRate`, never upsampling.
  * Stateless, batch or streaming. JSON: `{"type": "resample_plan",
  * "target_rate": N}`.
  */
final case class ResamplePlan(targetRate: Int) extends Transform {
  def apply(df: DataFrame): DataFrame =
    graft.multimodal.Multimodal.resamplePlan(df, targetRate)
}

object BruteForceDiff {
  import org.apache.spark.sql.functions._

  /** Full change set between `source` (new data) and `snapshot`
    * (current target): `diff_type` ∈ insert | update | delete.
    * Source columns win for insert/update rows; key columns are
    * coalesced so delete rows keep their identity.
    */
  def diff(source: DataFrame, snapshot: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = source.columns.filterNot(keys.contains)
    val snap = valueCols.foldLeft(snapshot) { (d, c) => d.withColumnRenamed(c, s"_snap_$c") }
      .withColumn("_snap_present", lit(1))
    val src = source.withColumn("_src_present", lit(1))
    val joined = src.join(snap, keys, "full_outer")
    val changed = valueCols
      .map(c => !(col(c) <=> col(s"_snap_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("diff_type",
        when(col("_snap_present").isNull, "insert")
          .when(col("_src_present").isNull, "delete")
          .when(changed, "update"))
      .filter(col("diff_type").isNotNull)
      .select(keys.map(col) ++ valueCols.map(col) :+ col("diff_type"): _*)
  }
}
