package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(h)`: codegen'd membership probe against a
  * driver-built [[org.apache.spark.util.sketch.BloomFilter]]. The
  * filter ships to executors as its serialized byte image (part of
  * this expression) and is deserialized once per task via the lazy
  * val / codegen reference object — the per-row cost is the two
  * xxhash probes of `mightContainLong`, inside whole-stage codegen.
  *
  * No false negatives, tunable false-positive rate: a guaranteed-
  * superset PREFILTER. Anything exact must re-verify the survivors
  * (see `Dedup.decontaminateBloom`) — the pattern Spark itself uses
  * for runtime row-group filtering.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column form of [[BloomMightContainLong]]; serializes `bloom`
    * once at plan-build time.
    */
  def mightContainLong(h: Column, bloom: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(h), bos.toByteArray))
  }
}
