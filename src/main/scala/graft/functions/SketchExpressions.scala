package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd expression.
  *
  * The filter is held as a reference object (like
  * [[NearestCentroids]]' quantizer): the plan stays O(1) in the filter's
  * bit size, the task binary carries the filter once per executor, and the
  * probe is one compiled virtual call per row inside whole-stage codegen —
  * exactly how Spark's own injected runtime bloom joins probe
  * (`BloomFilterMightContain`), but available as a user-facing operator.
  *
  * Accepts string (probed as UTF-8 bytes) or long children. Null → null.
  */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or bigint, got ${t.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  /** Called from both interpreted eval and generated code. */
  def probe(v: Any): Boolean = v match {
    case s: UTF8String => bf.mightContainBinary(s.getBytes)
    case l: Long => bf.mightContainLong(l)
  }

  override protected def nullSafeEval(v: Any): Any = probe(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    child.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, v =>
          s"${ev.value} = $ref.bf().mightContainBinary($v.getBytes());")
      case _ =>
        nullSafeCodeGen(ctx, ev, v =>
          s"${ev.value} = $ref.bf().mightContainLong($v);")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object SketchFunctions {

  /** `true` iff `col` might be in `bf` (no false negatives; false-positive
    * rate set at filter build). Use as a broadcast-cheap prefilter whose
    * survivors are confirmed by an exact join — semantics stay exact while
    * the post-filter stream shrinks to true matches + fpp of the input. */
  def bloomMightContain(c: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bf))
}
