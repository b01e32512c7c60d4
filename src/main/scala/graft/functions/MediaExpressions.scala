package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.MediaSniff

/** Header-only media sniff ([[MediaSniff]]) as ONE codegen'd expression:
  * binary payload → struct(format, width, height, bit_depth, channels,
  * sample_rate, n_frames), null fields where the format doesn't carry
  * them, all-null struct fields (format included) for unrecognized bytes.
  *
  * An expression rather than a `mapPartitions` stage because sniffing is
  * exactly the kind of per-row scalar work that belongs inside
  * whole-stage codegen: the surrounding filter/agg ("count by format",
  * "drop images under 64px") fuses with the sniff into one generated
  * loop, with no encoder round-trip on the (large) payload column — the
  * bytes stay where the scan put them and only the tiny struct escapes.
  */
case class SniffMedia(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("bit_depth", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_media_sniff"

  /** Called from both interpreted eval and generated code. */
  def sniffRow(bytes: Array[Byte]): InternalRow = {
    val s = MediaSniff.sniff(bytes)
    def opt(v: Int): Any = if (v < 0) null else Integer.valueOf(v)
    new GenericInternalRow(Array[Any](
      if (s.format == null) null else UTF8String.fromString(s.format),
      opt(s.width), opt(s.height), opt(s.bitDepth),
      opt(s.channels), opt(s.sampleRate), opt(s.nFrames)))
  }

  override protected def nullSafeEval(bytes: Any): Any =
    sniffRow(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sniff", this, classOf[SniffMedia].getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $ref.sniffRow($b);")
  }

  override protected def withNewChildInternal(newChild: Expression): SniffMedia =
    copy(child = newChild)
}

object MediaExpressionFunctions {

  /** Sniffed header struct of a media payload; see [[SniffMedia]]. */
  def mediaSniff(content: Column): Column =
    ColumnBridge.column(SniffMedia(ColumnBridge.expression(content)))
}
