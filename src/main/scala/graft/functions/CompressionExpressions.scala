package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** GZIP decompression of a binary column as ONE codegen'd expression —
  * the scan-time decode for corpora stored with per-document gzip
  * payloads (a common at-rest layout: text compresses ~4×, and unlike
  * file-level codecs a per-row payload survives row-group splitting and
  * shuffling intact).
  *
  * Degrade contract like the media codecs: corrupt/truncated/non-gzip
  * bytes → null, never a throw. `maxBytes` caps the inflated size
  * (decompression-bomb guard — a 42 KB crafted payload can inflate to
  * GBs); a payload exceeding the cap returns null rather than an
  * arbitrary truncation, so the caller can count and quarantine them. */
case class GunzipBytes(child: Expression, maxBytes: Int) extends UnaryExpression {

  require(maxBytes >= 1, "GunzipBytes: maxBytes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.sql}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gunzip"

  /** Called from both interpreted eval and generated code. */
  def gunzip(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        // clamp before +1: maxBytes = Int.MaxValue must mean "no cap",
        // not an Int overflow that nulls every row
        val probe = math.min(maxBytes, Int.MaxValue - 1) + 1
        val out = in.readNBytes(probe)
        // a further successful read means the payload exceeds the cap
        if (out.length > maxBytes) null else out
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }

  override protected def nullSafeEval(bytes: Any): Any =
    gunzip(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gunzip", this, classOf[GunzipBytes].getName)
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = $ref.gunzip($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GunzipBytes =
    copy(child = newChild)
}

object CompressionFunctions {

  /** Inflated bytes of a gzip payload; null on corrupt input or when the
    * result would exceed `maxBytes` (bomb guard). */
  def gunzip(content: Column, maxBytes: Int = 1 << 26): Column =
    ColumnBridge.column(GunzipBytes(ColumnBridge.expression(content), maxBytes))

  /** Gzip payload → text (the compressed-text-column decode). The
    * binary→string CAST, not `decode(..., "UTF-8")`: Spark 4's decode
    * THROWS on malformed byte sequences (MALFORMED_CHARACTER_CODING) —
    * one latin-1 document would kill the scan — while the cast wraps the
    * bytes as Spark's native unvalidated UTF8String, the same semantics
    * every parquet string column already has (invalid sequences carry
    * through byte-preserved; nothing throws). */
  def gunzipText(content: Column, maxBytes: Int = 1 << 26): Column =
    gunzip(content, maxBytes).cast("string")
}
