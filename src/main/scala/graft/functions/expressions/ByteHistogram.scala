package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** 16-bin coarse byte histogram of a binary column (bin = high nibble,
  * `(b & 0xFF) >> 4`) — the feature-extract stub of the multimodal pack
  * (SURVEY §2.2 "decode / feature-extract / … as batch kernels"): a real
  * codec's feature extractor is a per-blob byte loop with a fixed-width
  * numeric output, and this expression IS that loop shape with a
  * deterministic stand-in kernel. One tight JVM pass per row, no
  * per-byte expression interpretation (the composed
  * explode(sequence)+substring formulation walks the expression
  * interpreter once per BYTE — corpus-byte-count interpreted steps).
  *
  * Output is `array<long>` of exactly 16 counts (zeros included), so
  * Σ counts = blob length and downstream code can index bins
  * positionally. Empty/missing blobs yield all-zero histograms.
  */
case class ByteHistogram(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_byte_histogram expects binary, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xFF) >> 4) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  // Semi-codegen (the SimHash64 pattern): call nullSafeEval on the
  // already-computed child value so the surrounding operator stays
  // fully whole-stage-codegen'd and the byte loop runs JIT-compiled.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)

  override def prettyName: String = "graft_byte_histogram"
}
