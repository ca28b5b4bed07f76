package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token array: bit j of the signature is the sign
  * of the ±1 vote sum of each token's bit j.
  *
  * The per-token hash is the first 8 bytes of md5(token) read big-endian
  * — i.e. exactly `CAST('0x' || substr(md5(t), 1, 16) AS UBIGINT)` in
  * DuckDB — because simhash signatures are cross-engine-compared by the
  * oracle (q34), and md5-prefix is the one hash both engines share
  * (ARCHITECTURE.md determinism contract: never xxhash64 across engines).
  *
  * Replaces the equivalent higher-order-function formulation
  * (`aggregate(tokens, zip_with(... getbit(h, j) ...)))`), which Spark
  * interprets lambda-by-lambda — tokens × 64 interpreted steps per row.
  * This expression does the same arithmetic in one tight loop per row
  * (the loop body is plain JVM code, no expression interpreter in the
  * inner loop).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val md = SimHash64.digest.get()
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val dig = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (dig(k) & 0xFFL); k += 1 }
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  // Semi-codegen: instead of CodegenFallback's row-based eval (which
  // forces per-row INPUT_ROW materialization inside whole-stage codegen),
  // generate a direct call to nullSafeEval on the already-computed child
  // value — the surrounding operator stays fully codegen'd and the loop
  // runs in this one JIT-compiled method.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash64 {
  // MessageDigest is stateful; the expression instance is shared across
  // tasks via the codegen references array, so the digest must be
  // per-thread.
  private[expressions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
