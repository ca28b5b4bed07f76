package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization of a string — the
  * first step of text canonicalization in a pretraining corpus: visually
  * identical strings with different codepoint sequences (`e` + combining
  * acute vs precomposed `é`, compatibility singletons like OHM SIGN vs
  * GREEK OMEGA) must hash, dedup, and shingle identically, so every
  * text-keyed pass runs on NFC-normalized bytes.
  *
  * Spark has no built-in Unicode-normalization function; this wraps the
  * JDK's `java.text.Normalizer` (Unicode-standard NFC, the same
  * normalization DuckDB exposes as `nfc_normalize` — cross-engine parity
  * is what makes the q77 oracle exact). Fast path: `isNormalized` is a
  * cheap scan that avoids allocating for already-NFC text, which is the
  * overwhelming majority of real corpora — ASCII is NFC by construction.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) v
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  // Semi-codegen (same idiom as the other graft expressions): call the
  // evaluator on the computed child value so the surrounding operator
  // stays inside whole-stage codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}
