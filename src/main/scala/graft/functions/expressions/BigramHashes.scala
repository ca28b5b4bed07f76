package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-token-pair hash stream for bigram language-model scoring: for each
  * adjacent token pair (w1, w2) emits `struct(hb, h1)` where
  * `hb = xxhash64(w1, w2)` and `h1 = xxhash64(w1)` (seed 42, multi-child
  * chaining — bit-identical to the built-in `xxhash64` column function on
  * the same arguments). Fuses the composed
  * `transform(sequence(...), i -> struct(xxhash64(...), xxhash64(...)))`
  * form, whose lambda interprets per element — the dominant cost of the
  * LM-score scan. Null tokens are skipped exactly like the built-in's
  * null children (the running hash passes through unchanged), so parity
  * holds for arrays containing nulls too. Documents with fewer than 2
  * tokens yield an empty array. */
case class BigramHashes(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_hashes expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("hb", LongType, nullable = false),
      StructField("h1", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - 1)
    // xxhash64 semantics: a null child leaves the running hash unchanged,
    // so h1 of a null token is the bare seed and hb of (w1, null) is h1.
    var prevH =
      if (arr.isNullAt(0)) 42L
      else XXH64.hashUTF8String(arr.getUTF8String(0), 42L)
    var i = 1
    while (i < len) {
      val curNull = arr.isNullAt(i)
      val hb =
        if (curNull) prevH
        else XXH64.hashUTF8String(arr.getUTF8String(i), prevH)
      out(i - 1) = InternalRow(hb, prevH)
      prevH =
        if (curNull) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  // Semi-codegen: instead of CodegenFallback's row-based eval (which
  // forces per-row INPUT_ROW materialization inside whole-stage codegen),
  // generate a direct call to nullSafeEval on the already-computed child
  // value — the surrounding operator stays fully codegen'd and the loop
  // runs in this one JIT-compiled method.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_bigram_hashes"
}
