package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, each shingle emitted
  * as its xxhash64 (seed 42) — i.e. the fused form of
  * `transform(array_distinct(<n-gram shingles>), s -> xxhash64(s))`.
  * Hash values equal `xxhash64(concat_ws(' ', tok_i..tok_{i+n-1}))`;
  * documents shorter than n tokens yield the single hash of the whole
  * space-joined token list (mirroring the composed-column form and the
  * DuckDB oracle's CASE arm).
  *
  * Why an expression: the composed form runs three interpreted
  * higher-order lambdas per document (n-gram transform with a concat_ws
  * inside, array_distinct, hash transform) — the dominant cost of the
  * near-dup pipelines' scan stage. This does one pass per document:
  * slide a window over the tokens, concat, hash, dedup via a hash set,
  * preserving first-occurrence order (deterministic output).
  */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1 && n <= 16, "shingle width must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_shingles expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(1, len))
    val seen = new java.util.HashSet[java.lang.Long]()
    if (len < n) {
      out += XXH64.hashUTF8String(UTF8String.concatWs(space, toks: _*), 42L)
    } else {
      var s = 0
      while (s <= len - n) {
        val gram = UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(toks, s, s + n): _*)
        val h = XXH64.hashUTF8String(gram, 42L)
        if (seen.add(h)) out += h
        s += 1
      }
    }
    new GenericArrayData(out.toArray)
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

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_hashed_shingles"
}
