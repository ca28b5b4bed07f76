package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Multiplicity statistics of an `array<long>` in one pass:
  * `struct(n, n_distinct, top_count)` — element count, distinct count,
  * and the highest multiplicity of any single value. Null elements are
  * skipped (the arrays this serves — hashed bigrams/shingles — never
  * contain nulls).
  *
  * Why an expression: these are ROW-LOCAL properties, but the composed
  * formulation (explode → groupBy(id, value) → groupBy(id)) pays two full
  * shuffles of the exploded table to compute them — at corpus scale that
  * shuffle is the whole job. This keeps the repetition-gate scan map-only:
  * one small hash map per row, no exploded rows, no exchange anywhere
  * except the final output sort. (`size`/`array_distinct` cover n and
  * n_distinct as built-ins, but top_count — the max multiplicity — has no
  * built-in short of the O(n·distinct) interpreted HOF reduce.) */
case class ArrayStats(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_array_stats expects array<long>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val counts = new java.util.HashMap[Long, Long](Math.max(4, len * 2))
    var n = 0L
    var top = 0L
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        n += 1
        val c = counts.merge(arr.getLong(i), 1L, (a, b) => a + b)
        if (c > top) top = c
      }
      i += 1
    }
    InternalRow(n, counts.size().toLong, top)
  }

  // Semi-codegen: instead of CodegenFallback's row-based eval (which
  // forces per-row INPUT_ROW materialization inside whole-stage codegen),
  // generate a direct call to nullSafeEval on the already-computed child
  // value — the surrounding operator stays fully codegen'd and the loop
  // runs in this one JIT-compiled method.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayStats =
    copy(child = newChild)

  override def prettyName: String = "graft_array_stats"
}
