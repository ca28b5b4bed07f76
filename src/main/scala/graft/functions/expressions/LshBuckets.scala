package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multi-table sign-LSH bucket keys for a float vector: `tables`
  * independent hash tables of `planesPerTable` hyperplanes each; returns
  * array<bigint> with one packed sign-bucket per table (array index =
  * table id, ready for posexplode + equi-join).
  *
  * Hyperplane weight (p, d) is derived arithmetically per term —
  * `pmod(xxhash64(p*7919+d), 1e5)/1e5 - 0.5`, identical to
  * [[graft.functions.VectorOps.lshBucket]]'s expression form — so the
  * operator is stateless, thread-safe and deterministic across engines,
  * sessions and cluster sizes.
  *
  * Why an expression and not composed columns: tables × planes × dim
  * (e.g. 16×4×64 = 4096) arithmetic terms as a Catalyst expression tree
  * exceeds codegen method limits and falls back to interpretation —
  * measured 63 s for 500×16 buckets at sf0.1; this loop does it in
  * milliseconds. */
case class LshBuckets(child: Expression, tables: Int, planesPerTable: Int)
    extends UnaryExpression {

  require(tables > 0 && planesPerTable > 0 && planesPerTable <= 63)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets expects array<float>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @inline private def weight(p: Int, d: Int): Double = {
    val h = XXH64.hashInt(p * 7919 + d, 42L)
    val m = ((h % 100000L) + 100000L) % 100000L
    m.toDouble / 100000.0 - 0.5
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bkt = 0L
      var j = 0
      while (j < planesPerTable) {
        val p = t * planesPerTable + j
        var dot = 0.0
        var d = 0
        while (d < n) {
          dot += arr.getFloat(d).toDouble * weight(p, d)
          d += 1
        }
        if (dot > 0) bkt |= (1L << j)
        j += 1
      }
      out(t) = bkt
      t += 1
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

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_buckets"
}
