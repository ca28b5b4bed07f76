package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `n` nearest coarse-quantizer cells of a float vector — the inner
  * loop of IVF indexing (q60): cell assignment is `n = 1`, query probing
  * is `n = nprobe`. `centroids` must be a FOLDABLE array<array<float>>
  * (the K×dim model state, baked into the plan as one literal exactly
  * like the composed form baked K separate literals).
  *
  * Replaces the composed
  * `array_sort(array(struct(||c||² − 2⟨v,c⟩, i), …K…))` column: that
  * expression tree carries K·dim literal leaves and K dot-product
  * subtrees, so every Lloyd round (fresh centroid literals) forces Janino
  * to recompile a multi-thousand-node method — measured as the dominant
  * cost of q60 at fixture scale, and it grows with K. This expression is
  * one reference object: the generated code is a single call regardless
  * of K.
  *
  * Parity: distances fold EXACTLY like the composed form — norms are the
  * left-to-right double sum of squares, dots the [[DotProduct]] sequential
  * fold, distance `norm − dot * 2.0`, ordering (distance, cell) ascending
  * — so assignments and probe sets are bit-identical to the composed
  * column (spec-asserted) and q60's output is unchanged.
  */
case class NearestCells(vec: Expression, centroids: Expression, n: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = centroids

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, centroids.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        if (!centroids.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_nearest_cells: centroids must be foldable (a literal)")
        else if (n < 1)
          TypeCheckResult.TypeCheckFailure(
            "graft_nearest_cells: n must be >= 1")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_nearest_cells expects (array<float>, array<array<float>>), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // model state decoded once per plan, not per row
  @transient private lazy val cents: Array[Array[Float]] = {
    val ad = centroids.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toFloatArray())
  }
  @transient private lazy val norms: Array[Double] =
    cents.map(c => c.map(x => x.toDouble * x.toDouble).sum)

  override def nullSafeEval(v: Any, cIgnored: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val k = cents.length
    val keep = math.min(n, k)
    // top-`keep` (distance, cell) by insertion — k is the (small) model
    // size, keep <= k. Ordering must MATCH the composed array_sort
    // column exactly, including NaN (Spark doubles order NaN greater
    // than everything): compare via java.lang.Double.compare — the same
    // total order Spark uses — and fill the first `keep` slots
    // unconditionally so NaN distances still yield distinct cells, ties
    // breaking to the lower cell index (equal keys never displace an
    // earlier-inserted lower index).
    val bestD = new Array[Double](keep)
    val bestI = new Array[Int](keep)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cents(i)
      val m = math.min(a.numElements(), c.length)
      var dot = 0.0
      var j = 0
      while (j < m) {
        dot += a.getFloat(j).toDouble * c(j).toDouble
        j += 1
      }
      val d = norms(i) - dot * 2.0
      if (filled < keep) {
        var p = filled
        while (p > 0 && java.lang.Double.compare(bestD(p - 1), d) > 0) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = d; bestI(p) = i
        filled += 1
      } else if (java.lang.Double.compare(d, bestD(keep - 1)) < 0) {
        var p = keep - 1
        while (p > 0 && java.lang.Double.compare(bestD(p - 1), d) > 0) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = d; bestI(p) = i
      }
      i += 1
    }
    new GenericArrayData(bestI)
  }

  // Semi-codegen (library idiom): one call on the computed child values;
  // the surrounding operator stays inside whole-stage codegen and the
  // generated method size is independent of K.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.nullSafeEval($v, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(vec = newLeft, centroids = newRight)

  override def prettyName: String = "graft_nearest_cells"
}
