package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd count of common elements between two SORTED long arrays —
  * a two-pointer primitive merge, `|a ∩ b|` without materializing the
  * intersection.
  *
  * Semantically identical to `size(array_intersect(a, b))` when both
  * inputs are duplicate-free ascending arrays (the adjacency-list shape
  * q157 produces with `sort_array(collect_list(...))` over distinct
  * edges). The built-in walks a per-row hash set and allocates the
  * intersection array just to take its size; on q157's closure pass the
  * inputs are ~10⁵–10⁶ edge rows × O(√m) longs each — Σ outdeg² element
  * visits — so the per-element cost IS the query. The two-pointer loop
  * visits each element once with no allocation and no boxing, and stays
  * inside whole-stage codegen.
  *
  * Callers must guarantee sortedness; on unsorted input the count is
  * simply wrong (like any merge intersect), so the function is exposed
  * for the library's own adjacency frames, not as a general substitute
  * for `array_intersect`.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // containsNull inputs are REJECTED (see SortedIntersect): getLong()
    // on a null slot reads garbage and the function is SQL-registered.
    case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_sorted_intersect_count expects two array<bigint> arguments " +
        s"with non-nullable elements, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_count"
}
