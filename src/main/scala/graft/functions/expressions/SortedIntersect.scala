package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd intersection of two SORTED long arrays — the
  * array-returning sibling of [[SortedIntersectCount]], for the callers
  * that need the common ELEMENTS (q168 credits each triangle's third
  * vertex individually), not just their count.
  *
  * Semantically identical to `array_intersect(a, b)` when both inputs
  * are duplicate-free ascending arrays (the adjacency-list shape q157/
  * q168 produce with `sort_array(collect_list(...))` over distinct
  * edges); output stays ascending. The built-in walks a per-row hash
  * set; the two-pointer merge visits each element once, allocates only
  * the result (sized by a first counting pass — two cheap scans beat
  * one scan plus a growable builder at these O(√m) lengths), and stays
  * inside whole-stage codegen.
  *
  * Callers must guarantee sortedness; on unsorted input the result is
  * simply wrong (like any merge intersect), so the function is exposed
  * for the library's own adjacency frames, not as a general substitute
  * for `array_intersect`.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // containsNull inputs are REJECTED, not tolerated: getLong() on a null
    // slot reads garbage, and the function is SQL-registered so arbitrary
    // arrays can reach it — the no-nulls contract is enforced like the
    // sortedness contract is documented.
    case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_sorted_intersect expects two array<bigint> arguments with " +
        s"non-nullable elements, got ${l.sql} (containsNull left/right), and ${r.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    val out = new Array[Long](c)
    i = 0; j = 0; c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { out(c) = xv; c += 1; i += 1; j += 1 }
    }
    new GenericArrayData(out)
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
      val out = ctx.freshName("out")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |long[] $out = new long[$c];
         |$i = 0; $j = 0; $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $out[$c] = $xv; $c++; $i++; $j++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect"
}
