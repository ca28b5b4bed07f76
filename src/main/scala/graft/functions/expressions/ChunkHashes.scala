package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Non-overlapping `width`-token chunk hashes of a token array: element j
  * is the chained xxhash64 of tokens `[j·w, min((j+1)·w, n))` — seed 42,
  * null tokens skipped, bit-identical to the built-in
  * `xxhash64(t_{jw}, …, t_{jw+w-1})` on the same slice. The engine of the
  * cross-document span-dedup scan (q68): the composed
  * `transform(sequence(...), j -> concat_ws(slice(...)))` form pays an
  * interpreted lambda per chunk AND shuffles variable-length chunk
  * strings; this emits fixed-width longs in one pass, so the
  * first-occurrence window shuffles 8 bytes per chunk instead of the
  * chunk text. Empty arrays yield an empty result. */
case class ChunkHashes(child: Expression, width: Int)
    extends UnaryExpression {

  require(width > 0 && width <= 4096, "width must be in [1, 4096]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_chunk_hashes expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nChunks = (n + width - 1) / width
    val out = new Array[Any](nChunks)
    var j = 0
    while (j < nChunks) {
      var h = 42L
      var i = j * width
      val end = math.min(n, i + width)
      while (i < end) {
        if (!arr.isNullAt(i)) h = XXH64.hashUTF8String(arr.getUTF8String(i), h)
        i += 1
      }
      out(j) = h
      j += 1
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

  override protected def withNewChildInternal(newChild: Expression): ChunkHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_chunk_hashes"
}
