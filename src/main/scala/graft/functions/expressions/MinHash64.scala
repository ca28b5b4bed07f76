package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over a token/shingle array: `numHashes` independent
  * 64-bit hash functions, element i of the result is
  * `min over tokens t of xxhash64(i, t)` — bit-identical to Spark's
  * `min(xxhash64(lit(i), col(t)))` aggregate formulation on null-free
  * arrays (seed 42, the int literal folded into the running hash first,
  * exactly like the built-in `XxHash64` expression evaluates its
  * children in order). Null elements are SKIPPED here, whereas the
  * aggregate form would fold a null token to the bare per-seed state
  * `xxhash64(i)` and let that constant join the min — shingle pipelines
  * never produce null elements, so the difference is unobservable in
  * practice, but the parity claim is scoped to null-free input.
  *
  * Why an expression and not 64 aggregate columns: the aggregate form
  * pushes every (doc, shingle) row through 64 separate hash+min agg
  * codepaths — 64 hash evaluations and agg-buffer updates per exploded
  * row, dominated by per-expression dispatch. This loop hashes each
  * token 64 times in one tight JVM pass per *document* row (no explode,
  * no shuffle for the signature stage at all), then the only shuffle
  * left in MinHash-LSH is the band-bucket equi-join. At 100 TB that
  * turns the signature stage from the bottleneck into a map-only scan.
  *
  * Empty arrays yield Long.MaxValue minima (deterministic; such docs
  * collide only with other empty docs).
  */
case class MinHash64(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 1024, "numHashes must be in [1, 1024]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash64 expects array<string> or array<long>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // seed_i = state of xxhash64 after folding in the int literal i:
  // identical to XxHash64(Seq(lit(i), s)) evaluating its first child.
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  @transient private lazy val longInput: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val minima = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        if (longInput) {
          // pre-hashed element (e.g. graft_hashed_shingles output):
          // re-mix per seed with hashLong — an equally valid independent
          // MinHash family, no string bytes in the loop at all
          val t = arr.getLong(i)
          var j = 0
          while (j < numHashes) {
            val h = XXH64.hashLong(t, seeds(j))
            if (h < minima(j)) minima(j) = h
            j += 1
          }
        } else {
          val t = arr.getUTF8String(i)
          var j = 0
          while (j < numHashes) {
            val h = XXH64.hashUTF8String(t, seeds(j))
            if (h < minima(j)) minima(j) = h
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(minima)
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

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash64"
}
