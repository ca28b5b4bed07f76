package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct winnowing fingerprints of a token array — the fused form of
  * q103's scan stage:
  *
  * {{{
  *   grams:  h(pos) = conv(substring(md5(concat_ws(' ',
  *             slice(toks, pos, k))), 1, 8), 16, 10)::long,  pos ∈ 1..ng
  *   winnow: fp(pos) = min(h(pos .. pos+w-1)),               pos ∈ 1..ng-w+1
  *   output: distinct fp, first-occurrence order
  * }}}
  *
  * where ng = len(toks) − k + 1. Documents with fewer than w grams
  * (ng < w — no full window) yield an empty array, mirroring the
  * pipeline's `filter(ng >= w)` pre-gate.
  *
  * Hash semantics are EXACTLY the composed column form's (and the DuckDB
  * oracle's): the fingerprint is the unsigned value of the first 8 hex
  * chars of md5(gram) — i.e. the first 4 digest bytes, big-endian — with
  * grams joined by a single space, null tokens skipped as `concat_ws`
  * does. md5 is the cross-engine hash the determinism contract
  * prescribes (never xxhash64 across engines), so the oracle stays
  * bit-identical.
  *
  * Why an expression: the composed form evaluates five chained string
  * expressions per token POSITION (slice → concat_ws → cast → md5 →
  * conv/substring) after an explode, then pays a per-doc window shuffle
  * for the minima. This computes the whole per-document fingerprint set
  * in one JIT pass — no explode of positions, no window exchange — so
  * the scan stage is embarrassingly parallel and the query's only
  * shuffle is the fingerprint equi-join.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 16, "gram width k must be in [1, 16]")
  require(w >= 1 && w <= 64, "winnow window w must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fps expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val h = WinnowFingerprints.gramHashes(v.asInstanceOf[ArrayData], k, w)
    if (h == null) return new GenericArrayData(Array.emptyLongArray)
    val ng = h.length
    // window minima over each full w-window, dedup preserving order
    val out = new scala.collection.mutable.ArrayBuffer[Long](ng - w + 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    var pos = 0
    while (pos <= ng - w) {
      var m = h(pos)
      var j = 1
      while (j < w) {
        val x = h(pos + j)
        if (x < m) m = x
        j += 1
      }
      if (seen.add(m)) out += m
      pos += 1
    }
    new GenericArrayData(out.toArray)
  }

  // Semi-codegen (HashedShingles pattern): call nullSafeEval directly on
  // the already-computed child value so the surrounding operator stays
  // fully whole-stage-codegen'd and the loop runs in one JIT'd method.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_fps"
}

object WinnowFingerprints {
  // MessageDigest is stateful and not thread-safe; tasks normally get
  // their own deserialized expression copy, but a ThreadLocal keeps this
  // correct even when one instance is shared (e.g. interpreted eval on
  // a reused plan)
  @transient private lazy val md5tl =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val space = UTF8String.fromString(" ")

  /** Gram hashes shared by [[WinnowFingerprints]] and
    * [[WinnowWindowMins]]: first 4 md5 bytes of each space-joined
    * k-gram, unsigned, in position order; null when no full w-window
    * exists (ng < w — the pipeline's `filter(ng >= w)` pre-gate). */
  private[expressions] def gramHashes(
      arr: ArrayData, k: Int, w: Int): Array[Long] = {
    val len = arr.numElements()
    val ng = len - k + 1
    if (ng < w) return null
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      // concat_ws semantics: null elements are skipped in the join
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val h = new Array[Long](ng)
    val parts = new Array[UTF8String](k)
    val md5 = md5tl.get()
    var pos = 0
    while (pos < ng) {
      var j = 0
      var np = 0
      while (j < k) {
        val t = toks(pos + j)
        if (t != null) { parts(np) = t; np += 1 }
        j += 1
      }
      val gram =
        if (np == k) UTF8String.concatWs(space, parts: _*)
        else UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(parts, 0, np): _*)
      md5.reset()
      val d = md5.digest(gram.getBytes)
      h(pos) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      pos += 1
    }
    h
  }
}

/** Per-WINDOW winnowing minima of a token array — the positional
  * sibling of [[WinnowFingerprints]]: element `i` (0-based) is
  * `min(h(i .. i+w−1))` over the same md5-prefix gram hashes, one
  * element per full w-window, NOT deduplicated. `posexplode` over the
  * result yields exactly q103's oracle `w` CTE rows (window start
  * position, fingerprint), which is what a scrub stage needs: a
  * duplicated fingerprint at window position `p` anchors the token span
  * `[p, p+w+k−2]` for removal. Same hash semantics, same empty-array
  * gate for ng < w.
  *
  * Why an expression (same as the distinct form): the composed column
  * form pays a position explode plus a per-doc window exchange for the
  * minima; this emits the whole per-document window-min array in one
  * JIT pass, so the scan stage stays map-side. */
case class WinnowWindowMins(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 16, "gram width k must be in [1, 16]")
  require(w >= 1 && w <= 64, "winnow window w must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_window_mins expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val h = WinnowFingerprints.gramHashes(v.asInstanceOf[ArrayData], k, w)
    if (h == null) return new GenericArrayData(Array.emptyLongArray)
    val ng = h.length
    val out = new Array[Long](ng - w + 1)
    var pos = 0
    while (pos <= ng - w) {
      var m = h(pos)
      var j = 1
      while (j < w) {
        val x = h(pos + j)
        if (x < m) m = x
        j += 1
      }
      out(pos) = m
      pos += 1
    }
    new GenericArrayData(out)
  }

  // Semi-codegen (HashedShingles pattern): call nullSafeEval directly on
  // the already-computed child value so the surrounding operator stays
  // fully whole-stage-codegen'd and the loop runs in one JIT'd method.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowWindowMins =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_window_mins"
}
