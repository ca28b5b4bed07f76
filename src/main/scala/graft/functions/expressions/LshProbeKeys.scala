package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multi-probe sign-LSH keys for a float vector (query-directed probing,
  * Lv et al., "Multi-Probe LSH", VLDB 2007): `tables` hash tables of
  * `planesPerTable` hyperplanes each; for every table, emits the exact
  * sign-bucket PLUS the `probes − 1` most-likely neighboring buckets —
  * the perturbation sets with the smallest total squared margin, where
  * the margin is the row's projection onto each hyperplane. A plane
  * whose projection is near zero is the plane most likely to have
  * flipped for a true neighbor, so flipping the smallest-|margin| bits
  * first probes the buckets that recover most of the miss mass — the
  * reason a multi-probe table is worth several plain tables at equal
  * recall.
  *
  * Returns array<bigint> of length ≤ tables·probes (capped at the
  * 2^planes distinct buckets a table has); each key packs
  * `(table << planesPerTable) | bucket`, so the key is directly the
  * equi-join column — no (tbl, bkt) pair needed. Entry order: table 0's
  * probe sequence (exact bucket first, then ascending perturbation
  * score, ties to the lexicographically smaller flip set), then
  * table 1's, …
  *
  * Perturbation-set enumeration is the paper's expand/shift heap over
  * margin scores sorted ascending: from a set whose largest sorted
  * position is j, `expand` appends position j+1 and `shift` replaces j
  * with j+1 — every non-empty subset is generated exactly once, in
  * non-decreasing score order. Scores are exact double arithmetic over
  * a fixed iteration order, and every tie breaks on the packed position
  * mask, so the probe sequence is deterministic across engines,
  * sessions and partitionings.
  *
  * With `probes = 1` this is exactly [[LshBuckets]]'s geometry with
  * packed keys (same hyperplane family, weight(p, d) =
  * `pmod(xxhash64(p·7919 + d), 1e5)/1e5 − 0.5`, plane index
  * p = table·planesPerTable + j). The hyperplane weight matrix is
  * precomputed once per (executor, expression) on first eval — the
  * per-term XXH64 re-hash would otherwise dominate the scan at
  * hundreds of planes.
  */
case class LshProbeKeys(child: Expression, tables: Int, planesPerTable: Int,
    probes: Int) extends UnaryExpression {

  require(tables > 0 && planesPerTable > 0 && probes > 0)
  // the packed key must fit a long: table id in the high bits, bucket
  // in the low `planesPerTable` bits
  require(planesPerTable <= 30 && tables.toLong < (1L << 32),
    "graft_lsh_probe_keys: planesPerTable <= 30")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_probe_keys expects array<float>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** probes per table, capped at the table's 2^planes distinct buckets */
  private val probesPerTable: Int =
    if (planesPerTable >= 31) probes
    else math.min(probes, 1 << planesPerTable)

  // hyperplane weights [plane][dim], built once per executor on first
  // eval (dim is only known from data); identical values to the
  // arithmetic form in LshBuckets/VectorOps.lshBucket
  @transient private var weights: Array[Array[Double]] = _
  private def weightsFor(dim: Int): Array[Array[Double]] = {
    var w = weights
    if (w == null || w(0).length != dim) {
      val planes = tables * planesPerTable
      w = Array.tabulate(planes, dim) { (p, d) =>
        val h = XXH64.hashInt(p * 7919 + d, 42L)
        (((h % 100000L) + 100000L) % 100000L).toDouble / 100000.0 - 0.5
      }
      weights = w
    }
    w
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val w = weightsFor(dim)
    val vec = new Array[Double](dim)
    var d = 0
    while (d < dim) { vec(d) = arr.getFloat(d).toDouble; d += 1 }

    val p = planesPerTable
    val e = probesPerTable
    val out = new Array[Long](tables * e)
    val margins = new Array[Double](p)
    val sortedScore = new Array[Double](p)
    val sortedPlane = new Array[Int](p)
    var t = 0
    var outI = 0
    while (t < tables) {
      // margins + exact bucket for this table
      var code = 0L
      var j = 0
      while (j < p) {
        val wp = w(t * p + j)
        var dot = 0.0
        var k = 0
        while (k < dim) { dot += vec(k) * wp(k); k += 1 }
        margins(j) = dot
        if (dot > 0) code |= (1L << j)
        j += 1
      }
      val tableHi = t.toLong << p
      out(outI) = tableHi | code
      outI += 1

      if (e > 1) {
        // sort plane indices by squared margin ascending (insertion
        // sort, p is small); ties break to the lower plane index
        j = 0
        while (j < p) {
          val s = margins(j) * margins(j)
          var i = j
          while (i > 0 && sortedScore(i - 1) > s) {
            sortedScore(i) = sortedScore(i - 1)
            sortedPlane(i) = sortedPlane(i - 1)
            i -= 1
          }
          sortedScore(i) = s
          sortedPlane(i) = j
          j += 1
        }
        // expand/shift heap over (score, mask of sorted positions, last
        // position); ties break on the mask — a tiny binary heap, at
        // most 2 pushes per pop and ≤ 2·probes entries
        val cap = 2 * e + 2
        val hScore = new Array[Double](cap)
        val hMask = new Array[Int](cap)
        val hLast = new Array[Int](cap)
        var hSize = 0
        def push(s: Double, m: Int, l: Int): Unit = {
          var i = hSize
          hSize += 1
          while (i > 0) {
            val par = (i - 1) >> 1
            if (hScore(par) > s || (hScore(par) == s && hMask(par) > m)) {
              hScore(i) = hScore(par); hMask(i) = hMask(par); hLast(i) = hLast(par)
              i = par
            } else {
              hScore(i) = s; hMask(i) = m; hLast(i) = l; return
            }
          }
          hScore(0) = s; hMask(0) = m; hLast(0) = l
        }
        def pop(): Unit = {
          hSize -= 1
          val s = hScore(hSize); val m = hMask(hSize); val l = hLast(hSize)
          var i = 0
          while (true) {
            var c = 2 * i + 1
            if (c >= hSize) { hScore(i) = s; hMask(i) = m; hLast(i) = l; return }
            if (c + 1 < hSize &&
                (hScore(c + 1) < hScore(c) ||
                 (hScore(c + 1) == hScore(c) && hMask(c + 1) < hMask(c)))) c += 1
            if (hScore(c) < s || (hScore(c) == s && hMask(c) < m)) {
              hScore(i) = hScore(c); hMask(i) = hMask(c); hLast(i) = hLast(c)
              i = c
            } else { hScore(i) = s; hMask(i) = m; hLast(i) = l; return }
          }
        }
        push(sortedScore(0), 1, 0)
        var emitted = 1
        while (emitted < e && hSize > 0) {
          val s = hScore(0); val m = hMask(0); val l = hLast(0)
          pop()
          // flip the planes named by the mask's sorted positions
          var flipped = code
          var b = m
          while (b != 0) {
            val pos = java.lang.Integer.numberOfTrailingZeros(b)
            flipped ^= (1L << sortedPlane(pos))
            b &= b - 1
          }
          out(outI) = tableHi | flipped
          outI += 1
          emitted += 1
          if (l + 1 < p) {
            push(s + sortedScore(l + 1), m | (1 << (l + 1)), l + 1)        // expand
            push(s - sortedScore(l) + sortedScore(l + 1),
              (m & ~(1 << l)) | (1 << (l + 1)), l + 1)                      // shift
          }
        }
        // heap exhausted early (e capped at 2^p): pad with the exact
        // bucket — duplicates are harmless (equi-join dedups via the
        // downstream distinct) and keep the output length fixed
        while (emitted < e) { out(outI) = tableHi | code; outI += 1; emitted += 1 }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  // Semi-codegen, same pattern as LshBuckets: call nullSafeEval on the
  // computed child value so the surrounding operator stays codegen'd.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshProbeKeys =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_probe_keys"
}
