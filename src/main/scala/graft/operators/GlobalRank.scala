package graft.operators

import graft.Materialize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalable global ranking: `row_number`/`ntile` over a TOTAL order
  * without funnelling every row through one task.
  *
  * `Window.orderBy(...)` with an empty `partitionBy` plans `Window` over
  * `Exchange SinglePartition` — correct, but ONE task sorts the whole
  * input, which is the canonical scale-killer for a billion-row rank.
  * This primitive is the classic two-pass distributed rank instead:
  *
  *  1. `repartitionByRange` on the sort key (Spark's sampled range
  *     partitioner; identical keys never straddle a boundary, and the
  *     sort key is required to be a total order, so ranks are
  *     well-defined regardless of where boundaries land);
  *  2. `sortWithinPartitions` on the same key, then
  *     `monotonically_increasing_id()` in the same stage — the id
  *     encodes (partition index << 33) + row-offset-in-partition, so
  *     (partition, local rank) decode with two bit ops. NO window, NO
  *     second exchange: the one range shuffle is the only data movement
  *     (PlanSpec asserts exactly one Exchange and zero Window nodes);
  *  3. per-partition row counts → driver-side prefix sums (≤
  *     `spark.sql.shuffle.partitions` rows — bounded model state, like
  *     q60's k-means centroids, never row data) → broadcast-joined back
  *     as offsets: global rank = offset + local rank.
  *
  * Determinism: the id is assigned in post-sort order over a total sort
  * key, so (pid, lrk) is a pure function of the data given the sampled
  * range boundaries, and the final rank is boundary-independent. The
  * 33-bit offset field caps partitions at ~8.6 B rows each — range
  * partitioning keeps real partitions ~n/P, far under it. The
  * local-rank frame is materialized ([[Materialize.cut]]) because it
  * feeds both the count pass and the final join.
  */
object GlobalRank {

  private val pidCol = "__graft_pid"
  private val lrkCol = "__graft_lrk"
  private val offCol = "__graft_off"

  /** Steps 1–2 (pre-materialization): range partition + in-stage local
    * rank. Factored out so PlanSpec can assert the shape (one range
    * Exchange, no Window, no SinglePartition) on the plan that actually
    * runs — the materialization in [[withRowNumber]] truncates executed
    * plans. */
  private[graft] def localRankPipeline(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val mid = "__graft_mid"
    df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn(mid, monotonically_increasing_id())
      .withColumn(pidCol, shiftright(col(mid), 33).cast("int"))
      .withColumn(lrkCol,
        (col(mid).bitwiseAND(lit((1L << 33) - 1)) + 1).cast(LongType))
      .drop(mid)
  }

  /** Adds a 1-based global `rankCol` (LongType) over the total order
    * `sortCols`; also returns the total row count (free from the offset
    * pass — callers like ntile need it anyway). `sortCols` MUST be a
    * total order (include a unique tie-breaker), or ranks at boundary
    * ties would depend on partitioning.
    *
    * Eager by design: the range shuffle, local-rank materialization and
    * count pass run as Spark jobs at CALL time (the offsets are driver
    * state, like q60's centroids), and the returned frame reads the
    * materialized cut — so `graft.Explain` and plan inspection on a
    * consuming query see a truncated plan, the same convention as every
    * materializing query (q32/q33/q44/q55/q60/q70). Inspect
    * [[localRankPipeline]] for the real interior, as PlanSpec does. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
      rankCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val local = Materialize.cut(localRankPipeline(df, sortCols))
    val counts = local.groupBy(col(pidCol)).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val row = (pid, acc); acc += c; row
    }.toSeq
    val total = acc
    val ranked = local
      .join(broadcast(offsets.toDF(pidCol, offCol)), pidCol)
      .withColumn(rankCol, col(offCol) + col(lrkCol))
      .drop(pidCol, lrkCol, offCol)
    (ranked, total)
  }

  /** The full SQL global ranking family — `rank`, `dense_rank`,
    * `percent_rank`, `cume_dist` (plus the underlying `row_number`) over
    * a TOTAL input order, derived from the same two-pass primitive and
    * never a single-partition window.
    *
    * Derivation: `row_number` comes from [[withRowNumber]] over
    * `orderCols ++ tieCols` (the tie-break makes the order total; the
    * family's outputs are tie-break-INDEPENDENT by construction). One
    * extra aggregate per tie group (`orderCols`) yields the group's
    * row-number minimum and maximum — `rank` IS the minimum, `cume_dist`
    * is maximum/n, `percent_rank` is (rank−1)/(n−1) — and a second,
    * group-sized rank pass over the group minima numbers the groups:
    * `dense_rank`. Shuffle budget, stated honestly: one range exchange
    * of the rows (row_number), one hash exchange of the rows (the
    * tie-group aggregate), one range exchange of the GROUPS (dense
    * numbering — distinct-key-sized, not row-sized), and the join of
    * rows back to their group's stats (hash, or broadcast when the
    * group table is small — AQE decides from the aggregate's runtime
    * size). Every exchange is many-partition; nothing funnels through
    * one task, which is the entire point vs `Window.orderBy`
    * (PlanSpec's workload guard). Exact integer arithmetic throughout;
    * the two ratio columns are exact-int divisions in double
    * (AlgebraProps pins all five columns to Spark's own window
    * functions on identical input). */
  def withRankFamily(df: DataFrame, sortCols: Seq[Column], keyCols: Seq[Column],
      tieCols: Seq[Column], prefix: String = ""): (DataFrame, Long) = {
    val rn = s"${prefix}row_number"
    val (numbered0, n) = withRowNumber(df, sortCols ++ tieCols, rn)
    val numbered = Materialize.cut(numbered0)
    // tie groups are identified by their row-number span: one aggregate
    // on the ranking key (keyCols = the VALUE form of sortCols — sort
    // direction lives only in the row_number pass) gives min (= rank)
    // and max (→ cume_dist)
    val keyNames = keyCols.indices.map(i => s"__graft_k$i")
    val keyed = numbered.select(
      keyCols.zip(keyNames).map { case (c, nm) => c.as(nm) } :+ col(rn): _*)
    val groups = keyed.groupBy(keyNames.map(col): _*)
      .agg(min(col(rn)).as(s"${prefix}rank"), max(col(rn)).as("__graft_hi"))
    // group minima are distinct and ordered with the key: ranking them
    // numbers the groups — dense_rank — at group (not row) scale
    val (denseGroups, _) = withRowNumber(groups,
      Seq(col(s"${prefix}rank")), s"${prefix}dense_rank")
    val joined = numbered.join(denseGroups,
      keyCols.zip(keyNames).map { case (c, nm) => c <=> col(nm) }
        .reduce(_ && _))
    val out = joined
      .withColumn(s"${prefix}percent_rank",
        if (n <= 1L) lit(0.0)
        else (col(s"${prefix}rank") - 1).cast("double") / lit((n - 1).toDouble))
      .withColumn(s"${prefix}cume_dist",
        col("__graft_hi").cast("double") / lit(n.toDouble))
      .drop("__graft_hi")
      .drop(keyNames: _*)
    (out, n)
  }

  /** Integer division of a non-negative rank-domain column by a positive
    * constant. `(c - pmod(c, d)) / d` is exactly divisible, and double
    * division of exactly-divisible values is exact while the quotient
    * stays under 2^53 — i.e. for any row count a real corpus can have. */
  private def idiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast(LongType)

  /** SQL `ntile(tiles)` reconstructed from a 1-based global rank and the
    * total count, in exact integer arithmetic: with q = n/t, r = n%t,
    * the first r tiles hold q+1 rows and the rest hold q. Matches the
    * ANSI ntile definition exactly (spec-asserted against Spark's own
    * `ntile`). */
  def ntileFromRank(rk: Column, total: Long, tiles: Int): Column = {
    require(tiles >= 1, "ntileFromRank: tiles must be >= 1")
    val q = total / tiles
    val r = total % tiles
    val cut = r * (q + 1)
    // when q == 0 every row satisfies rk <= cut (= total), so the
    // otherwise-branch never evaluates — qSafe only guards pmod-by-zero
    val qSafe = math.max(q, 1L)
    when(rk <= cut, idiv(rk - 1, q + 1) + 1)
      .otherwise(lit(r) + idiv(rk - cut - 1, qSafe) + 1)
  }
}
