package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (the
  * classic hot-customer / null-key problem), a plain shuffle join puts
  * the whole hot key in one task. Salting splits it: the skewed (large)
  * side gets a random salt in [0, factor), the small side is replicated
  * `factor` times, and the join runs on (key, salt) — the hot key now
  * spreads over `factor` tasks.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default here) handles most cases at runtime; this explicit form is
  * for the pathological keys AQE can't split (e.g. a single giant key in
  * a sort-merge join with aggregation pushed below) and as the documented
  * manual escape hatch. Semantics are identical to
  * `left.join(right, keys)` — verified property-style in SkewJoinSpec.
  */
object SkewJoin {
  /** @param saltFactor number of ways to split each key (≥ 1). */
  def saltedInner(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    // deterministic salt: hash of the full left row modulo factor — avoids
    // rand() (nondeterministic under task retry, which can duplicate or
    // drop rows in a recomputed partition).
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated,
        salted("__salt") === replicated("__salt") &&
          col(leftKey) === col(rightKey))
      .drop("__salt")
  }
}
