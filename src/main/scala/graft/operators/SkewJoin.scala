package graft.operators

import graft.{Det, QueryDef, QueryPack, Tables}
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
object SkewJoin extends QueryPack {
  import Det._
  /** @param saltFactor number of ways to split each key (≥ 1).
    * @param saltCols   columns whose hash spreads the hot key. Must vary
    *                   within a join-key group (a row id / primary key is
    *                   ideal); empty → hash the full row, which is always
    *                   correct but drags every column through the scan —
    *                   column pruning dies, so name a narrow key at scale. */
  def saltedInner(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltFactor: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor >= 1)
    // deterministic salt: hash of stable column values modulo factor —
    // avoids rand() (nondeterministic under task retry, which can
    // duplicate or drop rows in a recomputed partition).
    val src = if (saltCols.nonEmpty) saltCols else left.columns.toSeq
    val salted = left.withColumn("__salt",
      pmod(hash(src.map(col): _*), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated,
        salted("__salt") === replicated("__salt") &&
          col(leftKey) === col(rightKey))
      .drop("__salt")
  }

  // ---------------------------------------------------------------- q72
  /** Salted fact⋈dim join through the driver contract. Semantics are by
    * construction identical to the plain equi-join, so the oracle is the
    * plain join — that identity IS the property under test (SkewJoinSpec
    * proves it on an adversarially skewed frame; this query proves it on
    * real fixture data against an independent engine).
    *
    * The replicated side carries a SHUFFLE_HASH hint: at fixture scale
    * Catalyst would broadcast the 8×-replicated dimension, which silently
    * degenerates the salt to dead weight (a broadcast join never
    * shuffles, so there is no hot partition to split). The hint pins the
    * shuffle-join shape the salt exists for — the shape a 100 TB
    * fact⋈large-dim join takes when the dim outgrows the broadcast
    * threshold and one key holds a disproportionate row share. */
  val q72 = QueryDef(
    "q72_salted_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      saltedInner(t.orders, t.customer.hint("shuffle_hash"),
          "o_custkey", "c_custkey", saltFactor = 8,
          // salt off the primary key: varies within every hot o_custkey
          // group, and keeps the scan pruned to 3 columns (a full-row
          // salt hash would drag all of `orders` through the scan)
          saltCols = Seq("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""SELECT c_mktsegment,
      COUNT(*) AS n_orders,
      ${sqlDsum("o_totalprice")} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""))

  override def queries: Seq[QueryDef] = Seq(q72)
}
