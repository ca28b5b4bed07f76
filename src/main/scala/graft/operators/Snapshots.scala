package graft.operators

import graft.{Det, QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data extraction between two full table
  * versions.
  *
  * The reference's feed lands a complete snapshot per day
  * (`catchup=False` daily rerun, `dags/update_tr_from_ex_dag.py:82-84`);
  * the day-over-day delta is derived, not delivered. Extracting it —
  * which keys were added, removed, changed — is the inverse of q87's
  * changelog COMPACTION (which folds a change stream back into a
  * snapshot), and at 100 TB it is what turns a full-snapshot feed into
  * an incremental pipeline: downstream consumers process the diff, not
  * the snapshot.
  *
  * Shape: one full-outer EQUI-join on the key — presence decides
  * added/removed, a null-safe struct comparison over the compared
  * columns decides changed vs unchanged. No hashing is involved in the
  * comparison (a row hash would be cheaper per byte shuffled but float
  * columns have no cross-engine-stable string form; the struct compare
  * is exact and oracle-mirrorable with per-column IS DISTINCT FROM).
  *
  * Scale notes (100 TB): the diff shuffles both snapshots on the key —
  * unavoidable for arbitrary layouts, and AQE handles skew. For a
  * RECURRING daily diff the right deployment stores snapshots in the
  * q88 bucketed layout on the key, which makes this join — like any
  * other join on the bucket key — exchange-free; the operator itself is
  * layout-agnostic. Output is bounded by the true change volume, never
  * snapshot size.
  */
object Snapshots extends QueryPack {

  /** Per-key change rows between two snapshots: `(key, change)` for
    * every key whose presence or compared columns differ —
    * `added` / `removed` / `changed`; unchanged keys are filtered out
    * before anything leaves the join. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      key: String, compareCols: Seq[String]): DataFrame = {
    def packed(df: DataFrame, side: String) =
      df.select(col(key).as("k"),
        struct(compareCols.map(col): _*).as(side))
    packed(oldSnap, "old_v")
      .join(packed(newSnap, "new_v"), Seq("k"), "full_outer")
      .withColumn("change",
        when(col("old_v").isNull, lit("added"))
          .when(col("new_v").isNull, lit("removed"))
          .when(!(col("old_v") <=> col("new_v")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col("k").as(key), col("change"))
  }

  private val keep =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

  /** Deterministic day-2 snapshot of `orders`, derived from the md5
    * bucket of the key (the contract's cross-engine hash idiom — never
    * xxhash64): ~5% of keys deleted (bucket < 3277 of 65536), ~5%
    * updated (3277 ≤ bucket < 6554: status → 'U', price + 10), ~5%
    * added (bucket ≥ 62259 re-emitted under key + 10^8). Everything is
    * a pure function of the key, so DuckDB rebuilds the identical
    * snapshot in the oracle. */
  private[graft] def ordersSnapshots(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = Tables(spark, dir).orders
    val bkt: Column = Det.md5Bucket(col("o_orderkey"))
    val oldSnap = o.select(keep.map(col): _*)
    val survivors = o.filter(bkt >= 3277)
      .withColumn("o_orderstatus",
        when(bkt < 6554, lit("U")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(bkt < 6554, col("o_totalprice") + 10.0).otherwise(col("o_totalprice")))
      .select(keep.map(col): _*)
    val added = o.filter(bkt >= 62259)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .select(keep.map(col): _*)
    (oldSnap, survivors.unionByName(added))
  }

  private val sqlBkt =
    "CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS INTEGER)"

  // ---------------------------------------------------------------- q99
  /** Snapshot diff of orders vs its simulated next-day version. The
    * oracle rebuilds both snapshots from the same md5-bucket rules and
    * diffs them with a FULL JOIN + per-column IS DISTINCT FROM — the
    * relational statement of the semantics the engine implements with
    * one packed struct compare. */
  val q99 = QueryDef(
    "q99_snapshot_diff",
    (spark, dir) => {
      val (oldSnap, newSnap) = ordersSnapshots(spark, dir)
      diff(oldSnap, newSnap, "o_orderkey",
          Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
        .orderBy(col("o_orderkey").asc_nulls_first)
    },
    Some(s"""WITH b AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderpriority, $sqlBkt AS bkt
      FROM orders),
    old_snap AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM b),
    new_snap AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN bkt < 6554 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN bkt < 6554 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM b WHERE bkt >= 3277
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice,
             o_orderpriority
      FROM b WHERE bkt >= 62259)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      CASE WHEN o.o_orderkey IS NULL THEN 'added'
           WHEN n.o_orderkey IS NULL THEN 'removed'
           ELSE 'changed' END AS change
    FROM old_snap o FULL JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR (o.o_custkey IS DISTINCT FROM n.o_custkey)
       OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
       OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
       OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
    ORDER BY o_orderkey NULLS FIRST"""))

  // --------------------------------------------------------------- q102
  /** SCD Type-2 apply: fold a day's snapshot into a versioned dimension.
    *
    * The dimension carries one row per (key, version) with
    * `valid_from` / `valid_to` (NULL = still current) / `is_current`.
    * Applying a snapshot at `effectiveDate`:
    *
    *  - unchanged current rows pass through untouched;
    *  - changed keys close the current version (`valid_to` =
    *    effectiveDate) AND open a new one;
    *  - removed keys close the current version;
    *  - added keys open a first version;
    *  - already-closed history rows pass through untouched.
    *
    * Shape: ONE key-equi full-outer join of the CURRENT slice against
    * the snapshot (the same join q99's diff runs — presence + one
    * null-safe struct compare decide the action), then map-side unions;
    * closed history never enters the join. At 100 TB the cost is the
    * diff's cost; on a bucketed layout (q88) the join is exchange-free.
    */
  def scd2Apply(dim: DataFrame, snap: DataFrame, key: String,
      compareCols: Seq[String], effectiveDate: String): DataFrame = {
    val eff = lit(effectiveDate).cast("date")
    val current = dim.filter(col("valid_to").isNull)
    val history = dim.filter(col("valid_to").isNotNull)
    val oldSide = current.select(col(key).as("k"),
      struct(compareCols.map(col): _*).as("old_v"),
      col("valid_from").as("old_from"))
    val newSide = snap.select(col(key).as("k"),
      struct(compareCols.map(col): _*).as("new_v"))
    // null-safe: `same` is false for added (old NULL) and removed (new NULL)
    val j = oldSide.join(newSide, Seq("k"), "full_outer")
      .withColumn("same", col("old_v") <=> col("new_v"))
    val keptOrClosed = j.filter(col("old_v").isNotNull)
      .select(col("k"), col("old_v").as("v"), col("old_from").as("valid_from"),
        when(col("same"), lit(null).cast("date")).otherwise(eff).as("valid_to"))
    val opened = j.filter(col("new_v").isNotNull && !col("same"))
      .select(col("k"), col("new_v").as("v"),
        eff.as("valid_from"), lit(null).cast("date").as("valid_to"))
    val packedHistory = history.select(col(key).as("k"),
      struct(compareCols.map(col): _*).as("v"),
      col("valid_from"), col("valid_to"))
    keptOrClosed.unionByName(opened).unionByName(packedHistory)
      .select((col("k").as(key) +:
        compareCols.map(c => col(s"v.$c").as(c))) :+
        col("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.as("is_current"): _*)
  }

  /** q102: the orders dimension initialized from the day-1 snapshot
    * (every key current since 2024-01-01) with the simulated day-2
    * snapshot applied. (key, valid_from) is unique — changed keys carry
    * a closed day-1 row and an open day-2 row — so the ORDER BY is
    * total. The oracle states the same fold relationally: FULL JOIN +
    * IS DISTINCT FROM per column, a closed/open row per action. */
  val q102 = QueryDef(
    "q102_scd2_apply",
    (spark, dir) => {
      val (day1, day2) = ordersSnapshots(spark, dir)
      val dim = day1
        .withColumn("valid_from", lit("2024-01-01").cast("date"))
        .withColumn("valid_to", lit(null).cast("date"))
      scd2Apply(dim, day2, "o_orderkey",
          Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
          "2024-01-02")
        .orderBy(col("o_orderkey").asc_nulls_first,
          col("valid_from").asc_nulls_first)
    },
    Some(s"""WITH b AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderpriority, $sqlBkt AS bkt
      FROM orders),
    old_snap AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM b),
    new_snap AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN bkt < 6554 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN bkt < 6554 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM b WHERE bkt >= 3277
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice,
             o_orderpriority
      FROM b WHERE bkt >= 62259),
    j AS (
      SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
             o.o_custkey AS oc, o.o_orderstatus AS os,
             o.o_totalprice AS op, o.o_orderpriority AS opr,
             n.o_custkey AS nc, n.o_orderstatus AS ns,
             n.o_totalprice AS np, n.o_orderpriority AS npr,
             (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
              AND NOT (o.o_custkey IS DISTINCT FROM n.o_custkey)
              AND NOT (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
              AND NOT (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
              AND NOT (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority))
               AS same
      FROM old_snap o FULL JOIN new_snap n ON o.o_orderkey = n.o_orderkey)
    SELECT ok AS o_orderkey, oc AS o_custkey, os AS o_orderstatus,
           op AS o_totalprice, opr AS o_orderpriority,
           DATE '2024-01-01' AS valid_from,
           CASE WHEN same THEN NULL ELSE DATE '2024-01-02' END AS valid_to,
           same AS is_current
    FROM j WHERE ok IS NOT NULL
    UNION ALL
    SELECT nk, nc, ns, np, npr,
           DATE '2024-01-02', NULL, true
    FROM j WHERE nk IS NOT NULL AND NOT same
    ORDER BY o_orderkey NULLS FIRST, valid_from NULLS FIRST"""))

  // --------------------------------------------------------------- q132
  /** SCD2 point-in-time lookup — the QUERY side of q102's versioned
    * dimension: "what did this key look like on date D?", the join every
    * as-of fact enrichment runs against a slowly-changing dimension.
    * Each key probes a deterministic date (md5-parity of the key →
    * day 1 or day 2, oracle-reproducible) and resolves to the version
    * with `valid_from ≤ D < valid_to` (NULL end = still open); a key
    * with no version covering D — removed before it, or added after —
    * comes back `active = false`, which an inner join would silently
    * drop.
    *
    * Scale shape: the lookup is a KEY-equi join with the interval
    * predicate carried in the join condition — the interval filter
    * rides the hash join (never a range-only join over versions), and
    * SCD2's invariant (versions of a key tile time disjointly)
    * guarantees ≤ 1 match per probe, so no post-join dedup. The dim is
    * cut: the probe-key scan and the lookup both consume it. */
  val q132 = QueryDef(
    "q132_scd2_lookup",
    (spark, dir) => {
      val (day1, day2) = ordersSnapshots(spark, dir)
      val dim0 = day1
        .withColumn("valid_from", lit("2024-01-01").cast("date"))
        .withColumn("valid_to", lit(null).cast("date"))
      val dim = graft.Materialize.cut(
        scd2Apply(dim0, day2, "o_orderkey",
          Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
          "2024-01-02"))
      val probes = dim.select(col("o_orderkey")).distinct()
        .withColumn("probe_date",
          when(pmod(Det.md5Bucket(col("o_orderkey")), lit(2)) === 0,
            lit("2024-01-01")).otherwise(lit("2024-01-02")).cast("date"))
      probes.alias("p").join(dim.alias("d"),
          col("p.o_orderkey") === col("d.o_orderkey") &&
            col("d.valid_from") <= col("p.probe_date") &&
            (col("d.valid_to").isNull || col("d.valid_to") > col("p.probe_date")),
          "left")
        .select(col("p.o_orderkey").as("o_orderkey"), col("p.probe_date"),
          col("d.o_orderkey").isNotNull.as("active"),
          col("d.o_orderstatus").as("o_orderstatus"),
          col("d.valid_from").as("valid_from"))
        .orderBy(col("o_orderkey").asc_nulls_first,
          col("probe_date").asc_nulls_first)
    },
    Some(s"""WITH b AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderpriority, $sqlBkt AS bkt
      FROM orders),
    old_snap AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM b),
    new_snap AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN bkt < 6554 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN bkt < 6554 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM b WHERE bkt >= 3277
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice,
             o_orderpriority
      FROM b WHERE bkt >= 62259),
    j AS (
      SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
             o.o_orderstatus AS os, n.o_orderstatus AS ns,
             (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
              AND NOT (o.o_custkey IS DISTINCT FROM n.o_custkey)
              AND NOT (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
              AND NOT (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
              AND NOT (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority))
               AS same
      FROM old_snap o FULL JOIN new_snap n ON o.o_orderkey = n.o_orderkey),
    dim AS (
      SELECT ok AS o_orderkey, os AS o_orderstatus,
             DATE '2024-01-01' AS valid_from,
             CASE WHEN same THEN NULL ELSE DATE '2024-01-02' END AS valid_to
      FROM j WHERE ok IS NOT NULL
      UNION ALL
      SELECT nk, ns, DATE '2024-01-02', NULL
      FROM j WHERE nk IS NOT NULL AND NOT same),
    probes AS (
      SELECT DISTINCT o_orderkey,
        CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                    AS INTEGER) % 2 = 0
             THEN DATE '2024-01-01' ELSE DATE '2024-01-02' END AS probe_date
      FROM dim)
    SELECT p.o_orderkey, p.probe_date,
      d.o_orderkey IS NOT NULL AS active,
      d.o_orderstatus, d.valid_from
    FROM probes p
    LEFT JOIN dim d ON d.o_orderkey = p.o_orderkey
      AND d.valid_from <= p.probe_date
      AND (d.valid_to IS NULL OR d.valid_to > p.probe_date)
    ORDER BY p.o_orderkey ASC NULLS FIRST, p.probe_date ASC NULLS FIRST"""))

  override def queries: Seq[QueryDef] = Seq(q99, q102, q132)
}
