package graft.operators

import graft.{Det, QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned (directory-per-day) storage + partition pruning.
  *
  * The reference's feed is a DAILY batch (cron `'0 0 * * *'`,
  * `dags/update_tr_from_ex_dag.py:82`): its landed form is a
  * date-partitioned directory tree (`day=2024-01-08/part-*.parquet`), and
  * at 100 TB partition pruning on that tree is the FIRST scan reducer —
  * ahead of bucketing, pushdown or column pruning, because pruned
  * partitions are never even listed into the scan. Two pruning paths,
  * both exercised here and plan-asserted in `PartitionedSpec`:
  *
  *  - STATIC pruning (q92): a literal date predicate on the partition
  *    column is resolved at planning time against the directory listing
  *    only — a 7-day query over a 30-day table touches 7/30 of the files
  *    regardless of table size.
  *  - DYNAMIC partition pruning (q96): the qualifying days arrive from a
  *    dimension-side filter, unknown at plan time. Spark's DPP rule
  *    reuses the dimension's broadcast to filter the fact scan's
  *    partition list at runtime (`dynamicpruningexpression` in the
  *    scan's PartitionFilters) — the star-schema analogue of static
  *    pruning, and the reason a date-partitioned fact + filtered
  *    calendar dim never scans the full history.
  *
  * Scale notes (100 TB): partition count is the deploy knob — daily
  * partitions keep directory listings in the thousands (vs per-hour
  * layouts whose million-entry listings stall planning); one file per
  * partition here (the writer repartitions by `day` first) stands in for
  * "a few hundred MB per file" at production scale. The write is the
  * landed feed itself, not query-time work. Nothing collects to the
  * driver; the calendar dim is rows-per-day tiny and broadcast.
  */
object Partitioned extends QueryPack {
  import Det._

  /** Partitioned copies live in one fresh temp root per JVM, deleted on
    * exit — same lifecycle as [[Bucketed]]'s table copies, for the same
    * reason (no stale layouts across runs, no writes inside the repo). */
  private lazy val root: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_partitioned")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Throwable => () } // exit-time cleanup only
    }
    p.toString
  }

  private val lock = new Object
  private val landed = scala.collection.mutable.Set.empty[String]

  /** Shared land-once memoization for every derived layout/state table in
    * this pack: the target path is `root/<tagPrefix>_<md5(dir) prefix>`,
    * `build` runs under the lock exactly once per (JVM, dir), and later
    * calls return the landed path without touching storage. The md5 tag
    * keys the layout to its SOURCE directory, so sf0.01 and sf0.1 runs in
    * one JVM land side by side instead of clobbering each other. */
  private[graft] def ensureLanded(tagPrefix: String, dir: String)(build: String => Unit): String =
    lock.synchronized {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val path = s"$root/${tagPrefix}_$tag"
      if (!landed(path)) {
        build(path)
        landed += path
      }
      path
    }

  /** Idempotently lands `events` as a day-partitioned directory tree for
    * `dir` and returns the path. `repartition(day)` first, so every day
    * directory holds exactly one file (the dynamic-partition-insert
    * pattern that avoids the tasks×partitions small-file explosion — at
    * 100 TB the same move, with a per-day file-count target, is what
    * keeps the layout readable). First call per (JVM, dir) pays the
    * write; later calls — and the bench's second pass — reuse it. */
  private[graft] def ensureEventsByDay(spark: SparkSession, dir: String): String =
    ensureLanded("events_by_day", dir) { path =>
      Tables(spark, dir).events
        .withColumn("day", to_date(col("ts")))
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
    }

  /** Reads the partitioned layout back; `day` comes from the directory
    * names (partition-value inference types it DATE — asserted in
    * PartitionedSpec, it is part of the output schema contract). */
  private[graft] def eventsByDay(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(ensureEventsByDay(spark, dir))

  /** Tiny calendar dimension derived from the layout's own partition
    * column (a production deployment would join its real date dim; the
    * derived one keeps the fixture self-contained): one row per day with
    * a day-of-week attribute to filter on. Partition-column-only scan —
    * no data columns are read to build it. */
  private[graft] def dayDim(spark: SparkSession, dir: String): DataFrame =
    eventsByDay(spark, dir).select(col("day")).distinct()
      .withColumn("dow", dayofweek(col("day"))) // 1 = Sunday .. 7 = Saturday

  /** q92 pipeline: literal one-week predicate on the partition column —
    * planning-time pruning to 7 of 30 directories (plan-asserted). */
  private[graft] def prunedWeekPipeline(spark: SparkSession, dir: String): DataFrame =
    eventsByDay(spark, dir)
      .filter(col("day").between(lit("2024-01-08").cast("date"),
        lit("2024-01-14").cast("date")))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("day").asc_nulls_first, col("event_type").asc_nulls_first)

  /** q96 pipeline: the qualifying days come from the dimension filter
    * (weekends), so only DYNAMIC pruning can skip the other 22
    * directories — the dim is broadcast and its values re-used as a
    * runtime partition filter on the fact scan (plan-asserted). */
  private[graft] def dppJoinPipeline(spark: SparkSession, dir: String): DataFrame = {
    val weekend = dayDim(spark, dir).filter(col("dow").isin(1, 7)).select(col("day"))
    eventsByDay(spark, dir)
      .join(broadcast(weekend), Seq("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("day").asc_nulls_first)
  }

  /** Latest landed day, from the partition directory listing only — a
    * partition-column scan never reads data files, so this is a listing
    * operation even at 100 TB. */
  private[graft] def lastDay(spark: SparkSession, dir: String): java.sql.Date =
    dayDim(spark, dir).agg(max(col("day"))).collect()(0).getDate(0)

  /** Per-(day, event_type) partial-aggregate STATE for every day before
    * the latest — the persisted half of incremental view maintenance.
    * Partials are strictly re-aggregatable: row count, exact DECIMAL sum
    * (kept decimal in the state so the final merge is still exact), min,
    * max. Never an average — avg is derived at merge time from sum and
    * count, because mean-of-means is wrong under uneven day sizes.
    * Landed once per (JVM, dir), like the layouts: the one-time history
    * scan is the state's construction cost; every day after that, the
    * incremental path below touches ONE partition. */
  private[graft] def ensureAggState(spark: SparkSession, dir: String): String =
    ensureLanded("agg_state", dir) { path =>
      val last = lastDay(spark, dir)
      eventsByDay(spark, dir).filter(col("day") < lit(last))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .as("sum_value_dec"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .write.mode("overwrite").parquet(path)
    }

  /** q98 pipeline — incremental aggregate maintenance: merge the
    * persisted per-day partials with partials computed from ONLY the
    * latest day's directory (static pruning to 1 of 30 partitions,
    * plan-asserted in PartitionedSpec). At 100 TB this is the difference
    * between rescanning the full history every morning and scanning one
    * day: the state table is partition-count × group-count tiny, and the
    * merge re-aggregates exactly (decimal sums, min/max, counts). */
  private[graft] def incrementalAggPipeline(spark: SparkSession, dir: String): DataFrame = {
    val state = spark.read.parquet(ensureAggState(spark, dir))
    val last = lastDay(spark, dir)
    val delta = eventsByDay(spark, dir).filter(col("day") === lit(last))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .as("sum_value_dec"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    state.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value_dec")).cast("double").as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
      .withColumn("avg_value", col("sum_value") / col("n_events"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  // ---------------------------------------------------------------- q92
  /** Static partition pruning: one week of a day-partitioned events
    * table. Same answer as filtering the plain table on CAST(ts AS DATE)
    * — partitioning is a layout choice, not a semantic one; the plan
    * property (7 of 30 partitions listed into the scan) is what makes it
    * an operator, asserted in PartitionedSpec. */
  val q92 = QueryDef(
    "q92_partition_prune",
    (spark, dir) => prunedWeekPipeline(spark, dir),
    Some(s"""SELECT CAST(ts AS DATE) AS day, event_type,
      COUNT(*) AS n_events,
      ${sqlDsum("value")} AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
    GROUP BY 1, 2
    ORDER BY day NULLS FIRST, event_type NULLS FIRST"""))

  // ---------------------------------------------------------------- q96
  /** Dynamic partition pruning: weekend traffic via a filtered calendar
    * dim joined on the partition column. The oracle states the semantics
    * directly (weekend-day filter); the engine gets the answer by
    * broadcasting the 8-row dim and runtime-pruning the fact scan to the
    * matching 8 directories. */
  val q96 = QueryDef(
    "q96_dpp_join",
    (spark, dir) => dppJoinPipeline(spark, dir),
    Some(s"""SELECT CAST(ts AS DATE) AS day,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      ${sqlDsum("value")} AS sum_value
    FROM events
    WHERE isodow(CAST(ts AS DATE)) IN (6, 7)
    GROUP BY 1
    ORDER BY day NULLS FIRST"""))

  // ---------------------------------------------------------------- q98
  /** Incremental aggregate maintenance over the daily landing. The
    * oracle states the SEMANTIC contract — the merged result equals a
    * full recompute over every day — while the engine gets there by
    * merging persisted partials with one partition's delta. n_events is
    * a sum of partial counts (LongType), matching the oracle's
    * COUNT(*); the decimal sum stays decimal until the final cast so
    * the merge is exact in any order. */
  val q98 = QueryDef(
    "q98_incremental_agg",
    (spark, dir) => incrementalAggPipeline(spark, dir),
    Some(s"""SELECT event_type,
      COUNT(*) AS n_events,
      ${sqlDsum("value")} AS sum_value,
      MIN(value) AS min_value,
      MAX(value) AS max_value,
      ${sqlDsum("value")} / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY event_type NULLS FIRST"""))

  // --------------------------------------------------------------- q164
  /** Incremental JOIN-view maintenance — the join analogue of q98's
    * aggregate merge. The stored view V = γ(O ⋈ L) (revenue per
    * (order-priority, return-flag)) is kept current under TWO
    * independent deltas — a new-orders day ΔO (the latest order date)
    * and a new-lineitems day ΔL (the latest ship date) — without ever
    * re-joining the old halves, via the textbook delta-join rewrite:
    *
    *   Δ(O ⋈ L) = ΔO ⋈ L_old  ∪  O_old ⋈ ΔL  ∪  ΔO ⋈ ΔL
    *
    * The four (old/Δ × old/Δ) pair classes partition O ⋈ L exactly, so
    * merging the stored partials with the three delta terms equals the
    * full recompute — which is precisely what the oracle states.
    *
    * Scale shape: each delta term joins the full old half against a
    * DAY-sized side, broadcast-hinted here (a day of a 100 TB/year feed
    * is ~0.3% of the corpus; if a deploy's day outgrows the driver the
    * same equi-keys degrade gracefully to shuffled-hash) — so
    * per-refresh join fan-in is delta-proportional and the big×big
    * O_old ⋈ L_old join never runs at refresh time (PlanSpec-asserted:
    * the delta pipeline contains exactly 3 joins, all broadcast). The
    * stored view is simulated by cutting V_old (q98 persists its state
    * to parquet; here the cut stands in — the merge logic is the
    * operator under test). Merge protocol is q98's: counts stay
    * LongType sums, the revenue partial stays DECIMAL until the final
    * cast, so the merge is exact in any order. The two delta-day
    * scalars are driver model state (1-row max aggregates — the
    * `lastDay` class of probe). */
  private[graft] def deltaJoinDays(spark: SparkSession, dir: String): (String, String) = {
    val t = Tables(spark, dir)
    val dO = t.orders.agg(max(col("o_orderdate").cast("date")).cast("string"))
      .collect()(0).getString(0)
    val dL = t.lineitem.agg(max(col("l_shipdate").cast("date")).cast("string"))
      .collect()(0).getString(0)
    (dO, dL)
  }

  /** The standard projections the delta-join view works over. */
  private[graft] def joinViewInputs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val t = Tables(spark, dir)
    (t.orders.select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_day"), col("o_orderpriority")),
      t.lineitem.select(col("l_orderkey"),
        col("l_shipdate").cast("date").as("l_day"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount")))
  }

  /** The three delta terms, pre-merge — the frame PlanSpec inspects
    * (3 joins, every one broadcast, no old ⋈ old). Frame-parameterized
    * so ScaleProbe's joinview section can grow the old halves without
    * touching the deltas. */
  private[graft] def deltaJoinContribFrames(o: DataFrame, l: DataFrame,
      dO: String, dL: String): DataFrame = {
    val oldO = o.filter(col("o_day") < lit(dO).cast("date"))
    val newO = o.filter(col("o_day") === lit(dO).cast("date"))
    val oldL = l.filter(col("l_day") < lit(dL).cast("date"))
    val newL = l.filter(col("l_day") === lit(dL).cast("date"))
    viewPartial(broadcast(newO), oldL)
      .unionByName(viewPartial(oldO, broadcast(newL)))
      .unionByName(viewPartial(broadcast(newO), broadcast(newL)))
  }

  private[graft] def deltaJoinContrib(spark: SparkSession, dir: String,
      dO: String, dL: String): DataFrame = {
    val (o, l) = joinViewInputs(spark, dir)
    deltaJoinContribFrames(o, l, dO, dL)
  }

  /** One pair class's partial aggregate: LongType count + DECIMAL
    * revenue (q98's mergeable-partial protocol). */
  private[graft] def viewPartial(of: DataFrame, lf: DataFrame): DataFrame =
    of.join(lf, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("rev_dec"))

  /** The stored view's partials (the OLD x OLD pair class), landed once
    * per (JVM, dir) like q98's agg state: the one-time history join is
    * the view's construction cost; every refresh after that runs only
    * the three delta terms. */
  private[graft] def ensureJoinViewState(spark: SparkSession, dir: String,
      dO: String, dL: String): String =
    lock.synchronized {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val path = s"$root/join_view_state_$tag"
      if (!landed(path)) {
        val (o, l) = joinViewInputs(spark, dir)
        viewPartial(o.filter(col("o_day") < lit(dO).cast("date")),
          l.filter(col("l_day") < lit(dL).cast("date")))
          .write.mode("overwrite").parquet(path)
        landed += path
      }
      path
    }

  private[graft] def deltaJoinViewPipeline(spark: SparkSession, dir: String): DataFrame = {
    val (dO, dL) = deltaJoinDays(spark, dir)
    // the stored view: partials over the OLD halves, landed once (a
    // production deploy reads this from parquet, as q98 does)
    val vOld = spark.read.parquet(ensureJoinViewState(spark, dir, dO, dL))
    vOld.unionByName(deltaJoinContrib(spark, dir, dO, dL))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(sum(col("n_lines")).as("n_lines"),
        sum(col("rev_dec")).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("l_returnflag").asc_nulls_first)
  }

  val q164 = QueryDef(
    "q164_delta_join_view",
    (spark, dir) => deltaJoinViewPipeline(spark, dir),
    Some(s"""SELECT o_orderpriority, l_returnflag,
      COUNT(*) AS n_lines,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    ORDER BY o_orderpriority ASC NULLS FIRST, l_returnflag ASC NULLS FIRST"""))

  // --------------------------------------------------------------- q170
  /** RETRACTION-aware incremental aggregate maintenance — the deletion
    * half of the IVM family (q98 merges additive deltas; q87 compacts
    * upsert changelogs; q164 maintains a join view; THIS maintains an
    * aggregate view under deletes). The day's landing carries both
    * inserts and a purge list — every user who emitted an `error` row
    * on the latest day retracts their ENTIRE history (the
    * right-to-be-forgotten shape: a compliance delta is a set of keys,
    * not rows). The per-(day, type) stats view must come out as if the
    * purged rows never existed — without rebuilding it from scratch.
    *
    * The textbook IVM split by invertibility:
    *  - count/sum are GROUPS under addition — updated algebraically
    *    from one aggregate of the retracted rows (n −= rn,
    *    sum −= rsum, exact in DECIMAL).
    *  - min/max are NOT invertible — but a group's min/max can only
    *    change if a retracted value TIED it. Groups where
    *    rmin > state.min AND rmax < state.max keep their bounds
    *    untouched (the algebraic fast path); only the DIRTY remainder
    *    re-scans its survivors for fresh bounds (at the fixture:
    *    ~55–80% of retraction-touched groups are dirty, both branches
    *    spec-asserted live).
    *
    * Scale shape: ONE history pass builds the retraction aggregate (a
    * broadcast semi-join on the day-sized purge list — at 100 TB a
    * bloom filter on user_id, q85's pattern, prefilters the scan); the
    * dirty-group rescan is a second pass narrowed by a broadcast
    * semi-join on the ≤|days|·|types| dirty-key frame (day-partition
    * pruning applies on the landed layout — dirty DAYS name the
    * directories). Everything between the two passes moves the
    * dimension-sized state frame. Empty groups (every row retracted)
    * drop from the view, exactly as a recompute would drop them. */
  /** The day's purge list, cut once — it feeds the retraction aggregate,
    * the rescan's survivor filter AND the insert filter (cut-per-
    * consumer; the frame is day-sized). */
  private[graft] def purgedUsers(spark: SparkSession, dir: String,
      last: java.sql.Date): DataFrame =
    graft.Materialize.cut(
      eventsByDay(spark, dir)
        .filter(col("day") === lit(last) && col("event_type") === "error")
        .select(col("user_id")).distinct())

  private[graft] def retractableMerged(spark: SparkSession, dir: String): DataFrame = {
    val last = lastDay(spark, dir)
    retractableMergedFor(spark, dir, last, purgedUsers(spark, dir, last))
  }

  private def retractableMergedFor(spark: SparkSession, dir: String,
      last: java.sql.Date, purged: DataFrame): DataFrame =
    retractableMergedFrames(eventsByDay(spark, dir).filter(col("day") < lit(last)),
      spark.read.parquet(ensureAggState(spark, dir)), purged)

  /** The merge stage over arbitrary frames — `base` is the pre-delta
    * history (day, event_type, value, user_id, ...), `state` its landed
    * per-(day, type) partials. Factored so AlgebraProps can drive the
    * retraction algebra on generated corpora. */
  private[graft] def retractableMergedFrames(base: DataFrame, state: DataFrame,
      purged: DataFrame): DataFrame = {
    val retrAgg = base
      .join(broadcast(purged), Seq("user_id"), "left_semi")
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("rn"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .as("rsum"),
        min(col("value")).as("rmin"), max(col("value")).as("rmax"))
    graft.Materialize.cut(
      state.join(retrAgg, Seq("day", "event_type"), "left")
        .withColumn("n2", col("n_events") - coalesce(col("rn"), lit(0L)))
        .filter(col("n2") > 0)
        .withColumn("sum2", col("sum_value_dec") -
          coalesce(col("rsum"),
            lit(0).cast(org.apache.spark.sql.types.DecimalType(28, 6))))
        .withColumn("min_dirty", col("rn").isNotNull && col("rmin") <= col("min_value"))
        .withColumn("max_dirty", col("rn").isNotNull && col("rmax") >= col("max_value")))
  }

  /** The maintained OLD-half view over arbitrary frames (merge +
    * dirty-group rescan) — the algebraic core AlgebraProps drives on
    * generated corpora; [[retractableAggPipeline]] adds the insert leg. */
  private[graft] def retractableOldFrames(base: DataFrame, state: DataFrame,
      purged: DataFrame): DataFrame = {
    val merged = retractableMergedFrames(base, state, purged)
    val dirtyKeys = merged.filter(col("min_dirty") || col("max_dirty"))
      .select(col("day"), col("event_type"))
    val rescanned = base
      .join(broadcast(purged), Seq("user_id"), "left_anti")
      .join(broadcast(dirtyKeys), Seq("day", "event_type"), "left_semi")
      .groupBy(col("day"), col("event_type"))
      .agg(min(col("value")).as("fmin"), max(col("value")).as("fmax"))
    merged.join(rescanned, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        col("n2").as("n_events"),
        col("sum2").cast("double").as("sum_value"),
        when(col("min_dirty"), col("fmin")).otherwise(col("min_value")).as("min_value"),
        when(col("max_dirty"), col("fmax")).otherwise(col("max_value")).as("max_value"))
  }

  private[graft] def retractableAggPipeline(spark: SparkSession, dir: String): DataFrame = {
    val last = lastDay(spark, dir)
    val ev = eventsByDay(spark, dir)
    val purged = purgedUsers(spark, dir, last)
    val fixedOld = retractableOldFrames(ev.filter(col("day") < lit(last)),
      spark.read.parquet(ensureAggState(spark, dir)), purged)
    val inserts = ev.filter(col("day") === lit(last) && col("event_type") =!= "error")
      .join(broadcast(purged), Seq("user_id"), "left_anti")
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    fixedOld.unionByName(inserts)
      .orderBy(col("day").asc_nulls_first, col("event_type").asc_nulls_first)
  }

  val q170 = QueryDef(
    "q170_retractable_agg",
    (spark, dir) => retractableAggPipeline(spark, dir),
    Some(s"""WITH last AS (SELECT MAX(CAST(ts AS DATE)) AS d FROM events),
    purged AS (
      SELECT DISTINCT user_id FROM events, last
      WHERE CAST(ts AS DATE) = d AND event_type = 'error'),
    corrected AS (
      SELECT CAST(ts AS DATE) AS day, event_type, value
      FROM events, last
      WHERE user_id NOT IN (SELECT user_id FROM purged)
        AND (CAST(ts AS DATE) < d
          OR (CAST(ts AS DATE) = d AND event_type <> 'error')))
    SELECT day, event_type,
      COUNT(*) AS n_events,
      ${sqlDsum("value")} AS sum_value,
      MIN(value) AS min_value,
      MAX(value) AS max_value
    FROM corrected
    GROUP BY 1, 2
    ORDER BY day ASC NULLS FIRST, event_type ASC NULLS FIRST"""))

  // --------------------------------------------------------------- q177
  /** One day's partial aggregates from the landed day tree — the unit a
    * backfill replays. Static pruning makes it a one-directory scan:
    * replaying a day never touches the other 29. */
  private[graft] def dayPartials(spark: SparkSession, dir: String,
      day: java.sql.Date): DataFrame =
    eventsByDay(spark, dir).filter(col("day") === lit(day))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .as("sum_value_dec"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))

  /** Replay ONE day into a day-partitioned state table, idempotently:
    * dynamic partition overwrite replaces exactly that day's directory
    * and nothing else, so re-running a landed day is a no-op by
    * construction — the property that lets `Pipeline.catchup` be
    * crash-restarted from the directory listing, and the property the
    * backfill spec asserts (write a day twice, state unchanged). This is
    * the production `INSERT OVERWRITE ... PARTITION (day)` pattern; at
    * 100 TB each replayed day is a one-partition scan + a
    * groups-per-day-sized write, never a history rescan. */
  private[graft] def replayDay(spark: SparkSession, dir: String,
      statePath: String, day: java.sql.Date): Unit =
    dayPartials(spark, dir, day)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(statePath)

  /** Days already landed in a backfill state table — from the partition
    * directory listing only: one FileSystem `listStatus` on the state
    * root, parsing `day=YYYY-MM-DD` directory names. No Spark job, no
    * parquet footer reads — which is what makes restart-from-listing
    * cheap at any scale (a year of daily partitions is one 365-entry
    * listing RPC, independent of data volume). */
  private[graft] def landedDays(spark: SparkSession, statePath: String): Set[java.sql.Date] = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("day="))
      .map(st => java.sql.Date.valueOf(st.getPath.getName.stripPrefix("day=")))
      .toSet
  }

  /** The catchup-built state for q177, landed once per (JVM, dir):
    * `Pipeline.catchup` replays every scheduled day that has not landed
    * yet through [[replayDay]]. Memoized like the other layouts — and
    * BECAUSE replay is idempotent, a second call (or a crash-restart)
    * replays nothing: the listing already covers the schedule. */
  private[graft] def ensureBackfillState(spark: SparkSession, dir: String): String =
    ensureLanded("backfill_state", dir) { path =>
      val scheduled = dayDim(spark, dir).select(col("day"))
        .collect().map(_.getDate(0)).toSeq.sortBy(_.getTime)
      graft.pipeline.Pipeline.catchup(scheduled, landedDays(spark, path))(
        (d: java.sql.Date) => replayDay(spark, dir, path, d))(
        Ordering.by(_.getTime))
    }

  /** Backfill/catchup replay — the `catchup=True` semantics both
    * reference DAGs configure (`update_tr_from_ex_dag.py:84`) realized
    * on the engine: every scheduled day replayed one at a time through
    * the idempotent day-partition writer, then the per-day partials
    * merged exactly like q98. The oracle states the SEMANTIC contract —
    * a day-by-day replay of the whole history equals the full recompute
    * (same SQL as q98) — while per-day idempotence and skip-landed
    * behavior are spec-asserted (PartitionedSpec). q98 is "apply ONE new
    * day to standing state"; q177 is "rebuild state from nothing, one
    * day at a time" — the recovery path a production deployment runs
    * after losing state or changing partial definitions. */
  val q177 = QueryDef(
    "q177_backfill_replay",
    (spark, dir) => {
      val state = spark.read.parquet(ensureBackfillState(spark, dir))
      state.groupBy(col("event_type"))
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("sum_value_dec")).cast("double").as("sum_value"),
          min(col("min_value")).as("min_value"),
          max(col("max_value")).as("max_value"))
        .withColumn("avg_value", col("sum_value") / col("n_events"))
        .orderBy(col("event_type").asc_nulls_first)
    },
    q98.oracle)

  // --------------------------------------------------------------- q180
  /** Scheduled-run ledger — the operational view `Pipeline.catchup`
    * diffs, as an oracle-checked QUERY: one row per interval the cron
    * schedule says should have run (hourly here — the events fixture has
    * real gap hours, so missed runs are live at every SF), with whether
    * data landed and how much. This is the monitoring table a data-ops
    * team reads before triggering a backfill (q177), and it exercises
    * the `pipeline.Schedule` cron engine END-TO-END against an
    * independent oracle: every fire time `firesBetween` emits must match
    * DuckDB's `generate_series` hour walk exactly, or the hash compare
    * fails.
    *
    * Determinism: the span anchors are the feed's min/max µs timestamps
    * (two collected scalars — the lastDay pattern); fires are strictly
    * after the first event and at-or-before the last, minute-0 UTC;
    * outputs are epoch BIGINTs (no raw timestamps, contract rule).
    *
    * Scale: the ledger frame is schedule-sized BY DEFINITION (one row
    * per interval — a year of hourly runs is 8,760 rows), so building it
    * driver-side and broadcasting is the dimension-table move; the only
    * corpus-scale work is the per-hour count aggregate. */
  val q180 = QueryDef(
    "q180_run_ledger",
    (spark, dir) => {
      import spark.implicits._
      val e = Tables(spark, dir).events
      val Row2 = e.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).collect()(0)
      val (lo, hi) = (Row2.getTimestamp(0), Row2.getTimestamp(1))
      val sched = graft.pipeline.Schedule("0 * * * *", "UTC")
        .firesBetween(lo.toInstant, hi.toInstant)
        .map(_.getEpochSecond)
      val ledger = sched.toDF("hour_epoch")
      val hourly = e.groupBy(unix_timestamp(date_trunc("hour", col("ts")))
          .as("hour_epoch"))
        .agg(count(lit(1)).as("n"))
      ledger.join(hourly, Seq("hour_epoch"), "left")
        .select(col("hour_epoch"),
          when(col("n").isNotNull, 1).otherwise(0).cast(org.apache.spark.sql.types.IntegerType).as("ran"),
          coalesce(col("n"), lit(0L)).as("n_events"))
        .orderBy(col("hour_epoch"))
    },
    Some("""WITH span AS (
      SELECT date_trunc('hour', MIN(ts)) + INTERVAL 1 HOUR AS lo,
        date_trunc('hour', MAX(ts)) AS hi
      FROM events),
    sched AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span),
    hourly AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1)
    SELECT epoch_ns(s.h) // 1000000000 AS hour_epoch,
      CAST(CASE WHEN hourly.n IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS ran,
      COALESCE(hourly.n, 0) AS n_events
    FROM sched s LEFT JOIN hourly ON hourly.h = s.h
    ORDER BY hour_epoch"""))

  // --------------------------------------------------------------- q181
  /** Stored deterministic-HLL register pages for every day BEFORE the
    * latest — the distinct-counting analogue of [[ensureAggState]]'s
    * sum/count partials: ≤ days × types × 256 tiny rows, landed once;
    * every day after, the incremental path touches ONE partition. This
    * is q123's "rollups union stored sketches, never rescan history"
    * pattern with q178's fully ORACLE-CHECKED register encoding. */
  private[graft] def ensureHllState(spark: SparkSession, dir: String): String =
    ensureLanded("hll_state", dir) { path =>
      val last = lastDay(spark, dir)
      Analytic.hllRegistersOf(
          eventsByDay(spark, dir).filter(col("day") < lit(last))
            .select(col("event_type"), col("day"), col("user_id")),
          Seq("event_type", "day"), "user_id")
        .write.mode("overwrite").parquet(path)
    }

  /** The latest day's register page, PRE-cut — the frame the pruning
    * plan assertion inspects (a cut truncates the executed plan, so the
    * one-partition guarantee must be asserted here, PlanSpec-style). */
  private[graft] def hllDeltaPage(spark: SparkSession, dir: String): DataFrame =
    Analytic.hllRegistersOf(
      eventsByDay(spark, dir).filter(col("day") === lit(lastDay(spark, dir)))
        .select(col("event_type"), col("day"), col("user_id")),
      Seq("event_type", "day"), "user_id")

  /** q181 pipeline: stored register pages + ONE pruned partition's delta
    * page, through q178's shared finishing stage. The delta page is cut
    * (types × 256 rows) before the two-consumer gauge so the day
    * partition is scanned exactly once; the state read is a parquet
    * scan of the tiny page table either way. */
  private[graft] def incrementalHllPipeline(spark: SparkSession, dir: String): DataFrame = {
    val state = spark.read.parquet(ensureHllState(spark, dir))
    Analytic.hllGaugeOf(
      state.unionByName(graft.Materialize.cut(hllDeltaPage(spark, dir))))
  }

  /** Incremental distinct-count maintenance — the IVM row for unique
    * counting, FULLY oracle-checked: the stored per-(type, day) register
    * pages are merged with a delta page computed from ONLY the latest
    * day's directory (static pruning to 1 of 30 partitions,
    * plan-asserted), and because registers max-merge (the AlgebraProps
    * homomorphism law), the maintained gauge equals q178's full-feed
    * recompute — which is exactly what the oracle states (q178's SQL
    * verbatim, the q98/q164/q170 IVM-contract style). At 100 TB this is
    * the difference between rescanning the full history for every daily
    * unique-count refresh and scanning one day into a types × 256-row
    * state update; unlike q123's library sketches, every value in the
    * refreshed gauge hash-verifies cross-engine. */
  val q181 = QueryDef(
    "q181_incremental_hll",
    (spark, dir) => incrementalHllPipeline(spark, dir),
    Analytic.q178.oracle)

  // --------------------------------------------------------------- q210
  /** Per-day CMS counter pages over a (day, user) feed — q190's counter
    * build per partition day, the FREQUENCY analogue of
    * [[ensureHllState]]'s register pages. Counters sum-merge (q190's
    * spec law), so pages are strictly re-aggregatable state. */
  private[graft] def cmsDayCounters(e: DataFrame): DataFrame =
    e.select(col("day"), col("user_id").cast("string").as("k"))
      .groupBy(col("day"), col("k")).agg(count(lit(1)).as("n_exact"))
      .withColumn("j", explode(sequence(lit(0), lit(3))))
      .withColumn("bucket", Analytic.cmsBucket(col("j"), col("k")))
      .groupBy(col("day"), col("j"), col("bucket"))
      .agg(sum(col("n_exact")).as("c"))

  /** Stored CMS pages for every day BEFORE the latest, landed once. */
  private[graft] def ensureCmsState(spark: SparkSession, dir: String): String =
    ensureLanded("cms_state", dir) { path =>
      cmsDayCounters(
          eventsByDay(spark, dir).filter(col("day") < lit(lastDay(spark, dir))))
        .write.mode("overwrite").parquet(path)
    }

  /** The latest day's counter page, PRE-cut — the frame the pruning
    * assertion inspects (q181's hllDeltaPage convention). */
  private[graft] def cmsDeltaPage(spark: SparkSession, dir: String): DataFrame =
    cmsDayCounters(
      eventsByDay(spark, dir).filter(col("day") === lit(lastDay(spark, dir))))

  /** q210 pipeline: stored pages + ONE pruned partition's delta page,
    * sum-merged into the live counter table, then probed for the 20
    * md5-least users ACTIVE ON THE LATEST DAY (the daily report a
    * deployment actually asks: all-time activity estimates for today's
    * users, at delta-sized probe cost). */
  private[graft] def incrementalCmsPipeline(spark: SparkSession, dir: String): DataFrame = {
    val state = spark.read.parquet(ensureCmsState(spark, dir))
      .select(col("j"), col("bucket"), col("c"))
    val delta = graft.Materialize.cut(cmsDeltaPage(spark, dir))
      .select(col("j"), col("bucket"), col("c"))
    val counters = state.unionByName(delta)
      .groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))
    val probe = eventsByDay(spark, dir)
      .filter(col("day") === lit(lastDay(spark, dir)))
      .select(col("user_id").cast("string").as("k")).distinct()
      .orderBy(graft.Det.md5Bucket(col("k")).asc, col("k").asc)
      .limit(20)
    probe
      .withColumn("j", explode(sequence(lit(0), lit(3))))
      .withColumn("bucket", Analytic.cmsBucket(col("j"), col("k")))
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col("k")).agg(min(col("c")).as("n_est"))
      .select(col("k").cast("long").as("user_id"), col("n_est"))
      .orderBy(col("user_id").asc_nulls_first)
  }

  /** Incremental frequency-sketch maintenance — the IVM row for item
    * counting, FULLY oracle-checked (the frequency sibling of q181's
    * distinct maintenance): stored per-day counter pages are sum-merged
    * with a delta page computed from ONLY the latest day's directory
    * (static pruning, plan-asserted like q181), and because counters
    * sum-merge (q190's spec law) the maintained table equals the
    * full-feed rebuild — which is what the oracle states, computing the
    * same counters over the whole events feed. At 100 TB this turns the
    * daily hot-key/frequency refresh from a full-history rescan into
    * one day's scan plus a ≤ d·w-row state merge. */
  val q210 = QueryDef(
    "q210_incremental_cms",
    (spark, dir) => incrementalCmsPipeline(spark, dir),
    Some("""WITH e AS (
      SELECT CAST(ts AS DATE) AS day, CAST(user_id AS VARCHAR) AS k
      FROM events),
    last AS (SELECT MAX(day) AS last FROM e),
    exact AS (SELECT k, COUNT(*) AS n FROM e GROUP BY 1),
    d AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS d(j)),
    counters AS (
      SELECT j,
        CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 4)) AS INTEGER) AS bucket,
        CAST(SUM(n) AS BIGINT) AS c
      FROM exact CROSS JOIN d GROUP BY 1, 2),
    active AS (
      SELECT DISTINCT k FROM e, last WHERE day = last),
    probe AS (
      SELECT k FROM active
      ORDER BY CAST(('0x' || substr(md5(k), 1, 4)) AS INTEGER) ASC, k ASC
      LIMIT 20),
    pb AS (
      SELECT p.k, dd.j,
        CAST(('0x' || substr(md5(CAST(dd.j AS VARCHAR) || ':' || p.k), 1, 4)) AS INTEGER) AS bucket
      FROM probe p CROSS JOIN d dd)
    SELECT CAST(pb.k AS BIGINT) AS user_id, CAST(MIN(c.c) AS BIGINT) AS n_est
    FROM pb JOIN counters c ON c.j = pb.j AND c.bucket = pb.bucket
    GROUP BY 1
    ORDER BY user_id ASC NULLS FIRST"""))

  // --------------------------------------------------------------- q213
  /** Per-day quantile-sketch bin pages over the events landing — q193's
    * log-binned counts per partition day, the QUANTILE analogue of
    * [[ensureHllState]]/[[ensureCmsState]]. Bins sum-merge (q193's
    * spec law). Values clamp at 0 (the bin math is defined on
    * non-negative cents — the StreamQuantileSketch convention). */
  private[graft] def quantDayBins(e: DataFrame): DataFrame =
    Analytic.quantileBinsBy(
      e.select(col("event_type").as("g"), col("day"),
        greatest(lit(0L), round(col("value") * 100).cast(
          org.apache.spark.sql.types.LongType)).as("v")),
      Seq("g", "day"))

  private[graft] def ensureQuantState(spark: SparkSession, dir: String): String =
    ensureLanded("quant_state", dir) { path =>
      quantDayBins(
          eventsByDay(spark, dir).filter(col("day") < lit(lastDay(spark, dir))))
        .write.mode("overwrite").parquet(path)
    }

  /** The latest day's bin page, PRE-cut (q181/q210's convention). */
  private[graft] def quantDeltaPage(spark: SparkSession, dir: String): DataFrame =
    quantDayBins(
      eventsByDay(spark, dir).filter(col("day") === lit(lastDay(spark, dir))))

  /** Incremental quantile-sketch maintenance — the QUANTILE row
    * completing the IVM × deterministic-sketch matrix (distinct q181,
    * frequency q210, quantiles THIS): stored per-day bin pages are
    * sum-merged with a delta page from ONLY the latest day's directory
    * (static pruning, plan-asserted) and walked through q193's shared
    * finishing stage — so the maintained p50/p90/p99 bounds equal the
    * full-feed sketch rebuild, which is what the oracle states. At
    * 100 TB the daily latency/size-distribution dashboard refreshes
    * from ≤ 16·64-row pages plus one day's scan, never a history
    * rescan. */
  val q213 = QueryDef(
    "q213_incremental_quantile",
    (spark, dir) => {
      val state = spark.read.parquet(ensureQuantState(spark, dir))
        .select(col("g"), col("id"), col("c"))
      val delta = graft.Materialize.cut(quantDeltaPage(spark, dir))
        .select(col("g"), col("id"), col("c"))
      Analytic.quantileFinish(
          state.unionByName(delta)
            .groupBy(col("g"), col("id")).agg(sum(col("c")).as("c")))
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type").asc_nulls_first)
    },
    Some("""WITH cents AS (
      SELECT event_type, GREATEST(0, CAST(ROUND(value * 100) AS BIGINT)) AS v
      FROM events),
    binned AS (
      SELECT event_type,
        CASE WHEN v < 16 THEN v
          ELSE (length(bin(v)) - 1) * 16
            + ((v >> CAST(length(bin(v)) - 5 AS INTEGER)) - 16)
        END AS id
      FROM cents),
    counts AS (
      SELECT event_type, id, COUNT(*) AS c
      FROM binned GROUP BY 1, 2),
    cum AS (
      SELECT event_type, id, c,
        SUM(c) OVER (PARTITION BY event_type ORDER BY id ASC
          ROWS UNBOUNDED PRECEDING) AS cum
      FROM counts),
    totals AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
      FROM counts GROUP BY 1),
    picked AS (
      SELECT cum.event_type, MAX(n) AS n,
        MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN id END) AS id50,
        MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN id END) AS id90,
        MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN id END) AS id99
      FROM cum JOIN totals USING (event_type)
      GROUP BY 1)
    SELECT event_type, n,
      CASE WHEN id50 < 64 THEN id50 ELSE (CAST(16 + id50 % 16 AS BIGINT) << CAST(id50 // 16 - 4 AS INTEGER)) END AS p50_lo,
      CASE WHEN id50 < 64 THEN id50 + 1 ELSE ((CAST(16 + id50 % 16 AS BIGINT) << CAST(id50 // 16 - 4 AS INTEGER))) + (CAST(1 AS BIGINT) << CAST(id50 // 16 - 4 AS INTEGER)) END AS p50_hi,
      CASE WHEN id90 < 64 THEN id90 ELSE (CAST(16 + id90 % 16 AS BIGINT) << CAST(id90 // 16 - 4 AS INTEGER)) END AS p90_lo,
      CASE WHEN id90 < 64 THEN id90 + 1 ELSE ((CAST(16 + id90 % 16 AS BIGINT) << CAST(id90 // 16 - 4 AS INTEGER))) + (CAST(1 AS BIGINT) << CAST(id90 // 16 - 4 AS INTEGER)) END AS p90_hi,
      CASE WHEN id99 < 64 THEN id99 ELSE (CAST(16 + id99 % 16 AS BIGINT) << CAST(id99 // 16 - 4 AS INTEGER)) END AS p99_lo,
      CASE WHEN id99 < 64 THEN id99 + 1 ELSE ((CAST(16 + id99 % 16 AS BIGINT) << CAST(id99 // 16 - 4 AS INTEGER))) + (CAST(1 AS BIGINT) << CAST(id99 // 16 - 4 AS INTEGER)) END AS p99_hi
    FROM picked
    ORDER BY event_type ASC NULLS FIRST"""))

  // --------------------------------------------------------------- q226
  /** Per-day cent-count pages over the events landing — the exact
    * (type, cent) distribution state behind q223's KS fold (and the
    * batch image of `StreamKs`'s cells), per partition day. Counts
    * sum-merge trivially, so pages are strictly re-aggregatable state;
    * page volume is ≤ |types|·|cent domain| rows per day (the 2-dp
    * money domain is bounded — unbounded feeds would store q193 bin
    * pages instead, same trade as batch q223 documents). */
  private[graft] def centDayPages(e: DataFrame): DataFrame =
    e.select(col("day"), col("event_type").as("g"),
        round(col("value") * 100).cast(
          org.apache.spark.sql.types.LongType).as("v"))
      .groupBy(col("day"), col("g"), col("v")).agg(count(lit(1)).as("c"))

  private[graft] def ensureKsState(spark: SparkSession, dir: String): String =
    ensureLanded("ks_state", dir) { path =>
      centDayPages(
          eventsByDay(spark, dir).filter(col("day") < lit(lastDay(spark, dir))))
        .write.mode("overwrite").parquet(path)
    }

  /** The latest day's cent page, PRE-cut (q181/q210/q213's convention). */
  private[graft] def ksDeltaPage(spark: SparkSession, dir: String): DataFrame =
    centDayPages(
      eventsByDay(spark, dir).filter(col("day") === lit(lastDay(spark, dir))))

  /** Incremental drift maintenance — the DRIFT row of the IVM family
    * (distinct q181, frequency q210, quantiles q213, checksums q217):
    * stored per-day (type, cent) count pages are sum-merged with a
    * delta page from ONLY the latest day's directory (static pruning,
    * plan-asserted) and walked through q223's shared [[Analytic
    * .ksFinish]] stage — counts sum-merge, so the maintained KS
    * statistic equals the full-feed rebuild, which is what the oracle
    * states. At 100 TB the daily "did any feed's distribution move"
    * screen refreshes from bounded cent pages plus one day's scan,
    * never a history rescan — and the SAME pages serve q223's batch
    * fold and the `StreamKs` live gauge (one state, three readers). */
  val q226 = QueryDef(
    "q226_incremental_ks",
    (spark, dir) => {
      val state = spark.read.parquet(ensureKsState(spark, dir))
        .select(col("g"), col("v"), col("c"))
      val delta = graft.Materialize.cut(ksDeltaPage(spark, dir))
        .select(col("g"), col("v"), col("c"))
      Analytic.ksFinish(
        state.unionByName(delta)
          .groupBy(col("g"), col("v")).agg(sum(col("c")).as("c")))
    },
    Analytic.q223.oracle)

  // --------------------------------------------------------------- q217
  /** Canonical per-row serialization of the events feed for
    * reconciliation hashing — q131's contract (integers raw, money as
    * rounded cents, instants as epoch µs) applied to the events
    * columns. */
  private[graft] def eventRowSer: org.apache.spark.sql.Column =
    concat_ws("|", col("event_id"), unix_micros(col("ts")), col("user_id"),
      col("event_type"),
      round(col("value") * 100, 0).cast(org.apache.spark.sql.types.LongType),
      col("props"))

  /** Per-(type, day) checksum pages: row count + 60-bit md5 XOR — q131's
    * fingerprint at partition-day grain. XOR is commutative AND its own
    * inverse, so pages merge by XOR and a day RETRACTS by XOR-ing its
    * page back in — the only IVM row that repairs deletions for free. */
  private[graft] def checksumDayPages(e: DataFrame): DataFrame =
    e.select(col("event_type"), col("day"),
        Analytic.rowHash60(eventRowSer).as("hh"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(hh)").as("checksum"))

  private[graft] def ensureChecksumState(spark: SparkSession, dir: String): String =
    ensureLanded("checksum_state", dir) { path =>
      checksumDayPages(
          eventsByDay(spark, dir).filter(col("day") < lit(lastDay(spark, dir))))
        .write.mode("overwrite").parquet(path)
    }

  /** The latest day's checksum page, PRE-cut (the q181 convention). */
  private[graft] def checksumDeltaPage(spark: SparkSession, dir: String): DataFrame =
    checksumDayPages(
      eventsByDay(spark, dir).filter(col("day") === lit(lastDay(spark, dir))))

  /** Incremental reconciliation-checksum maintenance — the
    * RECONCILIATION row of the IVM family (q181 distinct, q210
    * frequency, q213 quantiles): stored per-(type, day) fingerprint
    * pages XOR/sum-merged with a delta page from ONLY the latest day's
    * directory (static pruning, the plan-asserted q181 pattern), giving
    * the per-type (n_rows, checksum) a cross-system reconciliation
    * compares — ≡ the full-feed q131-style fingerprint, which is what
    * the oracle states. At 100 TB the nightly "do replicas agree"
    * handshake refreshes from day pages instead of rescanning the
    * table, and because XOR is its own inverse the same pages RETRACT a
    * bad day algebraically (q170's deletion semantics for free). */
  val q217 = QueryDef(
    "q217_incremental_checksum",
    (spark, dir) => {
      val state = spark.read.parquet(ensureChecksumState(spark, dir))
        .select(col("event_type"), col("n_rows"), col("checksum"))
      val delta = graft.Materialize.cut(checksumDeltaPage(spark, dir))
        .select(col("event_type"), col("n_rows"), col("checksum"))
      state.unionByName(delta)
        .groupBy(col("event_type"))
        .agg(sum(col("n_rows")).as("n_rows"),
          expr("bit_xor(checksum)").as("checksum"))
        .orderBy(col("event_type").asc_nulls_first)
    },
    Some("""SELECT event_type, COUNT(*) AS n_rows,
      bit_xor(CAST('0x' || substr(md5(concat_ws('|',
        event_id, epoch_us(ts), user_id, event_type,
        CAST(ROUND(value * 100) AS BIGINT), props)), 1, 15) AS BIGINT))
        AS checksum
    FROM events
    GROUP BY event_type
    ORDER BY event_type ASC NULLS FIRST"""))

  override def queries: Seq[QueryDef] =
    Seq(q92, q96, q98, q164, q170, q177, q180, q181, q210, q213, q217, q226)
}
