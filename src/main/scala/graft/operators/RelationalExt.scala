package graft.operators

import graft.{Det, QueryDef, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Second relational pack: multiset set-ops, ranking family, exact
  * percentiles/ordered collections, deterministic variance, JSON
  * struct round-trips, null-safe predicates, regex matching and
  * approximate distinct sketches — closing out the SURVEY.md §2.2
  * scalar/agg/set-op surface.
  */
object RelationalExt extends QueryPack {
  import Det._

  // ---------------------------------------------------------------- q28
  /** Multiset set ops: INTERSECT ALL / EXCEPT ALL keep duplicates —
    * customers by how many 1995 orders survive the multiset difference
    * with 1996. */
  val q28 = QueryDef(
    "q28_multiset_ops",
    (spark, dir) => {
      val o = Tables(spark, dir).orders
      val y1995 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y1996 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      y1995.exceptAll(y1996.intersectAll(y1995))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, COUNT(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      EXCEPT ALL
      (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
       INTERSECT ALL
       SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995))
    GROUP BY o_custkey
    ORDER BY o_custkey"""))

  // ---------------------------------------------------------------- q29
  /** Ranking family: rank, dense_rank, percent_rank, cume_dist over
    * customer balances within market segment. */
  val q29 = QueryDef(
    "q29_rank_family",
    (spark, dir) => {
      val c = Tables(spark, dir).customer
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.select(
          col("c_custkey"), col("c_mktsegment"),
          rank().over(w).cast(IntegerType).as("rnk"),
          dense_rank().over(w).cast(IntegerType).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment,
      CAST(rank() OVER w AS INT) AS rnk,
      CAST(dense_rank() OVER w AS INT) AS drnk,
      ROUND(percent_rank() OVER w, 6) AS prnk,
      ROUND(cume_dist() OVER w, 6) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
      ORDER BY c_acctbal DESC NULLS LAST, c_custkey)
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q35
  /** Exact percentiles (interpolated — quantities are integral so the
    * interpolation lands on .0/.5 exactly), ordered distinct collection,
    * and variance computed from exact decimal sums (deterministic, unlike
    * streaming stddev). The collected set is emitted as a sorted
    * comma-joined STRING, not an array column: scalar outputs keep the
    * result comparable by any row-hash harness (array cells are not
    * hashable in pandas-based comparators). Quantities are integral
    * doubles, so the int cast is exact. */
  val q35 = QueryDef(
    "q35_stats_pack",
    (spark, dir) => {
      val li = Tables(spark, dir).lineitem
      val n = count(lit(1))
      val s = dsum(col("l_quantity"))
      val s2 = dsum(col("l_quantity") * col("l_quantity"))
      li.groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          array_join(
            transform(sort_array(collect_set(col("l_quantity").cast("int"))),
              x => x.cast("string")), ",").as("quantities"),
          round((s2 - s * s / n) / (n - 1), 6).as("variance"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""SELECT l_returnflag,
      ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
      ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
      ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90,
      array_to_string(list_sort(list(DISTINCT CAST(l_quantity AS INT))), ',') AS quantities,
      ROUND((${sqlDsum("l_quantity * l_quantity")} -
             ${sqlDsum("l_quantity")} * ${sqlDsum("l_quantity")} / COUNT(*))
            / (COUNT(*) - 1), 6) AS variance
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q49
  /** JSON struct round-trip + null-safe equality + regex matching:
    * parse `props` with an explicit schema (from_json), re-serialize
    * (to_json), null-safe-compare the extracted field. The struct is
    * parsed ONCE into a named column the three outputs reference —
    * Catalyst's CollapseProject declines to inline a non-cheap alias
    * used more than once, so the optimized plan carries exactly one
    * `from_json` (PlanSpec-asserted) instead of leaning on codegen
    * subexpression elimination to rescue a triple parse. */
  val q49 = QueryDef(
    "q49_json_struct",
    (spark, dir) => {
      val e = Tables(spark, dir).events
      e.filter(col("props").rlike("^\\{\"k\": [0-9]+\\}$"))
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
        .select(
          col("event_id"),
          col("k"),
          to_json(struct(col("k").as("k"))).as("j"),
          (col("k") <=> 87).as("is87"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS INT) AS k,
      to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INT)))::VARCHAR AS j,
      CAST(json_extract_string(props, '$.k') AS INT) IS NOT DISTINCT FROM 87 AS is87
    FROM events
    WHERE regexp_matches(props, '^\{"k": [0-9]+\}$')
    ORDER BY event_id"""))

  // ---------------------------------------------------------------- q50
  /** Approximate sketches (HyperLogLog++ distinct, GK-sketch quantile)
    * next to their exact counterparts — sketch values are
    * engine-specific → rows-only check; the spec asserts both
    * approximations land within tolerance of exact, and q82 is the
    * oracle-checked twin of the EXACT half (hash-verified against
    * DuckDB), so only the sketch values themselves go unhashed. */
  val q50 = QueryDef(
    "q50_approx_distinct",
    (spark, dir) => {
      val o = Tables(spark, dir).orders
      // Two aggregations, not one: a DISTINCT agg in the same agg list as
      // percentile aggs makes Catalyst plan an Expand whose partial
      // aggregate groups by (priority, custkey) — building a percentile
      // buffer per CUSTOMER (~100k maps) instead of per priority (5).
      // Split the paths and join the two 5-row results instead (measured
      // 9.7 s → ~2 s at sf0.1).
      val distincts = o.groupBy(col("o_orderpriority"))
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_buyers"),
          countDistinct(col("o_custkey")).as("exact_buyers"))
      val medians = o.groupBy(col("o_orderpriority"))
        .agg(
          round(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)), 2)
            .as("approx_median_price"),
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("exact_median_price"))
      distincts.join(medians, "o_orderpriority")
        .select(col("o_orderpriority"), col("approx_buyers"), col("exact_buyers"),
          col("approx_median_price"), col("exact_median_price"))
        .orderBy(col("o_orderpriority"))
    },
    None,
    twins = Seq("q82_sketch_exact_twin"))

  // ---------------------------------------------------------------- q82
  /** The exact half of q50 as its own oracle-checked query: distinct
    * buyers and the exact median price per order priority. Exists so the
    * deterministic columns of the sketch query ARE hash-verified (q50
    * itself stays rows-only — HLL/GK sketch values are engine-specific).
    *
    * Determinism: the median interpolates between integer CENTS
    * (`round(price·100)` — prices are 2-dp doubles), so the midpoint is
    * a .0/.5 value both engines represent exactly; interpolating raw
    * doubles would hinge on last-ulp parity of two different
    * interpolation formulas (contract rules 2/7).
    *
    * Same two-aggregation shape as q50: a DISTINCT agg and a percentile
    * agg in one list makes Catalyst plan an Expand whose partial
    * aggregate groups by (priority, custkey) — a percentile buffer per
    * CUSTOMER instead of per priority; split paths joined on the 5-row
    * result instead (see q50's measured 9.7→2 s note). */
  val q82 = QueryDef(
    "q82_sketch_exact_twin",
    (spark, dir) => {
      val o = Tables(spark, dir).orders
      val distincts = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_buyers"))
      val medians = o.select(col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(cents, 0.5)").as("exact_median_cents"))
      distincts.join(medians, "o_orderpriority")
        .select(col("o_orderpriority"), col("exact_buyers"),
          col("exact_median_cents"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH c AS (
      SELECT o_orderpriority, o_custkey,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
    SELECT o_orderpriority,
      COUNT(DISTINCT o_custkey) AS exact_buyers,
      quantile_cont(cents, 0.5) AS exact_median_cents
    FROM c
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q51
  /** Explicit GROUPING SETS through the `spark.sql` entry point (the SQL
    * front door; rollup/cube are its specializations). */
  val q51 = QueryDef(
    "q51_grouping_sets",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.customer.join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .createOrReplaceTempView("q51_cn")
      spark.sql("""
        SELECT n_name, c_mktsegment,
          CAST(grouping_id() AS INT) AS gid,
          COUNT(*) AS n
        FROM q51_cn
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
        ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""")
    },
    Some("""SELECT n_name, c_mktsegment,
      CAST(GROUPING(n_name, c_mktsegment) AS INT) AS gid,
      COUNT(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
    ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST"""))

  // ---------------------------------------------------------------- q52
  /** Full-outer join with unmatched rows on BOTH sides: high-balance
    * customers ⟗ 1995 buyers. Null-bearing outputs, deterministic order
    * on the coalesced key. (Right outer is the mirror of q07's left
    * outer through the same join machinery.) */
  val q52 = QueryDef(
    "q52_full_outer",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val highBal = t.customer.filter(col("c_acctbal") > 8000)
        .select(col("c_custkey"), col("c_acctbal"))
      val buyers95 = t.orders.filter(year(col("o_orderdate")) === 1995)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_1995"))
      highBal.join(buyers95, col("c_custkey") === col("k"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("k")).as("custkey"),
          col("c_acctbal"),
          col("n_1995"),
          (col("c_custkey").isNotNull && col("k").isNotNull).as("matched"))
        .orderBy(col("custkey"))
    },
    Some("""SELECT COALESCE(c.c_custkey, b.k) AS custkey,
      c.c_acctbal, b.n_1995,
      c.c_custkey IS NOT NULL AND b.k IS NOT NULL AS matched
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000) c
    FULL OUTER JOIN
      (SELECT o_custkey AS k, COUNT(*) AS n_1995 FROM orders
       WHERE year(o_orderdate) = 1995 GROUP BY o_custkey) b
      ON c.c_custkey = b.k
    ORDER BY custkey"""))

  // ---------------------------------------------------------------- q53
  /** Pivot: quantities by return flag pivoted over line status (explicit
    * pivot values → static schema, the scalable form; dynamic-value pivot
    * would need a driver-side distinct first). Oracle mirrors with
    * conditional aggregation — the engine-portable equivalent. */
  val q53 = QueryDef(
    "q53_pivot",
    (spark, dir) => {
      val li = Tables(spark, dir).lineitem
      li.groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0.0)).as("qty_f"),
          coalesce(col("O"), lit(0.0)).as("qty_o"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""SELECT l_returnflag,
      COALESCE(${sqlDsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")}, 0.0) AS qty_f,
      COALESCE(${sqlDsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")}, 0.0) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q54
  /** Unpivot (melt): wide numeric lineitem measures → long (metric, value)
    * rows, then a per-metric profile. Oracle mirrors with UNION ALL — the
    * engine-portable long-form equivalent. */
  val q54 = QueryDef(
    "q54_unpivot",
    (spark, dir) => {
      val li = Tables(spark, dir).lineitem
      li.select(col("l_orderkey"), col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey")),
          values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          variableColumnName = "metric",
          valueColumnName = "v")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), dsum(col("v")).as("total"))
        .orderBy(col("metric"))
    },
    Some(s"""SELECT metric, COUNT(*) AS n, ${sqlDsum("v")} AS total
    FROM (
      SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
    GROUP BY metric
    ORDER BY metric"""))

  // ---------------------------------------------------------------- q56
  /** Right outer join: aggregated 1995 order counts RIGHT JOIN customer —
    * every customer survives, order-less customers carry NULL counts.
    * (The mirror of q07's left outer, exercised through the right-outer
    * code path rather than claimed by symmetry.) */
  val q56 = QueryDef(
    "q56_right_outer",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val o95 = t.orders.filter(year(col("o_orderdate")) === 1995)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_1995"))
      o95.join(t.customer, col("o_custkey") === col("c_custkey"), "right_outer")
        .select(col("c_custkey"), col("c_mktsegment"), col("n_1995"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment, n_1995
    FROM (SELECT o_custkey, COUNT(*) AS n_1995 FROM orders
          WHERE year(o_orderdate) = 1995 GROUP BY o_custkey) o
    RIGHT JOIN customer ON o_custkey = c_custkey
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q57
  /** Map-type surface: `from_json` to MapType (schema-free key space, vs
    * q49's fixed struct) + map_keys / map_values / element_at. Collections
    * are emitted comma-joined (scalar output columns only, per the
    * determinism contract). Like q49, the map is parsed ONCE into a named
    * column the three outputs reference — CollapseProject declines to
    * inline a non-cheap alias used more than once, so the optimized plan
    * carries exactly one `from_json` instead of leaning on codegen
    * subexpression elimination to rescue a triple parse. */
  val q57 = QueryDef(
    "q57_map_funcs",
    (spark, dir) => {
      val e = Tables(spark, dir).events
      e.filter(col("props").rlike("^\\{\"k\": [0-9]+\\}$"))
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), ",").as("ks"),
          array_join(transform(map_values(col("m")), v => v.cast("string")), ",").as("vs"),
          element_at(col("m"), lit("k")).as("k"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
      array_to_string(json_keys(props), ',') AS ks,
      CAST(CAST(json_extract_string(props, '$.k') AS INT) AS VARCHAR) AS vs,
      CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    WHERE regexp_matches(props, '^\{"k": [0-9]+\}$')
    ORDER BY event_id"""))

  // ---------------------------------------------------------------- q73
  /** Semi-structured VARIANT surface (new public type in Spark 4):
    * `try_parse_json` decodes the JSON string ONCE into the binary
    * variant encoding, and `variant_get` does typed path access on that
    * encoding. Against repeated `get_json_object` calls (q19) this
    * re-parses nothing per field — the decode cost is paid once per row
    * however many paths are read, which is the difference that matters
    * on a 100 TB semi-structured column. `try_parse_json` (not
    * `parse_json`) keeps a malformed payload row-local null instead of a
    * job-killing exception, and `try_variant_get` (not `variant_get`,
    * which throws on cast failure) does the same for a VALID payload
    * whose field doesn't cast — `{"k": "abc"}` becomes a row-local null,
    * not a dead job (ADVICE round 3; the oracle's TRY_CAST mirrors it).
    * Oracle: DuckDB's JSON path functions compute the same typed
    * extraction from the raw string. */
  val q73 = QueryDef(
    "q73_variant_agg",
    (spark, dir) => {
      val e = Tables(spark, dir).events
      e.select(
          try_variant_get(try_parse_json(col("props")), "$.k", "int").as("k"),
          col("value"))
        .filter(col("k").isNotNull)
        .groupBy(col("k"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("k"))
    },
    Some(s"""SELECT TRY_CAST(json_extract_string(props, '$$.k') AS INT) AS k,
      COUNT(*) AS n_events,
      ${sqlDsum("value")} AS sum_value
    FROM events
    WHERE props IS NOT NULL AND json_valid(props)
      AND TRY_CAST(json_extract_string(props, '$$.k') AS INT) IS NOT NULL
    GROUP BY 1
    ORDER BY 1"""))

  // ---------------------------------------------------------------- q81
  /** Correlated LATERAL subquery through the SQL front door — per outer
    * row, a dependent ordered-limit subquery (top-2 customers by balance
    * per nation). Catalyst handles this via lateral-join decorrelation
    * (`DecorrelateInnerQuery` rewrites the per-row LIMIT into a
    * partitioned ranking) — a different optimizer path from the window
    * formulation q20 uses directly and from q17/q18's scalar/EXISTS
    * decorrelation. DuckDB executes the identical SQL, so the oracle is
    * the same text modulo table names.
    *
    * Determinism: ORDER BY inside the lateral carries a full tie-break
    * (balance DESC, then name); balances are pass-through parquet
    * doubles — no arithmetic, so raw doubles are safe in the output.
    *
    * Scale: decorrelation turns the per-row subquery into one join +
    * per-key ranking — the nation side is a 25-row dimension; no
    * O(outer × inner) nested loop survives in the plan. */
  val q81 = QueryDef(
    "q81_lateral_topn",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.nation.createOrReplaceTempView("q81_nation")
      t.customer.createOrReplaceTempView("q81_customer")
      spark.sql("""
        SELECT n.n_name, l.c_name, l.c_acctbal
        FROM q81_nation n,
        LATERAL (SELECT c_name, c_acctbal FROM q81_customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC NULLS LAST, c_name ASC NULLS FIRST
                 LIMIT 2) l
        ORDER BY n.n_name ASC NULLS FIRST, l.c_acctbal DESC NULLS LAST,
          l.c_name ASC NULLS FIRST""")
    },
    Some("""SELECT n.n_name, l.c_name, l.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC NULLS LAST, c_name ASC NULLS FIRST
             LIMIT 2) l
    ORDER BY n.n_name ASC NULLS FIRST, l.c_acctbal DESC NULLS LAST,
      l.c_name ASC NULLS FIRST"""))

  // ---------------------------------------------------------------- q87
  /** Changelog compaction — the upsert-with-tombstones merge an
    * incremental-ingest pipeline runs to turn an event log into current
    * state (the Kafka log-compaction / SCD type-1 MERGE semantic). Each
    * `events` row is an upsert keyed by `user_id`; `event_type = 'error'`
    * plays the delete tombstone (fixture-driven stand-in — a real
    * changelog has an op column). The compacted state keeps, per key,
    * only the LATEST row in the `(ts, event_id)` total order, and a key
    * whose latest row is a tombstone disappears entirely.
    *
    * Spark shape: `max_by(payload_struct, struct(ts, event_id))` — an
    * associative, map-side-combinable agg, so compaction is ONE
    * partial+final aggregate whose single shuffle carries one struct per
    * (partition, key). The struct-typed buffer disqualifies HashAggregate,
    * so the plan is a partial+final SortAggregate (in-partition sort by
    * key, no extra exchange) — the property that matters at scale is the
    * partial collapse before the exchange, which the window form lacks
    * entirely.
    * The textbook `row_number() = 1` window form (what the oracle states,
    * since DuckDB lacks struct-ordered max_by) must instead shuffle every
    * changelog row and sort each key's history — strictly worse at
    * 100 TB, where key cardinality is huge and history is long. Ties are
    * impossible (`event_id` is unique and tiebreaks `ts`), timestamps are
    * emitted as BIGINT epoch micros (determinism rule 5) computed with
    * the same ns→µs floor division `Tables.events` applies on read. */
  /** The q87 pipeline over an arbitrary changelog frame with columns
    * `(user_id, event_type, value, event_id, ts)` — the spec drives it
    * with synthetic tombstone histories. */
  private[graft] def compactOn(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_type"), col("value"), col("event_id"), col("ts")),
        struct(col("ts"), col("event_id"))).as("last"))
      .filter(col("last.event_type") =!= "error")
      .select(col("user_id"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"),
        col("last.event_id").as("last_event_id"),
        unix_micros(col("last.ts")).as("last_ts_us"))
      .orderBy(col("user_id"))

  val q87 = QueryDef(
    "q87_changelog_compact",
    (spark, dir) => compactOn(Tables(spark, dir).events),
    Some("""WITH rk AS (
      SELECT user_id, event_type, value, event_id,
        epoch_ns(ts) // 1000 AS ts_us,
        row_number() OVER (PARTITION BY user_id
          ORDER BY epoch_ns(ts) // 1000 DESC NULLS LAST,
                   event_id DESC NULLS LAST) AS rn
      FROM events)
    SELECT user_id, event_type AS last_type, value AS last_value,
      event_id AS last_event_id, ts_us AS last_ts_us
    FROM rk WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id ASC NULLS FIRST"""))

  // --------------------------------------------------------------- q119
  /** Market-basket co-occurrence mining: the top-20 part pairs bought
    * together in the same order — the association-mining primitive
    * behind "related items" and feature co-occurrence screens.
    *
    * The pair explosion is PER BASKET, not per corpus: the self-join is
    * an EQUI-join on `l_orderkey` with `p1 < p2`, so fan-out per order
    * is C(k,2) for basket size k (fixture max 17 → ≤ 136 pairs/order;
    * a pathological million-item basket is a data bug the pipeline caps
    * upstream, not a join strategy problem). One hash aggregate on the
    * pair key (map-side combinable), then TakeOrdered for the top-20 —
    * never a global sort. This is a-priori's support-counting first
    * pass; higher-order itemsets iterate the same bounded join. */
  val q119 = QueryDef(
    "q119_cooccurrence",
    (spark, dir) =>
      // reads the memoized support view (round 17): the basket
      // self-join is the q162/edge-view pipeline, expanded once
      Analytic.coPurchaseSupport(spark, dir)
        .select(col("u").as("p1"), col("v").as("p2"), col("n_orders"))
        .orderBy(col("n_orders").desc_nulls_last,
          col("p1").asc_nulls_first, col("p2").asc_nulls_first)
        .limit(20),
    Some("""WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC NULLS LAST, p1 ASC NULLS FIRST, p2 ASC NULLS FIRST
    LIMIT 20"""))

  // --------------------------------------------------------------- q162
  /** Association rules over co-purchase pairs — the a-priori SECOND
    * stage on top of q119's support counting: for every part pair with
    * support ≥ 3, both directional rules ante→cons with exact-integer
    * confidence (P(cons|ante)) and lift (observed/expected co-rate),
    * the "related items" ranking signal.
    *
    * Shape: the distinct (order, part) item frame is computed once and
    * reused by all three consumers (pair counts, per-part margins, the
    * 1-row order total). The pair explosion stays the q119 equi-join —
    * C(k,2) per basket, never a corpus cross product — and the margin
    * attach is a plain equi-join on the part key (broadcast at fixture
    * scale, shuffled at 100 TB; either way never quadratic). The
    * support ≥ 3 filter lands BEFORE the margin joins, so only
    * surviving pairs move.
    *
    * Determinism/width: confidence and lift are integral ppm divides
    * routed through DECIMAL(38,0) BEFORE any multiply — at 100 TB the
    * margin product c(a)·c(c) and n·c(a,c)·10⁶ both pass int64 (the
    * q137/q156 envelope pattern); headroom inside DECIMAL(38,0) is
    * ~10²⁶ ≪ 10³⁸. Total order: lift desc, then the rule key. */
  val q162 = QueryDef(
    "q162_assoc_rules",
    (spark, dir) => {
      val items = graft.Materialize.cut(
        Tables(spark, dir).lineitem
          .select(col("l_orderkey"), col("l_partkey")).distinct())
      val nOrders = items.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val margin = items.groupBy(col("l_partkey").as("p"))
        .agg(count(lit(1)).as("c_p"))
      // support counts from the memoized view (round 17) — the basket
      // self-join runs once per session under view_copurchase_support
      val pairs = Analytic.coPurchaseSupport(spark, dir)
        .select(col("u"), col("v"), col("n_orders").as("support"))
        .filter(col("support") >= 3)
      val rules = pairs.select(col("u").as("ante"), col("v").as("cons"), col("support"))
        .unionByName(pairs.select(col("v").as("ante"), col("u").as("cons"), col("support")))
      rules
        .join(margin.select(col("p").as("ante"), col("c_p").as("c_a")), "ante")
        .join(margin.select(col("p").as("cons"), col("c_p").as("c_c")), "cons")
        .crossJoin(broadcast(nOrders))
        .select(col("ante"), col("cons"), col("support"),
          expr("""CAST(CAST(support AS DECIMAL(38,0)) * 1000000
            div CAST(c_a AS DECIMAL(38,0)) AS BIGINT)""").as("confidence_ppm"),
          expr("""CAST(CAST(n_orders AS DECIMAL(38,0)) * support * 1000000
            div (CAST(c_a AS DECIMAL(38,0)) * c_c) AS BIGINT)""").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc_nulls_last,
          col("ante").asc_nulls_first, col("cons").asc_nulls_first)
        .limit(50)
    },
    Some("""WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
    margin AS (SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS c_p
      FROM items GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    rules AS (
      SELECT u AS ante, v AS cons, support FROM pairs
      UNION ALL SELECT v, u, support FROM pairs)
    SELECT r.ante, r.cons, r.support,
      CAST(CAST(r.support AS HUGEINT) * 1000000 // ma.c_p AS BIGINT) AS confidence_ppm,
      CAST(CAST(n.n_orders AS HUGEINT) * r.support * 1000000
        // (CAST(ma.c_p AS HUGEINT) * mc.c_p) AS BIGINT) AS lift_ppm
    FROM rules r
    JOIN margin ma ON ma.p = r.ante
    JOIN margin mc ON mc.p = r.cons
    CROSS JOIN n
    ORDER BY lift_ppm DESC NULLS LAST, ante ASC NULLS FIRST, cons ASC NULLS FIRST
    LIMIT 50"""))

  // --------------------------------------------------------------- q175
  /** Next-basket sequence rules — the SEQUENTIAL sibling of q162's
    * within-basket rules and q149's event-type Markov matrix: for every
    * part pair (x, y), how often a customer's NEXT order contains y
    * given the current order contains x — the next-basket
    * recommendation signal, stated as exact-integer confidence
    * P(y ∈ next | x ∈ current) and lift against y's base next-basket
    * rate.
    *
    * Shape: consecutive order pairs come from ONE customer-partitioned
    * lag window (never a self-join on the order table); the pair frame
    * is cut once and feeds the x-side attach, the y-side attach and the
    * 1-row pair total. Baskets attach by order-key equi-joins, so the
    * per-pair fan-out is |basket₁|·|basket₂| (the q119 C(k,·) class,
    * bounded by basket size — never corpus-quadratic). Margins are the
    * x/y attach frames re-aggregated. Only pairs and items are cut —
    * they keep the executed plan scan-free (PlanSpec) and feed 3/2
    * consumers; cutting the xs/ys attach frames was measured NOT to pay
    * (round 15: 5.5 → 4.2 s warm at sf0.1 dropping them — each attach
    * is one equi-join over already-checkpointed inputs, cheaper to
    * recompute for its second consumer than to materialize ~½M rows).
    * Support ≥ 2 lands BEFORE the margin joins; output is the top-50 by
    * lift under the q162 total tie order. Determinism/width: ppm
    * divides routed through DECIMAL(38,0) pre-multiply (q162's
    * envelope). */
  val q175 = QueryDef(
    "q175_sequence_rules",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val pairs = graft.Materialize.cut(
        Tables(spark, dir).orders
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
          .withColumn("k1", lag(col("o_orderkey"), 1).over(w))
          .filter(col("k1").isNotNull)
          .select(col("k1"), col("o_orderkey").as("k2")))
      val items = graft.Materialize.cut(
        Tables(spark, dir).lineitem
          .select(col("l_orderkey"), col("l_partkey")).distinct())
      val nPairs = pairs.agg(count(lit(1)).as("n_pairs"))
      val xs =
        pairs.join(items.select(col("l_orderkey").as("k1"),
          col("l_partkey").as("px")), "k1").select(col("k2"), col("px"))
      val ys =
        pairs.join(items.select(col("l_orderkey").as("k2"),
          col("l_partkey").as("py")), "k2").select(col("k2"), col("py"))
      val trans = xs.join(ys, "k2")
        .groupBy(col("px"), col("py")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
      val xm = xs.groupBy(col("px")).agg(count(lit(1)).as("c_x"))
      val ym = ys.groupBy(col("py")).agg(count(lit(1)).as("c_y"))
      trans.join(xm, "px").join(ym, "py")
        .crossJoin(broadcast(nPairs))
        .select(col("px").as("ante"), col("py").as("cons"), col("support"),
          expr("""CAST(CAST(support AS DECIMAL(38,0)) * 1000000
            div CAST(c_x AS DECIMAL(38,0)) AS BIGINT)""").as("confidence_ppm"),
          expr("""CAST(CAST(n_pairs AS DECIMAL(38,0)) * support * 1000000
            div (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)""").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc_nulls_last,
          col("ante").asc_nulls_first, col("cons").asc_nulls_first)
        .limit(50)
    },
    Some("""WITH o AS (
      SELECT o_custkey, o_orderkey,
        lag(o_orderkey) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate ASC, o_orderkey ASC) AS k1
      FROM orders),
    p AS (SELECT k1, o_orderkey AS k2 FROM o WHERE k1 IS NOT NULL),
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    xs AS (SELECT p.k2, i.l_partkey AS px FROM p JOIN items i ON i.l_orderkey = p.k1),
    ys AS (SELECT p.k2, i.l_partkey AS py FROM p JOIN items i ON i.l_orderkey = p.k2),
    t AS (SELECT px, py, CAST(COUNT(*) AS BIGINT) AS support
      FROM xs JOIN ys USING (k2) GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    xm AS (SELECT px, CAST(COUNT(*) AS BIGINT) AS c_x FROM xs GROUP BY 1),
    ym AS (SELECT py, CAST(COUNT(*) AS BIGINT) AS c_y FROM ys GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p)
    SELECT t.px AS ante, t.py AS cons, t.support,
      CAST(CAST(t.support AS HUGEINT) * 1000000 // xm.c_x AS BIGINT)
        AS confidence_ppm,
      CAST(CAST(n.n_pairs AS HUGEINT) * t.support * 1000000
        // (CAST(xm.c_x AS HUGEINT) * ym.c_y) AS BIGINT) AS lift_ppm
    FROM t JOIN xm USING (px) JOIN ym USING (py) CROSS JOIN n
    ORDER BY lift_ppm DESC NULLS LAST, ante ASC NULLS FIRST, cons ASC NULLS FIRST
    LIMIT 50"""))

  override def queries: Seq[QueryDef] =
    Seq(q28, q29, q35, q49, q50, q51, q52, q53, q54, q56, q57, q73, q81, q82,
      q87, q119, q162, q175)
}
