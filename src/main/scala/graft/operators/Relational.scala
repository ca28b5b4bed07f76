package graft.operators

import graft.{Det, QueryDef, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Core relational operator pack over the star schema: scan → filter →
  * project, hash aggregation, every join family (broadcast, sort-merge,
  * semi/anti, outer, range/theta, cross), set ops, rollup/cube, scalar
  * subqueries and the scalar function surface.
  *
  * Pipeline heritage: the reference (Artemia-project/artemia-airflow) moves
  * JSON rows between HTTP tasks (`dags/update_tr_from_ex_dag.py:93-154`);
  * its relational analogue is a daily summary over the fact tables, which
  * is exactly what this pack computes — declaratively, so Catalyst handles
  * pushdown, pruning, join selection and whole-stage codegen.
  *
  * Scale notes (100 TB): dimension joins (`region`, `nation`, small
  * `part`/`supplier` slices) are explicitly `broadcast()` so the big fact
  * scan never shuffles for them; fact-fact joins (orders ⋈ lineitem) are
  * left to Catalyst/AQE which picks shuffled hash or sort-merge and splits
  * skewed partitions at runtime. Aggregations are partial+final hash aggs
  * (map-side combine), so shuffle volume is #groups, not #rows.
  */
object Relational extends QueryPack {
  import Det._

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-shaped pricing summary — the flagship scan→filter→agg→sort. */
  val q01 = QueryDef(
    "q01_pricing_summary",
    (spark, dir) => {
      val li = Tables(spark, dir).lineitem
      li.filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
      ${sqlDavg("l_quantity")} AS avg_qty,
      ${sqlDavg("l_extendedprice")} AS avg_price,
      ${sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  /** Filter/project pack: BETWEEN, IN, LIKE, CASE WHEN — all pushdown-able
    * predicates that must reach the parquet scan. */
  val q02 = QueryDef(
    "q02_filter_project",
    (spark, dir) => {
      val p = Tables(spark, dir).part
      p.filter(
          col("p_size").between(10, 30) &&
          col("p_type").isin("ECONOMY", "PROMO", "STANDARD") &&
          col("p_brand").like("Brand#1%"))
        .select(
          col("p_partkey"),
          col("p_name"),
          col("p_brand"),
          when(col("p_retailprice") < 500, "cheap")
            .when(col("p_retailprice") < 1500, "mid")
            .otherwise("premium").as("price_band"),
          col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, p_name, p_brand,
      CASE WHEN p_retailprice < 500 THEN 'cheap'
           WHEN p_retailprice < 1500 THEN 'mid'
           ELSE 'premium' END AS price_band,
      p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_type IN ('ECONOMY','PROMO','STANDARD')
      AND p_brand LIKE 'Brand#1%'
    ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q03
  /** Multi-way star join: region→nation→customer→orders→lineitem revenue
    * rollup. Dims broadcast; fact joins shuffled (AQE re-plans skew). */
  val q03 = QueryDef(
    "q03_star_revenue",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(s"""SELECT r_name, n_name,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name"""))

  // ---------------------------------------------------------------- q04
  /** Top-k after aggregation → Catalyst's TakeOrderedAndProject (no full
    * sort of the aggregate output at scale). */
  val q04 = QueryDef(
    "q04_top_customers",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    },
    Some(s"""SELECT c_custkey, c_name,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC NULLS LAST, c_custkey
    LIMIT 10"""))

  // ---------------------------------------------------------------- q05
  /** Left-semi join (EXISTS): customers having ≥1 'O'-status order. */
  val q05 = QueryDef(
    "q05_semi_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q06
  /** Left-anti join (NOT EXISTS): customers with no pending orders. */
  val q06 = QueryDef(
    "q06_anti_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q07
  /** Left-outer join + null-handling aggregation: every customer with
    * order count and total spend (0 for the order-less). */
  val q07 = QueryDef(
    "q07_outer_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy(col("c_custkey"))
    },
    Some(s"""SELECT c_custkey, c_name,
      COUNT(o_orderkey) AS n_orders,
      COALESCE(${sqlDsum("o_totalprice")}, 0.0) AS total_spend
    FROM customer
    LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q08
  /** Set ops: customers ordering in both 1995 and 1996 (INTERSECT) minus
    * those who ever cancelled... kept to INTERSECT/EXCEPT distinct
    * semantics, identical in Spark and ANSI SQL. */
  val q08 = QueryDef(
    "q08_set_ops",
    (spark, dir) => {
      val o = Tables(spark, dir).orders
      val y1995 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y1996 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      val fStat = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      y1995.intersect(y1996).except(fStat)
        .orderBy(col("o_custkey"))
    },
    Some("""(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
     INTERSECT
     SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey"""))

  // ---------------------------------------------------------------- q09
  /** Distinct aggregation: exact COUNT(DISTINCT) per group (Spark expands
    * to a two-phase agg — no driver-side work). */
  val q09 = QueryDef(
    "q09_distinct_agg",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("o_custkey")).as("n_buyers"),
          countDistinct(col("o_orderpriority")).as("n_priorities"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
      COUNT(DISTINCT o_custkey) AS n_buyers,
      COUNT(DISTINCT o_orderpriority) AS n_priorities,
      COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""))

  // ---------------------------------------------------------------- q10
  /** ROLLUP with grouping_id: nation × segment customer profile with
    * subtotals and grand total. */
  val q10 = QueryDef(
    "q10_rollup",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_customers"),
          davg(col("c_acctbal")).as("avg_bal"),
          grouping_id().cast(IntegerType).as("gid"))
        .select(col("n_name"), col("c_mktsegment"), col("gid"),
          col("n_customers"), col("avg_bal"))
        .orderBy(col("gid"), col("n_name").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first)
    },
    Some(s"""SELECT n_name, c_mktsegment,
      CAST(GROUPING(n_name, c_mktsegment) AS INT) AS gid,
      COUNT(*) AS n_customers,
      ${sqlDavg("c_acctbal")} AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST"""))

  // ---------------------------------------------------------------- q11
  /** CUBE over returnflag × linestatus with all margins. */
  val q11 = QueryDef(
    "q11_cube",
    (spark, dir) => {
      val li = Tables(spark, dir).lineitem
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
          grouping_id().cast(IntegerType).as("gid"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("n"), col("qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
      COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  // ---------------------------------------------------------------- q12
  /** CASE-bucketed histogram of order value. */
  val q12 = QueryDef(
    "q12_case_bucket",
    (spark, dir) => {
      val o = Tables(spark, dir).orders
      o.select(
          when(col("o_totalprice") < 50000, "S")
            .when(col("o_totalprice") < 150000, "M")
            .when(col("o_totalprice") < 300000, "L")
            .otherwise("XL").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), davg(col("o_totalprice")).as("avg_price"))
        .orderBy(col("bucket"))
    },
    Some(s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'S'
                 WHEN o_totalprice < 150000 THEN 'M'
                 WHEN o_totalprice < 300000 THEN 'L'
                 ELSE 'XL' END AS bucket,
      COUNT(*) AS n, ${sqlDavg("o_totalprice")} AS avg_price
    FROM orders
    GROUP BY 1
    ORDER BY bucket"""))

  // ---------------------------------------------------------------- q13
  /** Scalar string-function surface: upper/substring/concat/length/
    * replace/regexp/split — all codegen'd built-ins. */
  val q13 = QueryDef(
    "q13_string_funcs",
    (spark, dir) => {
      val p = Tables(spark, dir).part
      p.select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          concat(col("p_type"), lit("/"), col("p_brand")).as("type_brand"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          split(col("p_brand"), "#").getItem(1).as("brand_num"),
          levenshtein(col("p_brand"), lit("Brand#1")).as("brand_dist"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey,
      UPPER(p_brand) AS brand_uc,
      SUBSTRING(p_name, 1, 8) AS name_prefix,
      CAST(LENGTH(p_name) AS INT) AS name_len,
      p_type || '/' || p_brand AS type_brand,
      REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
      STRING_SPLIT(p_brand, '#')[2] AS brand_num,
      CAST(levenshtein(p_brand, 'Brand#1') AS INT) AS brand_dist
    FROM part
    ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q14
  /** Date/time function surface: year/month/day, date_trunc, datediff. */
  val q14 = QueryDef(
    "q14_date_funcs",
    (spark, dir) => {
      val o = Tables(spark, dir).orders
      o.select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("quarter_start"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
      CAST(year(o_orderdate) AS INT) AS yr,
      CAST(month(o_orderdate) AS INT) AS mo,
      CAST(day(o_orderdate) AS INT) AS dom,
      CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
      CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
    FROM orders
    ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q15
  /** Range/theta join: equi-key on nation + inequality on balance.
    * Catalyst plans equi part as hash join, residual as filter — the
    * scalable shape for mixed predicates. */
  val q15 = QueryDef(
    "q15_range_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.supplier.join(t.customer,
          col("s_nationkey") === col("c_nationkey") &&
          col("s_acctbal") < col("c_acctbal"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_richer_customers"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, s_name, COUNT(*) AS n_richer_customers
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    GROUP BY s_suppkey, s_name
    ORDER BY s_suppkey"""))

  // ---------------------------------------------------------------- q16
  /** Cross join (small dims only — 5 regions × 5 segments). */
  val q16 = QueryDef(
    "q16_cross_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val segs = t.customer.select(col("c_mktsegment")).distinct()
      t.region.select(col("r_name")).crossJoin(segs)
        .orderBy(col("r_name"), col("c_mktsegment"))
    },
    Some("""SELECT r_name, c_mktsegment
    FROM (SELECT r_name FROM region)
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
    ORDER BY r_name, c_mktsegment"""))

  // ---------------------------------------------------------------- q17
  /** Scalar subquery: lineitems above global average quantity. The
    * 1-row aggregate is broadcast — no driver round-trip. */
  val q17 = QueryDef(
    "q17_scalar_subquery",
    (spark, dir) => {
      val li = Tables(spark, dir).lineitem
      val avgQty = li.agg(davg(col("l_quantity")).as("aq"))
      li.crossJoin(broadcast(avgQty))
        .filter(col("l_quantity") > col("aq"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_above_avg"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n_above_avg
    FROM lineitem
    WHERE l_quantity > (SELECT ${sqlDavg("l_quantity")} FROM lineitem)
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q18
  /** Per-group correlated threshold (decorrelated by Catalyst): orders
    * above their customer's average order value. */
  val q18 = QueryDef(
    "q18_correlated_subquery",
    (spark, dir) => {
      val o = Tables(spark, dir).orders
      val perCust = o.groupBy(col("o_custkey").as("k"))
        .agg(davg(col("o_totalprice")).as("cust_avg"))
      o.join(perCust, col("o_custkey") === col("k"))
        .filter(col("o_totalprice") > col("cust_avg") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    JOIN (SELECT o_custkey AS k, ${sqlDavg("o_totalprice")} AS cust_avg
          FROM orders GROUP BY o_custkey) c ON o.o_custkey = c.k
    WHERE o_totalprice > cust_avg * 1.5
    ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q19
  /** Semi-structured JSON ingestion: events.props is a JSON string (the
    * reference's payloads are JSON-over-HTTP, update_tr_from_ex_dag.py:103);
    * extract, type and aggregate it. */
  val q19 = QueryDef(
    "q19_json_extract",
    (spark, dir) => {
      val e = Tables(spark, dir).events
      e.select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
          col("value"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""SELECT event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$$.k') AS INT)) AS BIGINT) AS sum_k,
      ${sqlDsum("value")} AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type"""))

  // --------------------------------------------------------------- q238
  /** Referential-integrity audit across the whole star schema — the
    * nightly data-quality gate a warehouse runs before anything
    * downstream trusts a landing: for every foreign-key relation, the
    * row count, the ORPHAN count (non-null FK with no matching
    * dimension key — q06's anti-join semantics applied as a census) and
    * the null-FK count. A clean estate is all-zero orphan rows; any
    * non-zero row names the broken feed and the broken edge.
    *
    * Scale shape: each relation is one left join of the fact's FK
    * column against the dimension's DISTINCT key set — the small dims
    * (region/nation/customer/part/supplier at fixture scale) broadcast;
    * the one fact-fact edge (lineitem → orders) shuffles on the key
    * exactly like q03's star join and AQE skew-splits it. Everything
    * folds map-side to ONE row per relation before the 7-row union —
    * at 100 TB a bloom-filter pre-gate (`graft_bloom_agg`) on the dim
    * keys would cut the shuffled fact volume to near-misses only, the
    * standard large-estate variant of this audit. The oracle joins
    * against the same DISTINCT key sets so duplicate-pk estates would
    * diverge in neither engine. */
  /** One FK-relation audit row — factored so the spec can drive it on
    * synthetic frames with injected orphans/null FKs. */
  private[graft] def fkAudit(name: String, fact: org.apache.spark.sql.DataFrame,
      fk: String, dim: org.apache.spark.sql.DataFrame, pk: String,
      bcast: Boolean): org.apache.spark.sql.DataFrame = {
    val keys0 = dim.select(col(pk).as("k")).distinct()
      .withColumn("hit", lit(1))
    val keys = if (bcast) broadcast(keys0) else keys0
    fact.select(col(fk).as("k"))
      .join(keys, Seq("k"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("k").isNotNull && col("hit").isNull, 1L)
          .otherwise(0L)).as("n_orphans"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_fk"))
      .select(lit(name).as("relation"), col("n_rows"),
        col("n_orphans"), col("n_null_fk"))
  }

  val q238 = QueryDef(
    "q238_referential_integrity",
    (spark, dir) => {
      val t = Tables(spark, dir)
      def audit(name: String, fact: org.apache.spark.sql.DataFrame,
          fk: String, dim: org.apache.spark.sql.DataFrame, pk: String,
          bcast: Boolean) = fkAudit(name, fact, fk, dim, pk, bcast)
      Seq(
        audit("customer.nationkey->nation", t.customer, "c_nationkey",
          t.nation, "n_nationkey", bcast = true),
        audit("lineitem.orderkey->orders", t.lineitem, "l_orderkey",
          t.orders, "o_orderkey", bcast = false),
        audit("lineitem.partkey->part", t.lineitem, "l_partkey",
          t.part, "p_partkey", bcast = true),
        audit("lineitem.suppkey->supplier", t.lineitem, "l_suppkey",
          t.supplier, "s_suppkey", bcast = true),
        audit("nation.regionkey->region", t.nation, "n_regionkey",
          t.region, "r_regionkey", bcast = true),
        audit("orders.custkey->customer", t.orders, "o_custkey",
          t.customer, "c_custkey", bcast = true),
        audit("supplier.nationkey->nation", t.supplier, "s_nationkey",
          t.nation, "n_nationkey", bcast = true))
        .reduce(_ unionByName _)
        .orderBy(col("relation").asc_nulls_first)
    },
    Some("""WITH a AS (
      SELECT 'customer.nationkey->nation' AS relation, COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN f.c_nationkey IS NOT NULL AND d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        CAST(SUM(CASE WHEN f.c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_fk
      FROM customer f LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) d ON f.c_nationkey = d.k
      UNION ALL
      SELECT 'lineitem.orderkey->orders', COUNT(*),
        CAST(SUM(CASE WHEN f.l_orderkey IS NOT NULL AND d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(SUM(CASE WHEN f.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem f LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) d ON f.l_orderkey = d.k
      UNION ALL
      SELECT 'lineitem.partkey->part', COUNT(*),
        CAST(SUM(CASE WHEN f.l_partkey IS NOT NULL AND d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(SUM(CASE WHEN f.l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem f LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) d ON f.l_partkey = d.k
      UNION ALL
      SELECT 'lineitem.suppkey->supplier', COUNT(*),
        CAST(SUM(CASE WHEN f.l_suppkey IS NOT NULL AND d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(SUM(CASE WHEN f.l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem f LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) d ON f.l_suppkey = d.k
      UNION ALL
      SELECT 'nation.regionkey->region', COUNT(*),
        CAST(SUM(CASE WHEN f.n_regionkey IS NOT NULL AND d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(SUM(CASE WHEN f.n_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM nation f LEFT JOIN (SELECT DISTINCT r_regionkey AS k FROM region) d ON f.n_regionkey = d.k
      UNION ALL
      SELECT 'orders.custkey->customer', COUNT(*),
        CAST(SUM(CASE WHEN f.o_custkey IS NOT NULL AND d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(SUM(CASE WHEN f.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders f LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) d ON f.o_custkey = d.k
      UNION ALL
      SELECT 'supplier.nationkey->nation', COUNT(*),
        CAST(SUM(CASE WHEN f.s_nationkey IS NOT NULL AND d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(SUM(CASE WHEN f.s_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM supplier f LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) d ON f.s_nationkey = d.k)
    SELECT relation, n_rows, n_orphans, n_null_fk FROM a
    ORDER BY relation ASC NULLS FIRST"""))

  override def queries: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q238)
}
