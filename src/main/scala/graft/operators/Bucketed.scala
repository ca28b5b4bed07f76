package graft.operators

import graft.{Det, QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) storage for co-located fact-fact joins.
  *
  * Bucketing moves the join shuffle from query time to write time: both
  * fact tables are hash-partitioned on the join key into the same bucket
  * count when they are WRITTEN, so every later join on that key zips
  * co-located buckets with NO exchange on either side. At 100 TB this is
  * the difference between re-shuffling the fact tables on every run of a
  * recurring pipeline (orders ⋈ lineitem is the archetype — the reference's
  * daily DAG re-processes the same feeds each midnight,
  * `dags/update_tr_from_ex_dag.py:82`) and paying the shuffle once at
  * ingest. The same layout also serves bucket pruning on key-equality
  * filters and exchange-free aggregation on the bucket key.
  *
  * Scale notes (100 TB): [[Buckets]] is the deploy-time knob — production
  * bucket counts are sized so one bucket of the LARGER table fits an
  * executor's shuffle memory (thousands of buckets at 100 TB, 16 at
  * fixture scale; both sides must agree exactly, Spark refuses co-location
  * otherwise). The writer repartitions by the bucket key first so every
  * bucket lands as one file per table; the sort-merge join then reads
  * co-located buckets with ZERO Exchange on either side. Spark ≥3.0
  * does insert a LOCAL per-bucket sort above each scan (it stopped
  * trusting written bucket order by default —
  * `spark.sql.legacy.bucketedTableScan.outputOrdering` — because multi-
  * file buckets would need a merge-sort): that sort is in-memory within
  * an already co-partitioned task, no network, and is asserted local-only
  * (`global=false`) in `BucketedJoinSpec`. The one-time write is itself a
  * plain shuffle, amortized across every subsequent join; nothing here
  * collects to the driver.
  */
object Bucketed extends QueryPack {
  import Det._

  /** Bucket count both tables agree on. Fixture-sized; at deploy scale
    * this is thousands (one bucket of lineitem ≲ executor memory). */
  val Buckets = 16

  /** Bucketed copies live outside the repo and outside the (static)
    * warehouse dir: one fresh temp root per JVM, so stale files from a
    * dead run can never be read — the session catalog and the files are
    * always written together. Deleted on JVM exit (best-effort), so
    * repeated bench/verify JVMs don't accumulate table copies in /tmp. */
  private lazy val root: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_bucketed")
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

  /** Table names are keyed by (temp root, dir): the root is fresh per
    * JVM, so even against a PERSISTENT metastore a previous JVM's
    * catalog entries (whose files died with its temp root) can never
    * alias this JVM's tables — `tableExists` is true only for tables
    * whose files this JVM wrote. */
  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$root|$dir".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Idempotently materializes bucketed+sorted copies of `orders` and
    * `lineitem` for `dir` (bucketed on the order key) and returns their
    * catalog names. First call per (JVM, dir) pays the one-time
    * repartition+write; later calls — and the second leg of the bench's
    * min-of-2 — reuse the catalog entries, which is exactly the
    * amortization bucketing exists for. Both tables are checked (not
    * just the first-written one), so a failure mid-materialization —
    * lineitem landed, orders didn't — self-heals on the next call via
    * the overwrite instead of latching the JVM onto a dangling name. */
  private[graft] def ensureTables(spark: SparkSession, dir: String): (String, String) =
    lock.synchronized {
      val t = tag(dir)
      val li = s"graft_bkt_lineitem_$t"
      val ord = s"graft_bkt_orders_$t"
      def write(df: DataFrame, key: String, name: String): Unit =
        df.repartition(Buckets, col(key)) // one file per bucket → written sort order is trusted
          .write.mode("overwrite")
          .bucketBy(Buckets, key).sortBy(key)
          .option("path", s"$root/$name")
          .format("parquet").saveAsTable(name)
      if (!spark.catalog.tableExists(li) || !spark.catalog.tableExists(ord)) {
        val tb = Tables(spark, dir)
        write(tb.lineitem, "l_orderkey", li)
        write(tb.orders, "o_orderkey", ord)
      }
      (li, ord)
    }

  /** The co-located join: merge-hinted so the plan is a sort-merge join
    * at every SF (a broadcast pick at fixture scale would hide the
    * zero-exchange property this operator exists for), joining on the
    * shared bucket key so neither side shuffles. The only hash exchange
    * in the whole plan is the final group-by's. */
  private[graft] def coLocatedJoinPipeline(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = ensureTables(spark, dir)
    val l = spark.table(li).hint("merge")
    val o = spark.table(ord).hint("merge")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_linestatus"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** Literal keys for the q94 point lookup — orderkeys are dense 0..N−1
    * in the fixture at every SF, so these exist at sf0.001 through
    * sf0.1. 8 keys hash into ≤ 8 of the 16 buckets. */
  private[graft] val PointKeys: Seq[Long] = Seq(2L, 5L, 11L, 19L, 23L, 42L, 77L, 101L)

  /** q94 pipeline: the two non-join payoffs of the bucketed layout in one
    * query. The `IN` on the bucket key prunes the scan to the buckets
    * those keys hash into (≤ 8 of 16 — `SelectedBucketsCount` in the
    * plan), and the group-by on the bucket key aggregates with NO hash
    * exchange: the scan's bucketed distribution already satisfies the
    * aggregation's requirement, so partial and final collapse into one
    * stage. Both properties are asserted in BucketedJoinSpec; at 100 TB
    * they make key-scoped audits ("show me these 8 orders") touch 1/2 of
    * the files and zero network. */
  private[graft] def pointLookupAggPipeline(spark: SparkSession, dir: String): DataFrame = {
    val (li, _) = ensureTables(spark, dir)
    spark.table(li)
      .filter(col("l_orderkey").isin(PointKeys: _*))
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("l_orderkey").asc_nulls_first)
  }

  // ---------------------------------------------------------------- q88
  /** Revenue rollup over the bucketed orders ⋈ lineitem join. Same
    * answer as the plain-parquet join (the oracle runs on the original
    * tables — bucketing is a layout choice, not a semantic one); the
    * plan property that makes it a distinct operator is asserted in
    * BucketedJoinSpec. */
  val q88 = QueryDef(
    "q88_bucketed_join",
    (spark, dir) => coLocatedJoinPipeline(spark, dir),
    Some(s"""SELECT o_orderpriority, l_linestatus,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority, l_linestatus
    ORDER BY o_orderpriority NULLS FIRST, l_linestatus NULLS FIRST"""))

  // ---------------------------------------------------------------- q94
  /** Bucket-pruned point lookup + exchange-free bucket-key aggregation.
    * Same answer as the plain-parquet filter+agg (the oracle runs on the
    * original lineitem — layout, not semantics); the pruning and the
    * missing exchange are the operator, plan-asserted in
    * BucketedJoinSpec. */
  val q94 = QueryDef(
    "q94_bucket_prune_agg",
    (spark, dir) => pointLookupAggPipeline(spark, dir),
    Some(s"""SELECT l_orderkey, COUNT(*) AS n_items,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    WHERE l_orderkey IN (2, 5, 11, 19, 23, 42, 77, 101)
    GROUP BY l_orderkey
    ORDER BY l_orderkey NULLS FIRST"""))

  override def queries: Seq[QueryDef] = Seq(q88, q94)
}
