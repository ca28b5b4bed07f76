package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffling at write time: two tables bucketed by the
  * join key into the same bucket count join with NO exchange on either
  * side — at 100 TB this converts every recurring fact-fact join from a
  * full network shuffle into a local zip of co-located buckets. */
class BucketedJoinSpec extends SparkTestBase {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // tables get explicit external paths, so the (static) warehouse dir
    // is never written to
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    s2.conf.set("spark.sql.sources.bucketing.enabled", "true")

    val o = s2.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li = s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/orders_b").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    val joined = s2.table("lineitem_b")
      .join(s2.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    val exchangesBeforeAgg = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(plan).size
    assert(exchangesBeforeAgg == 0, s"bucketed join still shuffles:\n$plan")
    assert(joined.collect().map(_.getLong(1)).sum == li.count())
  }

  test("q88: join sides neither shuffle nor sort; only the group-by exchanges") {
    val df = Bucketed.coLocatedJoinPipeline(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge hint lost:\n$plan")
    assert("Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(plan).isEmpty, s"bucketed join side shuffles:\n$plan")
    // Spark ≥3.0 re-sorts bucket contents rather than trusting written
    // order (multi-file buckets would need a merge-sort) — but those
    // sorts must stay LOCAL (global=false): in-task, no exchange
    assert("Sort \\[(l_orderkey|o_orderkey)[^\n]*\\], true,".r
      .findAllIn(plan).isEmpty, s"global sort on a bucketed join side:\n$plan")
    // the plan's only hash exchange is the final aggregation's
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"unexpected exchange count:\n$plan")
  }

  test("q88: bucketed layout answers exactly like the plain-parquet join") {
    import graft.{Det, Tables}
    val t = Tables(spark, sf0001)
    val plain = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_linestatus"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
      .collect().toSeq
    val bucketed = Bucketed.coLocatedJoinPipeline(spark, sf0001).collect().toSeq
    assert(bucketed == plain)
    assert(bucketed.nonEmpty)
  }

  test("key-equality filters prune to a single bucket (point lookups skip 15/16 of the scan)") {
    val (li, _) = Bucketed.ensureTables(spark, sf0001)
    // Spark's DisableUnnecessaryBucketedScan heuristic models only
    // distribution/ordering benefit, so it turns bucketed reading OFF for
    // a bare filter and the pruning opportunity with it; an isolated
    // session pins the property the layout provides when the scan is on
    val s2 = spark.newSession() // shares the external catalog
    s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val key = s2.table(li).select(col("l_orderkey")).head().getLong(0)
    val df = s2.table(li).filter(col("l_orderkey") === key)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 16"),
      s"no bucket pruning:\n$plan")
    assert(df.count() > 0)
  }

  test("aggregation on the bucket key runs partial+final with no exchange") {
    val (li, _) = Bucketed.ensureTables(spark, sf0001)
    val agg = spark.table(li).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"))
    val plan = agg.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"bucket-key aggregation still shuffles:\n$plan")
    assert(agg.count() == spark.table(li).select(col("l_orderkey")).distinct().count())
  }

  test("q94: IN-filter prunes buckets AND the bucket-key agg plans no hash exchange") {
    val df = Bucketed.pointLookupAggPipeline(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val selected = "SelectedBucketsCount: (\\d+) out of 16".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(selected.isDefined, s"no bucket pruning in the q94 scan:\n$plan")
    assert(selected.get >= 1 && selected.get <= Bucketed.PointKeys.size,
      s"expected ≤ ${Bucketed.PointKeys.size} buckets selected, got $selected:\n$plan")
    // the scan's bucketed distribution satisfies the group-by: the only
    // exchange in the plan is the final ORDER BY's range partitioning
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"bucket-key aggregation still shuffles:\n$plan")
  }

  test("q94: bucketed point-lookup agg answers exactly like the plain-parquet form") {
    import graft.{Det, Tables}
    val plain = Tables(spark, sf0001).lineitem
      .filter(col("l_orderkey").isin(Bucketed.PointKeys: _*))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("l_orderkey").asc_nulls_first)
      .collect().toSeq
    val bucketed = Bucketed.pointLookupAggPipeline(spark, sf0001).collect().toSeq
    assert(bucketed == plain)
    assert(bucketed.nonEmpty)
  }

  test("q88: table materialization is idempotent per (catalog, dir)") {
    val (li1, o1) = Bucketed.ensureTables(spark, sf0001)
    val n1 = spark.table(li1).count()
    val (li2, o2) = Bucketed.ensureTables(spark, sf0001)
    assert((li1, o1) == (li2, o2))
    assert(spark.table(li2).count() == n1)
  }

  test("q88: a half-materialized state self-heals (both tables checked, not just the first)") {
    val (li, o) = Bucketed.ensureTables(spark, sf0001)
    val nOrders = spark.table(o).count()
    // simulate a failure between the two writes: lineitem landed,
    // orders didn't — the next ensure must re-materialize, not latch
    // onto the dangling name
    spark.sql(s"DROP TABLE $o")
    assert(!spark.catalog.tableExists(o))
    val (li2, o2) = Bucketed.ensureTables(spark, sf0001)
    assert((li2, o2) == (li, o))
    assert(spark.table(o2).count() == nOrders)
  }
}
