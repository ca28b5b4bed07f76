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
}
