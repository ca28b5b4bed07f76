package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WindowOpsSpec extends SparkTestBase {

  test("q80 range frame matches a brute-force trailing-30-day scan") {
    val rows = WindowOps.q80.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 1500)
    // brute force over the same inputs: for every order, every order of
    // the same customer with epoch in [e-30d, e] — RANGE semantics, so
    // same-epoch ties are mutually included
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("epoch"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = orders.groupBy(_._1)
    rows.foreach { case (cust, okey, epoch, cnt, cents) =>
      val in = byCust(cust).filter(o => o._3 >= epoch - 30L * 86400 && o._3 <= epoch)
      assert(cnt == in.length, s"order $okey count")
      assert(cents == in.map(_._4).sum, s"order $okey cents")
    }
  }
}
