package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WindowOpsSpec extends SparkTestBase {

  test("GlobalRank.withRowNumber equals the single-partition global row_number") {
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    val (ranked, n) = GlobalRank.withRowNumber(
      c, Seq(col("c_acctbal").desc, col("c_custkey")), "rk")
    assert(n == c.count())
    // ground truth: the SinglePartition window form (fine in a spec)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val truth = c.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("c_custkey"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = ranked.select(col("c_custkey"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == truth)
  }

  test("GlobalRank.ntileFromRank equals Spark's ntile at awkward n/t splits") {
    val s = spark
    import s.implicits._
    // n = 7 over 3 tiles (2 fat tiles), n = 3 over 5 tiles (q = 0),
    // n = 8 over 4 tiles (even) — the ANSI ntile edge shapes
    for ((n, t) <- Seq((7, 3), (3, 5), (8, 4), (1, 4))) {
      val d = (1 to n).map(_.toLong).toDF("v")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      val truth = d.select(col("v"), ntile(t).over(w).cast("long").as("nt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = d.select(col("v"),
          GlobalRank.ntileFromRank(col("v"), n.toLong, t).as("nt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == truth, s"n=$n tiles=$t")
    }
  }

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
