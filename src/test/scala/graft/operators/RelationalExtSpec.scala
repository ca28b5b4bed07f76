package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RelationalExtSpec extends SparkTestBase {

  test("q81 lateral top-2 equals the window-ranking formulation") {
    val rows = RelationalExt.q81.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    // independent formulation: join + row_number window (q20's shape)
    val n = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
    val w = Window.partitionBy(col("n_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name"))
    val expected = n.join(c, col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("n_name"), col("c_name"), col("c_acctbal"))
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_name"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == expected)
    // every nation with customers contributes at most 2 rows
    rows.groupBy(_._1).values.foreach(g => assert(g.size <= 2))
  }

  test("q82 exact twin agrees with q50's exact columns and a brute-force median") {
    val q82rows = RelationalExt.q82.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val q50rows = RelationalExt.q50.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    // exact_buyers is the SAME computation surfaced in both queries
    assert(q82rows.map(t => (t._1, t._2)) == q50rows)
    // exact_median_cents vs a driver-side brute-force median over cents
    val cents = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    q82rows.foreach { case (prio, _, med) =>
      val v = cents(prio)
      val exp =
        if (v.length % 2 == 1) v(v.length / 2).toDouble
        else (v(v.length / 2 - 1) + v(v.length / 2)) / 2.0
      assert(med == exp, s"median mismatch for $prio")
    }
  }
}
