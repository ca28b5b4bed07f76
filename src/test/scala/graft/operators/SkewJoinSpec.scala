package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the plain join's multiset") {
    // heavily skewed left: 900 rows of key 1, a few of others
    val left = (Seq.fill(900)(1L) ++ Seq(2L, 2L, 3L, 5L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val right = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("rk", "name")

    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = SkewJoin.saltedInner(left, right, "k", "rk", saltFactor = 8)
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq

    assert(salted == plain)
    assert(plain.length == 903)
  }

  test("salt actually spreads the hot key across partitions") {
    val left = Seq.fill(1000)(1L).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val salts = left.withColumn("__salt",
        pmod(hash(left.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1, "all rows landed on one salt — no spread")
  }
}
