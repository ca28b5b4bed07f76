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

  test("q72 plan: salted shuffle join stays a shuffle join with a pruned fact scan") {
    val p = SkewJoin.q72.fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the hint must pin the shuffle shape — a broadcast of the replicated
    // dim would degenerate the salt to dead weight
    assert(p.contains("ShuffledHashJoin"), s"salted join not shuffled:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"replicated dim broadcast:\n$p")
    // salting off o_orderkey must not drag the full fact row through the
    // scan: 3 pruned columns, not all 6
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("o_orderkey")).getOrElse("")
    assert(readSchema.contains("o_totalprice") && !readSchema.contains("o_orderdate"),
      s"unpruned fact scan: $readSchema")
  }

  test("narrow saltCols returns the same multiset as the full-row salt") {
    val left = (Seq.fill(900)(1L) ++ Seq(2L, 2L, 3L, 5L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val right = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("rk", "name")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(
      rows(SkewJoin.saltedInner(left, right, "k", "rk", 8, Seq("payload"))) ==
      rows(SkewJoin.saltedInner(left, right, "k", "rk", 8)))
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
