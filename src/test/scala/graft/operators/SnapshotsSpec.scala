package graft.operators

import graft.{Det, SparkTestBase}
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkTestBase {
  import spark.implicits._

  test("diff labels added, removed and changed, and drops unchanged keys") {
    val oldS = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("id", "s", "v")
    val newS = Seq((2L, "b", 2.0), (3L, "X", 3.0), (4L, "d", 4.0)).toDF("id", "s", "v")
    val d = Snapshots.diff(oldS, newS, "id", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("comparison is null-safe: null ≡ null is unchanged, null vs value is changed") {
    val oldS = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Some("x")))
      .toDF("id", "s")
    val newS = Seq((1L, Option.empty[String]), (2L, Some("y")), (3L, Option.empty[String]))
      .toDF("id", "s")
    val d = Snapshots.diff(oldS, newS, "id", Seq("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "changed"), s"got $d")
  }

  test("diff of a snapshot against itself is empty") {
    val (oldS, _) = Snapshots.ordersSnapshots(spark, sf0001)
    assert(Snapshots.diff(oldS, oldS, "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")).isEmpty)
  }

  test("q99 statuses reproduce the md5-bucket snapshot construction exactly") {
    val o = graft.Tables(spark, sf0001).orders
      .select(col("o_orderkey"), Det.md5Bucket(col("o_orderkey")).as("bkt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val expected =
      o.collect { case (k, b) if b < 3277 => k -> "removed" } ++
      o.collect { case (k, b) if b >= 3277 && b < 6554 => k -> "changed" } ++
      o.collect { case (k, b) if b >= 62259 => (k + 100000000L) -> "added" }
    val got = Snapshots.q99.fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq)
    assert(Seq("added", "removed", "changed").forall(s => got.exists(_._2 == s)),
      "fixture must exercise all three change kinds")
  }
}
