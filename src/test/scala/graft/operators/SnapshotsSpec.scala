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

  private def scdDim(rows: Seq[(Long, String, String, Option[String])]) =
    rows.toDF("id", "s", "vf", "vt")
      .select(col("id"), col("s"), col("vf").cast("date").as("valid_from"),
        col("vt").cast("date").as("valid_to"))

  test("scd2Apply: unchanged passes through; changed closes+opens; removed closes; added opens; history untouched") {
    val dim = scdDim(Seq(
      (1L, "a", "2024-01-01", None),                    // unchanged
      (2L, "b", "2024-01-01", None),                    // will change
      (3L, "c", "2024-01-01", None),                    // will be removed
      (2L, "b0", "2023-12-01", Some("2024-01-01"))))    // closed history
    val snap = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "s")
    val out = Snapshots.scd2Apply(dim, snap, "id", Seq("s"), "2024-01-02")
      .collect().map(r => (r.getLong(0), r.getString(1),
        String.valueOf(r.getDate(2)), String.valueOf(r.getDate(3)), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, "a", "2024-01-01", "null", true),
      (2L, "b", "2024-01-01", "2024-01-02", false),
      (2L, "B", "2024-01-02", "null", true),
      (3L, "c", "2024-01-01", "2024-01-02", false),
      (4L, "d", "2024-01-02", "null", true),
      (2L, "b0", "2023-12-01", "2024-01-01", false)), s"got $out")
  }

  test("scd2Apply with the current snapshot is a no-op") {
    val dim = scdDim(Seq(
      (1L, "a", "2024-01-01", None),
      (2L, "b", "2024-01-01", None),
      (1L, "a0", "2023-12-01", Some("2024-01-01"))))
    val snap = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val out = Snapshots.scd2Apply(dim, snap, "id", Seq("s"), "2024-01-02")
    val expected = dim.withColumn("is_current", col("valid_to").isNull)
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }

  test("q102 reconciles with q99's diff: version counts per key follow the change kind") {
    val changes = Snapshots.q99.fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Snapshots.q102.fn(spark, sf0001)
      .select(col("o_orderkey"), col("is_current")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toSeq
    val byKey = rows.groupBy(_._1)
    // at most one current version per key — the SCD-2 invariant
    assert(byKey.forall { case (_, vs) => vs.count(_._2) <= 1 })
    byKey.foreach { case (k, vs) =>
      changes.get(k) match {
        case Some("changed") => assert(vs.size == 2 && vs.count(_._2) == 1, s"key $k: $vs")
        case Some("removed") => assert(vs == Seq(k -> false), s"key $k: $vs")
        case Some("added")   => assert(vs == Seq(k -> true), s"key $k: $vs")
        case _               => assert(vs == Seq(k -> true), s"unchanged key $k: $vs")
      }
    }
  }

  test("q132: each probe resolves to the unique covering version; uncovered probes come back inactive") {
    // ground truth: the q102 dim (already brute-force-verified above)
    val dim = Snapshots.q102.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2),
        r.getDate(5).toString, Option(r.getDate(6)).map(_.toString)))
    val byKey = dim.groupBy(_._1)
    def md5b(k: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      Integer.parseInt(md.take(2).map("%02x".format(_)).mkString, 16)
    }
    val expected = byKey.map { case (k, versions) =>
      val probe = if (md5b(k) % 2 == 0) "2024-01-01" else "2024-01-02"
      val hit = versions.find { case (_, _, from, to) =>
        from <= probe && to.forall(_ > probe) }
      (k, probe) -> hit.map(h => (h._2, h._3))
    }
    val got = Snapshots.q132.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (if (r.getBoolean(2)) Some((r.getString(3), r.getDate(4).toString))
         else { assert(r.isNullAt(3) && r.isNullAt(4)); None })).toMap
    assert(got.keySet == expected.keySet, "probe row set differs")
    assert(got == expected)
    // the fixture must exercise both outcomes and both probe days
    assert(got.values.exists(_.isEmpty), "no inactive probe; removed/added paths untested")
    assert(got.values.count(_.nonEmpty) > got.size / 2, "most probes should resolve")
    assert(got.keys.map(_._2).toSet.size == 2, "only one probe day exercised")
  }
}
