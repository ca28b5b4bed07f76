package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks latest right row at-or-before left time") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "L1"),
      (1L, ts("2024-01-01 12:00:00"), "L2"),
      (2L, ts("2024-01-01 09:00:00"), "L3")
    ).toDF("k", "t", "lname")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (2L, ts("2024-01-01 09:30:00"), 200L) // after L3 → no match
    ).toDF("k", "rt", "rid")

    val out = AsOf.backward(left, right, "k", "k", "t", "rt",
      payload = Seq("rid"), tieR = "rid")
      .select("lname", "rid").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap

    assert(out("L1") == Some(100L))
    assert(out("L2") == Some(101L))
    assert(out("L3") == None)
  }

  test("equal timestamps match inclusively, ties broken by greatest tie col") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L")).toDF("k", "t", "lname")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (1L, ts("2024-01-01 10:00:00"), 9L)
    ).toDF("k", "rt", "rid")
    val out = AsOf.backward(left, right, "k", "k", "t", "rt", Seq("rid"), "rid")
      .select("rid").collect()
    assert(out.length == 1 && out(0).getLong(0) == 9L)
  }
}
