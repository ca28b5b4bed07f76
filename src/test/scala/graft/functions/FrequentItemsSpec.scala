package graft.functions

import scala.collection.mutable
import scala.util.Random

import graft.SparkTestBase
import graft.operators.TextOps
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkTestBase {

  test("MG reduce evicts by decrement-all; counters never overcount") {
    val mg = new FrequentItems(2)
    // stream a a a b c: 'c' arrives at a full {a:3, b:1} summary →
    // decrement-all drops b and leaves {a:2}; c annihilates with it
    val b = mg.reduce(mg.zero, Seq("a", "a", "a", "b", "c"))
    assert(b.toMap == Map("a" -> 2L))
    // counters are lower bounds: a's true count 3, undercount 1 ≤ n/(c+1)
  }

  test("MG merge prunes to capacity with the (c+1)-th-largest subtraction") {
    val mg = new FrequentItems(2)
    val x = mutable.HashMap("a" -> 5L, "b" -> 3L)
    val y = mutable.HashMap("c" -> 2L, "d" -> 1L)
    val m = mg.merge(x, y)
    // 3rd largest of (5,3,2,1) is 2 → a:3, b:1 survive, c/d die
    assert(m.toMap == Map("a" -> 3L, "b" -> 1L))
  }

  test("q86 heavy hitters are EXACT on a skewed corpus that forces evictions") {
    import spark.implicits._
    // 3 genuinely heavy tokens + 500-token noise vocabulary (≫ capacity
    // 64, so the sketch evicts constantly), deterministic shuffle
    val rnd = new Random(42)
    val stream = rnd.shuffle(
      Seq.fill(4000)("hot") ++ Seq.fill(1500)("warm") ++ Seq.fill(900)("tepid") ++
        (0 until 3600).map(i => s"noise${i % 500}"))
    val docs = stream.grouped(25).map(_.mkString(" ")).toSeq.toDF("text")
      .repartition(8) // multiple partials → real partial-summary merges
    val got = TextOps.heavyHittersOn(docs)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // exact reference: full groupBy + threshold
    val n = stream.size.toLong
    val expected = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * TextOps.HeavyHitterCapacity > n)
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq == expected)
    assert(got.map(_._1).toSet == Set("hot", "warm", "tepid"))
  }

  test("q86 output is invariant to partitioning (merge order cannot leak)") {
    import spark.implicits._
    val rnd = new Random(7)
    val stream = rnd.shuffle(
      Seq.fill(2000)("big") ++ (0 until 2000).map(i => s"n${i % 300}"))
    val docs = stream.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val a = TextOps.heavyHittersOn(docs.repartition(1)).collect().toSeq
    val b = TextOps.heavyHittersOn(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("q86 on an empty corpus returns an empty frame with the right schema") {
    import spark.implicits._
    val out = TextOps.heavyHittersOn(Seq.empty[String].toDF("text"))
    assert(out.columns.toSeq == Seq("token", "cnt"))
    assert(out.count() == 0)
  }
}
