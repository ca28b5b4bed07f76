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

  test("q87 compaction equals the row_number()=1 window form") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables(spark, sf0001).events
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc_nulls_last, col("event_id").desc_nulls_last)
    val expected = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type"), col("value"),
        col("event_id"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val got = RelationalExt.compactOn(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    // tombstoned keys really disappear: every user whose latest event is
    // an error is absent from the compacted state
    val latestIsError = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") === "error")
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(latestIsError.nonEmpty, "fixture should tombstone someone")
    assert(got.map(_._1).toSet.intersect(latestIsError).isEmpty)
  }

  test("q87 on a synthetic history: upsert wins over older tombstone, ties impossible") {
    import spark.implicits._
    val ev = Seq(
      // user 1: delete then re-insert → present with the newer row
      (1L, "error", 0.0, 10L, 1000L),
      (1L, "purchase", 5.0, 11L, 2000L),
      // user 2: insert then delete → absent
      (2L, "signup", 1.0, 20L, 1000L),
      (2L, "error", 0.0, 21L, 3000L),
      // user 3: same µs timestamp twice → event_id breaks the tie
      (3L, "signup", 1.0, 30L, 5000L),
      (3L, "purchase", 9.0, 31L, 5000L))
      .toDF("user_id", "event_type", "value", "event_id", "us")
      .select(col("user_id"), col("event_type"), col("value"),
        col("event_id"), timestamp_micros(col("us")).as("ts"))
    val got = RelationalExt.compactOn(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(got == Seq((1L, "purchase", 11L), (3L, "purchase", 31L)))
  }

  test("q119 top-20 equals a naive basket pair count with deterministic tie order") {
    val rows = graft.Tables(spark, sf0001).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val counts = rows.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, l) => (p._1, p._2, l.size.toLong) }
    val expected = counts.toSeq
      .sortBy { case (p1, p2, n) => (-n, p1, p2) }.take(20)
    val out = RelationalExt.q119.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expected, s"got=${out.take(5)} expected=${expected.take(5)}")
  }

  test("q162 rules equal a naive a-priori second stage in exact ppm arithmetic") {
    val rows = graft.Tables(spark, sf0001).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = rows.map(_._1).distinct.length.toLong
    val margin = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val support = rows.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).collect { case ((u, v), l) if l.size >= 3 => (u, v, l.size.toLong) }
    val expected = support.toSeq
      .flatMap { case (u, v, s) => Seq((u, v, s), (v, u, s)) }
      .map { case (a, c, s) =>
        val conf = BigInt(s) * 1000000 / BigInt(margin(a))
        val lift = BigInt(nOrders) * s * 1000000 / (BigInt(margin(a)) * margin(c))
        (a, c, s, conf.toLong, lift.toLong)
      }
      .sortBy { case (a, c, _, _, l) => (-l, a, c) }.take(50)
    val out = RelationalExt.q162.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == expected, s"got=${out.take(3)} expected=${expected.take(3)}")
    // mirrored rules share support and lift (the lift formula is symmetric)
    val byKey = out.map(r => (r._1, r._2) -> r).toMap
    out.foreach { case (a, c, s, _, l) =>
      byKey.get((c, a)).foreach { m => assert(m._3 == s && m._5 == l) }
    }
  }

  test("q175 sequence rules equal a naive next-basket replay in exact ppm arithmetic") {
    val orders = graft.Tables(spark, sf0001).orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val items: Map[Long, Seq[Long]] = graft.Tables(spark, sf0001).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val pairs = orders.groupBy(_._1).values.toSeq.flatMap { os =>
      val ordered = os.sortBy(o => (o._3, o._2)).map(_._2)
      ordered.zip(ordered.drop(1))
    }
    val nPairs = pairs.length.toLong
    val xRows = pairs.flatMap { case (k1, k2) =>
      items.getOrElse(k1, Seq.empty[Long]).map(px => (k2, px)) }
    val yRows = pairs.flatMap { case (_, k2) =>
      items.getOrElse(k2, Seq.empty[Long]).map(py => (k2, py)) }
    val xm = xRows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ym = yRows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val yByPair: Map[Long, Seq[Long]] =
      yRows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val support = xRows.flatMap { case (k2, px) =>
      yByPair.getOrElse(k2, Seq.empty[Long]).map(py => (px, py)) }
      .groupBy(x => x).collect { case (k, v) if v.size >= 2 => k -> v.size.toLong }
    val expected = support.toSeq.map { case ((a, c), s) =>
      val conf = BigInt(s) * 1000000 / BigInt(xm(a))
      val lift = BigInt(nPairs) * s * 1000000 / (BigInt(xm(a)) * ym(c))
      (a, c, s, conf.toLong, lift.toLong)
    }.sortBy { case (a, c, _, _, l) => (-l, a, c) }.take(50)
    val out = RelationalExt.q175.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == expected, s"got=${out.take(3)} expected=${expected.take(3)}")
    assert(out.nonEmpty, "no sequence rules at the fixture - support floor too high")
  }

  test("q238 referential audit: fixture estate is orphan-free and row counts match the tables") {
    val rows = Relational.q238.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 7, s"expected 7 FK relations, got ${rows.length}")
    rows.foreach { case (rel, _, orphans, nulls) =>
      assert(orphans == 0L, s"$rel has $orphans orphans on a clean fixture")
      assert(nulls == 0L, s"$rel has $nulls null FKs on a clean fixture")
    }
    def rowsOf(t: String): Long =
      spark.read.parquet(s"$sf0001/$t.parquet").count()
    val expectRows = Map(
      "customer.nationkey->nation" -> rowsOf("customer"),
      "lineitem.orderkey->orders" -> rowsOf("lineitem"),
      "lineitem.partkey->part" -> rowsOf("lineitem"),
      "lineitem.suppkey->supplier" -> rowsOf("lineitem"),
      "nation.regionkey->region" -> rowsOf("nation"),
      "orders.custkey->customer" -> rowsOf("orders"),
      "supplier.nationkey->nation" -> rowsOf("supplier"))
    assert(rows.map(r => r._1 -> r._2).toMap == expectRows)
  }

  test("q238 audit kernel counts injected orphans, null FKs, and is duplicate-pk-safe") {
    import spark.implicits._
    // dim with a DUPLICATE pk (the distinct guard: a raw left join
    // would multiply fact rows and corrupt every count)
    val dim = Seq(1L, 2L, 2L, 3L).toDF("pk")
    val fact = Seq(Some(1L), Some(2L), Some(2L), Some(9L), Some(8L), None)
      .toDF("fk")
    val got = Relational.fkAudit("t", fact, "fk", dim, "pk", bcast = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("t", 6L, 2L, 1L)),
      s"audit kernel miscounted: ${got.toSeq}")
  }
}
