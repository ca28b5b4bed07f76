package graft.operators

import graft.{SparkTestBase, Tables}
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

  test("q90 gap fill zero-fills each type's missing hours within its own span") {
    import java.sql.Timestamp
    import spark.implicits._
    // type a: events at 10:xx and 13:xx -> 11:00 and 12:00 must appear
    // with n=0; type b: one hour only -> no fill rows at all
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), "a"),
      (2L, Timestamp.valueOf("2024-01-01 10:50:00"), "a"),
      (3L, Timestamp.valueOf("2024-01-01 13:10:00"), "a"),
      (4L, Timestamp.valueOf("2024-01-01 22:00:00"), "b"))
      .toDF("event_id", "ts", "event_type")
    val hourly = rows.select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("n"))
    val frame = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val filled = frame.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), unix_timestamp(col("h")).as("he"),
        coalesce(col("n"), lit(0L)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(filled == Set(
      ("a", h10, 2L), ("a", h10 + 3600, 0L), ("a", h10 + 7200, 0L),
      ("a", h10 + 10800, 1L),
      ("b", h10 + 43200, 1L)), filled.toString)
  }

  test("q91 LOCF carries the last observed value across gap hours, never null") {
    import java.sql.Timestamp
    import spark.implicits._
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), "a", 4.0),
      (2L, Timestamp.valueOf("2024-01-01 10:50:00"), "a", 2.0),
      (3L, Timestamp.valueOf("2024-01-01 13:10:00"), "a", 9.0))
      .toDF("event_id", "ts", "event_type", "value")
    val hourly = rows.select(date_trunc("hour", col("ts")).as("h"),
        col("event_type"), col("value"))
      .groupBy(col("event_type"), col("h"))
      .agg(graft.Det.davg(col("value")).as("v"))
    val frame = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Long.MinValue, 0)
    val locf = frame.join(hourly, Seq("event_type", "h"), "left")
      .select(unix_timestamp(col("h")).as("he"),
        last(col("v"), ignoreNulls = true).over(w).as("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    // 10:00 observed mean (4+2)/2=3.0; 11:00 and 12:00 are gaps -> carry
    // 3.0; 13:00 observed 9.0
    assert(locf == Map(h10 -> 3.0, (h10 + 3600) -> 3.0,
      (h10 + 7200) -> 3.0, (h10 + 10800) -> 9.0), locf.toString)
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

  /** Synthetic events table written through parquet so Tables.events'
    * schema-adaptive load path is exercised. */
  private def eventsDir(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.toDF("event_id", "tss", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("event_type"), lit(1.0).as("value"), lit("""{"k": 1}""").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q105 funnel: strict stage order — a purchase without a prior view stays 'signup'") {
    val dir = eventsDir(Seq(
      // user 1: full ordered funnel
      (1L, "2024-01-01 00:00:00", 1L, "signup"),
      (2L, "2024-01-01 01:00:00", 1L, "view"),
      (3L, "2024-01-01 02:00:00", 1L, "purchase"),
      // user 2: view BEFORE signup — view must not count
      (4L, "2024-01-02 00:00:00", 2L, "view"),
      (5L, "2024-01-02 01:00:00", 2L, "signup"),
      // user 3: signup then purchase but never a view — strict order stops at signup
      (6L, "2024-01-03 00:00:00", 3L, "signup"),
      (7L, "2024-01-03 01:00:00", 3L, "purchase"),
      // user 4: never signed up — not in the funnel at all
      (8L, "2024-01-04 00:00:00", 4L, "purchase")))
    val out = WindowOps.q105.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "purchase"), (2L, "signup"), (3L, "signup")))
  }

  test("q129 funnel timing: percentiles over exact per-user hop latencies; counts agree with q105 stages") {
    val dir = eventsDir(Seq(
      // u1: signup→view in 3600 s, view→purchase in 7200 s
      (1L, "2024-01-01 00:00:00", 1L, "signup"),
      (2L, "2024-01-01 01:00:00", 1L, "view"),
      (3L, "2024-01-01 03:00:00", 1L, "purchase"),
      // u2: signup→view in 60 s, never purchases
      (4L, "2024-01-02 00:00:00", 2L, "signup"),
      (5L, "2024-01-02 00:01:00", 2L, "view"),
      // u3: pre-signup view must not shorten the hop (strict order: the
      // counted view is the one AFTER signup — 600 s)
      (6L, "2024-01-03 00:00:00", 3L, "view"),
      (7L, "2024-01-03 01:00:00", 3L, "signup"),
      (8L, "2024-01-03 01:10:00", 3L, "view")))
    val out = WindowOps.q129.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    // signup_to_view latencies: {3600, 60, 600} → median 600, p90 interp
    // between 600 and 3600 at pos 1.8 → 3000
    assert(out == Seq(
      ("signup_to_view", 3L, 600.0, 3000.0),
      ("view_to_purchase", 1L, 7200.0, 7200.0)), s"got $out")
    // fixture-wide: transition counts must equal q105's stage reach
    val stages = WindowOps.q105.fn(spark, sf0001).collect()
      .map(_.getString(1)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val timing = WindowOps.q129.fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(timing("signup_to_view") ==
      stages.getOrElse("view", 0L) + stages.getOrElse("purchase", 0L))
    assert(timing("view_to_purchase") == stages.getOrElse("purchase", 0L))
  }

  test("q133 rolling distinct: each day's count is the exact 7-day-lookback distinct user set") {
    val acts = graft.Tables(spark, sf0001).events
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val expected = acts.flatMap { case (u, d) => (0 to 6).map(i => (u, d.plusDays(i))) }
      .groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val got = WindowOps.q133.fn(spark, sf0001).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got == expected)
    // lookback semantics: a window day must be able to EXCEED its own
    // day's activity (users active earlier in the window, not that day)
    val daily = acts.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    assert(got.exists { case (d, u7) => u7 > daily.getOrElse(d, 0L) },
      "no day shows lookback accumulation; window semantics untested")
  }

  test("q144 deadline funnel: stages respect the 24h windows; reach never exceeds q105") {
    val dir = eventsDir(Seq(
      // u1: view 1h after signup (in window), purchase 2h after view (in)
      (1L, "2024-01-01 00:00:00", 1L, "signup"),
      (2L, "2024-01-01 01:00:00", 1L, "view"),
      (3L, "2024-01-01 03:00:00", 1L, "purchase"),
      // u2: view 30h after signup — MISSES the 24h deadline
      (4L, "2024-01-02 00:00:00", 2L, "signup"),
      (5L, "2024-01-03 06:00:00", 2L, "view"),
      // u3: view in window, purchase 25h after view — misses stage 3
      (6L, "2024-01-04 00:00:00", 3L, "signup"),
      (7L, "2024-01-04 01:00:00", 3L, "view"),
      (8L, "2024-01-05 02:00:00", 3L, "purchase")))
    val out = WindowOps.q144.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(out == Seq(
      ("1_signup", 3L, None),
      ("2_view_24h", 2L, Some(0.666667)),
      ("3_purchase_24h", 1L, Some(0.5))), s"got $out")
    // fixture-wide: bounded reach can never exceed unbounded q105 reach
    val unbounded = WindowOps.q105.fn(spark, sf0001).collect()
      .map(_.getString(1)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bounded = WindowOps.q144.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bounded("1_signup") ==
      unbounded.getOrElse("signup", 0L) + unbounded.getOrElse("view", 0L) +
        unbounded.getOrElse("purchase", 0L))
    assert(bounded("2_view_24h") <=
      unbounded.getOrElse("view", 0L) + unbounded.getOrElse("purchase", 0L))
    assert(bounded("3_purchase_24h") <= unbounded.getOrElse("purchase", 0L))
  }

  test("q146 behavior diversity: Simpson scores match a naive per-user recompute") {
    val events = graft.Tables(spark, sf0001).events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = events.groupBy(_._1).flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._4)).map(_._2)
      if (ordered.length < 2) None
      else {
        val pairs = ordered.sliding(2).map(p => (p(0), p(1))).toSeq
        val counts = pairs.groupBy(identity).map(_._2.size.toLong)
        val n = counts.sum
        val simpson = 1.0 - counts.map(c => c * c).sum.toDouble / (n.toDouble * n)
        Some(u -> ((n, counts.size.toLong,
          BigDecimal(simpson).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      }
    }
    val got = WindowOps.q146.fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == expected, {
      val ks = (got.keySet ++ expected.keySet).filter(k => got.get(k) != expected.get(k))
      ks.take(5).map(k => s"$k: got=${got.get(k)} want=${expected.get(k)}").mkString("; ")
    })
    // the score must discriminate: loops and mixed behavior both exist
    assert(got.values.map(_._3).toSet.size > 10, "scores nearly constant; index uninformative")
  }

  test("q107 path transitions: per-user ordered bigram counts, first events excluded") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "signup"),   // u1: signup->view->view->purchase
      (2L, "2024-01-01 01:00:00", 1L, "view"),
      (3L, "2024-01-01 02:00:00", 1L, "view"),
      (4L, "2024-01-01 03:00:00", 1L, "purchase"),
      (5L, "2024-01-02 00:00:00", 2L, "view"),     // u2: view->signup
      (6L, "2024-01-02 01:00:00", 2L, "signup"),
      (7L, "2024-01-03 00:00:00", 3L, "click")))   // u3: single event, no transition
    val out = WindowOps.q107.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("signup", "view", 1L), ("view", "purchase", 1L),
      ("view", "signup", 1L), ("view", "view", 1L)))
  }

  test("q106 cohort retention: day-offset counts from each user's first-seen day") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 05:00:00", 1L, "view"),   // u1 cohort 01-01
      (2L, "2024-01-02 06:00:00", 1L, "view"),   // u1 offset 1
      (3L, "2024-01-02 07:00:00", 1L, "click"),  // same user+day → one active row
      (4L, "2024-01-04 08:00:00", 1L, "view"),   // u1 offset 3
      (5L, "2024-01-01 09:00:00", 2L, "view"),   // u2 cohort 01-01
      (6L, "2024-01-02 10:00:00", 3L, "view")))  // u3 cohort 01-02
    val out = WindowOps.q106.fn(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 3, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("q149: full smoothed grid, counts agree with q107, rows sum to ~1e6 ppm") {
    val rows = WindowOps.q149.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val types = rows.map(_._1).distinct
    assert(rows.length == types.length * types.length,
      s"expected the full ${types.length}² grid, got ${rows.length}")
    // (the sf0.001 matrix is dense — every pair occurs — so zero-count
    // smoothing is exercised by the formula assertion below, which pins
    // p_ppm = (n+1)·10⁶ div (tot+k) for EVERY cell including minima)
    // nonzero counts are exactly q107's transition counts
    val q107Counts = WindowOps.q107.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { case (s, d, n, _) =>
      assert(n == q107Counts.getOrElse((s, d), 0L), s"count drift at ($s,$d)")
    }
    // the add-one estimate, exactly, and near-unit row mass (floor loss
    // is < 1 ppm per cell)
    val k = types.length
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val tot = rs.map(_._3).sum
      rs.foreach { case (_, d, n, p) =>
        assert(p == (n + 1) * 1000000L / (tot + k), s"p_ppm wrong at ($src,$d)")
      }
      val mass = rs.map(_._4).sum
      assert(mass <= 1000000L && mass > 1000000L - k,
        s"row $src mass $mass outside the floor-rounding band")
    }
  }

  test("q158: TWAP matches a naive per-(user, day) hold-until-next replay") {
    val usPerDay = 86400L * 1000000L
    val raw = Tables(spark, sf0001).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 1000000, 0).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = raw.groupBy { case (u, _, us, _) => (u, Math.floorDiv(us, usPerDay)) }
      .map { case ((u, day), rs) =>
        val sorted = rs.sortBy { case (_, id, us, _) => (us, id) }
        val dayEnd = (day + 1) * usPerDay
        var vd = BigInt(0); var dur = 0L
        for (i <- sorted.indices) {
          val next = if (i + 1 < sorted.length) sorted(i + 1)._3 else dayEnd
          val d = next - sorted(i)._3
          vd += BigInt(sorted(i)._4) * d
          dur += d
        }
        (u, day) -> ((sorted.length.toLong, dur, (vd / dur).toLong))
      }
    val got = WindowOps.q158.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == expected.keySet,
      s"key sets differ by ${got.keySet.diff(expected.keySet).take(3)} / ${expected.keySet.diff(got.keySet).take(3)}")
    expected.foreach { case (k, e) =>
      assert(got(k) == e, s"$k: got ${got(k)}, naive $e")
    }
    // TWAP must actually diverge from the plain mean somewhere, or the
    // duration weighting is vacuous on this fixture
    val plainMeans = raw.groupBy { case (u, _, us, _) => (u, Math.floorDiv(us, usPerDay)) }
      .map { case (k, rs) => k -> rs.map(_._4).sum / rs.length }
    assert(expected.exists { case (k, (_, _, tw)) => plainMeans(k) != tw })
  }

  test("q171: journey documents replay the per-user session serialization exactly") {
    val rows = Tables(spark, sf0001).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._4))
      // 30-min gap sessionization over the ordered run
      val sess = ordered.zip(None +: ordered.init.map(Some(_))).map {
        case (e, prev) =>
          (e, if (prev.forall(p => (e._3 / 1000000L) - (p._3 / 1000000L) > 1800)) 1 else 0)
      }.scanLeft((null.asInstanceOf[(Long, String, Long, Long)], 0L)) {
        case ((_, sid), (e, ns)) => (e, sid + ns)
      }.drop(1)
      sess.groupBy(_._2).map { case (sid, ses) =>
        val evs = ses.map(_._1)
        (u, sid) -> ((evs.map(_._2).mkString(">"), evs.size.toLong,
          (evs.map(_._3 / 1000000L).max - evs.map(_._3 / 1000000L).min)))
      }
    }.toMap
    val got = WindowOps.q171.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, e) =>
      assert(got(k) == e, s"$k: got ${got(k)}, naive $e")
    }
    // a journey's token count is its event count, and multi-event
    // sessions must exist or the ordering is untested
    assert(got.values.forall(v => v._1.split(">", -1).length.toLong == v._2))
    assert(got.values.exists(_._2 > 1))
  }

  test("q169: last-touch attribution matches a naive per-user replay and totals the purchases") {
    val rows = Tables(spark, sf0001).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val weekUs = 7L * 86400000000L
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._4))
      ordered.zipWithIndex.collect { case ((_, "purchase", us, _), i) =>
        ordered.take(i).reverse.find(_._2 != "purchase") match {
          case Some((_, t, tus, _)) if us - tus <= weekUs => t
          case _ => "__none"
        }
      }
    }.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val got = WindowOps.q169.fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // conservation: attribution buckets must total the purchase count
    val purchases = rows.count(_._2 == "purchase").toLong
    assert(got.values.sum == purchases, "attribution dropped or invented conversions")
    // the lookback and the none-bucket must both bite on the fixture
    assert(got.contains("__none") && got.size > 2,
      "fixture exercises neither the window bound nor type diversity")
  }

  test("q182 interval union equals the brute-force per-supplier day-set union") {
    val t = Tables(spark, sf0001)
    val iv = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"), to_date(col("l_shipdate")).as("shipd"))
      .join(t.orders.select(col("o_orderkey"), to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("od"), col("shipd"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    // ground truth: enumerate every covered day per supplier (fine at
    // sf0.001), then spans = contiguous runs of the day set
    val daySets: Map[Long, Set[Long]] = iv.groupBy(_._1).view.mapValues(_.flatMap {
      case (_, od, shipd) =>
        val end = if (shipd.isAfter(od)) shipd else od
        od.toEpochDay to end.toEpochDay
    }.toSet).toMap
    def runs(days: Set[Long]): Seq[Long] = {
      val sorted = days.toSeq.sorted
      sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, d) if d == e + 1 => (s, d) :: rest
        case (acc, d) => (d, d) :: acc
      }.map { case (s, e) => e - s + 1 }
    }
    val got = WindowOps.q182.fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))))
      .toMap
    assert(got.keySet == daySets.keySet)
    daySets.foreach { case (sk, days) =>
      val rl = runs(days)
      val (nShip, nSpans, covered, maxSpan) = got(sk)
      assert(nShip == iv.count(_._1 == sk).toLong, s"supplier $sk shipment count")
      assert(nSpans == rl.length.toLong, s"supplier $sk span count")
      assert(covered == days.size.toLong, s"supplier $sk covered days")
      assert(maxSpan == rl.max.toInt, s"supplier $sk longest span")
    }
    // the fixture must actually exercise merging (fewer spans than items)
    assert(daySets.exists { case (sk, days) => runs(days).length < iv.count(_._1 == sk) })
  }

  test("q183 as-of tolerance: left-complete, and exactly q27's matches filtered at 24h") {
    val errors = Tables(spark, sf0001).events
      .filter(col("event_type") === "error").count()
    val got = WindowOps.q183.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None
        else Some((r.getLong(2), r.getLong(3))))).toMap
    assert(got.size.toLong == errors, "q183 must keep every error row")
    // q27 = unbounded backward as-of (inner); the tolerance form must
    // agree on every pair within 24h and null out everything else
    val unbounded = WindowOps.q27.fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    got.foreach {
      case (eid, Some((pid, gap))) =>
        assert(gap <= 86400L, s"event $eid matched past tolerance")
        assert(unbounded(eid) == ((pid, gap)), s"event $eid pair diverges from q27")
      case (eid, None) =>
        assert(unbounded.get(eid).forall(_._2 > 86400L),
          s"event $eid nulled although an in-tolerance match exists")
    }
    // both behaviors must bite on the fixture
    assert(got.values.exists(_.isDefined) && got.exists {
      case (eid, None) => unbounded.contains(eid)
      case _ => false
    }, "fixture exercises neither the match nor the staleness cut")
  }

  test("q189 journey trigrams equal the driver-side sequence replay") {
    val evs = Tables(spark, sf0001).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val counts = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._3, e._4)).map(_._2).sliding(3).filter(_.length == 3)
        .map(w => (w(0), w(1), w(2))).toSeq
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
      .map { case ((a, b, c), n) => (a, b, c, n) }
    val got = WindowOps.q189.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
    // second-order structure must be visible: some prefix (a→b) leads to
    // more than one distinct top-20 continuation
    assert(got.groupBy(g => (g._1, g._2)).exists(_._2.length > 1),
      "top-20 shows no branching — trigram view adds nothing over bigrams?")
  }

  test("q200 position attribution equals a driver replay and conserves credit exactly") {
    val evs = Tables(spark, sf0001).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val lookback = 7L * 86400000000L
    // replay: per user in (us, event_id) order, each non-purchase touch
    // attaches to its nearest strictly-following purchase within 7 days
    val credits = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var purchases = 0L
    val touchedConvs = scala.collection.mutable.Set.empty[Long]
    evs.groupBy(_._1).values.foreach { es =>
      val sorted = es.sortBy(e => (e._3, e._4))
      purchases += sorted.count(_._2 == "purchase")
      val byConv = scala.collection.mutable.Map.empty[Long, Vector[(String, Long, Long)]]
      sorted.zipWithIndex.foreach { case ((_, tpe, us, eid), i) =>
        if (tpe != "purchase") {
          sorted.drop(i + 1).find(_._2 == "purchase") match {
            case Some((_, _, pus, peid)) if pus - us <= lookback =>
              byConv(peid) = byConv.getOrElse(peid, Vector.empty) :+ ((tpe, us, eid))
            case _ => ()
          }
        }
      }
      byConv.foreach { case (conv, ts) =>
        touchedConvs += conv
        val k = ts.length
        ts.zipWithIndex.foreach { case ((tpe, _, _), i) =>
          val pos = i + 1
          val c =
            if (k == 1) 1000000L
            else if (k == 2) 500000L
            else if (pos == 1) 400000L
            else if (pos == k) 400000L + 200000L - (200000L / (k - 2)) * (k - 2)
            else 200000L / (k - 2)
          credits += ((tpe, c))
        }
      }
    }
    val byType = credits.groupBy(_._1).view
      .mapValues(cs => (cs.map(_._2).sum, cs.length.toLong)).toMap
    val untouched = purchases - touchedConvs.size
    val expected = (byType.toSeq.map { case (t, (c, n)) => (t, c, n) } :+
      (("__none", untouched * 1000000L, 0L))).sortBy(_._1)
    val got = WindowOps.q200.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // books balance: total credit = conversions × 1e6 EXACTLY
    assert(got.map(_._2).sum == purchases * 1000000L,
      "credit not conserved across attribution buckets")
    // the U-shape must actually split somewhere (a 3+-touch path exists)
    assert(got.exists(g => g._1 != "__none" && g._2 % 100000L != 0L) ||
      credits.exists(_._2 == 400000L),
      "no multi-touch path on the fixture — U-shape unexercised")
  }

  test("q201 funnel latency sketch: bins contain the exact hop percentiles, replay via the stream twin's math") {
    val evs = Tables(spark, sf0001).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // strict-order stage minima, q105/q129 semantics
    val byUser = evs.groupBy(_._1)
    val hops = byUser.values.toSeq.flatMap { es =>
      val s = es.filter(_._2 == "signup").map(_._3).minOption
      val v = s.flatMap(su => es.filter(e => e._2 == "view" && e._3 > su)
        .map(_._3).minOption)
      val p = v.flatMap(vu => es.filter(e => e._2 == "purchase" && e._3 > vu)
        .map(_._3).minOption)
      Seq(
        s.zip(v).map { case (a, b) => ("1_signup_view", b - a) },
        v.zip(p).map { case (a, b) => ("2_view_purchase", b - a) }).flatten
    }
    // replay uses the STREAMING twin's bin math — batch gauge, stream
    // processor and this spec must all agree on one bin definition
    import graft.streaming.QuantProcessor
    val expected = hops.groupBy(_._1).toSeq.sortBy(_._1).map { case (hop, ds) =>
      val ids = ds.map(d => QuantProcessor.binId(d._2)).sorted
      val n = ids.length.toLong
      def bounds(p: Int): (Long, Long) = {
        val id = ids((((n * p + 99) / 100) - 1).toInt)
        (QuantProcessor.lo(id), QuantProcessor.hi(id))
      }
      val (a, b) = bounds(50); val (c, d) = bounds(90); val (e, f) = bounds(99)
      (hop, n, a, b, c, d, e, f)
    }
    val got = WindowOps.q201.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    // bin containment against the EXACT percentile values
    got.foreach { case (hop, n, l50, h50, l90, h90, l99, h99) =>
      val ds = hops.filter(_._1 == hop).map(_._2).sorted
      def exact(p: Int): Long = ds((((n * p + 99) / 100) - 1).toInt)
      assert(l50 <= exact(50) && exact(50) < h50, s"$hop p50")
      assert(l90 <= exact(90) && exact(90) < h90, s"$hop p90")
      assert(l99 <= exact(99) && exact(99) < h99, s"$hop p99")
    }
  }
  test("q218 session KPIs equal a driver replay of sessions, bounces and integer depth percentiles") {
    val evs = Tables(spark, sf0001).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replay sessionization: per user, (ts, event_id) order, 30-min gaps
    // measured on SECOND-truncated instants (the query's unix_timestamp),
    // exactly as q26 defines them
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      val buf = scala.collection.mutable.ArrayBuffer.empty[List[Long]]
      ordered.foreach { e =>
        val sec = Math.floorDiv(e._3, 1000000L)
        if (buf.nonEmpty && sec - buf.last.head <= 1800)
          buf(buf.length - 1) = sec :: buf.last
        else buf += List(sec)
      }
      buf.toSeq
    }
    def dayOf(sec: Long): java.time.LocalDate =
      java.time.LocalDate.ofEpochDay(Math.floorDiv(sec, 86400L))
    case class S(day: java.time.LocalDate, depth: Long, dur: Long)
    val ss = sessions.map { secs =>
      S(dayOf(secs.min), secs.length.toLong, secs.max - secs.min)
    }
    val expected = ss.groupBy(_.day).toSeq.map { case (d, group) =>
      val n = group.length.toLong
      val bounces = group.count(_.depth == 1).toLong
      val depths = group.map(_.depth).sorted
      def pick(mul: Long, num: Long): Long = {
        var cum = 0L
        depths.distinct.sorted.find { dep =>
          cum = depths.count(_ <= dep).toLong
          cum * mul >= n * num
        }.get
      }
      (java.sql.Date.valueOf(d), n, bounces * 1000000L / n,
        pick(2, 1), pick(10, 9), group.map(_.dur).sum)
    }.sortBy(_._1.toString)
    val got = WindowOps.q218.fn(spark, sf0001).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // every day's percentiles are real observed depths, p50 <= p90
    got.foreach { case (d, _, bp, p50, p90, _) =>
      assert(p50 >= 1 && p90 >= p50, s"$d: p50=$p50 p90=$p90")
      assert(bp >= 0 && bp <= 1000000L, s"$d: bounce ppm $bp")
    }
  }
}
