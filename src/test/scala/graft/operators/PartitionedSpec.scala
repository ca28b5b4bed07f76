package graft.operators

import graft.{Det, SparkTestBase, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Partition pruning is a plan property, not a result property — the
  * answers must equal the plain-table queries (oracle-checked for q92/q96
  * too), while the scans must list only the qualifying day directories:
  * statically for a literal date predicate, dynamically (DPP) when the
  * days come from a filtered dimension. */
class PartitionedSpec extends SparkTestBase {

  /** AQE-off session: the executed plan is the real tree, so scans and
    * their driver metrics are directly reachable (under AQE the plan
    * hides behind AdaptiveSparkPlanExec stages). Plan-shape tests only —
    * the result-equality tests run on the default session. */
  private def planSession(): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2
  }

  /** The events-side scan (column-pruned, but always reading the `value`
    * data column), not the calendar-dim scan (partition column only). */
  private def eventsScan(df: DataFrame): FileSourceScanExec = {
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.output.exists(_.name == "value") => f
    }
    assert(scans.size == 1,
      s"expected one fact scan:\n${df.queryExecution.executedPlan}")
    scans.head
  }

  test("partitioned layout reads back complete, day typed DATE, one file per day dir") {
    val ev = Partitioned.eventsByDay(spark, sf0001)
    assert(ev.schema("day").dataType == DateType)
    assert(ev.count() == Tables(spark, sf0001).events.count())
    // writer contract: exactly one parquet file per day directory
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(Partitioned.ensureEventsByDay(spark, sf0001))
    val dayDirs = java.nio.file.Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("day=")).toSeq
    assert(dayDirs.size == 30, s"expected 30 day dirs, got ${dayDirs.size}")
    dayDirs.foreach { d =>
      val files = java.nio.file.Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      assert(files.size == 1, s"$d holds ${files.size} files, want 1")
    }
  }

  test("q92: literal date predicate prunes the scan to 7 of 30 partitions") {
    val s2 = planSession()
    val df = Partitioned.prunedWeekPipeline(s2, sf0001)
    df.collect()
    val scan = eventsScan(df)
    val read = scan.metrics("numPartitions").value
    assert(read == 7,
      s"expected 7 partitions read, got $read:\n${df.queryExecution.executedPlan}")
  }

  test("q92: partitioned-layout answer ≡ plain-table answer") {
    val t = Tables(spark, sf0001)
    val plain = t.events
      .withColumn("day", to_date(col("ts")))
      .filter(col("day").between(lit("2024-01-08").cast("date"),
        lit("2024-01-14").cast("date")))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("day").asc_nulls_first, col("event_type").asc_nulls_first)
      .collect().toSeq
    val parted = Partitioned.prunedWeekPipeline(spark, sf0001).collect().toSeq
    assert(parted == plain)
    assert(parted.nonEmpty)
  }

  test("q96: dynamic partition pruning fires and prunes to the 8 weekend partitions") {
    val s2 = planSession()
    val df = Partitioned.dppJoinPipeline(s2, sf0001)
    val scan = eventsScan(df)
    // the runtime filter must be IN the scan, planned before execution
    assert(scan.partitionFilters.map(_.toString)
        .exists(_.contains("dynamicpruning")),
      s"no DPP filter on the fact scan:\n${df.queryExecution.executedPlan}")
    df.collect()
    val read = scan.metrics("numPartitions").value
    assert(read == 8,
      s"DPP read $read partitions, want 8 (weekends):\n${df.queryExecution.executedPlan}")
  }

  test("q96: DPP answer ≡ plain weekend-filtered aggregate") {
    val plain = Tables(spark, sf0001).events
      .withColumn("day", to_date(col("ts")))
      .filter(dayofweek(col("day")).isin(1, 7))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("day").asc_nulls_first)
      .collect().toSeq
    val dpp = Partitioned.dppJoinPipeline(spark, sf0001).collect().toSeq
    assert(dpp == plain)
    assert(dpp.size == 8)
  }

  test("q98: incremental merge ≡ full recompute over the complete history") {
    val full = Tables(spark, sf0001).events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .withColumn("avg_value", col("sum_value") / col("n_events"))
      .orderBy(col("event_type").asc_nulls_first)
      .collect().toSeq
    val inc = Partitioned.incrementalAggPipeline(spark, sf0001).collect().toSeq
    assert(inc == full, "merged partials drifted from the full recompute")
    assert(inc.nonEmpty)
  }

  test("q98: with the state landed, the fact-table scan reads exactly 1 of 30 partitions") {
    val s2 = planSession()
    Partitioned.ensureAggState(s2, sf0001) // idempotent; the history scan is paid here
    val df = Partitioned.incrementalAggPipeline(s2, sf0001)
    // eventsScan keys on the raw `value` column, which only the DELTA
    // scan reads — the state table holds partials (sum_value_dec etc.)
    val scan = eventsScan(df)
    df.collect()
    val read = scan.metrics("numPartitions").value
    assert(read == 1,
      s"delta path read $read partitions, want 1:\n${df.queryExecution.executedPlan}")
  }

  test("q164: delta-join-maintained view equals the full O JOIN L recompute") {
    val full = Tables(spark, sf0001).orders
      .join(Tables(spark, sf0001).lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("l_returnflag").asc_nulls_first)
      .collect().toSeq
    val inc = Partitioned.deltaJoinViewPipeline(spark, sf0001).collect().toSeq
    assert(inc == full, "delta-join partition of O x L drifted from the full join")
    assert(inc.nonEmpty)
    // both deltas must be non-degenerate at the fixture or the rewrite's
    // cross terms are untested
    val (dO, dL) = Partitioned.deltaJoinDays(spark, sf0001)
    val contrib = Partitioned.deltaJoinContrib(spark, sf0001, dO, dL)
    assert(contrib.agg(sum(col("n_lines"))).collect()(0).getLong(0) > 0,
      "delta days contributed no rows - the delta terms are untested")
  }

  test("q170: retraction-maintained view equals the purged-corpus recompute; both repair branches bite") {
    val last = Partitioned.lastDay(spark, sf0001)
    val ev = Partitioned.eventsByDay(spark, sf0001)
    val purged = ev.filter(col("day") === lit(last) && col("event_type") === "error")
      .select(col("user_id")).distinct()
    val corrected = ev
      .join(purged, Seq("user_id"), "left_anti")
      .filter(col("day") < lit(last) ||
        (col("day") === lit(last) && col("event_type") =!= "error"))
    val full = corrected.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .orderBy(col("day").asc_nulls_first, col("event_type").asc_nulls_first)
      .collect().toSeq
    val inc = Partitioned.retractableAggPipeline(spark, sf0001).collect().toSeq
    assert(inc == full, "maintained view drifted from the purged-corpus recompute")
    assert(inc.nonEmpty)
    // both repair branches must be live at the fixture: some
    // retraction-touched groups keep their bounds algebraically, some
    // must rescan
    val m = Partitioned.retractableMerged(spark, sf0001)
      .select(col("rn").isNotNull.as("touched"),
        (col("min_dirty") || col("max_dirty")).as("dirty"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(m.exists(x => x._1 && x._2), "no dirty group: rescan branch untested")
    assert(m.exists(x => x._1 && !x._2), "every touched group dirty: algebraic branch untested")
    assert(m.exists(!_._1), "every group touched: untouched passthrough untested")
  }

  test("layout materialization is idempotent per (JVM, dir)") {
    val p1 = Partitioned.ensureEventsByDay(spark, sf0001)
    val n1 = spark.read.parquet(p1).count()
    val p2 = Partitioned.ensureEventsByDay(spark, sf0001)
    assert(p1 == p2)
    assert(spark.read.parquet(p2).count() == n1)
  }

  test("q181: incremental register merge ≡ q178's full-feed recompute") {
    val inc = Partitioned.q181.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    val full = Analytic.q178.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(inc.nonEmpty)
    assert(inc.toSeq == full.toSeq,
      "stored pages + one-day delta drifted from the full register recompute")
  }

  test("q181: the delta register page reads exactly 1 of 30 partitions") {
    // asserted on the PRE-cut delta frame (the cut in the registered
    // pipeline truncates the executed plan — the PlanSpec convention)
    val s2 = planSession()
    val df = Partitioned.hllDeltaPage(s2, sf0001)
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.output.exists(_.name == "user_id") => f
    }
    assert(scans.size == 1, s"expected one fact scan:\n${df.queryExecution.executedPlan}")
    df.collect()
    val read = scans.head.metrics("numPartitions").value
    assert(read == 1,
      s"delta page read $read partitions, want 1:\n${df.queryExecution.executedPlan}")
  }

  test("q210: incremental counter merge ≡ the full-feed counter rebuild") {
    // the maintained counter table (stored pages + one-day delta) must
    // equal q190-style counters over the whole feed — the sum-merge law
    val e = Tables(spark, sf0001).events
      .select(to_date(col("ts")).as("day"),
        col("user_id").cast("string").as("k"))
    val full = Analytic.cmsCountersOf(
        e.groupBy(col("k")).agg(count(lit(1)).as("n_exact")))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val state = spark.read.parquet(Partitioned.ensureCmsState(spark, sf0001))
    val merged = state.select(col("j"), col("bucket"), col("c"))
      .unionByName(Partitioned.cmsDeltaPage(spark, sf0001)
        .select(col("j"), col("bucket"), col("c")))
      .groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(merged == full,
      "stored pages + one-day delta drifted from the full counter rebuild")
    // the registered gauge: one row per probed user (≤ 20 — the fixture's
    // last day may have fewer actives), every estimate bounded below by
    // the user's TRUE all-time count (the CMS one-sided guarantee)
    val got = Partitioned.q210.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && got.length <= 20)
    val exact = Tables(spark, sf0001).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (u, est) =>
      assert(est >= exact(u), s"user $u: estimate $est undercounts ${exact(u)}")
    }
  }

  test("q210: the delta counter page reads exactly 1 of 30 partitions") {
    val s2 = planSession()
    val df = Partitioned.cmsDeltaPage(s2, sf0001)
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.output.exists(_.name == "user_id") => f
    }
    assert(scans.size == 1, s"expected one fact scan:\n${df.queryExecution.executedPlan}")
    df.collect()
    val read = scans.head.metrics("numPartitions").value
    assert(read == 1,
      s"delta page read $read partitions, want 1:\n${df.queryExecution.executedPlan}")
  }

  test("q213: incremental bin merge ≡ the full-feed quantile-sketch rebuild") {
    val e = Tables(spark, sf0001).events
      .select(col("event_type").as("g"),
        greatest(lit(0L), round(col("value") * 100).cast("long")).as("v"))
    val full = Analytic.quantileFinish(
        Analytic.quantileBinsBy(e, Seq("g")))
      .collect().map(_.toSeq).toSeq
    val inc = Partitioned.q213.fn(spark, sf0001)
    // same finishing output, modulo the rename + order
    val incRows = inc.collect().map(_.toSeq).toSeq
    val fullSorted = full.sortBy(_.head.asInstanceOf[String])
    assert(incRows == fullSorted,
      "stored pages + one-day delta drifted from the full sketch rebuild")
  }

  test("q213: the delta bin page reads exactly 1 of 30 partitions") {
    val s2 = planSession()
    val df = Partitioned.quantDeltaPage(s2, sf0001)
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.output.exists(_.name == "value") => f
    }
    assert(scans.size == 1, s"expected one fact scan:\n${df.queryExecution.executedPlan}")
    df.collect()
    val read = scans.head.metrics("numPartitions").value
    assert(read == 1,
      s"delta page read $read partitions, want 1:\n${df.queryExecution.executedPlan}")
  }

  test("q217: incremental checksum merge ≡ the full-feed fingerprint; XOR retracts a day exactly") {
    val full = Tables(spark, sf0001).events
      .select(col("event_type"),
        Analytic.rowHash60(Partitioned.eventRowSer).as("hh"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(hh)").as("checksum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val got = Partitioned.q217.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == full,
      "stored pages + one-day delta drifted from the full fingerprint")
    // XOR self-inverse: merging the delta page back OUT of the
    // maintained result recovers the stored-state-only fold — the
    // retraction move q170 needs algebra for, free here
    val deltaPage = Partitioned.checksumDeltaPage(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val stateOnly = spark.read
      .parquet(Partitioned.ensureChecksumState(spark, sf0001))
      .groupBy(col("event_type"))
      .agg(sum(col("n_rows")).as("n"), expr("bit_xor(checksum)").as("cs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gotMap = got.map(g => g._1 -> (g._2, g._3)).toMap
    deltaPage.foreach { case (tpe, dn, dcs) =>
      val (mn, mcs) = gotMap(tpe)
      val (sn, scs) = stateOnly(tpe)
      assert(mn - dn == sn && (mcs ^ dcs) == scs,
        s"$tpe: XOR retraction did not recover the stored state")
    }
  }

  test("q180: run ledger covers every scheduled hour; missed runs are LIVE; counts conserve") {
    val rows = Partitioned.q180.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // contiguous hourly schedule: exactly one row per hour in the span
    val hours = rows.map(_._1)
    assert(hours.toSeq == (hours.min to hours.max by 3600L).toSeq,
      "ledger is not one row per scheduled hour")
    // the fixture has real gap hours (the q90/q91 premise) — missed runs
    // must be live, or a schedule regression could pass silently
    assert(rows.exists(_._2 == 0), "no missed run in the fixture ledger")
    assert(rows.exists(_._2 == 1))
    // ran flag ≡ landed data; missed hours carry zero events; totals
    // conserve against the raw feed minus the pre-first-fire fringe
    rows.foreach { case (h, ran, n) =>
      assert((ran == 1) == (n > 0), s"hour $h: ran=$ran n=$n")
    }
    val e = graft.Tables(spark, sf0001).events
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .collect().map(_.getLong(0))
    val inSpan = e.count(h => h >= hours.min && h <= hours.max)
    assert(rows.map(_._3).sum == inSpan.toLong,
      "ledger event counts do not conserve over the scheduled span")
  }

  private def stateSnapshot(path: String): Set[(java.sql.Date, String, Long, java.math.BigDecimal, Double, Double)] =
    spark.read.parquet(path)
      .select(col("day"), col("event_type"), col("n_events"),
        col("sum_value_dec"), col("min_value"), col("max_value"))
      .collect()
      .map(r => (r.getDate(0), r.getString(1), r.getLong(2),
        r.getDecimal(3), r.getDouble(4), r.getDouble(5))).toSet

  test("q177 backfill: per-day replay is IDEMPOTENT and order-free; catchup skips landed days") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_backfill_spec").toString
    val statePath = s"$tmp/state"
    val days = Partitioned.dayDim(spark, sf0001).select(col("day"))
      .collect().map(_.getDate(0)).toSeq.sortBy(_.getTime)
    assert(days.length >= 3, "fixture must span several days")
    val probe = days(days.length / 2)
    // replay three days OUT of order, then the probe day AGAIN: the
    // dynamic partition overwrite must replace only its own directory,
    // leaving the state set-identical (per-day idempotence)
    Seq(days(2), days(0), probe).foreach(d =>
      Partitioned.replayDay(spark, sf0001, statePath, d))
    val before = stateSnapshot(statePath)
    Partitioned.replayDay(spark, sf0001, statePath, probe)
    assert(stateSnapshot(statePath) == before,
      "re-replaying a landed day changed the state — replay is not idempotent")
    // catchup: only the missing days run, in schedule order
    val landed = Partitioned.landedDays(spark, statePath)
    assert(landed == Set(days(2), days(0), probe).map(identity))
    val ran = scala.collection.mutable.ArrayBuffer.empty[java.sql.Date]
    graft.pipeline.Pipeline.catchup(days, landed)(
      (d: java.sql.Date) => { ran += d; Partitioned.replayDay(spark, sf0001, statePath, d) })(
      Ordering.by(_.getTime))
    assert(ran.toSet == days.toSet -- landed, "catchup replayed a landed day")
    assert(ran.toSeq == ran.toSeq.sortBy(_.getTime), "catchup ran out of schedule order")
    // and a second catchup over the complete state replays NOTHING
    val ran2 = graft.pipeline.Pipeline.catchup(days,
      Partitioned.landedDays(spark, statePath))(
      (_: java.sql.Date) => fail("catchup must skip a fully-landed schedule"))(
      Ordering.by(_.getTime))
    assert(ran2.isEmpty)
  }

  test("q177: one day's replay scan reads exactly 1 of 30 partitions") {
    val s2 = planSession()
    val days = Partitioned.dayDim(s2, sf0001).select(col("day"))
      .collect().map(_.getDate(0))
    val df = Partitioned.dayPartials(s2, sf0001, days(days.length / 2))
    val scan = eventsScan(df)
    df.collect()
    val read = scan.metrics("numPartitions").value
    assert(read == 1,
      s"replay scan read $read partitions, want 1:\n${df.queryExecution.executedPlan}")
  }

  test("q177: day-by-day replayed state merges to the full recompute (q98 parity)") {
    val got = Partitioned.q177.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val full = Partitioned.q98.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    assert(got.toSeq == full.toSeq,
      "backfill replay diverged from the incremental-merge/full-recompute answer")
  }

  test("q226: incremental cent-page merge ≡ the full-feed KS rebuild (q223)") {
    val full = graft.operators.Analytic.q223.fn(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val inc = Partitioned.q226.fn(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(inc == full,
      "stored cent pages + one-day delta drifted from the full KS rebuild")
  }

  test("q226: the delta cent page reads exactly 1 of 30 partitions") {
    val s2 = planSession()
    val df = Partitioned.ksDeltaPage(s2, sf0001)
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.output.exists(_.name == "value") => f
    }
    assert(scans.size == 1, s"expected one fact scan:\n${df.queryExecution.executedPlan}")
    df.collect()
    val read = scans.head.metrics("numPartitions").value
    assert(read == 1,
      s"delta page read $read partitions, want 1:\n${df.queryExecution.executedPlan}")
  }
}
