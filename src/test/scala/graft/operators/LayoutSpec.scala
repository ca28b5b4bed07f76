package graft.operators

import graft.{Det, SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Layout operators are result-transparent (the answers must equal the
  * plain-table queries — both are oracle-checked too) while the layout
  * buys a physical property: q100's merged read spans physically
  * different file schemas; q101's index opens only the files whose
  * min/max interval overlaps the predicate, on EITHER z-dimension —
  * which a single-column sort cannot do for its second column. */
class LayoutSpec extends SparkTestBase {

  /** sf0.01: 150 users / 10k rows — wide enough domains that the spec's
    * predicate bands are genuinely selective (on sf0.001's 15 users a
    * 10-wide user band is a third of the domain). */
  private val sf001 = "/root/testdata/sf0.01"

  // ------------------------------------------------------------- q100
  test("q100: gen-1 files physically lack `value`; merged read restores it as nullable") {
    val path = Layout.ensureEvolved(spark, sf0001)
    val gen1 = spark.read.parquet(s"$path/gen=1")
    assert(!gen1.schema.fieldNames.contains("value"),
      "gen-1 files must not contain the evolved column")
    val merged = Layout.evolvedEvents(spark, sf0001)
    assert(merged.schema("value").dataType == DoubleType)
    val n = Tables(spark, sf0001).events.count()
    assert(merged.count() == n, "merged read must span both generations")
    // every gen-1 row reads NULL; every gen-2 row reads its source value
    assert(merged.filter(col("gen") === 1 && col("value").isNotNull).count() == 0)
    assert(merged.filter(col("gen") === 2 && col("value").isNull).count() == 0)
  }

  test("q100: evolved-layout aggregate ≡ date-CASE aggregate on the un-evolved table") {
    val plain = Tables(spark, sf0001).events
      .withColumn("v2",
        when(to_date(col("ts")) >= lit("2024-01-16").cast("date"), col("value")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"), count(col("v2")).as("n_with_value"),
        Det.dsum(col("v2")).as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first)
      .collect().toSeq
    val evolved = Layout.evolutionPipeline(spark, sf0001).collect().toSeq
    assert(evolved == plain)
    assert(evolved.nonEmpty)
  }

  // ------------------------------------------------------------- q101
  test("q101: index-pruned answer ≡ plain filtered aggregate") {
    val plain = Tables(spark, sf001).events
      .filter(col("user_id").between(10L, 19L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first)
      .collect().toSeq
    val skipped = Layout.zSkipPipeline(spark, sf001).collect().toSeq
    assert(skipped == plain)
    assert(skipped.nonEmpty)
  }

  test("q101: the z-order index skips files on BOTH dimensions; a linear sort only on its own") {
    val (_, zIdx) = Layout.ensureZOrdered(spark, sf001)
    val (_, linIdx) = Layout.ensureLinear(spark, sf001)
    val total = spark.read.parquet(zIdx).count()
    assert(total >= 16, s"layout produced only $total files")

    def files(idx: String, dim: String, lo: Double, hi: Double): Int = {
      val (mn, mx) = if (dim == "uid") ("min_uid", "max_uid") else ("min_val", "max_val")
      Layout.qualifyingFiles(spark, idx, mn, mx, lo, hi).size
    }
    // ~6% user band: both layouts cluster user_id and both skip hard
    val zU = files(zIdx, "uid", 10, 19)
    val linU = files(linIdx, "uid", 10, 19)
    assert(zU <= total / 2, s"z-order read $zU of $total files for the user band")
    assert(linU <= total / 4, s"linear sort read $linU of $total files for its own column")
    // ~4% value band: only the z-curve clusters the SECOND dimension —
    // the user-sorted layout holds the full value range in every file
    val zV = files(zIdx, "val", 100, 120)
    val linV = files(linIdx, "val", 100, 120)
    assert(linV >= total - 2,
      s"linear layout unexpectedly skipped value files ($linV of $total)")
    assert(zV <= total / 2,
      s"z-order read $zV of $total files for the value band (linear reads $linV)")
  }

  test("q101: pruned read re-applies the row predicate (index prunes files, not rows)") {
    val (layout, idx) = Layout.ensureZOrdered(spark, sf001)
    val files = Layout.qualifyingFiles(spark, idx, "min_uid", "max_uid", 10, 19)
    val opened = Layout.skippingRead(spark, layout, files)
    // qualifying files may contain out-of-band rows — the pipeline's
    // filter removes them; verify the raw union really is a superset
    val inBand = opened.filter(col("user_id").between(10L, 19L)).count()
    val expected = Tables(spark, sf001).events
      .filter(col("user_id").between(10L, 19L)).count()
    assert(inBand == expected, "pruned files lost in-band rows")
    assert(opened.count() >= inBand)
  }

  test("q101: an empty qualifying set yields an empty, correctly-shaped frame") {
    val (layout, idx) = Layout.ensureZOrdered(spark, sf0001)
    val none = Layout.qualifyingFiles(spark, idx, "min_uid", "max_uid", 1e9, 2e9)
    assert(none.isEmpty)
    val df = Layout.skippingRead(spark, layout, none)
    assert(df.schema.fieldNames.contains("user_id"))
    assert(df.count() == 0)
  }

  test("q140: the registered plan is exactly FFD over the relational manifest") {
    val files = Layout.relationalManifest(spark, sf0001)
    assert(files.size == 64, s"expected 64 fragments, got ${files.size}")
    // the manifest is FFD-ordered on arrival: sizes desc, name-tiebroken
    assert(files == files.sortBy { case (n, sz) => (-sz, n) })
    val target = (files.map(_._2).sum + 15) / 16
    val rows = Layout.q140.fn(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val expected = Layout.ffdPlan(files, target)
      .map { case (f, b, bin) => (bin, f, b) }
      .sortBy { case (bin, f, _) => (bin, f) }
    assert(rows.toSeq == expected)
  }

  test("compactionExecute: the rewrite lands one right-sized file per bin, content intact") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val layout = Layout.ensureFragmented(spark, sf0001)
    val files = Layout.manifest(spark, layout)
    val total = files.map(_._2).sum
    val target = (total + 15) / 16
    val plan = Layout.ffdPlan(files, target)
    val out = Layout.compactionExecute(spark, layout, plan)
    // one file per bin, named stably
    val outFiles = Layout.manifest(spark, out)
    val nBins = plan.map(_._3).distinct.length
    assert(outFiles.length == nBins,
      s"expected $nBins compacted files, got ${outFiles.length}")
    // content identical: same row count and same order-insensitive hash
    def digest(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
      // XOR fold (q131's pattern) — a SUM of hashes overflows int64
      // under ANSI
      val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(org.apache.spark.sql.functions.expr("bit_xor(h)"))
        .collect()(0).getLong(0)
      (df.count(), h)
    }
    assert(digest(out) == digest(layout), "compaction changed the data")
    // compaction actually compacts: fewer files than before, and every
    // multi-file bin landed within the byte envelope (parquet re-encoding
    // can move bytes a little; allow 25%)
    assert(outFiles.length < files.length)
    val planBytes = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    outFiles.foreach { case (name, bytes) =>
      val bin = name.stripPrefix("bin_").stripSuffix(".parquet").toInt
      if (plan.count(_._3 == bin) > 1)
        assert(bytes <= (planBytes(bin) * 1.25).toLong + 4096,
          s"bin $bin output $bytes far exceeds its planned ${planBytes(bin)}")
    }
  }

  test("compactionPlanFs: FFD over real file bytes respects bin capacity") {
    val layout = Layout.ensureFragmented(spark, sf0001)
    val files = Layout.manifest(spark, layout)
    assert(files.size == 64, s"expected 64 fragments, got ${files.size}")
    val total = files.map(_._2).sum
    val target = (total + 15) / 16
    val rows = Layout.compactionPlanFs(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // exact FFD reproduction
    val expected = Layout.ffdPlan(files, target)
      .map { case (f, b, bin) => (bin, f, b) }
      .sortBy { case (bin, f, _) => (bin, f) }
    assert(rows.toSeq == expected)
    // every file planned exactly once
    assert(rows.map(_._2).toSet == files.map(_._1).toSet)
    // capacity: no multi-file bin exceeds the target
    rows.groupBy(_._1).foreach { case (bin, fs) =>
      if (fs.length > 1)
        assert(fs.map(_._3).sum <= target, s"bin $bin over target")
    }
    // effectiveness: bins ≥ the volume lower bound, and strictly fewer
    // bins than files (the plan actually compacts)
    val nBins = rows.map(_._1).distinct.length
    assert(nBins >= ((total + target - 1) / target).toInt)
    assert(nBins < files.size, "plan does not compact anything")
  }
  test("q214 HRW sharding equals an md5 replay; adding a shard moves docs ONLY onto it") {
    val ids = Tables(spark, sf0001).documents
      .select(col("doc_id")).collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(shard: Int, id: Long): Long = java.lang.Long.parseLong(
      md.digest(s"$shard:$id".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    def assign(id: Long, n: Int): Int =
      (0 until n).map(s0 => (w(s0, id), -s0)).max match { case (_, ns) => -ns }
    val a8 = ids.map(id => id -> assign(id, 8)).toMap
    val a9 = ids.map(id => id -> assign(id, 9)).toMap
    val expected = (0 until 9).map { s0 =>
      (s0,
        ids.count(a8(_) == s0).toLong,
        ids.count(a9(_) == s0).toLong,
        ids.count(id => a9(id) == s0 && a8(id) != a9(id)).toLong)
    }
    val got = Layout.q214.fn(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // HRW minimal disruption: every moved doc lands on the NEW shard
    val movedElsewhere = got.filter(g => g._1 < 8 && g._4 != 0)
    assert(movedElsewhere.isEmpty,
      s"docs moved between surviving shards: $movedElsewhere")
    val s8row = got.find(_._1 == 8).get
    assert(s8row._2 == 0L && s8row._3 == s8row._4 && s8row._3 > 0,
      "new shard's population must be exactly the moved set, and nonempty")
    // placement conserves the corpus under both grids
    assert(got.map(_._2).sum == ids.length.toLong)
    assert(got.map(_._3).sum == ids.length.toLong)
  }
}
