package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The q89 file-source contracts NOT covered by StreamOpsSpec's
  * CSV/ORC/JSONL round-trips: explicit-schema reads are TYPE-exact (the
  * inferred-schema round-trip only checks counts/columns), and malformed
  * lines quarantine into `_corrupt_record` instead of failing the scan. */
class SourcesSpec extends SparkTestBase {

  test("jsonl round-trip preserves values and types exactly") {
    val docs = Tables(spark, sf0001).documents
      .select("doc_id", "text", "lang", "source", "n_chars")
    val back = Sources.readJsonl(spark, Sources.ensureJsonl(spark, sf0001))
      .filter(col("_corrupt_record").isNull)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.schema == docs.schema, s"schema drift: ${back.schema}")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("malformed JSONL lines are quarantined, not fatal, and don't poison good rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad")
    val p = dir.resolve("part-0.json")
    java.nio.file.Files.writeString(p,
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s0", "n_chars": 2}
        |{"doc_id": oops not json
        |{"doc_id": 3, "text": "also ok", "lang": "de", "source": "s1", "n_chars": 7}
        |""".stripMargin)
    // Spark disallows queries whose only referenced column is the
    // corrupt-record column on a raw file scan — cache to materialize
    // the parse once, then the quarantine queries are unrestricted
    val df = Sources.readJsonl(spark, dir.toString).cache()
    try {
      val good = df.filter(col("_corrupt_record").isNull)
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(good.count() == 2 && bad.count() == 1)
      assert(good.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    } finally df.unpersist()
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("csv round-trip preserves values and types exactly") {
    val docs = Tables(spark, sf0001).documents
      .select("doc_id", "text", "lang", "source", "n_chars")
    val back = Sources.readCsv(spark, Sources.ensureCsv(spark, sf0001))
      .filter(col("_corrupt_record").isNull)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.schema == docs.schema, s"schema drift: ${back.schema}")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("malformed CSV lines are quarantined, not fatal, and don't poison good rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_bad")
    val p = dir.resolve("part-0.csv")
    // row 2 has a non-numeric doc_id AND too many fields; row 3 is fine
    java.nio.file.Files.writeString(p,
      """1,ok,en,s0,2
        |oops,not,a,valid,row,with,extra,fields
        |3,also ok,de,s1,7
        |""".stripMargin)
    val df = Sources.readCsv(spark, dir.toString).cache() // same corrupt-column-only caveat as JSONL
    try {
      val good = df.filter(col("_corrupt_record").isNull)
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(good.count() == 2 && bad.count() == 1)
      assert(good.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    } finally df.unpersist()
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("q192 ORC source: n_chars filter pushed to the OrcScan, text pruned out of the read") {
    val df = Sources.q192.fn(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("OrcScan") || plan.toLowerCase.contains("orc"),
      s"no ORC scan in the plan:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars,300)"),
      s"n_chars filter not pushed to the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("text:"),
      s"text column not pruned from the ORC read:\n$plan")
    // values survive the trip: same aggregate over the original parquet
    val expected = Tables(spark, sf0001).documents
      .filter(col("n_chars") >= 300 && col("n_chars") < 900)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy(col("source").asc_nulls_first)
      .collect().toSeq
    assert(df.collect().toSeq == expected)
  }

  test("avro round-trip preserves values and types exactly") {
    val docs = Tables(spark, sf0001).documents
      .select("doc_id", "text", "lang", "source", "n_chars")
    val back = Sources.readAvro(spark, Sources.ensureAvro(spark, sf0001))
    assert(back.schema == docs.schema, s"schema drift: ${back.schema}")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("avro explicit reader schema: name-based evolution, not positional") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_evo").toString
    // writer schema has an EXTRA field (score) and LACKS n_chars —
    // the two evolution directions a long-lived feed exercises
    Seq((1L, "hello", "en", "s0", 0.9), (2L, "welt", "de", "s1", 0.1))
      .toDF("doc_id", "text", "lang", "source", "score")
      .write.mode("overwrite").format(Sources.AvroFormat).save(dir)
    val back = Sources.readAvro(spark, dir)
    // extra writer field projected away; missing reader field is null
    assert(back.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val rows = back.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.isNullAt(4)), "missing writer field must read as null")
    assert(rows.map(_.getString(1)).toSeq == Seq("hello", "welt"))
  }

  test("avro quarantine: key-less records split out, never poison the clean side") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_q").toString
    Seq((Some(1L), "ok", "en", "s0", Some(2L)),
        (None, "no key", "en", "s0", Some(6L)),
        (Some(3L), "also ok", "de", "s1", Some(7L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").format(Sources.AvroFormat).save(dir)
    val clean = Sources.cleanAvro(spark, dir).orderBy("doc_id").collect()
    val bad = Sources.quarantineAvro(spark, dir).collect()
    assert(clean.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(bad.length == 1 && bad.head.getString(1) == "no key")
  }

  test("q222 avro source equals the same aggregate over the original parquet") {
    val df = Sources.q222.fn(spark, sf0001)
    val expected = Tables(spark, sf0001).documents
      .filter(col("doc_id").isNotNull)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        sum(length(col("text"))).as("sum_text_len"))
      .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
      .collect().toSeq
    assert(df.collect().toSeq == expected)
  }


  test("xml round-trip preserves values and types exactly (escaping included)") {
    val docs = Tables(spark, sf0001).documents
      .select("doc_id", "text", "lang", "source", "n_chars")
    val back = Sources.readXml(spark, Sources.ensureXml(spark, sf0001))
      .filter(col("_corrupt_record").isNull)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.schema == docs.schema, s"schema drift: ${back.schema}")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // markup-hostile text survives the writer's escaping
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_esc").toString
    val hostile = Seq((1L, "a & b < c > d", "en", "s0", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    hostile.write.mode("overwrite").option("rowTag", "doc")
      .option("rootTag", "docs").format("xml").save(dir)
    val h = Sources.readXml(spark, dir).select("doc_id", "text").collect()
    assert(h.length == 1 && h.head.getString(1) == "a & b < c > d")
  }

  test("malformed XML elements are quarantined, not fatal, and don't poison good rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_bad")
    val p = dir.resolve("part-0.xml")
    java.nio.file.Files.writeString(p,
      """<docs>
        |<doc><doc_id>1</doc_id><text>ok</text><lang>en</lang><source>s0</source><n_chars>2</n_chars></doc>
        |<doc><doc_id>oops not a number</doc_id><text>bad</text><lang>en</lang><source>s0</source><n_chars>3</n_chars></doc>
        |<doc><doc_id>3</doc_id><text>also ok</text><lang>de</lang><source>s1</source><n_chars>7</n_chars></doc>
        |</docs>
        |""".stripMargin)
    val df = Sources.readXml(spark, dir.toString).cache() // same corrupt-column-only caveat as JSONL
    try {
      val good = df.filter(col("_corrupt_record").isNull)
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(good.count() == 2 && bad.count() == 1)
      assert(good.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    } finally df.unpersist()
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("q227 xml source equals the same aggregate over the original parquet") {
    val df = Sources.q227.fn(spark, sf0001)
    val expected = Tables(spark, sf0001).documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang").asc_nulls_first)
      .collect().toSeq
    assert(df.collect().toSeq == expected)
  }

  test("q231 conformance: every landed format fingerprints identically to the parquet source") {
    val rows = Sources.q231.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq("avro", "csv", "jsonl", "orc", "xml"))
    // the invariant the oracle states: all five rows carry the SOURCE
    // table's own fingerprint — compute it directly off the parquet
    val ser = concat_ws("|", col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"))
    val src = Tables(spark, sf0001).documents
      .select(Analytic.rowHash60(ser).as("hh"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(hh)").as("cs"))
      .collect()(0)
    val (n, cs) = (src.getLong(0), src.getLong(1))
    rows.foreach { case (fmt, gotN, gotCs) =>
      assert(gotN == n && gotCs == cs,
        s"format $fmt diverged from the source fingerprint ($gotN/$gotCs vs $n/$cs)")
    }
  }
}
