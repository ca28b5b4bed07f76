package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkTestBase {

  test("langid guess is deterministic across runs and covers all docs") {
    val a = TextOps.q38.fn(spark, sf0001).collect().map(_.toSeq).toSeq
    val b = TextOps.q38.fn(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(a == b)
    val total = a.map(_.last.asInstanceOf[Long]).sum
    assert(total == 500L, s"distribution should cover all 500 docs, got $total")
  }

  test("fingerprint is stable and partitions the corpus") {
    val fp = TextOps.q45.fn(spark, sf0001).collect()
    assert(fp.map(_.getLong(1)).sum == 500L)
  }

  test("native graft_bigram_hashes equals the composed xxhash64 bigram form") {
    graft.functions.GraftFunctions.register(spark)
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 50)
    val toks = split(col("text"), " ")
    val composed = d.select(col("doc_id"), explode(transform(
        sequence(lit(0), size(toks) - 2),
        i => struct(
          xxhash64(element_at(toks, i + 1), element_at(toks, i + 2)).as("hb"),
          xxhash64(element_at(toks, i + 1)).as("h1")))).as("b"))
      .select(col("doc_id"), col("b.hb"), col("b.h1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val native = d.select(col("doc_id"),
        explode(call_function("graft_bigram_hashes", toks)).as("b"))
      .select(col("doc_id"), col("b.hb"), col("b.h1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native.sorted == composed.sorted)
    // degenerate: single-token doc yields no bigrams
    import spark.implicits._
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(one.select(call_function("graft_bigram_hashes", split(col("text"), " ")))
      .collect()(0).getSeq[Any](0).isEmpty)
  }

  test("tfidf ranks are 1..3 per doc with no float output") {
    val rows = TextOps.q39.fn(spark, sf0001).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }

  test("score threshold keeps exactly the top 80% by rank (q71)") {
    val rows = TextOps.q71.fn(spark, sf0001).collect()
    val n = rows.length
    val kept = rows.filter(_.getBoolean(3))
    val dropped = rows.filterNot(_.getBoolean(3))
    assert(kept.length == n - n / 5, s"kept ${kept.length} of $n")
    // the cut is a clean rank partition: every kept doc outranks every
    // dropped doc
    assert(kept.map(_.getInt(2)).min > dropped.map(_.getInt(2)).max)
  }
}
