package graft.operators

import graft.SparkTestBase

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

  test("tfidf ranks are 1..3 per doc with no float output") {
    val rows = TextOps.q39.fn(spark, sf0001).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }
}
