package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("shingles produces distinct word 3-grams, degenerate short docs kept whole") {
    val d = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val sh = Dedup.shingles(d).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d"), (2L, "x y")))
  }

  test("jaccardPairs computes exact overlap ratio") {
    // doc1 shingles {a b c, b c d}; doc2 {b c d, c d e} → jac = 1/3
    val d = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    val out = Dedup.jaccardPairs(Dedup.shingles(d))
      .select("d1", "d2", "jac").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - 1.0 / 3.0) < 1e-6)
  }

  test("MinHash-LSH candidates recover every exact-Jaccard pair on fixtures") {
    val lsh = Dedup.q32.fn(spark, sf0001).select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.q33.fn(spark, sf0001).select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size}, extra ${(lsh -- exact).size}")
  }

  test("simhash: identical docs at hamming 0, near-identical within 6") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("simhash").toString
    d.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.q34.fn(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }
}
