package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The multimodal decode contract: the imperative `mapPartitions` path
  * (where a real codec plugs in) must produce exactly the rows of the
  * registered native-expression stub — schema, partitioning and batch
  * shape are thereby proven before any real codec exists. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def stubMeta(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      (ascii(substring(col("text"), 1, 1)) * 4 + 64).cast("int").as("width"),
      (ascii(substring(col("text"), 2, 1)) * 3 + 48).cast("int").as("height"),
      when(length(col("text")) % 2 === 0, "png").otherwise("jpg").as("format"))

  test("batched imperative decode ≡ native-expression stub on the fixture corpus") {
    val docs = Tables(spark, sf0001).documents
      .withColumn("blob", col("text").cast("binary"))
    val batched = Multimodal.decodeMetaBatched(docs)
      .orderBy(col("doc_id")).collect().toSeq
    val native = stubMeta(docs).orderBy(col("doc_id")).collect().toSeq
    assert(batched.nonEmpty)
    assert(batched == native)
  }

  test("batched decode handles empty and single-byte blobs") {
    val docs = Seq((1L, ""), (2L, "A"), (3L, "AB"))
      .toDF("doc_id", "text").withColumn("blob", col("text").cast("binary"))
    val rows = Multimodal.decodeMetaBatched(docs)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    // ascii('') = 0 in Spark; the byte kernel's missing-byte fallback must agree
    assert(rows == Seq(
      (1L, 64, 48, "png"),
      (2L, 65 * 4 + 64, 48, "jpg"),
      (3L, 65 * 4 + 64, 66 * 3 + 48, "png")), rows.mkString(";"))
  }

  test("batched decode runs one kernel per partition, not per job (stays distributed)") {
    val docs = Tables(spark, sf0001).documents
      .withColumn("blob", col("text").cast("binary")).repartition(3)
    val out = Multimodal.decodeMetaBatched(docs)
    assert(out.rdd.getNumPartitions == 3)
    assert(out.count() == docs.count())
  }
}
