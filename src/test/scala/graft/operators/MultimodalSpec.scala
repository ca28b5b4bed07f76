package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The multimodal decode contract: the imperative `mapPartitions` path
  * (where a real codec plugs in) must produce exactly the rows of the
  * registered native-expression stub — schema, partitioning and batch
  * shape are thereby proven before any real codec exists. Both paths are
  * BYTE-semantic (they parse the blob, not the text), so the contract
  * holds for non-ASCII corpora too — pinned below.  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def nativeMeta(df: org.apache.spark.sql.DataFrame) =
    Multimodal.fakeDecodeMeta(df)
      .select(col("doc_id"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        col("media_meta.format").as("format"))

  test("batched imperative decode ≡ native-expression stub on the fixture corpus") {
    val docs = Tables(spark, sf0001).documents
      .withColumn("blob", col("text").cast("binary"))
    val batched = Multimodal.decodeMetaBatched(docs)
      .orderBy(col("doc_id")).collect().toSeq
    val native = nativeMeta(docs).orderBy(col("doc_id")).collect().toSeq
    assert(batched.nonEmpty)
    assert(batched == native)
  }

  test("decode paths agree byte-for-byte on NON-ASCII blobs") {
    // UTF-8 multi-byte leads: 'é' = C3 A9, '日' = E6 97 A5. Byte 0/1 of
    // the blob differ from codepoint 0/1 of the text — the old
    // char-semantic stub would diverge here; the byte-semantic one must
    // match the kernel exactly.
    val docs = Seq((1L, "héllo"), (2L, "日本語"), (3L, "é"), (4L, "aé"))
      .toDF("doc_id", "text").withColumn("blob", col("text").cast("binary"))
    val batched = Multimodal.decodeMetaBatched(docs)
      .orderBy(col("doc_id")).collect().toSeq
    val native = nativeMeta(docs).orderBy(col("doc_id")).collect().toSeq
    assert(batched == native, s"batched=$batched native=$native")
    // spot-check true byte values: "é" blob = [C3, A9], length 2
    val r3 = batched.find(_.getLong(0) == 3L).get
    assert(r3.getInt(1) == 0xC3 * 4 + 64)
    assert(r3.getInt(2) == 0xA9 * 3 + 48)
    assert(r3.getString(3) == "png")
  }

  test("batched decode handles empty and single-byte blobs") {
    val docs = Seq((1L, ""), (2L, "A"), (3L, "AB"))
      .toDF("doc_id", "text").withColumn("blob", col("text").cast("binary"))
    val rows = Multimodal.decodeMetaBatched(docs)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    // missing bytes default to 0 on both paths (ascii('') = 0 in Spark)
    assert(rows == Seq(
      (1L, 64, 48, "png"),
      (2L, 65 * 4 + 64, 48, "jpg"),
      (3L, 65 * 4 + 64, 66 * 3 + 48, "png")), rows.mkString(";"))
    val native = nativeMeta(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(native == rows)
  }

  test("batched decode runs one kernel per partition, not per job (stays distributed)") {
    val docs = Tables(spark, sf0001).documents
      .withColumn("blob", col("text").cast("binary")).repartition(3)
    val out = Multimodal.decodeMetaBatched(docs)
    assert(out.rdd.getNumPartitions == 3)
    assert(out.count() == docs.count())
  }
}
