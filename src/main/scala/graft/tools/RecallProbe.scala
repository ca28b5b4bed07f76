package graft.tools

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions.col

/** Dev probe: measure whether the approximate pipelines are output-equal
  * to their exact twins at every shipped fixture — the evidence the
  * verified-SF-envelope oracle promotions rest on (q42/q84 round 12). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val exact = Similarity.q41.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      val ann = Similarity.q42.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      val em = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val mp = Similarity.annTopKMultiProbe(em, 4, 4, 11).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      val j32 = Dedup.q32.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val j33 = Dedup.q33.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      println(s"PROBE $sf q42==q41: ${ann == exact}  q84==q41: ${mp == exact}  " +
        s"q32==q33: ${j32 == j33} (${j32.size}/${j33.size})")
    }
    spark.stop()
  }
}
