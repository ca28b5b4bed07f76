package graft.tools
import graft.operators.Similarity
import org.apache.spark.sql.functions.col
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession()
    val geoms = Seq((16, 4), (24, 4), (32, 4), (16, 3), (32, 3))
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val exact = Similarity.q41.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      val em = spark.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"), col("embedding"))
      for ((t, p) <- geoms) {
        val ann = Similarity.annTopKLsh(em, t, p).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
        val es = exact.map(x => (x._1, x._3)).toSet; val as = ann.map(x => (x._1, x._3)).toSet
        println(f"PROBE $sf ${t}x$p exact=${ann == exact} recall=${(es & as).size.toDouble / es.size}%.3f")
      }
    }
    spark.stop()
  }
}
