package graft.functions

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

class VectorCentroidSpec extends SparkTestBase {

  test("typed Aggregator centroid matches the exploded exact form within 1e-6") {
    val centroid = udaf(new VectorCentroid(64), ExpressionEncoder[Seq[Float]]())
    val em = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val typed = em.groupBy(col("label"))
      .agg(centroid(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("dim0", "v")))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1) + 1) -> r.getDouble(2)).toMap
    val exact = Similarity.q43.fn(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(typed.keySet == exact.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) < 1e-6, s"label/dim $k: $v vs ${exact(k)}")
    }
  }
}
