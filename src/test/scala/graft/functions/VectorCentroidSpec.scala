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

  test("q59 (registered Aggregator query) agrees with q43's exact centroids") {
    val csv = Similarity.q59.fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val exact = Similarity.q43.fn(spark, sf0001).collect()
      .map(r => (r.getInt(0).toString, r.getInt(1)) -> r.getDouble(2)).toMap
    assert(csv.nonEmpty)
    csv.foreach { case (label, s) =>
      val vals = s.split(",").map(_.toDouble)
      assert(vals.length == 64)
      vals.zipWithIndex.foreach { case (v, i) =>
        val e = exact((label, i + 1))
        // float-sum merge order (≤1e-6) + 6-dp output rounding (≤5e-7)
        assert(math.abs(v - e) < 2e-6, s"label $label dim ${i + 1}: $v vs $e")
      }
    }
  }
}
