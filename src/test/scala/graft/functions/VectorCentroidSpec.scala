package graft.functions

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

class VectorCentroidSpec extends SparkTestBase {

  test("typed Aggregator centroid is BIT-IDENTICAL to the exploded exact form") {
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
    // micro-scaled integer accumulation: merge order cannot perturb the
    // sum, so equality is exact, not within-epsilon
    typed.foreach { case (k, v) =>
      assert(v == exact(k), s"label/dim $k: $v vs ${exact(k)}")
    }
  }

  test("q59 (registered typed-Aggregator query) equals q43's exact centroids bit-for-bit") {
    val got = Similarity.q59.fn(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.q43.fn(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    assert(got == exact,
      s"first diff: ${got.collectFirst { case (k, v) if exact.get(k) != Some(v) => (k, v, exact.get(k)) }}")
  }

  test("micro-scaling matches Spark round semantics on halfway + negative values") {
    // HALF_UP away from zero, exactly what round(v*1e6).cast(long) does
    assert(VectorCentroid.micro(0.0000025f) ==
      java.math.BigDecimal.valueOf(0.0000025f.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    assert(VectorCentroid.micro(-0.5f) == -500000L)
    assert(VectorCentroid.micro(1.0f) == 1000000L)
  }
}
