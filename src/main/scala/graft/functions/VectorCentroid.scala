package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the per-dimension mean of an embedding
  * column — the custom-typed-agg slot from SURVEY.md §2.2. The buffer is a
  * primitive double array + count, so partial aggregation (map-side
  * combine) and merge work exactly like any built-in agg: shuffle volume
  * is one (dim+1)-wide buffer per group, not the row set.
  *
  * Note on determinism: like every parallel float sum, results depend on
  * partition merge order in the last ulp — use the exploded
  * integer-scaled form (Similarity q43) when exact cross-engine
  * reproducibility is required; use this when a single vector-typed
  * column out of `groupBy(...).agg(...)` is the goal.
  */
class VectorCentroid(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val arr = b._1
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { arr(i) += v(i); i += 1 }
    (arr, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val arr = x._1
    var i = 0
    while (i < dim) { arr(i) += y._1(i); i += 1 }
    (arr, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0) Seq.fill(dim)(0.0) else b._1.toSeq.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.kryo[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
