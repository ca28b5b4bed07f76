package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the per-dimension mean of an embedding
  * column — the custom-typed-agg slot from SURVEY.md §2.2. The buffer is a
  * primitive long array + count, so partial aggregation (map-side
  * combine) and merge work exactly like any built-in agg: shuffle volume
  * is one (dim+1)-wide buffer per group, not the row set.
  *
  * Determinism: each element is micro-scaled to an integer on entry
  * (`round(v · 10⁶)` with Spark `round`'s exact HALF_UP-via-BigDecimal
  * semantics), so the reduction is an integer sum — merge order cannot
  * perturb it, and the finished mean `Σ / (n · 10⁶)` is bit-identical to
  * the exploded integer-scaled form (Similarity q43) and to the DuckDB
  * oracle replaying the same arithmetic. This is the determinism
  * contract's micro-scale rule applied inside a typed Aggregator.
  */
class VectorCentroid(dim: Int)
    extends Aggregator[Seq[Float], (Array[Long], Long), Seq[Double]] {

  override def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)

  override def reduce(b: (Array[Long], Long), v: Seq[Float]): (Array[Long], Long) = {
    val arr = b._1
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { arr(i) += VectorCentroid.micro(v(i)); i += 1 }
    (arr, b._2 + 1)
  }

  override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
    val arr = x._1
    var i = 0
    while (i < dim) { arr(i) += y._1(i); i += 1 }
    (arr, x._2 + y._2)
  }

  override def finish(b: (Array[Long], Long)): Seq[Double] =
    if (b._2 == 0) Seq.fill(dim)(0.0)
    else b._1.toSeq.map(_.toDouble / (b._2.toDouble * 1e6))

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    Encoders.kryo[(Array[Long], Long)]

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object VectorCentroid {
  /** `round(v.cast(double) * 1e6).cast(long)` with Spark's exact Round
    * semantics (BigDecimal.valueOf + HALF_UP), so the typed path and the
    * column-expression path (q43) agree bit-for-bit. */
  private[functions] def micro(v: Float): Long =
    java.math.BigDecimal.valueOf(v.toDouble * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
}
