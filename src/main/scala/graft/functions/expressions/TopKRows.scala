package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: keeps the k best
  * `(score, id1, id2)` triples under the TOTAL order
  * (score DESC, id1 ASC, id2 ASC), returned best-first as
  * `array<struct<score double, id1 long, id2 long>>`.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY …) <= k` shuffles EVERY input row to its group's reducer and
  * sorts each group fully — at 100 TB that shuffle IS the job. This
  * aggregate is map-side combinable (partial+final through
  * ObjectHashAggregate): each map task emits at most k triples per group
  * it saw, so shuffle volume is bounded by k·groups·tasks, independent
  * of input row count — the bounded-heap TopK every MPP engine ships as
  * a physical operator, here as a Catalyst `TypedImperativeAggregate`.
  *
  * Determinism: the order is total — scores under
  * `java.lang.Double.compare`'s total order (NaN sorts above +∞, −0.0
  * below 0.0), ties broken by id1 then id2 — so the retained set and
  * its output order are independent of partitioning and merge order
  * even on NaN-bearing input; safe for the DuckDB oracle compare.
  * Null inputs: a row with any null child is skipped (matches the
  * window formulation over non-null fixture columns).
  *
  * Insertion is O(k) against a flat triple of primitive arrays (no heap
  * node boxing); k is a literal, so buffers are fixed-size. For the
  * k ≤ ~100 this serves, a scan beats a binary heap's pointer chasing.
  */
case class TopKRows(
    score: Expression,
    id1: Expression,
    id2: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRows.Buffer] {

  require(k >= 1, "graft_top_k: k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id1, id2)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id1.dataType, id2.dataType) match {
      case (DoubleType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_top_k expects (double, bigint, bigint), got (${s.sql}, ${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id1", LongType, nullable = false),
    StructField("id2", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKRows.Buffer = new TopKRows.Buffer(k)

  override def update(buffer: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
    val s = score.eval(input)
    val x = id1.eval(input)
    val y = id2.eval(input)
    if (s != null && x != null && y != null) {
      buffer.insert(s.asInstanceOf[Double], x.asInstanceOf[Long], y.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKRows.Buffer, other: TopKRows.Buffer): TopKRows.Buffer = {
    var i = 0
    while (i < other.n) {
      buffer.insert(other.scores(i), other.ids1(i), other.ids2(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKRows.Buffer): Any = {
    val order = Array.range(0, buffer.n).sortWith((i, j) => buffer.better(i, j))
    new GenericArrayData(order.map(i =>
      InternalRow(buffer.scores(i), buffer.ids1(i), buffer.ids2(i)): Any))
  }

  override def serialize(buffer: TopKRows.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 24)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids1(i)); bb.putLong(buffer.ids2(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRows.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKRows.Buffer(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble, bb.getLong, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(score = newChildren(0), id1 = newChildren(1), id2 = newChildren(2))
}

object TopKRows {
  /** Fixed-capacity buffer of the k best triples, unordered until eval. */
  final class Buffer(val k: Int) {
    val scores = new Array[Double](k)
    val ids1 = new Array[Long](k)
    val ids2 = new Array[Long](k)
    var n = 0

    /** Is element i strictly better than element j under
      * (score DESC, id1 ASC, id2 ASC)? */
    def better(i: Int, j: Int): Boolean =
      betterThan(scores(i), ids1(i), ids2(i), scores(j), ids1(j), ids2(j))

    /** Scores compare via `java.lang.Double.compare` — the NaN-safe
      * TOTAL order (NaN above +∞, −0.0 below 0.0; same convention
      * NearestCells uses) — never raw `>`/`==`, whose NaN behavior
      * ("not better" both ways) makes the comparator intransitive and
      * the retained set merge-order-dependent. */
    private def betterThan(s1: Double, x1: Long, y1: Long,
        s2: Double, x2: Long, y2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && (x1 < x2 || (x1 == x2 && y1 < y2)))
    }

    def insert(s: Double, x: Long, y: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids1(n) = x; ids2(n) = y; n += 1
      } else {
        // find the worst retained element; replace it if the candidate
        // is better (O(k) scan over primitive arrays)
        var w = 0
        var i = 1
        while (i < n) {
          if (better(w, i)) w = i
          i += 1
        }
        if (betterThan(s, x, y, scores(w), ids1(w), ids2(w))) {
          scores(w) = s; ids1(w) = x; ids2(w) = y
        }
      }
    }
  }
}
