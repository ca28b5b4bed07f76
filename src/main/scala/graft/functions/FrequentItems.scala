package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries frequent-items summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012) —
  * the sketch half of the heavy-hitters operator (TextOps q86).
  *
  * One summary holds at most `capacity` (token, counter) entries.
  * Guarantee: every counter undercounts its token's true frequency by at
  * most n/(capacity+1), where n is the total token count folded in —
  * including across arbitrary partial-aggregate merges — so any token
  * with true frequency STRICTLY ABOVE n/capacity is always present in
  * the final summary, regardless of Spark's partition/merge order. The
  * candidate SET below the threshold may vary with merge order; callers
  * must therefore always re-count candidates exactly and filter on the
  * true counts (the q86 pipeline does), which makes the end-to-end
  * operator deterministic even though the sketch interior is not.
  *
  * Scale shape: this is a classic TypedImperativeAggregate-style buffer —
  * map-side combine reduces every partition to ≤ capacity entries, so the
  * shuffle moves #partitions × capacity short rows instead of the full
  * token stream (the naive `groupBy(token)` shuffles the whole corpus
  * vocabulary). The buffer mutates in place like [[VectorCentroid]]'s.
  */
class FrequentItems(capacity: Int)
    extends Aggregator[Seq[String], mutable.HashMap[String, Long], Seq[String]] {
  require(capacity > 0, s"FrequentItems capacity must be positive: $capacity")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(
      b: mutable.HashMap[String, Long],
      toks: Seq[String]): mutable.HashMap[String, Long] = {
    if (toks != null) toks.foreach { t =>
      if (t != null) b.get(t) match {
        case Some(c) => b.update(t, c + 1L)
        case None if b.size < capacity => b.update(t, 1L)
        case None =>
          // full, unseen token: decrement every counter (the classic MG
          // step — the new token and one unit of `capacity` existing
          // counters annihilate), dropping zeros. O(capacity), amortized
          // O(1) per stream item.
          val ks = b.keysIterator.toArray
          var i = 0
          while (i < ks.length) {
            val c = b(ks(i)) - 1L
            if (c <= 0L) b.remove(ks(i)) else b.update(ks(i), c)
            i += 1
          }
      }
    }
    b
  }

  override def merge(
      x: mutable.HashMap[String, Long],
      y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    y.foreach { case (t, c) => x.update(t, x.getOrElse(t, 0L) + c) }
    if (x.size > capacity) {
      // Mergeable-summaries prune: subtract the (capacity+1)-th largest
      // counter from every entry and drop the non-positive — at most
      // `capacity` entries survive and the undercount bounds add.
      val counts = x.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      val ks = x.keysIterator.toArray
      var i = 0
      while (i < ks.length) {
        val c = x(ks(i)) - d
        if (c <= 0L) x.remove(ks(i)) else x.update(ks(i), c)
        i += 1
      }
    }
    x
  }

  /** Candidate tokens, sorted for a stable wire shape. */
  override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
    b.keysIterator.toArray.sorted.toSeq

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
