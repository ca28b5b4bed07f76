package graft.functions

import graft.functions.expressions.{ArrayStats, BigramHashes, ByteHistogram, ChunkHashes, DotProduct, HashedShingles, LshBuckets, LshProbeKeys, MinHash64, NearestCells, NfcNormalize, SimHash64, SortedIntersect, SortedIntersectCount, TopKRows, WinnowFingerprints, WinnowWindowMins}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** `SparkSessionExtensions` injector for the library's native expressions —
  * the deployment-grade registration path: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and `graft_dot` /
  * `graft_simhash64` / `graft_minhash64` / `graft_lsh_buckets` are
  * available in every session's SQL and `call_function` without touching
  * the FunctionRegistry by hand. [[GraftFunctions.register]] remains the
  * lightweight per-session alternative; the two paths register the same
  * builders (parity asserted in GraftExtensionsSpec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(n: Int, IntegerType) => n
    case _ => throw new IllegalArgumentException(s"$what must be an int literal")
  }

  private def arity(exprs: Seq[Expression], n: Int, sig: String): Seq[Expression] = {
    require(exprs.length == n, s"$sig takes $n arguments")
    exprs
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "graft_dot(a, b)")
        DotProduct(e.head, e(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) =>
        SimHash64(arity(exprs, 1, "graft_simhash64(tokens)").head)))
    e.injectFunction((
      FunctionIdentifier("graft_byte_histogram"),
      new ExpressionInfo(classOf[ByteHistogram].getName, "graft_byte_histogram"),
      (exprs: Seq[Expression]) =>
        ByteHistogram(arity(exprs, 1, "graft_byte_histogram(blob)").head)))
    e.injectFunction((
      FunctionIdentifier("graft_minhash64"),
      new ExpressionInfo(classOf[MinHash64].getName, "graft_minhash64"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "graft_minhash64(tokens, numHashes)")
        MinHash64(e.head, intLit(e(1), "graft_minhash64: numHashes"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_hashed_shingles"),
      new ExpressionInfo(classOf[HashedShingles].getName, "graft_hashed_shingles"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "graft_hashed_shingles(tokens, n)")
        HashedShingles(e.head, intLit(e(1), "graft_hashed_shingles: n"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow_fps"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 3, "graft_winnow_fps(tokens, k, w)")
        WinnowFingerprints(e.head, intLit(e(1), "graft_winnow_fps: k"),
          intLit(e(2), "graft_winnow_fps: w"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_winnow_window_mins"),
      new ExpressionInfo(classOf[WinnowWindowMins].getName, "graft_winnow_window_mins"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 3, "graft_winnow_window_mins(tokens, k, w)")
        WinnowWindowMins(e.head, intLit(e(1), "graft_winnow_window_mins: k"),
          intLit(e(2), "graft_winnow_window_mins: w"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bigram_hashes"),
      new ExpressionInfo(classOf[BigramHashes].getName, "graft_bigram_hashes"),
      (exprs: Seq[Expression]) =>
        BigramHashes(arity(exprs, 1, "graft_bigram_hashes(tokens)").head)))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "graft_sorted_intersect_count(a, b)")
        SortedIntersectCount(e.head, e(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getName,
        "graft_sorted_intersect"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "graft_sorted_intersect(a, b)")
        SortedIntersect(e.head, e(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_array_stats"),
      new ExpressionInfo(classOf[ArrayStats].getName, "graft_array_stats"),
      (exprs: Seq[Expression]) =>
        ArrayStats(arity(exprs, 1, "graft_array_stats(arr)").head)))
    e.injectFunction((
      FunctionIdentifier("graft_chunk_hashes"),
      new ExpressionInfo(classOf[ChunkHashes].getName, "graft_chunk_hashes"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "graft_chunk_hashes(tokens, width)")
        ChunkHashes(e.head, intLit(e(1), "graft_chunk_hashes: width"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKRows].getName, "graft_top_k"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 4, "graft_top_k(score, id1, id2, k)")
        TopKRows(e.head, e(1), e(2), intLit(e(3), "graft_top_k: k"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 3, "graft_nearest_cells(vec, centroids, n)")
        NearestCells(e.head, e(1), intLit(e(2), "graft_nearest_cells: n"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) =>
        NfcNormalize(arity(exprs, 1, "graft_nfc(s)").head)))
    e.injectFunction((
      FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 3, "graft_lsh_buckets(vec, tables, planesPerTable)")
        LshBuckets(e.head,
          intLit(e(1), "graft_lsh_buckets: tables"),
          intLit(e(2), "graft_lsh_buckets: planesPerTable"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "graft_bloom_agg(hash, estimatedItems)")
        e(1) match {
          case Literal(n: Long, org.apache.spark.sql.types.LongType) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate
              .BloomFilterAggregate(e.head, n)
          case _ => throw new IllegalArgumentException(
            "graft_bloom_agg: estimatedItems must be a long literal")
        }
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "graft_bloom_might_contain(bloom, hash)")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(e.head, e(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_lsh_probe_keys"),
      new ExpressionInfo(classOf[LshProbeKeys].getName, "graft_lsh_probe_keys"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 4, "graft_lsh_probe_keys(vec, tables, planesPerTable, probes)")
        LshProbeKeys(e.head,
          intLit(e(1), "graft_lsh_probe_keys: tables"),
          intLit(e(2), "graft_lsh_probe_keys: planesPerTable"),
          intLit(e(3), "graft_lsh_probe_keys: probes"))
      }))
  }
}
