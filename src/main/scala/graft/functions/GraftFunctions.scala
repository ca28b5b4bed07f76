package graft.functions

import graft.functions.expressions.{ArrayStats, BigramHashes, ByteHistogram, ChunkHashes, DotProduct, HashedShingles, LshBuckets, LshProbeKeys, MinHash64, NearestCells, NfcNormalize, SimHash64, SortedIntersect, SortedIntersectCount, TopKRows, WinnowFingerprints, WinnowWindowMins}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Registration point for the library's native Catalyst expressions —
  * callable from both the Column API (`call_function`) and SQL. Idempotent;
  * call once per session before using [[VectorOps.dotNative]]. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => {
        require(exprs.length == 2, "graft_dot(a, b) takes two arguments")
        DotProduct(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64",
      exprs => {
        require(exprs.length == 1, "graft_simhash64(tokens) takes one argument")
        SimHash64(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_byte_histogram",
      exprs => {
        require(exprs.length == 1, "graft_byte_histogram(blob) takes one argument")
        ByteHistogram(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash64",
      exprs => {
        require(exprs.length == 2,
          "graft_minhash64(tokens, numHashes) takes two arguments")
        exprs(1) match {
          case Literal(n: Int, IntegerType) => MinHash64(exprs.head, n)
          case _ => throw new IllegalArgumentException(
            "graft_minhash64: numHashes must be an int literal")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hashed_shingles",
      exprs => {
        require(exprs.length == 2,
          "graft_hashed_shingles(tokens, n) takes two arguments")
        exprs(1) match {
          case Literal(n: Int, IntegerType) => HashedShingles(exprs.head, n)
          case _ => throw new IllegalArgumentException(
            "graft_hashed_shingles: n must be an int literal")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_fps",
      exprs => {
        require(exprs.length == 3,
          "graft_winnow_fps(tokens, k, w) takes three arguments")
        (exprs(1), exprs(2)) match {
          case (Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
            WinnowFingerprints(exprs.head, k, w)
          case _ => throw new IllegalArgumentException(
            "graft_winnow_fps: k and w must be int literals")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_window_mins",
      exprs => {
        require(exprs.length == 3,
          "graft_winnow_window_mins(tokens, k, w) takes three arguments")
        (exprs(1), exprs(2)) match {
          case (Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
            WinnowWindowMins(exprs.head, k, w)
          case _ => throw new IllegalArgumentException(
            "graft_winnow_window_mins: k and w must be int literals")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bigram_hashes",
      exprs => {
        require(exprs.length == 1,
          "graft_bigram_hashes(tokens) takes one argument")
        BigramHashes(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      exprs => {
        require(exprs.length == 2,
          "graft_sorted_intersect_count(a, b) takes two arguments")
        SortedIntersectCount(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect",
      exprs => {
        require(exprs.length == 2,
          "graft_sorted_intersect(a, b) takes two arguments")
        SortedIntersect(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_array_stats",
      exprs => {
        require(exprs.length == 1,
          "graft_array_stats(arr) takes one argument")
        ArrayStats(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_chunk_hashes",
      exprs => {
        require(exprs.length == 2,
          "graft_chunk_hashes(tokens, width) takes two arguments")
        exprs(1) match {
          case Literal(w: Int, IntegerType) => ChunkHashes(exprs.head, w)
          case _ => throw new IllegalArgumentException(
            "graft_chunk_hashes: width must be an int literal")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_top_k",
      exprs => {
        require(exprs.length == 4,
          "graft_top_k(score, id1, id2, k) takes four arguments")
        exprs(3) match {
          case Literal(n: Int, IntegerType) =>
            TopKRows(exprs.head, exprs(1), exprs(2), n)
          case _ => throw new IllegalArgumentException(
            "graft_top_k: k must be an int literal")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_cells",
      exprs => {
        require(exprs.length == 3,
          "graft_nearest_cells(vec, centroids, n) takes three arguments")
        exprs(2) match {
          case Literal(n: Int, IntegerType) => NearestCells(exprs.head, exprs(1), n)
          case _ => throw new IllegalArgumentException(
            "graft_nearest_cells: n must be an int literal")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc",
      exprs => {
        require(exprs.length == 1, "graft_nfc(s) takes one argument")
        NfcNormalize(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_buckets",
      exprs => {
        require(exprs.length == 3,
          "graft_lsh_buckets(vec, tables, planesPerTable) takes three arguments")
        (exprs(1), exprs(2)) match {
          case (Literal(t: Int, IntegerType), Literal(p: Int, IntegerType)) =>
            LshBuckets(exprs.head, t, p)
          case _ => throw new IllegalArgumentException(
            "graft_lsh_buckets: tables and planesPerTable must be int literals")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => {
        require(exprs.length == 2,
          "graft_bloom_agg(hash, estimatedItems) takes two arguments")
        exprs(1) match {
          case Literal(n: Long, LongType) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate
              .BloomFilterAggregate(exprs.head, n)
          case _ => throw new IllegalArgumentException(
            "graft_bloom_agg: estimatedItems must be a long literal")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => {
        require(exprs.length == 2,
          "graft_bloom_might_contain(bloom, hash) takes two arguments")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_probe_keys",
      exprs => {
        require(exprs.length == 4,
          "graft_lsh_probe_keys(vec, tables, planesPerTable, probes) takes four arguments")
        (exprs(1), exprs(2), exprs(3)) match {
          case (Literal(t: Int, IntegerType), Literal(p: Int, IntegerType),
              Literal(q: Int, IntegerType)) =>
            LshProbeKeys(exprs.head, t, p, q)
          case _ => throw new IllegalArgumentException(
            "graft_lsh_probe_keys: tables, planesPerTable and probes must be int literals")
        }
      },
      "built-in")
  }
}
