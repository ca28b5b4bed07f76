package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkTestBase {

  test("extensions-injected functions are callable from plain SQL") {
    spark // force base session (and its SparkContext) up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val dot = s2.sql(
        "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
          "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
        .collect()(0).getDouble(0)
      assert(dot == 11.0)
      val sig = s2.sql(
        "SELECT graft_simhash64(array('a', 'b', 'a')) AS s")
        .collect()(0).getLong(0)
      val sig2 = s2.sql(
        "SELECT graft_simhash64(array('a', 'b', 'a')) AS s")
        .collect()(0).getLong(0)
      assert(sig == sig2)
      // graft_minhash64: per-seed minima must equal the composed
      // min(xxhash64(i, t)) over the same tokens
      val mh = s2.sql("SELECT graft_minhash64(array('a', 'b', 'c'), 8) AS m")
        .collect()(0).getSeq[Long](0).toSeq
      val expected = (0 until 8).map { i =>
        s2.sql(s"SELECT LEAST(xxhash64($i, 'a'), xxhash64($i, 'b'), xxhash64($i, 'c'))")
          .collect()(0).getLong(0)
      }
      assert(mh == expected)
      // graft_lsh_buckets: one packed bucket per table, deterministic
      val lb = s2.sql(
        "SELECT graft_lsh_buckets(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)), 4, 2) AS b")
        .collect()(0).getSeq[Long](0).toSeq
      assert(lb.length == 4 && lb.forall(b => b >= 0L && b < 4L))
      // graft_hashed_shingles: distinct 3-gram hashes of the token list
      val hs = s2.sql(
        "SELECT graft_hashed_shingles(array('a','b','c','d'), 3) AS h")
        .collect()(0).getSeq[Long](0).toSeq
      assert(hs.length == 2 && hs.distinct == hs) // "a b c", "b c d"
      // graft_bigram_hashes: (n-1) bigram structs, hb chained like xxhash64(w1,w2)
      val bg = s2.sql(
        "SELECT graft_bigram_hashes(array('a','b','c')) AS b").collect()(0)
        .getSeq[org.apache.spark.sql.Row](0)
      assert(bg.length == 2)
      val expectedHb = s2.sql("SELECT xxhash64('a', 'b'), xxhash64('a')")
        .collect()(0)
      assert(bg.head.getLong(0) == expectedHb.getLong(0))
      assert(bg.head.getLong(1) == expectedHb.getLong(1))
      // graft_chunk_hashes: element j == built-in xxhash64 over the
      // j-th width-token slice (chained, seed 42), tail chunk included
      val ch = s2.sql(
        "SELECT graft_chunk_hashes(array('a','b','c','d','e'), 2) AS c")
        .collect()(0).getSeq[Long](0).toSeq
      val chExpected = s2.sql(
        "SELECT xxhash64('a','b'), xxhash64('c','d'), xxhash64('e')").collect()(0)
      assert(ch == Seq(chExpected.getLong(0), chExpected.getLong(1), chExpected.getLong(2)))
      // graft_sorted_intersect(_count): merge intersect over sorted arrays
      val si = s2.sql(
        "SELECT graft_sorted_intersect(array(1L,3L,5L,7L), array(3L,4L,7L)) AS a, " +
          "graft_sorted_intersect_count(array(1L,3L,5L,7L), array(3L,4L,7L)) AS n")
        .collect()(0)
      assert(si.getSeq[Long](0) == Seq(3L, 7L) && si.getLong(1) == 2L)
      // nullable-element arrays are REJECTED at analysis (getLong over a
      // null slot would read garbage — the enforced no-nulls contract)
      Seq(
        "SELECT graft_sorted_intersect(array(1L, CAST(NULL AS BIGINT)), array(1L))",
        "SELECT graft_sorted_intersect_count(array(1L), array(CAST(NULL AS BIGINT)))")
        .foreach { q =>
          val e = intercept[org.apache.spark.sql.AnalysisException](s2.sql(q).collect())
          assert(e.getMessage.contains("non-nullable"), s"$q: ${e.getMessage}")
        }
      // graft_array_stats: one-pass multiplicity profile of a long array
      val as = s2.sql(
        "SELECT graft_array_stats(array(1L, 2L, 1L, 1L, 3L)) AS s").collect()(0)
        .getStruct(0)
      assert(as.getLong(0) == 5L && as.getLong(1) == 3L && as.getLong(2) == 3L)
      // graft_top_k: bounded top-k aggregate, best-first, ties broken by
      // id1 then id2
      val tk = s2.sql(
        "SELECT graft_top_k(s, a, b, 2) AS t FROM VALUES " +
          "(CAST(1.0 AS DOUBLE), 1L, 1L), (2.0D, 2L, 1L), " +
          "(2.0D, 1L, 5L), (0.5D, 9L, 9L) AS v(s, a, b)")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toList
      assert(tk == List((2.0, 1L, 5L), (2.0, 2L, 1L)))
      // graft_nearest_cells: nearest centroid of (1,0) is cell 1
      val nc = s2.sql(
        "SELECT graft_nearest_cells(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
          "array(array(CAST(0 AS FLOAT), CAST(1 AS FLOAT)), " +
          "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))), 2) AS c")
        .collect()(0).getSeq[Int](0).toSeq
      assert(nc == Seq(1, 0))
      // graft_nfc: NFC composition via the extensions path
      val nfc = s2.sql("SELECT graft_nfc('café')").collect()(0).getString(0)
      assert(nfc == "café")
      // graft_lsh_probe_keys: probes=1 equals graft_lsh_buckets packed
      // as (table << planes) | bucket — the multi-probe anchor identity
      val pk = s2.sql(
        "SELECT graft_lsh_probe_keys(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)), 4, 2, 1) AS k")
        .collect()(0).getSeq[Long](0).toSeq
      assert(pk == lb.zipWithIndex.map { case (b, t) => (t.toLong << 2) | b })
      // graft_bloom_agg / graft_bloom_might_contain: a sketch built over
      // range(0,50) reports every member (no false negatives, ever)
      import org.apache.spark.sql.functions.{call_function, col, lit, xxhash64}
      val bf = s2.sql(
        "SELECT graft_bloom_agg(xxhash64(id), 64L) AS b FROM range(0, 50)")
        .collect()(0).getAs[Array[Byte]](0)
      val members = s2.range(0, 50).filter(
        call_function("graft_bloom_might_contain", lit(bf), xxhash64(col("id"))))
      assert(members.count() == 50, "bloom must have no false negatives")
      // parity with the FunctionRegistry path (GraftFunctions.register)
      GraftFunctions.register(s2)
      val lb2 = s2.sql(
        "SELECT graft_lsh_buckets(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)), 4, 2) AS b")
        .collect()(0).getSeq[Long](0).toSeq
      assert(lb2 == lb)
      val pk2 = s2.sql(
        "SELECT graft_lsh_probe_keys(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)), 4, 2, 1) AS k")
        .collect()(0).getSeq[Long](0).toSeq
      assert(pk2 == pk)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
