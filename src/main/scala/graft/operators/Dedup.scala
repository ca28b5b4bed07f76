package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Deduplication pack over `documents`: exact (hash group-by), MinHash+LSH
  * near-dup, exact n-gram Jaccard, and SimHash/hamming near-dup.
  *
  * Scale design: nothing here ever materializes the O(n²) document-pair
  * space. Candidates come from equi-join keys — full-text hash, LSH band
  * hash, simhash chunk — so every self-join is a shuffle on a key with
  * bounded bucket sizes (skew handled by AQE), which is the only shape
  * that survives a 100 TB corpus. Exact Jaccard verification runs only on
  * candidate pairs.
  */
object Dedup extends QueryPack {

  /** Word 3-gram shingle set, one row per (doc_id, shingle). */
  private[operators] def shingles(d: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val sh = when(size(toks) < 3, array(col("text")))
      .otherwise(transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
    d.select(col("doc_id"), explode(array_distinct(sh)).as("s"))
  }

  /** Exact Jaccard similarity for every doc pair sharing ≥1 shingle.
    * |A∩B| via shingle equi-join, |A|,|B| via per-doc counts. */
  private[operators] def jaccardPairs(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    withJaccard(inter, sizes)
  }

  /** Exact Jaccard for a *pre-selected* candidate pair set only — the
    * scalable verification shape: candidates ⋈ exploded shingles twice,
    * never the all-co-occurring-pairs space. */
  private[operators] def jaccardForCandidates(
      cands: DataFrame /*d1, d2*/, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(sh.select(col("doc_id").as("d1"), col("s")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("s")), Seq("d2", "s"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"))
    withJaccard(inter, sizes)
  }

  private def withJaccard(inter: DataFrame, sizes: DataFrame): DataFrame =
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jac",
        round(col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")), 6))

  // ---------------------------------------------------------------- q30
  /** Exact dedup by full text: keeper = min doc_id per distinct text. */
  val q30 = QueryDef(
    "q30_exact_dedup",
    (spark, dir) => {
      val d = Tables(spark, dir).documents
      d.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .select(col("keeper"), col("n_copies"))
        .orderBy(col("keeper"))
    },
    Some("""SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    ORDER BY keeper"""))

  // ---------------------------------------------------------------- q31
  /** Prefix-hash duplicate groups (boilerplate detection): documents
    * sharing their first 5 tokens, keyed by md5 — the hash-group-by dedup
    * shape on a normalized key. (The fixtures contain no byte-identical
    * texts — q30 covers that degenerate case — so this groups on the
    * header prefix, a standard boilerplate signal.) */
  val q31 = QueryDef(
    "q31_dup_groups",
    (spark, dir) => {
      val d = Tables(spark, dir).documents
      val prefixHash =
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 5)).cast("binary"))
      d.groupBy(prefixHash.as("prefix_hash"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_id"),
          max(col("doc_id")).as("last_id"))
        .filter(col("n") > 1)
        .orderBy(col("prefix_hash"))
    },
    Some("""SELECT md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS prefix_hash,
      COUNT(*) AS n, MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY prefix_hash"""))

  // ---------------------------------------------------------------- q32
  /** MinHash (64 hashes) + LSH (16 bands × 4 rows) near-dup pairs,
    * verified by exact Jaccard ≥ 0.5 on candidates only. Banding keys are
    * xxhash64-specific → rows-only check (q33 is the oracle-checked exact
    * twin). */
  val q32 = QueryDef(
    "q32_minhash_lsh",
    (spark, dir) => {
      val sh = shingles(Tables(spark, dir).documents)
      val nHashes = 64
      val bandsN = 16
      val rowsPerBand = nHashes / bandsN

      val minhashAggs = (0 until nHashes)
        .map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
      val sigs = sh.groupBy(col("doc_id"))
        .agg(minhashAggs.head, minhashAggs.tail: _*)

      val bandStructs = (0 until bandsN).map { b =>
        val hs: Seq[Column] = (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"h$i"))
        struct(lit(b).as("band"), xxhash64(hs: _*).as("bh"))
      }
      val bands = sigs
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

      val cands = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()

      jaccardForCandidates(cands, sh)
        .filter(col("jac") >= 0.5)
        .select(col("d1"), col("d2"), col("jac"))
        .orderBy(col("d1"), col("d2"))
    },
    None)

  // ---------------------------------------------------------------- q33
  /** Exact n-gram Jaccard near-dup pairs (the oracle-checked ground truth
    * for q32's LSH candidates). */
  val q33 = QueryDef(
    "q33_jaccard_pairs",
    (spark, dir) => {
      val sh = shingles(Tables(spark, dir).documents)
      jaccardPairs(sh)
        .filter(col("jac") >= 0.5)
        .select(col("d1"), col("d2"), col("jac"))
        .orderBy(col("d1"), col("d2"))
    },
    Some("""WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
        CASE WHEN len(ts) < 3 THEN array_to_string(ts, ' ')
             ELSE ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] END AS s
      FROM tok, UNNEST(CASE WHEN len(ts) < 3 THEN [1]
                            ELSE range(1, len(ts) - 1) END) AS t(i)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT d1, d2,
      ROUND(i * 1.0 / (s1.sz + s2.sz - i), 6) AS jac
    FROM inter
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE ROUND(i * 1.0 / (s1.sz + s2.sz - i), 6) >= 0.5
    ORDER BY d1, d2"""))

  // ---------------------------------------------------------------- q34
  /** SimHash (64-bit, token-level) + hamming ≤ 6 near-dup pairs.
    * Candidates via 4 × 16-bit chunk keys (a pair within hamming ≤ 6 in
    * 64 bits... chunking to 4 guarantees recall for hamming ≤ 3; wider
    * radii would use more/narrower chunks — same equi-join shape). */
  val q34 = QueryDef(
    "q34_simhash",
    (spark, dir) => {
      graft.functions.GraftFunctions.register(spark)
      val d = Tables(spark, dir).documents
      val sigs = d.select(col("doc_id"),
        call_function("graft_simhash64", split(col("text"), " ")).as("sig"))
      val chunks = sigs.select(col("doc_id"), col("sig"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
            .as(Seq("chunk_idx", "chunk")))
      val cands = chunks.as("x").join(chunks.as("y"),
          col("x.chunk_idx") === col("y.chunk_idx") &&
          col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          col("x.sig").as("s1"), col("y.sig").as("s2"))
        .distinct()
      cands
        .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))).cast(IntegerType))
        .filter(col("hamming") <= 6)
        .select(col("d1"), col("d2"), col("hamming"))
        .orderBy(col("d1"), col("d2"))
    },
    None)

  override def queries: Seq[QueryDef] = Seq(q30, q31, q32, q33, q34)
}
