package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {

  test("decontamination flags exactly the train docs holding an eval doc's shingles (q66)") {
    val rows = Curation.q66.fn(spark, sf0001).collect()
    rows.foreach { r =>
      val (docId, evalId, containment) =
        (r.getLong(0), r.getLong(1), r.getDouble(3))
      assert(docId % 50 != 0, s"train side must exclude eval docs, got $docId")
      assert(evalId % 50 == 0, s"eval side must be the eval slice, got $evalId")
      assert(containment >= 0.25 && containment <= 1.0, s"containment $containment")
    }
    // ground truth: recompute containment per (train, eval) pair naively
    // from the string shingle sets and check the flagged set is exact
    val sh = Dedup.shingles(spark.read.parquet(s"$sf0001/documents.parquet"))
      .collect().groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.map(_.getString(1)).toSet }
    // iterate as Seq: a for-comprehension over a Map would rebuild a Map
    // and collapse pairs sharing the same train doc
    val expected = (for {
      (e, es) <- sh.toSeq if e % 50 == 0
      (t, ts) <- sh.toSeq if t % 50 != 0
      inter = (es & ts).size if inter * 4 >= es.size
    } yield (t, e)).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("repetition gate counts bigram mass exactly (q67)") {
    val rows = Curation.q67.fn(spark, sf0001).collect()
    assert(rows.length == 500, "every multi-token doc must be scored")
    val nTokens = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (docId, nBigrams, nDistinct, topCount, keep) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(6))
      assert(nBigrams == nTokens(docId) - 1L, s"doc $docId bigram count")
      assert(nDistinct <= nBigrams && topCount >= 1 && topCount <= nBigrams)
      val expectKeep = (nBigrams - nDistinct) * 5 <= nBigrams &&
        topCount * 10 <= nBigrams
      assert(keep == expectKeep, s"doc $docId verdict")
    }
    // the fixture's repetitive near-dup soup must trip the gate somewhere
    assert(rows.exists(!_.getBoolean(6)), "gate should drop some docs")
  }

  test("chunk dedup keeps exactly the first occurrence of each chunk (q68)") {
    val rows = Curation.q68.fn(spark, sf0001).collect()
    assert(rows.length == 500)
    val totalChunks = rows.map(_.getLong(1)).sum
    val removed = rows.map(_.getLong(2)).sum
    assert(removed > 0, "fixture near-dups should share chunks")
    // global invariant: surviving chunk occurrences = distinct chunk texts
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val allChunks = docs.flatMap { case (_, ts) => ts.grouped(8).map(_.mkString(" ")) }
    assert(totalChunks == allChunks.length.toLong)
    assert(totalChunks - removed == allChunks.distinct.length.toLong,
      "kept occurrences must equal distinct chunk texts")
  }

  test("curation report totals reconcile with the gates it summarizes (q69)") {
    val report = Curation.q69.fn(spark, sf0001).collect()
    assert(report.map(_.getLong(1)).sum == 500L, "every doc counted once")
    // per-source arithmetic sanity
    report.foreach { r =>
      val (nDocs, kept) = (r.getLong(1), r.getLong(5))
      assert(kept <= nDocs && r.getDouble(6) == math.round(kept.toDouble / nDocs * 1e6) / 1e6)
    }
    // drops must reconcile exactly with the standalone gate queries
    val qualityDrops = TextOps.q61.fn(spark, sf0001).collect()
      .count(!_.getBoolean(1)).toLong
    assert(report.map(_.getLong(3)).sum == qualityDrops,
      "quality-drop total must equal q61's drop count")
    val repDrops = Curation.q67.fn(spark, sf0001).collect()
      .count(!_.getBoolean(6)).toLong
    assert(report.map(_.getLong(4)).sum == repDrops,
      "repetition-drop total must equal q67's drop count")
  }

  test("sequence packs are contiguous, complete, and budget-shaped (q74)") {
    val packs = Curation.q74.fn(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every document lands in exactly one pack
    assert(packs.map(_._3).sum == 500L)
    packs.groupBy(_._1).foreach { case (shard, ps) =>
      val sorted = ps.sortBy(_._2)
      // pack ids are contiguous from 0 — no empty pack ever emitted
      assert(sorted.map(_._2).toSeq == (0L until ps.length).toSeq,
        s"shard $shard packs not contiguous: ${sorted.map(_._2).toSeq}")
      // start-offset packing: every pack but the shard's last must end at
      // or past its budget boundary (else its successor couldn't exist)
      val cum = sorted.map(_._4).scanLeft(0L)(_ + _).drop(1)
      cum.dropRight(1).zipWithIndex.foreach { case (end, p) =>
        assert(end >= (p + 1) * 512L,
          s"shard $shard pack $p ends at $end, before its boundary")
      }
    }
  }

  test("bigram hashes skip null tokens exactly like composed xxhash64 (advisor parity)") {
    graft.functions.GraftFunctions.register(spark)
    // tokens [a, null, b]: bigram hashes must match the composed
    // xxhash64 form, whose null children pass the running hash through
    val d = spark.sql("SELECT array('alpha', CAST(NULL AS STRING), 'beta') AS toks")
    val native = d.select(explode(call_function("graft_bigram_hashes", col("toks"))).as("b"))
      .select(col("b.hb"), col("b.h1"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val composed = d.select(explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(
          xxhash64(element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)).as("hb"),
          xxhash64(element_at(col("toks"), i + 1)).as("h1")))).as("b"))
      .select(col("b.hb"), col("b.h1"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native == composed)
  }

  test("q78 mix weights equalize expected tokens across sources") {
    val rows = Curation.q78.fn(spark, sf0001).collect()
    assert(rows.length > 1)
    // shares sum to ~1
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"share sum $shareSum")
    // weight * n_tokens is the same (uniform) expected token mass per source
    val masses = rows.map(r => r.getDouble(4) * r.getLong(2))
    assert(masses.max - masses.min < masses.max * 1e-4,
      s"unequal masses: ${masses.min} .. ${masses.max}")
    // sample_frac = min(1, weight), and under-represented sources cap at 1
    rows.foreach { r =>
      assert(r.getDouble(5) == math.min(1.0, r.getDouble(4)))
    }
    // at least one source must be downsampled in a skewed corpus, unless
    // the fixture happens to be perfectly uniform — sanity: fracs valid
    rows.foreach(r => assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0))
  }

  test("q85 bloom purge equals the exact chunk anti-join (no bloom in the result)") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // exact reference, no sketch anywhere: purge train docs sharing any
    // 8-token chunk hash with the eval slice
    val chunks = docs.select(col("doc_id"),
      explode(call_function("graft_chunk_hashes",
        split(col("text"), " "), lit(8))).as("c"))
    val evalChunks = chunks.filter(col("doc_id") % 50 === 0).select("c").distinct()
    val purged = chunks.filter(col("doc_id") % 50 =!= 0)
      .join(evalChunks, Seq("c"), "leftsemi").select("doc_id").distinct()
    val expected = docs.filter(col("doc_id") % 50 =!= 0)
      .join(purged, Seq("doc_id"), "leftanti")
      .select(col("doc_id"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val got = Curation.bloomPurgeOn(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSet == expected)
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted, "total order")
    // the purge must actually fire on the fixture (near-dups share chunks)
    val trainCount = docs.filter(col("doc_id") % 50 =!= 0).count()
    assert(got.length < trainCount, "fixture should purge at least one doc")
  }

  test("q85 bloom false positives cannot change the output (undersized sketch)") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // estimate 2 items for hundreds of inserted chunks → the sketch
    // saturates and says 'maybe' almost everywhere; the exact verify
    // join must still reproduce the honest-estimate output bit for bit
    val honest = Curation.bloomPurgeOn(docs).collect().map(_.toSeq).toSeq
    val flooded = Curation.bloomPurgeOn(docs, Some(2L)).collect().map(_.toSeq).toSeq
    assert(flooded == honest)
  }

  test("q85 plan: bloom prefilter sits on the train chunk stream before the verify join") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = Curation.bloomPurgeOn(docs).queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("might_contain"),
      s"bloom prefilter missing from the purge plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"purge must stay equi-join shaped:\n$p")
  }

  test("q117 chunks reproduce a naive sliding-window chunker and tile the token stream") {
    val docs = graft.Tables(spark, sf0001).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, t) =>
      val ts = t.split(" ", -1)
      (0 until ts.length by 24).zipWithIndex.map { case (st, idx) =>
        val ct = ts.slice(st, math.min(st + 32, ts.length))
        (id, idx, ct.length, ct.mkString(" "))
      }
    }.toSet
    val got = Curation.q117.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got == expected,
      s"chunk mismatch: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // coverage: chunk token counts per doc add to >= token count (overlap >= 0)
    val byDoc = got.groupBy(_._1)
    docs.foreach { case (id, t) =>
      val n = t.split(" ", -1).length
      assert(byDoc(id).toSeq.map(_._3).sum >= n, s"doc $id: chunks do not cover all tokens")
    }
  }

  test("q137: allocations sum exactly to the budget and follow the largest-remainder order") {
    val rows = Curation.q137.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    val B = 1000000L
    assert(rows.map(_._5).sum == B, s"allocations sum to ${rows.map(_._5).sum}, not $B")
    rows.foreach { case (src, _, base, extra, alloc) =>
      assert(extra == 0 || extra == 1)
      assert(alloc == base + extra, s"$src alloc mismatch")
    }
    // proportionality: base quota is the exact floor of the share
    val tTot = rows.map(_._2).sum
    rows.foreach { case (src, t, base, _, _) =>
      assert(base == B * t / tTot, s"$src base quota not the exact floor")
    }
    // the +1s go to the LARGEST remainders (ties by source name)
    val byRem = rows.sortBy { case (src, t, _, _, _) => (-(B * t % tTot), src) }
    val leftover = B - rows.map(_._3).sum
    val expectedExtra = byRem.take(leftover.toInt).map(_._1).toSet
    assert(rows.filter(_._4 == 1).map(_._1).toSet == expectedExtra,
      "extra tokens not assigned by largest remainder")
    assert(leftover > 0, "fixture leftover is zero; remainder path unexercised")
  }

  test("q139: pair intersections match a naive per-source shingle-set recompute") {
    val docs = graft.Tables(spark, sf0001).documents
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(text: String): Set[String] = {
      val ts = text.split(" ").toSeq
      if (ts.length < 3) Set(ts.mkString(" "))
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val bySource = docs.groupBy(_._2).view
      .mapValues(_.flatMap(d => shingles(d._3)).toSet).toMap
    val expected = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
      i = (bySource(a) & bySource(b)).size if i > 0
    } yield (a, b) -> ((i.toLong, bySource(a).size.toLong, bySource(b).size.toLong)))
      .toMap
    val got = Curation.q139.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, {
      val ks = (got.keySet ++ expected.keySet).filter(k => got.get(k) != expected.get(k))
      ks.take(5).map(k => s"$k: got=${got.get(k)} want=${expected.get(k)}").mkString("; ")
    })
    assert(got.nonEmpty, "no overlapping source pair in fixture; matrix empty")
  }

  test("q148 scrub equals a naive global first-occurrence sweep; q68 agrees on counts") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // naive sweep: tumbling 8-token chunks in (doc_id, pos) order; a
    // chunk is kept iff its text was never seen before
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.map { case (id, t) =>
      val ts = t.split(" ", -1)
      val chunks = ts.grouped(8).map(_.mkString(" ")).toSeq
      val kept = chunks.map(c => if (seen.add(c)) Some(c) else None)
      (id, chunks.size.toLong, kept.count(_.isEmpty).toLong,
        kept.flatten.mkString(" "))
    }.toSeq
    val got = Curation.q148.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expected, {
      val bad = got.zip(expected).find { case (g, e) => g != e }
      s"first divergence: got=${bad.map(_._1)} want=${bad.map(_._2)}"
    })
    assert(expected.exists(_._3 > 0), "fixture exercises no duplicate spans")
    // q68 (the detection report) must agree on per-doc chunk/removal counts
    val q68Counts = Curation.q68.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(q68Counts == expected.map(e => (e._1, e._2, e._3)),
      "q68 detection counts drifted from q148 scrub counts")
  }

  test("q234 winnow scrub equals a naive fingerprint-keeper sweep on the fixture") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def fp(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    def windowMins(ts: Array[String]): Array[Long] = {
      val ng = ts.length - 2
      if (ng < 4) Array.empty
      else {
        val g = Array.tabulate(ng)(i => fp(ts.slice(i, i + 3).mkString(" ")))
        Array.tabulate(ng - 3)(i => g.slice(i, i + 4).min)
      }
    }
    val toks = docs.map { case (id, t) => (id, t.split(" ", -1)) }
    val mins = toks.map { case (id, ts) => (id, windowMins(ts)) }
    val keeper = scala.collection.mutable.Map.empty[Long, Long]
    mins.foreach { case (id, ms) =>
      ms.foreach(m => if (!keeper.contains(m) || keeper(m) > id) keeper(m) = id)
    }
    val expected = toks.zip(mins).map { case ((id, ts), (_, ms)) =>
      val rem = scala.collection.mutable.Set.empty[Int]
      ms.zipWithIndex.foreach { case (m, p) =>
        if (keeper(m) != id) (p to p + 5).foreach(rem += _)
      }
      (id, ts.length.toLong, rem.size.toLong,
        ts.zipWithIndex.collect { case (t, i) if !rem(i) => t }.mkString(" "))
    }.toSeq
    val got = Curation.q234.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expected, {
      val bad = got.zip(expected).find { case (g, e) => g != e }
      s"first divergence: got=${bad.map(_._1)} want=${bad.map(_._2)}"
    })
    assert(expected.exists(_._3 > 0), "fixture exercises no winnow-anchored removal")
  }

  test("q234 scrubs an offset-by-3 duplicate passage that q148's chunk grid misses") {
    import spark.implicits._
    // doc 1: 8 filler tokens + a 16-token passage (chunk-aligned there);
    // doc 2: 11 DIFFERENT filler tokens + the SAME passage — offset 3
    // relative to the 8-token chunk grid, so no chunk text matches and
    // q148 removes nothing; winnowing's ≥ w+k−1 = 6-token guarantee is
    // alignment-free, and the 11 interior shared windows cover the whole
    // 16-token passage in doc 2
    val passage = (1 to 16).map(i => s"p$i")
    val d1 = (1 to 8).map(i => s"a$i") ++ passage
    val d2 = (1 to 11).map(i => s"b$i") ++ passage
    val docs = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")
    val chunked = Curation.spanScrubOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chunked == Map(1L -> 0L, 2L -> 0L),
      s"chunk-grid scrub unexpectedly caught the offset duplicate: $chunked")
    val winnowed = Curation.winnowScrubPipeline(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(winnowed(1L) == ((0L, d1.mkString(" "))), "keeper doc 1 was touched")
    val (removed2, clean2) = winnowed(2L)
    assert(removed2 >= 16L, s"doc 2 removal too small: $removed2")
    passage.foreach(p =>
      assert(!clean2.split(" ").contains(p), s"passage token $p survived: $clean2"))
  }

  test("q154 context-fit metrics match a naive recompute; fill never exceeds capacity") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val toks = ds.map(_._2)
      val shards = toks.map(t => (t + 2047) / 2048).sum
      src -> ((ds.length.toLong, toks.sum, toks.max,
        toks.count(_ > 2048).toLong, shards,
        toks.sum * 1000000L / (shards * 2048)))
    }
    val got = Curation.q154.fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected, {
      val ks = (got.keySet ++ expected.keySet).filter(k => got.get(k) != expected.get(k))
      ks.map(k => s"$k: got=${got.get(k)} want=${expected.get(k)}").mkString("; ")
    })
    // invariants: utilization is a proper fraction of shard capacity and
    // shards can never undercount the tokens they must hold
    got.values.foreach { case (_, total, _, _, shards, fill) =>
      assert(fill > 0 && fill <= 1000000L)
      assert(shards * 2048 >= total)
    }
  }

  test("q173: contribution bounding matches a naive per-cell replay and the cap bites") {
    val rows = graft.Tables(spark, sf0001).events
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cells = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cap = Curation.ContribCap
    val expected = cells.groupBy(_._1._2).map { case (t, m) =>
      val ns = m.values
      t -> ((ns.sum, ns.map(math.min(_, cap)).sum, ns.size.toLong,
        ns.count(_ > cap).toLong,
        ns.map(math.min(_, cap)).sum * 1000000L / ns.sum))
    }
    val got = Curation.q173.fn(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, e) => assert(got(t) == e, s"$t: got ${got(t)}, naive $e") }
    // the cap must clip somewhere AND keep most mass, or the bound is
    // untested / useless
    assert(expected.values.exists(_._4 > 0), "cap never clips at the fixture")
    assert(expected.values.forall(v => v._2 > v._1 / 2), "cap destroys the aggregate")
  }

  test("q174: ladder risk is monotone and spans fully-risky to safely-anonymous") {
    val got = Curation.q174.fn(spark, sf0001).collect()
      .map(r => r.getLong(0).toInt ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.map(_._1).toSeq == Seq(0, 1, 3, 7), "rollup rungs missing")
    val byL = got.toMap
    // coarsening merges groups: a row at risk on a coarse rung is at
    // risk on every finer one, so rows_at_risk is non-increasing down
    // the ladder
    val risks = Seq(0, 1, 3, 7).map(l => byL(l)._4)
    assert(risks.zip(risks.tail).forall { case (a, b) => a >= b },
      s"risk not monotone down the ladder: $risks")
    // the fixture spans the decision range: finest rung fully risky,
    // the no-quasi-id rung safe
    assert(byL(0)._3 == byL(0)._1, "finest rung not fully risky at the fixture")
    assert(byL(7)._4 == 0 && byL(7)._1 == 1, "total rung must be one safe group")
    // group counts shrink as rungs coarsen
    val sizes = Seq(0, 1, 3, 7).map(l => byL(l)._1)
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }

  test("q167: water-filling allocation matches a naive level search and the max-min laws") {
    val rows = Curation.q167.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val avail = rows.map(r => r._1 -> r._2).toMap
    val b = avail.values.sum * 4 / 5
    // naive replay: highest integer level whose clipped sum fits, then
    // the remainder one-by-one to the unfunded sources by name
    val lMax = Iterator.from(0).map(_.toLong)
      .takeWhile(l => avail.values.map(math.min(_, l)).sum <= b).max
    val base = avail.map { case (s, a) => s -> math.min(a, lMax) }
    var left = b - base.values.sum
    val expected = scala.collection.mutable.Map(base.toSeq: _*)
    avail.keys.toSeq.sorted.foreach { s =>
      if (left > 0 && avail(s) > expected(s)) { expected(s) += 1; left -= 1 }
    }
    rows.foreach { case (s, _, alloc, _) =>
      assert(alloc == expected(s), s"$s: got $alloc, naive ${expected(s)}")
    }
    // the max-min laws, independent of the replay:
    assert(rows.map(_._3).sum == b, "allocation must spend the budget exactly")
    rows.foreach { case (s, a, alloc, f) =>
      assert(alloc <= a, s"$s allocated past its cap")
      assert((f == 1) == (alloc == a), s"$s funded flag inconsistent")
    }
    val clipped = rows.filter(_._4 == 0).map(_._3)
    assert(clipped.nonEmpty && clipped.length < rows.length,
      "fixture must have both a funded prefix and a clipped tail")
    assert(clipped.max - clipped.min <= 1, "clipped sources must share the level ±1")
    val funded = rows.filter(_._4 == 1).map(_._3)
    if (funded.nonEmpty)
      assert(funded.max <= clipped.min,
        "a fully funded source must not exceed any clipped allocation")
  }

  test("q185 quantile normalization equals the driver-side quantile-matching replay") {
    val docs = graft.Tables(spark, sf0001).documents
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = docs.length.toLong
    val globalSorted = docs.sortBy(d => (d._3, d._1)).map(_._3) // value at position p = globalSorted(p-1)
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      val ns = ds.length.toLong
      ds.sortBy(d => (d._3, d._1)).zipWithIndex.map { case ((id, src, nc), i) =>
        val rs = i + 1L
        val p = if (ns > 1) 1 + ((rs - 1) * (n - 1)) / (ns - 1) else (n + 1) / 2
        (id, (src, nc, globalSorted((p - 1).toInt)))
      }
    }.toMap
    val got = Curation.q185.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // per-source extremes land on the global extremes (n_s > 1 everywhere
    // in the fixture), and the transform must actually move some scores
    val bySource = got.values.groupBy(_._1)
    bySource.foreach { case (src, vs) =>
      assert(vs.map(_._3).min == globalSorted.head && vs.map(_._3).max == globalSorted.last,
        s"source $src extremes not pinned to the global range")
    }
    assert(got.values.exists(v => v._2 != v._3), "normalization was the identity everywhere")
  }

  test("q188 pseudonymization: tokens bijective on the fixture, aggregates equal the clear-key join") {
    val t = graft.Tables(spark, sf0001)
    val custkeys = t.customer.select(col("c_custkey")).collect().map(_.getLong(0))
    val rows = Curation.q188.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // bijective tokenization: one output row per customer, all tokens distinct
    assert(rows.length == custkeys.length, "row count != customer count")
    assert(rows.map(_._1).distinct.length == rows.length, "token collision on the fixture")
    // aggregate fidelity: per-customer clear-key join, re-keyed by token
    val md = java.security.MessageDigest.getInstance("MD5")
    def token(k: Long): String =
      md.digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val orders = t.orders.select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val byCust = orders.groupBy(_._1)
    val expected = custkeys.map { k =>
      val os = byCust.getOrElse(k, Array.empty[(Long, Double)])
      val sum = os.map(o => BigDecimal(o._2).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _)
      token(k) -> ((os.length.toLong, sum.toDouble))
    }.toMap
    rows.foreach { case (tok, _, n, s) =>
      val (en, es) = expected(tok)
      assert(n == en && s == es, s"token $tok: ($n, $s) != clear-key ($en, $es)")
    }
    // zero-order customers (none at sf0.001, dozens at sf0.01 — q06's
    // anti-join set) must appear with n_orders = 0, never be dropped
    val zeroExpected = custkeys.toSet -- byCust.keySet
    assert(rows.count(_._3 == 0L) == zeroExpected.size,
      "zero-order customers dropped or invented by the left join")
  }

  test("q194 temperature mix equals an exact BigInt replay and upweights the small sources") {
    val toks = graft.Tables(spark, sf0001).documents
      .select(col("source"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = toks.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toMap
    // exact integer sqrt by Newton iteration on BigInt (independent of
    // any double path)
    def isqrt(n: Long): Long = {
      require(n >= 0)
      if (n < 2) return n
      var x = BigInt(n); var y = (x + 1) / 2
      while (y < x) { x = y; y = (x + BigInt(n) / x) / 2 }
      x.toLong
    }
    val totTok = bySrc.values.map(_._2).sum
    val totIsq = bySrc.values.map(v => isqrt(v._2)).sum
    val expected = bySrc.toSeq.sortBy(_._1).map { case (s, (nd, nt)) =>
      val nat = nt * 1000000L / totTok
      val samp = isqrt(nt) * 1000000L / totIsq
      (s, nd, nt, nat, samp, samp * 1000000L / nat)
    }
    val got = Curation.q194.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the temperature property: the smallest source's sampled share
    // exceeds its natural share, the largest source's is depressed
    val smallest = got.minBy(_._3); val largest = got.maxBy(_._3)
    assert(smallest._3 < largest._3, "fixture sources are all the same size")
    assert(smallest._6 > 1000000L, s"smallest source not upsampled: $smallest")
    assert(largest._6 < 1000000L, s"largest source not downsampled: $largest")
  }
  test("q220 gate kappa equals a replay from the shared gate verdicts; |kappa| <= 1e6") {
    graft.functions.GraftFunctions.register(spark)
    val v = graft.Tables(spark, sf0001).documents
      .select(col("source"), TextOps.qualityKeep, Curation.repetitionKeep)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val expected = v.groupBy(_._1).toSeq.map { case (src, rs) =>
      val n = rs.length.toLong
      val n11 = rs.count(r => r._2 && r._3).toLong
      val n10 = rs.count(r => r._2 && !r._3).toLong
      val n01 = rs.count(r => !r._2 && r._3).toLong
      val n00 = rs.count(r => !r._2 && !r._3).toLong
      val pe2 = BigInt(n11 + n10) * (n11 + n01) + BigInt(n01 + n00) * (n10 + n00)
      val num = BigInt(n) * (n11 + n00) - pe2
      val den = BigInt(n) * n - pe2
      val kappa =
        if (den == 0) None
        else Some(
          if (num < 0) -((-num) * 1000000 / den).toLong
          else (num * 1000000 / den).toLong)
      (src, n, n11, n10, n01, n00, kappa)
    }.sortBy(_._1)
    val got = Curation.q220.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSeq
    assert(got == expected)
    got.foreach { case (src, n, n11, n10, n01, n00, k) =>
      assert(n == n11 + n10 + n01 + n00, s"$src: cells do not total n")
      k.foreach(v0 => assert(v0.abs <= 1000000L, s"$src: kappa $v0 out of range"))
    }
  }

  test("q225 Pareto frontier equals the naive O(n^2) dominance filter") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val toks = split(col("text"), " ")
    val st = call_function("graft_array_stats",
      call_function("graft_bigram_hashes", toks).getField("hb"))
    val base = graft.Tables(spark, sf0001).documents
      .filter(size(toks) >= 2)
      .select(col("source"), col("doc_id"), size(toks).cast("long").as("n_tokens"),
        st.getField("n").as("nb"), st.getField("n_distinct").as("nd"))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        expr("CAST(nd * 1000000 div nb AS BIGINT)").as("q_ppm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = base.filter { case (src, _, t, q) =>
      !base.exists { case (s2, _, t2, q2) =>
        s2 == src && t2 <= t && q2 >= q && (t2 < t || q2 > q)
      }
    }.sortBy(x => (x._1, x._3, x._2)).map(x => (x._1, x._2, x._3, x._4)).toSeq
    val got = Curation.q225.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "frontier cannot be empty on a non-empty corpus")
    // within a source the frontier is strictly improving: across its
    // distinct token counts (ascending), quality strictly ascends — a
    // later point costs more tokens, so it must strictly win on quality
    got.groupBy(_._1).foreach { case (src, rows) =>
      val byTok = rows.map(r => (r._3, r._4)).distinct.sortBy(_._1)
      byTok.sliding(2).foreach {
        case Seq((t1, q1), (t2, q2)) =>
          assert(t1 < t2 && q1 < q2,
            s"$src: frontier not strictly improving at ($t1,$q1)->($t2,$q2)")
        case _ => ()
      }
    }
  }

  test("q230 coordinated sample: referential integrity by construction + exact replay") {
    import graft.Det
    val t = graft.Tables(spark, sf0001)
    val sampledCust = t.customer
      .filter(Det.md5Bucket(col("c_custkey")) % 8 === 0)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    assert(sampledCust.nonEmpty, "sample must be non-empty at sf0.001")
    // coordination law: every order the fact-side predicate keeps has its
    // customer in the sampled dim — no orphaned fact rows, ever
    val sampledOrders = t.orders
      .filter(Det.md5Bucket(col("o_custkey")) % 8 === 0)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    sampledOrders.foreach { case (ck, _) =>
      assert(sampledCust(ck), s"orphaned sampled order for customer $ck")
    }
    // exact replay of the per-segment report
    val seg = t.customer
      .filter(Det.md5Bucket(col("c_custkey")) % 8 === 0)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byCust = sampledOrders.groupBy(_._1)
    val expect = seg.groupBy(_._2).map { case (s, cs) =>
      val orders = cs.keys.toSeq.flatMap(ck => byCust.getOrElse(ck, Array.empty[(Long, Double)]))
      (s, cs.size.toLong, orders.length.toLong,
        orders.map(o => math.round(o._2 * 100)).sum)
    }
    val got = Curation.q230.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect.toSet, s"coordinated-sample report diverges from replay")
  }

  test("q232 distribution match: acceptance laws + exact integer replay") {
    import graft.Det
    val rows = Curation.q232.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // laws: acceptance is capped at 1; never upsampled; a full-accept
    // cell keeps everything
    rows.foreach { case (s, b, nIn, ppm, nKept) =>
      assert(ppm >= 0 && ppm <= 1000000, s"($s,$b) ppm out of range: $ppm")
      assert(nKept <= nIn, s"($s,$b) kept more than arrived")
      if (ppm == 1000000L)
        assert(nKept == nIn, s"($s,$b) full-accept cell must keep all $nIn, kept $nKept")
    }
    // exact replay off the raw table
    val docs = graft.Tables(spark, sf0001).documents
      .select(col("doc_id"), col("source"), col("n_chars"),
        Det.md5Bucket(col("doc_id")).as("bucket")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    def bin(nc: Long): Long = math.min(9L, nc / 100)
    val byCell = docs.groupBy(d => (d._2, bin(d._3)))
    val byBin = docs.groupBy(d => bin(d._3)).view.mapValues(_.length.toLong).toMap
    val bySrc = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val expect = byCell.map { case ((s, b), ds) =>
      val (num, den) = (BigInt(byBin(b)) * bySrc(s), BigInt(n) * ds.length)
      val ppm = (num * 1000000 / den).min(1000000).toLong
      val kept = ds.count(d => BigInt(d._4) * den < BigInt(65536) * num).toLong
      (s, b, ds.length.toLong, ppm, kept)
    }.toSet
    assert(rows.toSet == expect, "distribution-match table diverges from replay")
    // the thinning direction is right: over-represented cells (source
    // share above corpus share) get ppm < 1e6, under-represented keep 1e6
    rows.foreach { case (s, b, nIn, ppm, _) =>
      val over = BigInt(nIn) * n > BigInt(byBin(b)) * bySrc(s)
      if (over) assert(ppm < 1000000, s"($s,$b) over-represented but not thinned")
      else assert(ppm == 1000000L, s"($s,$b) not over-represented but thinned")
    }
  }

  test("q241 packing audit equals a driver replay of the md5-order prefix sum") {
    val rows = Curation.q241.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables(spark, sf0001).documents
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
      .sortBy { case (id, _, _) => (md5hex(id), id) }
    var cum = 0L
    val spans = docs.map { case (_, src, n) =>
      cum += n
      val w = ((cum - 1) / 512) - ((cum - n) / 512) + 1
      (src, w, n)
    }
    val expect = spans.groupBy(s => (s._1, s._2)).map { case ((src, w), xs) =>
      (src, w, xs.length.toLong, xs.map(_._3).sum)
    }.toSet
    assert(rows.toSet == expect, "packing audit diverges from the driver replay")
    // conservation: every doc and every token lands in exactly one row
    assert(rows.map(_._3).sum == docs.length.toLong)
    assert(rows.map(_._4).sum == docs.map(_._3).sum)
    assert(rows.exists(_._2 >= 2),
      "no boundary-spanning docs at the fixture — audit unexercised")
  }

  test("q242 mixing audit equals a driver TVD replay over the md5 order") {
    val rows = Curation.q242.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables(spark, sf0001).documents
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, _) => (md5hex(id), id) }
    val n = docs.length.toLong
    val srcTot = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byBucket = docs.zipWithIndex
      .map { case ((_, src), i) => (i.toLong * 20 / n, src) }
      .groupBy(_._1)
    val expect = byBucket.map { case (b, xs) =>
      val nB = xs.length.toLong
      val cnt = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val dev = srcTot.map { case (s, nS) =>
        (BigInt(cnt.getOrElse(s, 0L)) * n - BigInt(nS) * nB).abs
      }.sum
      (b, nB, (dev * 1000000 / (2 * BigInt(n) * nB)).toLong)
    }.toSet
    assert(rows.toSet == expect, s"mixing audit diverges from replay")
    assert(rows.length == 20 && rows.map(_._2).sum == n)
    // the md5 order really mixes: no bucket should hold a source-pure
    // stretch (TVD near the max 1e6 would mean clustered sources)
    rows.foreach { case (b, _, tvd) =>
      assert(tvd < 500000, s"bucket $b badly mixed (tvd=$tvd ppm)")
    }
  }

  test("q243 padding waste equals a next-pow2 driver replay; caps are tight") {
    val rows = Curation.q243.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = graft.Tables(spark, sf0001).documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    def cap(n: Long): Long =
      if (n <= 1) 1L else java.lang.Long.highestOneBit(n - 1) << 1
    val expect = docs.groupBy { case (s, n) => (s, cap(n)) }.map { case ((s, c), xs) =>
      val nd = xs.length.toLong
      val nt = xs.map(_._2).sum
      (s, c, nd, nt, (BigInt(nd) * c - nt) * 1000000 / (BigInt(nd) * c))
    }.map(t => (t._1, t._2, t._3, t._4, t._5.toLong)).toSet
    assert(rows.toSet == expect, "padding-waste table diverges from replay")
    // caps are the TIGHT next power of two: every bucket's docs fit and
    // the half-size bucket would not hold its longest doc
    docs.foreach { case (_, n) =>
      val c = cap(n)
      assert(n <= c && (c == 1 || n > c / 2), s"cap $c not tight for len $n")
    }
    assert(rows.map(_._2).distinct.length > 1, "single cap bucket — audit unexercised")
  }
}
