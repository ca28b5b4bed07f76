package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured-Streaming forms of the engine's time operators, modeling the
  * reference's scheduling/sensing semantics as event-time streams:
  *
  *  - daily cadence (`hello_function_dag.py:16`)  → tumbling windows
  *  - poll cadence (`update_tr_from_ex_dag.py:127`) → sliding windows
  *  - bounded waiting (`timeout=3600`, `:128`)      → watermarks
  *  - user activity                                 → session windows
  *  - HttpSensor tri-state (`:25-39`)               → per-key state machine
  *    via flatMapGroupsWithState ([[SensorStateMachine]])
  *
  * Every transform takes and returns a DataFrame, so the same code runs on
  * `MemoryStream` in tests, file streams locally, and Kafka-style sources
  * on a cluster. Watermarks bound state size — the property that keeps
  * these pipelines runnable indefinitely at production scale.
  */
object StreamOps {

  /** Tumbling event-time aggregate with bounded lateness. */
  def tumblingCounts(events: DataFrame, windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window aggregate (poll-cadence analogue). */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
      lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows per user with an inactivity gap. */
  def sessionCounts(events: DataFrame, gap: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))

  /** Streaming dedup with state bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame, lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming exact-term blocklist gate — the live twin of batch q229,
    * the one curation gate a production feed wants enforced AT INGEST
    * rather than nightly: every micro-batch's documents are exploded to
    * tokens and filtered by the banned-term membership test, emitting
    * one `(doc_id, token)` row per hit as the feed lands. STATELESS —
    * a pure map/filter per batch (the same codegen'd `isin` plan as
    * q229; a production list of thousands becomes a broadcast equi-join
    * — still stateless), so there is no watermark, no state store, and
    * nothing to recover on restart beyond source offsets. Downstream,
    * `groupBy(doc_id).agg(count, countDistinct, min)` over the emitted
    * rows IS q229's table (spec-asserted across a micro-batch
    * boundary). Works on static frames and streams alike. */
  def blocklistHits(docs: DataFrame, blocklist: Seq[String]): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(blocklist: _*))

  /** Streaming surprisal gate — the live cell of the q239/q240
    * token-surprisal lens: each arriving document's tokens are scored
    * against the corpus' stored unigram index (broadcast static side,
    * re-planned per micro-batch — the nightly index refresh lands at
    * the next batch) and emitted as per-token `(source, doc_id,
    * s_bits)` rows, the [[blocklistHits]] design: STATELESS — explode,
    * broadcast LEFT equi-join, row-local bit arithmetic; no watermark,
    * no state store. Out-of-vocabulary tokens take the `len(bin(N))`
    * cap, so a feed drifting into unseen language lights up the gate
    * at ingest, not at the nightly rebuild. Downstream, the q240 fold
    * over the emitted rows reproduces the batch histogram exactly
    * (spec-asserted across a micro-batch boundary). `uni` is the
    * vocabulary-sized (term, n_t) index, `tot` its 1-row (n_corpus)
    * total — both static frames read from the persisted index. */
  def surprisalGate(docs: DataFrame, uni: DataFrame, tot: DataFrame): DataFrame =
    graft.operators.TextOps.scoredTokens(docs, broadcast(uni), tot)

  /** Stream-stream interval join: each left event matched to right events
    * of the same key that happened at-or-before it, within `interval` —
    * e.g. "error ⋈ the purchases in the preceding hour". Both sides carry
    * watermarks AND the join condition bounds the time delta in both
    * directions, which is what lets the engine evict buffered state: the
    * property that keeps a stream-stream join runnable indefinitely. An
    * unbounded-time stream join would buffer both streams forever —
    * that shape is rejected here by design. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      interval: String, lateness: String): DataFrame = {
    val l = left.withWatermark("ts", lateness).alias("l")
    val r = right.withWatermark("ts", lateness).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") <= col("l.ts") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $interval"))
  }

  /** Stream-static enrichment join: each arriving event picks up its
    * dimension attributes (the classic "enrich the event stream with the
    * user table"). The static side is explicitly broadcast, so every
    * micro-batch joins map-side — the stream never shuffles, and there is
    * no state store and no watermark requirement because the static side
    * is not buffered (it is re-planned per micro-batch, so a file-backed
    * dimension refresh is visible at the next batch). LEFT join by
    * design: enrichment must never drop stream rows — events without a
    * dimension row pass through with nulls for the dim columns. At scale
    * the broadcast bound is the dimension's size, same as any broadcast
    * join; a fact-sized "dimension" belongs in [[intervalJoin]] instead. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming FK-orphan gate — the live twin of batch q238's
    * referential-integrity audit, for the one edge a production landing
    * wants enforced AT INGEST rather than censused nightly: every
    * micro-batch's fact rows are LEFT-joined against the dimension's
    * DISTINCT key set and the rows whose non-null FK finds no match are
    * emitted as they land (null FKs pass the gate — they are a separate
    * census column in q238, not an orphan). STATELESS — the static side
    * broadcasts and is re-planned per micro-batch (a dim refresh is
    * visible at the next batch), no watermark, no state store; the
    * distinct guard keeps a duplicate-pk dimension from multiplying fact
    * rows, exactly as in [[graft.operators.Relational.fkAudit]].
    * Downstream `count()` of the emitted rows IS q238's `n_orphans` for
    * the edge (spec-asserted across a micro-batch boundary). At scale
    * the broadcast bound is the dim's key set; a fact-sized right side
    * (lineitem→orders) stays in the nightly census where it can
    * shuffle. */
  def fkOrphans(facts: DataFrame, fk: String, dim: DataFrame,
      pk: String): DataFrame = {
    val keys = dim.select(col(pk).as(fk)).distinct()
      .withColumn("graft_fk_hit", lit(1))
    facts.join(broadcast(keys), Seq(fk), "left")
      .filter(col(fk).isNotNull && col("graft_fk_hit").isNull)
      .drop("graft_fk_hit")
  }

  /** The curation gate (q61 quality rules + q67 repetition rules) over a
    * STREAM of documents — incremental corpus curation: newly crawled
    * docs get their keep/drop verdicts on arrival instead of in a nightly
    * batch (the reference's daily-cadence pattern,
    * `/root/reference/dags/hello_function_dag.py:16`, collapsed to
    * per-microbatch latency). Both gates are row-local native/built-in
    * expressions, so the exact batch Columns run unchanged here —
    * stateless, no watermark, no state store, and the stream twin can
    * never drift from the batch gate (equality asserted in
    * StreamOpsSpec). `docs` needs `doc_id` and `text`; the session must
    * have [[graft.functions.GraftFunctions]] registered. */
  def curationGate(docs: DataFrame): DataFrame =
    graft.operators.Curation.gateVerdicts(docs)

  /** The full stateless front of a streaming ingest: canonicalize (NFC +
    * whitespace + case, [[graft.operators.TextOps.canonicalText]]) →
    * redact PII ([[graft.operators.TextOps.redactPii]]) → gate verdicts,
    * all computed on the SCRUBBED text (the text that would be retained),
    * with the scrubbed text carried in the output. Same design as
    * [[curationGate]]: pure row-local batch Columns, so the stream twin
    * is drift-free by construction (equality asserted in StreamOpsSpec).
    * `docs` needs `doc_id` and `text`; the session must have
    * [[graft.functions.GraftFunctions]] registered. */
  def scrubGate(docs: DataFrame): DataFrame = {
    import graft.operators.{Curation, TextOps}
    docs
      .withColumn("text", TextOps.redactPii(TextOps.canonicalText(col("text"))))
      .select(col("doc_id"), col("text").as("clean_text"),
        TextOps.qualityKeep.as("q_keep"),
        Curation.repetitionKeep.as("rep_keep"))
  }
}

/** One banded document row entering the streaming near-dedup gate:
  * `(band, bh)` is the LSH bucket key, `shs` the doc's hashed shingle
  * set (the exact-verification payload). */
case class BandedDoc(band: Int, bh: Long, docId: Long, shs: Array[Long])

/** A verified near-duplicate pair from the gate (smaller doc id first,
  * matching the batch pair orientation). */
case class StreamNearDup(d1: Long, d2: Long, jac: Double)

/** A document held in a band bucket's signature store. */
case class StoredDoc(docId: Long, shs: Array[Long])

/** Streaming MinHash-LSH near-dedup — the arrival-order form of batch
  * q32 ([[graft.operators.Dedup.minhashPairs]]), modeling the
  * reference's incremental-daily corpus semantics
  * (`dags/hello_function_dag.py:16`): each arriving document is checked
  * against the ACCUMULATED signature store instead of a nightly
  * all-corpus batch, so near-dup verdicts land at micro-batch latency.
  *
  * Identical math to the batch path, by construction: the same
  * `graft_hashed_shingles` → `graft_minhash64(64)` → 16 × xxhash64 band
  * keys (the very Column expressions batch uses), so a pair collides in
  * a stream bucket iff it collides in the batch band — and verification
  * is the same exact integer predicate (3·|A∩B| ≥ |A|+|B|, i.e.
  * J ≥ 1/2) with the same HALF_UP 6-dp jaccard. StreamOpsSpec asserts
  * set equality of streamed vs batch-q32 pairs on the same corpus.
  *
  * State design: `transformWithState` keyed on the (band, bucket) pair —
  * state is partitioned by bucket key, so the store distributes across
  * executors and each arriving doc compares only against its bucket's
  * occupants (the LSH candidate set), never the corpus. A doc's shingle
  * set is held once per band (16×) — the classic LSH index-size trade.
  * The store accumulates for the life of the query (that IS the
  * incremental-corpus semantics); a production deployment bounds it
  * with state TTL (`TTLConfig`) or periodic snapshot-compaction, both
  * orthogonal to the gate's logic. A pair sharing several band buckets
  * is emitted once per shared band (buckets are independent keys);
  * downstream consumers dedup with `dropDuplicatesWithinWatermark` —
  * the batch-parity spec dedups with `distinct`. */
object StreamNearDedup {
  private[streaming] val NumHashes = 64
  private[streaming] val Bands = 16

  /** `docs` needs `doc_id` and `text`; works on static frames and
    * streams alike (the spec runs it on a `MemoryStream` with RocksDB
    * state).
    *
    * `ttl` is the production state bound: with a TTL configured, each
    * stored signature expires `ttl.ttlDuration` after it was written —
    * an expired occupant stops generating pairs and its store entry is
    * reclaimed by the state backend, so state size tracks the TTL
    * window's arrival volume instead of the life of the query. TTL
    * accounting is processing-time, so a configured TTL switches the
    * processor to `TimeMode.ProcessingTime`; the default `TTLConfig.NONE`
    * keeps the accumulate-forever incremental-corpus semantics (and the
    * timer-free `TimeMode.None`) that the batch-parity spec pins.
    * CAVEAT (same as the SensorStateMachine timeout): in processing-time
    * mode the engine self-schedules state-cleanup batches, so a
    * TTL-enabled query neither quiesces under `processAllAvailable` nor
    * terminates under `Trigger.AvailableNow` (observed: hundreds of
    * cleanup batches) — drive it with a `ProcessingTime` cadence, or
    * with one-shot `Trigger.Once` runs over a shared checkpoint as the
    * TTL spec does. */
  def pairs(docs: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[StreamNearDup] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rowsPerBand = NumHashes / Bands
    val hsh = graft.operators.Dedup.hashedShingleArray(docs)
    val sigs = hsh.select(col("doc_id"), col("shs"),
      call_function("graft_minhash64", col("shs"), lit(NumHashes)).as("sig"))
    val bandStructs = (0 until Bands).map { b =>
      val hs: Seq[org.apache.spark.sql.Column] =
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => element_at(col("sig"), i + 1))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("bh"))
    }
    sigs
      .select(col("doc_id"), col("shs"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"),
        col("doc_id").as("docId"), col("shs"))
      .as[BandedDoc]
      .groupByKey(r => (r.band, r.bh))
      .transformWithState(new NearDupProcessor(ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}

/** Per-bucket near-dedup state machine: holds the bucket's signature
  * store, compares each arrival against it with the batch-exact Jaccard
  * predicate, then admits the arrival to the store. The `ttl` carries
  * [[StreamNearDedup.pairs]]'s state bound down to the list state: the
  * store's entries expire individually, so the candidate set a new
  * arrival sees is exactly the TTL window's survivors. */
class NearDupProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[(Int, Long), BandedDoc, StreamNearDup] {
  import org.apache.spark.sql.streaming.ListState
  @transient private var seen: ListState[StoredDoc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[StoredDoc]("seen",
      Encoders.product[StoredDoc], ttl)

  /** |A∩B| for two distinct-element long arrays (hash the smaller,
    * probe the larger — bucket occupants are small by LSH design). */
  private def intersectSize(a: Array[Long], b: Array[Long]): Int = {
    val (small, large) = if (a.length <= b.length) (a, b) else (b, a)
    val set = new java.util.HashSet[Long](small.length * 2)
    small.foreach(set.add)
    large.count(set.contains)
  }

  /** Spark's `round(x, 6)` (HALF_UP), replayed driver-free per pair. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def handleInputRows(key: (Int, Long), rows: Iterator[BandedDoc],
      timerValues: TimerValues): Iterator[StreamNearDup] = {
    // arrival order within a micro-batch: ascending doc id (the stream's
    // arrival sequence; ties cannot occur — doc ids are unique)
    val arrived = rows.toArray.sortBy(_.docId)
    val out = scala.collection.mutable.ArrayBuffer.empty[StreamNearDup]
    val prior = scala.collection.mutable.ArrayBuffer.empty[StoredDoc]
    val it = seen.get()
    while (it.hasNext) prior += it.next()
    arrived.foreach { d =>
      prior.foreach { p =>
        val inter = intersectSize(p.shs, d.shs)
        // exact J >= 1/2: inter·(den+num) >= (sz1+sz2)·num — the batch
        // predicate (Dedup.atLeastJaccard), never a rounded comparison
        if (inter.toLong * 3 >= (p.shs.length + d.shs.length).toLong) {
          val jac = round6(
            inter.toDouble / (p.shs.length + d.shs.length - inter))
          out += StreamNearDup(math.min(p.docId, d.docId),
            math.max(p.docId, d.docId), jac)
        }
      }
      val stored = StoredDoc(d.docId, d.shs)
      prior += stored
      seen.appendValue(stored)
    }
    out.iterator
  }
}

/** One document row entering the streaming winnow gate: `fp` is the
  * bucket key (one of the doc's winnow fingerprints), `fps` the doc's
  * FULL distinct fingerprint set (the exact-verification payload). */
case class FpDoc(fp: Long, docId: Long, fps: Array[Long])

/** A verified streaming winnow pair (smaller doc id first; `nShared` is
  * the exact distinct shared-fingerprint count — batch q103's value in
  * the uncapped regime). */
case class StreamWinnowDup(docA: Long, docB: Long, nShared: Long)

/** A document's fingerprint set held in a bucket's store. */
case class StoredFps(docId: Long, fps: Array[Long])

/** Streaming winnowing near-dedup gate — the streaming cell of the
  * winnow lens, completing its matrix row (batch q103, incremental
  * q236, this): each arriving document computes its winnow fingerprint
  * set map-side (the SAME `graft_winnow_fps` expression batch uses, so
  * a pair shares a stream bucket iff it shares a batch fingerprint),
  * keys into one bucket per fingerprint, and is verified against the
  * bucket's occupants by intersecting FULL fingerprint sets — an exact
  * integer ≥ 3 shared-count, the batch predicate.
  *
  * Semantics vs q103: the batch query drops fingerprints with corpus
  * df > 50 before pairing — a CORPUS-INDEX statistic that is
  * inherently retroactive (a fingerprint's final df is unknowable
  * mid-stream), so the live gate verifies on full sets instead; its
  * batch twin is `Dedup.winnowPairs(docs, 3, dfCap = ∞)` (spec-asserted
  * across a micro-batch boundary) and the production state bound for
  * hot boilerplate buckets is the TTL, exactly as in
  * [[StreamNearDedup]] (whose band buckets are equally unbounded
  * without it). A pair sharing m fingerprints meets in m buckets and
  * emits m identical rows; downstream dedups with
  * `dropDuplicatesWithinWatermark` — the parity spec with `distinct`. */
object StreamWinnowGate {
  /** `docs` needs `doc_id` and `text`; works on static frames and
    * streams alike. Same TTL contract and processing-time caveat as
    * [[StreamNearDedup.pairs]]. */
  def pairs(docs: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[StreamWinnowDup] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    docs
      .select(col("doc_id").as("docId"),
        call_function("graft_winnow_fps",
          split(col("text"), " "), lit(3), lit(4)).as("fps"))
      .select(explode(col("fps")).as("fp"), col("docId"), col("fps"))
      .as[FpDoc]
      .groupByKey(_.fp)
      .transformWithState(new WinnowGateProcessor(ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}

/** Per-fingerprint-bucket winnow state machine: holds the bucket's
  * occupant fingerprint sets, exact-verifies each arrival against them
  * (≥ 3 distinct shared fingerprints), then admits the arrival. */
class WinnowGateProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[Long, FpDoc, StreamWinnowDup] {
  import org.apache.spark.sql.streaming.ListState
  @transient private var seen: ListState[StoredFps] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[StoredFps]("seen",
      Encoders.product[StoredFps], ttl)

  /** |A∩B| for two distinct-element long arrays (hash the smaller,
    * probe the larger — the NearDupProcessor primitive). */
  private def intersectSize(a: Array[Long], b: Array[Long]): Int = {
    val (small, large) = if (a.length <= b.length) (a, b) else (b, a)
    val set = new java.util.HashSet[Long](small.length * 2)
    small.foreach(set.add)
    large.count(set.contains)
  }

  override def handleInputRows(key: Long, rows: Iterator[FpDoc],
      timerValues: TimerValues): Iterator[StreamWinnowDup] = {
    // arrival order within a micro-batch: ascending doc id (unique ids)
    val arrived = rows.toArray.sortBy(_.docId)
    val out = scala.collection.mutable.ArrayBuffer.empty[StreamWinnowDup]
    val prior = scala.collection.mutable.ArrayBuffer.empty[StoredFps]
    val it = seen.get()
    while (it.hasNext) prior += it.next()
    arrived.foreach { d =>
      prior.foreach { p =>
        val shared = intersectSize(p.fps, d.fps)
        if (shared >= 3)
          out += StreamWinnowDup(math.min(p.docId, d.docId),
            math.max(p.docId, d.docId), shared.toLong)
      }
      val stored = StoredFps(d.docId, d.fps)
      prior += stored
      seen.appendValue(stored)
    }
    out.iterator
  }
}

/** A vector keyed into one sign-LSH table bucket. */
case class BucketedVec(tbl: Int, bkt: Long, vecId: Long, emb: Array[Float])

/** A verified embedding near-duplicate pair (smaller vec id first,
  * matching the batch q44 pair orientation). */
case class StreamEmbedDup(v1: Long, v2: Long, cos: Double)

/** A vector held in a bucket's store: id, embedding, precomputed norm
  * (the norm is computed once at admission — the batch plan's
  * `sqrt(graft_dot(e, e))` — so each comparison costs one dot). */
case class StoredVec(vecId: Long, emb: Array[Float], norm: Double)

/** Streaming embedding near-dedup — the arrival-order form of batch q44
  * ([[graft.operators.Similarity]]'s `neardupPairs`), completing the
  * dedup matrix: text has batch (q32), incremental (q93) and streaming
  * ([[StreamNearDedup]]) forms; embeddings had batch (q44) and
  * incremental (q147) — this is the streaming cell. Each arriving
  * vector is checked against the ACCUMULATED bucket stores instead of a
  * nightly all-corpus batch, so embedding near-dup verdicts land at
  * micro-batch latency — the gate a live multimodal ingest runs in
  * front of the corpus.
  *
  * Identical math to the batch path, by construction: the same
  * `graft_lsh_buckets` 32×4 sign-LSH geometry (the very Column
  * expression q44/q147 use — proven pair-exact at every shipped fixture
  * by the q44 verified-SF envelope spec), and the verify is the same
  * strictly-sequential double dot fold as the codegen'd `graft_dot`
  * (`DotProduct.nullSafeEval`) with the same HALF_UP 6-dp rounding and
  * the same `round(cos, 6) >= 0.45` admission — so streamed pairs are
  * bit-identical to batch pairs, not approximately equal. StreamOpsSpec
  * asserts set equality of streamed vs batch-q44 pairs on the fixture.
  *
  * State design: `transformWithState` keyed on the (table, bucket)
  * pair — state is partitioned by bucket key, so the store distributes
  * across executors and each arrival compares only against its bucket's
  * occupants (the LSH candidate set), never the corpus. A vector is held
  * once per table (32×) — the LSH index-size trade, same as the text
  * gate's 16 bands. The store accumulates for the life of the query
  * (the incremental-corpus semantics); `ttl` bounds it in production
  * exactly as [[StreamNearDedup.pairs]] documents (processing-time TTL,
  * per-entry expiry, same `Trigger` caveats). A pair sharing several
  * table buckets is emitted once per shared table; downstream consumers
  * dedup with `dropDuplicatesWithinWatermark` — the batch-parity spec
  * dedups with `distinct`. */
object StreamEmbedDedup {
  /** q44's proven-exact geometry (Similarity.scala's 32 tables × 4
    * hyperplanes) — the envelope spec that proves every fixture pair
    * with cos ≥ 0.45 collides under it is the same one that backs the
    * batch oracle, so the gate inherits the guarantee. */
  private[streaming] val Tables = 32
  private[streaming] val PlanesPerTable = 4

  /** `vectors` needs `vec_id` and `embedding` (array<float>); works on
    * static frames and streams alike (the spec runs it on a
    * `MemoryStream` with RocksDB state). */
  def pairs(vectors: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[StreamEmbedDup] = {
    val spark = vectors.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    vectors
      .select(col("vec_id"), col("embedding"),
        posexplode(graft.functions.VectorOps.lshBucketTables(col("embedding"),
          tables = Tables, planesPerTable = PlanesPerTable)).as(Seq("tbl", "bkt")))
      .select(col("tbl"), col("bkt"), col("vec_id").as("vecId"),
        col("embedding").as("emb"))
      .as[BucketedVec]
      .groupByKey(r => (r.tbl, r.bkt))
      .transformWithState(new EmbedDupProcessor(ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}

/** Per-bucket embedding near-dedup state machine: holds the bucket's
  * vector store, compares each arrival against it with the batch-exact
  * cosine (sequential double fold ≡ `graft_dot`, HALF_UP 6-dp, ≥ 0.45),
  * then admits the arrival to the store — [[NearDupProcessor]]'s shape
  * with the Jaccard verify swapped for q44's cosine verify. */
class EmbedDupProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[(Int, Long), BucketedVec, StreamEmbedDup] {
  import org.apache.spark.sql.streaming.ListState
  @transient private var seen: ListState[StoredVec] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[StoredVec]("seen",
      Encoders.product[StoredVec], ttl)

  /** The codegen'd `graft_dot` fold, replayed exactly: ascending-index
    * double accumulation (per-term products commute bitwise, so
    * dot(a,b) ≡ dot(b,a) and pair orientation cannot perturb the
    * value). */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Spark's `round(x, 6)` (HALF_UP), replayed driver-free per pair. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def handleInputRows(key: (Int, Long), rows: Iterator[BucketedVec],
      timerValues: TimerValues): Iterator[StreamEmbedDup] = {
    // arrival order within a micro-batch: ascending vec id (ids unique)
    val arrived = rows.toArray.sortBy(_.vecId)
    val out = scala.collection.mutable.ArrayBuffer.empty[StreamEmbedDup]
    val prior = scala.collection.mutable.ArrayBuffer.empty[StoredVec]
    val it = seen.get()
    while (it.hasNext) prior += it.next()
    arrived.foreach { d =>
      val dn = math.sqrt(dot(d.emb, d.emb))
      prior.foreach { p =>
        // batch verify order: round(dot / (norm1 * norm2), 6) >= 0.45
        val cos = round6(dot(p.emb, d.emb) / (p.norm * dn))
        if (cos >= 0.45)
          out += StreamEmbedDup(math.min(p.vecId, d.vecId),
            math.max(p.vecId, d.vecId), cos)
      }
      val stored = StoredVec(d.vecId, d.emb, dn)
      prior += stored
      seen.appendValue(stored)
    }
    out.iterator
  }
}

/** One observation of an external job (the sensor's poll payload). */
case class Poll(jobId: Long, ts: java.sql.Timestamp, status: String)

/** Terminal verdict for a sensed job. */
case class SensorVerdict(jobId: Long, verdict: String, nPolls: Int)

/** The reference's HttpSensor `response_check` tri-state
  * (`update_tr_from_ex_dag.py:25-39`) as a distributed per-key state
  * machine: completed+success → emit "success"; completed+failure →
  * emit "failed"; still running → keep waiting; no poll before the
  * processing-time timeout → emit "timeout" (the sensor's
  * `timeout=3600`). One state entry per in-flight job — state is
  * bounded and partitioned by key, so millions of concurrent sensors
  * distribute across executors. */
object SensorStateMachine {
  /** @param timeoutMs sensor wall-clock timeout; <= 0 disables the timeout
    *                  branch (useful in synchronous tests — processing-time
    *                  timeouts make the engine self-schedule wake-up
    *                  batches, which never quiesces under
    *                  `processAllAvailable`). */
  def apply(polls: Dataset[Poll], timeoutMs: Long = 3600000L): Dataset[SensorVerdict] = {
    import polls.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    polls
      .groupByKey(_.jobId)
      .flatMapGroupsWithState[Int, SensorVerdict](
        OutputMode.Append, timeoutConf) {
        (jobId: Long, rows: Iterator[Poll], state: GroupState[Int]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0)
            state.remove()
            Iterator(SensorVerdict(jobId, "timeout", n))
          } else {
            val seen = state.getOption.getOrElse(0)
            val sorted = rows.toSeq.sortBy(p => (p.ts.getTime, p.status))
            val n = seen + sorted.size
            sorted.collectFirst {
              case p if p.status == "success" => SensorVerdict(jobId, "success", n)
              case p if p.status == "failure" => SensorVerdict(jobId, "failed", n)
            } match {
              case Some(verdict) =>
                state.remove()
                Iterator(verdict)
              case None =>
                state.update(n)
                if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
                Iterator.empty
            }
          }
      }
  }
}

/** The same sensor tri-state on Spark 4's `transformWithState` API
  * (StatefulProcessor + typed ValueState, RocksDB-backed): the
  * forward-looking arbitrary-state path — explicit named state
  * variables with optional TTL instead of a single opaque state value.
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` on the session. */
class SensorProcessor extends StatefulProcessor[Long, Poll, SensorVerdict] {
  @transient private var polls: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    polls = getHandle.getValueState[Int]("polls", Encoders.scalaInt, TTLConfig.NONE)

  override def handleInputRows(jobId: Long, rows: Iterator[Poll],
      timerValues: TimerValues): Iterator[SensorVerdict] = {
    val seen = if (polls.exists()) polls.get() else 0
    val sorted = rows.toSeq.sortBy(p => (p.ts.getTime, p.status))
    val n = seen + sorted.size
    sorted.collectFirst {
      case p if p.status == "success" => SensorVerdict(jobId, "success", n)
      case p if p.status == "failure" => SensorVerdict(jobId, "failed", n)
    } match {
      case Some(verdict) =>
        polls.clear()
        Iterator.single(verdict)
      case None =>
        polls.update(n)
        Iterator.empty
    }
  }
}

object SensorProcessor {
  /** transformWithState form of [[SensorStateMachine]]. */
  def apply(polls: Dataset[Poll]): Dataset[SensorVerdict] = {
    import polls.sparkSession.implicits._
    polls.groupByKey(_.jobId)
      .transformWithState(new SensorProcessor, TimeMode.None(), OutputMode.Append())
  }
}

/** One event entering the streaming transition counter. */
case class TransEvent(userId: Long, eventType: String, us: Long, eventId: Long)

/** One observed per-user (src → dst) transition at event time `us`. */
case class Transition(userId: Long, src: String, dst: String, us: Long)

/** Per-user last-seen event for the transition counter. */
case class TransState(eventType: String, us: Long, eventId: Long)

/** Streaming form of the q107 clickstream transition matrix: a per-user
  * `transformWithState` machine that remembers only the LAST event (one
  * small record per user, forever) and emits one (src → dst) row per
  * consecutive pair — the live feed a q149-style next-event model
  * re-estimates from. Same in-order contract as [[StreamFunnel]]: events
  * are (us, event_id)-sorted within each micro-batch and arrival order is
  * trusted across batches; on an in-order stream the aggregated
  * transition counts equal batch q107's exactly (spec-asserted across a
  * micro-batch boundary). */
object StreamTransitions {
  /** `events` needs `user_id`, `event_type`, `ts`, `event_id`; works on
    * static frames and streams alike. */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as("userId"),
        col("event_type").as("eventType"),
        unix_micros(col("ts")).as("us"),
        col("event_id").as("eventId"))
      .as[TransEvent]
      .groupByKey(_.userId)
      .transformWithState(new TransProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-user last-event machine behind [[StreamTransitions]]. */
class TransProcessor
    extends StatefulProcessor[Long, TransEvent, Transition] {
  @transient private var st: ValueState[TransState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TransState]("last",
      Encoders.product[TransState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TransEvent],
      timerValues: TimerValues): Iterator[Transition] = {
    var last = if (st.exists()) Option(st.get()) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    // q107's per-user total order: (us, event_id)
    rows.toArray.sortBy(e => (e.us, e.eventId)).foreach { e =>
      last.foreach(p => out += Transition(key, p.eventType, e.eventType, e.us))
      last = Some(TransState(e.eventType, e.us, e.eventId))
    }
    last.foreach(st.update)
    out.iterator
  }
}

/** One observed per-user (t1 → t2 → t3) contiguous trigram at `us`. */
case class Trigram(userId: Long, t1: String, t2: String, t3: String, us: Long)

/** Per-user last-two-events window for the trigram miner. */
case class TrigramState(prev2: String, prev1: String, us: Long, eventId: Long)

/** Streaming form of the q189 journey-trigram miner — [[StreamTransitions]]
  * with a two-event memory: the per-user state holds the LAST TWO event
  * types (one ~40-byte record per user, forever — state is O(n−1) strings
  * per key for n-gram mining, never a history buffer) and each arriving
  * event emits one completed (t1, t2, t3) row once the window is full.
  * Same in-order contract as [[StreamTransitions]]; on an in-order stream
  * the aggregated trigram counts equal batch q189's exactly
  * (spec-asserted across a micro-batch boundary). */
object StreamTrigrams {
  /** `events` needs `user_id`, `event_type`, `ts`, `event_id`; works on
    * static frames and streams alike. */
  def trigrams(events: DataFrame): Dataset[Trigram] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as("userId"),
        col("event_type").as("eventType"),
        unix_micros(col("ts")).as("us"),
        col("event_id").as("eventId"))
      .as[TransEvent]
      .groupByKey(_.userId)
      .transformWithState(new TrigramProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-user two-event sliding window behind [[StreamTrigrams]]. */
class TrigramProcessor
    extends StatefulProcessor[Long, TransEvent, Trigram] {
  @transient private var st: ValueState[TrigramState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TrigramState]("last2",
      Encoders.product[TrigramState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TransEvent],
      timerValues: TimerValues): Iterator[Trigram] = {
    var last = if (st.exists()) Option(st.get()) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[Trigram]
    // q189's per-user total order: (us, event_id)
    rows.toArray.sortBy(e => (e.us, e.eventId)).foreach { e =>
      last match {
        case Some(s) =>
          if (s.prev2 != null)
            out += Trigram(key, s.prev2, s.prev1, e.eventType, e.us)
          last = Some(TrigramState(s.prev1, e.eventType, e.us, e.eventId))
        case None =>
          last = Some(TrigramState(null, e.eventType, e.us, e.eventId))
      }
    }
    last.foreach(st.update)
    out.iterator
  }
}

/** One forward-filled hourly tick from [[StreamLocf]]. */
case class LocfTick(eventType: String, hourEpoch: Long, vLocf: Double)

/** An observed hourly reading entering [[StreamLocf]] (`v = None` models
  * a tick that carries no observation and must inherit the fill). */
case class LocfIn(eventType: String, hourEpoch: Long, v: Option[Double])

/** Last carried observation per key. */
case class LocfState(hourEpoch: Long, v: Double)

/** Streaming forward-fill (LOCF) — the live twin of batch q91: per key,
  * every hour between the first observation and the newest one gets a
  * value, gap hours inheriting the most recent observed reading. Batch
  * q91 rebuilds the full hourly frame with `sequence()` + a running
  * `last(ignoreNulls)` window; the stream can't re-window history, so a
  * per-key `transformWithState` machine keeps ONE small record (last
  * hour, last value) and, when a new observation lands h hours later,
  * emits the h−1 carried gap ticks plus the new reading. Per-input
  * emission is bounded by the gap length — on a live feed the tick
  * cadence, not the corpus, bounds it (a cold key re-appearing after a
  * year is a data bug the pipeline should quarantine upstream, exactly
  * like q90's gap-fill bound).
  *
  * Same in-order contract as [[StreamTransitions]]: rows sort by hour
  * within a micro-batch, arrival order is trusted across batches. Fed
  * the observed hourly means in hour order, the emitted tick set equals
  * batch q91's rows EXACTLY (spec-asserted across a micro-batch
  * boundary, including a key whose first batch ends mid-gap).
  *
  * Value-less inputs (`v = None`) follow batch q91's FRAME semantics,
  * where the per-key hour span is min..max over ALL hourly rows — null-v
  * rows included — and `last(ignoreNulls)` fills them: a None tick past
  * the last hour EXTENDS the span (gap hours plus the tick itself emit
  * the carried value, state advances to its hour), while a None tick
  * before any observation is dropped — batch emits NULL `v_locf` there,
  * which carries no information and has no representation in the
  * non-null [[LocfTick]]. Both branches are pinned by a None-bearing
  * fixture in StreamOpsSpec.
  *
  * State is one ~24-byte record per key, forever — the same "last event
  * only" footprint as [[StreamTransitions]]; keys distribute across
  * executors and each micro-batch touches only arriving keys. */
object StreamLocf {
  /** `hourly` needs `event_type`, `hour_epoch` (seconds, hour-aligned),
    * and a nullable `v`; works on static frames and streams alike. */
  def filled(hourly: DataFrame): Dataset[LocfTick] = {
    val spark = hourly.sparkSession
    import spark.implicits._
    hourly.select(col("event_type").as("eventType"),
        col("hour_epoch").as("hourEpoch"),
        col("v").cast("double").as("v"))
      .as[LocfIn]
      .groupByKey(_.eventType)
      .transformWithState(new LocfProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-key carry machine behind [[StreamLocf]]. */
class LocfProcessor
    extends StatefulProcessor[String, LocfIn, LocfTick] {
  private val HourS = 3600L
  @transient private var st: ValueState[LocfState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[LocfState]("carry",
      Encoders.product[LocfState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[LocfIn],
      timerValues: TimerValues): Iterator[LocfTick] = {
    var last = if (st.exists()) Option(st.get()) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[LocfTick]
    rows.toArray.sortBy(_.hourEpoch).foreach { r =>
      last match {
        case Some(s) if r.hourEpoch > s.hourEpoch =>
          var h = s.hourEpoch + HourS
          while (h < r.hourEpoch) { out += LocfTick(key, h, s.v); h += HourS }
          // a value-less tick here still EXTENDS the span with the
          // carried value — batch q91's frame is min..max over ALL
          // hourly rows (null-v included) and last(ignoreNulls) fills it
          val v = r.v.getOrElse(s.v)
          out += LocfTick(key, r.hourEpoch, v)
          last = Some(LocfState(r.hourEpoch, v))
        case Some(_) => // stale or duplicate hour on an in-order feed: drop
        case None =>
          // q91 semantics: a key's span starts at its first OBSERVED
          // hour — value-less ticks before any observation carry nothing
          r.v.foreach { v =>
            out += LocfTick(key, r.hourEpoch, v)
            last = Some(LocfState(r.hourEpoch, v))
          }
      }
    }
    last.foreach(st.update)
    out.iterator
  }
}

/** One first-activity-per-day record from [[StreamRetention]]: a user's
  * cohort day (epoch days) and the offset of the activity day — the
  * unit the q106 retention triangle counts. */
case class RetentionHit(userId: Long, cohortEpochDay: Long, dayOffset: Int)

/** An event entering [[StreamRetention]], reduced to its calendar day
  * (epoch days — integer day arithmetic, no timestamp in state). */
case class RetEvent(userId: Long, epochDay: Long)

/** Per-user retention state: cohort day + newest day already emitted. */
case class RetState(cohortEpochDay: Long, lastEpochDay: Long)

/** Streaming cohort retention — the live twin of batch q106: each
  * user's first-seen day is their cohort; every LATER calendar day with
  * activity emits one (cohort, day-offset) hit, exactly once per
  * (user, day). Downstream, `groupBy(cohort, offset).count()` IS the
  * retention triangle — the same two-shuffle shape as the batch query,
  * with the cohort join replaced by per-key state.
  *
  * Same in-order contract as [[StreamTransitions]]: rows sort by day
  * within a micro-batch, arrival order is trusted across batches. On an
  * in-order feed the days per user arrive non-decreasing, so "newest
  * emitted day" is a complete dedup — the state is TWO LONGS per user,
  * forever (the [[StreamTransitions]] footprint class; an out-of-order
  * deploy buffers through a [[WatermarkBufferedProcessor]] first, like
  * the funnel/transition *Buffered variants). Fed the fixture events in
  * order, the emitted hit multiset folds to exactly q106's triangle
  * (spec-asserted across a micro-batch boundary). */
object StreamRetention {
  /** `events` needs `user_id` and `ts`; works on static frames and
    * streams alike. */
  def hits(events: DataFrame): Dataset[RetentionHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as("userId"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("epochDay"))
      .as[RetEvent]
      .groupByKey(_.userId)
      .transformWithState(new RetentionProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-user first-seen/last-emitted machine behind
  * [[StreamRetention]]. */
class RetentionProcessor
    extends StatefulProcessor[Long, RetEvent, RetentionHit] {
  @transient private var st: ValueState[RetState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[RetState]("ret",
      Encoders.product[RetState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[RetEvent],
      timerValues: TimerValues): Iterator[RetentionHit] = {
    var s = if (st.exists()) Option(st.get()) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[RetentionHit]
    rows.toArray.sortBy(_.epochDay).foreach { e =>
      s match {
        case None =>
          s = Some(RetState(e.epochDay, e.epochDay))
          out += RetentionHit(key, e.epochDay, 0)
        case Some(cur) if e.epochDay > cur.lastEpochDay =>
          out += RetentionHit(key, cur.cohortEpochDay,
            (e.epochDay - cur.cohortEpochDay).toInt)
          s = Some(cur.copy(lastEpochDay = e.epochDay))
        case Some(_) => // same day already emitted on an in-order feed
      }
    }
    s.foreach(st.update)
    out.iterator
  }
}

/** Watermark-buffered OUT-OF-ORDER funnel gate — the variant the plain
  * [[StreamFunnel]] scaladoc defers to: arrival order is NOT trusted.
  * Events buffer in per-user `ListState` until the event-time watermark
  * passes them; an event-time timer then drains the finalized prefix
  * (everything strictly older than the watermark — nothing older can
  * arrive anymore, by the watermark contract) through the same stage
  * machine in (us, event_id) order. Any event no later than the
  * watermark delay lands in the right order regardless of arrival
  * shuffling, so the terminal stages equal batch q105/q144's on ANY
  * ≤-delay-disordered stream (spec-asserted with cross-batch
  * shuffling). State = the in-flight buffer (bounded by the lateness
  * window × per-user rate) + one FunnelState per user. */
object StreamFunnelBuffered {
  /** `events` needs `event_id`, `user_id`, `event_type`, `ts`;
    * `maxLateness` is the watermark delay that bounds both reordering
    * tolerance and buffer growth. */
  def transitions(events: DataFrame, maxLateness: String = "10 minutes",
      deadlineUs: Option[Long] = None): Dataset[FunnelTransition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", maxLateness)
      .select(col("user_id").as("userId"),
        col("event_type").as("eventType"),
        unix_micros(col("ts")).as("us"),
        col("event_id").as("eventId"))
      .as[TransEvent]
      .groupByKey(_.userId)
      .transformWithState(new BufferedFunnelProcessor(deadlineUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** The reusable buffer-until-watermark machine: subclasses supply only
  * the per-key logic over FINALIZED, event-time-ordered events
  * ([[advance]]); this base owns the `ListState` buffer, the
  * register-at-watermark+1 timer discipline, and the drain-by-frontier
  * (events strictly older than the watermark — nothing older can
  * arrive anymore, by the watermark contract). Firing is idempotent,
  * so duplicate timer registrations across batches are harmless; a
  * non-empty residue re-arms the timer for the next watermark
  * advance. */
abstract class WatermarkBufferedProcessor[K, I, O]
    extends StatefulProcessor[K, I, O] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState}
  @transient private var buf: ListState[I] = _

  /** The buffered row shape's encoder (the base cannot summon one for an
    * abstract I). */
  protected def inputEncoder: org.apache.spark.sql.Encoder[I]

  /** Event time of a row, epoch µs — the drain frontier compares this
    * against the watermark. */
  protected def eventUs(e: I): Long

  /** Total-order tie-break within an event-time instant (an id). */
  protected def tieBreak(e: I): Long

  /** Called with the finalized prefix in (eventUs, tieBreak) order; runs
    * the operator's own state machine. */
  protected def advance(key: K, orderedEvents: Seq[I]): Iterator[O]

  /** Subclass state registration (the base claims only "buffer"). */
  protected def initState(): Unit

  final override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[I]("buffer", inputEncoder, TTLConfig.NONE)
    initState()
  }

  final override def handleInputRows(key: K, rows: Iterator[I],
      timerValues: TimerValues): Iterator[O] = {
    rows.foreach(buf.appendValue)
    getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
    Iterator.empty
  }

  final override def handleExpiredTimer(key: K, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[O] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val all = buf.get().toSeq
    val (done, pending) = all.partition(eventUs(_) < wmUs)
    if (pending.isEmpty) buf.clear()
    else { buf.clear(); pending.foreach(buf.appendValue) }
    if (pending.nonEmpty)
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
    advance(key, done.sortBy(e => (eventUs(e), tieBreak(e))))
  }
}

/** [[WatermarkBufferedProcessor]] specialized to the user-keyed
  * [[TransEvent]] row both event-stream machines consume. */
abstract class BufferedEventProcessor[O]
    extends WatermarkBufferedProcessor[Long, TransEvent, O] {
  override protected def inputEncoder: org.apache.spark.sql.Encoder[TransEvent] =
    Encoders.product[TransEvent]
  override protected def eventUs(e: TransEvent): Long = e.us
  override protected def tieBreak(e: TransEvent): Long = e.eventId
}

/** The buffered q105/q144 stage machine behind [[StreamFunnelBuffered]]. */
class BufferedFunnelProcessor(deadlineUs: Option[Long] = None)
    extends BufferedEventProcessor[FunnelTransition] {
  @transient private var st: ValueState[FunnelState] = _

  override protected def initState(): Unit =
    st = getHandle.getValueState[FunnelState]("funnel",
      Encoders.product[FunnelState], TTLConfig.NONE)

  private val stageNames = Array("", "signup", "view", "purchase")

  override protected def advance(key: Long,
      events: Seq[TransEvent]): Iterator[FunnelTransition] = {
    var cur = if (st.exists()) st.get() else FunnelState(0, Long.MinValue)
    def inWindow(us: Long): Boolean =
      us > cur.us && deadlineUs.forall(d => us <= cur.us + d)
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelTransition]
    events.foreach { e =>
      val next = (cur.stage, e.eventType) match {
        case (0, "signup") => 1
        case (1, "view") if inWindow(e.us) => 2
        case (2, "purchase") if inWindow(e.us) => 3
        case _ => 0
      }
      if (next > cur.stage) {
        cur = FunnelState(next, e.us)
        out += FunnelTransition(key, stageNames(next), e.us)
      }
    }
    if (cur.stage > 0) st.update(cur)
    out.iterator
  }
}

/** Out-of-order twin of [[StreamTransitions]] on the same buffer
  * primitive: transition rows ≡ batch q107 on any ≤-delay-disordered
  * stream (spec-asserted alongside the buffered funnel). */
object StreamTransitionsBuffered {
  def transitions(events: DataFrame,
      maxLateness: String = "10 minutes"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", maxLateness)
      .select(col("user_id").as("userId"),
        col("event_type").as("eventType"),
        unix_micros(col("ts")).as("us"),
        col("event_id").as("eventId"))
      .as[TransEvent]
      .groupByKey(_.userId)
      .transformWithState(new BufferedTransProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}

/** The buffered last-event machine behind [[StreamTransitionsBuffered]]. */
class BufferedTransProcessor extends BufferedEventProcessor[Transition] {
  @transient private var st: ValueState[TransState] = _

  override protected def initState(): Unit =
    st = getHandle.getValueState[TransState]("last",
      Encoders.product[TransState], TTLConfig.NONE)

  override protected def advance(key: Long,
      events: Seq[TransEvent]): Iterator[Transition] = {
    var last = if (st.exists()) Option(st.get()) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    events.foreach { e =>
      last.foreach(p => out += Transition(key, p.eventType, e.eventType, e.us))
      last = Some(TransState(e.eventType, e.us, e.eventId))
    }
    last.foreach(st.update)
    out.iterator
  }
}

/** One attributed conversion from [[StreamAttribution]]: the purchase's
  * event time and the credited touch type (`__none` when the last touch
  * is missing or stale — the conservation bucket batch q169 keeps). */
case class AttributionHit(userId: Long, attributedType: String, us: Long)

/** Per-user last non-purchase touch. */
case class TouchState(eventType: String, us: Long)

/** Streaming last-touch attribution — the live twin of batch q169: a
  * per-user `transformWithState` machine holds ONE record (the latest
  * non-purchase touch) and every purchase emits its credit immediately
  * — attribution as a live feed instead of a nightly window pass. Same
  * in-order contract as [[StreamTransitions]] (rows sort by (us,
  * event_id) within a micro-batch, arrival order trusted across
  * batches; an out-of-order deploy buffers through a
  * [[WatermarkBufferedProcessor]] first). The 7-day lookback is the
  * same integer-µs predicate as the batch query; hits grouped by
  * attributed type equal q169's table exactly (spec-asserted across a
  * micro-batch boundary, `__none` included — the streamed counts also
  * total the purchase count). */
object StreamAttribution {
  private[streaming] val LookbackUs = 7L * 86400000000L

  /** `events` needs `user_id`, `event_type`, `ts`, `event_id`; works on
    * static frames and streams alike. */
  def hits(events: DataFrame): Dataset[AttributionHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as("userId"),
        col("event_type").as("eventType"),
        unix_micros(col("ts")).as("us"),
        col("event_id").as("eventId"))
      .as[TransEvent]
      .groupByKey(_.userId)
      .transformWithState(new AttributionProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-user last-touch machine behind [[StreamAttribution]]. */
class AttributionProcessor
    extends StatefulProcessor[Long, TransEvent, AttributionHit] {
  @transient private var st: ValueState[TouchState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TouchState]("touch",
      Encoders.product[TouchState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TransEvent],
      timerValues: TimerValues): Iterator[AttributionHit] = {
    var touch = if (st.exists()) Option(st.get()) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[AttributionHit]
    rows.toArray.sortBy(e => (e.us, e.eventId)).foreach { e =>
      if (e.eventType == "purchase") {
        val credited = touch match {
          case Some(t) if e.us - t.us <= StreamAttribution.LookbackUs => t.eventType
          case _ => "__none"
        }
        out += AttributionHit(key, credited, e.us)
      } else touch = Some(TouchState(e.eventType, e.us))
    }
    touch.foreach(st.update)
    out.iterator
  }
}

/** Out-of-order twin of [[StreamRetention]] on the same buffer
  * primitive: the watermark-finalized prefix drains through the same
  * (cohort, last-emitted-day) machine in (us, event_id) order, so a
  * user's true first-seen day sets the cohort even when it arrives
  * late — the failure mode the in-order machine cannot repair once it
  * has emitted a wrong cohort. Hits ≡ batch q106 on any
  * ≤-delay-disordered stream (spec-asserted alongside the buffered
  * funnel/transitions). */
object StreamRetentionBuffered {
  def hits(events: DataFrame,
      maxLateness: String = "10 minutes"): Dataset[RetentionHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", maxLateness)
      .select(col("user_id").as("userId"),
        col("event_type").as("eventType"),
        unix_micros(col("ts")).as("us"),
        col("event_id").as("eventId"))
      .as[TransEvent]
      .groupByKey(_.userId)
      .transformWithState(new BufferedRetentionProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}

/** The buffered first-seen/last-emitted machine behind
  * [[StreamRetentionBuffered]] — [[RetentionProcessor]]'s logic over the
  * finalized ordered prefix; day = floor(us / 86.4e9), the UTC epoch-day
  * [[StreamRetention]]'s `to_date` computes under the pinned-UTC
  * session. */
class BufferedRetentionProcessor extends BufferedEventProcessor[RetentionHit] {
  @transient private var st: ValueState[RetState] = _

  override protected def initState(): Unit =
    st = getHandle.getValueState[RetState]("ret",
      Encoders.product[RetState], TTLConfig.NONE)

  override protected def advance(key: Long,
      events: Seq[TransEvent]): Iterator[RetentionHit] = {
    var s = if (st.exists()) Option(st.get()) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[RetentionHit]
    events.foreach { e =>
      val day = Math.floorDiv(e.us, 86400000000L)
      s match {
        case None =>
          s = Some(RetState(day, day))
          out += RetentionHit(key, day, 0)
        case Some(cur) if day > cur.lastEpochDay =>
          out += RetentionHit(key, cur.cohortEpochDay,
            (day - cur.cohortEpochDay).toInt)
          s = Some(cur.copy(lastEpochDay = day))
        case Some(_) => // day already covered in the finalized order
      }
    }
    s.foreach(st.update)
    out.iterator
  }
}

/** One event entering the streaming funnel gate. */
case class FunnelEvent(userId: Long, eventType: String, us: Long)

/** A stage transition emitted by the funnel gate: `userId` advanced to
  * `stage` at event time `us` (µs epoch). */
case class FunnelTransition(userId: Long, stage: String, us: Long)

/** Per-user funnel progress: current stage index (0 = not in funnel,
  * 1 = signup, 2 = view, 3 = purchase) and the event time that reached it. */
case class FunnelState(stage: Int, us: Long)

/** Streaming form of the q105 ordered funnel
  * ([[graft.operators.WindowOps.q105]]): a per-user stage machine on
  * `transformWithState`, keyed by `user_id`, that advances
  * signup → view → purchase on the first qualifying event STRICTLY after
  * the previous stage's event time and emits one transition row per
  * advance (append mode — transitions are immutable facts).
  *
  * State is one [[FunnelState]] per user (two fields — a 10-stage funnel
  * is still one small record), so the store distributes across executors
  * on the same high-cardinality key as every other per-user operator.
  *
  * Semantics note (same caveat as [[StreamNearDedup]]'s arrival-order
  * form): the gate processes events in event-time order WITHIN each
  * micro-batch but trusts arrival order across batches — an event
  * arriving after a later-timed event has already advanced the stage is
  * ignored, where batch q105 (global min-aggregates) would have used it.
  * On an in-order stream the terminal stages are exactly q105's
  * (spec-asserted on the fixture events); out-of-order tolerance is
  * [[StreamFunnelBuffered]] — the same stage machine behind a
  * watermark-drained per-user buffer. */
object StreamFunnel {
  /** `events` needs `user_id`, `event_type`, `ts`; works on static
    * frames and streams alike.
    *
    * `deadlineUs` bounds each HOP (q144's semantics, the reference's
    * sensor-timeout analogue): a view advances only within `deadlineUs`
    * of the signup, a purchase only within `deadlineUs` of the view —
    * `None` is the unbounded q105 gate. A too-late event neither
    * advances nor resets the stage, exactly the batch min-aggregate's
    * windowed filter, so on an in-order stream the terminal stages
    * equal batch q144's stage sets (spec-asserted across a micro-batch
    * boundary). */
  def transitions(events: DataFrame,
      deadlineUs: Option[Long] = None): Dataset[FunnelTransition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as("userId"),
        col("event_type").as("eventType"),
        unix_micros(col("ts")).as("us"))
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(deadlineUs), TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-user stage machine behind [[StreamFunnel]]; `deadlineUs`
  * bounds each hop (None = unbounded q105 form). */
class FunnelProcessor(deadlineUs: Option[Long] = None)
    extends StatefulProcessor[Long, FunnelEvent, FunnelTransition] {
  @transient private var st: ValueState[FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[FunnelState]("funnel",
      Encoders.product[FunnelState], TTLConfig.NONE)

  private val stageNames = Array("", "signup", "view", "purchase")

  override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
      timerValues: TimerValues): Iterator[FunnelTransition] = {
    var cur = if (st.exists()) st.get() else FunnelState(0, Long.MinValue)
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelTransition]
    // event-time order within the batch; µs ties cannot advance two
    // stages (strictly-after predicate), matching q105's strict order
    // a hop qualifies strictly after the previous stage's instant AND
    // (deadline form) within deadlineUs of it — q144's windowed filter
    def inWindow(us: Long): Boolean =
      us > cur.us && deadlineUs.forall(d => us <= cur.us + d)
    rows.toArray.sortBy(_.us).foreach { e =>
      val next = (cur.stage, e.eventType) match {
        case (0, "signup") => 1
        case (1, "view") if inWindow(e.us) => 2
        case (2, "purchase") if inWindow(e.us) => 3
        case _ => 0
      }
      if (next > cur.stage) {
        cur = FunnelState(next, e.us)
        out += FunnelTransition(key, stageNames(next), e.us)
      }
    }
    if (cur.stage > 0) st.update(cur)
    out.iterator
  }
}

/** Trigger-rule routing (`all_success` / `one_failed`,
  * `update_tr_from_ex_dag.py:139,150`) for streams: each micro-batch is
  * split into an accepted sink and a dead-letter sink inside one
  * `foreachBatch`, so per-record failures never kill the query and the
  * failure channel is itself a queryable DataFrame. */
object BatchRouter {
  /** Writes rows passing `accept` to `okPath`, the rest to `deadPath`
    * (both parquet, append). Returns the writer function for
    * `writeStream.foreachBatch`. */
  def parquetRouter(accept: org.apache.spark.sql.Column, okPath: String,
      deadPath: String): (DataFrame, Long) => Unit = { (batch, _) =>
    val cached = batch.persist()
    try {
      cached.filter(accept).write.mode("append").parquet(okPath)
      cached.filter(!accept).write.mode("append").parquet(deadPath)
    } finally { cached.unpersist() }
  }
}

/** One ±1 concurrency delta acting inside one UTC day. */
case class ConcDelta(day: Int, tUs: Long, delta: Int, eventId: Long)

/** Running gauge state for one day: current level + peak so far. */
case class ConcState(level: Long, peak: Long)

/** Per-day peak-concurrency gauge row (peak is monotone per day). */
case class ConcGauge(day: Int, peak: Long)

/** Streaming twin of q108's interval sweep-line: a per-day
  * peak-concurrency GAUGE over the live session stream.
  *
  * Where batch q108 recovers each day's midnight carry-in with an
  * equi-join, the streaming form removes the carry entirely by CLIPPING
  * every session to day boundaries ([[StreamConcurrency.deltas]]): a
  * session spanning midnight contributes `+1` again at the next
  * midnight, so every day's concurrency curve starts at level 0 and the
  * days become independent stream keys — `transformWithState` state is
  * one (level, peak) pair per day, distributed on the same key the
  * deltas shuffle on, TTL-free because days retire naturally (a
  * production deployment adds `TTLConfig` at its retention horizon).
  *
  * Same in-order contract as [[StreamFunnel]]/[[StreamNearDedup]]:
  * deltas are processed in event-time order WITHIN a micro-batch and
  * trusted across batches; on an in-order delta stream the final gauge
  * per day equals batch q108's `peak` exactly (spec-asserted on the
  * fixture). Out-of-order tolerance would buffer behind a watermark —
  * orthogonal to the gauge logic. */
object StreamConcurrency {
  private val UsPerDay: Long = 86400L * 1000000L

  /** Day-clipped ±1 delta segments of `[ts, ts + floor(value) s)`.
    * Works on static frames and streams alike (narrow ops only).
    * Sessions shorter than 24 h span at most two days, so the explode
    * emits ≤ 2 segments (4 deltas) per event. */
  def deltas(events: DataFrame): DataFrame =
    events
      .select(col("event_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + floor(col("value")).cast("long") * lit(1000000L))
          .as("e_us"))
      // integer `div`, never `/`: double division rounds at exact-midnight
      // boundaries
      .withColumn("s_day", expr(s"s_us div $UsPerDay").cast("int"))
      .withColumn("e1_day",
        greatest(col("s_day"), expr(s"(e_us - 1) div $UsPerDay").cast("int")))
      .withColumn("day", explode(sequence(col("s_day"), col("e1_day"))))
      .select(col("day"), col("event_id"),
        greatest(col("s_us"), col("day").cast("long") * UsPerDay).as("seg_s"),
        least(col("e_us"), (col("day") + 1).cast("long") * UsPerDay).as("seg_e"))
      .select(col("day"), col("event_id"), explode(array(
        struct(col("seg_s").as("tUs"), lit(1).as("delta")),
        struct(col("seg_e").as("tUs"), lit(-1).as("delta")))).as("d"))
      .select(col("day"), col("d.tUs").as("tUs"), col("d.delta").as("delta"),
        col("event_id").as("eventId"))

  /** The stateful gauge over [[deltas]] rows; emits each day's peak once
    * per micro-batch that touches it (peak is monotone — readers keep
    * the max/latest per day). */
  def gauge(deltaRows: DataFrame): Dataset[ConcGauge] = {
    val spark = deltaRows.sparkSession
    import spark.implicits._
    deltaRows.as[ConcDelta]
      .groupByKey(_.day)
      .transformWithState(new ConcProcessor, TimeMode.None(), OutputMode.Append())
  }
}

/** The per-day (level, peak) machine behind [[StreamConcurrency]]. */
class ConcProcessor extends StatefulProcessor[Int, ConcDelta, ConcGauge] {
  @transient private var st: ValueState[ConcState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[ConcState]("conc",
      Encoders.product[ConcState], TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[ConcDelta],
      timerValues: TimerValues): Iterator[ConcGauge] = {
    var cur = if (st.exists()) st.get() else ConcState(0L, 0L)
    // event-time order within the batch; ends before starts at equal t
    // (half-open intervals), eventId makes the order total — the same
    // (t, delta, id) order as q108's window sort
    rows.toArray.sortBy(d => (d.tUs, d.delta, d.eventId)).foreach { d =>
      val level = cur.level + d.delta
      cur = ConcState(level, math.max(cur.peak, level))
    }
    st.update(cur)
    Iterator.single(ConcGauge(key, cur.peak))
  }
}

/** One token routed to its hash shard. */
case class TokenShard(shard: Int, token: String)

/** Bounded Misra–Gries summary state for one shard. */
case class MGState(tokens: Array[String], counts: Array[Long])

/** One candidate entry emitted per batch: the shard's current summary
  * plus how many tokens that shard has folded so far (`nSeen` lets a
  * reader pick each shard's LATEST emission and bound the undercount). */
case class MGEntry(shard: Int, token: String, mgCount: Long, nSeen: Long)

/** Streaming heavy-hitters gate — the live twin of batch q86: a
  * per-shard Misra–Gries summary maintained in `transformWithState`
  * over the token stream, emitting each shard's candidate set every
  * micro-batch.
  *
  * Sharding is BY TOKEN (md5-prefix hash — the contract's deterministic
  * hash, never hashCode): shards see disjoint token subsets, so a
  * token's full stream count lands in exactly one shard and the MG
  * guarantee localizes — any token with true count > nShard/capacity is
  * present in its shard's summary ([[graft.functions.FrequentItems]]'s
  * bound). With S shards of ≈ n/S tokens and capacity 512, every token
  * above the q86 gate `n/64` sits far above its shard's `n/(S·512)`
  * floor, so the UNION of shard candidates is a superset of the true
  * heavy set — callers re-count candidates exactly and filter on true
  * counts, identical to the batch pipeline's verify pass (and the
  * reason the end-to-end gate is deterministic while the sketch
  * interior is not).
  *
  * State per shard is one ≤ capacity-entry map — bounded regardless of
  * stream length, the property that keeps the gate runnable forever.
  * The MG fold itself reuses the batch Aggregator's `reduce` (one code
  * path for both engines' sketch semantics). */
object StreamHeavyHitters {

  /** Explode documents into (shard, token) rows — works on static
    * frames and streams alike. */
  def tokenShards(docs: DataFrame, shards: Int): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("token"))
      .withColumn("shard",
        pmod(graft.Det.md5Bucket(col("token")), lit(shards)).cast("int"))

  /** The stateful per-shard summary over [[tokenShards]] rows. */
  def gauge(tokenRows: DataFrame, capacity: Int): Dataset[MGEntry] = {
    val spark = tokenRows.sparkSession
    import spark.implicits._
    tokenRows.select(col("shard"), col("token")).as[TokenShard]
      .groupByKey(_.shard)
      .transformWithState(new MGProcessor(capacity), TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-shard Misra–Gries machine behind [[StreamHeavyHitters]]. */
class MGProcessor(capacity: Int)
    extends StatefulProcessor[Int, TokenShard, MGEntry] {
  @transient private var st: ValueState[MGState] = _
  @transient private var seen: ValueState[Long] = _
  private val mg = new graft.functions.FrequentItems(capacity)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[MGState]("mg",
      Encoders.product[MGState], TTLConfig.NONE)
    seen = getHandle.getValueState[Long]("seen",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Int, rows: Iterator[TokenShard],
      timerValues: TimerValues): Iterator[MGEntry] = {
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    if (st.exists()) {
      val s = st.get()
      var i = 0
      while (i < s.tokens.length) { buf.update(s.tokens(i), s.counts(i)); i += 1 }
    }
    val toks = rows.map(_.token).toSeq
    mg.reduce(buf, toks)
    val n = (if (seen.exists()) seen.get() else 0L) + toks.length
    seen.update(n)
    val arr = buf.toArray.sortBy(_._1)
    st.update(MGState(arr.map(_._1), arr.map(_._2)))
    arr.iterator.map { case (t, c) => MGEntry(key, t, c, n) }
  }
}

/** One live event's (type, epoch-µs) for the freshness monitor. */
case class TypeSeen(eventType: String, us: Long)

/** One freshness emission per touched feed per micro-batch. */
case class Freshness(eventType: String, lastUs: Long, nTotal: Long)

/** Streaming feed-freshness monitor — the live twin of batch q145 and
  * the direct streaming form of the reference's HttpSensor
  * (`/root/reference/dags/update_tr_from_ex_dag.py:127-128`): instead
  * of polling every 60 s for "has the upstream produced?", the monitor
  * rides the event stream itself and re-emits each feed's last-seen
  * instant and total volume as data arrives; a scheduler reads the
  * latest emission per feed and applies its own staleness threshold.
  *
  * State per feed is two longs — bounded forever; parity with the
  * batch anchors is EXACT (max and count are order- and
  * batch-boundary-insensitive), spec-asserted. */
object StreamFreshness {

  /** (type, epoch-µs) rows — narrow ops only; static or streaming. */
  def typeSeen(events: DataFrame): DataFrame =
    events.select(col("event_type").as("eventType"),
      unix_micros(col("ts")).as("us"))

  /** The stateful per-feed anchor over [[typeSeen]] rows. */
  def gauge(rows: DataFrame): Dataset[Freshness] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("eventType"), col("us")).as[TypeSeen]
      .groupByKey(_.eventType)
      .transformWithState(new FreshnessProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-feed (last-seen, count) machine behind [[StreamFreshness]]. */
class FreshnessProcessor
    extends StatefulProcessor[String, TypeSeen, Freshness] {
  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("anchor",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[TypeSeen],
      timerValues: TimerValues): Iterator[Freshness] = {
    var (last, n) = if (st.exists()) st.get() else (Long.MinValue, 0L)
    rows.foreach { r => if (r.us > last) last = r.us; n += 1 }
    st.update((last, n))
    Iterator.single(Freshness(key, last, n))
  }
}

/** One binned live event routed to its (bin, shard) cell. */
case class BinRow(cell: Int, bin: Int)

/** One running-count emission per touched cell per micro-batch (`n` is
  * monotone — readers keep each cell's max as "latest"). */
case class BinCount(cell: Int, bin: Int, n: Long)

/** Streaming distribution-drift gate — the live twin of batch q122: the
  * production alarm "has this feature's live distribution moved off the
  * training baseline?" evaluated continuously instead of in a nightly
  * batch.
  *
  * Live events bin exactly as q122 (equi-width, clamped 0–9) and each
  * row routes to one of `shards` cells per bin (md5-prefix of the event
  * id — the contract's deterministic hash). Cells see disjoint row
  * subsets, so a cell's running count is exact and the per-bin live
  * count is the SUM of its shard cells — sharding exists because a
  * 10-key `transformWithState` would funnel a 100 TB/day stream through
  * ten tasks; 10×S cells spread the same exact arithmetic (the
  * [[StreamHeavyHitters]] localization argument, without its sketch
  * slack — counting is exact per cell).
  *
  * State per cell is ONE long — bounded forever. Each micro-batch every
  * touched cell re-emits its running count; a reader folds the latest
  * (= max, counts are monotone) per cell and joins the static baseline
  * through [[psi]], which reproduces q122's Laplace-smoothed table
  * bit-exactly (spec-asserted: streaming the month's second half
  * against the first half's [[baselineBins]] yields exactly the batch
  * q122 rows). */
object StreamDrift {

  private def binCol: org.apache.spark.sql.Column =
    least(greatest(floor(col("value") / 50.0).cast("int"), lit(0)), lit(9))

  /** q122's equi-width bins over a live event frame, each row routed to
    * its (bin, md5-shard) cell. Narrow ops only — works on static
    * frames and streams alike. */
  def binned(events: DataFrame, shards: Int): DataFrame =
    events.select(binCol.as("bin"), col("event_id"))
      .select(
        (col("bin") * shards +
          pmod(graft.Det.md5Bucket(col("event_id")), lit(shards))).cast("int")
          .as("cell"),
        col("bin"))

  /** The stateful per-cell running count over [[binned]] rows. */
  def gauge(binRows: DataFrame): Dataset[BinCount] = {
    val spark = binRows.sparkSession
    import spark.implicits._
    binRows.select(col("cell"), col("bin")).as[BinRow]
      .groupByKey(_.cell)
      .transformWithState(new BinCellProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Per-bin counts of the static baseline window (q122's period-a
    * half), column-named for [[psi]]'s join. */
  def baselineBins(events: DataFrame): DataFrame =
    events.select(binCol.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("na"))

  /** Fold gauge emissions (latest per cell) against a static baseline
    * into q122's smoothed PSI table: per-bin rows + the bin = -1 total.
    * Mirrors q122's arithmetic exactly — including summing the ROUNDED
    * per-bin contributions through an exact decimal for the total. */
  def psi(entries: DataFrame, baseline: DataFrame, shards: Int): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val live = entries.groupBy(col("cell")).agg(max(col("n")).as("n"))
      .withColumn("bin", expr(s"cell div $shards").cast("int"))
      .groupBy(col("bin")).agg(sum(col("n")).as("nb"))
    val bins = baseline.select(col("bin").cast("int").as("bin"), col("na"))
      .join(live, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val totals = bins.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    val pa = (col("na") + 1.0) / (col("ta") + 10.0)
    val pb = (col("nb") + 1.0) / (col("tb") + 10.0)
    // perBin feeds BOTH the output union and the total aggregate — cut
    // it once so the entries→latest-per-cell→per-bin fold doesn't
    // recompute per reader run (the q122/q125 cut-per-consumer pattern)
    val perBin = graft.Materialize.cut(bins.crossJoin(broadcast(totals))
      .select(col("bin"), col("na"), col("nb"),
        round((pa - pb) * log(pa / pb), 6).as("psi")))
    val total = perBin.agg(
      lit(-1).as("bin"), sum(col("na")).as("na"), sum(col("nb")).as("nb"),
      round(sum(col("psi").cast(DecimalType(18, 6))).cast(DoubleType), 6)
        .as("psi"))
    perBin.unionByName(total).orderBy(col("bin").asc_nulls_first)
  }
}

/** One live event routed to its UTC epoch-day. */
case class DayUser(day: Int, userId: Long)

/** One distinct-estimate emission per touched day per micro-batch. */
case class DistinctGauge(day: Int, estUsers: Long)

/** Streaming distinct-user gauge — the live twin of the q123/q133
  * counting family: per-day unique users estimated from an HLL sketch
  * maintained in `transformWithState`. Exact per-key distinct state
  * grows with the user set (unbounded on an open stream); the sketch is
  * the shape that runs forever — ~1 KB per day REGARDLESS of user
  * count, the same mergeable-register argument as q123's stored
  * partials.
  *
  * Parity is EXACT, not approximate-vs-approximate hand-waving: the
  * processor maintains the same DataSketches HLL (lgK 12, HLL_8) that
  * Spark's `hll_sketch_agg` builds, and register state is a pure
  * function of the input SET (per-bucket max — arrival order and batch
  * boundaries cannot change it), so the end-of-stream estimate equals
  * the batch aggregate's estimate bit-for-bit (spec-asserted). */
object StreamDistinct {

  /** (epoch-day, user) rows — narrow ops only; static or streaming. */
  def dayUsers(events: DataFrame): DataFrame =
    events.select(
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("day"),
      col("user_id").as("userId"))

  /** The stateful per-day sketch over [[dayUsers]] rows. */
  def gauge(rows: DataFrame): Dataset[DistinctGauge] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("day"), col("userId")).as[DayUser]
      .groupByKey(_.day)
      .transformWithState(new HllDayProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-day HLL sketch machine behind [[StreamDistinct]]. */
class HllDayProcessor extends StatefulProcessor[Int, DayUser, DistinctGauge] {
  import org.apache.datasketches.hll.{HllSketch, TgtHllType}
  import org.apache.datasketches.memory.Memory

  @transient private var st: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Array[Byte]]("sk", Encoders.BINARY, TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[DayUser],
      timerValues: TimerValues): Iterator[DistinctGauge] = {
    val sk =
      if (st.exists()) HllSketch.heapify(Memory.wrap(st.get()))
      else new HllSketch(12, TgtHllType.HLL_8)
    rows.foreach(r => sk.update(r.userId))
    st.update(sk.toUpdatableByteArray)
    Iterator.single(DistinctGauge(key, Math.round(sk.getEstimate)))
  }
}

/** One live event routed to its deterministic-HLL key. */
case class HllKeyUser(eventType: String, userId: Long)

/** One deterministic-HLL emission per touched type per micro-batch. */
case class HllGauge(eventType: String, presentBuckets: Int, estUsers: Double)

/** Streaming deterministic HLL — the live cell of the q178 pattern, next
  * to [[StreamDistinct]]'s library-sketch gauge: the SAME md5
  * bucket/rank registers batch q178 builds, maintained per event type in
  * `transformWithState` as 256 BYTES of state forever (rank ≤ 57 fits a
  * byte). Registers are a pure function of the input SET (per-bucket
  * max), so arrival order, duplicates and micro-batch boundaries cannot
  * move them — the end-of-stream gauge equals batch q178's
  * (present_buckets, est_users) row exactly (spec-asserted across a
  * batch boundary), including the identical two-branch estimator: the
  * raw-harmonic arithmetic replays the SQL op sequence on the same
  * exact integers, and the linear-counting ln() is safe at 6 dp by the
  * same 255-argument boundary-margin proof. */
object StreamHllDeterministic {

  /** (type, user) rows — narrow ops only; static or streaming. */
  def keyUsers(events: DataFrame): DataFrame =
    events.select(col("event_type").as("eventType"), col("user_id").as("userId"))

  /** The stateful per-type register machine over [[keyUsers]] rows. */
  def gauge(rows: DataFrame): Dataset[HllGauge] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("eventType"), col("userId")).as[HllKeyUser]
      .groupByKey(_.eventType)
      .transformWithState(new DetHllProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** One live reading routed to its quantile-sketch key. */
case class QuantIn(eventType: String, micro: Long)

/** One quantile-gauge emission per touched type per micro-batch. */
case class QuantGauge(eventType: String, n: Long,
    p50Lo: Long, p50Hi: Long, p90Lo: Long, p90Hi: Long,
    p99Lo: Long, p99Hi: Long)

/** Streaming deterministic quantile sketch — the live cell of the q193
  * pattern, completing the deterministic-sketch family's streaming row
  * (distinct: [[StreamHllDeterministic]]; frequency: q190's counters
  * sum-merge into any stateful counter; quantile: THIS): per event
  * type, the SAME integer log-bins batch q193 builds (16 sub-bins per
  * octave, exact unit bins below 16) maintained in `transformWithState`
  * as ≤ ~1k (bin → count) map entries forever, emitting the
  * (n, p50/p90/p99 bin bounds) gauge each micro-batch. Bin counts are
  * a pure function of the input MULTISET — arrival order, batching and
  * duplicates cannot move them — so the end-of-stream gauge equals a
  * batch replay over the same readings exactly (spec-asserted across a
  * micro-batch boundary, same percentile-rank rule ⌈p·n/100⌉). Domain:
  * non-negative micro readings (q193's cents contract). */
object StreamQuantileSketch {

  /** (type, micro-reading) rows — narrow ops only; static or streaming. */
  def keyed(events: DataFrame): DataFrame =
    events.select(col("event_type").as("eventType"),
      greatest(lit(0L), round(col("value").cast("double") * 1000000).cast("long"))
        .as("micro"))

  /** The stateful per-type bin machine over [[keyed]] rows. */
  def gauge(rows: DataFrame): Dataset[QuantGauge] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("eventType"), col("micro")).as[QuantIn]
      .groupByKey(_.eventType)
      .transformWithState(new QuantProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-type log-bin machine behind [[StreamQuantileSketch]]. */
class QuantProcessor extends StatefulProcessor[String, QuantIn, QuantGauge] {
  import org.apache.spark.sql.streaming.MapState

  @transient private var st: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getMapState[Long, Long]("bins",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[QuantIn],
      timerValues: TimerValues): Iterator[QuantGauge] = {
    rows.foreach { r =>
      val id = QuantProcessor.binId(r.micro)
      val cur = if (st.containsKey(id)) st.getValue(id) else 0L
      st.updateValue(id, cur + 1L)
    }
    val bins = st.iterator().toArray.sortBy(_._1)
    val n = bins.map(_._2).sum
    def pick(p: Int): Long = {
      val pos = (n * p + 99) / 100
      var cum = 0L
      bins.find { case (_, c) => cum += c; cum >= pos }.map(_._1).getOrElse(0L)
    }
    val (i50, i90, i99) = (pick(50), pick(90), pick(99))
    Iterator.single(QuantGauge(key, n,
      QuantProcessor.lo(i50), QuantProcessor.hi(i50),
      QuantProcessor.lo(i90), QuantProcessor.hi(i90),
      QuantProcessor.lo(i99), QuantProcessor.hi(i99)))
  }
}

object QuantProcessor {
  /** Batch q193's integer bin: exact unit bins below 16, then
    * 16·⌊log₂(x)⌋ + next-4-bits — identical to the SQL's
    * `length(bin(x))`/shift derivation. */
  private[graft] def binId(m: Long): Long =
    if (m < 16) m
    else {
      val b = 63 - java.lang.Long.numberOfLeadingZeros(m)
      b.toLong * 16 + ((m >> (b - 4)) - 16)
    }

  private[graft] def lo(id: Long): Long =
    if (id < 64) id else (16 + id % 16) << (id / 16 - 4)

  private[graft] def hi(id: Long): Long =
    if (id < 64) id + 1 else lo(id) + (1L << (id / 16 - 4))
}

/** The per-type deterministic register machine behind
  * [[StreamHllDeterministic]]. */
class DetHllProcessor extends StatefulProcessor[String, HllKeyUser, HllGauge] {
  @transient private var st: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Array[Byte]]("regs", Encoders.BINARY, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[HllKeyUser],
      timerValues: TimerValues): Iterator[HllGauge] = {
    val regs = if (st.exists()) st.get() else new Array[Byte](256)
    val md = DetHllProcessor.digest.get()
    rows.foreach { r =>
      md.reset()
      val dig = md.digest(r.userId.toString.getBytes("UTF-8"))
      val bucket = dig(0) & 0xFF
      // rank = leading zeros of the next 56 bits (dig bytes 1..7) + 1 —
      // identical to q178's hex derivation (4·hexZeros + nibbleZeros + 1)
      var rank = 1
      var i = 1
      var done = false
      while (i < 8 && !done) {
        val b = dig(i) & 0xFF
        if (b == 0) rank += 8
        else { rank += Integer.numberOfLeadingZeros(b) - 24; done = true }
        i += 1
      }
      if (!done) rank = 57 // all 56 bits zero
      if (rank > (regs(bucket) & 0xFF)) regs(bucket) = rank.toByte
    }
    st.update(regs)
    Iterator.single(HllGauge(key, DetHllProcessor.present(regs),
      DetHllProcessor.estimate(regs)))
  }
}

object DetHllProcessor {
  private[streaming] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[streaming] def present(regs: Array[Byte]): Int = regs.count(_ != 0)

  /** Batch q178's estimator on a register array — the SAME op sequence
    * as the SQL (`hllRawSql`/`hllEstSql`): exact-integer harmonic sum →
    * one correctly-rounded double conversion → the identical E0-literal
    * arithmetic, with the linear-counting branch under raw ≤ 2.5m. */
  private[streaming] def estimate(regs: Array[Byte]): Double = {
    var s = java.math.BigInteger.ZERO
    var j = 0
    while (j < 256) {
      s = s.add(java.math.BigInteger.ONE.shiftLeft(57 - (regs(j) & 0xFF)))
      j += 1
    }
    val zeros = 256 - present(regs)
    val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
      144115188075855872L.toDouble / s.doubleValue()
    val est =
      if (raw <= 640.0 && zeros > 0) 256.0 * math.log(256.0 / zeros)
      else raw
    java.math.BigDecimal.valueOf(est)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** The per-cell running counter behind [[StreamDrift]]. */
class BinCellProcessor extends StatefulProcessor[Int, BinRow, BinCount] {
  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[BinRow],
      timerValues: TimerValues): Iterator[BinCount] = {
    var bin = -1
    var add = 0L
    rows.foreach { r => bin = r.bin; add += 1 }
    val n = (if (st.exists()) st.get() else 0L) + add
    st.update(n)
    Iterator.single(BinCount(key, bin, n))
  }
}

/** One closed fulfillment interval for a supplier, in epoch days; the
  * (s, e, orderKey, lineNumber) tuple is q182's total sort order. */
case class IntervalRow(suppkey: Long, s: Long, e: Long,
    orderKey: Long, lineNumber: Int)

/** Per-supplier sweep state: the OPEN span's bounds plus closed-span
  * accumulators — six longs forever, regardless of stream length. */
case class CoverageState(spanStart: Long, spanEnd: Long,
    closedCovered: Long, closedMaxSpan: Long, nSpans: Long, nItems: Long)

/** One running gauge emission per touched supplier per micro-batch
  * (all fields monotone per key — readers keep the latest emission). */
case class CoverageGauge(suppkey: Long, nShipments: Long, nSpans: Long,
    coveredDays: Long, maxSpanDays: Long)

/** Streaming interval-union coverage — the live twin of batch q182: the
  * utilization gauge ("how many days has this supplier been busy, over
  * how many distinct busy spans?") maintained continuously instead of
  * recomputed from history every night.
  *
  * Same in-order contract as [[StreamTransitions]]: per supplier, the
  * interval feed arrives ordered by (start, end, orderKey, lineNumber)
  * — the natural order of a landing that appends fulfillment records as
  * orders are placed. Under that contract the classic sweep needs only
  * the OPEN span in state: an arriving interval either extends it
  * (start ≤ open end + 1, day-adjacent chaining — q182's rule) or
  * closes it into the accumulators and opens a new one. State is six
  * longs per supplier forever; the end-of-stream gauge equals batch
  * q182's (n_shipments, n_spans, covered_days, max_span_days) exactly,
  * spec-asserted with spans extending across a micro-batch boundary.
  * Rows inside one micro-batch are sorted before folding (the
  * [[ConcProcessor]] move) — the contract binds order ACROSS batches. */
object StreamCoverage {

  /** (suppkey, start epoch-day, end epoch-day, tie columns) interval
    * rows from the fact tables — narrow ops + the standard orders
    * equi-join; usable on static frames (spec ground truth) and as the
    * shape a live feed must deliver. */
  def intervals(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("shipd"))
      .join(orders.select(col("o_orderkey"), to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("suppkey"),
        datediff(col("od"), lit("1970-01-01").cast("date")).cast("long").as("s"),
        datediff(greatest(col("od"), col("shipd")), lit("1970-01-01").cast("date"))
          .cast("long").as("e"),
        col("l_orderkey").as("orderKey"), col("l_linenumber").as("lineNumber"))

  /** The stateful sweep over [[intervals]]-shaped rows. */
  def gauge(rows: DataFrame): Dataset[CoverageGauge] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("suppkey"), col("s"), col("e"),
        col("orderKey"), col("lineNumber")).as[IntervalRow]
      .groupByKey(_.suppkey)
      .transformWithState(new CoverageProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-supplier open-span sweep machine behind [[StreamCoverage]]. */
class CoverageProcessor
    extends StatefulProcessor[Long, IntervalRow, CoverageGauge] {
  @transient private var st: ValueState[CoverageState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CoverageState]("span",
      Encoders.product[CoverageState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[IntervalRow],
      timerValues: TimerValues): Iterator[CoverageGauge] = {
    var cur = if (st.exists()) st.get() else CoverageState(0L, -2L, 0L, 0L, 0L, 0L)
    rows.toArray.sortBy(r => (r.s, r.e, r.orderKey, r.lineNumber)).foreach { r =>
      val e = math.max(r.s, r.e) // normalize, like q182's greatest()
      if (cur.nSpans == 0L)
        cur = CoverageState(r.s, e, 0L, 0L, 1L, 1L)
      else if (r.s > cur.spanEnd + 1) {
        val len = cur.spanEnd - cur.spanStart + 1
        cur = CoverageState(r.s, e,
          cur.closedCovered + len, math.max(cur.closedMaxSpan, len),
          cur.nSpans + 1, cur.nItems + 1)
      } else
        cur = cur.copy(spanEnd = math.max(cur.spanEnd, e), nItems = cur.nItems + 1)
    }
    st.update(cur)
    val openLen = cur.spanEnd - cur.spanStart + 1
    Iterator.single(CoverageGauge(key, cur.nItems, cur.nSpans,
      cur.closedCovered + openLen, math.max(cur.closedMaxSpan, openLen)))
  }
}

/** One live item occurrence routed to a CMS counter cell
  * (cell = j·65536 + bucket, the d=4 × w=65536 grid flattened). */
case class CmsCellRow(cell: Int)

/** One counter emission per touched cell per micro-batch. */
case class CmsGauge(cell: Int, c: Long)

/** Streaming deterministic count-min sketch — the live twin of batch
  * q190, completing the deterministic-sketch family's streaming row
  * (distinct: [[StreamHllDeterministic]]; quantiles:
  * [[StreamQuantileSketch]]; frequency: THIS). Every item occurrence
  * increments its d=4 md5-derived counter cells; state is ONE exact long
  * per touched cell — ≤ d·w = 262,144 cells forever, regardless of the
  * key space (the saturation ScaleProbe `cms` measures). Counters
  * sum-merge (q190's spec-asserted law), and a sum is arrival-order- and
  * batch-boundary-free, so the end-of-stream counter table equals batch
  * q190's `cmsCountersOf` over the same feed exactly (spec-asserted
  * across a micro-batch boundary). */
object StreamCountMin {

  val Width = 65536

  /** Each item row (one string/long key column `k`, one row per
    * occurrence) fans out to its 4 counter cells — q190's md5 bucket
    * math as narrow ops; static or streaming. */
  def cells(items: DataFrame): DataFrame =
    items
      .select(explode(sequence(lit(0), lit(3))).as("j"), col("k"))
      .select((col("j") * Width +
        graft.operators.Analytic.cmsBucket(col("j"), col("k")))
        .cast("int").as("cell"))

  /** The stateful per-cell running counter over [[cells]] rows. */
  def gauge(rows: DataFrame): Dataset[CmsGauge] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("cell")).as[CmsCellRow]
      .groupByKey(_.cell)
      .transformWithState(new CmsCellProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-cell counter machine behind [[StreamCountMin]]. */
class CmsCellProcessor extends StatefulProcessor[Int, CmsCellRow, CmsGauge] {
  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("c", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[CmsCellRow],
      timerValues: TimerValues): Iterator[CmsGauge] = {
    val c = (if (st.exists()) st.get() else 0L) + rows.size
    st.update(c)
    Iterator.single(CmsGauge(key, c))
  }
}

/** One positive-cents event routed to its (type, first-digit) cell. */
case class DigitCell(eventType: String, digit: Int)

/** One digit-count emission per touched cell per micro-batch. */
case class DigitGauge(eventType: String, digit: Int, n: Long)

/** Streaming Benford gauge — the live twin of batch q215's forensic
  * first-digit screen: every positive amount increments its
  * (type, digit) cell in `transformWithState`; state is one exact long
  * per cell, ≤ 9·|types| cells forever. Counts are a pure sum, so the
  * end-of-stream cell table equals q215's observed grid exactly
  * (spec-asserted across a micro-batch boundary) — the reader folds it
  * against the same Benford ppm literals for the live tamper alarm. */
object StreamBenford {

  /** (type, first digit) rows — narrow ops only; static or streaming.
    * The digit is the first character of the positive cents integer's
    * decimal print, q215's cross-engine rule. */
  def cells(events: DataFrame): DataFrame =
    events.select(col("event_type").as("eventType"),
        round(col("value") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(col("eventType"),
        substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))

  /** The stateful per-cell counter over [[cells]] rows. */
  def gauge(rows: DataFrame): Dataset[DigitGauge] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("eventType"), col("digit")).as[DigitCell]
      .groupByKey(r => (r.eventType, r.digit))
      .transformWithState(new DigitCellProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-cell counter machine behind [[StreamBenford]]. */
class DigitCellProcessor
    extends StatefulProcessor[(String, Int), DigitCell, DigitGauge] {
  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: (String, Int), rows: Iterator[DigitCell],
      timerValues: TimerValues): Iterator[DigitGauge] = {
    val n = (if (st.exists()) st.get() else 0L) + rows.size
    st.update(n)
    Iterator.single(DigitGauge(key._1, key._2, n))
  }
}

/** One event routed to its (type, cents) CDF cell. */
case class CentCell(eventType: String, cents: Long)

/** One cent-count emission per touched cell per micro-batch. */
case class CentGauge(eventType: String, cents: Long, n: Long)

/** Streaming KS gauge — the live twin of batch q223's two-sample
  * Kolmogorov–Smirnov drift screen: every event increments its
  * (type, cents) cell in `transformWithState`; state is one exact long
  * per cell, ≤ |types|·|cent domain| cells forever (the 2-dp money
  * domain is bounded — an unbounded-domain feed would route cents
  * through q193's log bins first, exactly as batch q223 documents).
  * Counts are a pure sum, so the end-of-stream cell table equals the
  * (type, cent) count frame q223's cross-multiplied CDF math consumes
  * (spec-asserted across a micro-batch boundary) — the reader replays
  * the same integer KS fold off the live cells for the drift alarm. */
object StreamKs {

  /** (type, cents) rows — narrow ops only; static or streaming. Cents
    * by the q223 rule: round(value·100) as long. */
  def cells(events: DataFrame): DataFrame =
    events.select(col("event_type").as("eventType"),
      round(col("value") * 100).cast("long").as("cents"))

  /** The stateful per-cell counter over [[cells]] rows. */
  def gauge(rows: DataFrame): Dataset[CentGauge] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("eventType"), col("cents")).as[CentCell]
      .groupByKey(r => (r.eventType, r.cents))
      .transformWithState(new CentCellProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

/** The per-cell counter machine behind [[StreamKs]]. */
class CentCellProcessor
    extends StatefulProcessor[(String, Long), CentCell, CentGauge] {
  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: (String, Long), rows: Iterator[CentCell],
      timerValues: TimerValues): Iterator[CentGauge] = {
    val n = (if (st.exists()) st.get() else 0L) + rows.size
    st.update(n)
    Iterator.single(CentGauge(key._1, key._2, n))
  }
}
