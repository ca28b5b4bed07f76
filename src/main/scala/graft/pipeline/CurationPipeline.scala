package graft.pipeline

import graft.Tables
import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.concurrent.duration._
import scala.util.Try

/** The daily CURATION run end-to-end — the data-pipeline shape the
  * reference orchestrates externally (trigger scraper → poll until the
  * feed lands → process → notify,
  * `/root/reference/dags/update_tr_from_ex_dag.py:93-154`), with the
  * processing step being this engine's own curation pass: exact-dup
  * removal + quality gate + repetition gate (the q69 verdict set), and
  * the survivors written as hash-balanced training shards
  * ([[ShardWriter]]) a data loader can consume directly.
  *
  * Composition is ordinary function composition over DataFrames — the
  * scalar "XCom" between steps is the returned (total, kept) pair. Every
  * stage is the scale shape its standalone query uses: one window
  * shuffle by text for dedup, map-only gates, one shard shuffle for the
  * write. */
object CurationPipeline {

  /** Polls until `readiness` reports the feed landed, then curates
    * `documents` under `sfDir` and writes surviving docs as `nShards`
    * sorted shards under `outDir`; notifies success XOR failure.
    * Returns (total, kept) document counts. */
  def run(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      readiness: () => Pipeline.PollStatus,
      notify: String => Unit,
      nShards: Int = 8,
      pokeInterval: FiniteDuration = 50.millis,
      timeout: FiniteDuration = 5.seconds,
      retries: Int = 3,
      retryDelay: FiniteDuration = 10.millis): Try[(Long, Long)] = {
    val result: Try[(Long, Long)] = for {
      _ <- Pipeline.pollUntil(pokeInterval, timeout)(readiness)
      counts <- Pipeline.retryWithBackoff(
        retries, retryDelay, maxDelay = retryDelay * 8) { () =>
        graft.functions.GraftFunctions.register(spark)
        val d = Tables(spark, sfDir).documents
        val firstOfText = row_number().over(
          Window.partitionBy(col("text")).orderBy(col("doc_id"))) === 1
        val gated = d
          .withColumn("first_of_text", firstOfText)
          .join(Curation.gateVerdicts(d), "doc_id")
        // materialize the gated survivors ONCE: the dedup window (a full
        // shuffle by text) would otherwise execute twice — for the count
        // and again for the shard write
        val kept = gated
          .filter(col("first_of_text") && col("q_keep") && col("rep_keep"))
          .select(d.columns.map(col): _*)
          .localCheckpoint()
        val total = d.count()
        val keptN = kept.count()
        ShardWriter.writeShards(kept, outDir, keyCol = "doc_id",
          nShards = nShards, sortCol = "doc_id")
        (total, keptN)
      }
    } yield counts
    Pipeline.route(result)(
      c => { notify(s"success: curated ${c._2} of ${c._1} docs into $nShards shards"); result },
      err => { notify(s"failure: ${err.getMessage}"); result })
  }
}
