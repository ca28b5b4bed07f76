package graft.pipeline

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import scala.concurrent.duration._
import scala.util.Try

/** The reference's flagship DAG (`update_tr_from_ex_dag.py`) end-to-end,
  * composed from the engine's primitives: wait for the external feed to
  * land (HttpSensor → [[Pipeline.pollUntil]]), run the daily summary with
  * retries (HttpOperator retry kwargs → [[Pipeline.retryWithBackoff]]),
  * then notify success XOR failure (trigger rules → [[Pipeline.route]]) —
  * the whole run bounded by one [[Pipeline.DagRun]] deadline
  * (`dagrun_timeout`, `hello_function_dag.py:13`). The sensor's budget is
  * `min(run.remaining, sensor timeout)` so a slow feed cannot spend the
  * summary stage's time. The sensed check and the notification channel
  * are injected so tests — and real deployments — supply their own
  * transports; the "XCom" between steps is the ordinary return value. */
object DailyPipeline {

  /** Readiness probe for a LANDED feed addressed by connection name —
    * the engine form of the reference's HttpSensor, whose endpoint
    * resolves from a conn id at runtime
    * (`dags/update_tr_from_ex_dag.py:47`). The name re-resolves on
    * EVERY poke, so a registry rotation mid-wait takes effect at the
    * next poke exactly like a secrets-backend rotation; Done once the
    * endpoint directory holds at least one visible data file (dotfiles
    * and `_`-prefixed markers are writer bookkeeping, not data). */
  def landedFeedReadiness(connName: String): () => Pipeline.PollStatus =
    () => {
      import java.nio.file.{Files, Paths}
      val p = Paths.get(Connections.resolve(connName).endpoint)
      if (!Files.isDirectory(p)) Pipeline.StillRunning
      else {
        val it = Files.list(p)
        try {
          val ready = it.anyMatch { f =>
            val n = f.getFileName.toString
            !n.startsWith(".") && !n.startsWith("_")
          }
          if (ready) Pipeline.Done else Pipeline.StillRunning
        } finally it.close()
      }
    }

  def run(
      spark: SparkSession,
      sfDir: String,
      readiness: () => Pipeline.PollStatus,
      notify: String => Unit,
      pokeInterval: FiniteDuration = 50.millis,
      timeout: FiniteDuration = 5.seconds,
      retries: Int = 3,
      retryDelay: FiniteDuration = 10.millis,
      dagrunTimeout: FiniteDuration = 2.hours,
      clock: () => Long = () => System.nanoTime()): Try[Long] = {
    val dagRun = new Pipeline.DagRun(dagrunTimeout, clock)
    val result: Try[Long] = for {
      _ <- dagRun.stage("wait_feed")(() =>
        Pipeline.pollUntil(pokeInterval, dagRun.remaining min timeout,
          clock)(readiness).get)
      rows <- dagRun.stage("daily_summary")(() =>
        Pipeline.retryWithBackoff(
          retries, retryDelay, maxDelay = retryDelay * 8)(
          () => Relational.q01.fn(spark, sfDir).count()).get)
    } yield rows
    Pipeline.route(result)(
      rows => { notify(s"success: pricing summary ready, $rows groups"); result },
      err => { notify(s"failure: ${err.getMessage}"); result })
  }
}
