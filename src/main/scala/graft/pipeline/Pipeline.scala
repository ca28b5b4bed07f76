package graft.pipeline

import scala.annotation.tailrec
import scala.concurrent.duration._
import scala.util.{Failure, Success, Try}

/** Driver-side orchestration primitives reproducing the reference DAGs'
  * task semantics as plain Scala composition (the Spark driver program IS
  * the DAG — SURVEY.md §1.2):
  *
  *  - [[retryWithBackoff]] — per-task retry policy with exponential
  *    backoff and a delay cap (`hello_function_dag.py:30-33`:
  *    retries=3, delay=3m, exponential, max 10m)
  *  - [[pollUntil]] — HttpSensor poke loop: interval + overall timeout +
  *    tri-state check (`update_tr_from_ex_dag.py:118-130`)
  *  - [[route]] — trigger rules: run success XOR failure continuation on
  *    the task outcome (`update_tr_from_ex_dag.py:132-154`)
  *  - [[graft.pipeline.Connections]] — named connection/secret registry
  *    resolved at run time (`Connection.get_connection_from_secrets`,
  *    `update_tr_from_ex_dag.py:47`)
  *  - [[DagRun]] — whole-run wall-clock deadline, the `dagrun_timeout`
  *    kwarg (`hello_function_dag.py:13`)
  *  - [[catchup]] — missed-interval replay planner, the `catchup` kwarg
  *    (`update_tr_from_ex_dag.py:84`); the Spark side of a backfill is
  *    `Partitioned.replayDay`'s idempotent day-partition overwrite (q177)
  *
  * Scalar results passed between steps are ordinary return values — the
  * XCom equivalent (`update_tr_from_ex_dag.py:65,121`).
  */
object Pipeline {

  /** Sensor tri-state, mirroring the reference's `response_check`:
    * True → done; raise → failed; False → keep polling. */
  sealed trait PollStatus
  case object Done extends PollStatus
  case object StillRunning extends PollStatus
  final case class FailedPoll(reason: String) extends PollStatus

  final case class PipelineFailure(msg: String) extends RuntimeException(msg)

  /** Retry `task` up to `retries` times after the first attempt, sleeping
    * `delay` (doubling when `exponential`, capped at `maxDelay`) between
    * attempts. */
  def retryWithBackoff[T](
      retries: Int,
      delay: FiniteDuration,
      maxDelay: FiniteDuration,
      exponential: Boolean = true,
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis))(
      task: () => T): Try[T] = {
    @tailrec def loop(attempt: Int, d: FiniteDuration): Try[T] =
      Try(task()) match {
        case s @ Success(_) => s
        case Failure(_) if attempt < retries =>
          sleep(d)
          val next = if (exponential) (d * 2) min maxDelay else d
          loop(attempt + 1, next)
        case f => f
      }
    loop(0, delay min maxDelay)
  }

  /** Poke-mode sensor: evaluate `check` every `pokeInterval` until Done /
    * FailedPoll / overall `timeout`. Returns the number of pokes on
    * success; fails with [[PipelineFailure]] on failure or timeout —
    * exactly the HttpSensor contract (poke_interval=60, timeout=3600,
    * failure raise). */
  def pollUntil(
      pokeInterval: FiniteDuration,
      timeout: FiniteDuration,
      clock: () => Long = () => System.nanoTime(),
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis))(
      check: () => PollStatus): Try[Int] = {
    val deadline = clock() + timeout.toNanos
    @tailrec def loop(pokes: Int): Try[Int] =
      check() match {
        case Done => Success(pokes + 1)
        case FailedPoll(reason) =>
          Failure(PipelineFailure(s"external job failed: $reason"))
        case StillRunning =>
          if (clock() + pokeInterval.toNanos > deadline)
            Failure(PipelineFailure(s"sensor timed out after $timeout"))
          else { sleep(pokeInterval); loop(pokes + 1) }
      }
    loop(0)
  }

  /** Trigger-rule fan-out: `all_success` branch XOR `one_failed` branch. */
  def route[T, R](outcome: Try[T])(onSuccess: T => R, onFailure: Throwable => R): R =
    outcome match {
      case Success(v) => onSuccess(v)
      case Failure(e) => onFailure(e)
    }

  /** Airflow trigger rules over N upstream outcomes — the fan-in
    * generalization of [[route]] (`hello_function_dag.py:43,55` and
    * `update_tr_from_ex_dag.py:139,150` wire one-success/one-failed
    * continuations off parallel upstreams). No `skipped` state here:
    * a task either ran to a `Try`, or was never composed in. */
  sealed trait TriggerRule {
    /** Does a downstream task with this rule fire given these upstream
      * outcomes? Empty upstream = vacuous truth for the all_* rules and
      * false for the one_* rules, matching universal/existential
      * quantification. */
    def fires(upstream: Seq[Try[_]]): Boolean = this match {
      case TriggerRule.AllSuccess => upstream.forall(_.isSuccess)
      case TriggerRule.AllFailed  => upstream.forall(_.isFailure)
      case TriggerRule.OneSuccess => upstream.exists(_.isSuccess)
      case TriggerRule.OneFailed  => upstream.exists(_.isFailure)
      case TriggerRule.AllDone    => true
    }
  }
  object TriggerRule {
    case object AllSuccess extends TriggerRule
    case object AllFailed extends TriggerRule
    case object OneSuccess extends TriggerRule
    case object OneFailed extends TriggerRule
    case object AllDone extends TriggerRule
  }

  /** Run every branch whose trigger rule fires on `upstream`, in the
    * declared order; non-firing branches are skipped. Returns the fired
    * branches' (name, result) pairs — the fan-in join point of a DAG
    * with mixed success/cleanup/alerting continuations. */
  def fanIn[T, R](upstream: Seq[Try[T]])(
      branches: (String, TriggerRule, Seq[Try[T]] => R)*): Seq[(String, R)] =
    branches.collect {
      case (name, rule, run) if rule.fires(upstream) => name -> run(upstream)
    }

  /** Whole-run deadline — `dagrun_timeout`
    * (`hello_function_dag.py:13`: `dagrun_timeout=timedelta(hours=2)`):
    * one wall-clock budget bounding an entire composed pipeline, on top
    * of the per-task budgets ([[retryWithBackoff]] delays, [[pollUntil]]
    * timeouts). Airflow's semantic is fail-at-next-scheduling-decision,
    * not preemption: a run past its deadline fails when the next task
    * would start, in-flight work is left to its own task-level timeout.
    * [[DagRun.stage]] mirrors that exactly — it checks the budget BEFORE
    * running the task and never interrupts one.
    *
    * `remaining` feeds task-level budgets so a sensor deep in the run
    * cannot outlive the DAG (`pollUntil(interval, run.remaining min
    * sensorTimeout)` — the min of the two contracts). */
  final class DagRun(
      timeout: FiniteDuration,
      clock: () => Long = () => System.nanoTime()) {
    private val deadline = clock() + timeout.toNanos

    /** Budget left; floor 0 (a finished budget never goes negative). */
    def remaining: FiniteDuration =
      math.max(0L, deadline - clock()).nanos

    /** Run `task` if budget remains, else fail the RUN (not the task):
      * the error names the stage that would have started past deadline. */
    def stage[T](name: String)(task: () => T): Try[T] =
      if (clock() >= deadline)
        Failure(PipelineFailure(
          s"dagrun_timeout $timeout exceeded before stage '$name'"))
      else Try(task())
  }

  /** Catch-up planner — the `catchup` DAG kwarg
    * (`update_tr_from_ex_dag.py:84`, both reference DAGs set it
    * explicitly): given the scheduled intervals and the runs that
    * already landed, execute the MISSING intervals in schedule order and
    * report what ran. `catchup=False` is `landed = scheduled.toSet`
    * (nothing to do); a backfill is a `scheduled` range in the past.
    * Idempotence is the runner's contract — a day-partition overwrite
    * writer (see `Partitioned.replayDay`) makes re-running a landed
    * interval a no-op by construction, which is why catchup can be
    * crash-restarted from the directory listing alone. */
  def catchup[D](scheduled: Seq[D], landed: Set[D])(runInterval: D => Unit)(
      implicit ord: Ordering[D]): Seq[D] = {
    val missing = scheduled.filterNot(landed).sorted
    missing.foreach(runInterval)
    missing
  }

  // The named connection registry lives at [[graft.pipeline.Connections]]
  // (top level, round 16): process-wide name → Connection(endpoint,
  // options, SECRETS) with redacting render — superseding the
  // plan-build-time options-map class that used to sit here, which had
  // no secret separation and no rotation semantics.
}
