package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.concurrent.duration._
import scala.util.{Failure, Success}

class PipelineSpec extends AnyFunSuite {
  import Pipeline._

  test("retryWithBackoff: exponential delays capped at maxDelay, then success") {
    val sleeps = mutable.Buffer[FiniteDuration]()
    var calls = 0
    val out = retryWithBackoff(retries = 5, delay = 3.minutes,
      maxDelay = 10.minutes, sleep = sleeps.+=(_)) { () =>
      calls += 1
      if (calls < 5) throw new RuntimeException("flaky") else 42
    }
    assert(out == Success(42))
    assert(calls == 5)
    assert(sleeps.toSeq == Seq(3.minutes, 6.minutes, 10.minutes, 10.minutes))
  }

  test("retryWithBackoff: exhausts retries and returns the last failure") {
    var calls = 0
    val out = retryWithBackoff(retries = 3, delay = 1.second,
      maxDelay = 1.second, sleep = _ => ()) { () =>
      calls += 1; throw new RuntimeException(s"boom $calls")
    }
    assert(out.isFailure && calls == 4) // 1 first attempt + 3 retries
    assert(out.failed.get.getMessage == "boom 4")
  }

  test("pollUntil: polls at interval until Done, counting pokes") {
    var t = 0L
    val statuses = Iterator[PollStatus](StillRunning, StillRunning, Done)
    val out = pollUntil(60.seconds, 3600.seconds,
      clock = () => t, sleep = d => t += d.toNanos)(() => statuses.next())
    assert(out == Success(3))
    assert(t == 120.seconds.toNanos) // two sleeps of poke_interval
  }

  test("pollUntil: times out like the HttpSensor timeout=3600") {
    var t = 0L
    val out = pollUntil(60.seconds, 150.seconds,
      clock = () => t, sleep = d => t += d.toNanos)(() => StillRunning)
    assert(out.isFailure)
    assert(out.failed.get.getMessage.contains("timed out"))
    assert(t <= 150.seconds.toNanos)
  }

  test("pollUntil: failed external job raises (response_check raise path)") {
    val out = pollUntil(1.second, 10.seconds, sleep = _ => ())(
      () => FailedPoll("conclusion=failure"))
    assert(out.isFailure)
    assert(out.failed.get.getMessage.contains("conclusion=failure"))
  }

  test("route: all_success XOR one_failed branches") {
    assert(route(Success(7))(v => s"ok $v", e => s"err ${e.getMessage}") == "ok 7")
    assert(route[Int, String](Failure(new RuntimeException("x")))(
      v => s"ok $v", e => s"err ${e.getMessage}") == "err x")
  }

  test("fanIn trigger rules fire correctly on mixed upstream vectors (N=3)") {
    import TriggerRule._
    val boom = new RuntimeException("boom")
    val allOk: Seq[scala.util.Try[Int]] = Seq(Success(1), Success(2), Success(3))
    val mixed: Seq[scala.util.Try[Int]] = Seq(Success(1), Failure(boom), Success(3))
    val allBad: Seq[scala.util.Try[Int]] = Seq(Failure(boom), Failure(boom))
    def fired(up: Seq[scala.util.Try[Int]]): Seq[String] =
      fanIn(up)(
        ("publish", AllSuccess, (_: Seq[scala.util.Try[Int]]) => "p"),
        ("alert", OneFailed, (_: Seq[scala.util.Try[Int]]) => "a"),
        ("page", AllFailed, (_: Seq[scala.util.Try[Int]]) => "g"),
        ("partial", OneSuccess, (_: Seq[scala.util.Try[Int]]) => "s"),
        ("cleanup", AllDone, (_: Seq[scala.util.Try[Int]]) => "c")
      ).map(_._1)
    assert(fired(allOk) == Seq("publish", "partial", "cleanup"))
    assert(fired(mixed) == Seq("alert", "partial", "cleanup"))
    assert(fired(allBad) == Seq("alert", "page", "cleanup"))
  }

  test("fanIn branches receive the upstream outcomes; non-firing branches never run") {
    import TriggerRule._
    val up: Seq[scala.util.Try[Int]] = Seq(Success(10), Success(20))
    val out = fanIn(up)(
      ("sum", AllSuccess, (u: Seq[scala.util.Try[Int]]) => u.map(_.get).sum),
      ("alert", OneFailed, (_: Seq[scala.util.Try[Int]]) =>
        fail("one_failed must not fire on all-success")))
    assert(out == Seq("sum" -> 30))
  }

  test("fanIn rule quantifier edge cases: empty upstream, N=1") {
    import TriggerRule._
    assert(AllSuccess.fires(Nil) && AllFailed.fires(Nil) && AllDone.fires(Nil))
    assert(!OneSuccess.fires(Nil) && !OneFailed.fires(Nil))
    val one: Seq[scala.util.Try[Int]] = Seq(Failure(new RuntimeException("x")))
    assert(OneFailed.fires(one) && AllFailed.fires(one) && !AllSuccess.fires(one))
  }

  test("Connections registry resolves ids, fails on unknown") {
    // the process-wide registry (graft.pipeline.Connections) — full
    // redaction/rotation contract in ConnectionsSpec
    graft.pipeline.Connections.register("github_api",
      graft.pipeline.Connection("https://api.example.com",
        secrets = Map("token" -> "t")))
    assert(graft.pipeline.Connections.resolve("github_api").endpoint ==
      "https://api.example.com")
    intercept[NoSuchElementException](
      graft.pipeline.Connections.resolve("missing"))
    graft.pipeline.Connections.remove("github_api")
  }

  test("DagRun: stages run inside the budget; the run fails at the next stage past deadline") {
    var t = 0L
    val run = new DagRun(2.hours, clock = () => t)
    // stage 1 starts at t=0, takes 90 minutes (not preempted even though
    // it ends close to the wire — Airflow's fail-at-next-decision rule)
    val s1 = run.stage("land_feed") { () => t += 90.minutes.toNanos; "landed" }
    assert(s1 == Success("landed"))
    assert(run.remaining == 30.minutes)
    // stage 2 starts with 30 min left: allowed to START, task-level
    // budgets (pollUntil timeouts) bound what happens inside
    val s2 = run.stage("summarize") { () => t += 45.minutes.toNanos; 7 }
    assert(s2 == Success(7))
    assert(run.remaining == Duration.Zero) // floored, never negative
    // stage 3 would start past the deadline: the RUN fails, naming it
    val s3 = run.stage("notify")(() => fail("must not start past deadline"))
    assert(s3.isFailure)
    assert(s3.failed.get.getMessage.contains("dagrun_timeout"))
    assert(s3.failed.get.getMessage.contains("notify"))
  }

  test("DagRun: a failing task fails its stage without consuming the run") {
    var t = 0L
    val run = new DagRun(1.hour, clock = () => t)
    val s1 = run.stage("flaky")(() => throw new RuntimeException("boom"))
    assert(s1.isFailure && s1.failed.get.getMessage == "boom")
    // the run itself is still live — a later stage inside budget runs
    assert(run.stage("recover")(() => 1) == Success(1))
  }

  test("DagRun.remaining feeds a sensor budget: pollUntil cannot outlive the run") {
    var t = 0L
    val run = new DagRun(10.minutes, clock = () => t)
    t += 7.minutes.toNanos
    // sensor would allow 60 min, but the run only has 3 left
    val budget = run.remaining min 60.minutes
    assert(budget == 3.minutes)
    val out = pollUntil(1.minute, budget, clock = () => t,
      sleep = d => t += d.toNanos)(() => StillRunning)
    assert(out.isFailure && out.failed.get.getMessage.contains("timed out"))
    assert(t <= 10.minutes.toNanos + 1.minute.toNanos)
  }

  test("catchup: runs exactly the missing intervals, in schedule order") {
    val scheduled = Seq(3, 1, 5, 2, 4) // listing order is not schedule order
    val ran = mutable.Buffer[Int]()
    val missing = catchup(scheduled, landed = Set(2, 4))(ran.+=(_))
    assert(missing == Seq(1, 3, 5) && ran.toSeq == Seq(1, 3, 5))
    // catchup=False is landed == scheduled: nothing runs
    assert(catchup(scheduled, scheduled.toSet)(
      (_: Int) => fail("catchup=False must run nothing")).isEmpty)
  }
}
