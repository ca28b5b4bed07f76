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

  test("Connections registry resolves ids, fails on unknown") {
    val conns = Connections(
      "github_api" -> Map("endpoint" -> "https://api.example.com", "token" -> "t"))
    assert(conns("github_api")("endpoint") == "https://api.example.com")
    intercept[PipelineFailure](conns("missing"))
  }
}
