package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration._
import scala.util.Success

import graft.SparkTestBase
import graft.pipeline.Pipeline.{Done, FailedPoll, PollStatus, StillRunning}

/** Deferrable-sensor contract: tri-state completion across micro-batches,
  * non-blocking start, deadline honored between pokes — the triggerer
  * semantic of Pipeline.pollUntil without holding the caller. */
class DeferredSensorSpec extends SparkTestBase {

  test("completes Done across micro-batches without blocking the caller") {
    val n = new AtomicInteger(0)
    val d = DeferredSensor.start(spark, 100.millis, 2.minutes) { () =>
      if (n.incrementAndGet() >= 3) Done else StillRunning
    }
    // start() returned while the sensor is still parked — the caller's
    // slot is free to do other work (the whole point of deferring)
    assert(!d.result.isCompleted || n.get() >= 3)
    val out = d.await(2.minutes)
    assert(out == Success(3), s"got $out after ${n.get()} checks")
    // the metronome query was stopped once the outcome landed
    assert(!d.query.isActive)
  }

  test("FailedPoll fails the sensor with the response_check reason") {
    val d = DeferredSensor.start(spark, 100.millis, 2.minutes) { () =>
      FailedPoll("upstream 500")
    }
    val out = d.await(2.minutes)
    assert(out.isFailure &&
      out.failed.get.getMessage == "external job failed: upstream 500")
    assert(!d.query.isActive)
  }

  test("deadline honored between pokes: check never evaluated past the budget") {
    // injected clock: first micro-batch sees t far past the deadline
    val t = new java.util.concurrent.atomic.AtomicLong(0L)
    val checks = new AtomicInteger(0)
    val d = DeferredSensor.start(spark, 100.millis, 1.minute,
      clock = () => t.get()) { () => checks.incrementAndGet(); StillRunning }
    // let one poke land inside the budget, then jump past it
    Thread.sleep(600)
    val seen = checks.get()
    t.set(2.minutes.toNanos)
    val out = d.await(2.minutes)
    assert(out.isFailure && out.failed.get.getMessage.contains("timed out"))
    // after the deadline the check is never evaluated again (>= one
    // batch may still have been in flight when we jumped the clock)
    val after = checks.get()
    Thread.sleep(400)
    assert(checks.get() == after, "check ran after the deadline")
    assert(seen >= 0 && !d.query.isActive)
  }

  test("sub-second pokeInterval keeps sub-second cadence (rate derived from interval)") {
    // regression for the round-15 ADVICE: with rowsPerSecond fixed at 1,
    // a 100 ms pokeInterval degraded to ~1 s/poke (batches only run when
    // new offsets exist), so 5 pokes took >= 5 s; with the derived rate
    // they take well under that even counting query startup
    val n = new AtomicInteger(0)
    val t0 = System.nanoTime()
    val d = DeferredSensor.start(spark, 100.millis, 2.minutes) { () =>
      if (n.incrementAndGet() >= 5) Done else StillRunning
    }
    val out = d.await(2.minutes)
    val wall = (System.nanoTime() - t0) / 1e9
    assert(out == Success(5), s"got $out")
    assert(wall < 4.5, f"5 pokes took $wall%.1f s — cadence degraded toward 1 s/poke")
  }

  test("a check that throws fails the sensor like a task exception") {
    val d = DeferredSensor.start(spark, 100.millis, 2.minutes) { () =>
      throw new IllegalStateException("connector blew up")
    }
    val out = d.await(2.minutes)
    assert(out.isFailure &&
      out.failed.get.getMessage.contains("connector blew up"))
  }
}
