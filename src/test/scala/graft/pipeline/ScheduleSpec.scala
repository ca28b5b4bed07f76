package graft.pipeline

import java.time.{Instant, ZoneId}
import org.scalatest.funsuite.AnyFunSuite

class ScheduleSpec extends AnyFunSuite {

  private def i(s: String): Instant = Instant.parse(s)

  test("@daily in Asia/Seoul fires at local midnight — 15:00 UTC the previous day") {
    // the reference DAG: schedule='0 0 * * *', start tz="Asia/Seoul"
    val s = Schedule("@daily", "Asia/Seoul")
    assert(s.nextFire(i("2023-01-01T05:00:00Z")) == Some(i("2023-01-01T15:00:00Z")))
    // same cron in UTC is 9 hours later — the zone is semantic, not cosmetic
    val utc = Schedule("0 0 * * *", "UTC")
    assert(utc.nextFire(i("2023-01-01T05:00:00Z")) == Some(i("2023-01-02T00:00:00Z")))
  }

  test("nextFire is strictly after; an exact fire instant yields the NEXT interval") {
    val s = Schedule("0 0 * * *", "UTC")
    assert(s.nextFire(i("2023-01-02T00:00:00Z")) == Some(i("2023-01-03T00:00:00Z")))
  }

  test("firesBetween yields the catchup interval list: one per day, (start, until]") {
    val s = Schedule("@daily", "Asia/Seoul")
    val fires = s.firesBetween(i("2023-01-01T00:00:00Z"), i("2023-01-31T00:00:00Z"))
    assert(fires.length == 30, s"got ${fires.length}")
    assert(fires == fires.sorted)
    assert(fires.head == i("2023-01-01T15:00:00Z"))
    // integration: the fire list IS Pipeline.catchup's schedule
    val landed = fires.take(3).toSet
    val ran = Pipeline.catchup(fires, landed)((_: Instant) => ())
    assert(ran == fires.drop(3))
  }

  test("field grammar: steps, ranges, lists; business-hours cron") {
    val s = Schedule("*/15 9-17 * * 1-5", ZoneId.of("UTC"))
    // Mon 2024-01-08 09:00 follows Sun 2024-01-07 (weekend silent)
    assert(s.nextFire(i("2024-01-06T00:00:00Z")) == Some(i("2024-01-08T09:00:00Z")))
    // quarter-hour steps inside the window
    assert(s.nextFire(i("2024-01-08T09:00:00Z")) == Some(i("2024-01-08T09:15:00Z")))
    // after 17:45 the next slot is next morning
    assert(s.nextFire(i("2024-01-08T17:45:00Z")) == Some(i("2024-01-09T09:00:00Z")))
    val lst = Schedule("0 0,12 * * *", ZoneId.of("UTC"))
    assert(lst.nextFire(i("2024-01-08T00:00:00Z")) == Some(i("2024-01-08T12:00:00Z")))
  }

  test("Vixie OR rule: restricted day-of-month OR day-of-week fires on either") {
    val s = Schedule("0 0 13 * 5", ZoneId.of("UTC")) // the 13th OR any Friday
    // 2024-09-09 (Mon): next is Fri 2024-09-13 — both match, fires once
    assert(s.nextFire(i("2024-09-09T12:00:00Z")) == Some(i("2024-09-13T00:00:00Z")))
    // after Fri the 13th: Sep 20 is a Friday, before Oct 13
    assert(s.nextFire(i("2024-09-13T00:00:00Z")) == Some(i("2024-09-20T00:00:00Z")))
  }

  test("DST-skipped local time does not fire; the schedule resumes next day") {
    // America/New_York 2024-03-10: 02:30 local does not exist
    val s = Schedule("30 2 * * *", "America/New_York")
    val next = s.nextFire(i("2024-03-10T00:00:00Z")) // midnight EST = 05:00Z
    assert(next == Some(i("2024-03-11T06:30:00Z")),
      s"expected Mar 11 02:30 EDT, got $next") // Mar 11 02:30 EDT = 06:30Z
  }

  test("a cron that can never match returns None instead of spinning") {
    val s = Schedule("0 0 30 2 *", ZoneId.of("UTC")) // Feb 30
    assert(s.nextFire(i("2024-01-01T00:00:00Z")).isEmpty)
  }

  test("malformed schedules fail loudly") {
    intercept[IllegalArgumentException](Schedule("0 0 * *", ZoneId.of("UTC")).nextFire(Instant.EPOCH))
    intercept[IllegalArgumentException](Schedule("99 0 * * *", ZoneId.of("UTC")).nextFire(Instant.EPOCH))
  }
}
