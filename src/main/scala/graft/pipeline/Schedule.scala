package graft.pipeline

import java.time.{Instant, ZonedDateTime, ZoneId}

/** DAG schedule representation — the `schedule` + timezone-aware
  * `start_date` kwargs the reference DAGs configure
  * (`update_tr_from_ex_dag.py:82-83`: `schedule='0 0 * * *'`,
  * `start_date=pendulum.datetime(2023, 1, 1, tz="Asia/Seoul")`;
  * `hello_function_dag.py:16`: `schedule='@daily'`). SURVEY §1.2
  * delegates the TRIGGERING to external cron — what the engine itself
  * still owes is the interval ARITHMETIC: which fire times exist between
  * a start date and now, in the DAG's OWN timezone, because that list is
  * exactly what [[Pipeline.catchup]] replays ("all the intervals my
  * schedule says should have run").
  *
  * Five-field cron (minute hour day-of-month month day-of-week), each
  * field `*`, a number, a comma list, a range `a-b`, or a step
  * (`* / n`, `a-b/n`); `@daily`/`@hourly`/`@midnight` aliases as in the
  * reference. Day-of-month and day-of-week combine like Vixie cron: when
  * BOTH are restricted, a time matching EITHER fires. Fire times are
  * computed in the schedule's zone — so `0 0 * * *` in Asia/Seoul is
  * midnight KST whatever the cluster's clock zone is, and a DST-skipped
  * local midnight simply has no matching wall time that day (the
  * standard cron behavior for non-existent local times).
  */
final case class Schedule(cron: String, zone: ZoneId) {
  import Schedule._

  private val Array(minF, hourF, domF, monF, dowF) = {
    val norm = cron.trim match {
      case "@daily" | "@midnight" => "0 0 * * *"
      case "@hourly"              => "0 * * * *"
      case other                  => other
    }
    val fs = norm.split("\\s+")
    require(fs.length == 5, s"schedule '$cron' is not 5-field cron")
    fs
  }

  private val mins  = parseField(minF, 0, 59)
  private val hours = parseField(hourF, 0, 23)
  private val doms  = parseField(domF, 1, 31)
  private val mons  = parseField(monF, 1, 12)
  private val dows  = parseField(dowF, 0, 7).map(d => if (d == 7) 0 else d) // 0 and 7 = Sunday

  private def dayMatches(t: ZonedDateTime): Boolean = {
    val domOk = doms(t.getDayOfMonth)
    val dowOk = dows(t.getDayOfWeek.getValue % 7) // java: Mon=1..Sun=7 → cron Sun=0
    (domF == "*", dowF == "*") match {
      case (true, true)   => true
      case (false, true)  => domOk
      case (true, false)  => dowOk
      case (false, false) => domOk || dowOk // Vixie OR rule
    }
  }

  /** First fire time strictly AFTER `after`, or None within `horizonDays`
    * (guards a cron that never matches, e.g. `0 0 30 2 *`). Scans
    * day-by-day in the schedule's zone, then the matching (hour, minute)
    * wall-clock slots of a matching day ascending — at most `horizonDays`
    * day probes, never a minute-by-minute walk over years. */
  def nextFire(after: Instant, horizonDays: Int = 366 * 4): Option[Instant] = {
    var day = after.atZone(zone).toLocalDate
    var probed = 0
    while (probed <= horizonDays) {
      if (mons(day.getMonthValue) && dayMatches(day.atStartOfDay(zone))) {
        var h = 0
        while (h < 24) {
          if (hours(h)) {
            var m = 0
            while (m < 60) {
              if (mins(m)) {
                val zt = day.atTime(h, m).atZone(zone)
                // a DST-skipped local time resolves FORWARD and then no
                // longer reads (h, m) on the wall clock — cron skips it;
                // a repeated (fall-back) local time fires once, at the
                // earlier offset java.time picks
                if (zt.getHour == h && zt.getMinute == m && zt.toInstant.isAfter(after))
                  return Some(zt.toInstant)
              }
              m += 1
            }
          }
          h += 1
        }
      }
      day = day.plusDays(1)
      probed += 1
    }
    None
  }

  /** Every fire time in `(start, until]` — the scheduled-interval list
    * [[Pipeline.catchup]] diffs against the landed runs. Bounded by
    * `max` (loud failure beats a silent truncation when a caller asks
    * for years of minutes). */
  def firesBetween(start: Instant, until: Instant, max: Int = 100000): Seq[Instant] = {
    val out = Seq.newBuilder[Instant]
    var t = start
    var n = 0
    while (n < max) {
      nextFire(t) match {
        case Some(f) if !f.isAfter(until) => out += f; t = f; n += 1
        case _                            => return out.result()
      }
    }
    throw new IllegalStateException(
      s"schedule '$cron' fired more than $max times in the window — raise max explicitly")
  }
}

object Schedule {
  def apply(cron: String, tz: String): Schedule = Schedule(cron, ZoneId.of(tz))

  /** One cron field → membership set over [lo, hi]. */
  private[graft] def parseField(f: String, lo: Int, hi: Int): Set[Int] = {
    def rangeOf(atom: String): Seq[Int] = {
      val (base, step) = atom.split("/") match {
        case Array(b)    => (b, 1)
        case Array(b, s) => (b, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron atom '$atom'")
      }
      val (a, b) = base match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-"); (x.toInt, y.toInt)
        case n => val v = n.toInt; (v, if (step == 1) v else hi)
      }
      require(a >= lo && b <= hi && a <= b, s"cron atom '$atom' out of [$lo,$hi]")
      a to b by step
    }
    f.split(",").toSeq.flatMap(rangeOf).toSet
  }
}
