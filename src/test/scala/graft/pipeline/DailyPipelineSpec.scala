package graft.pipeline

import graft.SparkTestBase
import scala.collection.mutable

class DailyPipelineSpec extends SparkTestBase {
  import Pipeline._

  test("happy path: polls until ready, runs the job, notifies success") {
    val notes = mutable.Buffer[String]()
    val readiness = Iterator[PollStatus](StillRunning, StillRunning, Done)
    val out = DailyPipeline.run(spark, sf0001, () => readiness.next(), notes.+=(_))
    assert(out.isSuccess && out.get > 0)
    assert(notes.toSeq.exists(_.startsWith("success:")))
  }

  test("external feed failure routes to the failure notification only") {
    val notes = mutable.Buffer[String]()
    val out = DailyPipeline.run(spark, sf0001,
      () => FailedPoll("conclusion=failure"), notes.+=(_))
    assert(out.isFailure)
    assert(notes.toSeq.count(_.startsWith("failure:")) == 1)
    assert(!notes.exists(_.startsWith("success:")))
  }

  test("daily pipeline senses a landed feed through a named connection") {
    val dir = java.nio.file.Files.createTempDirectory("dailyfeed")
    Connections.register("daily_feed_spec", Connection(dir.toString))
    val notes = mutable.Buffer[String]()
    val probe = DailyPipeline.landedFeedReadiness("daily_feed_spec")
    // the feed "lands" (another writer) after the first pending poke
    var pokes = 0
    val readiness = () => {
      pokes += 1
      if (pokes == 2)
        java.nio.file.Files.write(dir.resolve("part-00000.json"),
          "{}".getBytes("UTF-8"))
      probe()
    }
    val out = DailyPipeline.run(spark, sf0001, readiness, notes.+=(_))
    assert(out.isSuccess && out.get > 0)
    assert(pokes >= 2, "sensor must have pended at least once before the feed landed")
    assert(notes.toSeq.exists(_.startsWith("success:")))
    Connections.remove("daily_feed_spec")
  }

  test("job failure after successful poll exhausts retries then notifies failure") {
    val notes = mutable.Buffer[String]()
    val out = DailyPipeline.run(spark, "/nonexistent/dir",
      () => Done, notes.+=(_))
    assert(out.isFailure)
    assert(notes.toSeq.count(_.startsWith("failure:")) == 1)
  }
}
