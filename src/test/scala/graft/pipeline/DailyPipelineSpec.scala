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

  test("job failure after successful poll exhausts retries then notifies failure") {
    val notes = mutable.Buffer[String]()
    val out = DailyPipeline.run(spark, "/nonexistent/dir",
      () => Done, notes.+=(_))
    assert(out.isFailure)
    assert(notes.toSeq.count(_.startsWith("failure:")) == 1)
  }
}
