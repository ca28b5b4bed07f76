package graft.tools

import graft.SparkEntry

/** Dev utility: time individual named queries against a fixture dir
  * without running the whole bench.
  * `sbt "runMain graft.tools.TimeQuery /root/testdata/sf0.1 q33_jaccard_pairs ..."`
  * Pass a query twice to get a warm second number (fresh JVMs measure
  * codegen, not the query). `GRAFT_STAGE_LOG=1` additionally prints one
  * line per completed stage over 0.5 s (tasks, wall, input/shuffle
  * record counts) — the fastest way to see WHERE a pipeline's time
  * goes; this is what located the round-6 narrow-input parallelism
  * collapse (a 4e8-row stage running 2 of 32 tasks). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = graft.LocalSession()
    if (sys.env.contains("GRAFT_STAGE_LOG"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val secs = (for {a <- i.completionTime; b <- i.submissionTime}
            yield (a - b) / 1000.0).getOrElse(-1.0)
          if (secs > 0.5) println(
            f"STAGE ${i.stageId}%5d tasks=${i.numTasks}%3d wall=$secs%7.2f " +
              f"in=${i.taskMetrics.inputMetrics.recordsRead}%11d " +
              f"sRead=${i.taskMetrics.shuffleReadMetrics.recordsRead}%11d " +
              f"sWrite=${i.taskMetrics.shuffleWriteMetrics.recordsWritten}%11d  " +
              i.name.take(70))
        }
      })
    // warm up the scan/join/agg codepaths once, like Bench
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // view_* names time the Bench view line items (invalidate +
    // recompute, same BenchViews registry the official bench uses)
    val views = graft.BenchViews.entries(spark, sfDir).toMap
    names.foreach { n =>
      val t0 = System.nanoTime()
      views.get(n) match {
        case Some(v) => v.invalidate(); v.compute()
        case None => SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"TIMEQ $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
