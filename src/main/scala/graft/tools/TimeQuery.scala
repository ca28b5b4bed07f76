package graft.tools

import graft.SparkEntry

/** Dev utility: time individual named queries against a fixture dir
  * without running the whole bench.
  * `sbt "runMain graft.tools.TimeQuery /root/testdata/sf0.1 q33_jaccard_pairs ..."` */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = graft.LocalSession()
    // warm up the scan/join/agg codepaths once, like Bench
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"TIMEQ $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
