package graft

import org.apache.spark.sql.SparkSession

/** One shared local-session builder for the driver mains (Verify, Bench,
  * Explain) and dev tools (TimeQuery, Probe): `SPARK_GRAFT_CPUS`-sized
  * local master with matching shuffle partitions, UTC session timezone,
  * AQE on, UI off, WARN logs — so every entry point measures and verifies
  * under identical engine settings. */
object LocalSession {
  def apply(defaultCpus: String = "32",
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing floors partitions at 1 MB of shuffle BYTES, which
      // starves CPU-dense stages whose rows are small but expensive
      // (window rank over shingle rows: 4 tasks; Jaccard array_intersect
      // verify: 2 of 32 — stage-profiled round 6). 64 KB keeps such
      // stages near the core count at fixture scale; real-deployment
      // shuffles are orders of magnitude past either floor, where
      // parallelismFirst governs anyway.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
