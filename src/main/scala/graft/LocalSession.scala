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
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
