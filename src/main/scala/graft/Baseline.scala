package graft

/** The recorded per-query quiet-run baseline (BASELINE.md's table in
  * machine-readable form, shipped as a classpath resource so `Bench`
  * finds it regardless of working directory). The perf contract is 2×
  * per query against these values; rows change only with a documented
  * reason in BASELINE.md. */
object Baseline {
  lazy val seconds: Map[String, Double] = {
    val in = getClass.getResourceAsStream("/graft/baseline_queries.tsv")
    require(in != null, "missing resource /graft/baseline_queries.tsv")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(name, sec) = l.split("\t")
        name -> sec.toDouble
      }.toMap
    finally in.close()
  }
}
