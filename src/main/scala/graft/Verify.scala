package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args: only dump queries whose name starts with
    // one of these prefixes (dev iteration on a new query; the driver
    // passes exactly two args, so its full dump is unchanged)
    val only = args.drop(2).toSet
    def selected(name: String): Boolean =
      only.isEmpty || only.exists(name.startsWith)
    // µs (not INT96) parquet timestamps → byte-identical types with the
    // DuckDB oracle's arrow output:
    val spark = LocalSession(defaultCpus = "4", extraConf =
      Map("spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS"))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // twin coverage for the deliberately oracle-less queries: each maps
    // to the oracle-checked queries that hash-verify its deterministic
    // surface (q50 → q82; q123 → q178/q184) — lets the driver's report
    // show those rows as twin-covered instead of bare no_oracle
    val twins = SparkEntry.twinOf
      .map { case (k, v) => s"${q(k)}: ${v.map(q).mkString("[", ",", "]")}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/twins.json"), twins)
    spark.stop()
  }
}
