package graft

import org.apache.spark.sql.DataFrame

/** Deploy-mode switch for pipeline materializations.
  *
  * Operator pipelines cut lineage wherever a subtree feeds multiple
  * consumers or a self-join (Spark does not dedupe identical subplans),
  * before the total sort of a tiny result (range partitioning samples its
  * child), and per iteration of the label-propagation loop. HOW the cut
  * is realized is a deployment decision, not an operator decision:
  *
  *  - `local` (default): `localCheckpoint()` — eager, stores blocks on
  *    executors. The right local-mode idiom (no DFS round-trip), but
  *    executor-pinned blocks are LOST on executor death, which on a
  *    long-running 1000-executor job turns one preempted container into
  *    recompute-from-nothing.
  *  - `reliable`: `checkpoint()` to the SparkContext checkpoint
  *    directory (HDFS/S3 in a real deployment) — survives executor loss;
  *    the setting a 100 TB run should use.
  *
  * Both are eager, truncate lineage identically, and leave plan shape
  * guards untouched (those inspect the pre-checkpoint `*Pipeline`
  * methods). Selected once per session via the runtime conf key
  * [[Materialize.ModeKey]] ("spark.graft.materialize"), so the same query
  * code serves both deployments — MaterializeSpec asserts result
  * equality across modes.
  */
object Materialize {
  /** Runtime conf key: "local" (default) or "reliable". */
  val ModeKey = "spark.graft.materialize"

  /** Eagerly materialize `df` and truncate its lineage, per the
    * session's configured mode. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint()
      case "reliable" =>
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$ModeKey=reliable requires SparkContext.setCheckpointDir " +
            "(an HDFS/S3 path in a real deployment)")
        df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be 'local' or 'reliable', got '$other'")
    }
  }

  /** Postfix syntax for pipeline chains: `df.cut()` ≡ `Materialize.cut(df)`. */
  implicit final class CutSyntax(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame = Materialize.cut(df)
  }
}
