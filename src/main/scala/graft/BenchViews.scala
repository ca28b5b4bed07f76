package graft

import org.apache.spark.sql.SparkSession

/** The memoized materialized views that `Bench` times as explicit
  * `view_*` line items (invalidate + recompute — see Bench's scaladoc):
  * ONE registry shared by Bench, TimeQuery and the anti-flap remeasure
  * pass, so "what counts as the view pipeline" can never drift between
  * the official bench and the evidence tooling that adjudicates its
  * over-budget flags. Each entry is (invalidate, compute-to-completion).
  */
object BenchViews {
  final case class ViewDef(invalidate: () => Unit, compute: () => Long)

  def entries(spark: SparkSession, sfDir: String): Seq[(String, ViewDef)] = Seq(
    "view_cluster_labels" -> ViewDef(
      () => operators.Dedup.labelCache.invalidate(spark, sfDir),
      () => operators.Dedup.clusterLabels(spark, sfDir).count()),
    "view_neardup_pairs" -> ViewDef(
      () => operators.Similarity.pairsCache.invalidate(spark, sfDir),
      () => operators.Similarity.neardupPairs(spark, sfDir).count()),
    "view_copurchase_edges" -> ViewDef(
      () => operators.Analytic.edgeCache.invalidate(spark, sfDir),
      () => operators.Analytic.coPurchaseEdges(spark, sfDir).count()))
}
