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
    // ORDER MATTERS for what each line item measures: a view that reads
    // another memoized view is listed AFTER its dependency, so its
    // measured recomputation reads the (still-cached) dependency and
    // times ONLY its own pipeline — the dependency's build is its own
    // line item. view_exact_pairs feeds view_cluster_labels;
    // view_neardup_pairs feeds view_embed_labels (round 17).
    "view_shingles" -> ViewDef(
      () => operators.Dedup.shingleCache.invalidate(spark, sfDir),
      () => operators.Dedup.docShingleArrays(spark, sfDir).count()),
    "view_exact_pairs" -> ViewDef(
      () => operators.Dedup.pairCache.invalidate(spark, sfDir),
      () => operators.Dedup.exactPairsView(spark, sfDir).count()),
    "view_cluster_labels" -> ViewDef(
      () => operators.Dedup.labelCache.invalidate(spark, sfDir),
      () => operators.Dedup.clusterLabels(spark, sfDir).count()),
    "view_neardup_pairs" -> ViewDef(
      () => operators.Similarity.pairsCache.invalidate(spark, sfDir),
      () => operators.Similarity.neardupPairs(spark, sfDir).count()),
    "view_embed_labels" -> ViewDef(
      () => operators.Similarity.embedLabelCache.invalidate(spark, sfDir),
      () => operators.Similarity.embedClusterLabels(spark, sfDir).count()),
    "view_copurchase_support" -> ViewDef(
      () => operators.Analytic.supportCache.invalidate(spark, sfDir),
      () => operators.Analytic.coPurchaseSupport(spark, sfDir).count()),
    // the edge view projects the support view — listed after it
    "view_copurchase_edges" -> ViewDef(
      () => operators.Analytic.edgeCache.invalidate(spark, sfDir),
      () => operators.Analytic.coPurchaseEdges(spark, sfDir).count()),
    // adj reads the edge view — listed after it (see the order note)
    "view_copurchase_adj" -> ViewDef(
      () => operators.Analytic.adjCache.invalidate(spark, sfDir),
      () => operators.Analytic.copurchaseAdj(spark, sfDir)._2.count()),
    "view_trade_edges" -> ViewDef(
      () => operators.Analytic.tradeEdgeCache.invalidate(spark, sfDir),
      () => operators.Analytic.tradeEdgesView(spark, sfDir).count()))
}
