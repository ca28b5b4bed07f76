package graft.tools

import graft.LocalSession
import graft.operators.Dedup

/** Dev probe: time the view_cluster_labels recomputation under the plain
  * neighbor-round fixpoint vs pointer doubling, printing wall seconds and
  * the converged round count for each sample — the measurement behind the
  * view's round-strategy choice (see computeClusterLabels scaladoc). */
object LabelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession()
    // warm scan/codegen paths
    Dedup.labelCache.invalidate(spark, sfDir)
    Dedup.clusterLabels(spark, sfDir).count()
    for (i <- 1 to 3) {
      Dedup.labelCache.invalidate(spark, sfDir)
      val t0 = System.nanoTime()
      Dedup.clusterLabels(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE view_cluster_labels sample=$i sec=$s%.2f rounds=${Dedup.lastPropagationRounds.get()}")
    }
    spark.stop()
  }
}
