package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Memoized materialized views keyed by (session, fixture dir): the
  * shared engine behind [[operators.Dedup.clusterLabels]] and
  * [[operators.Similarity.neardupPairs]]. The cached value is expected to
  * be an eagerly materialized checkpoint, so the cache holds handles, not
  * data copies. Entries of stopped sessions are evicted at lookup — a
  * cached handle pins its session and checkpoint RDD blocks for the JVM
  * lifetime otherwise, a slow leak in long-lived JVMs (e.g. the test
  * runner) that create and stop multiple sessions. */
private[graft] final class SessionViewCache {
  private val cache = TrieMap.empty[(SparkSession, String), DataFrame]

  def getOrCompute(spark: SparkSession, dir: String)(compute: => DataFrame): DataFrame = {
    cache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) cache.remove(k)
    }
    // scoped: interior reliable checkpoints of the view pipeline are
    // GC'd once the final cut lands (see Materialize's checkpoint-GC doc)
    cache.getOrElseUpdate((spark, dir), Materialize.scoped(compute))
  }

  /** Drops the entry so the next lookup recomputes — used by the bench
    * to measure the view COMPUTATION as its own line item. Frees the
    * dropped view's reliable checkpoint files (repeated
    * invalidate+recompute cycles must not accumulate DFS space). */
  def invalidate(spark: SparkSession, dir: String): Unit =
    cache.remove((spark, dir)).foreach(Materialize.release)
}
