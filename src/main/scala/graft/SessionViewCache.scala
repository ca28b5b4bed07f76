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
  * runner) that create and stop multiple sessions.
  *
  * An entry may hold SEVERAL frames produced by one build (the
  * degree + adjacency pair of a graph view) — one compute, one
  * invalidation unit, no mutable side-channel between two caches
  * (round-18 ADVICE: the previous two-cache + `var` scheme could cache
  * one build's adj with another build's deg under concurrent first
  * calls, and leaked the loser's checkpoints). */
private[graft] final class SessionViewCache {
  private val cache = TrieMap.empty[(SparkSession, String), Seq[DataFrame]]

  def getOrCompute(spark: SparkSession, dir: String)(compute: => DataFrame): DataFrame =
    getOrComputeAll(spark, dir)(Seq(compute)).head

  /** Multi-frame entry: `compute` returns every frame of one build; all
    * of them are cached (and their checkpoints kept) as one unit. */
  def getOrComputeAll(spark: SparkSession, dir: String)(
      compute: => Seq[DataFrame]): Seq[DataFrame] = {
    cache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) cache.remove(k)
    }
    // synchronized: TrieMap.getOrElseUpdate's by-name compute is not
    // atomic — concurrent first calls would each run the expensive,
    // checkpoint-registering build and the losers' files would leak.
    // The compute runs in an ISOLATED Materialize scope (interior
    // checkpoints GC'd once the final cuts land) that never donates the
    // kept checkpoints to an enclosing view's scope — the cache owns
    // them until invalidate()/app end (see Materialize.scoped).
    cache.synchronized {
      cache.getOrElseUpdate((spark, dir), Materialize.scopedAll(compute))
    }
  }

  /** Drops the entry so the next lookup recomputes — used by the bench
    * to measure the view COMPUTATION as its own line item. Frees the
    * dropped view's reliable checkpoint files (repeated
    * invalidate+recompute cycles must not accumulate DFS space). */
  def invalidate(spark: SparkSession, dir: String): Unit =
    cache.remove((spark, dir)).foreach(_.foreach(Materialize.release))
}
