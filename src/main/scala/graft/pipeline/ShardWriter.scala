package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard output writer: the sink-side operator of a data-curation
  * pipeline. A 100 TB corpus is consumed by a data loader that wants
  * (a) a KNOWN shard count, (b) BALANCED shard sizes, (c) optionally a
  * deterministic within-shard order, and (d) split/partition directories
  * it can glob — none of which a plain `df.write.parquet` guarantees.
  *
  * Scale design: shard assignment is `pmod(xxhash64(key), n)` — a pure
  * map-side computation; `repartition(n, shard)` is the single full
  * shuffle (hash-balanced because the key hash is uniform, independent of
  * input skew), and `sortWithinPartitions` costs a per-shard sort with no
  * extra exchange. `partitionBy(split)` nests Hive-style split
  * directories so train/val/test are separate globs of the same write.
  */
object ShardWriter {

  /** Adds the deterministic shard id: `pmod(xxhash64(keyCol), nShards)`. */
  def withShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", pmod(xxhash64(col(keyCol)), lit(nShards)))

  /** Writes `df` as `nShards` hash-balanced parquet shards under `path`,
    * each shard internally sorted by `sortCol` (deterministic loader
    * order). If `splitCol` is set, shards nest under Hive-style
    * `splitCol=<value>/` directories. */
  def writeShards(df: DataFrame, path: String, keyCol: String,
      nShards: Int, sortCol: String, splitCol: Option[String] = None): Unit = {
    val sharded = withShard(df, keyCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(sortCol))
    val writer = sharded.write.mode("overwrite")
    splitCol match {
      case Some(sc) => writer.partitionBy(sc).parquet(path)
      case None => writer.parquet(path)
    }
  }
}
