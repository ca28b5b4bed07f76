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
  * shuffle, co-locating every row of a shard in one task (balanced
  * because the key hash is uniform, independent of input skew), and
  * `sortWithinPartitions` costs a per-shard sort with no extra exchange.
  * The shard-count contract is enforced by LAYOUT, not by the
  * partitioner: the write nests Hive-style `shard=<k>/` directories, so
  * each shard directory holds exactly ONE parquet file (all of a shard's
  * rows sit in a single task — equal shuffle keys never split). Relying
  * on the row partitioner alone is wrong in both modes: hashing the
  * already-dense shard id is not a bijection (~1/e of partitions land
  * empty, others hold 2-3 shards), and range partitioning is sampled, so
  * n distinct values can still collapse into n−1 partitions.
  * `partitionBy(split, shard)` nests split directories above the shards
  * so train/val/test are separate globs of the same write.
  */
object ShardWriter {

  /** Adds the deterministic shard id: `pmod(xxhash64(keyCol), nShards)`.
    * Typed INT to match Hive-style partition-directory inference — the
    * written `shard=<k>/` directories read back as an int32 partition
    * column, so the in-frame column must be int32 too or loaders that
    * union pre-write and read-back frames (or bind `getLong`) break on
    * the width mismatch. */
  def withShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    df.withColumn("shard",
      pmod(xxhash64(col(keyCol)), lit(nShards)).cast("int"))

  /** Writes `df` as `nShards` hash-balanced parquet shards under `path`:
    * one `shard=<k>/` directory per shard, each holding exactly one file,
    * internally sorted by `sortCol` (deterministic loader order). If
    * `splitCol` is set, shard directories nest under Hive-style
    * `splitCol=<value>/` directories. */
  def writeShards(df: DataFrame, path: String, keyCol: String,
      nShards: Int, sortCol: String, splitCol: Option[String] = None): Unit = {
    val sharded = withShard(df, keyCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(sortCol))
    val writer = sharded.write.mode("overwrite")
    splitCol match {
      case Some(sc) => writer.partitionBy(sc, "shard").parquet(path)
      case None => writer.partitionBy("shard").parquet(path)
    }
  }
}
