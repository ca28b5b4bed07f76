package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ShardWriterSpec extends SparkTestBase {
  import spark.implicits._

  test("shards are deterministic, complete, and balanced within 3x of ideal") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = 8
    val a = ShardWriter.withShard(docs, "doc_id", n)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = ShardWriter.withShard(docs, "doc_id", n)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "shard assignment must be a pure function of the key")
    assert(a.values.toSet.subsetOf((0 until n).toSet))
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.sum == docs.count())
    val ideal = docs.count().toDouble / n
    assert(sizes.max <= ideal * 3, s"skewed shards: $sizes")
  }

  test("writeShards emits per-split directories with sorted, complete shards") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("split",
        when(col("doc_id") % 10 < 8, "train").otherwise("val"))
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    ShardWriter.writeShards(docs, out, keyCol = "doc_id", nShards = 4,
      sortCol = "doc_id", splitCol = Some("split"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("split=train", "split=val"), s"got $dirs")
    // the shard count is a loader-facing contract, enforced by layout:
    // each split nests shard=<k> directories matching the data's shard
    // set exactly, and every shard directory holds exactly ONE parquet
    // file (a shard's rows are co-located in a single task)
    val expected = ShardWriter.withShard(docs, "doc_id", 4)
      .select(col("split"), col("shard")).distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(expected.filter(_._1 == "train").map(_._2) == (0 until 4).toSet,
      "train should populate all 4 shards at this size")
    dirs.foreach { d =>
      val split = d.stripPrefix("split=")
      val shardDirs = new java.io.File(s"$out/$d").listFiles().filter(_.isDirectory)
      assert(shardDirs.map(_.getName).toSet ==
        expected.filter(_._1 == split).map(s => s"shard=${s._2}"),
        s"$d: shard dirs must match the data's shard set")
      shardDirs.foreach { sd =>
        val files = sd.listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        assert(files.length == 1, s"$sd: one file per shard, got ${files.length}")
      }
    }
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count(), "round-trip must be lossless")
    // pin the loader-facing type: partition-dir inference yields int32,
    // which must equal withShard's in-frame column type
    assert(back.schema("shard").dataType == org.apache.spark.sql.types.IntegerType,
      "read-back shard column must be int32, matching withShard")
    // within every parquet file, rows are sorted by doc_id (loader order)
    val perFile = back.select(input_file_name().as("f"), col("doc_id"))
      .collect().groupBy(_.getString(0)).values
    perFile.foreach { rows =>
      val ids = rows.map(_.getLong(1)).toSeq
      assert(ids == ids.sorted, "within-shard order must be the sort column")
    }
  }
}
