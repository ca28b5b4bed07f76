package graft

import org.apache.spark.sql.functions._

class ParallelismSpec extends SparkTestBase {
  import spark.implicits._

  test("narrow inputs rise to the cluster default; wide inputs pass through untouched") {
    val want = spark.sparkContext.defaultParallelism
    val narrow = (1L to 100L).toDF("id").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val raised = Parallelism.ensure(narrow, col("id"))
    assert(raised.rdd.getNumPartitions == want)
    // content is only moved, never changed
    assert(raised.collect().map(_.getLong(0)).sorted.toSeq == (1L to 100L))
    // already-wide frames keep their plan (no extra exchange)
    val wide = (1L to 100L).toDF("id").repartition(want + 4, col("id"))
    assert(Parallelism.ensure(wide, col("id")) eq wide)
  }

  test("the hash repartition is deterministic: same rows land in the same partitions") {
    val df = (1L to 1000L).toDF("id").coalesce(1)
    def layout() = Parallelism.ensure(df, col("id"))
      .select(col("id"), spark_partition_id().as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(layout() == layout(), "task retries must land rows identically")
  }

  test("streaming frames are left alone") {
    val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[Long]
    val stream = in.toDF()
    assert(Parallelism.ensure(stream, col("value")) eq stream)
  }
}
