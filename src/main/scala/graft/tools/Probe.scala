package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev scratch main for stage-level timing experiments. Current form:
  * profiles the embedding near-dup auto path on a replicated corpus
  * (`runMain graft.tools.Probe <sfDir> <factor>`), printing every stage
  * over 1 s — where does the f=16 wall actually go? */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val f = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = graft.LocalSession()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val secs = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1000.0).getOrElse(-1.0)
        if (secs > 1.0) println(
          f"PROBE-STAGE ${i.stageId}%5d tasks=${i.numTasks}%3d wall=$secs%7.2f " +
            f"in=${i.taskMetrics.inputMetrics.recordsRead}%11d " +
            f"sRead=${i.taskMetrics.shuffleReadMetrics.recordsRead}%11d " +
            f"sWrite=${i.taskMetrics.shuffleWriteMetrics.recordsWritten}%11d  " +
            i.name.take(60))
      }
    })
    graft.functions.GraftFunctions.register(spark)
    if (args.contains("docs")) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val docs = (
        if (f == 1) base
        else base
          .withColumn("i", explode(sequence(lit(0), lit(f - 1))))
          .select(
            (col("doc_id") * f + col("i")).as("doc_id"),
            when(col("i") === 0, col("text"))
              .otherwise(concat(col("text"), lit(" v"), col("i"))).as("text"))
      ).localCheckpoint()
      println("PROBE docs=" + docs.count())
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.exactPairs(docs).localCheckpoint()
      println(f"PROBE pairs=${pairs.count()} t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
      return
    }
    val emBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val em = (
      if (f == 1) emBase
      else emBase
        .withColumn("i", explode(sequence(lit(0), lit(f - 1))))
        .select(
          (col("vec_id") * f + col("i")).as("vec_id"),
          transform(col("embedding"), (x, idx) =>
            when(idx === 0,
              x + (col("i").cast("double") * lit(0.001)).cast("float"))
              .otherwise(x)).as("embedding"))
    ).localCheckpoint()
    println("PROBE vecs=" + em.count())
    val t0 = System.nanoTime()
    val pairs = Similarity.neardupPairsAuto(em).localCheckpoint()
    println(f"PROBE pairs=${pairs.count()} t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
