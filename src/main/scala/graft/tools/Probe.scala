package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev scratch main for stage-level timing experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.LocalSession()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    graft.functions.GraftFunctions.register(spark)
    val docs = Tables(spark, sfDir).documents
    val shArr = time("hshArr checkpoint") { Dedup.hashedShingleArray(docs).localCheckpoint() }
    val sh = shArr.select(col("doc_id"), explode(col("shs")).as("s"))
    time("sh count") { println("  rows=" + sh.count()) }
    val cands = time("prefix cands build+checkpoint") {
      Dedup.prefixCandidates(shArr, 1, 2).localCheckpoint()
    }
    time("cands count") { println("  cands=" + cands.count()) }
    val a = shArr.select(col("doc_id").as("d1"), col("shs").as("hs1"))
    val b = shArr.select(col("doc_id").as("d2"), col("shs").as("hs2"))
    val joined = cands.join(a, "d1").join(b, "d2")
    time("verify: join only") { println("  j=" + joined.count()) }
    val withInter = joined
      .withColumn("inter", size(array_intersect(col("hs1"), col("hs2"))))
    time("verify: join+intersect") {
      println("  sum=" + withInter.agg(sum(col("inter"))).head.getLong(0))
    }
    time("verify: full") {
      Dedup.jaccardForCandidates(cands, shArr)
        .filter(col("jac") >= 0.5).orderBy(col("d1"), col("d2"))
        .write.format("noop").mode("overwrite").save()
    }
    time("verify: full again") {
      Dedup.jaccardForCandidates(cands, shArr)
        .filter(col("jac") >= 0.5).orderBy(col("d1"), col("d2"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
