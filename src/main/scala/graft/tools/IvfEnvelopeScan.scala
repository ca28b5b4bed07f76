package graft.tools

import graft.operators.Similarity

/** Dev diagnostic: scan IVF geometries (nprobe at K=16) for FULL output
  * equality with the exact top-5 (q41) at each fixture — the measurement
  * that sizes q60's verified-SF oracle envelope (the q42/q84 protocol:
  * the oracle is exact only where the candidate set provably contains
  * the full true top-5 at every shipped fixture).
  *
  * `runMain graft.tools.IvfEnvelopeScan [sfDir ...]`
  */
object IvfEnvelopeScan {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.LocalSession()
    graft.functions.GraftFunctions.register(spark)
    for (dir <- dirs) {
      val exact = Similarity.q41.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      for (nprobe <- Seq(4, 6, 8, 10, 12, 16)) {
        val em = graft.Tables(spark, dir).embeddings
        val got = Similarity.ivfTopK(em, k = 16, nprobe = nprobe, maxTrain = 65536L)
          .orderBy(org.apache.spark.sql.functions.col("qid"),
            org.apache.spark.sql.functions.col("rk"))
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
        val eq = got == exact
        val idRecall = {
          val e = exact.map(t => (t._1, t._3)).toSet
          val g = got.map(t => (t._1, t._3)).toSet
          (e & g).size.toDouble / e.size
        }
        println(f"IVF-ENVELOPE dir=$dir nprobe=$nprobe exactEqual=$eq recall=$idRecall%.3f")
      }
    }
    spark.stop()
  }
}
