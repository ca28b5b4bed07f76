package graft

import org.apache.spark.sql.functions._

/** The deploy-mode materialization switch ([[Materialize]]): `local`
  * (localCheckpoint — executor blocks, the local-mode idiom) vs
  * `reliable` (SparkContext checkpoint dir — survives executor loss, the
  * cluster setting). Same results, same eager truncation, selected per
  * session via runtime conf. Uses `newSession()` so the conf flip cannot
  * leak into suites sharing the JVM-wide session. */
class MaterializeSpec extends SparkTestBase {

  test("local and reliable modes produce identical results; reliable writes the checkpoint dir") {
    val s2 = spark.newSession()
    import s2.implicits._
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    s2.sparkContext.setCheckpointDir(ckptDir)
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")

    val localCut = Materialize.cut(df.groupBy(col("v")).count())
    s2.conf.set(Materialize.ModeKey, "reliable")
    try {
      val reliableCut = Materialize.cut(df.groupBy(col("v")).count())
      assert(reliableCut.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        localCut.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      assert(new java.io.File(ckptDir).listFiles.nonEmpty,
        "reliable mode must write RDD checkpoint files to the checkpoint dir")
    } finally s2.conf.set(Materialize.ModeKey, "local")
  }

  test("an operator pipeline runs unchanged under reliable mode") {
    val s2 = spark.newSession()
    import s2.implicits._
    s2.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt2").toString)
    // a 0-1-2-3-4 chain + an isolated node, through the production
    // label-propagation loop (which cuts per round)
    val ids = (0L to 5L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    def labels(): Set[(Long, Long)] =
      operators.Dedup.propagateMinLabels(ids, pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = labels()
    s2.conf.set(Materialize.ModeKey, "reliable")
    try assert(labels() == local)
    finally s2.conf.set(Materialize.ModeKey, "local")
    assert(local == Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 5L)))
  }

  test("unknown mode fails loudly") {
    val s2 = spark.newSession()
    import s2.implicits._
    s2.conf.set(Materialize.ModeKey, "bogus")
    try {
      val e = intercept[IllegalArgumentException] {
        Materialize.cut(Seq(1L).toDF("x"))
      }
      assert(e.getMessage.contains(Materialize.ModeKey))
    } finally s2.conf.set(Materialize.ModeKey, "local")
  }
}
