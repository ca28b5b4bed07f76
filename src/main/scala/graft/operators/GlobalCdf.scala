package graft.operators

import graft.Materialize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sums over a TOTAL order — the ECDF
  * primitive: running totals of weight columns in sort order without a
  * single-partition window, generalizing [[GlobalRank]]'s two-pass rank
  * from prefix COUNTS to prefix SUMS.
  *
  *  1. `repartitionByRange` on the sort key (identical keys never
  *     straddle a boundary) + `sortWithinPartitions`;
  *  2. in-partition running sums — a window PARTITIONED by the physical
  *     partition id (distributed; the workload guard's banned shape is
  *     the empty partitionSpec);
  *  3. per-partition totals → driver prefix offsets (≤
  *     `spark.sql.shuffle.partitions` rows per weight — the bounded
  *     model state of GlobalRank's offsets) → broadcast-joined back:
  *     global prefix = offset + local running sum.
  *
  * Exactness requires INTEGER/LONG weights (each weight column must
  * aggregate to LongType — the offsets pass reads per-partition totals
  * with `getLong`, so a DecimalType weight would throw, and float
  * weights would reintroduce reduction-order drift; scale decimals to
  * integer micro-units first, the q142-cents pattern). */
object GlobalCdf {

  private val pidCol = "__graft_cdf_pid"

  /** Adds one `name` column per (name, weight) with the exact inclusive
    * running total of `weight` over `sortCols`; also returns each
    * weight's grand total (free from the offset pass). `sortCols` must
    * be a total order over ROWS with distinct keys (aggregate to
    * distinct keys first), or in-key row order would be partition-
    * dependent. */
  def withRunningTotals(df: DataFrame, sortCols: Seq[Column],
      weights: Seq[(String, Column)]): (DataFrame, Map[String, Long]) = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val local = Materialize.cut(
      df.repartitionByRange(parts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn(pidCol, spark_partition_id()))
    val w = Window.partitionBy(col(pidCol)).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = weights.foldLeft(local) { case (acc, (name, weight)) =>
      acc.withColumn(name, sum(weight).over(w))
    }
    val aggCols = weights.map { case (name, weight) => sum(weight).as(name) }
    val totalsDf = local.groupBy(col(pidCol)).agg(aggCols.head, aggCols.tail: _*)
    // loud precondition (the scaladoc's integer-weights rule): the
    // offsets pass reads per-partition totals with getLong, so a
    // decimal/double-summing weight must fail with a message here, not
    // a ClassCastException mid-collect
    totalsDf.schema.fields.drop(1).foreach { f =>
      require(f.dataType == org.apache.spark.sql.types.LongType,
        s"GlobalCdf weight '${f.name}' must sum to LongType, got ${f.dataType} — " +
          "scale to integer micro-units first (the q142-cents pattern)")
    }
    val totalsRows = totalsDf
      .collect()
      .map(r => r.getInt(0) -> weights.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    var acc = weights.map(_ => 0L)
    val offsets = totalsRows.map { case (pid, sums) =>
      val row = (pid, acc)
      acc = acc.zip(sums).map { case (a, s) => a + s }
      row
    }.toSeq
    val grand = weights.map(_._1).zip(acc).toMap
    import spark.implicits._
    val offCols = weights.map { case (name, _) => s"__graft_off_$name" }
    val offDf = offsets.toDF(pidCol, "__graft_offs")
      .select(col(pidCol) +: offCols.zipWithIndex.map { case (n, i) =>
        col("__graft_offs").getItem(i).as(n) }: _*)
    val out = weights.map(_._1).foldLeft(
      run.join(broadcast(offDf), pidCol)) { case (acc2, name) =>
        acc2.withColumn(name, col(name) + col(s"__graft_off_$name"))
      }
      .drop(pidCol)
      .drop(offCols: _*)
    (out, grand)
  }
}
