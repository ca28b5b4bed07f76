package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the payload of the
  * single right row with the greatest `timeR <= timeL` for the same key
  * (ties broken by the greatest `tieR`).
  *
  * Spark has no built-in as-of join, and the naive form
  * (`left JOIN right ON key AND timeR <= timeL` + `row_number = 1`)
  * materializes every (left, right) pair before pruning — quadratic per
  * key, hopeless at 100 TB. This implementation instead UNIONs the two
  * sides, sorts once per key, and propagates the latest right payload
  * with a running `last(_, ignoreNulls)` window:
  *
  *   cost = one shuffle on `key` + one per-partition sort — O(n log n),
  *   identical to what a native sort-merge as-of operator would do.
  *
  * At equal timestamps the right row sorts *before* the left row, so the
  * match is inclusive (`<=`), matching standard as-of semantics
  * (e.g. pandas merge_asof, DuckDB ASOF JOIN).
  */
object AsOf {
  /** @param payload right-side columns to carry onto matching left rows
    * @param tieR    right-side tiebreak column (greatest wins at equal time)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyL: String, keyR: String,
      timeL: String, timeR: String,
      payload: Seq[String],
      tieR: String): DataFrame = {
    val rSchema = right.schema
    val payloadTypes = payload.map(p => p -> rSchema(p).dataType).toMap

    val lPart = left
      .withColumn("__key", col(keyL))
      .withColumn("__t", col(timeL))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(rSchema(tieR).dataType))
    val lFull = payload.foldLeft(lPart) { (df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(payloadTypes(p)))
    }

    val rCols = Seq(
      col(keyR).as("__key"), col(timeR).as("__t"),
      lit(0).as("__side"), col(tieR).as("__tie")) ++
      payload.map(p => col(p).as(s"__p_$p")) ++
      left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val rFull = right.select(rCols: _*).select(lFull.columns.map(col): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = payload.foldLeft(lFull.unionByName(rFull)) { (df, p) =>
      df.withColumn(p, last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }

    joined
      .filter(col("__side") === 1)
      .drop((Seq("__key", "__t", "__side", "__tie") ++ payload.map(p => s"__p_$p")): _*)
  }
}
