package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Input-parallelism floor for compute-heavy pipeline heads.
  *
  * Operator pipelines inherit the input's partitioning into everything
  * before their first exchange — and for the pair pipelines that is the
  * expensive part: per-row shingle/minhash/LSH hashing and the candidate
  * join's partial aggregate. A NARROW input therefore serializes the
  * heaviest map work: Spark's split planner floors file splits at the
  * 4 MB open cost, so a fixture-sized parquet (or any small-file ingest,
  * or a replicate-by-explode of one) plans 1–2 partitions and leaves the
  * other 30 cores idle — measured as a 4.3× wall regression on the f=16
  * near-dup probe before this existed (BASELINE.md round 6).
  *
  * [[ensure]] raises such inputs to the cluster default with a
  * deterministic hash repartition on the caller's key (never
  * round-robin — task retries must land rows identically). Wide inputs —
  * any real deployment's multi-split scan — pass through untouched, and
  * streaming frames are left alone (micro-batch parallelism is the
  * scheduler's job; `.rdd` is undefined on them anyway). Map-only gates
  * deliberately do NOT use this: adding an exchange to a scan-shaped
  * query trades its zero-shuffle plan for parallelism the scan already
  * has at any real input size (and PlanSpec pins those shapes).
  *
  * COST CAVEAT: reading the width goes through `df.rdd`, which
  * instantiates the physical plan for the whole upstream frame (outside
  * AQE's final re-plan). That is free on this operator's intended
  * inputs — materialized cuts ([[Materialize.cut]]) and file scans,
  * where the RDD is the checkpoint's block handle or the split plan —
  * but it would eagerly plan (not run) an arbitrary unmaterialized
  * frame. Call it on pipeline HEADS (scans/cuts), not on derived
  * frames mid-plan. */
object Parallelism {
  def ensure(df: DataFrame, keys: Column*): DataFrame = {
    if (df.isStreaming) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want, keys: _*) else df
  }
}
