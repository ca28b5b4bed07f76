package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed access to the fixture tables (TPC-H-ish star schema + events +
  * documents/embeddings; see /root/repo/FIXTURES.md).
  *
  * Scale design: every loader is a plain columnar parquet scan, so Catalyst
  * pushes filters and prunes columns down to the file reader (DataSource V2,
  * vectorized). At 100 TB the same code path works unchanged — partition
  * discovery, predicate pushdown and `spark.sql.files.maxPartitionBytes`
  * sizing are all handled by the source, not by this library.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** Schema-adaptive load of `events`, canonicalising `ts` to
    * `TimestampType` (µs, session TZ pinned UTC) whatever the fixture's
    * physical encoding:
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 refuses to read it as a
    *    timestamp, so with `nanosAsLong` it surfaces as int64 nanos —
    *    truncate with integer division (no double round-trip, which would
    *    lose precision above 2^53), matching DuckDB's ns→µs CAST.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=0): Spark reads
    *    TIMESTAMP_NTZ — a plain cast to TimestampType is value-identical
    *    under the UTC session TZ.
    *  - already TimestampType: pass through.
    *
    * Branching on the loaded schema (not a baked-in assumption) means a
    * regenerated fixture changes nothing downstream; `TablesSchemaSpec`
    * canaries the physical schema of every loader. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected int64 nanos, TIMESTAMP_NTZ or TIMESTAMP)")
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
