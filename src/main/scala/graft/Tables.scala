package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp. Read the raw int64 nanos and truncate to
    * microseconds (integer division — no double round-trip, which would
    * lose precision above 2^53). Matches DuckDB's ns→µs CAST truncation,
    * keeping oracle comparisons consistent. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
