package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[QueryPack]] in the library. Each pack entry carries
  * its Spark implementation and, when faithfully SQL-expressible, a
  * DuckDB oracle statement for the driver's sf0.01 hash-compare.
  */
object SparkEntry {
  /** All operator packs contributing queries. */
  def packs: Seq[QueryPack] = Seq(
    operators.Relational,
    operators.RelationalExt,
    operators.WindowOps,
    operators.Dedup,
    operators.SkewJoin,
    operators.Similarity,
    operators.TextOps,
    operators.Multimodal,
    operators.Curation,
    operators.Bucketed,
    operators.Partitioned,
    operators.Snapshots,
    operators.Analytic,
    operators.Layout,
    operators.Sources)

  def allQueries: Seq[QueryDef] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Twin coverage for the (deliberately) oracle-less queries: each
    * no-oracle query name → the oracle-CHECKED queries that hash-verify
    * its deterministic surface. Every no-oracle entry MUST declare at
    * least one green twin — `SparkEntrySpec` enforces the invariant, and
    * `Verify` dumps this map as `twins.json` next to `oracle_sql.json`
    * so the driver's report can show sketch rows as twin-covered rather
    * than bare `no_oracle`. */
  def twinOf: Map[String, Seq[String]] =
    allQueries.filter(q => q.oracle.isEmpty).map(q => q.name -> q.twins).toMap
}
