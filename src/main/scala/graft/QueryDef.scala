package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when the
  * semantics are faithfully ANSI-SQL-expressible) an equivalent DuckDB
  * oracle statement used by the driver's hash-compare at sf0.01.
  *
  * Oracle-authoring invariants (see SURVEY.md §5): total ORDER BY,
  * explicit NULLS FIRST/LAST matching Spark's defaults (ASC → nulls first,
  * DESC → nulls last), identical output column names and types, no
  * order-dependent float reductions (use [[Det]]).
  *
  * `fn` is NOT guaranteed side-effect-free: queries that materialize
  * ([[Materialize.cut]]) or rank globally
  * ([[operators.GlobalRank.withRowNumber]] — eager by design) run real
  * Spark jobs while BUILDING the returned frame, and the frame then reads
  * a truncated checkpoint plan. Plan-only tooling (Explain, PlanSpec)
  * must inspect the pre-checkpoint `*Pipeline` methods, never assume
  * constructing the DataFrame was free.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    twins: Seq[String] = Nil)

/** A module contributing queries to [[SparkEntry]]. */
trait QueryPack {
  def queries: Seq[QueryDef]
}
