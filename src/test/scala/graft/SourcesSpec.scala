package graft

import org.apache.spark.sql.functions._

/** Non-parquet batch source/sink round-trips: the engine is
  * format-agnostic by construction (every operator consumes a DataFrame),
  * so these prove the remaining `spark.read`/`write` surfaces — JSON
  * lines and ORC — preserve schema and values, and that ORC scans keep
  * predicate pushdown (the property the parquet PlanSpec asserts). CSV
  * has its own round-trip in StreamOpsSpec. */
class SourcesSpec extends SparkTestBase {

  test("JSON-lines source round-trips documents with schema intact") {
    val dir = java.nio.file.Files.createTempDirectory("jsonsrc").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.write.mode("overwrite").json(s"$dir/docs")
    // schema-on-read: explicit schema (production path — inference costs
    // an extra pass and can widen types)
    val back = spark.read.schema(docs.schema).json(s"$dir/docs")
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("ORC source round-trips and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("orcsrc").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    orders.write.mode("overwrite").orc(s"$dir/orders")
    val back = spark.read.orc(s"$dir/orders")
    assert(back.count() == orders.count())
    val q = back.filter(col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(o_totalprice"),
      s"ORC scan did not push the filter:\n$plan")
    val expected = orders.filter(col("o_totalprice") > 100000.0).count()
    assert(q.count() == expected)
  }
}
