package graft

import graft.operators.{Dedup, Relational, Similarity}

/** Plan-shape regression tests: these assert the *physical* properties
  * that make the queries scale — filters reaching the parquet scan,
  * column pruning, dimension broadcasts, top-k short-circuits, native
  * expressions in hot loops. A correctness-green query that loses one of
  * these properties would still pass the oracle but fall over at 100 TB;
  * this suite is the guard-rail. */
class PlanSpec extends SparkTestBase {

  private def plan(q: QueryDef): String =
    q.fn(spark, sf0001).queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan(Relational.q01)
    assert(p.contains("PushedFilters:") && p.contains("LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
  }

  test("q01: scan is column-pruned (no l_orderkey read)") {
    val p = plan(Relational.q01)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
    assert(readSchema.contains("l_returnflag"))
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan(Relational.q03)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected nation+region broadcasts:\n$p")
  }

  test("q04: order-by-limit compiles to TakeOrderedAndProject (no full sort)") {
    val p = plan(Relational.q04)
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$p")
  }

  test("q44: hot loop uses the codegen'd graft_dot, not interpreted HOF lambdas") {
    val p = plan(Similarity.q44)
    assert(p.contains("graft_dot"), "native dot expression not in plan")
    assert(!p.contains("zip_with"), "interpreted HOF dot product back in the hot path")
  }

  test("q32: LSH candidate generation is an equi-join (hash/merge), never a cross product") {
    val p = plan(Dedup.q32)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay an equi-join:\n$p")
  }
}
