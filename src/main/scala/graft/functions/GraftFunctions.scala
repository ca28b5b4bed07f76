package graft.functions

import graft.functions.expressions.{DotProduct, SimHash64}
import org.apache.spark.sql.SparkSession

/** Registration point for the library's native Catalyst expressions —
  * callable from both the Column API (`call_function`) and SQL. Idempotent;
  * call once per session before using [[VectorOps.dotNative]]. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => {
        require(exprs.length == 2, "graft_dot(a, b) takes two arguments")
        DotProduct(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64",
      exprs => {
        require(exprs.length == 1, "graft_simhash64(tokens) takes one argument")
        SimHash64(exprs.head)
      },
      "built-in")
  }
}
