package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkTestBase {

  test("extensions-injected functions are callable from plain SQL") {
    spark // force base session (and its SparkContext) up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val dot = s2.sql(
        "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
          "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
        .collect()(0).getDouble(0)
      assert(dot == 11.0)
      val sig = s2.sql(
        "SELECT graft_simhash64(array('a', 'b', 'a')) AS s")
        .collect()(0).getLong(0)
      val sig2 = s2.sql(
        "SELECT graft_simhash64(array('a', 'b', 'a')) AS s")
        .collect()(0).getLong(0)
      assert(sig == sig2)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
