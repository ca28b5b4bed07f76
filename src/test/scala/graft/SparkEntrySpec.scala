package graft

class SparkEntrySpec extends SparkTestBase {

  test("entry returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes on sf0.001") {
    SparkEntry.allQueries.foreach { q =>
      val df = q.fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      df.count() // force full execution
    }
  }

  test("query names are unique and well-formed") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size)
    names.foreach(n => assert(n.matches("[a-z0-9_]+"), s"bad name $n"))
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("every no-oracle query declares oracle-checked twins") {
    val byName = SparkEntry.allQueries.map(q => q.name -> q).toMap
    val noOracle = SparkEntry.twinOf
    assert(noOracle.keySet == SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
    noOracle.foreach { case (name, twins) =>
      assert(twins.nonEmpty, s"$name has no oracle and no declared twin")
      twins.foreach { t =>
        val twin = byName.getOrElse(t,
          fail(s"$name declares unknown twin $t"))
        assert(twin.oracle.nonEmpty, s"$name's twin $t is itself oracle-less")
      }
    }
  }

  test("README status header counts match the registry (no drift)") {
    // round-16 verdict: the README said 231 where 233 were registered —
    // pin the prose to SparkEntry so the drift class dies.
    val readme = {
      val src = scala.io.Source.fromFile("README.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val m = """\*\*(\d+) queries\*\* registered in `graft\.SparkEntry` \((\d+) DuckDB-oracle-checked""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README status header pattern not found"))
    assert(m.group(1).toInt == SparkEntry.allQueries.size,
      s"README says ${m.group(1)} queries; registry has ${SparkEntry.allQueries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.group(2)} oracle-checked; registry has ${SparkEntry.oracleSql.size}")
  }

  test("output column names are distinct per query (driver sorts by name)") {
    SparkEntry.allQueries.foreach { q =>
      val cols = q.fn(spark, sf0001).columns
      assert(cols.distinct.length == cols.length,
        s"${q.name} duplicate columns: ${cols.mkString(",")}")
    }
  }
}
