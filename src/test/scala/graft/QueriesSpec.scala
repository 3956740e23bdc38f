package graft

/** Smoke: every registered query runs at sf0.001 and the flagship entry
  * returns rows (the driver's t1 check). Correctness is the DuckDB oracle
  * gate (tools/check_oracle.py), not this spec. */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and oracle-covered ones are non-empty") {
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, SharedSpark.sf0001).count()
    }
    val withOracle = SparkEntry.oracleSql.keySet
    results.foreach { case (name, n) =>
      withClue(s"query $name:") {
        assert(n >= 0)
        if (withOracle(name)) assert(n > 0, "oracle-checked query must be non-empty")
      }
    }
  }

  test("oracleSql keys are a subset of queries keys with matching columns discipline") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
