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

  /** Every rows-only query must be on this list, each with the spec that
    * pins its correctness — adding a query with NEITHER an oracle NOR an
    * entry here fails the build, so coverage can't silently erode. */
  private val rowsOnlyPinnedBy = Map.empty[String, String]
  // Empty as of r13: text_compression_ratio — the last rows-only row —
  // now carries a planted-payload oracle (deflate byte counts precomputed
  // with an independent zlib and pinned as a VALUES join), and the
  // data-sized compressibility signal is gated via the SQL-replayable
  // text_kgram_economy proxy. Every registered query is fully oracled.

  test("no query lacks both an oracle and a pinned rows-only spec") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unpinned = rowsOnly -- rowsOnlyPinnedBy.keySet
    assert(unpinned.isEmpty, s"rows-only queries without a pinned spec: $unpinned")
    val stale = rowsOnlyPinnedBy.keySet -- rowsOnly
    assert(stale.isEmpty, s"stale allowlist entries (now oracled or removed): $stale")
  }
}
