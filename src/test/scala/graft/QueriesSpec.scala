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
  private val rowsOnlyPinnedBy = Map(
    // the irreducible rows-only set: the driver-held BPE merge table and
    // raw deflate byte counts (zlib-implementation-specific). The four
    // sketch queries moved OFF this list in r11: at gate scale each sits
    // in its sketch's exact regime (HLL coupon mode at lgK=14, GK at
    // rank-error<1, collision-free CMS over 5 keys), making the full row
    // hash-checkable; SketchSpec still pins the production-scale error
    // envelopes. Every deterministic query — including the approximate-
    // but-derandomized ANN family — carries a full oracle.
    "text_compression_ratio" -> "CorpusSpec (separation + determinism; in-query rep4 witness)")

  test("no query lacks both an oracle and a pinned rows-only spec") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unpinned = rowsOnly -- rowsOnlyPinnedBy.keySet
    assert(unpinned.isEmpty, s"rows-only queries without a pinned spec: $unpinned")
    val stale = rowsOnlyPinnedBy.keySet -- rowsOnly
    assert(stale.isEmpty, s"stale allowlist entries (now oracled or removed): $stale")
  }
}
