package graft

import org.apache.spark.sql.functions._

import graft.operators.RuntimeFilter
import graft.sources.Tables

/** Bloom runtime-filter join reduction: exactness vs the plain join, the
  * loud outer-join guard, and the plan contract (the membership probe sits
  * on the probe branch BELOW the join, where it kills rows pre-shuffle).
  */
class RuntimeFilterSpec extends SparkSpec {
  private lazy val t = Tables(spark, SharedSpark.sf0001)

  private def plainJoin(joinType: String) =
    t.lineitem
      .select(col("l_orderkey"), col("l_extendedprice"))
      .join(
        t.orders.filter(col("o_totalprice") > 250000)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"),
        joinType)

  private def reduced(joinType: String) =
    RuntimeFilter.bloomReducedJoin(
      t.lineitem.select(col("l_orderkey"), col("l_extendedprice")),
      t.orders.filter(col("o_totalprice") > 250000)
        .select(col("o_orderkey"), col("o_orderpriority")),
      "l_orderkey",
      "o_orderkey",
      joinType)

  test("inner bloomReducedJoin equals the plain inner join exactly") {
    val got  = reduced("inner")
    val want = plainJoin("inner")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0, "fixture must exercise the filter (non-empty slice)")
  }

  test("left_semi bloomReducedJoin equals the plain left_semi join exactly") {
    val got  = reduced("left_semi")
    val want = plainJoin("left_semi")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("outer join types are rejected loudly (prefilter would drop NULL-side rows)") {
    val e = intercept[IllegalArgumentException](reduced("left_outer"))
    assert(e.getMessage.contains("inner/left_semi"))
  }

  test("plan: membership probe filters the probe branch below the join") {
    val plan = reduced("inner").queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe expression must survive to the physical plan:\n$plan")
    val joinIdx  = "(?i)join".r.findFirstMatchIn(plan).map(_.start).getOrElse(-1)
    val probeIdx = plan.indexOf("bloom_might_contain")
    assert(joinIdx >= 0, s"expected a join in:\n$plan")
    assert(probeIdx > joinIdx, s"prefilter must sit below (deeper than) the join, not above it:\n$plan")
    // scan-side: below the probe filter there is a Scan and NO Exchange —
    // i.e. rows die in the scan stage; only survivors reach the join's
    // shuffle/broadcast (which, if any, sits ABOVE the filter)
    val below    = plan.substring(probeIdx)
    val scanIdx  = below.indexOf("Scan")
    val exchIdx  = below.indexOf("Exchange")
    assert(scanIdx >= 0, s"probe filter must sit over a scan:\n$plan")
    assert(exchIdx < 0 || exchIdx > scanIdx, s"no exchange may sit between the probe filter and its scan:\n$plan")
  }

  test("bloom false positives cannot leak: reduced row set is a superset-filter, join is the verifier") {
    // tiny bloom (high FP rate) still yields the exact join result
    val got = RuntimeFilter.bloomReducedJoin(
      t.lineitem.select(col("l_orderkey"), col("l_extendedprice")),
      t.orders.filter(col("o_totalprice") > 250000)
        .select(col("o_orderkey"), col("o_orderpriority")),
      "l_orderkey",
      "o_orderkey",
      numBits = 1 << 10,
      numHashes = 2)
    val want = plainJoin("inner")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
