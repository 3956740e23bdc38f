package graft

import org.apache.spark.sql.functions._

import graft.operators.Boosting

class BoostingSpec extends SparkSpec {
  import spark.implicits._

  test("histSplitGains: closed-form gains, tie-break to the lowest bin, constant feature emits nothing") {
    // bins 1,1,2,2,3,3 with labels 0,0,0,1,1,1 -> s per bin: {1:-2, 2:0, 3:+2}
    // split@1: 4/2 + 4/4 - 0 = 3 ; split@2: 4/4 + 4/2 - 0 = 3 (exact tie)
    val df = Seq((1L, 0), (1L, 0), (2L, 0), (2L, 1), (3L, 1), (3L, 1)).toDF("b", "y")
    val got = Boosting.histSplitGains(df, "y", Seq("f" -> col("b")))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 4L, 3.0, true),   // tie resolves to the LOWEST bin
      (2L, 4L, 2L, 3.0, false)), got.mkString(","))
    // perfectly separable: gain = N
    val sep = Seq((1L, 0), (1L, 0), (2L, 1), (2L, 1)).toDF("b", "y")
    val s = Boosting.histSplitGains(sep, "y", Seq("f" -> col("b"))).collect()
    assert(s.length == 1 && s.head.getDouble(4) == 4.0 && s.head.getBoolean(5))
    // a constant feature has no valid split (right side would be empty)
    val multi = Boosting.histSplitGains(df, "y", Seq("f" -> col("b"), "const" -> lit(7L)))
    assert(multi.filter(col("feature") === "const").count() == 0)
    assert(multi.filter(col("feature") === "f").count() == 2)
    // exact sums are partitioning-invariant
    val rep = Boosting.histSplitGains(df.repartition(5), "y", Seq("f" -> col("b")))
      .collect()
      .map(r => (r.getLong(1), r.getDouble(4), r.getBoolean(5)))
      .sortBy(_._1)
    assert(rep.toSeq == Seq((1L, 3.0, true), (2L, 3.0, false)))
  }
}
