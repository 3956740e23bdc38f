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

  test("trainStumps: closed-form two-round trajectory, residual halving, feature tie-break") {
    // bins 1,1,2,2 / labels 0,0,1,1 / eta 0.5: round 1 splits at bin 1
    // with gain (0 + 4/2) - 4/4 = 1, leaves (0, 0.5); residuals halve to
    // [0,0,.5,.5]; round 2 re-splits the same bin with gain 0.25.
    val df = Seq((1L, 0), (1L, 0), (2L, 1), (2L, 1)).toDF("b", "y")
    val got = Boosting.trainStumps(df, "y", Seq("f" -> col("b")), rounds = 2, eta = 0.5)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(5),
        r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "f", 1L, 1.0, 0.0, 0.5, 1.0),
      (2, "f", 1L, 0.25, 0.0, 0.25, 0.5)), got.mkString(","))
    // two identical features: the argmax tie resolves to the ASC feature name
    val tie = Boosting.trainStumps(df, "y", Seq("zz" -> col("b"), "aa" -> col("b")),
        rounds = 1, eta = 0.5)
      .collect().head
    assert(tie.getString(1) == "aa", tie.toString)
    // exact decimals: partitioning cannot move the trajectory
    val rep = Boosting.trainStumps(df.repartition(5), "y", Seq("f" -> col("b")),
        rounds = 2, eta = 0.5)
      .collect().map(r => (r.getInt(0), r.getDouble(5), r.getDouble(8))).sortBy(_._1)
    assert(rep.toSeq == Seq((1, 1.0, 1.0), (2, 0.25, 0.5)))
  }
}
