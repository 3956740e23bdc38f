package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof attaches the latest right row at or before each left ts") {
    import spark.implicits._
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100),
      ("A", ts("2024-01-01 10:05:00"), 101),
      ("B", ts("2024-01-01 10:01:00"), 200)
    ).toDF("sym", "ts", "qty")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:59:00"), 10.0),
      ("A", ts("2024-01-01 10:03:00"), 11.0),
      ("B", ts("2024-01-01 10:02:00"), 20.0) // after B's trade
    ).toDF("sym", "qts", "price")

    val out = AsOfJoin
      .asof(trades, quotes, Seq("sym"), "ts", "qts", Seq("price"))
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Int]("qty"), Option(r.getAs[java.lang.Double]("asof_price"))))
      .toSet
    assert(out == Set(
      ("A", 100, Some(10.0)),   // only the 09:59 quote precedes 10:00
      ("A", 101, Some(11.0)),   // 10:03 quote wins at 10:05
      ("B", 200, None)          // no quote at or before 10:01
    ))
  }

  test("equal timestamps: <= by default, excluded when strict") {
    import spark.implicits._
    val l = Seq(("A", ts("2024-01-01 10:00:00"), 1)).toDF("sym", "ts", "qty")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 42.0)).toDF("sym", "qts", "price")

    val loose = AsOfJoin.asof(l, r, Seq("sym"), "ts", "qts", Seq("price")).head()
    assert(loose.getAs[java.lang.Double]("asof_price") == 42.0)

    val strict = AsOfJoin.asof(l, r, Seq("sym"), "ts", "qts", Seq("price"), strict = true).head()
    assert(strict.getAs[java.lang.Double]("asof_price") == null)
  }

  test("left columns and row count are preserved") {
    import spark.implicits._
    val l = Seq(("A", ts("2024-01-01 10:00:00"), 7), ("C", ts("2024-01-01 11:00:00"), 8))
      .toDF("sym", "ts", "qty")
    val r   = Seq(("A", ts("2024-01-01 09:00:00"), 1.5)).toDF("sym", "qts", "price")
    val out = AsOfJoin.asof(l, r, Seq("sym"), "ts", "qts", Seq("price"))
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("sym", "ts", "qty", "asof_price"))
  }

  test("duplicate right timestamps resolve deterministically via tiebreak") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(("A", ts("2024-01-01 10:00:00"), 1)).toDF("sym", "ts", "qty")
    // two right rows at the SAME (key, ts): seq decides — largest wins
    val r = Seq(
      ("A", ts("2024-01-01 09:00:00"), 5L, 1.0),
      ("A", ts("2024-01-01 09:00:00"), 9L, 2.0)).toDF("sym", "qts", "seq", "price")
      .repartition(4)
    (0 until 3).foreach { _ =>
      val out = AsOfJoin
        .asof(l, r, Seq("sym"), "ts", "qts", Seq("price"), rightTieBreak = Some("seq"))
        .head()
      assert(out.getAs[Double]("asof_price") == 2.0)
    }
  }

  test("IntervalJoin.pointInInterval == brute range join; stays an equi-join without broadcast") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.IntervalJoin
    // intervals spanning multiple bins, bin boundaries, inclusive ends,
    // nested/overlapping windows, and a point matching several intervals
    val ivs = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 05:00:00")), // 3 bins at 2h
      (2L, ts("2024-01-01 04:00:00"), ts("2024-01-01 06:00:00")), // overlaps 1
      (3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:00"))  // zero-width
    ).toDF("iv_id", "t0", "t1")
    val pts = Seq(
      (10L, ts("2024-01-01 00:00:00")), // == start, inclusive
      (11L, ts("2024-01-01 04:30:00")), // inside 1 AND 2
      (12L, ts("2024-01-01 05:00:00")), // == end of 1, inside 2
      (13L, ts("2024-01-01 06:00:01")), // just past 2
      (14L, ts("2024-01-02 00:00:00")), // == the zero-width interval
      (15L, ts("2024-03-01 00:00:00"))  // matches nothing
    ).toDF("p_id", "pt")
    val got = IntervalJoin.pointInInterval(pts, "pt", ivs, "t0", "t1", binMicros = 7200000000L)
      .select(col("p_id"), col("iv_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pts.join(ivs, col("pt") >= col("t0") && col("pt") <= col("t1"))
      .select(col("p_id"), col("iv_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute && got == Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L), (14L, 3L)))
    // the scale claim: with broadcasting disabled the plan is still an
    // equi-join on the bin key, never a nested-loop cross product
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = IntervalJoin
        .pointInInterval(pts, "pt", ivs, "t0", "t1", binMicros = 7200000000L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
        s"banding must keep an equi-join:\n$plan")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    intercept[IllegalArgumentException](
      IntervalJoin.pointInInterval(pts, "pt", ivs, "t0", "t1", binMicros = 0))
    intercept[IllegalArgumentException](
      IntervalJoin.pointInInterval(pts.withColumnRenamed("p_id", "iv_id"), "pt", ivs, "t0", "t1"))
  }
}
