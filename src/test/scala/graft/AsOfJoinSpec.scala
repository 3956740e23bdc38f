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
}
