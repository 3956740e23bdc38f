package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.sources.Tables

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ mergeInto

  test("mergeInto: update wins, insert lands, untouched rows pass through") {
    val base  = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val delta = Seq((2L, "B", 99.0), (9L, "z", 1.0)).toDF("k", "s", "v")
    val out = Cdc
      .mergeInto(base, delta, Seq("k"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out == Map(1L -> ("a", 10.0), 2L -> ("B", 99.0), 3L -> ("c", 30.0), 9L -> ("z", 1.0)))
  }

  test("mergeInto rejects mismatched schemas") {
    val base  = Seq((1L, "a")).toDF("k", "s")
    val delta = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException](Cdc.mergeInto(base, delta, Seq("k")))
  }

  test("applyChanges: tombstones delete, upserts apply") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val delta = Seq(
      (2L, 99.0, false), // update
      (3L, 0.0, true),   // delete
      (4L, 40.0, false)  // insert
    ).toDF("k", "v", "is_delete")
    val out = Cdc
      .applyChanges(base, delta, Seq("k"), "is_delete")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(out == Map(1L -> 10.0, 2L -> 99.0, 4L -> 40.0))
  }

  test("mergeInto schema evolution: new delta columns appear, dropped ones survive") {
    val base  = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val delta = Seq((2L, "B", 9.5), (3L, "c", 1.5)).toDF("k", "v", "score") // adds score
    val out = Cdc.mergeInto(base, delta, Seq("k"), allowEvolution = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2)))))
      .toMap
    assert(out == Map(
      1L -> ("a", None),       // untouched base row: new column null-filled
      2L -> ("B", Some(9.5)),  // updated with the evolved column
      3L -> ("c", Some(1.5)))) // inserted
    // the reverse direction: delta DROPPING a column keeps it (null for delta rows)
    val delta2 = Seq((1L, 7.0)).toDF("k", "score")
    val out2 = Cdc.mergeInto(out.keys.toSeq.map(k => (k, s"v$k", 0.0)).toDF("k", "v", "score"),
      delta2, Seq("k"), allowEvolution = true)
      .select("k", "v") // evolution reorders columns (delta's first) — read by name
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out2(1L).isEmpty, "delta row without v gets null, column survives")
    assert(out2(2L).contains("v2"))
    // without the flag, evolution is still rejected loudly
    intercept[IllegalArgumentException](Cdc.mergeInto(base, delta, Seq("k")))
  }

  test("mergeInto plan: small delta broadcasts — base never shuffles") {
    val base  = Tables(spark, SharedSpark.sf0001).orders.select(col("o_orderkey"), col("o_totalprice"))
    val delta = base.limit(10).withColumn("o_totalprice", col("o_totalprice") * 2)
    val plan  = Cdc.mergeInto(base, delta, Seq("o_orderkey")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"anti-join against a batch-small delta must broadcast, got:\n$plan")
  }

  // ------------------------------------------------------------ scd2Apply

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2Apply: change closes + reopens, no-op passes, new key opens, history untouched") {
    val current = Seq(
      // closed history row — must pass through untouched
      (1L, "gold", ts("2020-01-01 00:00:00"), Option(ts("2022-01-01 00:00:00"))),
      // open rows
      (1L, "silver", ts("2022-01-01 00:00:00"), None: Option[java.sql.Timestamp]),
      (2L, "bronze", ts("2021-05-05 00:00:00"), None),
      (3L, "gold", ts("2021-06-06 00:00:00"), None)
    ).toDF("k", "tier", "valid_from", "valid_to")
    val delta = Seq(
      (1L, "platinum", ts("2024-03-01 00:00:00")), // changed → close + reopen
      (2L, "bronze", ts("2024-03-01 00:00:00")),   // identical → no-op
      (9L, "new", ts("2024-03-01 00:00:00"))       // unseen key → first version
    ).toDF("k", "tier", "ts")

    val out = Cdc
      .scd2Apply(current, delta, Seq("k"), "ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), Option(r.getTimestamp(3))))
      .toSet
    assert(out == Set(
      (1L, "gold", ts("2020-01-01 00:00:00"), Some(ts("2022-01-01 00:00:00"))),   // history
      (1L, "silver", ts("2022-01-01 00:00:00"), Some(ts("2024-03-01 00:00:00"))), // closed
      (1L, "platinum", ts("2024-03-01 00:00:00"), None),                          // reopened
      (2L, "bronze", ts("2021-05-05 00:00:00"), None),                            // no-op
      (3L, "gold", ts("2021-06-06 00:00:00"), None),                              // untouched
      (9L, "new", ts("2024-03-01 00:00:00"), None)                                // first version
    ))
  }

  test("scd2Apply: null attribute transitions are tracked null-safely") {
    val current = Seq((1L, Option("x"), ts("2020-01-01 00:00:00"), None: Option[java.sql.Timestamp]))
      .toDF("k", "a", "valid_from", "valid_to")
    // null != "x" must count as a change (null-safe compare, not SQL null)
    val delta = Seq((1L, None: Option[String], ts("2024-01-01 00:00:00"))).toDF("k", "a", "ts")
    val out = Cdc.scd2Apply(current, delta, Seq("k"), "ts").collect()
    assert(out.length == 2, "null-valued delta must close the open row and reopen")
    // and null == null must be a no-op
    val current2 = Seq((1L, None: Option[String], ts("2020-01-01 00:00:00"), None: Option[java.sql.Timestamp]))
      .toDF("k", "a", "valid_from", "valid_to")
    val out2 = Cdc.scd2Apply(current2, delta, Seq("k"), "ts").collect()
    assert(out2.length == 1 && out2.head.getTimestamp(3) == null)
  }

  test("scd2Apply rejects a delta missing attribute columns") {
    val current = Seq((1L, "a", ts("2020-01-01 00:00:00"), None: Option[java.sql.Timestamp]))
      .toDF("k", "tier", "valid_from", "valid_to")
    val delta = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "ts")
    intercept[IllegalArgumentException](Cdc.scd2Apply(current, delta, Seq("k"), "ts"))
  }
}
