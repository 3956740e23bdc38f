package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** The two-phase prefix-sum machinery must be BIT-IDENTICAL to the
  * single-partition global window it replaces — that is the whole
  * contract (the gate rows that moved onto it are hash-compared against
  * DuckDB's plain window SQL). Property-tested against Spark's own
  * window functions on random data, plus the NTILE formula across the
  * full (N mod buckets) residue range where the bucket-size arithmetic
  * changes shape. */
class PrefixSumSpec extends SparkSpec {

  test("withRunning equals the single-partition window exactly on random data (ties included)") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd = new scala.util.Random(1600 + trial)
      // duplicate VALUES on purpose; the ORDER stays total via the unique id
      val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      val df   = rows.toDF("id", "v", "u").repartition(7)
      val got = PrefixSum
        .withRunning(
          df,
          order = Seq(col("v"), col("id")),
          running = Seq("rv" -> col("v"), "ru" -> col("u")),
          rowNumberAs = Some("rn"),
          numPartitions = 5)
        .select(col("id"), col("rv"), col("ru"), col("rn"))
      val w = Window.orderBy(col("v"), col("id")).rowsBetween(Window.unboundedPreceding, 0)
      val want = df.select(
        col("id"),
        sum(col("v")).over(w).as("rv"),
        sum(col("u")).over(w).as("ru"),
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long").as("rn"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty, s"trial $trial diverged")
    }
  }

  test("withRunning supports descending orders and empty input") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i % 9).toLong)).toDF("id", "v")
    val got = PrefixSum
      .withRunning(df, Seq(col("v").desc, col("id").asc), Seq("rv" -> col("v")), Some("rn"), 4)
      .select(col("id"), col("rv"), col("rn"))
    val w = Window.orderBy(col("v").desc, col("id").asc)
    val want = df.select(
      col("id"),
      sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("rv"),
      row_number().over(w).cast("long").as("rn"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val empty = df.filter(lit(false))
    assert(PrefixSum.withRunning(empty, Seq(col("id")), Seq("rv" -> col("v")), Some("rn")).count() === 0L)
  }

  test("ntileFromRowNumber reproduces Spark's NTILE for every residue class and tiny N") {
    import spark.implicits._
    // N mod buckets sweeps 0..buckets-1, plus N < buckets (the q=0 branch)
    for (n <- Seq(1, 2, 3, 4, 5, 7, 10, 11, 12, 13, 14, 25, 99, 100); b <- Seq(3, 5)) {
      val df = (1 to n).map(_.toLong).toDF("id")
      val got = df
        .crossJoin(broadcast(df.agg(count(lit(1)).as("tot"))))
        .select(
          col("id"),
          PrefixSum.ntileFromRowNumber(
            row_number().over(Window.orderBy(col("id"))).cast("long"), b, col("tot")).as("nt"))
      val want = df.select(col("id"), ntile(b).over(Window.orderBy(col("id"))).as("nt"))
      assert(
        got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"N=$n buckets=$b diverged from Spark ntile")
    }
  }

  test("correct with exchange reuse DISABLED: both phases share one materialized partitioning") {
    import spark.implicits._
    // the two phases join per-partition offsets onto per-partition local
    // sums BY PARTITION ID — if the range exchange executed independently
    // per branch, RangePartitioner's sampled boundaries could differ
    // between executions and the offsets would attach to the wrong local
    // sums. The eager materialization must make this hold with NO help
    // from spark.sql.exchange.reuse (the config the old shape silently
    // depended on).
    val prev = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val rnd  = new scala.util.Random(1717)
      val rows = (1 to 2000).map(i => (i.toLong, rnd.nextInt(50).toLong))
      val df   = rows.toDF("id", "v").repartition(11)
      val got = PrefixSum
        .withRunning(df, Seq(col("v"), col("id")), Seq("rv" -> col("v")), Some("rn"), 8)
        .select(col("id"), col("rv"), col("rn"))
      val w = Window.orderBy(col("v"), col("id"))
      val want = df.select(
        col("id"),
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("rv"),
        row_number().over(w).cast("long").as("rn"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "two-phase result diverged with exchange reuse off")
    } finally spark.conf.set("spark.sql.exchange.reuse", prev)
  }

  test("logRank risk-set cumulatives ride the two-phase path and match the plain-window reference") {
    import spark.implicits._
    // the same hypergeometric E/V computation with the risk set built by
    // a deliberate single-partition reference window — logRank itself now
    // uses PrefixSum (Funnel.scala), so equality here pins the rewrite
    val rnd = new scala.util.Random(42)
    val obs = (1 to 800).map { i =>
      (if (i % 2 == 0) "treat" else "control", (rnd.nextInt(60) + 1).toLong, (if (rnd.nextInt(3) > 0) 1L else 0L))
    }.toDF("g", "t", "e").repartition(9)
    val got = graft.operators.Funnel.logRank(obs, "g", "t", "e").collect().head
    // reference: identical formulas, risk set from the global window
    val gA = "control"
    val perT = obs
      .groupBy(col("t"))
      .agg(
        sum(when(col("g") === gA, col("e")).otherwise(0L)).as("d1"),
        sum(col("e")).as("d"),
        sum(when(col("g") === gA, 1L).otherwise(0L)).as("ended1"),
        count(lit(1)).as("ended"))
      .crossJoin(broadcast(obs.agg(
        sum(when(col("g") === gA, 1L).otherwise(0L)).as("tot1"),
        count(lit(1)).as("tot"))))
    val wT = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
    val risk = perT
      .withColumn("n1t", col("tot1") - coalesce(sum(col("ended1")).over(wT), lit(0L)))
      .withColumn("nt", col("tot") - coalesce(sum(col("ended")).over(wT), lit(0L)))
      .filter(col("d") > 0)
      .select(col("t"), col("n1t"), col("nt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the operator's own risk set must match the reference's at every death time
    val perT2 = graft.operators.PrefixSum.withRunning(
      perT, Seq(col("t")),
      Seq("c1" -> col("ended1"), "c" -> col("ended")))
      .withColumn("n1t", col("tot1") - (col("c1") - col("ended1")))
      .withColumn("nt", col("tot") - (col("c") - col("ended")))
      .filter(col("d") > 0)
      .select(col("t"), col("n1t"), col("nt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(perT2 == risk, "two-phase risk set diverged from the window reference")
    // and the end-to-end statistic is sane and fully populated
    assert(!got.isNullAt(got.fieldIndex("chi2")) && got.getAs[Double]("v") > 0)
  }

  test("phase 2 stays metadata-sized: the only partition-less window runs over per-partition totals") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "v")
    val out  = PrefixSum.withRunning(df, Seq(col("id")), Seq("rv" -> col("v")), Some("rn"), 8)
    val plan = out.queryExecution.executedPlan.toString
    val offenders = plan.linesIterator
      .filter(_.contains("Window ["))
      .filterNot(l => l.contains("__psum_pid") || l.contains("__t_"))
      .toSeq
    assert(offenders.isEmpty, s"data-sized global window leaked into the plan:\n${offenders.mkString("\n")}")
  }
}
