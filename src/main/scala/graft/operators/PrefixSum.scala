package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix sums — the scale-safe replacement for the
  * `Window.orderBy(...)` (no partition spec) running totals that Spark
  * executes as a SINGLE-PARTITION sort: correct at any size, but a
  * one-executor bottleneck once the windowed table outgrows one task
  * (Spark itself warns `WindowExec: No Partition Defined`). Used by the
  * entity-sized cumulative paths — vocabulary growth (one row per
  * document), RFM quintiles (one row per user), Gini ranked cumulative
  * (one row per entity) — whose row counts grow WITH the corpus, unlike
  * the top-K-bounded ranking windows that may keep the plain window.
  *
  * The classic two-phase recipe:
  *   1. range-repartition on the (total) order so partition p holds a
  *      contiguous key range and every key in p sorts before every key in
  *      p+1 — then per-partition running sums are an ORDINARY partitioned
  *      window (distributed, spillable);
  *   2. aggregate per-partition totals (one row per partition —
  *      metadata-sized), turn them into exclusive offsets with a window
  *      over that tiny frame, and broadcast-join the offsets back.
  * Global running value = local running value + offset of everything in
  * earlier partitions. The order MUST be total (callers append a unique
  * tiebreak column) — with a total order the result is independent of
  * where the sampled range boundaries land, so the two-phase output is
  * bit-identical to the single-partition window it replaces.
  *
  * Cost shape: one range shuffle of the data, materialized once (an eager
  * local checkpoint — see the correctness note at the call site: both
  * phases must see the SAME sampled boundaries), + one hash shuffle (the
  * partitioned window re-clusters by partition id) + one broadcast of a
  * partition-count-sized offset table — instead of funneling the whole
  * table through one task. */
object PrefixSum {
  private val Pid = "__psum_pid"

  /** Append running-sum columns (and optionally a global 1-based row
    * number) computed over `order`, which must be a TOTAL order.
    *
    * @param running     (outputName, valueExpr) pairs; each becomes a
    *                    running `sum(valueExpr)` up to and including the
    *                    current row.
    * @param rowNumberAs when set, also append a global `row_number()`
    *                    (as LONG) under this name.
    * @param numPartitions range-partition width; 0 = the session's
    *                    `spark.sql.shuffle.partitions`. */
  def withRunning(
      df: DataFrame,
      order: Seq[Column],
      running: Seq[(String, Column)],
      rowNumberAs: Option[String] = None,
      numPartitions: Int = 0): DataFrame = {
    require(running.nonEmpty || rowNumberAs.nonEmpty, "nothing to compute")
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Design note — why materialization and not deterministic bucketing:
    // the alternative that avoids this checkpoint is a driver-sampled
    // boundary list baked into a pure pid = count(boundaries <= row)
    // column (re-evaluation-immune by construction; boundary quality only
    // affects balance, never correctness, since the count is monotone in
    // the total order). But its sampling pass is a separate ACTION, and
    // separate DataFrame actions do not share shuffle stages — for the
    // chained / aggregation-fed callers here (three chained RFM passes,
    // the vocab-growth join) that re-executes the expensive upstream per
    // call, costing more than the one full-width write below. If a future
    // caller feeds a raw-scan-shaped frame at 100 TB, revisit.
    //
    // MATERIALIZE the ranged frame once (eager local checkpoint) before
    // either phase reads it. Both phases must observe the SAME partition
    // boundaries: phase 1's local windows and phase 2's per-partition
    // totals join on the partition id, so if the range exchange executed
    // twice — which happens whenever exchange reuse is off or column
    // pruning pushes different projections below the two branches —
    // RangePartitioner would re-SAMPLE boundaries with a fresh rdd.id
    // seed, the two executions could split the key space differently, and
    // offsets would silently attach to the wrong local sums. A prefix sum
    // is a genuine all-to-all barrier (phase 2 needs every partition's
    // total before any global value is final), so materializing phase 1's
    // input IS the algorithm's barrier, not an extra cost: one pass, then
    // both branches are partition-local reads of the same blocks.
    val ranged = df
      .repartitionByRange(n, order: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint(true)
    val wLoc = Window
      .partitionBy(col(Pid))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = running.foldLeft(ranged) { case (acc, (name, expr)) =>
      acc.withColumn(name, sum(expr).over(wLoc))
    }
    val withRn = rowNumberAs.fold(withLocal) { rn =>
      withLocal.withColumn(
        rn,
        row_number().over(Window.partitionBy(col(Pid)).orderBy(order: _*)).cast("long"))
    }
    // phase 2: per-partition totals -> exclusive offsets. One row per
    // partition, so the orderBy(pid) window here is metadata-sized by
    // construction — the single-partition shape is exactly right for it.
    val totalAggs =
      running.map { case (name, expr) => sum(expr).as(s"__t_$name") } ++
        rowNumberAs.map(rn => count(lit(1)).as(s"__t_$rn")).toSeq
    val totals = ranged.groupBy(col(Pid)).agg(totalAggs.head, totalAggs.tail: _*)
    val wOff = Window.orderBy(col(Pid)).rowsBetween(Window.unboundedPreceding, -1)
    val names = running.map(_._1) ++ rowNumberAs.toSeq
    val offsets = totals.select(
      col(Pid) +: names.map(name =>
        coalesce(sum(col(s"__t_$name")).over(wOff), lit(0L)).as(s"__o_$name")): _*)
    val joined = withRn.join(broadcast(offsets), Seq(Pid))
    val bumped = names.foldLeft(joined) { (acc, name) =>
      acc.withColumn(name, col(name) + col(s"__o_$name"))
    }
    bumped.drop((Pid +: names.map(name => s"__o_$name")): _*)
  }

  /** SQL-standard NTILE(n) computed from a global row number and the total
    * row count (both from [[withRunning]]): with q = N/n and r = N%n the
    * first r buckets take q+1 rows, the rest q — exactly Spark's and
    * DuckDB's NTILE, so hash-gated rows can swap a single-partition
    * `ntile(n).over(orderBy(...))` for the two-phase row number without
    * moving a single bucket boundary. Returns an INT column like ntile. */
  def ntileFromRowNumber(rn: Column, buckets: Int, total: Column): Column = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // Column./ is fractional; all operands here are non-negative longs well
    // under 2^53, so floor-after-divide IS integral division, exactly.
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val nB   = lit(buckets.toLong)
    val tot  = total.cast("long")
    val q    = idiv(tot, nB)
    val r    = tot % nB
    val big  = r * (q + lit(1L)) // rows covered by the (q+1)-sized buckets
    val inBig = idiv(rn - lit(1L), q + lit(1L)) + lit(1L)
    // greatest(q, 1): when N < n the small-bucket branch is never taken
    // (big = N covers every row) but Spark still type-checks/evaluates the
    // expression, and a /0 would poison the row under ANSI.
    val inSmall = r + idiv(rn - big - lit(1L), greatest(q, lit(1L))) + lit(1L)
    when(rn <= big, inBig).otherwise(inSmall).cast("int")
  }
}
