package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-overlap) joins WITHOUT an equi-key — the join family's
  * 100 TB trap: Spark plans a bare `p.ts BETWEEN i.start AND i.end` as a
  * BroadcastNestedLoopJoin (fine while one side broadcasts, a cross
  * product the moment both sides are large). The standard scale answer is
  * TIME-BIN BANDING: quantize time into fixed-width bins, replicate each
  * interval into every bin it overlaps, key each point by its single bin,
  * equi-join on the bin, and keep the range predicate as a residual. The
  * join becomes a plain shuffled equi-join — partitionable, AQE-skew-
  * splittable — at the cost of interval-side replication bounded by
  * span/binWidth.
  *
  * No reference counterpart (SURVEY.md §2e joins family). Semantics are
  * exact, not approximate: a point lies in exactly ONE bin, so each
  * matching (point, interval) pair meets exactly once — no dedup step, no
  * duplicates by construction (the property interval-interval banding
  * would need a canonical-bin trick for; points make it free).
  *
  * Pick `binMicros` near the TYPICAL interval span: wider bins cut
  * replication but grow per-bin fan-in (more residual filtering); narrower
  * bins do the reverse. A pathological super-long interval replicates
  * into span/binWidth rows — cap such outliers upstream or widen the bin.
  */
object IntervalJoin {

  /** Join `points` to every row of `intervals` whose [startCol, endCol]
    * (inclusive both ends) contains the point's `ptCol`. Both inputs pass
    * through unchanged (column sets must be disjoint); output is the
    * matched pairs. One shuffled equi-join on the derived bin key. */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binMicros: Long = 3600000000L * 24): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    def bin(c: Column): Column = floor(unix_micros(c) / binMicros)
    val pts = points.withColumn("__bin", bin(col(ptCol)))
    val ivs = intervals
      .withColumn("__bin", explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    pts
      .join(ivs, Seq("__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
