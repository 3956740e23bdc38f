package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch/approximate aggregates — the 100 TB answer to "how many distinct
  * users" and "what's the p99" when exact answers would shuffle the world.
  *
  * No reference counterpart (SURVEY.md §2e). Built on Spark's Datasketches
  * HLL (mergeable binary sketches — partial-aggregates map-side, unions
  * across partitions/days/tables) and percentile_approx (distributed
  * QuantileSummaries, driver never sees raw rows).
  *
  * The mergeability is the point: daily sketch cubes persisted once can
  * answer any-date-range distinct counts by union, never re-reading events.
  */
object Sketches {

  /** Per-group HLL distinct estimate + HLL++ approx_count_distinct, side by
    * side (both one pass, map-side partial agg). */
  def distinctCounts(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col(idCol))).as("hll_distinct"),
        approx_count_distinct(col(idCol)).as("hllpp_distinct"),
        count(lit(1)).as("n_rows"))

  /** Daily sketch cube: one mergeable HLL binary per (day, group). At scale
    * this is written to storage once per day — the reusable aggregate. */
  def dailySketches(df: DataFrame, tsCol: String, groupCol: String, idCol: String): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"), col(groupCol))
      .agg(hll_sketch_agg(col(idCol)).as("sketch"))

  /** Re-aggregate a sketch cube to per-group totals: sketches UNION instead
    * of re-scanning raw data — distinct-over-any-range from stored state. */
  def unionSketches(cube: DataFrame, groupCol: String): DataFrame =
    cube
      .groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_total"))

  /** Distributed approximate quantiles (QuantileSummaries): bounded-memory
    * mergeable summaries, relative-error `accuracy` knob. */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: Column, qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        percentile_approx(valueCol, array(qs.map(lit): _*), lit(accuracy)).as("quantiles"),
        count(lit(1)).as("n_rows"))
}
