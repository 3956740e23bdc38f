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
    * side (both one pass, map-side partial agg). `lgConfigK` sizes the
    * Datasketches registers (2^lgK); below ~3/4·2^lgK distinct per group
    * the sketch is still in its coupon (exact) regime and the estimate is
    * the exact count — which is what makes the gate query hash-checkable
    * against an exact-COUNT(DISTINCT) oracle at the test scale factors,
    * while the same code path degrades gracefully to ~1/sqrt(2^lgK)
    * relative error at production cardinality (SketchSpec pins that
    * envelope). */
  def distinctCounts(df: DataFrame, groupCol: String, idCol: String, lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col(idCol), lit(lgConfigK))).as("hll_distinct"),
        approx_count_distinct(col(idCol)).as("hllpp_distinct"),
        count(lit(1)).as("n_rows"))

  /** Daily sketch cube: one mergeable HLL binary per (day, group). At scale
    * this is written to storage once per day — the reusable aggregate. */
  def dailySketches(df: DataFrame, tsCol: String, groupCol: String, idCol: String, lgConfigK: Int = 12): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"), col(groupCol))
      .agg(hll_sketch_agg(col(idCol), lit(lgConfigK)).as("sketch"))

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

  /** Long-form quantiles: one row per (group, q, value) — same sketch pass
    * as [[approxQuantiles]], with the array unpivoted via posexplode so the
    * output is all-scalar (sortable/hashable by any downstream harness; the
    * array form crashed the r1 oracle compare). */
  def approxQuantilesLong(df: DataFrame, groupCol: String, valueCol: Column, qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    approxQuantiles(df, groupCol, valueCol, qs, accuracy)
      .select(
        col(groupCol),
        col("n_rows"),
        posexplode(col("quantiles")).as(Seq("pos", "value")))
      .select(
        col(groupCol),
        element_at(array(qs.map(lit): _*), col("pos") + 1).as("q"),
        col("value"),
        col("n_rows"))

  /** Heavy hitters via Count-Min Sketch: ONE pass builds a fixed-size
    * (eps, conf) frequency sketch (mergeable binary — partial-aggregates
    * map-side like the HLLs); candidate keys are then probed against it.
    * At 100 TB the sketch replaces a full groupBy when only the heavy tail
    * matters: O(log(1/δ)/ε) memory regardless of key cardinality, and a
    * stored sketch answers later frequency queries without re-scanning.
    *
    * `candidates` holds the keys to probe (at scale: a distinct() over a
    * sample, or the domain if known). Estimates over-count by at most
    * eps·N with probability conf. */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      candidates: DataFrame,
      minCount: Long,
      eps: Double = 0.001,
      confidence: Double = 0.99): DataFrame = {
    val sketchRow = df
      .agg(count_min_sketch(col(keyCol).cast("string"), lit(eps), lit(confidence), lit(42)).as("cms"))
    val bytes = sketchRow.head().getAs[Array[Byte]]("cms")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val spark = df.sparkSession
    val bc    = spark.sparkContext.broadcast(cms)
    val probe = org.apache.spark.sql.functions.udf((k: String) => bc.value.estimateCount(k))
    candidates
      .select(col(keyCol).cast("string").as(keyCol))
      .withColumn("est_count", probe(col(keyCol)))
      .filter(col("est_count") >= minCount)
  }
}
