package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gradient-boosting building blocks — the histogram split search at the
  * heart of XGBoost (Chen & Guestrin 2016 §3.3, "approximate algorithm")
  * and LightGBM: features arrive PRE-BINNED as small integer bin ids (the
  * engines' one-time global binning pass; decimal-grid features like a
  * 0.01-step discount are already bins), per-bin gradient sums are ONE
  * map-side-combined aggregation over the data, and every split candidate
  * is scored from the bin table alone — the data-sized pass never repeats
  * per candidate.
  *
  * Scale design (100 TB of rows): the only data-sized stage is the
  * (feature, bin) groupBy — Σ over rows with map-side partial aggregation,
  * shuffling just nFeatures × nBins partial sums. Cumulative/total scans
  * then run on the bin table (nFeatures × nBins rows — thousands at most,
  * the reason the histogram trick exists), so the per-feature windows are
  * broadcast-sized by construction. This is exactly how the distributed
  * GBDT engines shard: data-parallel histogram build, tiny split search.
  */
object Boosting {

  /** Split gains for every (feature, bin) candidate, squared-loss /
    * constant-hessian regime: with labels y ∈ {0,1} encoded as signed
    * units s = 2y − 1, the variance-reduction gain of splitting bins
    * [min..b] | (b..max] is
    *
    *   gain(b) = SL²/nL + SR²/nR − S²/N
    *
    * (the logistic-from-base-0.5 first round up to a constant hessian
    * factor — XGBoost's GL²/(HL+λ) with H constant absorbed into the
    * scale). SL/nL come from ONE cumulative pass over the per-bin sums.
    *
    * Exactness: bin sums, cumulative sums, and totals are exact integers;
    * each gain is three correctly-rounded double divisions combined in a
    * FIXED order — (SL²/nL + SR²/nR) − S²/N — then round(·, 6), so rows
    * replay bit-for-bit cross-engine. `is_best` marks each feature's
    * argmax under the total order (gain desc, bin asc) — deterministic
    * even when symmetric splits tie exactly.
    *
    * `features` maps feature name → integer bin expression. Returns
    * (feature, split_bin, n_left, n_right, gain, is_best); the right side
    * is always non-empty (the top bin is not a split). */
  def histSplitGains(
      df: DataFrame,
      labelCol: String,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val s = (col(labelCol).cast("long") * 2 - 1).as("s")
    val melted = features
      .map { case (name, bin) =>
        df.select(lit(name).as("feature"), bin.cast("long").as("bin"), s)
      }
      .reduce(_ unionAll _)
    val bins = melted
      .groupBy(col("feature"), col("bin"))
      .agg(sum(col("s")).as("sb"), count(lit(1)).as("nb"))
    val wCum = Window
      .partitionBy(col("feature"))
      .orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = bins.select(
      col("feature"),
      col("bin"),
      sum(col("sb")).over(wCum).as("sl"),
      sum(col("nb")).over(wCum).as("nl"))
    val tot = bins
      .groupBy(col("feature"))
      .agg(sum(col("sb")).as("st"), sum(col("nb")).as("nt"))
    val slD = col("sl").cast("double")
    val srD = (col("st") - col("sl")).cast("double")
    val stD = col("st").cast("double")
    val gain = round(
      (slD * slD / col("nl").cast("double") +
        srD * srD / (col("nt") - col("nl")).cast("double")) -
        stD * stD / col("nt").cast("double"),
      6)
    val wBest = Window.partitionBy(col("feature")).orderBy(col("gain").desc, col("split_bin"))
    cum
      .join(broadcast(tot), Seq("feature"))
      .filter(col("nl") < col("nt"))
      .select(
        col("feature"),
        col("bin").as("split_bin"),
        col("nl").as("n_left"),
        (col("nt") - col("nl")).as("n_right"),
        gain.as("gain"))
      .withColumn("is_best", row_number().over(wBest) === 1)
  }
}
