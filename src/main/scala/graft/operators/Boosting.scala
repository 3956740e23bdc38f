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

  /** Full gradient-boosting training with depth-1 trees (stumps),
    * squared loss, fixed `rounds` and learning rate `eta` — the
    * distributed-GBDT training loop end to end: each round builds ONE
    * map-side-combined (feature, bin) residual histogram over the data,
    * picks the globally best split from the tiny bin table, and applies
    * the stump's two leaf values to every row's residual. The model
    * (one row per round) plus the per-round Σ|residual| convergence
    * witness is the output — hashing it checks the entire training
    * trajectory, because every round's histogram sums over the residuals
    * the previous rounds produced.
    *
    * Exact-replay discipline (the k-means/GD lineage): residuals live on
    * the 1e-12 decimal grid from birth (labels are exact ints; every
    * update subtracts a grid-snapped leaf), histogram sums are exact
    * decimal arithmetic, cumulative sums are rounded to the 1e-6 grid
    * (scale ≤ 9, so the decimal→double cast is exact) BEFORE the
    * fixed-order double gain formula, the argmax runs under the total
    * order (gain desc, feature asc, bin asc), and leaf values snap back
    * to the 1e-12 grid — so an unrolled per-round CTE replay lands on
    * bit-identical residuals after every round.
    *
    * Scale: per round, two data-sized passes (histogram build + residual
    * update — the Σ|r| witness rides the update's aggregate) and one
    * 1-row driver collect (the chosen split — model-bounded, the allowed
    * argmax shape); rows are checkpointed each round so plan depth stays
    * bounded. Returns (round, feature, split_bin, n_left, n_right, gain,
    * leaf_left, leaf_right, resid_abs_sum). */
  def trainStumps(
      df: DataFrame,
      labelCol: String,
      features: Seq[(String, Column)],
      rounds: Int,
      eta: Double,
      checkpointDir: Option[String] = None): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    require(eta > 0.0 && eta <= 1.0, s"eta must be in (0,1], got $eta")
    val spark = df.sparkSession
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val names = features.map(_._1)
    val st = IterState(df, checkpointDir)

    var rows = st.mat(
      df.select(
        features.map { case (n, c) => c.cast("long").as(s"bin_$n") } :+
          col(labelCol).cast("int").cast(dec12).as("r"): _*))

    val wCum = Window
      .partitionBy(col("feature"))
      .orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val model = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long, Double, Double, Double, Double)]

    for (k <- 1 to rounds) {
      val melted = names
        .map(n => rows.select(lit(n).as("feature"), col(s"bin_$n").as("bin"), col("r")))
        .reduce(_ unionAll _)
      val bins = melted
        .groupBy(col("feature"), col("bin"))
        .agg(sum(col("r")).as("sb"), count(lit(1)).as("nb"))
      val cum = bins.select(
        col("feature"),
        col("bin"),
        sum(col("sb")).over(wCum).as("rl"),
        sum(col("nb")).over(wCum).as("nl"))
      val tot = bins
        .groupBy(col("feature"))
        .agg(sum(col("sb")).as("rt"), sum(col("nb")).as("nt"))
      val cand = cum
        .join(broadcast(tot), Seq("feature"))
        .filter(col("nl") < col("nt"))
        .select(
          col("feature"), col("bin"), col("nl"), (col("nt") - col("nl")).as("nr"), col("nt"),
          round(col("rl"), 6).as("rl6"),
          round(col("rt") - col("rl"), 6).as("rr6"),
          round(col("rt"), 6).as("rt6"))
      val rl6D = col("rl6").cast("double")
      val rr6D = col("rr6").cast("double")
      val rt6D = col("rt6").cast("double")
      val scored = cand.select(
        col("feature"), col("bin"), col("nl"), col("nr"),
        round(
          (rl6D * rl6D / col("nl").cast("double") + rr6D * rr6D / col("nr").cast("double")) -
            rt6D * rt6D / col("nt").cast("double"),
          6).as("gain"),
        round(lit(eta) * (rl6D / col("nl").cast("double")), 12).cast(dec12).as("vl"),
        round(lit(eta) * (rr6D / col("nr").cast("double")), 12).cast(dec12).as("vr"))
      // 1-row model-bounded argmax — the allowed driver collect shape
      val best = scored
        .orderBy(col("gain").desc, col("feature"), col("bin"))
        .limit(1)
        .collect()(0)
      val (bf, bb) = (best.getString(0), best.getLong(1))
      val (vl, vr) = (best.getDecimal(5), best.getDecimal(6))
      val updated = st.mat(
        rows.withColumn(
          "r",
          (col("r") - when(col(s"bin_$bf") <= bb, lit(vl)).otherwise(lit(vr))).cast(dec12)))
      val absSum = updated
        .agg(round(sum(abs(col("r"))), 6).cast("double").as("a"))
        .collect()(0).getDouble(0)
      st.release(rows)
      rows = updated
      model += ((k, bf, bb, best.getLong(2), best.getLong(3), best.getDouble(4),
        vl.setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(),
        vr.setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(), absSum))
    }
    st.release(rows)
    import spark.implicits._
    model.toSeq
      .toDF("round", "feature", "split_bin", "n_left", "n_right", "gain",
        "leaf_left", "leaf_right", "resid_abs_sum")
  }
}
