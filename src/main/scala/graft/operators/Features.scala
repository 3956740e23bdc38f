package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering operators for the training pipeline — the steps
  * between curation (Corpus/Dedup) and model fitting (Boosting): encoding
  * categoricals against the label without leaking it, and ranking features
  * by label association before anything trains on them. Both are exact
  * integer-count aggregations — one data pass each, model-sized outputs.
  */
object Features {

  /** K-fold leakage-safe target encoding (the "mean encoding" used for
    * high-cardinality categoricals in GBDT pipelines; Micci-Barreca 2001):
    * each fold's encoding for category c is the label mean of c's rows in
    * the OTHER folds — (S_c − S_cf)/(N_c − N_cf) — so no row's label ever
    * reaches its own feature value (the same discipline as
    * Corpus.leakageSafeSplit, applied to a feature). Folds come from a
    * deterministic integer id (`foldCol % folds`), so the table replays
    * anywhere. Categories entirely inside one fold fall back to that
    * fold's out-of-fold GLOBAL prior (S − S_f)/(N − N_f).
    *
    * Exactness: all sums/counts are exact integers; each encoding is ONE
    * double division under round(·, 6). One data pass (a single
    * (cat, fold) aggregation; per-cat and global margins roll up from it
    * — category- and fold-sized, broadcast-joined). Output: the encoding
    * TABLE (category, fold, n_oof, enc) — the model artifact serving
    * joins attach, not a per-row materialization. */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      labelCol: String,
      foldCol: String,
      folds: Int): DataFrame = {
    require(folds >= 2, s"need at least 2 folds, got $folds")
    val cf = df
      .select(
        col(catCol).as("category"),
        pmod(col(foldCol).cast("long"), lit(folds.toLong)).as("fold"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n_cf"), sum(col("y")).as("s_cf"))
    val perCat = cf.groupBy(col("category"))
      .agg(sum(col("n_cf")).as("n_c"), sum(col("s_cf")).as("s_c"))
    val perFold = cf.groupBy(col("fold"))
      .agg(sum(col("n_cf")).as("n_f"), sum(col("s_cf")).as("s_f"))
    val global = cf.agg(sum(col("n_cf")).as("n"), sum(col("s_cf")).as("s"))
    // every (category, fold) pair — including folds where the category is
    // absent, which serve the prior — via the cat × fold frame
    val frame = perCat.select(col("category"), col("n_c"), col("s_c"))
      .crossJoin(broadcast(perFold))
    frame
      .join(cf, Seq("category", "fold"), "left")
      .crossJoin(broadcast(global))
      .select(
        col("category"),
        col("fold"),
        (col("n_c") - coalesce(col("n_cf"), lit(0L))).as("n_oof"),
        round(
          when(
            col("n_c") - coalesce(col("n_cf"), lit(0L)) > 0,
            (col("s_c") - coalesce(col("s_cf"), lit(0L))).cast("double") /
              (col("n_c") - coalesce(col("n_cf"), lit(0L))).cast("double"))
            .otherwise(
              (col("s") - col("s_f")).cast("double") / (col("n") - col("n_f")).cast("double")),
          6).as("enc"))
  }

  /** Chi-square feature–label association (the classic filter-selection
    * score; Yang & Pedersen 1997 for the text-features form): for each
    * feature's integer-binned values vs a binary label, χ² =
    * Σ_cells (O − E)²/E with E = row·col/N. ONE melted (feature, bin,
    * label) aggregation over the data; margins and the statistic run on
    * the tiny contingency table.
    *
    * Exactness: observed counts and margins are exact integers; each
    * cell's E and (O−E)²/E run in fixed-order double then snap to the
    * 1e-9 grid, so the cross-cell sum is an exact decimal — order-free —
    * under the final round(·, 6). Returns (feature, n_bins, dof, chi2),
    * chi2 descending (the selection order), tie-broken by feature name. */
  def chi2Features(
      df: DataFrame,
      labelCol: String,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val dec9 = org.apache.spark.sql.types.DecimalType(20, 9)
    val melted = features
      .map { case (n, c) =>
        df.select(lit(n).as("feature"), c.cast("long").as("bin"),
          col(labelCol).cast("int").as("y"))
      }
      .reduce(_ unionAll _)
    val cells = melted
      .groupBy(col("feature"), col("bin"), col("y"))
      .agg(count(lit(1)).as("o"))
    val binTot = cells.groupBy(col("feature"), col("bin")).agg(sum(col("o")).as("row_t"))
    val labTot = cells.groupBy(col("feature"), col("y")).agg(sum(col("o")).as("col_t"))
    val nTot   = cells.groupBy(col("feature")).agg(sum(col("o")).as("n"))
    // absent (bin, label) cells are real zero-observed cells: build the
    // full bin × label frame per feature so E counts them
    val frame = binTot
      .join(labTot, Seq("feature"))
      .join(broadcast(nTot), Seq("feature"))
    val e = col("row_t").cast("double") * col("col_t").cast("double") / col("n").cast("double")
    val o = coalesce(col("o"), lit(0L)).cast("double")
    val terms = frame
      .join(cells, Seq("feature", "bin", "y"), "left")
      .select(
        col("feature"),
        round((o - e) * (o - e) / e, 9).cast(dec9).as("term"))
    val stats = terms
      .groupBy(col("feature"))
      .agg(round(sum(col("term")), 6).cast("double").as("chi2"))
    val shape = binTot.groupBy(col("feature")).agg(count(lit(1)).as("n_bins"))
      .join(labTot.groupBy(col("feature")).agg(count(lit(1)).as("n_labels")), Seq("feature"))
    stats
      .join(shape, Seq("feature"))
      .select(
        col("feature"),
        col("n_bins"),
        ((col("n_bins") - 1) * (col("n_labels") - 1)).as("dof"),
        col("chi2"))
      .orderBy(col("chi2").desc, col("feature"))
  }

  /** Per-group simple OLS fit (slope, intercept, r²) in closed form from
    * the five exact moments — the regression sibling of
    * DataQuality.correlationMatrix and the linear complement of the GBDT
    * stumps: ONE map-side-combined aggregation pass computes
    * (n, Σx, Σy, Σx², Σxy, Σy²) per group with every sum an exact
    * DECIMAL(38,0) integer (per-row products at DECIMAL(18,0)×(18,0) →
    * (37,0), under Spark's 38-precision cap — callers supply INTEGRAL
    * columns, e.g. money pre-scaled to cents), then the group-sized
    * moment table collects (the model-bounded judgment: the moments ARE
    * the model) and the normal equations solve driver-side in exact
    * BigDecimal: num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)²,
    * vary = n·Σy² − (Σy)². slope = num/den and r² = num²/(den·vary) are
    * fixed-order double formulas from the exact integers under
    * round(·, 6); intercept uses the ROUNDED slope (the ks_stat
    * discipline) so both engines agree bit-for-bit. Degenerate groups
    * emit NULL, never NaN: constant x (den = 0) → slope/intercept/r²
    * NULL; constant y (vary = 0) → r² NULL.
    *
    * |x|, |y| must fit DECIMAL(18,0); at 100 TB the data-sized stage is
    * still the one partial-aggregated moment pass — group-count-sized
    * shuffle, no joins. */
  def olsFit(df: DataFrame, groupCol: String, xCol: Column, yCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = xCol.cast("long").cast(dec18)
    val y = yCol.cast("long").cast(dec18)
    val moments = df
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast(dec38).as("sx"),
        sum(y).cast(dec38).as("sy"),
        sum(x * x).cast(dec38).as("sxx"),
        sum(x * y).cast(dec38).as("sxy"),
        sum(y * y).cast(dec38).as("syy"))
      .collect()
    def r6(v: Double): Double =
      java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val rows = moments.toSeq.map { r =>
      val n   = java.math.BigDecimal.valueOf(r.getLong(1))
      val sx  = r.getDecimal(2); val sy = r.getDecimal(3)
      val sxx = r.getDecimal(4); val sxy = r.getDecimal(5); val syy = r.getDecimal(6)
      val num  = n.multiply(sxy).subtract(sx.multiply(sy))
      val den  = n.multiply(sxx).subtract(sx.multiply(sx))
      val vary = n.multiply(syy).subtract(sy.multiply(sy))
      val slope: Option[Double] =
        if (den.signum == 0) None else Some(r6(num.doubleValue() / den.doubleValue()))
      val intercept: Option[Double] =
        slope.map(s1 => r6((sy.doubleValue() - s1 * sx.doubleValue()) / n.doubleValue()))
      val r2: Option[Double] =
        if (den.signum == 0 || vary.signum == 0) None
        else Some(r6((num.doubleValue() * num.doubleValue()) / (den.doubleValue() * vary.doubleValue())))
      (r.getString(0), r.getLong(1), slope, intercept, r2)
    }
    rows.toDF("group_key", "n", "slope", "intercept", "r2")
      .orderBy(col("group_key"))
  }

  /** Per-group ridge regression with two features in CLOSED form (the
    * L2-regularized sibling of [[olsFit]] — the stable fit when features
    * correlate, e.g. quantity and discount both tracking price): solve
    * (XᵀX + λ·diag(0,1,1))·β = Xᵀy by Cramer's rule on the 3×3 normal
    * equations. The intercept is NOT penalized (standard).
    *
    * Exactness: all nine moments (n, Σx₁, Σx₂, Σx₁², Σx₁x₂, Σx₂², Σy,
    * Σx₁y, Σx₂y) aggregate exactly from integer-grid inputs (long products
    * into DECIMAL(38,0) ≡ DuckDB HUGEINT); the four 3×3 determinants are
    * ONE fixed-order double chain each from those exact integers plus the
    * λ literal, so both engines produce bit-identical βs under round(·, 6).
    * One group-by pass over the data; the solve touches only the
    * group-count-sized moment table (driver-side, model-bounded — the
    * [[olsFit]] stance). */
  def ridgeFit(
      df: DataFrame,
      groupCol: String,
      x1Col: Column,
      x2Col: Column,
      yCol: Column,
      lambda: Double): DataFrame = {
    require(lambda >= 0.0, s"lambda must be non-negative, got $lambda")
    val spark = df.sparkSession
    import spark.implicits._
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x1 = x1Col.cast("long").cast(dec18)
    val x2 = x2Col.cast("long").cast(dec18)
    val y  = yCol.cast("long").cast(dec18)
    val moments = df
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(x1).cast(dec38).as("sx1"),
        sum(x2).cast(dec38).as("sx2"),
        sum(x1 * x1).cast(dec38).as("sx11"),
        sum(x1 * x2).cast(dec38).as("sx12"),
        sum(x2 * x2).cast(dec38).as("sx22"),
        sum(y).cast(dec38).as("sy"),
        sum(x1 * y).cast(dec38).as("sx1y"),
        sum(x2 * y).cast(dec38).as("sx2y"))
      .collect() // group-count-sized model frame, never data-sized
    def r6(v: Double): Double =
      java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val rows = moments.toSeq.map { r =>
      val n    = r.getLong(1).toDouble
      def d(i: Int): Double = r.getDecimal(i).doubleValue()
      val (sx1, sx2, sx11, sx12, sx22, sy, sx1y, sx2y) =
        (d(2), d(3), d(4), d(5), d(6), d(7), d(8), d(9))
      // A = XtX + lambda on the two slope diagonals; b = Xty. Fixed-order
      // 3x3 Cramer chain, mirrored verbatim in the oracle SQL.
      val (a11, a12, a13) = (n, sx1, sx2)
      val (a21, a22, a23) = (sx1, sx11 + lambda, sx12)
      val (a31, a32, a33) = (sx2, sx12, sx22 + lambda)
      def det3(
          m11: Double, m12: Double, m13: Double,
          m21: Double, m22: Double, m23: Double,
          m31: Double, m32: Double, m33: Double): Double =
        m11 * (m22 * m33 - m23 * m32) -
          m12 * (m21 * m33 - m23 * m31) +
          m13 * (m21 * m32 - m22 * m31)
      val det = det3(a11, a12, a13, a21, a22, a23, a31, a32, a33)
      val (b1, b2, b3) = (sy, sx1y, sx2y)
      val beta =
        if (det == 0.0) (None, None, None)
        else
          (Some(r6(det3(b1, a12, a13, b2, a22, a23, b3, a32, a33) / det)),
            Some(r6(det3(a11, b1, a13, a21, b2, a23, a31, b3, a33) / det)),
            Some(r6(det3(a11, a12, b1, a21, a22, b2, a31, a32, b3) / det)))
      (r.getString(0), r.getLong(1), beta._1, beta._2, beta._3)
    }
    rows.toDF("group_key", "n", "beta0", "beta1", "beta2")
      .orderBy(col("group_key"))
  }

  /** Split-conformal prediction interval (Vovk et al.; Lei et al. 2018) —
    * the distribution-free uncertainty wrapper every served model needs:
    * fit on the TRAIN split, take q̂ = the ⌈(n+1)(1−α)⌉-th smallest
    * absolute residual on the CALIBRATION split, and ŷ ± q̂ then covers a
    * fresh point with probability ≥ 1−α, no matter how wrong the model is.
    * The TEST split reports the realized coverage and the interval width —
    * the honesty check on the guarantee.
    *
    * Determinism/exactness: the model is the simple-OLS closed form from
    * exact integer moments with slope/intercept snapped to the 1e-9 grid;
    * residuals |y − (a + b·x)| snap to 1e-6, so the calibration quantile is
    * an EXACT order statistic over grid values (cumulative distinct-value
    * counts — the Brown–Forsythe median machinery at arbitrary rank) and
    * coverage is an exact integer ratio. Splits come from a caller-supplied
    * integer column mod 3 (0 train / 1 calib / 2 test). One scan fans into
    * three split-filtered aggregations; the model and q̂ are one-row
    * broadcast frames. */
  def conformalInterval(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      splitCol: Column,
      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val W     = org.apache.spark.sql.expressions.Window
    val base = df.select(
      xCol.cast("long").as("x"),
      yCol.cast("long").as("y"),
      pmod(splitCol.cast("long"), lit(3L)).as("split"))
    val train = base.filter(col("split") === 0L)
    // DECIMAL(18,0) per-row → DECIMAL(37,0) products: exact train moments
    // where a long sum(x*x) would wrap silently (olsFit rule)
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val xd = col("x").cast(dec18)
    val yd = col("y").cast(dec18)
    val model = train.agg(
      count(lit(1)).as("n_train"),
      sum(xd).cast(dec38).as("sx"),
      sum(yd).cast(dec38).as("sy"),
      sum(xd * xd).cast(dec38).as("sxx"),
      sum(xd * yd).cast(dec38).as("sxy"))
    val nT  = col("n_train").cast("double")
    val den = nT * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val b   = round((nT * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")) / den, 9)
    val a   = round((col("sy").cast("double") - b * col("sx").cast("double")) / nT, 9)
    val fitted = model.select(col("n_train"), a.as("a"), b.as("b"))
    def resid = round(abs(col("y").cast("double") - (col("a") + col("b") * col("x").cast("double"))), 6)
    val calib = base.filter(col("split") === 1L)
      .crossJoin(broadcast(fitted))
      .select(resid.as("r"))
    val hist = calib.groupBy(col("r")).agg(count(lit(1)).as("c"))
    val cum = hist.select(
      col("r"),
      sum(col("c")).over(W.orderBy(col("r")).rowsBetween(W.unboundedPreceding, W.currentRow)).as("cum"),
      sum(col("c")).over(W.partitionBy()).as("n_calib"))
    val qHat = cum
      .filter(col("cum") >= ceil((col("n_calib") + 1).cast("double") * lit(1.0 - alpha)))
      .agg(min(col("r")).as("q_hat"), max(col("n_calib")).as("n_calib"))
    val test = base.filter(col("split") === 2L)
      .crossJoin(broadcast(fitted))
      .crossJoin(broadcast(qHat))
      .agg(
        count(lit(1)).as("n_test"),
        sum(when(resid <= col("q_hat"), 1L).otherwise(0L)).as("n_covered"),
        first(col("n_train")).as("n_train"),
        first(col("n_calib")).as("n_calib"),
        first(col("a")).as("a"),
        first(col("b")).as("b"),
        first(col("q_hat")).as("q_hat"))
    test.select(
      col("n_train"),
      col("n_calib"),
      col("n_test"),
      col("a").as("intercept"),
      col("b").as("slope"),
      col("q_hat"),
      round(col("n_covered").cast("double") / col("n_test").cast("double"), 6).as("coverage_test"),
      round(lit(2.0) * col("q_hat"), 6).as("interval_width"))
  }
}
