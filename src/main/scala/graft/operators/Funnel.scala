package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for each user, the first
  * time each stage of a fixed stage sequence was reached, where stage i+1
  * only counts STRICTLY AFTER the user's stage-i time (the standard
  * product-analytics funnel; same semantics as a chain of windowed
  * first-match self-joins, computed in one pass).
  *
  * No reference counterpart (SURVEY.md §2e extension family) — this is the
  * conversion-path query every event pipeline ships.
  *
  * Scale design (100 TB): filter to the k stage types FIRST (rides the
  * parquet scan as an IN pushdown — non-funnel events never shuffle), then
  * ONE user-keyed shuffle; per-user state is a sorted event array bounded
  * by that user's stage-event count, folded once. No per-stage join chain
  * (k−1 shuffles), no window over the full stream. Skewed power users are
  * bounded by their own activity, not the corpus.
  */
object Funnel {

  /** Per-user first-reach times for `stages`, plus how many stages were
    * reached. Output: (user, t_<stage>... as timestamp, n_stages). Users
    * with no stage-0 event still appear (all-null stage times) iff they
    * have at least one event of ANY funnel stage type. */
  def firstReach(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"stages must be distinct, got $stages")

    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol).as("user"))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"), col(typeCol).as("etype")))).as("evs"))

    val init = struct(
      stages.indices.map(i => lit(null).cast("timestamp").as(s"s$i")): _*)
    // left fold in event-time order; each step reads the PREVIOUS
    // accumulator, so one event can never satisfy two stages at once and
    // stage i+1 requires ts strictly after the recorded stage-i time
    def step(acc: Column, ev: Column): Column =
      struct(stages.zipWithIndex.map { case (st, i) =>
        val prevOk =
          if (i == 0) lit(true)
          else acc.getField(s"s${i - 1}").isNotNull && ev.getField("ts") > acc.getField(s"s${i - 1}")
        coalesce(
          acc.getField(s"s$i"),
          when(ev.getField("etype") === st && prevOk, ev.getField("ts"))).as(s"s$i")
      }: _*)

    val folded = aggregate(col("evs"), init, step)
    val stageCols = stages.zipWithIndex.map { case (st, i) =>
      folded.getField(s"s$i").as(s"t_$st")
    }
    val reached = stages.indices
      .map(i => when(folded.getField(s"s$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    perUser.select((col("user").as(userCol) +: stageCols :+ reached.cast("long").as("n_stages")): _*)
  }

  /** Cohort retention matrix: users grouped by the calendar week of their
    * first `anchorType` event (the cohort), counted as retained in each
    * whole-week offset where they have ANY event — the
    * signup-week × weeks-since grid every product-analytics stack draws.
    * Output: (cohort_week, weeks_since, n_users), exact integers only
    * (cross-engine hash-safe with no float discipline needed).
    *
    * Scale shape: anchor extraction is one user-keyed aggregate; the
    * retention grid is a second aggregate over (user, week) pairs made
    * DISTINCT before counting, so the shuffle carries at most
    * users × active-weeks rows — bounded by the calendar, not the event
    * volume. */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      anchorType: String): DataFrame = {
    val anchors = events
      .filter(col(typeCol) === anchorType)
      .groupBy(col(userCol).as("user"))
      .agg(min(date_trunc("week", col(tsCol))).as("cohort_start"))
    events
      .select(col(userCol).as("user"), date_trunc("week", col(tsCol)).as("week"))
      .join(anchors, "user")
      .filter(col("week") >= col("cohort_start"))
      .select(
        col("user"),
        col("cohort_start"),
        (datediff(col("week"), col("cohort_start")) / 7).cast("long").as("weeks_since"))
      .distinct()
      .groupBy(
        date_format(col("cohort_start"), "yyyy-MM-dd").as("cohort_week"),
        col("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort lifetime value: weekly revenue per signup cohort plus the
    * CUMULATIVE LTV curve — the payback read next to [[cohortRetention]]
    * (retention says who stayed; LTV says what staying was worth).
    * Revenue is exact DECIMAL(18,2) to the last aggregation and the
    * cumulative sum is an ORDER BY running window over the per-(cohort,
    * week) frame — decimal addition, so order could not matter even if
    * the frame order did. Per-user spend aggregates map-side before the
    * cohort join; the windowed part runs over cohorts × weeks rows.
    * Returns (cohort_week, weeks_since, n_active_users, revenue,
    * cum_revenue) with the doubles cast from exact decimals. */
  def cohortLtv(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      anchorType: String,
      revenueType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val anchors = events
      .filter(col(typeCol) === anchorType)
      .groupBy(col(userCol).as("user"))
      .agg(min(date_trunc("week", col(tsCol))).as("cohort_start"))
    val weekly = events
      .filter(col(typeCol) === revenueType)
      .select(
        col(userCol).as("user"),
        date_trunc("week", col(tsCol)).as("week"),
        col(valueCol).cast(dec).as("v"))
      .join(anchors, "user")
      .filter(col("week") >= col("cohort_start"))
      .groupBy(
        date_format(col("cohort_start"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("week"), col("cohort_start")) / 7).cast("long").as("weeks_since"))
      .agg(countDistinct(col("user")).as("n_active_users"), sum(col("v")).as("rev"))
    val w = Window
      .partitionBy(col("cohort_week"))
      .orderBy(col("weeks_since"))
      .rowsBetween(Window.unboundedPreceding, 0)
    weekly.select(
      col("cohort_week"),
      col("weeks_since"),
      col("n_active_users"),
      col("rev").cast("double").as("revenue"),
      sum(col("rev")).over(w).cast("double").as("cum_revenue"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next | prev) estimated from adjacent event pairs in (ts, tie)
    * order — the behavioral model behind next-action prediction and
    * anomaly scoring (an improbable transition IS the anomaly signal).
    * The tie column makes ordering total (equal timestamps would otherwise
    * make `lag` nondeterministic). One user-keyed shuffle for the lag
    * window, transition-matrix-sized aggregation after; probabilities are
    * exact count ratios rounded to 6. */
  def markovTransitions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy(col("prev_type")).agg(sum(col("n_transitions")).as("n_from"))
    pairs
      .join(totals, Seq("prev_type"))
      .select(
        col("prev_type"),
        col("next_type"),
        col("n_transitions"),
        round(col("n_transitions").cast("double") / col("n_from"), 6).as("prob"))
  }

  /** Wald's sequential probability ratio test (Wald 1945) over a
    * conversion stream, checkpointed by day — the always-valid
    * alternative to the fixed-horizon z-test (events_ab_ztest): test
    * H0: p = p0 vs H1: p = p1 on Bernoulli conversions, stopping the
    * first day the log-likelihood ratio leaves (ln(β/(1−α)),
    * ln((1−β)/α)). Observations are users (converted = any `convType`
    * event), ordered by day; the LLR has the CLOSED FORM
    * c·ln(p1/p0) + (n−c)·ln((1−p1)/(1−p0)) over cumulative counts, so
    * daily checkpoints need only a per-day count rollup — the scalable
    * formulation of the inherently-sequential test (per-observation
    * trajectories don't shard; cumulative counts do). Observations are
    * EVENTS with success = `convType` (the event-mix monitoring form:
    * "is the conversion share drifting to p1 or holding at p0").
    *
    * Exactness: both ln literals and the thresholds snap to the 1e-12
    * grid; llr = exact decimal linear combination of exact counts;
    * decisions are exact decimal compares. One data pass to the daily
    * rollup, day-sized everything after. Returns
    * (day, n_cum, conv_cum, llr, decision), day ascending. */
  def sprtDaily(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      convType: String,
      p0: Double,
      p1: Double,
      alpha: Double = 0.05,
      beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1, s"need distinct p0,p1 in (0,1)")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1, "alpha,beta in (0,1)")
    // DECIMAL(13,12), not (20,12): long(20,0) × (13,12) = precision 34
    // stays under Spark's 38 cap, so the product KEEPS scale 12 — at
    // (20,12) DecimalPrecision's allowPrecisionLoss path would crush the
    // intermediate to scale 9 and a half-boundary llr could round off-grid
    // (caught by the oracle on real data)
    val dec12 = org.apache.spark.sql.types.DecimalType(13, 12)
    def snap12(x: Double) =
      lit(java.math.BigDecimal.valueOf(math.log(x)).setScale(12, java.math.RoundingMode.HALF_UP))
        .cast(dec12)
    val l1 = snap12(p1 / p0)
    val l0 = snap12((1.0 - p1) / (1.0 - p0))
    val hi = snap12((1.0 - beta) / alpha)
    val lo = snap12(beta / (1.0 - alpha))
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        count(lit(1)).as("n_day"),
        sum((col(typeCol) === convType).cast("int")).as("c_day"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = daily.select(
      col("day"),
      sum(col("n_day")).over(w).as("n_cum"),
      sum(col("c_day")).over(w).as("c_cum"))
    cum.select(
      col("day").cast("string").as("day"),
      col("n_cum"),
      col("c_cum").as("conv_cum"),
      round(col("c_cum") * l1 + (col("n_cum") - col("c_cum")) * l0, 6).cast("double").as("llr"),
      when(col("c_cum") * l1 + (col("n_cum") - col("c_cum")) * l0 >= hi, lit("accept_h1"))
        .when(col("c_cum") * l1 + (col("n_cum") - col("c_cum")) * l0 <= lo, lit("accept_h0"))
        .otherwise(lit("continue")).as("decision"))
      .orderBy(col("day"))
  }

  /** Position-based (U-shaped) attribution — the third leg of the
    * attribution family beside last-touch (events_attribution) and the
    * Markov removal effect: for each CONVERTED journey, the first and
    * last touches take 40% each and the middles split the remaining 20%
    * evenly (1-touch journeys take 100%, 2-touch 50/50 — the standard
    * convention). Exactness: per-touch weights are one double division
    * snapped to the 1e-9 grid, per-channel credit is an exact decimal
    * sum, round(·, 6) last. One user-keyed window + a channel-sized
    * aggregation. Returns (channel, n_touches, credit). */
  def positionAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      convType: String): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(20, 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val seq = events
      .select(col(userCol).as("u"), col(typeCol).as("t"), row_number().over(w).as("rn"))
    val conv = seq.filter(col("t") === convType).groupBy(col("u")).agg(min(col("rn")).as("crn"))
    val touches = seq
      .join(conv, Seq("u"))
      .filter(col("t") =!= convType && col("rn") < col("crn"))
    val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("u")).orderBy(col("rn"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    val weighted = touches
      .select(col("u"), col("t"),
        row_number().over(wp).as("pos"),
        count(lit(1)).over(wn).as("n"))
      .select(col("t").as("channel"),
        round(
          when(col("n") === 1, lit(1.0))
            .when(col("n") === 2, lit(0.5))
            .when(col("pos") === 1 || col("pos") === col("n"), lit(0.4))
            .otherwise(lit(0.2) / (col("n") - 2).cast("double")),
          9).cast(dec9).as("w"))
    weighted
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"), sum(col("w")).as("raw"))
      .select(col("channel"), col("n_touches"), round(col("raw"), 6).cast("double").as("credit"))
      .orderBy(col("channel"))
  }

  /** Shapley-value attribution (Shapley 1953 via the simplified
    * coalition method of Zhao et al. 2018) — completes the attribution
    * family beside last-touch (events_attribution), U-shaped
    * (positionAttribution) and Markov removal: each channel's credit is
    * its average marginal contribution to the conversion rate over every
    * ordering of the channel set. Journeys collapse to their EXPOSURE
    * COALITION — the set of distinct channels a user touched strictly
    * before first conversion (whole history for non-converters) — and
    * the characteristic function is INCLUSIVE: v(S) = conversion rate
    * over journeys whose coalition ⊆ S ("what converts when only the
    * channels in S exist"). Inclusive-v is what makes the axioms hold on
    * sparse data: a channel in no journey is an exact null player
    * (adding it changes no ⊆-set), where the exactly-S convention would
    * hand it spurious negative credit for every unobserved superset.
    *
    * φ_i = Σ_{S ⊆ N\{i}} |S|!(n−1−|S|)!/n! · (v(S∪{i}) − v(S)) runs
    * DRIVER-SIDE over the ≤2ⁿ-row coalition table (the model-bounded
    * collect: the coalition table IS the model; n ≤ 8 enforced) in exact
    * BigDecimal: v snaps to the 1e-9 grid, the factorial weights are
    * exact integers (n! divided out only at the end), the weighted sum
    * is an exact decimal, and credit = round(sum/n!, 6) is one double
    * division from an exactly-cast decimal — bit-replayable.
    *
    * The data-sized stages are one conversion-time aggregate and one
    * distinct-touch aggregate per user; everything after is
    * coalition-sized. Credits satisfy Σφ_i = v(N) − v(∅) (efficiency:
    * total credit = overall conversion rate minus the direct-conversion
    * baseline, up to the 1e-9 snap), and a channel absent from every
    * journey gets exactly 0 (null player). */
  def shapleyAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      convType: String,
      channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 8,
      s"need 1..8 channels, got ${channels.size}")
    require(channels.distinct.size == channels.size, "channels must be distinct")
    require(!channels.contains(convType), "the conversion type is not a channel")
    val spark = events.sparkSession
    import spark.implicits._
    val chans = channels.sorted
    val n     = chans.size
    val ev    = events.select(col(userCol).as("u"), col(typeCol).as("t"), col(tsCol).as("ets"))
    val conv  = ev.filter(col("t") === convType).groupBy(col("u")).agg(min(col("ets")).as("cts"))
    val touches = ev
      .filter(col("t").isin(chans: _*))
      .join(conv, Seq("u"), "left")
      .filter(col("cts").isNull || col("ets") < col("cts"))
      .select(col("u"), col("t"))
      .distinct()
    val keyed = touches
      .groupBy(col("u"))
      .agg(concat_ws(",", array_sort(collect_set(col("t")))).as("key"))
    val coalition = ev.select(col("u")).distinct()
      .join(keyed, Seq("u"), "left")
      .join(conv.select(col("u"), lit(1L).as("cv")), Seq("u"), "left")
      .select(coalesce(col("key"), lit("")).as("key"), coalesce(col("cv"), lit(0L)).as("cv"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("nj"), sum(col("cv")).as("nc"))
      .collect()
      .map { r =>
        val set = r.getString(0).split(",").filter(_.nonEmpty).toSet
        (set, r.getLong(1), r.getLong(2))
      }
      .toSeq
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def v(s: Set[String]): JBD = {
      var nj = 0L
      var nc = 0L
      coalition.foreach { case (t, j, c) => if (t.subsetOf(s)) { nj += j; nc += c } }
      if (nj == 0L) JBD.ZERO.setScale(9)
      else JBD.valueOf(nc.toDouble / nj.toDouble).setScale(9, RM.HALF_UP)
    }
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val nFact = fact(n)
    val others = (s: String) => chans.filterNot(_ == s)
    val rows = chans.map { ch =>
      val subsets = others(ch).toSet.subsets().toSeq
      val sum = subsets.foldLeft(JBD.ZERO) { (acc, s) =>
        val w = JBD.valueOf(fact(s.size) * fact(n - 1 - s.size))
        acc.add(w.multiply(v(s + ch).subtract(v(s))))
      }
      val credit = JBD
        .valueOf(sum.doubleValue() / nFact.toDouble)
        .setScale(6, RM.HALF_UP).doubleValue()
      (ch, credit)
    }
    rows.toDF("channel", "credit").orderBy(col("channel"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2016) — the
    * data-driven alternative to last-touch: model user journeys as a
    * first-order chain START → touches → CONV/DROP, and credit each
    * channel by how much the chain's conversion probability falls when
    * that channel's state is removed (its transitions redirect to DROP —
    * probabilities are NOT renormalized, that's the removal semantics).
    *
    * Journey building is the only data-sized stage (one user-keyed
    * window + a transition-matrix-sized count); the chain itself is
    * model-bounded, so conversion probabilities run DRIVER-SIDE as exact
    * BigDecimal value iteration — the allowed collect shape — with every
    * step mirroring the SQL replay move for move: transition
    * probabilities snap to the 1e-9 grid (double count ratio, HALF_UP),
    * each step's product round(p·v, 9) re-snaps, per-state sums are
    * exact decimal adds, `steps` iterations on BOTH sides (fixed-depth —
    * equality needs identical arithmetic, not convergence). Removal
    * effects (p − p_c)/p and the normalized attribution shares snap the
    * same way. Returns (channel, p_conv, p_removed, removal_effect,
    * attribution) sorted by channel. */
  def markovRemovalAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      convType: String,
      steps: Int = 12): DataFrame = {
    require(steps >= 1, s"steps must be positive, got $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val seq = events
      .select(col(userCol).as("u"), col(typeCol).as("t"), row_number().over(w).as("rn"))
    val conv = seq.filter(col("t") === convType).groupBy(col("u")).agg(min(col("rn")).as("crn"))
    val touches = seq
      .join(conv, Seq("u"), "left")
      .filter(col("t") =!= convType && (col("crn").isNull || col("rn") < col("crn")))
    val wt  = org.apache.spark.sql.expressions.Window.partitionBy(col("u")).orderBy(col("rn"))
    val mid = touches.select(
      col("t").as("f"),
      coalesce(
        lead(col("t"), 1).over(wt),
        when(col("crn").isNotNull, lit("CONV")).otherwise(lit("DROP"))).as("tgt"))
    val ft = touches.groupBy(col("u"))
      .agg(min(struct(col("rn"), col("t"))).getField("t").as("ftype"))
    val start = seq.select(col("u")).distinct()
      .join(ft, Seq("u"), "left")
      .join(conv, Seq("u"), "left")
      .select(
        lit("START").as("f"),
        coalesce(
          col("ftype"),
          when(col("crn").isNotNull, lit("CONV")).otherwise(lit("DROP"))).as("tgt"))
    // transition-matrix-sized: |event types|² + a few — the allowed collect
    val trans = mid.unionAll(start)
      .groupBy(col("f"), col("tgt"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val zero9 = JBD.ZERO.setScale(9)
    val one9  = JBD.ONE.setScale(9)
    def snap9(d: Double): JBD = JBD.valueOf(d).setScale(9, RM.HALF_UP)
    val totals = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val channels = trans.keys.flatMap { case (f, t) => Seq(f, t) }.toSet
      .diff(Set("START", "CONV", "DROP")).toSeq.sorted

    def converge(excluded: Option[String]): JBD = {
      val rows = trans.toSeq
        .filterNot { case ((f, t), _) => excluded.exists(c => f == c || t == c) }
        .map { case ((f, t), n) => (f, t, snap9(n.toDouble / totals(f).toDouble)) }
      var v = Map.empty[String, JBD]
      def look(t: String): JBD =
        if (t == "CONV") one9 else v.getOrElse(t, zero9)
      for (_ <- 1 to steps) {
        v = rows
          .groupBy(_._1)
          .map { case (s, rs) =>
            s -> rs
              .map { case (_, t, p) => snap9(p.doubleValue() * look(t).doubleValue()) }
              .foldLeft(zero9)(_ add _)
          }
      }
      v.getOrElse("START", zero9)
    }

    val pFull = converge(None)
    val out = channels.map { c =>
      val pr = converge(Some(c))
      val re9 =
        if (pFull.signum == 0) None
        else Some(snap9(pFull.subtract(pr).doubleValue() / pFull.doubleValue()))
      (c, pr, re9)
    }
    val sumRe = out.flatMap(_._3).foldLeft(zero9)(_ add _)
    val rows = out.map { case (c, pr, re9) =>
      (
        c,
        pFull.setScale(6, RM.HALF_UP).doubleValue(),
        pr.setScale(6, RM.HALF_UP).doubleValue(),
        re9.map(_.setScale(6, RM.HALF_UP).doubleValue()),
        re9.flatMap(r =>
          if (sumRe.signum == 0) None
          else Some(JBD.valueOf(r.doubleValue() / sumRe.doubleValue())
            .setScale(6, RM.HALF_UP).doubleValue())))
    }
    rows.toDF("channel", "p_conv", "p_removed", "removal_effect", "attribution")
      .orderBy(col("channel"))
  }

  /** Kaplan-Meier survival curve over user churn (Kaplan & Meier 1958):
    * a user's observed time is the DAY of their last event (day index
    * from `baseDate`); they count as CHURNED (death) if the corpus's max
    * event time is more than `churnGapDays` past their last event,
    * otherwise right-CENSORED (still alive at observation end — the case
    * naive retention curves silently miscount). At each death day t:
    * n_at_risk = users whose observed day ≥ t, d = deaths at t, and
    * S(t) = Π_{t_j ≤ t} (1 − d_j/n_j) — the estimator every churn model
    * is benchmarked against.
    *
    * Determinism: day indices/death flags/at-risk counts are exact ints
    * (micros-epoch comparison — no fractional-seconds truncation skew);
    * S(t) = exp(cumulative Σ ln((n−d)/n)) where the cumulative window sum
    * adds row-by-row in day order on both engines (an ORDER BY running
    * sum is a fixed op sequence, unlike a group SUM), round(·, 6). A
    * fully-dying last day hits ln(0) = −∞ → exp = 0 exactly in both.
    *
    * Scale: one user-keyed aggregation (corpus-sized, map-side combined),
    * then everything runs on the per-DAY frame — observation windows are
    * years, so the windowed part is a few thousand rows no matter how
    * many users or events. Returns (day, n_at_risk, d_churned, survival). */
  def kaplanMeier(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      baseDate: String,
      churnGapDays: Int = 5): DataFrame = {
    require(churnGapDays >= 1, s"churnGapDays must be positive, got $churnGapDays")
    import org.apache.spark.sql.expressions.Window
    val gapUs = churnGapDays.toLong * 86400L * 1000000L
    val mx = events.agg(max(unix_micros(col(tsCol))).as("mxus"))
    val obs = events
      .groupBy(col(userCol).as("uid"))
      .agg(max(col(tsCol)).as("last_ts"))
      .crossJoin(broadcast(mx))
      .select(
        datediff(to_date(col("last_ts")), lit(baseDate).cast("date")).as("day"),
        (col("mxus") - unix_micros(col("last_ts")) > gapUs).cast("long").as("death"))
    val perDay = obs
      .groupBy(col("day"))
      .agg(sum(col("death")).as("d"), count(lit(1)).as("ended"))
      .crossJoin(broadcast(obs.agg(count(lit(1)).as("n_total"))))
    val wDay = Window.orderBy(col("day"))
    val withRisk = perDay
      .withColumn(
        "n_at_risk",
        col("n_total") -
          coalesce(
            sum(col("ended")).over(wDay.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
      .filter(col("d") > 0)
    withRisk
      .withColumn(
        "s_ln",
        sum(
          log(
            (col("n_at_risk") - col("d")).cast("double") / col("n_at_risk").cast("double")))
          .over(wDay.rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        col("day"),
        col("n_at_risk"),
        col("d").as("d_churned"),
        round(exp(col("s_ln")), 6).as("survival"))
  }

  /** Log-rank test (Mantel 1966) — the hypothesis test [[kaplanMeier]]
    * lacks: do two groups share one survival curve? The A/B test for
    * time-to-event (churn, retention) where a plain conversion z-test
    * throws away WHEN events happen and censoring. Input is an
    * observations frame (group ∈ exactly 2 labels, time, event 0/1 —
    * 0 = right-censored); at each death time t the observed group-1
    * deaths are compared to the hypergeometric expectation
    * d_t·n_1t/n_t, with variance d_t·r·(1−r)·(n_t−d_t)/(n_t−1),
    * r = n_1t/n_t.
    *
    * Determinism: at-risk counts are exact integers from two two-phase
    * prefix sums ([[PrefixSum.withRunning]] — the distinct-time table
    * grows with the data, so no single-partition window) over the
    * distinct-time-sized table; each E/V term is a
    * fixed-order double from exact longs snapped to the 1e-9 grid, summed
    * as exact decimals; O₁ is an exact long; χ², z, and the A&S-7.1.26
    * two-sided p are fixed-order formulas from the round-6 sums.
    * Group 1 = the lexicographically smaller label. Zero variance (no
    * deaths, or one group empty at every death time) yields NULL
    * statistics, never NaN. One data-sized aggregation; everything after
    * is time-distinct-sized. */
  def logRank(
      obs: DataFrame,
      groupCol: String,
      timeCol: String,
      eventCol: String,
      alphaSig: Double = 0.05): DataFrame = {
    val o = obs.select(
      col(groupCol).cast("string").as("g"),
      col(timeCol).cast("long").as("t"),
      col(eventCol).cast("long").as("e"))
    val labels = o.select(col("g")).distinct().collect().map(_.getString(0)).sorted
    require(labels.length == 2, s"logRank needs exactly 2 groups, got ${labels.length}")
    val gA = labels(0)
    val perT = o
      .groupBy(col("t"))
      .agg(
        sum(when(col("g") === gA, col("e")).otherwise(0L)).as("d1"),
        sum(col("e")).as("d"),
        sum(when(col("g") === gA, 1L).otherwise(0L)).as("ended1"),
        count(lit(1)).as("ended"))
      .crossJoin(broadcast(o.agg(
        sum(when(col("g") === gA, 1L).otherwise(0L)).as("tot1"),
        count(lit(1)).as("tot"))))
    val dbl = (c: Column) => c.cast("double")
    val dec9 = org.apache.spark.sql.types.DecimalType(20, 9)
    // risk-set cumulatives via the two-phase prefix sum, NOT a global
    // Window.orderBy(t): perT is distinct-event-time-sized, which grows
    // with the data under fine-grained timestamps — the exact shape that
    // funnels 100 TB through one task as a single-partition window. The
    // exclusive cumulative the risk set needs is the inclusive running
    // sum minus the current row's own value (t is distinct after the
    // groupBy, so the order is total and the result is bit-identical).
    val cum = PrefixSum.withRunning(
      perT,
      order = Seq(col("t")),
      running = Seq("__cum_ended1" -> col("ended1"), "__cum_ended" -> col("ended")))
    val risk = cum
      .withColumn("n1t", col("tot1") - (col("__cum_ended1") - col("ended1")))
      .withColumn("nt", col("tot") - (col("__cum_ended") - col("ended")))
      .drop("__cum_ended1", "__cum_ended")
      .filter(col("d") > 0)
    val r = dbl(col("n1t")) / dbl(col("nt"))
    val terms = risk.select(
      col("d1"), col("d"), col("tot1"), col("tot"),
      round(dbl(col("d")) * r, 9).cast(dec9).as("e1t"),
      when(col("nt") > 1,
        round(
          dbl(col("d")) * r * (lit(1.0) - r) * dbl(col("nt") - col("d")) / dbl(col("nt") - 1),
          9))
        .otherwise(lit(0.0)).cast(dec9).as("vt"))
    val agg = terms.agg(
      first(col("tot1")).as("n_1"),
      first(col("tot") - col("tot1")).as("n_2"),
      sum(col("d1")).as("o_1"),
      sum(col("d")).as("d_total"),
      round(sum(col("e1t")), 6).cast("double").as("e_1"),
      round(sum(col("vt")), 6).cast("double").as("v"))
    agg
      .select(
        col("n_1"), col("n_2"), col("o_1"),
        col("e_1"),
        (col("d_total") - col("o_1")).as("o_2"),
        round(dbl(col("d_total")) - col("e_1"), 6).as("e_2"),
        col("v"),
        round(
          when(col("v") > 0,
            (dbl(col("o_1")) - col("e_1")) * (dbl(col("o_1")) - col("e_1")) / col("v")),
          6).as("chi2"),
        round(
          when(col("v") > 0, (dbl(col("o_1")) - col("e_1")) / sqrt(col("v"))),
          6).as("z"))
      .withColumn("p_value", when(col("z").isNotNull, DataQuality.normalTwoSidedP(col("z"))))
      .withColumn("significant",
        when(col("p_value").isNotNull, col("p_value") <= alphaSig))
  }

  /** Association rules over (user, day) baskets of event types (the
    * market-basket read of a behavior log — "users who X that day also Y",
    * the cross-sell / journey-design primitive): for every ORDERED type
    * pair a→b co-present in a basket, support = n_ab/N, confidence =
    * n_ab/n_a, lift = n_ab·N/(n_a·n_b) (>1 = positive association, <1 =
    * substitution). Presence is DISTINCT per basket (counts don't inflate
    * support); all four counts are exact integers, each metric one
    * fixed-order double under round(·, 6). One distinct pass, one
    * basket-keyed self-join on the type-pair (type vocabulary is small, so
    * the pair frame is baskets × pairs-per-basket — bounded by k²·N), then
    * type-pair-sized rollups. */
  def assocRules(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String): DataFrame = {
    val baskets = events
      .select(
        col(userCol).as("u"),
        to_date(col(tsCol)).as("day"),
        col(typeCol).cast("string").as("t"))
      .distinct()
    val nBaskets = baskets.select(col("u"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val nType = baskets.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val co = baskets.as("a")
      .join(
        baskets.as("b"),
        col("a.u") === col("b.u") && col("a.day") === col("b.day") &&
          col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(count(lit(1)).as("n_ab"))
    val directed = co.select(col("ta").as("antecedent"), col("tb").as("consequent"), col("n_ab"))
      .unionByName(co.select(col("tb").as("antecedent"), col("ta").as("consequent"), col("n_ab")))
    val nD  = col("n_baskets").cast("double")
    val nab = col("n_ab").cast("double")
    directed
      .join(broadcast(nType.select(col("t").as("antecedent"), col("n_t").as("n_ante"))), Seq("antecedent"))
      .join(broadcast(nType.select(col("t").as("consequent"), col("n_t").as("n_cons"))), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("antecedent"),
        col("consequent"),
        col("n_ab"),
        col("n_ante"),
        col("n_cons"),
        round(nab / nD, 6).as("support"),
        round(nab / col("n_ante").cast("double"), 6).as("confidence"),
        round(nab * nD / (col("n_ante").cast("double") * col("n_cons").cast("double")), 6)
          .as("lift"))
  }

  /** Post-hoc power analysis of a two-proportion A/B design (the "could
    * this experiment even have detected its own lift" sanity check, and
    * the sample-size planner for the next one): from the observed
    * per-variant conversion rates, observed_power = Φ(|p_a−p_b|/se − z_α)
    * with the unpooled se, and n_required_per_arm for the target power =
    * ⌈(z_α+z_β)²·(p_a(1−p_a)+p_b(1−p_b))/(p_a−p_b)²⌉. Φ reuses the
    * engine-wide erfc polynomial (two-sided halves, sign-cased). Counts
    * are exact integers from one conditional aggregation; every float is
    * a fixed-order chain under round(·, 6) (the ceil runs on a grid-9
    * snap so engines never straddle an integer boundary). Input: one row
    * per subject with (variant 0/1, converted 0/1). */
  def abPowerAnalysis(
      assignments: DataFrame,
      variantCol: String,
      convertedCol: String,
      zAlpha: Double = 1.959964,
      zBeta: Double = 0.841621): DataFrame = {
    val v = assignments.agg(
      sum(when(col(variantCol) === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col(variantCol) === 0, col(convertedCol).cast("long")).otherwise(0L)).as("xa"),
      sum(when(col(variantCol) === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col(variantCol) === 1, col(convertedCol).cast("long")).otherwise(0L)).as("xb"))
    val pa = col("xa").cast("double") / col("na").cast("double")
    val pb = col("xb").cast("double") / col("nb").cast("double")
    val se = sqrt(pa * (lit(1.0) - pa) / col("na").cast("double")
      + pb * (lit(1.0) - pb) / col("nb").cast("double"))
    val zEff = abs(pa - pb) / se
    // Phi(u) from the shared two-sided erfc polynomial: u >= 0 -> 1 - P(u)/2
    def phi(u: org.apache.spark.sql.Column) =
      when(u >= 0.0, lit(1.0) - DataQuality.normalTwoSidedP(u) / lit(2.0))
        .otherwise(DataQuality.normalTwoSidedP(u) / lit(2.0))
    val nReq = ceil(round(
      lit((zAlpha + zBeta) * (zAlpha + zBeta)) *
        (pa * (lit(1.0) - pa) + pb * (lit(1.0) - pb)) /
        ((pa - pb) * (pa - pb)), 9)).cast("long")
    v.select(
      col("na"), col("xa"), col("nb"), col("xb"),
      round(pa, 6).as("p_a"),
      round(pb, 6).as("p_b"),
      round(when(se > 0.0, phi(round(zEff - lit(zAlpha), 6))), 6).as("observed_power"),
      when(se > 0.0 && abs(pa - pb) > 0.0, nReq).as("n_required_per_arm"))
  }

  /** RFM segmentation (recency / frequency / monetary — the classic
    * behavioral quintile grid): per user, days since last purchase,
    * purchase count, and exact-cent spend; each dimension is cut into
    * quintiles by NTILE(5) over a TOTAL order (metric, then user id — the
    * tiebreak that makes the bucketing engine-identical), 1 = best.
    * Output one row per occupied (r, f, m) cell with its population and
    * exact-decimal average spend — the segment table a lifecycle team
    * actually routes on. One user-keyed aggregation; each quintile cut is
    * a two-phase [[PrefixSum]] global row number + the SQL-standard NTILE
    * formula over it — bucket-identical to `ntile(5).over(orderBy(...))`
    * but distributed (the user rollup grows with the corpus; a global
    * ntile window would funnel it through one task at 100×). */
  def rfmSegments(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      purchaseType: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 0)
    val perUser = events
      .filter(purchaseType)
      .groupBy(col(userCol).as("u"))
      .agg(
        max(to_date(col(tsCol))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(round(col(valueCol) * 100).cast("long").cast(dec)).cast(dec).as("cents"))
    // total user count rides the plan as a broadcast scalar (no action)
    val nUsers = broadcast(perUser.agg(count(lit(1)).as("__n_users")))
    val withRns = Seq(
      ("__rn_r", Seq(col("last_day").desc, col("u").asc)),
      ("__rn_f", Seq(col("freq").desc, col("u").asc)),
      ("__rn_m", Seq(col("cents").desc, col("u").asc)))
      .foldLeft(perUser) { case (acc, (rn, ord)) =>
        PrefixSum.withRunning(acc, ord, Seq.empty, rowNumberAs = Some(rn))
      }
      .crossJoin(nUsers)
    val scored = withRns.select(
      col("u"),
      col("freq"),
      col("cents"),
      PrefixSum.ntileFromRowNumber(col("__rn_r"), 5, col("__n_users")).as("r_seg"),
      PrefixSum.ntileFromRowNumber(col("__rn_f"), 5, col("__n_users")).as("f_seg"),
      PrefixSum.ntileFromRowNumber(col("__rn_m"), 5, col("__n_users")).as("m_seg"))
    scored
      .groupBy(col("r_seg"), col("f_seg"), col("m_seg"))
      .agg(
        count(lit(1)).as("n_users"),
        round(sum(col("cents")).cast("double") / (count(lit(1)).cast("double") * 100.0), 6)
          .as("avg_monetary"))
  }
}
