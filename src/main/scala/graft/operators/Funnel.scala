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
}
