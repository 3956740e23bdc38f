package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` stream table.
  *
  * No reference counterpart (SURVEY.md §2e: the reference has no streaming).
  * The transforms are defined ONCE and applied to either a batch or a
  * streaming DataFrame — the batch shape is what the oracle checks
  * (`events_hourly_agg` in Relational), and the specs assert
  * batch ≡ streaming on the same input.
  *
  * Scale design: tumbling windows + watermark bound state; sessionization
  * uses flatMapGroupsWithState with event-time timeout so state for idle
  * users is evicted, not accumulated.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. Works on batch or stream —
    * on a stream, callers add `withWatermark("ts", ...)` upstream. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** Streaming variant with a watermark (late data beyond 2h dropped,
    * window state evicted — bounded state at any scale). */
  def hourlyAggStream(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "2 hours"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, sumValue: Double)
  final case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Int, sum_value: Double)

  /** Sessionize per user with a gap timeout: custom state machine via
    * flatMapGroupsWithState (the engine's "arbitrary stateful operator"
    * surface — the streaming analogue of the reference's opaque whole-group
    * juice). Emits a session when `gap` passes with no activity. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sumValue))
          } else {
            // order-insensitive fold within the micro-batch; sessions split
            // on gaps inside the batch are emitted eagerly
            val sorted = evs.toVector.sortBy(_.ts.getTime)
            var cur    = state.getOption
            val out    = Vector.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sumValue + e.value))
                case Some(s) =>
                  out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.result().iterator
          }
        })
  }

  /** Batch-mode sessionization with identical semantics (window lag over
    * event time → gap flags → running session ids → per-session agg) — used
    * by the spec to cross-check the stateful streaming path, and by batch
    * pipelines directly. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMs = gapMinutes * 60 * 1000L
    val w     = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull || unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("sum_value"))
      .drop("session_idx")
  }

  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** Running per-user totals via mapGroupsWithState — the one-output-per-
    * group-per-batch stateful shape (vs flatMapGroupsWithState's 0..n
    * emissions in [[sessionize]]). State is O(1) per user forever; used for
    * live per-entity counters that each micro-batch refreshes. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Event], state: GroupState[UserTotals]) => {
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
          var n    = prev.n_events
          var s    = prev.sum_value
          evs.foreach { e => n += 1; s += e.value }
          val next = UserTotals(userId, n, s)
          state.update(next)
          next
        })
  }

  final case class FunnelState(stages: Seq[Option[Long]])
  final case class FunnelProgress(
      user_id: Long,
      stage_ts: Seq[Option[Timestamp]],
      n_stages: Int)

  /** Streaming ordered funnel: the live counterpart of
    * [[graft.operators.Funnel.firstReach]] — per-user first-reach times for
    * a fixed stage sequence (stage i+1 strictly after stage i), refreshed
    * every micro-batch via mapGroupsWithState. Applies the SAME fold step
    * as the batch operator to each batch's time-sorted events, so on an
    * in-order stream the converged state equals the batch result
    * (StreamingSpec asserts it). Stage times only ever fill
    * monotonically — O(k) state per user forever, no event buffering.
    *
    * Late data caveat (inherent to forward-only funnel state): an event
    * older than an already-recorded stage time cannot retroactively
    * improve it; feed an in-order (or watermark-reordered) stream where
    * that matters. */
  def funnelStream(events: Dataset[Event], stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val k = stages.size
    // state keeps epoch MICROS (full Timestamp precision — millis would
    // silently truncate sub-ms event times and diverge from the batch fold)
    def micros(t: Timestamp): Long   = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def fromMicros(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }

    events
      .filter(e => stages.contains(e.event_type))
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Event], state: GroupState[FunnelState]) => {
          var cur: Seq[Option[Long]] =
            state.getOption.map(_.stages).getOrElse(Seq.fill(k)(None))
          evs.toVector.sortBy(e => micros(e.ts)).foreach { e =>
            val t = micros(e.ts)
            // same read-the-previous-accumulator step as the batch fold
            val prev = cur
            cur = stages.zipWithIndex.map { case (st, i) =>
              prev(i).orElse {
                val prevOk = i == 0 || prev(i - 1).exists(_ < t)
                if (e.event_type == st && prevOk) Some(t) else None
              }
            }
          }
          state.update(FunnelState(cur))
          FunnelProgress(userId, cur.map(_.map(fromMicros)), cur.count(_.isDefined))
        })
  }

  final case class ZHistory(vals: Seq[Double])
  final case class ZScore(id: Long, key: Long, z: Double)

  /** Streaming trailing z-score — the live counterpart of
    * [[graft.operators.TimeSeries.trailingZScore]]: each event scored
    * against its user's previous ≤ `window` values, state a bounded
    * O(window) deque per user via flatMapGroupsWithState (0..n scored
    * rows per group per batch).
    *
    * Bit-exact convergence contract (spec-pinned on in-order streams): the
    * fold replays the EXACT arithmetic the batch WindowExec runs per frame
    * — ordered left-fold sum then /n for the mean (Spark's Average), the
    * Welford/CentralMomentAgg update sequence for the sample stddev, and
    * HALF_UP BigDecimal rounding (Spark's round) — so streamed z values
    * equal the batch query's to the last bit, not just approximately.
    * Out-of-order arrivals score against state-at-arrival (the batch
    * operator re-sorts globally); in-order delivery ⇒ exact equality. */
  def zscoreStream(events: Dataset[Event], window: Int = 10): Dataset[ZScore] = {
    require(window >= 2, s"window must be >= 2, got $window")
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Event], state: GroupState[ZHistory]) => {
          var hist = state.getOption.map(_.vals).getOrElse(Seq.empty)
          val out  = Vector.newBuilder[ZScore]
          evs.toVector.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (hist.size >= 2) {
              // Spark Average over the frame: ordered sum, then one divide;
              // μ/σ snap to the 6-decimal grid BEFORE the division, exactly
              // like the batch trailingZScore (1/σ would amplify σ's ulp
              // freedom past the final rounding grid)
              var s = 0.0
              hist.foreach(x => s += x)
              val mu = round6(s / hist.size)
              // Spark CentralMomentAgg (Welford) in frame order
              var n = 0.0; var mean = 0.0; var m2 = 0.0
              hist.foreach { x =>
                n += 1.0
                val d  = x - mean
                val dn = d / n
                mean += dn
                m2 += d * (x - mean)
              }
              val sd = round6(math.sqrt(m2 / (n - 1.0)))
              if (sd > 0) out += ZScore(e.event_id, userId, round6((e.value - mu) / sd))
            }
            hist = (hist :+ e.value).takeRight(window)
          }
          state.update(ZHistory(hist))
          out.result().iterator
        })
  }

  final case class PhState(n: Long, sU: Long, mU: Long, mnU: Long, started: Boolean)
  final case class PhScore(key: Long, id: Long, ph: Double, alarm: Boolean)

  /** Streaming Page-Hinkley drift detector — the live counterpart of
    * [[graft.operators.TimeSeries.pageHinkley]] (which IS its replay
    * spec): per key, O(1) state (n, Σv, m, min m) as EXACT unscaled
    * longs on the 1e-9 grid, each event folded as
    * term = snap₉((v − Σv/n) − δ), m += term, alarm when m − min m > λ.
    * The fold mirrors the batch operator's arithmetic move for move —
    * decimal-exact sums, one correctly-rounded double division for the
    * running mean, HALF_UP snapping — so under event-time-ordered arrival
    * streamed (ph, alarm) equal the batch rows bit for bit (spec-pinned);
    * the funnelStream ordering caveat applies to cross-batch late
    * arrivals. Unscaled-long state bounds |Σv| < 9.2e9 in value units —
    * far above any metric stream this detector watches. */
  def pageHinkleyStream(
      events: Dataset[Event],
      delta: Double,
      lambda: java.math.BigDecimal): Dataset[PhScore] = {
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val lambdaU = lambda.setScale(9).unscaledValue().longValueExact()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, evs: Iterator[Event], state: GroupState[PhState]) => {
          var st  = state.getOption.getOrElse(PhState(0L, 0L, 0L, 0L, started = false))
          val out = Vector.newBuilder[PhScore]
          evs.toVector.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val v  = java.math.BigDecimal.valueOf(e.value).setScale(9, java.math.RoundingMode.HALF_UP)
            val n  = st.n + 1
            val sU = st.sU + v.unscaledValue().longValueExact()
            val mean = java.math.BigDecimal.valueOf(sU, 9).doubleValue() / n.toDouble
            val termU = java.math.BigDecimal
              .valueOf((v.doubleValue() - mean) - delta)
              .setScale(9, java.math.RoundingMode.HALF_UP)
              .unscaledValue().longValueExact()
            val mU  = st.mU + termU
            val mnU = if (!st.started) mU else math.min(st.mnU, mU)
            st = PhState(n, sU, mU, mnU, started = true)
            val phU = mU - mnU
            out += PhScore(
              key, e.event_id,
              java.math.BigDecimal.valueOf(phU, 9)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(),
              phU > lambdaU)
          }
          state.update(st)
          out.result().iterator
        })
  }

  final case class HwState(l: Double, b: Double, t: Long, s: Array[Double], started: Boolean)
  final case class HwSnapshot(
      key: String, n: Long, level: Double, trend: Double,
      season_next: Double, forecast_next: Double)

  /** Streaming Holt-Winters — the live twin of
    * [[graft.operators.TimeSeries.holtWintersFinal]]: per-key state is
    * exactly (level, trend, step count, the `period` seasonal slots) —
    * O(p) doubles regardless of stream length — folded in event-time
    * order within each micro-batch and emitted as a refreshed snapshot
    * per batch (Update mode). Every step runs the BATCH operator's
    * arithmetic in the same order (same binary-exact coefficients, same
    * zero-seasonal init), so under event-time-ordered arrival across
    * batches the final snapshot is BIT-IDENTICAL to the batch fold over
    * the same rows (StreamingSpec pins it; the ordered-arrival caveat is
    * the same one every order-sensitive stream here carries). */
  def holtWintersStream(
      events: Dataset[Event],
      alpha: Double,
      beta: Double,
      gamma: Double,
      period: Int): Dataset[HwSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: String, evs: Iterator[Event], state: GroupState[HwState]) => {
          var st = state.getOption
            .getOrElse(HwState(0.0, 0.0, 0L, Array.fill(period)(0.0), started = false))
          evs.toVector.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val v = e.value
            if (!st.started) st = HwState(v, 0.0, 1L, st.s, started = true)
            else {
              val i    = (st.t % period).toInt
              val sOld = st.s(i)
              val newL = alpha * (v - sOld) + (1.0 - alpha) * (st.l + st.b)
              val newB = beta * (newL - st.l) + (1.0 - beta) * st.b
              val ns   = st.s.clone()
              ns(i) = gamma * (v - newL) + (1.0 - gamma) * sOld
              st = HwState(newL, newB, st.t + 1, ns, started = true)
            }
          }
          state.update(st)
          val slot = (st.t % period).toInt
          HwSnapshot(key, st.t, r6(st.l), r6(st.b), r6(st.s(slot)), r6(st.l + st.b + st.s(slot)))
        })
  }

  final case class CusumState(hours: Map[Long, Long])
  final case class CusumPoint(
      hour_start: Timestamp, x: Long, cusum: Double, is_peak: Boolean, n_total: Long)

  /** Streaming CUSUM changepoint scan — the live counterpart of
    * [[graft.operators.TimeSeries.cusum]] (which IS its replay spec).
    * CUSUM is RETROSPECTIVE by definition (C_t = Σ_{i≤t}(x_i − x̄) needs
    * the global mean x̄, unlike Page-Hinkley's running-mean online form),
    * so the live twin keeps the COMPRESSED hourly-count axis as state —
    * one (hour → count) entry per hour, time-bounded, never data-sized;
    * it is exactly the axis the batch operator's window runs on — and
    * re-emits the refreshed full scan every micro-batch (Update mode).
    * Each snapshot row carries `n_total` (events folded so far), so the
    * converged scan is the row set with the maximum n_total.
    *
    * Arithmetic parity with the batch operator, move for move: hour
    * truncation on the micros grid (≡ date_trunc('hour') under the UTC
    * session the engine pins), exact integer n·C_t = n·Σ_{i≤t}x_i − t·S
    * (BigInt, the batch side's DECIMAL(38,0)), ONE double division per
    * row snapped HALF_UP to 1e-6, and is_peak as an exact |n·C_t| = max
    * compare (ties all flag). Under event-time-ordered arrival the final
    * snapshot equals the batch rows bit for bit (StreamingSpec pins it).
    * The single group key is correct, not a funnel: the series is global
    * by definition and the state it carries is the hour axis, not the
    * event log. */
  def cusumStream(events: Dataset[Event]): Dataset[CusumPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourMicros = 3600L * 1000000L
    def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Int, evs: Iterator[Event], state: GroupState[CusumState]) => {
          var hours = state.getOption.map(_.hours).getOrElse(Map.empty[Long, Long])
          evs.foreach { e =>
            val h = Math.floorDiv(micros(e.ts), hourMicros) * hourMicros
            hours = hours.updated(h, hours.getOrElse(h, 0L) + 1L)
          }
          state.update(CusumState(hours))
          val series = hours.toVector.sortBy(_._1)
          val n      = BigInt(series.size)
          val s      = BigInt(series.iterator.map(_._2).sum)
          val total  = series.iterator.map(_._2).sum
          var cum    = BigInt(0)
          val nc = series.zipWithIndex.map { case ((h, x), i) =>
            cum += x
            (h, x, n * cum - BigInt(i + 1) * s)
          }
          val pk = if (nc.isEmpty) BigInt(0) else nc.iterator.map(_._3.abs).max
          nc.iterator.map { case (h, x, v) =>
            CusumPoint(
              new Timestamp(h / 1000L),
              x,
              java.math.BigDecimal
                .valueOf(v.toDouble / n.toDouble)
                .setScale(6, java.math.RoundingMode.HALF_UP)
                .doubleValue(),
              v.abs == pk,
              total)
          }
        })
  }

  final case class RunsState(hours: Map[Long, Long])
  final case class RunsPoint(
      n_above: Option[Long],
      n_below: Option[Long],
      runs: Option[Long],
      expected_runs: Option[Double],
      z: Option[Double],
      p_value: Option[Double],
      n_total: Long)

  /** Streaming Wald–Wolfowitz runs test — the live counterpart of
    * [[graft.operators.TimeSeries.runsTest]] (its replay spec). Like
    * [[cusumStream]], the test is retrospective (signs compare against the
    * median of the WHOLE series), so the state is the compressed
    * (hour → count) axis — time-bounded, never data-sized — and every
    * micro-batch re-emits the refreshed one-row statistic (Update mode;
    * `n_total` marks the converged snapshot).
    *
    * Arithmetic parity, move for move: the median by the batch side's
    * cumulative-count rule (first value whose cum ≥ (n+1)/2 under float
    * division), exact integer signs/runs/flips, E[R]/Var[R]/z in the same
    * double order, HALF_UP snaps at 1e-6, and the shared erfc-polynomial
    * p at 1e-9 — bit-identical to the batch row on ordered arrival
    * (StreamingSpec pins it). Degenerate parity: a constant series (every
    * hour equals the median, signed frame empty) emits ALL-NULL statistic
    * columns exactly like the batch aggregate over the empty frame —
    * never a fabricated runs=1 row (StreamingSpec pins this too). */
  def runsTestStream(events: Dataset[Event]): Dataset[RunsPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourMicros = 3600L * 1000000L
    def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def r(v: Double, scale: Int): Double =
      java.math.BigDecimal.valueOf(v).setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Int, evs: Iterator[Event], state: GroupState[RunsState]) => {
          var hours = state.getOption.map(_.hours).getOrElse(Map.empty[Long, Long])
          evs.foreach { e =>
            val h = Math.floorDiv(micros(e.ts), hourMicros) * hourMicros
            hours = hours.updated(h, hours.getOrElse(h, 0L) + 1L)
          }
          state.update(RunsState(hours))
          val series = hours.toVector.sortBy(_._1).map(_._2)
          val total  = series.sum
          // median: first count value whose cumulative frequency reaches
          // (n+1)/2 — the batch operator's float-division threshold
          val hist = series.groupBy(identity).view.mapValues(_.size.toLong).toVector.sortBy(_._1)
          val thr  = (series.size + 1) / 2.0
          var cum  = 0L
          var med  = Long.MinValue
          hist.foreach { case (v, c) =>
            if (med == Long.MinValue) { cum += c; if (cum >= thr) med = v }
          }
          val signed = series.filter(_ != med).map(x => if (x > med) 1 else 0)
          if (signed.isEmpty) {
            // batch parity: TimeSeries.runsTest aggregates an EMPTY signed
            // frame on a constant/median-flat series, so every statistic
            // column is NULL — mirror that, never a fabricated runs=1 row
            Iterator.single(RunsPoint(None, None, None, None, None, None, total))
          } else {
            val n1 = signed.count(_ == 1).toLong
            val n2 = signed.size.toLong - n1
            val runs =
              1L + signed.iterator.sliding(2).withPartial(false).count(p => p(0) != p(1))
            val (n1d, n2d) = (n1.toDouble, n2.toDouble)
            val nTd = n1d + n2d
            val er  = 2.0 * n1d * n2d / nTd + 1.0
            val vr  = 2.0 * n1d * n2d * (2.0 * n1d * n2d - n1d - n2d) / (nTd * nTd * (nTd - 1.0))
            val z   = if (vr > 0.0) Some(r((runs.toDouble - er) / math.sqrt(vr), 6)) else None
            val p = z.map { zz =>
              val x    = math.abs(zz) / math.sqrt(2.0)
              val t    = 1.0 / (1.0 + 0.3275911 * x)
              val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
                - 0.284496736) * t + 0.254829592) * t
              r(poly * math.exp(-x * x), 9)
            }
            Iterator.single(RunsPoint(Some(n1), Some(n2), Some(runs), Some(r(er, 6)), z, p, total))
          }
        })
  }

  final case class SprtState(days: Map[Long, (Long, Long)])
  final case class SprtPoint(
      day: String, n_cum: Long, conv_cum: Long, llr: Double, decision: String, n_total: Long)

  /** Streaming Wald SPRT — the live counterpart of
    * [[graft.operators.Funnel.sprtDaily]] (its replay spec). Like
    * [[cusumStream]], the state is the COMPRESSED daily rollup — one
    * (day → (n, conversions)) entry per day, calendar-bounded — and every
    * micro-batch re-emits the refreshed day-cumulative trajectory with its
    * decision column (Update mode; `n_total` marks the converged snapshot).
    * That matches how the test is actually served: the decision for day d
    * legitimately updates while d's events are still arriving, and
    * freezes once arrival passes d.
    *
    * Parity: the four log-likelihood constants snap to the 1e-12 grid
    * exactly as the batch side's DECIMAL(13,12) literals; llr is the exact
    * decimal linear combination c·ln(p1/p0) + (n−c)·ln((1−p1)/(1−p0)) of
    * exact counts; decisions compare on the UNROUNDED scale-12 value; the
    * emitted llr rounds HALF_UP to 1e-6 — bit-identical to the batch rows
    * on ordered arrival (StreamingSpec pins it). */
  def sprtStream(
      events: Dataset[Event],
      convType: String,
      p0: Double,
      p1: Double,
      alpha: Double = 0.05,
      beta: Double = 0.05): Dataset[SprtPoint] = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1, "need distinct p0,p1 in (0,1)")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1, "alpha,beta in (0,1)")
    val spark = events.sparkSession
    import spark.implicits._
    def snap12(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(math.log(x)).setScale(12, java.math.RoundingMode.HALF_UP)
    val l1 = snap12(p1 / p0)
    val l0 = snap12((1.0 - p1) / (1.0 - p0))
    val hi = snap12((1.0 - beta) / alpha)
    val lo = snap12(beta / (1.0 - alpha))
    val dayMicros = 86400L * 1000000L
    def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Int, evs: Iterator[Event], state: GroupState[SprtState]) => {
          var days = state.getOption.map(_.days).getOrElse(Map.empty[Long, (Long, Long)])
          evs.foreach { e =>
            val d        = Math.floorDiv(micros(e.ts), dayMicros)
            val (dn, dc) = days.getOrElse(d, (0L, 0L))
            days = days.updated(d, (dn + 1L, dc + (if (e.event_type == convType) 1L else 0L)))
          }
          state.update(SprtState(days))
          val series = days.toVector.sortBy(_._1)
          val total  = series.iterator.map(_._2._1).sum
          var nCum   = 0L
          var cCum   = 0L
          series.iterator.map { case (d, (dn, dc)) =>
            nCum += dn
            cCum += dc
            val llr12 = java.math.BigDecimal
              .valueOf(cCum).multiply(l1)
              .add(java.math.BigDecimal.valueOf(nCum - cCum).multiply(l0))
            val decision =
              if (llr12.compareTo(hi) >= 0) "accept_h1"
              else if (llr12.compareTo(lo) <= 0) "accept_h0"
              else "continue"
            SprtPoint(
              java.time.LocalDate.ofEpochDay(d).toString,
              nCum,
              cCum,
              llr12.setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(),
              decision,
              total)
          }
        })
  }

  final case class JsdState(counts: Map[String, Long])
  final case class JsdPoint(
      category: String, n_a: Long, n_b: Long,
      share_a: Double, share_b: Double, js_contrib: Double, n_total: Long)

  /** Streaming Jensen-Shannon drift monitor — the live counterpart of
    * [[graft.operators.DataQuality.jsDivergence]] (its replay spec): the
    * REFERENCE distribution (yesterday's category counts, the training
    * mix, the contract) is fixed up front; the live side folds arriving
    * category counts into category-bounded state and every micro-batch
    * re-emits the per-category JSD contributions of live-so-far vs
    * reference (Update mode; `n_total` marks the converged snapshot).
    * This is the ingest-side drift alarm: sum(js_contrib) crossing the
    * alert threshold mid-stream is the point of the operator — the batch
    * op only says it AFTER the window closes.
    *
    * Parity with the batch operator, move for move: exact integer counts,
    * shares as one double division each, p·ln(p/m) terms in the same
    * fixed order (zero-count sides contribute exactly 0), the contribution
    * snapped HALF_UP to the 1e-12 grid and shares to 1e-6 — the converged
    * snapshot equals the batch rows bit for bit (StreamingSpec pins it;
    * arrival order is immaterial here, counts commute). */
  def jsdStream(
      events: Dataset[Event],
      reference: Map[String, Long]): Dataset[JsdPoint] = {
    require(reference.nonEmpty && reference.valuesIterator.forall(_ >= 0L),
      "reference needs nonnegative category counts")
    val spark = events.sparkSession
    import spark.implicits._
    def r(x: Double, s: Int): Double =
      java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    val ta = reference.valuesIterator.sum.toDouble
    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Int, evs: Iterator[Event], state: GroupState[JsdState]) => {
          var live = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
          evs.foreach { e =>
            live = live.updated(e.event_type, live.getOrElse(e.event_type, 0L) + 1L)
          }
          state.update(JsdState(live))
          val tb    = live.valuesIterator.sum
          val total = tb
          val cats  = (reference.keySet ++ live.keySet).toVector.sorted
          cats.iterator.map { cat =>
            val na = reference.getOrElse(cat, 0L)
            val nb = live.getOrElse(cat, 0L)
            val p  = na.toDouble / ta
            val q  = nb.toDouble / tb.toDouble
            val m  = (p + q) * 0.5
            def term(x: Double) = if (x > 0.0) x * math.log(x / m) else 0.0
            JsdPoint(cat, na, nb, r(p, 6), r(q, 6), r((term(p) + term(q)) * 0.5, 12), total)
          }
        })
  }

  final case class DriftTlState(cells: Map[String, Map[String, Long]])
  final case class DriftDay(day: String, n_events: Long, jsd: Double, n_total: Long)

  /** Streaming drift TIMELINE — the live counterpart of
    * [[graft.operators.DataQuality.driftTimeline]] (its replay spec):
    * per-day JSD of each day's categorical mix against a FIXED reference
    * mix, re-emitted for every day on every micro-batch (Update mode;
    * `n_total` marks the converged snapshot — a day's divergence
    * legitimately moves while its events are still arriving and freezes
    * once arrival passes it). State is the (day → category → count) grid —
    * calendar × category bounded, never data-sized.
    *
    * Arithmetic parity, move for move: exact integer counts, shares as one
    * double division each, p·ln(p/m) terms in the batch operator's fixed
    * order snapped HALF_UP to the 1e-12 grid, and the per-day sum
    * accumulated as EXACT BigDecimal (the batch side's DECIMAL(20,12)
    * sum), rounded at 6 — bit-identical to the batch rows at convergence
    * (StreamingSpec pins it; counts commute, so arrival order is
    * immaterial). */
  def driftTimelineStream(
      events: Dataset[Event],
      reference: Map[String, Long]): Dataset[DriftDay] = {
    require(reference.nonEmpty && reference.valuesIterator.forall(_ >= 0L),
      "reference needs nonnegative category counts")
    val spark = events.sparkSession
    import spark.implicits._
    def r(x: Double, s: Int): Double =
      java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    val tRef      = reference.valuesIterator.sum.toDouble
    val dayMicros = 86400L * 1000000L
    def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Int, evs: Iterator[Event], state: GroupState[DriftTlState]) => {
          var cells = state.getOption.map(_.cells).getOrElse(Map.empty[String, Map[String, Long]])
          evs.foreach { e =>
            // UTC day truncation on the micros grid (the cusumStream
            // discipline) — no JVM-default-timezone dependence
            val day = java.time.LocalDate
              .ofEpochDay(Math.floorDiv(micros(e.ts), dayMicros))
              .toString
            val m   = cells.getOrElse(day, Map.empty[String, Long])
            cells = cells.updated(day, m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L))
          }
          state.update(DriftTlState(cells))
          val total = cells.valuesIterator.map(_.valuesIterator.sum).sum
          // category universe = everything seen anywhere (the batch
          // scaffold) plus the reference's own categories
          val cats = (cells.valuesIterator.flatMap(_.keysIterator).toSet ++ reference.keySet)
            .toVector.sorted
          cells.keysIterator.toVector.sorted.iterator.map { day =>
            val dm   = cells(day)
            val tDay = dm.valuesIterator.sum
            var sum  = java.math.BigDecimal.ZERO
            cats.foreach { cat =>
              val p = dm.getOrElse(cat, 0L).toDouble / tDay.toDouble
              val q = reference.getOrElse(cat, 0L).toDouble / tRef
              val m = (p + q) * 0.5
              def term(x: Double) = if (x > 0.0) x * math.log(x / m) else 0.0
              sum = sum.add(java.math.BigDecimal.valueOf(r((term(p) + term(q)) * 0.5, 12)))
            }
            DriftDay(day, tDay, r(sum.doubleValue(), 6), total)
          }
        })
  }

  final case class KmvState(hashes: Array[Long], nRows: Long)
  final case class KmvEstimate(event_type: String, distinct_est: Double, n_rows: Long)

  /** Live KMV distinct estimate per event type: mapGroupsWithState holds
    * each group's k smallest distinct mix64 user hashes — O(k) state per
    * key, NEVER the user set — and every micro-batch emits the refreshed
    * estimate (Update mode). The state fold reuses the batch aggregator's
    * exact insert and the batch column's exact estimate arithmetic
    * ([[graft.operators.Sketches.kmvInsert]] / kmvEstimateValue), so after
    * any prefix of the stream the estimate is BIT-IDENTICAL to running the
    * batch [[graft.operators.Sketches.kmvDistinct]] over the same rows —
    * the persisted-sketch contract, live (StreamingSpec pins it). */
  def kmvStream(events: Dataset[Event], k: Int = 128): Dataset[KmvEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (eventType: String, evs: Iterator[Event], state: GroupState[KmvState]) => {
          var buf = state.getOption.map(_.hashes).getOrElse(Array.emptyLongArray)
          var n   = state.getOption.map(_.nRows).getOrElse(0L)
          evs.foreach { e =>
            buf = graft.operators.Sketches.kmvInsert(buf, k, graft.functions.Mix64.mix(e.user_id))
            n += 1
          }
          state.update(KmvState(buf, n))
          KmvEstimate(eventType, graft.operators.Sketches.kmvEstimateValue(buf, k), n)
        })
  }

  /** Streaming count-min matrix — the frequency-serving twin of
    * [[graft.operators.Sketches.cmsCounts]]. Count-min is LINEAR
    * (counters are sums of per-row indicators), so unlike SpaceSaving
    * the stream needs no order-sensitive fold at all: each event
    * explodes to its `depth` (row, bucket) cells — the same
    * splitmix64-seeded buckets as the batch sketch, computed by the
    * codegen'd Mix64 expression, no UDF — and a streaming groupBy
    * count IS the matrix. State is bounded by depth·2^logW cells
    * regardless of stream length or key cardinality, cells update in
    * parallel (no single global state group), and the result equals the
    * batch matrix EXACTLY under ANY micro-batch boundaries or arrival
    * order — linearity makes rebatching-invariance a theorem, not a
    * caveat (contrast spaceSavingStream's per-batch guarantee).
    * Works unchanged on a batch frame (the spec pins stream ≡ batch ≡
    * Sketches.cmsBuild cell for cell). */
  def cmsStream(events: DataFrame, keyCol: String, logW: Int = 10, depth: Int = 4): DataFrame = {
    require(logW >= 3 && logW <= 24, s"logW must be in [3,24], got $logW")
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    val cells = (0 until depth).map { r =>
      val seed = graft.operators.Sketches.BloomGolden * (r + 1).toLong
      struct(
        lit(r).as("row"),
        shiftrightunsigned(
          graft.functions.TextFunctions.mix64(col(keyCol).cast("long").bitwiseXOR(lit(seed))),
          64 - logW).as("bucket"))
    }
    events
      .select(explode(array(cells: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  final case class SsCounter(key: Long, count: Long, err: Long)
  final case class SsState(counters: Array[SsCounter], nRows: Long)
  final case class SsTop(shard: Int, key: Long, count_min: Long, count_max: Long, n_rows: Long)

  /** Streaming heavy hitters by SHARDED SpaceSaving (Metwally et al.
    * 2005 "Efficient Computation of Frequent and Top-k Elements in Data
    * Streams"): each of `shards` state groups holds exactly `k`
    * (key, count, err) counters — a hit increments its counter; a miss
    * evicts the MINIMUM counter, inheriting its count as the new key's
    * overestimation error. Per-key guarantees: true_count ∈
    * [count − err, count] within the shard, and any key with true
    * frequency > n_shard/k is guaranteed present — the classic bounded-
    * state answer to "top user_ids ever seen" that an exact groupBy
    * cannot give a stream.
    *
    * Scale shape: state is shards·k counters TOTAL regardless of stream
    * length or key cardinality; sharding by key-hash keeps the state
    * groups parallel (one global group would serialize the stream) and
    * the per-shard guarantee still merges downstream (Misra-Gries
    * summaries are mergeable: sum counts, keep top-k). Deterministic
    * tie-breaks (evict the min-count counter with the LARGEST key; ties
    * on output sort by count desc, key asc) make each micro-batch fold a
    * pure function of that batch's (ts, event_id)-sorted contents —
    * stream == batch replay exact for event-time-ordered arrival across
    * batches (the spec's single-batch pin). SpaceSaving itself is
    * order-sensitive, so a LATE arrival folded under different batch
    * boundaries can land in a different global position and shift
    * eviction choices — the determinism guarantee is per-batch, like
    * funnelStream's, not arbitrary-rebatching invariance. Emits each
    * shard's current top counters: (shard, key, count_min, count_max,
    * n_rows). */
  def spaceSavingStream(
      events: Dataset[Event],
      k: Int = 16,
      shards: Int = 4): Dataset[SsTop] = {
    require(k >= 1 && shards >= 1, "k and shards must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (graft.functions.Mix64.mix(e.user_id) % shards + shards) % shards)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (shard: Long, evs: Iterator[Event], state: GroupState[SsState]) => {
          var counters = state.getOption.map(_.counters.toBuffer).getOrElse(
            scala.collection.mutable.Buffer.empty[SsCounter])
          var n = state.getOption.map(_.nRows).getOrElse(0L)
          // SpaceSaving is ORDER-SENSITIVE (eviction depends on arrival
          // sequence): fold each batch in (ts, event_id) order — the same
          // move funnelStream makes — so each batch's fold is a pure
          // function of that batch's contents, not of partition iteration
          // order (cross-batch ordering is the scaladoc's caveat)
          evs.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            n += 1
            val i = counters.indexWhere(_.key == e.user_id)
            if (i >= 0) counters(i) = counters(i).copy(count = counters(i).count + 1)
            else if (counters.size < k) counters += SsCounter(e.user_id, 1L, 0L)
            else {
              // evict the min-count counter, largest key on ties — a total
              // order, so the state is a pure function of the event sequence
              var mi = 0
              var j = 1
              while (j < counters.size) {
                val c = counters(j); val m = counters(mi)
                if (c.count < m.count || (c.count == m.count && c.key > m.key)) mi = j
                j += 1
              }
              val evicted = counters(mi)
              counters(mi) = SsCounter(e.user_id, evicted.count + 1, evicted.count)
            }
          }
          state.update(SsState(counters.toArray, n))
          counters.toSeq
            .sortBy(c => (-c.count, c.key))
            .map(c => SsTop(shard.toInt, c.key, c.count - c.err, c.count, n))
            .iterator
        })
  }

  /** Stream-stream interval join: purchases matched to the same user's
    * signups within `withinHours` BEFORE the purchase. On a stream both
    * sides carry watermarks and the time-range predicate bounds the join
    * state (Spark evicts buffered rows once the watermark passes the
    * interval) — the canonical bounded-state stream-stream join. The same
    * function applies to batch frames unchanged. */
  def purchasesAfterSignup(events: DataFrame, withinHours: Int = 24, watermark: String = "2 hours"): DataFrame = {
    val signups = events
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("event_id"), col("value"))
    val (s, p) =
      if (signups.isStreaming)
        (signups.withWatermark("signup_ts", watermark), purchases.withWatermark("purchase_ts", watermark))
      else (signups, purchases)
    p.join(
        s,
        col("p_user") === col("s_user") &&
          col("purchase_ts") >= col("signup_ts") &&
          col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $withinHours HOURS"))
      .select(
        col("event_id"),
        col("p_user").as("user_id"),
        col("purchase_ts"),
        col("signup_ts"),
        col("value"))
  }

  final case class AsofUpdate(key: Long, ts: Timestamp, seq: Long, value: Double)
  final case class AsofQuery(key: Long, ts: Timestamp, query_id: Long)
  final case class AsofResult(
      query_id: Long,
      key: Long,
      ts: Timestamp,
      asof_value: Option[Double],
      asof_ts: Option[Timestamp])

  /** Streaming AS-OF join — the feature-store serving pattern: a stream of
    * per-key feature UPDATES and a stream of QUERIES; each query is
    * answered with the latest update for its key at-or-before its event
    * time ([[graft.operators.AsOfJoin.asof]]'s non-strict semantics, seq
    * breaking ties among identical (key, ts) updates — largest wins).
    * State per key is exactly ONE (ts, seq, value) row — the
    * latest-feature register — so state size tracks key cardinality, never
    * stream length: the O(1)-per-key analogue of the batch union+window.
    *
    * Ordering contract (the [[funnelStream]]/[[spaceSavingStream]]
    * clause, made precise by the register design): each micro-batch folds
    * in (ts, updates-before-queries, seq) order, so answers are EXACTLY
    * the batch as-of join's (StreamingSpec pins it) when arrival is
    * event-time-ordered ACROSS batches — in particular an update must not
    * be delivered in an EARLIER batch than a query it post-dates: the
    * register keeps only the latest update per key, so once a newer value
    * lands, a query about the past can no longer see the superseded one
    * (it answers None if the register is entirely in its future). Late
    * UPDATES degrade gracefully — they only affect queries in their own
    * or later batches. */
  def asofStream(
      updates: Dataset[AsofUpdate],
      queries: Dataset[AsofQuery]): Dataset[AsofResult] = {
    val spark = updates.sparkSession
    import spark.implicits._
    // one envelope stream: isQuery=false rows carry (seq, value),
    // isQuery=true rows carry query_id
    val env = updates
      .map(u => (u.key, u.ts, false, u.seq, u.value, -1L))
      .union(queries.map(q => (q.key, q.ts, true, Long.MinValue, 0.0, q.query_id)))
    env
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: Long,
         rows: Iterator[(Long, Timestamp, Boolean, Long, Double, Long)],
         state: GroupState[AsofUpdate]) => {
          var cur = state.getOption.orNull
          val out = Seq.newBuilder[AsofResult]
          rows.toVector
            .sortBy { case (_, ts, isQuery, seq, _, _) =>
              // micros epoch (the funnelStream conversion): getTime holds
              // millis, getNanos the full sub-second — never add both raw
              (ts.getTime / 1000 * 1000000L + ts.getNanos / 1000, isQuery, seq)
            }
            .foreach {
              case (_, ts, false, seq, value, _) =>
                // an update wins over the register iff strictly later in
                // (ts, seq) — the batch rightTieBreak "largest wins" rule
                if (cur == null || cur.ts.compareTo(ts) < 0 ||
                  (cur.ts.compareTo(ts) == 0 && cur.seq < seq))
                  cur = AsofUpdate(key, ts, seq, value)
              case (_, ts, true, _, _, qid) =>
                if (cur != null && cur.ts.compareTo(ts) <= 0)
                  out += AsofResult(qid, key, ts, Some(cur.value), Some(cur.ts))
                else out += AsofResult(qid, key, ts, None, None)
            }
          if (cur != null) state.update(cur)
          out.result().iterator
        })
  }

  /** Streaming exact dedup on event_id with bounded state: duplicates
    * arriving within the watermark window are dropped, and dedup state for
    * ids older than the watermark is evicted — the streaming analogue of the
    * batch `Dedup.exact`, safe to run forever (state never grows past one
    * watermark window of ids). */
  def dedupStream(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Continuously-maintained current-state table: each micro-batch is
    * reduced to its latest row per key (by `tsCol`; ties are unspecified —
    * feed a unique per-key timestamp), then merged into the named catalog
    * table with [[graft.operators.Cdc.mergeInto]]. This is the streaming
    * materialized-upsert pattern: `foreachBatch` is Structured Streaming's
    * documented escape hatch for merge sinks, and the catalog's versioned
    * publish (write new version dir, then flip the pointer) makes each
    * merge atomic for concurrent readers — a reader never sees a
    * half-merged table.
    *
    * Scale shape: the per-batch reduction is one keyed window over the
    * BATCH (micro-batches are small by construction); the merge joins
    * state × batch on the key, broadcasting the batch side. State grows
    * with distinct keys, not stream length. */
  def mergeStream(
      updates: DataFrame,
      catalog: graft.sources.Catalog,
      table: String,
      keys: Seq[String],
      tsCol: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(col(tsCol).desc)
        // mergeInto reads `latest` twice (delta ∪ anti-join) — persist the
        // tiny per-batch reduction so the SOURCE is scanned once per
        // trigger, not once per downstream branch (at scale, re-reading a
        // micro-batch's files twice doubles ingest I/O for nothing)
        val latest = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")
          .persist()
        try {
          val merged =
            if (catalog.exists(table))
              graft.operators.Cdc.mergeInto(catalog.readTable(table), latest, keys)
            else latest
          catalog.putTable(table, merged)
        } finally latest.unpersist()
      }

  /** Append-only streaming INGEST into a catalog table — [[mergeStream]]'s
    * twin for immutable event/log data. Each micro-batch lands O(delta)
    * through the catalog's manifest append ([[graft.sources.Catalog
    * .appendTable]]): the published next version references the previous
    * version's files plus the batch's new files, so per-trigger cost is the
    * batch size, never the table size (mergeStream's whole-table rewrite is
    * the right shape only for keyed STATE tables). Exactly-once across
    * Structured Streaming's failure/replay semantics: foreachBatch can
    * re-deliver a batch id, and [[graft.sources.Catalog
    * .appendTableExactlyOnce]] commits the id atomically with the data (a
    * marker inside the manifest version), so a replayed batch is skipped —
    * no dupes, no holes — as long as the stream is the table's sole writer.
    * Compose with [[graft.sources.Catalog.compact]] + vacuum when the
    * accumulated generations go small-file-pathological. */
  def appendStream(
      updates: DataFrame,
      catalog: graft.sources.Catalog,
      table: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        catalog.appendTableExactlyOnce(table, batch, batchId): Unit
      }

  /** Expectation-GATED streaming ingest — [[appendStream]] with the
    * write-path data-quality gate ([[graft.sources.Catalog
    * .appendTableExpect]]) applied to every micro-batch: clean rows
    * append to the table, violators land in `<table>.__quarantine__`
    * tagged with the rules they broke, and BOTH sides keep exactly-once
    * semantics under foreachBatch's crash-replay (each side carries its
    * own commit cursor — see [[graft.sources.Catalog
    * .appendTableExpectExactlyOnce]]). The quarantine is the streaming
    * dead-letter queue: bounded by the violation rate, re-driveable
    * (fix upstream, re-append), and never blocks the clean flow — the
    * always-on posture a 100-TB ingest wants, vs the all-or-nothing
    * batch `onViolation = "fail"` gate. */
  def expectStream(
      updates: DataFrame,
      catalog: graft.sources.Catalog,
      table: String,
      expectations: Seq[(String, String)]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        catalog.appendTableExpectExactlyOnce(table, batch, expectations, batchId): Unit
      }

  /** Read a DIRECTORY of event parquet files as a stream, one file per
    * micro-batch (FileStreamSource requires a directory, not a single
    * file). Applies the same nanos→timestamp conversion as Tables when the
    * staged files carry a raw nanos long. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
