package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gapFill: zero-filled gaps, exact sums, LOCF carries the last observed value") {
    val events = Seq(
      (1L, ts("2024-01-01 10:15:00"), 1.5),
      (1L, ts("2024-01-01 10:45:00"), 2.5),
      (1L, ts("2024-01-01 13:30:00"), 3.0),
      (2L, ts("2024-01-02 08:00:00"), 7.0)).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFill(events, "user_id", "ts", "value")
      .orderBy("key", "bucket").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    // grid spans first..last observed hour inclusive: 10,11,12,13
    assert(u1.map(_.getTimestamp(1).toString.substring(11, 13)).toSeq == Seq("10", "11", "12", "13"))
    assert(u1.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L)) // n zero-filled
    // observed sums exact; gap hours carry NULL sum but LOCF'd value
    assert(u1(0).getDouble(3) == 4.0 && u1(0).getDouble(4) == 4.0)
    assert(u1(1).isNullAt(3) && u1(1).getDouble(4) == 4.0)
    assert(u1(2).isNullAt(3) && u1(2).getDouble(4) == 4.0)
    assert(u1(3).getDouble(3) == 3.0 && u1(3).getDouble(4) == 3.0)
    // single-observation key: exactly one row, no gap explosion
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getLong(2) == 1L && u2.head.getDouble(4) == 7.0)
  }

  test("ewmaFinal: hand-folded recursion, order independence of input partitioning") {
    import spark.implicits._
    val rows = Seq(
      (1L, 3L, 10.0), (1L, 1L, 2.0), (1L, 2L, 4.0), // arrives out of order
      (2L, 1L, 5.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.ewmaFinal(rows, "k", "ts", "v", alpha = 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // key 1 in ts order: s=2; s=0.25*4+0.75*2=2.5; s=0.25*10+0.75*2.5=4.375
    assert(out(1L) == (3L, 4.375))
    assert(out(2L) == (1L, 5.0)) // single observation: s1 = v1
    // partitioning must not change the fold (order comes from the sort key)
    val re = TimeSeries.ewmaFinal(rows.repartition(5), "k", "ts", "v", alpha = 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(re == out)
  }

  test("gapFill: empty input yields empty output; day unit buckets correctly") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("user_id", "ts", "value")
    assert(TimeSeries.gapFill(empty, "user_id", "ts", "value").count() == 0)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-04 09:00:00"), 2.0)).toDF("user_id", "ts", "value")
    val days = TimeSeries.gapFill(events, "user_id", "ts", "value", unit = "day")
      .orderBy("bucket").collect()
    assert(days.length == 4) // Jan 1..4 inclusive
    assert(days.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L, 1L))
  }

  test("holtFinal: hand-checked recurrence; converges onto a pure linear trend") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // hand-walk for key A, values 10, 14 (alpha=0.5, beta=0.5):
    // step1: l=10, b=0 ; step2: l=.5*14+.5*10=12, b=.5*(12-10)+.5*0=1
    val df = Seq(("A", ts(1), 1L, 10.0), ("A", ts(2), 2L, 14.0)).toDF("k", "ts", "tie", "v")
    val r = graft.operators.TimeSeries.holtFinal(df, "k", "ts", "tie", "v", alpha = 0.5, beta = 0.5)
      .collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)) == ((2L, 12.0, 1.0, 13.0)))
    // a long exact line: level tracks it and the forecast lands ~on the next point
    val line = (0 until 60).map(i => ("L", ts(i % 60), i.toLong, 5.0 + 2.0 * i)).toDF("k", "ts", "tie", "v")
    val lr = graft.operators.TimeSeries.holtFinal(line, "k", "ts", "tie", "v", alpha = 0.25, beta = 0.125)
      .collect().head
    val nextTrue = 5.0 + 2.0 * 60
    assert(math.abs(lr.getDouble(4) - nextTrue) < 1.0, s"forecast ${lr.getDouble(4)} vs $nextTrue")
    assert(math.abs(lr.getDouble(3) - 2.0) < 0.1, s"trend ${lr.getDouble(3)}")
  }

  test("acf: alternating series closed form, partitioning-invariant") {
    import spark.implicits._
    // hourly counts [1,2,1,2,1,2]: c = 6x-9 = [-3,3,-3,3,-3,3], den = 54
    // acf(1) = -45/54, acf(2) = 36/54, acf(3) = -27/54
    val rows = (0 until 6).flatMap { h =>
      val k = if (h % 2 == 0) 1 else 2
      (0 until k).map(i => ts(f"2024-03-01 $h%02d:0$i:00"))
    }
    val events = rows.toDF("ts")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TimeSeries.acf(d, "ts", maxLag = 3)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = run(events)
    assert(got(1) == ((5L, BigDecimal(-45.0 / 54).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2) == ((4L, BigDecimal(36.0 / 54).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(3) == ((3L, -0.5)))
    assert(run(events.repartition(7)) == got, "exact sums must be partitioning-invariant")
  }

  test("cusum: step series peaks exactly at the changepoint, ties all flag") {
    import spark.implicits._
    // counts [1,1,1,5,5,5]: mean 3, C = [-2,-4,-6,-4,-2,0] — peak at hour 2 (0-based 3rd)
    val rows = (0 until 6).flatMap { h =>
      val k = if (h < 3) 1 else 5
      (0 until k).map(i => ts(f"2024-03-01 $h%02d:0$i:00"))
    }
    val got = graft.operators.TimeSeries.cusum(rows.toDF("ts"), "ts")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(13), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.map(_._3).toSeq == Seq(-2.0, -4.0, -6.0, -4.0, -2.0, 0.0), got.mkString(","))
    assert(got.map(_._4).toSeq == Seq(false, false, true, false, false, false))
    // constant series: every C_t = 0, every row ties at the (zero) peak
    val const = (0 until 4).map(h => ts(f"2024-03-02 $h%02d:00:00")).toDF("ts")
    val c = graft.operators.TimeSeries.cusum(const, "ts").collect()
    assert(c.forall(r => r.getDouble(2) == 0.0 && r.getBoolean(3)))
  }

  test("seasonalProfile: closed-form hour-of-day means, peak flag, constant-series ACF edge") {
    import spark.implicits._
    // hod 0: counts 2 and 4 across two days (mean 3); hod 1: count 2 (mean 2)
    val rows =
      (0 until 2).map(i => ts(f"2024-03-01 00:0$i:00")) ++
        (0 until 4).map(i => ts(f"2024-03-02 00:0$i:00")) ++
        (0 until 2).map(i => ts(f"2024-03-01 01:0$i:00"))
    val got = graft.operators.TimeSeries.seasonalProfile(rows.toDF("ts"), "ts")
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // grand mean = 8/3 = 2.666667; seasonal = mean - grand
    assert(got(0) == ((2L, 3.0, BigDecimal(3.0 - 2.666667).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, true)), got.toString)
    assert(got(1)._2 == 2.0 && !got(1)._4)
    assert(got(1)._3 == BigDecimal(2.0 - 2.666667).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // ACF of a constant series: zero variance -> NULL correlations, not NaN
    val const = (0 until 5).map(h => ts(f"2024-03-03 0$h%02d:00:00")).toDF("ts")
    val acf = graft.operators.TimeSeries.acf(const, "ts", maxLag = 2).collect()
    assert(acf.forall(_.isNullAt(2)), acf.mkString(","))
  }

  test("forecastAccuracy: hand-folded Holt holdout metrics, constant-train MASE NULL, short keys drop") {
    // g: series 1,2,3,4 horizon 2 -> train (1,2): l=1.25, b=0.03125
    // yhat = 1.28125, 1.3125; ae = 1.71875, 2.6875 -> mae = 2.203125
    // h: series 5,5,9,9 -> constant train: naive MAE 0 -> mase NULL
    // s: only 3 points < horizon+2 -> dropped
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 4L),
      ("h", 1L, 5L), ("h", 2L, 5L), ("h", 3L, 9L), ("h", 4L, 9L),
      ("s", 1L, 1L), ("s", 2L, 2L), ("s", 3L, 3L)
    ).toDF("key", "t", "v")
    val out = TimeSeries.forecastAccuracy(df, "key", "t", "t", "v",
        alpha = 0.25, beta = 0.125, horizon = 2)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(out.keySet == Set("g", "h"), out.keySet.toString)
    val g = out("g")
    assert((g.getLong(1), g.getLong(2)) == ((2L, 2L)), g.toString)
    assert(g.getDouble(3) == 2.203125, g.toString)       // mae
    assert(g.getDouble(4) == 0.622396, g.toString)       // mape
    assert(g.getDouble(5) == 0.907342, g.toString)       // smape
    assert(g.getDouble(6) == 2.203125, g.toString)       // mase (naive MAE = 1)
    val h = out("h")
    assert(h.getDouble(3) == 4.0 && h.isNullAt(6), h.toString)
    assert(h.getDouble(4) == 0.444444, h.toString)
  }

  test("pettittTest: hand U_t closed form, constant series insignificant, strong step significant") {
    import spark.implicits._
    // 1,1,1,5,5: U = (2,4,6,3), K=6 at t=3 (the true split), p=2e^{-1.44}
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 5L), ("g", 5L, 5L))
      .toDF("key", "ts", "v")
    val r = TimeSeries.pettittTest(df, "key", "ts", "v").collect().head
    assert((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)) == ((5L, 3, 3L, 6L)), r.toString)
    val expP = BigDecimal(2.0 * math.exp(-6.0 * 36.0 / 150.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == expP && !r.getBoolean(6), r.toString)
    // constant series: every U_t = 0, p clamps to 1, earliest-split tie-break
    val const = (1L to 10L).map(t => ("c", t, 4L)).toDF("key", "ts", "v")
    val c = TimeSeries.pettittTest(const, "key", "ts", "v").collect().head
    assert((c.getInt(2), c.getLong(4), c.getDouble(5), c.getBoolean(6)) == ((1, 0L, 1.0, false)),
      c.toString)
    // 20 zeros then 20 tens: K = 400 at t=20, overwhelmingly significant
    val step = ((1L to 20L).map(t => ("s", t, 0L)) ++ (21L to 40L).map(t => ("s", t, 10L)))
      .toDF("key", "ts", "v")
    val s = TimeSeries.pettittTest(step, "key", "ts", "v").collect().head
    assert((s.getInt(2), s.getLong(4), s.getBoolean(6)) == ((20, 400L, true)), s.toString)
  }

  test("holtWintersFinal: hand fold with seasonal slots, constant series fixpoint, gamma=0 equals Holt") {
    import spark.implicits._
    // hand fold, alpha=beta=gamma=0.5, p=2, series 1,2,3:
    // t2 (slot 1): l=1.5, b=0.25, s2=0.25; t3 (slot 0): l=2.375, b=0.5625, s1=0.3125
    // next slot is s2 -> season 0.25, forecast 2.375+0.5625+0.25
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L)).toDF("key", "ts", "v")
    val r = TimeSeries.holtWintersFinal(df, "key", "ts", "ts", "v", 0.5, 0.5, 0.5, 2)
      .collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      == ((3L, 2.375, 0.5625, 0.25, 3.1875)), r.toString)
    // constant series: level locks to the constant, trend and season stay 0
    val const = (1L to 20L).map(t => ("c", t, 7L)).toDF("key", "ts", "v")
    val c = TimeSeries.holtWintersFinal(const, "key", "ts", "ts", "v", 0.25, 0.125, 0.25, 7)
      .collect().head
    assert((c.getDouble(2), c.getDouble(3), c.getDouble(4), c.getDouble(5)) == ((7.0, 0.0, 0.0, 7.0)),
      c.toString)
    // gamma = 0 degenerates to exactly Holt's level/trend
    val mixed = Seq(("m", 1L, 3L), ("m", 2L, 8L), ("m", 3L, 2L), ("m", 4L, 9L), ("m", 5L, 4L))
      .toDF("key", "ts", "v")
    val hw = TimeSeries.holtWintersFinal(mixed, "key", "ts", "ts", "v", 0.25, 0.125, 0.0, 3)
      .collect().head
    val h = TimeSeries.holtFinal(mixed, "key", "ts", "ts", "v", 0.25, 0.125).collect().head
    assert(hw.getDouble(2) == h.getDouble(2) && hw.getDouble(3) == h.getDouble(3), s"$hw vs $h")
    assert(hw.getDouble(4) == 0.0, hw.toString)
  }

  test("theilSenTrend: outlier-immune slope, rank medians, equal-x pairs skipped") {
    // linear 1..4 plus one wild point: 6 of 10 pairwise slopes are 1, so
    // the median slope is exactly 1 where OLS would be dragged far off
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 4L), ("g", 5L, 100L)
    ).toDF("key", "x", "y")
    val r = TimeSeries.theilSenTrend(df, "key", "x", "y").collect().head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)) == ((5L, 10L, 1.0, 0.0)),
      r.toString)
    // even pair count averages TWO DISTINCT middles: points (0,0),(1,1),
    // (2,4),(3,5) -> slopes 1,1,5/3,2,2,3 -> median (1.666666667+2)/2
    val even = Seq(("e", 0L, 0L), ("e", 1L, 1L), ("e", 2L, 4L), ("e", 3L, 5L))
      .toDF("key", "x", "y")
    val e = TimeSeries.theilSenTrend(even, "key", "x", "y").collect().head
    assert(e.getDouble(3) == 1.833333, e.toString)
    // duplicate x contributes no pair; an all-equal-x key vanishes
    val dup = Seq(("d", 1L, 1L), ("d", 1L, 9L), ("d", 2L, 3L), ("z", 7L, 1L), ("z", 7L, 2L))
      .toDF("key", "x", "y")
    val d = TimeSeries.theilSenTrend(dup, "key", "x", "y").collect()
    assert(d.map(_.getString(0)).toSeq == Seq("d"), d.mkString(","))
    assert(d.head.getLong(2) == 2L, d.head.toString) // two valid pairs
  }

  test("groupLinearTrend: exact line recovered, degenerate groups NULL, partitioning-invariant") {
    import spark.implicits._
    val df = (
      (0 until 50).map(x => ("up", x.toLong, 3.0 * x + 7.0)) ++     // slope 3, intercept 7
        (0 until 50).map(x => ("down", x.toLong, -1.5 * x + 100.0)) ++
        Seq(("single", 5L, 10.0)) ++                                 // one point: NULL
        Seq(("flatx", 4L, 1.0), ("flatx", 4L, 9.0))                  // all-equal x: NULL
    ).toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TimeSeries.groupLinearTrend(d, "g", "x", "y")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    val got = run(df)
    assert(got("up") == ((50L, Some(3.0), Some(7.0))), s"up: ${got("up")}")
    assert(got("down") == ((50L, Some(-1.5), Some(100.0))))
    assert(got("single")._2.isEmpty && got("single")._3.isEmpty)
    assert(got("flatx")._2.isEmpty)
    assert(run(df.repartition(13)) == got, "exact moments must be partitioning-invariant")
  }

  test("dtwDailyProfiles: cell-scan fold equals a reference DP, zero-fill and self-similarity hold") {
    // reference DP on the micro-share grid, same floor-div profile build
    def microSeries(counts: Map[Int, Long], days: Seq[Int]): Array[Long] = {
      val total = counts.values.sum
      days.map(d => counts.getOrElse(d, 0L) * 1000000L / total).toArray
    }
    def refDtw(a: Array[Long], b: Array[Long]): Long = {
      val n = a.length
      val d = Array.ofDim[Long](n, n)
      for (i <- 0 until n; j <- 0 until n) {
        val c = math.abs(a(i) - b(j))
        d(i)(j) = c + ((i, j) match {
          case (0, 0) => 0L
          case (0, _) => d(0)(j - 1)
          case (_, 0) => d(i - 1)(0)
          case _      => math.min(d(i - 1)(j), math.min(d(i - 1)(j - 1), d(i)(j - 1)))
        })
      }
      d(n - 1)(n - 1)
    }
    // three types over 5 days; "shift" is "base" delayed one day (DTW must
    // score the pair far below the Euclidean-style mismatch), "spike" is
    // unrelated; type "gap" misses day 3 entirely (zero-fill path)
    val counts = Map(
      "base"  -> Map(1 -> 10L, 2 -> 40L, 3 -> 10L, 4 -> 10L, 5 -> 10L),
      "shift" -> Map(1 -> 10L, 2 -> 10L, 3 -> 40L, 4 -> 10L, 5 -> 10L),
      "gap"   -> Map(1 -> 30L, 2 -> 30L, 4 -> 30L, 5 -> 30L))
    val rows = for {
      (ty, m) <- counts.toSeq; (day, n) <- m.toSeq; k <- 1L to n
    } yield (k, ts(f"2024-01-0$day%d 12:00:00"), 1L, ty, 1.0)
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.TimeSeries
      .dtwDailyProfiles(df, "ts", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val days = Seq(1, 2, 3, 4, 5)
    val series = counts.map { case (ty, m) => ty -> microSeries(m, days) }
    for (((a, b), (n, micro, dtw)) <- got) {
      assert(n == 5L)
      val want = refDtw(series(a), series(b))
      assert(micro == want, s"($a,$b): got $micro, reference $want")
      assert(dtw == micro.toDouble / 1000000.0)
    }
    assert(got.size == 3)
    // the warp absorbs the one-day shift: base~shift must beat base~gap
    assert(got(("base", "shift"))._2 < got(("base", "gap"))._2, got.toString)
    // self-DTW is exactly 0 (identical series, diagonal path costs 0)
    val self = graft.operators.TimeSeries
      .dtwDailyProfiles(df.union(df.withColumn("event_type", concat(col("event_type"), lit("2")))), "ts", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(self(("base", "base2")) == 0L, self.toString)
  }

  test("burstDetect: Viterbi path equals a reference DP, planted burst found, threshold flicker ignored") {
    def refBurst(xs: Array[Long], s: Double, gamma: Double): Array[Boolean] = {
      val t    = xs.length
      val lam0 = xs.sum.toDouble / t
      val lam1 = s * lam0
      def micro(v: Double) = math.round(v * 1000000.0)
      val tau = micro(math.log(t.toDouble) * gamma)
      def c(lam: Double, x: Long) = micro(lam - x * math.log(lam))
      var d0 = c(lam0, xs(0)); var d1 = c(lam1, xs(0)) + tau
      val p0 = Array.ofDim[Boolean](t); val p1 = Array.ofDim[Boolean](t)
      for (i <- 1 until t) {
        val n0 = c(lam0, xs(i)) + math.min(d0, d1)
        val n1 = c(lam1, xs(i)) + math.min(d0 + tau, d1)
        p0(i) = d1 < d0; p1(i) = d1 < d0 + tau
        d0 = n0; d1 = n1
      }
      val st = Array.ofDim[Boolean](t)
      st(t - 1) = d1 < d0
      for (i <- t - 1 to 1 by -1) st(i - 1) = if (st(i)) p1(i) else p0(i)
      st
    }
    // 24 hours at ~5 events/hour with a 3-hour 40/hour burst and one noisy
    // 9-event hour a bare threshold would false-alarm on
    val perHour = Array.tabulate(24)(h => if (h >= 10 && h <= 12) 40L else if (h == 20) 9L else 5L)
    val rows = for {
      (n, h) <- perHour.zipWithIndex.map { case (n, h) => (n, h) }.toSeq
      k <- 1L to n
    } yield (h * 100L + k, ts(f"2024-01-01 $h%02d:30:00"), 1L, "e", 1.0)
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.TimeSeries.burstDetect(df, "ts", s = 3.0, gamma = 1.0)
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    assert(got.length == 24)
    val want = refBurst(perHour, 3.0, 1.0)
    assert(got.map(_._2).sameElements(want), s"got ${got.map(_._2).mkString(",")} want ${want.mkString(",")}")
    (0 until 24).foreach { h =>
      val expected = h >= 10 && h <= 12
      assert(got(h)._2 == expected, s"hour $h: in_burst=${got(h)._2}, burst window is 10-12 only")
    }
    // single-hour series exercises the t_n = 1 branch
    val tiny = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "e", 1.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    val one = graft.operators.TimeSeries.burstDetect(tiny, "ts").collect()
    assert(one.length == 1 && !one.head.getBoolean(2))
  }

  test("runsTest: alternating signed series counts every flip, hand-checked z") {
    import spark.implicits._
    // hourly counts cycle 1,2,3 over 9 hours; the cumulative-count median
    // is 2, the 2-hours drop, leaving signs -,+,-,+,-,+ -> 6 runs of 3/3
    val rows = for {
      i <- 0 until 9
      j <- 0 until (i % 3 + 1)
    } yield (f"2024-01-01 $i%02d:0$j:00", 1L)
    val ev = rows.toDF("tss", "k").select(to_timestamp(col("tss")).as("ts"))
    val r = TimeSeries.runsTest(ev, "ts").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 6L, r.toString)
    assert(r.getDouble(3) == 4.0, r.toString)
    // z = 2/sqrt(1.2) = 1.825742
    assert(math.abs(r.getDouble(4) - 1.825742) < 1e-9, r.toString)
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 0.1, r.toString)
  }

  test("periodFold: the planted period's F towers over off-periods and wins is_best") {
    import spark.implicits._
    // counts cycle [1,9,1,1] with exact period 4 over 40 hours
    val pattern = Array(1, 9, 1, 1)
    val rows = for {
      i <- 0 until 40
      j <- 0 until pattern(i % 4)
    } yield (f"2024-01-0${i / 24 + 1} ${i % 24}%02d:${j % 60}%02d:00", 1L)
    val ev  = rows.toDF("tss", "k").select(to_timestamp(col("tss")).as("ts"))
    val out = TimeSeries.periodFold(ev, "ts", Seq(3, 4, 5)).collect()
    val byP = out.map(r => r.getInt(0) -> r).toMap
    // the perfect fold explains ALL variance: theta = 0, F degenerates to
    // NULL (ssw = 0) — exactly the case theta is there to keep ranked
    assert(byP(4).getDouble(3) == 0.0 && byP(4).isNullAt(4), byP(4).toString)
    assert(byP(4).getBoolean(5), out.mkString(";"))
    assert(!byP(3).getBoolean(5) && !byP(5).getBoolean(5), out.mkString(";"))
    assert(byP(3).getDouble(3) > 0.9 && byP(5).getDouble(3) > 0.9, out.mkString(";"))
    assert(byP(4).getLong(1) == 3L && byP(4).getLong(2) == 36L, byP(4).toString)
  }

  test("grangerTest: a one-day-lead cause scores a towering F; the reverse direction does not") {
    import spark.implicits._
    // x_t pseudo-random, y_t = x_{t-1} + (t % 2): x Granger-causes y
    val days = 1 to 20
    val xCounts = days.map(t => (t * 7) % 5 + 1)
    val yCounts = days.map(t => (if (t >= 2) xCounts(t - 2) else 1) + t % 2)
    val rows = days.flatMap { t =>
      val day = f"2024-01-$t%02d"
      Seq.fill(xCounts(t - 1))((s"$day 10:00:00", "xx")) ++
        Seq.fill(yCounts(t - 1))((s"$day 11:00:00", "yy"))
    }
    val ev = rows.toDF("tss", "event_type")
      .select(to_timestamp(col("tss")).as("ts"), col("event_type"))
    val fwd = TimeSeries.grangerTest(ev, "ts", "event_type", causeType = "xx", effectType = "yy")
      .collect().head
    val rev = TimeSeries.grangerTest(ev, "ts", "event_type", causeType = "yy", effectType = "xx")
      .collect().head
    assert(fwd.getLong(0) == 19L, fwd.toString)
    assert(!fwd.isNullAt(3) && !rev.isNullAt(3), s"$fwd / $rev")
    val (ff, fr) = (fwd.getDouble(3), rev.getDouble(3))
    assert(ff > 10.0 && ff > 5.0 * math.max(fr, 0.001), s"forward F=$ff reverse F=$fr")
    // the unrestricted model can only lower RSS
    assert(fwd.getDouble(2) <= fwd.getDouble(1), fwd.toString)
  }

}
