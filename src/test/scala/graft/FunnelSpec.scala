package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel
import graft.sources.Tables

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("firstReach: strictly-after ordering, stalls, and full conversion") {
    val events = Seq(
      // user 1 converts fully, out-of-arrival-order input
      (1L, ts("2024-01-01 10:02:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "purchase"),
      // user 2: purchase BEFORE any view — must not count; stalls at view
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      // user 3: click exactly AT the first view ts — strictly-after excludes it,
      // a later click counts
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "click"),
      (3L, ts("2024-01-01 08:10:00"), "click"),
      // user 4: only non-funnel events — absent from output entirely
      (4L, ts("2024-01-01 07:00:00"), "error")
    ).toDF("user_id", "ts", "event_type")

    val out = Funnel
      .firstReach(events, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)), r.getLong(4))))
      .toMap

    assert(out(1L) == ((Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 10:02:00")), Some(ts("2024-01-01 10:05:00")), 3L)))
    assert(out(2L) == ((Some(ts("2024-01-01 09:30:00")), None, None, 1L)), "pre-view purchase must not convert")
    assert(out(3L) == ((Some(ts("2024-01-01 08:00:00")), Some(ts("2024-01-01 08:10:00")), None, 2L)),
      "same-instant click is not strictly after the view")
    assert(!out.contains(4L), "users with no funnel-stage events are absent")
  }

  test("firstReach over the corpus equals the min-join chain definition") {
    val e = Tables(spark, SharedSpark.sf0001).events
    val fold = Funnel
      .firstReach(e, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
    // k-join reference implementation: first view, first click after it,
    // first purchase after that
    val f = e.filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
    val v = f.filter(col("event_type") === "view").groupBy("user_id").agg(min("ts").as("t_view"))
    val c = f.as("f").join(v.as("v"), col("f.user_id") === col("v.user_id") && col("f.ts") > col("v.t_view"))
      .filter(col("f.event_type") === "click")
      .groupBy(col("f.user_id").as("user_id")).agg(min(col("f.ts")).as("t_click"))
    val p = f.as("f").join(c.as("c"), col("f.user_id") === col("c.user_id") && col("f.ts") > col("c.t_click"))
      .filter(col("f.event_type") === "purchase")
      .groupBy(col("f.user_id").as("user_id")).agg(min(col("f.ts")).as("t_purchase"))
    val joined = f.select("user_id").distinct()
      .join(v, Seq("user_id"), "left").join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")

    val a = fold.select("user_id", "t_view", "t_click", "t_purchase").collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))).toMap
    val b = joined.collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))).toMap
    assert(a == b, "one-pass fold must equal the k-join chain on real data")
    assert(a.nonEmpty)
  }

  test("firstReach plan: one user-keyed shuffle, stage filter reaches the scan") {
    val e    = Tables(spark, SharedSpark.sf0001).events
    val df   = Funnel.firstReach(e, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles <= 2, s"expected hashpartitioning + AQE coalesce at most, got $shuffles exchanges:\n$plan")
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("in(event_type"),
      s"stage IN-filter must reach the parquet scan:\n$plan")
  }

  test("markovTransitions: hand-checked chain, rows sum to 1 per prev state") {
    import java.sql.Timestamp
    // user 1: a->b->a->b ; user 2: a->b->c — transitions: a->b ×3, b->a ×1, b->c ×1
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:01"), "a", 1L),
      (1L, Timestamp.valueOf("2024-01-01 00:00:02"), "b", 2L),
      (1L, Timestamp.valueOf("2024-01-01 00:00:03"), "a", 3L),
      (1L, Timestamp.valueOf("2024-01-01 00:00:04"), "b", 4L),
      (2L, Timestamp.valueOf("2024-01-01 00:00:01"), "a", 5L),
      (2L, Timestamp.valueOf("2024-01-01 00:00:02"), "b", 6L),
      (2L, Timestamp.valueOf("2024-01-01 00:00:03"), "c", 7L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.markovTransitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("a", "b")) == ((3L, 1.0)))
    assert(got(("b", "a")) == ((1L, 0.5)) && got(("b", "c")) == ((1L, 0.5)))
    assert(got.size == 3)
    // probabilities from a prev state always sum to ~1
    val sums = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    sums.foreach { case (s, p) => assert(math.abs(p - 1.0) < 1e-9, s"$s sums to $p") }
  }

  test("markovRemovalAttribution: closed-form two-channel chain, shares sum to 1") {
    // u1: view -> click -> purchase ; u2: view (drops)
    // P: START->view 1, view->click .5, view->DROP .5, click->CONV 1
    // full p(START) = .5 ; removing either channel severs every
    // converting path -> removal effect 1.0 each, shares .5/.5
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"),
      (2L, ts("2024-01-01 11:00:00"), 4L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.Funnel
      .markovRemovalAttribution(events, "user_id", "ts", "event_id", "event_type", "purchase")
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == Map(
      "click" -> ((0.5, 0.0, 1.0, 0.5)),
      "view"  -> ((0.5, 0.0, 1.0, 0.5))), s"got $got")
    // a user converting with NO touches routes START -> CONV directly and
    // keeps conversion mass that no channel can claim
    val withDirect = events.union(
      Seq((3L, ts("2024-01-01 12:00:00"), 5L, "purchase"))
        .toDF("user_id", "ts", "event_id", "event_type"))
    val g2 = graft.operators.Funnel
      .markovRemovalAttribution(withDirect, "user_id", "ts", "event_id", "event_type", "purchase")
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    // p_removed now stays at the direct-conversion floor 1/3, so the
    // removal effect drops below 1 but the two channels stay symmetric
    assert(g2("click") == g2("view"), s"got $g2")
    assert(g2("click")._1 > 0.3 && g2("click")._1 < 0.4)
  }

  test("positionAttribution: U-shaped weights, 1- and 2-touch conventions, unconverted ignored") {
    val events = Seq(
      // u1: 4 touches -> .4, .1, .1, .4
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "signup"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "view"),
      (1L, ts("2024-01-01 10:04:00"), 5L, "purchase"),
      // u2: single touch -> 1.0
      (2L, ts("2024-01-01 11:00:00"), 6L, "click"),
      (2L, ts("2024-01-01 11:01:00"), 7L, "purchase"),
      // u3: two touches -> .5/.5
      (3L, ts("2024-01-01 12:00:00"), 8L, "view"),
      (3L, ts("2024-01-01 12:01:00"), 9L, "click"),
      (3L, ts("2024-01-01 12:02:00"), 10L, "purchase"),
      // u4: never converts -> contributes nothing
      (4L, ts("2024-01-01 13:00:00"), 11L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.Funnel
      .positionAttribution(events, "user_id", "ts", "event_id", "event_type", "purchase")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // view: .4 + .4 (u1 ends) + .5 (u3 first) = 1.3 over 3 touches
    // click: .1 (u1 middle) + 1.0 (u2) + .5 (u3 last) = 1.6 ; signup: .1
    assert(got == Map(
      "view" -> ((3L, 1.3)), "click" -> ((3L, 1.6)), "signup" -> ((1L, 0.1))), s"got $got")
    // total credit equals the number of converted journeys
    assert(got.values.map(_._2).sum == 3.0)
  }

  test("shapleyAttribution: symmetric split, null player zero, direct-conversion baseline") {
    // u1 touches A,B then converts; u2 touches A,B and does not:
    // v({A,B}) = 0.5, singletons unobserved -> 0.
    // phi_A = [0!1!*(v(A)-v(0)) + 1!0!*(v(AB)-v(B))]/2! = 0.5/2 = 0.25 = phi_B
    val sym = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a_chan"),
      (1L, ts("2024-01-01 10:01:00"), "b_chan"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "a_chan"),
      (2L, ts("2024-01-01 11:01:00"), "b_chan")
    ).toDF("user_id", "ts", "event_type")
    val s = graft.operators.Funnel
      .shapleyAttribution(sym, "user_id", "ts", "event_type", "purchase", Seq("a_chan", "b_chan"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s == Map("a_chan" -> 0.25, "b_chan" -> 0.25), s.toString)
    // null player: a channel in the set but never touched gets exactly 0
    val n = graft.operators.Funnel
      .shapleyAttribution(sym, "user_id", "ts", "event_type", "purchase",
        Seq("a_chan", "b_chan", "ghost"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(n("ghost") == 0.0, n.toString)
    // direct conversions raise the v(empty) baseline: u3 converts
    // untouched -> v(0) = 1/1; inclusive v({A}) covers all 3 journeys
    // -> 2/3; phi_A = 0.666666667 - 1 = -0.333333 (A anti-correlated)
    val direct = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a_chan"),
      (1L, ts("2024-01-01 10:01:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "a_chan"),
      (3L, ts("2024-01-01 12:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val d = graft.operators.Funnel
      .shapleyAttribution(direct, "user_id", "ts", "event_type", "purchase", Seq("a_chan"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d("a_chan") == -0.333333, d.toString)
    // touches at-or-after the first conversion do not join the coalition:
    // the only journey is coalition-empty and converted, so v(0) = v(A)
    // = 1 and the channel earns exactly nothing
    val after = Seq(
      (1L, ts("2024-01-01 10:00:00"), "purchase"),
      (1L, ts("2024-01-01 10:01:00"), "a_chan")
    ).toDF("user_id", "ts", "event_type")
    val a = graft.operators.Funnel
      .shapleyAttribution(after, "user_id", "ts", "event_type", "purchase", Seq("a_chan"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a("a_chan") == 0.0, a.toString)
  }

  test("sprtDaily: closed-form LLR trajectory and boundary decisions") {
    // p0=0.2 vs p1=0.8: l1 = ln4, l0 = ln(1/4) = -l1 (snapped at 1e-12).
    // day1: 2/10 successes -> llr = -6*ln4 = -8.317766 <= ln(1/19) -> accept_h0
    // day2 cumulative: 10/20 -> llr = 0 -> continue
    val events = (
      (1 to 10).map(i => (i.toLong, ts(f"2024-01-01 10:$i%02d:00"),
        if (i <= 2) "purchase" else "view")) ++
      (1 to 10).map(i => (100L + i, ts(f"2024-01-02 10:$i%02d:00"),
        if (i <= 8) "purchase" else "view"))
    ).toDF("event_id", "ts", "event_type")
    val got = graft.operators.Funnel
      .sprtDaily(events, "ts", "event_type", "purchase", p0 = 0.2, p1 = 0.8)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(got("2024-01-01") == ((10L, 2L, -8.317766, "accept_h0")), got.toString)
    assert(got("2024-01-02") == ((20L, 10L, 0.0, "continue")), got.toString)
    // symmetric evidence accepts H1
    val up = (1 to 10).map(i => (i.toLong, ts(f"2024-01-03 10:$i%02d:00"),
      if (i <= 8) "purchase" else "view")).toDF("event_id", "ts", "event_type")
    val u = graft.operators.Funnel
      .sprtDaily(up, "ts", "event_type", "purchase", p0 = 0.2, p1 = 0.8).collect().head
    assert(u.getString(4) == "accept_h1" && u.getDouble(3) == 8.317766, u.toString)
  }

  test("kaplanMeier: hand-computed curve with censoring, monotone, censored-only is empty") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // observation ends day 9 (user F active to the end). Last-event days:
    // A=1 B=1 C=3 (all churned, gap > 2d), D=8 E=8 F=9 (censored, gap <= 2d)
    val events = Seq(
      (1L, ts(0)), (1L, ts(1)),           // A dies day 1
      (2L, ts(1)),                        // B dies day 1
      (3L, ts(3)),                        // C dies day 3
      (4L, ts(8)), (5L, ts(8)), (6L, ts(9))
    ).toDF("user_id", "ts")
    val got = Funnel.kaplanMeier(events, "user_id", "ts", baseDate = "2024-01-01", churnGapDays = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // day 1: at risk 6, d 2 → S = 4/6; day 3: at risk 4, d 1 → S = 4/6 · 3/4 = 0.5
    assert(got.keySet == Set(1, 3), s"death days: ${got.keySet}")
    assert(got(1)._1 == 6L && got(1)._2 == 2L)
    assert(got(3)._1 == 4L && got(3)._2 == 1L)
    assert(math.abs(got(1)._3 - 2.0 / 3) < 1e-6 && math.abs(got(3)._3 - 0.5) < 1e-6)
    // survival is non-increasing across death days
    assert(got(1)._3 >= got(3)._3)
    // a fully-censored population has no death rows at all
    val alive = Seq((1L, ts(9)), (2L, ts(8))).toDF("user_id", "ts")
    assert(Funnel.kaplanMeier(alive, "user_id", "ts", "2024-01-01", churnGapDays = 2).isEmpty)
  }

  test("logRank: mirrored groups score 0, separated groups hand-computed significant, no deaths NULL") {
    import spark.implicits._
    // identical curves: O1 = E1 exactly -> chi2 = z = 0, p ~ 1
    val same = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),
      ("b", 1L, 1L), ("b", 2L, 1L), ("b", 3L, 1L)).toDF("g", "t", "e")
    val s = Funnel.logRank(same, "g", "t", "e").collect().head
    assert(s.getDouble(7) == 0.0 && s.getDouble(8) == 0.0 && !s.getBoolean(10), s.toString)
    // fully separated: E1 = 0.5+0.4+0.25 = 1.15, V = 0.25+0.24+0.1875,
    // chi2 = 1.85^2/0.6775 = 5.051661 -> significant
    val sep = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),
      ("b", 11L, 1L), ("b", 12L, 1L), ("b", 13L, 1L)).toDF("g", "t", "e")
    val r = Funnel.logRank(sep, "g", "t", "e").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(6))
      == ((3L, 3L, 3L, 1.15, 0.6775)), r.toString)
    assert(r.getDouble(7) == 5.051661 && r.getBoolean(10), r.toString)
    // all censored: no death times, NULL statistics rather than NaN
    val cens = Seq(("a", 1L, 0L), ("b", 2L, 0L)).toDF("g", "t", "e")
    val c = Funnel.logRank(cens, "g", "t", "e").collect().head
    assert(c.isNullAt(7) && c.isNullAt(9), c.toString)
  }

  test("assocRules: hand-computed support/confidence/lift on three baskets") {
    import spark.implicits._
    // baskets: {a,b}, {a}, {a,b,c} -> N=3, n_a=3 n_b=2 n_c=1, n_ab=2 n_ac=1 n_bc=1
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 11:00:00", "b"),
      (2L, "2024-01-01 10:00:00", "a"),
      (3L, "2024-01-01 10:00:00", "a"), (3L, "2024-01-01 11:00:00", "b"),
      (3L, "2024-01-01 12:00:00", "c"), (3L, "2024-01-01 13:00:00", "c") // dup presence collapses
    ).toDF("user_id", "tss", "event_type")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"), col("event_type"))
    val out = Funnel.assocRules(ev, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap // (antecedent, consequent)
    // columns: antecedent, consequent, n_ab, n_ante, n_cons, support, confidence, lift
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 2L && ab.getDouble(5) == 0.666667, ab.toString)
    assert(ab.getDouble(6) == 0.666667 && ab.getDouble(7) == 1.0, ab.toString)
    val ba = out(("b", "a"))
    assert(ba.getDouble(6) == 1.0 && ba.getDouble(7) == 1.0, ba.toString)
    val bc = out(("b", "c"))
    assert(bc.getLong(2) == 1L && bc.getDouble(6) == 0.5 && bc.getDouble(7) == 1.5, bc.toString)
    val cb = out(("c", "b"))
    assert(cb.getDouble(6) == 1.0 && cb.getDouble(7) == 1.5, cb.toString)
    assert(out.size == 6, out.keys.toString) // 3 undirected pairs, both directions
  }


  test("abPowerAnalysis: hand-computed power and required n; zero lift yields alpha/2 power") {
    import spark.implicits._
    // pa=0.8, pb=0.2 over 100/arm: z_eff = 0.6/sqrt(0.0032) = 10.6,
    // power saturates at 1.0; n_req = ceil(7.848878*0.32/0.36) = 7
    val strong = (0 until 100).flatMap(i => Seq((0, if (i < 80) 1 else 0), (1, if (i < 20) 1 else 0)))
      .toDF("variant", "converted")
    val s = Funnel.abPowerAnalysis(strong, "variant", "converted").collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) == ((100L, 80L, 100L, 20L)))
    assert(s.getDouble(4) == 0.8 && s.getDouble(5) == 0.2)
    assert(s.getDouble(6) == 1.0, s.toString)
    assert(s.getLong(7) == 7L, s.toString)
    // zero observed lift: power collapses to the alpha/2 floor, n undefined
    val flat = (0 until 100).flatMap(i => Seq((0, i % 2), (1, i % 2))).toDF("variant", "converted")
    val f = Funnel.abPowerAnalysis(flat, "variant", "converted").collect().head
    assert(math.abs(f.getDouble(6) - 0.025) < 0.001, f.toString)
    assert(f.isNullAt(7), f.toString)
  }


  test("rfmSegments: planted quintiles land 1=best, cents exact, cells aggregate") {
    import spark.implicits._
    // 10 users: user u purchases once on day u with value u dollars ->
    // recency/freq/monetary orders all deterministic; freq all ties (1)
    // break by user id
    val rows = (1 to 10).map { u =>
      (u.toLong, f"2024-01-$u%02d 10:00:00", "purchase", u.toDouble)
    }
    val ev = rows.toDF("user_id", "tss", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"), col("event_type"), col("value"))
    val out = graft.operators.Funnel
      .rfmSegments(ev, "user_id", "ts", "value", col("event_type") === "purchase")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> ((r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out.values.map(_._1).sum == 10L, out.toString)
    // quintiles of 10 users hold 2 each; recency and monetary orders agree
    // (later user = more recent AND bigger spend) while the all-ties
    // frequency breaks by id in the OPPOSITE direction — a clean
    // anti-diagonal: (1,5,1) = users {9,10}, ..., (5,1,5) = users {1,2}
    assert(out(((1, 5, 1))) == ((2L, 9.5)), out.toString)
    assert(out(((5, 1, 5))) == ((2L, 1.5)), out.toString)
    assert(out(((3, 3, 3))) == ((2L, 5.5)), out.toString)
    assert(out.size == 5, out.toString)
  }

}
