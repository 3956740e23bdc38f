package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.sources.Tables

class DataQualitySpec extends SparkSpec {

  test("profile counts violations per rule in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(5.0), "A", 10.0),
      (None, "A", -1.0),     // null qty, non-positive price
      (Some(99.0), "X", 5.0) // out of range, bad flag
    ).toDF("qty", "flag", "price")
    val out = DataQuality
      .profile(
        df,
        Seq(
          DataQuality.notNull("qty"),
          DataQuality.inRange("qty", 1, 50),
          DataQuality.positive("price"),
          DataQuality.matches("flag", "^[ANR]$")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("qty_not_null") == (1L, 3L))
    assert(out("qty_in_range") == (1L, 3L)) // null comparison -> no violation row
    assert(out("price_positive") == (1L, 3L))
    assert(out("flag_matches") == (1L, 3L))
  }

  test("clean corpus profiles clean; duplicateKeys flags real duplicates") {
    val li = Tables(spark, SharedSpark.sf0001).lineitem
    val profile = DataQuality
      .profile(li, Seq(DataQuality.notNull("l_orderkey"), DataQuality.inRange("l_quantity", 1, 50)))
      .collect()
    profile.foreach(r => assert(r.getLong(1) == 0L, r.getString(0)))

    // the synthetic corpus has NO unique line key (even (orderkey,
    // linenumber) repeats) — duplicateKeys is checked on controlled data
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "v")
    val dups = DataQuality.duplicateKeys(df, Seq("k", "v")).collect()
    assert(dups.length == 1 && dups.head.getLong(0) == 1L && dups.head.getLong(2) == 2L)
    assert(DataQuality.duplicateKeys(df, Seq("k", "v")).count() == 1)
    assert(DataQuality.duplicateKeys(li, Seq("l_orderkey")).count() > 0)
  }

  test("quantileBucketize: exact quartile bins, nulls excluded, loud validation") {
    import spark.implicits._
    // 1..100: quartile boundaries 25.75 / 50.5 / 75.25 — bins of 25/25/25/25
    val vals = ((1 to 100).map(i => Some(i.toDouble)) :+ None).toDF("x")
    val bins = DataQuality
      .quantileBucketize(vals, "x", Seq(0.25, 0.5, 0.75))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(bins == Map(0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L), s"got $bins")
    // every row lands in exactly one bin; the null never counts
    assert(bins.values.sum == 100L)
    intercept[IllegalArgumentException](DataQuality.quantileBucketize(vals, "x", Seq(0.5, 0.25)))
    intercept[IllegalArgumentException](DataQuality.quantileBucketize(vals, "x", Seq(1.5)))
    intercept[IllegalArgumentException](DataQuality.quantileBucketize(vals, "x", Seq.empty))
  }

  test("correlationMatrix: perfect/anti/zero-variance pairs, one row per pair, reshuffle-stable") {
    import spark.implicits._
    val df = (0 until 200).map { i =>
      (i.toDouble, 2.0 * i + 5.0, 100.0 - i, 7.0) // b = 2a+5 (r=1), c anti (r=-1), d constant
    }.toDF("a", "b", "c", "d")
    def run(x: org.apache.spark.sql.DataFrame) =
      DataQuality.correlationMatrix(x, Seq("a", "b", "c", "d"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2))).toMap
    val got = run(df)
    assert(got.size == 6)
    assert(got(("a", "b")) == Some(1.0) && got(("a", "c")) == Some(-1.0) && got(("b", "c")) == Some(-1.0))
    assert(got(("a", "d")).isEmpty && got(("b", "d")).isEmpty && got(("c", "d")).isEmpty,
      "zero-variance pairs must be NULL, not NaN")
    assert(run(df.repartition(11)) == got)
  }

  test("kAnonymityAudit: planted small group and single-valued group flagged, big diverse group clean") {
    import spark.implicits._
    val df = (
      (1 to 20).map(i => ("CA", 1, i * 10.0)) ++        // big, diverse: clean
        (1 to 3).map(i => ("NY", 2, i * 10.0)) ++       // size 3 < k: k_violation
        (1 to 15).map(_ => ("TX", 3, 42.0))             // big but single-valued: l_violation
    ).toDF("seg", "nat", "bal")
    val got = DataQuality.kAnonymityAudit(df, Seq("seg", "nat"), "bal", k = 10L, l = 2L)
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got("CA") == ((20L, 20L, false, false)))
    assert(got("NY") == ((3L, 3L, true, false)))
    assert(got("TX") == ((15L, 1L, false, true)))
  }

  test("psiDrift: identical slices → 0 everywhere; a shifted slice moves mass to high bins") {
    import spark.implicits._
    val ref = (1 to 1000).map(i => i.toDouble / 10.0).toDF("value")
    // same distribution → every bin contributes exactly 0
    val same = DataQuality.psiDrift(ref, ref, "value", bins = 10).collect()
    assert(same.length == 10)
    assert(same.forall(_.getDouble(3) == 0.0), s"identical slices must give psi 0: ${same.mkString(",")}")
    assert(same.map(r => r.getLong(1)).sum == 1000 && same.forall(r => r.getLong(1) == 100))
    // shifted current slice: positive PSI, mass visibly in the top bin
    val curShift = (1 to 1000).map(i => i.toDouble / 10.0 + 50.0).toDF("value")
    val drift = DataQuality.psiDrift(ref, curShift, "value", bins = 10).collect()
    val psi = drift.map(_.getDouble(3)).sum
    assert(psi > 0.25, s"a half-range shift is major drift, psi=$psi")
    assert(drift.find(_.getInt(0) == 9).get.getLong(2) > 500, "shifted mass must land in the top bin")
    // empty current bins hit the clamp, never NaN/Inf
    assert(drift.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("chiSquareDrift: identical mixes → 0; a category swap produces a large statistic") {
    import spark.implicits._
    val ref = (Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(100)("c")).toDF("k")
    val same = DataQuality.chiSquareDrift(ref, ref, "k").collect()
    assert(same.length == 3 && same.forall(_.getDouble(3) == 0.0))
    // current flips a and c: the statistic over 2 d.o.f. far exceeds any critical value
    val cur = (Seq.fill(100)("a") ++ Seq.fill(200)("b") ++ Seq.fill(300)("c")).toDF("k")
    val drift = DataQuality.chiSquareDrift(ref, cur, "k").collect()
    assert(drift.map(_.getDouble(3)).sum > 50.0)
    // a category present only in one slice still grids with observed 0
    val curNew = (Seq.fill(600)("zzz")).toDF("k")
    val rows = DataQuality.chiSquareDrift(ref, curNew, "k").collect()
    assert(rows.length == 4 && rows.forall(r => !r.getDouble(3).isNaN))
  }

  test("madOutliers: planted spike flagged, robust to its own outlier, MAD=0 group silent") {
    import spark.implicits._
    // group g: 1..21 symmetric around median 11 (MAD = 5), plus one spike
    // at 1000 → dev 989, score 989/(1.4826*5) ≈ 133 — flagged; no inlier
    // crosses 3 (max inlier dev 10 → score ≈ 1.35). The spike CANNOT
    // drag the median/MAD far enough to hide itself — the point of MAD
    // over mean/stddev. Group c is constant → MAD 0 → no flags, no Inf.
    val rows = ((1 to 21).map(i => ("g", i.toLong, i.toDouble)) :+ ("g", 99L, 1000.0)) ++
      (1 to 8).map(i => ("c", 100L + i, 7.0))
    val out = DataQuality
      .madOutliers(rows.toDF("grp", "id", "v"), "grp", "id", "v", k = 3.0)
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "g" && out.head.getLong(1) == 99L)
    assert(out.head.getDouble(3) > 100.0)
    // determinism: same flags (and scores) at different parallelism
    val rerun = DataQuality
      .madOutliers(rows.toDF("grp", "id", "v").repartition(13), "grp", "id", "v", k = 3.0)
      .collect()
    assert(rerun.map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet ==
      out.map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet)
  }

  test("dpNoisyCounts: seed-reproducible, seed-sensitive, Laplace-shaped noise, partitioning-free") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i % 100).toLong).toDF("k")
    def run(seed: Long, d: org.apache.spark.sql.DataFrame = df) =
      DataQuality.dpNoisyCounts(d, col("k"), "key", seed, noiseScale = 2)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run(7L)
    assert(a.size == 100)
    // same seed → bit-identical release; repartitioning cannot move it
    assert(run(7L) == a && run(7L, df.repartition(13)) == a)
    // a fresh seed is a fresh release
    val b2 = run(8L)
    assert(a != b2)
    // every noisy count is true count (50) + bounded Laplace noise:
    // |noise| <= b * 53*ln2 ≈ 73.5 at the 2^-53 floor; and noise actually
    // moves counts (not all exactly 50)
    val noises = a.values.map(_ - 50.0)
    assert(noises.forall(n => math.abs(n) <= 74.0), s"max ${noises.map(math.abs).max}")
    assert(noises.count(n => math.abs(n) > 0.01) > 50, "noise must actually perturb")
    // median |noise| for Laplace(b=2) is b·ln2 ≈ 1.39 — sanity-band it
    val med = noises.map(math.abs).toSeq.sorted.apply(50)
    assert(med > 0.2 && med < 8.0, s"median |noise| $med out of the Laplace(2) band")
    intercept[IllegalArgumentException](
      DataQuality.dpNoisyCounts(df, col("k"), "key", 1L, noiseScale = 0))
  }

  test("kruskalWallis: separated pair closed form, identical groups at 0 with tie correction") {
    import spark.implicits._
    // A={1,2}, B={3,4}: rank sums 3 and 7 -> H = 0.6*29 - 15 = 2.4, no ties
    val sep = (Seq(1, 2).map(v => ("A", v.toLong)) ++ Seq(3, 4).map(v => ("B", v.toLong)))
      .toDF("g", "v")
    val s = DataQuality.kruskalWallis(sep, "g", "v").collect().head
    assert((s.getLong(0), s.getLong(1), s.getDouble(2), s.getDouble(3)) == ((4L, 2L, 2.4, 2.4)),
      s.toString)
    // identical distributions: H = 0; tie correction divides by C = 0.8
    // and keeps it 0
    val same = (Seq(1, 2).map(v => ("A", v.toLong)) ++ Seq(1, 2).map(v => ("B", v.toLong)))
      .toDF("g", "v")
    val e = DataQuality.kruskalWallis(same, "g", "v").collect().head
    assert(e.getDouble(2) == 0.0 && e.getDouble(3) == 0.0, e.toString)
  }

  test("jsDivergence: identical is 0, disjoint is ln2, symmetric") {
    import spark.implicits._
    val a = Seq("x", "x", "y").toDF("c")
    val same = DataQuality.jsDivergence(a, a, "c").collect()
    assert(same.forall(_.getDouble(5) == 0.0), same.mkString(","))
    // disjoint supports: every category contributes 0.5*share*ln2; the
    // total is exactly ln 2 on the 1e-12 grid
    val b = Seq("z", "z", "w").toDF("c")
    val dis = DataQuality.jsDivergence(a, b, "c").collect()
    val total = dis.map(r => BigDecimal(r.getDouble(5))).sum
    assert((total - BigDecimal("0.693147180560")).abs < BigDecimal("1e-9"), total.toString)
    // symmetry: swapping sides permutes shares but keeps contributions
    val ab = DataQuality.jsDivergence(a, b, "c").collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    val ba = DataQuality.jsDivergence(b, a, "c").collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(ab == ba, s"$ab vs $ba")
  }

  test("giniCoefficient: equality is 0, two-entity max is 0.5, rows aggregate per entity") {
    import spark.implicits._
    val eq = Seq(("a", 5.0), ("b", 5.0), ("c", 5.0)).toDF("e", "v")
    assert(DataQuality.giniCoefficient(eq, "e", "v").collect().head.getDouble(2) == 0.0)
    val max2 = Seq(("a", 0.0), ("b", 10.0)).toDF("e", "v")
    val m = DataQuality.giniCoefficient(max2, "e", "v").collect().head
    assert(m.getLong(0) == 2L && m.getDouble(2) == 0.5, m.toString)
    // multiple rows per entity aggregate before ranking
    val multi = Seq(("a", 2.0), ("a", 3.0), ("b", 5.0)).toDF("e", "v")
    assert(DataQuality.giniCoefficient(multi, "e", "v").collect().head.getDouble(2) == 0.0)
  }

  test("spearmanMatrix: monotone nonlinear is exactly 1, reversal -1, tie block 0") {
    import spark.implicits._
    val df = (1 to 5).map(i => (i.toDouble, math.pow(i, 3), -i.toDouble)).toDF("x", "y", "z")
    val got = DataQuality.spearmanMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // Pearson on x,y is < 1 (cubic), Spearman is exactly 1
    assert(got(("x", "y")) == 1.0 && got(("x", "z")) == -1.0 && got(("y", "z")) == -1.0, got.toString)
    // tie-heavy block design: rank vectors orthogonal -> 0
    val ties = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0)).toDF("a", "b")
    val t = DataQuality.spearmanMatrix(ties, Seq("a", "b")).collect().head
    assert(t.getDouble(2) == 0.0, t.toString)
  }

  test("mannWhitneyPairs: separated groups at effect 0/1, identical groups at 0.5, exact tie ranks") {
    import spark.implicits._
    val sep = (Seq(1, 2, 3).map(v => ("A", v.toLong)) ++ Seq(4, 5, 6).map(v => ("B", v.toLong)))
      .toDF("g", "v")
    val s = DataQuality.mannWhitneyPairs(sep, "g", "v").collect().head
    // A is always smaller: U_A = 0, effect 0
    assert((s.getString(0), s.getString(1), s.getLong(2), s.getLong(3), s.getLong(4), s.getDouble(5))
      == (("A", "B", 3L, 3L, 0L, 0.0)), s.toString)
    val same = (Seq(1, 2).map(v => ("A", v.toLong)) ++ Seq(1, 2).map(v => ("B", v.toLong)))
      .toDF("g", "v")
    val e = DataQuality.mannWhitneyPairs(same, "g", "v").collect().head
    // identical distributions: 2U = 4, effect exactly 0.5 via tie ranks
    assert(e.getLong(4) == 4L && e.getDouble(5) == 0.5, e.toString)
    // three groups emit all three sorted pairs
    val tri = sep.union(Seq(("C", 9L)).toDF("g", "v"))
    val pairs = DataQuality.mannWhitneyPairs(tri, "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs == Seq(("A", "B"), ("A", "C"), ("B", "C")), pairs.toString)
  }

  test("trimmedMean: rank-exact trim, outlier immunity, zero trim is the plain mean") {
    import spark.implicits._
    val df = (1L to 10L).map(v => ("g", v)).toDF("g", "v")
    val r = DataQuality.trimmedMean(df, "g", "v", trimPct = 0.1).collect().head
    // k = 1: keep 2..9, sum 44 over 8 -> 5.5
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) == ((10L, 1L, 8L, 5.5)),
      r.toString)
    val out = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 1000L)).toDF("g", "v")
    val o = DataQuality.trimmedMean(out, "g", "v", trimPct = 0.25).collect().head
    assert(o.getDouble(4) == 2.5, o.toString) // the outlier never touches the sum
    val z = DataQuality.trimmedMean(out, "g", "v", trimPct = 0.0).collect().head
    assert(z.getDouble(4) == 251.5, z.toString)
  }

  test("cramersV: perfect association is 1, independence is 0, degenerate axis NULL") {
    import spark.implicits._
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")).toDF("a", "b")
    val p = DataQuality.cramersV(perfect, "a", "b").collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getDouble(3), p.getDouble(4))
      == ((4L, 2L, 2L, 4.0, 1.0)), p.toString)
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val i = DataQuality.cramersV(indep, "a", "b").collect().head
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0, i.toString)
    val degen = Seq(("x", "p"), ("y", "p")).toDF("a", "b")
    val d = DataQuality.cramersV(degen, "a", "b").collect().head
    assert(d.isNullAt(4), d.toString)
  }

  test("tClosenessAudit: disjoint-support groups hit the EMD bound, balanced group hits 0, single-category NULL") {
    import spark.implicits._
    // X all-1s, Y all-2s, Z balanced; global = (3,3): X and Y sit at
    // |6*2-2*3|/(2*6*1) = 0.5, Z at exactly 0
    val df = Seq(
      ("X", 1L), ("X", 1L), ("Y", 2L), ("Y", 2L), ("Z", 1L), ("Z", 2L)
    ).toDF("qi", "sv")
    val r = DataQuality.tClosenessAudit(df, Seq("qi"), "sv", t = 0.2)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("X").getDouble(3) == 0.5 && r("X").getBoolean(4), r("X").toString)
    assert(r("Y").getDouble(3) == 0.5 && r("Y").getBoolean(4), r("Y").toString)
    assert(r("Z").getDouble(3) == 0.0 && !r("Z").getBoolean(4), r("Z").toString)
    assert(r.values.forall(_.getLong(1) == 2L)) // group_size
    // one global category: EMD undefined -> NULL, no division error
    val degen = Seq(("A", 7L), ("B", 7L)).toDF("qi", "sv")
    val d = DataQuality.tClosenessAudit(degen, Seq("qi"), "sv").collect()
    assert(d.forall(_.isNullAt(3)), d.mkString(","))
  }

  test("bootstrapMeanCi: CI brackets the mean and shrinks with n, deterministic, constant data collapses") {
    import spark.implicits._
    val small = (1L to 200L).map(k => (k, (k % 100).toDouble)).toDF("k", "v")
    val s = DataQuality.bootstrapMeanCi(small, "k", "v").collect().head
    assert(s.getLong(0) == 200L && s.getInt(1) == 64, s.toString)
    assert(s.getDouble(3) <= s.getDouble(2) && s.getDouble(2) <= s.getDouble(4), s.toString)
    // 10x the data: the interval tightens (sd ~ 1/sqrt(n))
    val big = (1L to 2000L).map(k => (k, (k % 100).toDouble)).toDF("k", "v")
    val g = DataQuality.bootstrapMeanCi(big, "k", "v").collect().head
    assert(g.getDouble(4) - g.getDouble(3) < s.getDouble(4) - s.getDouble(3), s"$s vs $g")
    // deterministic across partitionings
    val again = DataQuality.bootstrapMeanCi(big.repartition(13), "k", "v").collect().head
    assert(g.toString == again.toString)
    // constant data: every replicate mean IS the constant -> zero-width CI
    val const = (1L to 50L).map(k => (k, 7.0)).toDF("k", "v")
    val c = DataQuality.bootstrapMeanCi(const, "k", "v").collect().head
    assert(c.getDouble(2) == 7.0 && c.getDouble(3) == 7.0 && c.getDouble(4) == 7.0, c.toString)
  }

  test("mondrianAnonymize: 1-D hand recursion, widest-dim choice, identical QIs never split, k respected") {
    import spark.implicits._
    // 1..10 at k=2: r -> (1-5 | 6-10) -> (1-3 | 4-5 | 6-8 | 9-10) -> stops
    val one = (1L to 10L).map(v => Tuple1(v)).toDF("x")
    val r = DataQuality.mondrianAnonymize(one, Seq("x"), k = 2L, rounds = 4)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
    assert(r.toSeq == Seq(
      "rLL" -> ((3L, 1L, 3L)), "rLR" -> ((2L, 4L, 5L)),
      "rRL" -> ((3L, 6L, 8L)), "rRR" -> ((2L, 9L, 10L))), r.mkString(","))
    // 2-D: x spans 0..100, y only 0..1 -> every split is on x (y ranges stay full)
    val two = (0L to 100L by 4L).map(x => (x, x % 2)).toDF("x", "y")
    val t = DataQuality.mondrianAnonymize(two, Seq("x", "y"), k = 5L, rounds = 3)
      .collect()
    assert(t.length > 1)
    val xRanges = t.map(row => (row.getLong(2), row.getLong(3))).sortBy(_._1)
    xRanges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo, xRanges.mkString(",")) }
    t.foreach(row => assert(row.getLong(1) >= 5L, row.toString))
    // zero ranges: a partition of identical QI rows never splits
    val const = Seq.fill(7)((1L, 2L)).toDF("x", "y")
    val c = DataQuality.mondrianAnonymize(const, Seq("x", "y"), k = 2L, rounds = 3).collect()
    assert(c.length == 1 && c.head.getLong(1) == 7L, c.mkString(","))
  }

  test("cochranArmitage: perfect monotone trend significant, flat rate zero, degenerate NULL") {
    import spark.implicits._
    // rates 0/5, 2/5, 4/5 across scores 0,1,2: hand integers
    // N=15, R=6; A = sum w(N r - n R) = 1*(30-30) + 2*(60-30) = 60
    // swn = 15, sw2n = 25 -> B = 15*25 - 225 = 150
    val rows = (Seq.fill(5)((0L, false)) ++
      (Seq.fill(2)((1L, true)) ++ Seq.fill(3)((1L, false))) ++
      (Seq.fill(4)((2L, true)) ++ Seq.fill(1)((2L, false)))).toDF("w", "s")
    val r = DataQuality.cochranArmitage(rows, "w", col("s")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((3L, 15L, 6L, 60L, 150L)), r.toString)
    val zWant = BigDecimal(60.0 * math.sqrt(15.0 / (6.0 * 9.0 * 150.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == zWant && r.getBoolean(7), r.toString)
    // identical rate everywhere: A = 0 exactly -> z = 0, insignificant
    val flat = (0L to 2L).flatMap(w => Seq((w, true), (w, false))).toDF("w", "s")
    val f = DataQuality.cochranArmitage(flat, "w", col("s")).collect().head
    assert(f.getLong(3) == 0L && f.getDouble(5) == 0.0 && !f.getBoolean(7), f.toString)
    // all successes: no variance -> NULL, not NaN
    val degen = Seq((0L, true), (1L, true)).toDF("w", "s")
    assert(DataQuality.cochranArmitage(degen, "w", col("s")).collect().head.isNullAt(5))
  }

  test("randomizedResponse: seed-reproducible, estimator self-consistent, recovers the truth within noise") {
    import spark.implicits._
    val df = (1L to 2000L).map(k => ("g", k, k % 4 != 0)).toDF("grp", "key", "truth")
    def run(seed: Long) = DataQuality.randomizedResponse(
      df, "grp", "key", col("truth"), seed = seed, p = 0.75).collect().head
    val r = run(7L)
    assert(r.toString == run(7L).toString)         // same seed, same release
    assert(r.toString != run(8L).toString)         // a fresh seed is a fresh release
    val (n, nyes, piHat, piTrue) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    assert(n == 2000L && piTrue == 0.75, r.toString)
    val recomputed = BigDecimal((nyes.toDouble / n + (-0.25)) / 0.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(piHat == recomputed, s"$piHat vs $recomputed")
    // unbiased estimator: sd ~ sqrt(p(1-p))/(2p-1)/sqrt(n) ~ 0.019 — 5 sigma
    assert(math.abs(piHat - piTrue) < 0.1, r.toString)
  }

  test("quantileNormalize: shifted groups map to identical references, hand-interpolated closed forms") {
    import spark.implicits._
    // two equal-size groups shifted by 10: pooled = 1,2,3,11,12,13; both
    // groups land on the SAME reference values at ranks 1..3
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 11L), ("b", 12L), ("b", 13L))
      .toDF("g", "v")
    val r = DataQuality.quantileNormalize(df, "g", "v").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(2)).sorted.toSeq).toMap
    val want = Seq(1.833333, 7.0, 12.166667)
    assert(r("a") == want, r("a").toString)
    assert(r("b") == want, r("b").toString)
    // single group: QN at equal pool = near-identity on interior ranks
    val one = Seq(("x", 10L), ("x", 20L), ("x", 30L)).toDF("g", "v")
    val o = DataQuality.quantileNormalize(one, "g", "v").collect()
      .map(_.getDouble(2)).sorted.toSeq
    // t = (r-.5)/3*2 -> 0.333../1.0/1.666..: 13.333333, 20, 26.666667
    assert(o == Seq(13.333333, 20.0, 26.666667), o.toString)
  }

  test("cohensKappa: textbook 0.4 fixture, independence is 0, perfect agreement 1, constant raters NULL") {
    import spark.implicits._
    // classic 2x2: O = [[20,5],[10,15]] -> po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)(("p", "p")) ++ Seq.fill(5)(("p", "n")) ++
      Seq.fill(10)(("n", "p")) ++ Seq.fill(15)(("n", "n"))
    val r = DataQuality.cohensKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      == ((50L, 2L, 0.7, 0.5, 0.4)), r.toString)
    val indep = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")).toDF("a", "b")
    assert(DataQuality.cohensKappa(indep, "a", "b").collect().head.getDouble(4) == 0.0)
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(DataQuality.cohensKappa(perfect, "a", "b").collect().head.getDouble(4) == 1.0)
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(DataQuality.cohensKappa(const, "a", "b").collect().head.isNullAt(4))
  }

  test("bhFdrMannWhitney: exact 2U parity with mannWhitneyPairs, BH step-up hand case, identical groups never reject") {
    import spark.implicits._
    // three groups: A ≡ B (identical), C far shifted — the battery must
    // reject both (A,C) and (B,C) under BH at alpha=0.05 and keep (A,B)
    val df = (Seq.tabulate(20)(i => ("A", (i % 5) + 1L)) ++
      Seq.tabulate(20)(i => ("B", (i % 5) + 1L)) ++
      Seq.tabulate(20)(i => ("C", (i % 5) + 101L))).toDF("g", "v")
    val r = DataQuality.bhFdrMannWhitney(df, "g", "v").collect()
    val byPair = r.map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // exact-integer 2U must match the per-pair driver-loop implementation
    val mw = DataQuality.mannWhitneyPairs(df, "g", "v").collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(4)).toMap
    mw.foreach { case (k, u2) => assert(byPair(k).getLong(4) == u2, s"$k 2U mismatch") }
    val ab = byPair(("A", "B")); val ac = byPair(("A", "C")); val bc = byPair(("B", "C"))
    assert(ab.getDouble(5) == 0.0 && ab.getDouble(6) > 0.999, ab.toString) // z=0 -> p~1
    assert(ac.getLong(4) == 0L && !ab.getBoolean(9), ac.toString) // C dominates: U_A = 0
    assert(ac.getBoolean(9) && bc.getBoolean(9), s"$ac / $bc")
    // BH hand case: equal shifted pairs share the min q, the null pair q is ~1
    assert(ac.getDouble(8) == bc.getDouble(8), s"${ac.getDouble(8)} vs ${bc.getDouble(8)}")
    assert(ab.getDouble(8) > 0.9, ab.toString)
    // q is the running min from the bottom: nondecreasing in rank order
    val inRank = r.sortBy(_.getInt(7)).map(_.getDouble(8)).toSeq
    assert(inRank == inRank.sorted, inRank.toString)
  }

  test("ksTestPairs: disjoint supports hit D=1, identical samples hit D=0, interleaved closed form") {
    import spark.implicits._
    // disjoint supports: at v=2 the gap is |2*2 - 0*2| = 4 over n_a*n_b = 4 -> D = 1
    val sep = (Seq(1, 2).map(v => ("A", v.toLong)) ++ Seq(3, 4).map(v => ("B", v.toLong)))
      .toDF("g", "v")
    val s = DataQuality.ksTestPairs(sep, "g", "v").collect().head
    assert((s.getString(0), s.getString(1), s.getLong(2), s.getLong(3), s.getLong(4), s.getDouble(5))
      == (("A", "B", 2L, 2L, 4L, 1.0)), s.toString)
    // ks_stat = D * sqrt(na*nb/(na+nb)) = 1 * sqrt(1) = 1 exactly
    assert(s.getDouble(6) == 1.0, s.toString)
    // identical samples: every cumulative gap is zero
    val same = (Seq(1, 2, 3).map(v => ("A", v.toLong)) ++ Seq(1, 2, 3).map(v => ("B", v.toLong)))
      .toDF("g", "v")
    val e = DataQuality.ksTestPairs(same, "g", "v").collect().head
    assert(e.getLong(4) == 0L && e.getDouble(5) == 0.0, e.toString)
    // interleaved A={1,3}, B={2,4}: max gap at v=1 (or 3): |1*2 - 0*2| = 2 -> D = 0.5
    val mix = (Seq(1, 3).map(v => ("A", v.toLong)) ++ Seq(2, 4).map(v => ("B", v.toLong)))
      .toDF("g", "v")
    val m = DataQuality.ksTestPairs(mix, "g", "v").collect().head
    assert(m.getLong(4) == 2L && m.getDouble(5) == 0.5, m.toString)
    // three groups emit all three sorted pairs
    val tri = sep.union(Seq(("C", 9L)).toDF("g", "v"))
    val ps = DataQuality.ksTestPairs(tri, "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(ps == Seq(("A", "B"), ("A", "C"), ("B", "C")), ps.toString)
  }

  test("anovaF: hand-computed two-group F, identical groups score 0") {
    import spark.implicits._
    // A=[1,2,3], B=[4,5,6]: t9 = 36/3 + 225/3 = 87, grand = 441/6 = 73.5,
    // ssb = 13.5; sxx = 14 + 77 = 91, ssw = 4; F = (13.5/1)/(4/4) = 13.5
    val df = Seq(("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)).toDF("g", "v")
    val r = DataQuality.anovaF(df, "g", "v").collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 4L)
    assert(r.getDouble(4) == 13.5 && r.getDouble(5) == 4.0 && r.getDouble(6) == 13.5, r.toString)
    // identical distributions: SSB = 0 -> F = 0
    val same = Seq(("A", 1), ("A", 2), ("B", 1), ("B", 2)).toDF("g", "v")
    val s = DataQuality.anovaF(same, "g", "v").collect().head
    assert(s.getDouble(4) == 0.0 && s.getDouble(6) == 0.0, s.toString)
  }

  test("welchTTest: hand-computed t and Welch-Satterthwaite df") {
    import spark.implicits._
    // A=[1,2,3] (mean 2, var 1), B=[7,9,11] (mean 9, var 4):
    // t = -7/sqrt(1/3+4/3) = -5.422177, df = (5/3)^2/((1/9)/2+(16/9)/2) = 50/17
    val df = Seq(("A", 1), ("A", 2), ("A", 3), ("B", 7), ("B", 9), ("B", 11)).toDF("g", "v")
    val r = DataQuality.welchTTest(df, "g", "v", "A", "B").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 9.0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 4.0)
    assert(math.abs(r.getDouble(6) - -5.422177) < 1e-9, s"t=${r.getDouble(6)}")
    assert(math.abs(r.getDouble(7) - 50.0 / 17.0) < 1e-5, s"df=${r.getDouble(7)}")
    assert(r.getDouble(8) > 0.0 && r.getDouble(8) < 0.01, s"p=${r.getDouble(8)}")
  }

  test("brownForsythe: identical deviation profiles score 0, unequal spread scores positive") {
    import spark.implicits._
    val same = Seq(("A", 1), ("A", 2), ("A", 3), ("B", 11), ("B", 12), ("B", 13)).toDF("g", "v")
    val s = DataQuality.brownForsythe(same, "g", "v").collect().head
    // same spread around different centers: |x - med| identical -> W = 0
    assert(s.getDouble(6) == 0.0, s.toString)
    val diff = Seq(("A", 1), ("A", 2), ("A", 3), ("B", 0), ("B", 10), ("B", 20)).toDF("g", "v")
    val d = DataQuality.brownForsythe(diff, "g", "v").collect().head
    assert(d.getDouble(6) > 1.0, d.toString)
  }

  test("jarqueBera: symmetric uniform grid has zero skew, kurtosis 1.7, closed-form p") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 4, 5).toDF("v")
    val r = DataQuality.jarqueBera(df, "v").collect().head
    assert(r.getLong(0) == 5L && r.getDouble(1) == 3.0 && r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 1.7, r.toString)
    // JB = 5/6 * (1.3^2/4) = 0.352083; p = exp(-JB/2)
    assert(r.getDouble(5) == 0.352083, r.toString)
    assert(math.abs(r.getDouble(6) - math.exp(-0.352083 / 2.0)) < 1e-6, r.toString)
  }

  test("rocAuc: perfect separation 1.0, all-tied scores 0.5, reversed ranking 0.0") {
    import spark.implicits._
    val perfect = Seq((10, 1), (11, 1), (1, 0), (2, 0)).toDF("s", "y")
    val p = DataQuality.rocAuc(perfect, "s", "y").collect().head
    assert(p.getLong(0) == 2L && p.getLong(1) == 2L)
    assert(p.getDouble(2) == 1.0 && p.getDouble(3) == 1.0, p.toString)
    val tied = Seq((5, 1), (5, 1), (5, 0), (5, 0)).toDF("s", "y")
    val t = DataQuality.rocAuc(tied, "s", "y").collect().head
    assert(t.getDouble(2) == 0.5 && t.getDouble(3) == 0.0, t.toString)
    val rev = Seq((1, 1), (2, 1), (10, 0), (11, 0)).toDF("s", "y")
    val v = DataQuality.rocAuc(rev, "s", "y").collect().head
    assert(v.getDouble(2) == 0.0 && v.getDouble(3) == -1.0, v.toString)
  }

  test("friedmanTest: perfectly consistent ordering hits n(k-1), incomplete blocks drop") {
    import spark.implicits._
    // 3 blocks, 3 treatments, always A<B<C: doubled rank sums 6/12/18,
    // chi2 = 3*504/(3*3*4) - 36 = 6 = n(k-1), the tie-free maximum
    val df = Seq(
      ("d1", "A", 1), ("d1", "B", 2), ("d1", "C", 3),
      ("d2", "A", 10), ("d2", "B", 20), ("d2", "C", 30),
      ("d3", "A", 5), ("d3", "B", 6), ("d3", "C", 7),
      ("d4", "A", 1), ("d4", "B", 2) // incomplete block: dropped
    ).toDF("blk", "trt", "v")
    val r = DataQuality.friedmanTest(df, "blk", "trt", "v").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 2L, r.toString)
    assert(r.getDouble(3) == 6.0 && r.getDouble(4) == 6.0, r.toString)
    // a shuffled ordering scores strictly lower
    val mixed = Seq(
      ("d1", "A", 3), ("d1", "B", 2), ("d1", "C", 1),
      ("d2", "A", 1), ("d2", "B", 3), ("d2", "C", 2),
      ("d3", "A", 2), ("d3", "B", 1), ("d3", "C", 3)
    ).toDF("blk", "trt", "v")
    val m = DataQuality.friedmanTest(mixed, "blk", "trt", "v").collect().head
    assert(m.getDouble(3) == 0.0, m.toString) // perfectly balanced ranks
  }

  test("lDiversityAudit: single-value class flagged, uniform class's entropy-l = its distinct-l") {
    import spark.implicits._
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "x"), ("b", "y"), ("b", "x"), ("b", "y")
    ).toDF("qi", "sv")
    val out = DataQuality.lDiversityAudit(df, Seq("qi"), "sv", minL = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 3L && a.getLong(2) == 1L && a.getDouble(3) == 1.0)
    assert(a.getBoolean(4) && a.getBoolean(5), a.toString)
    val b = out("b")
    assert(b.getLong(1) == 4L && b.getLong(2) == 2L && b.getDouble(3) == 2.0)
    assert(!b.getBoolean(4) && !b.getBoolean(5), b.toString)
  }

  test("mcnemarTest: only discordant cells carry signal; hand chi2 with continuity correction") {
    import spark.implicits._
    // b=6 (A right, B wrong), c=1 -> chi2 = (5-1)^2/7 = 16/7
    val rows =
      Seq.fill(6)((true, false, true)) ++ Seq((false, true, true)) ++
        Seq.fill(2)((true, true, true)) ++ Seq((false, false, true))
    val df = rows.toDF("pred_a", "pred_b", "label")
    val r = DataQuality.mcnemarTest(df, "pred_a", "pred_b", "label").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 6L, 1L, 1L)))
    assert(r.getDouble(4) == 2.285714, r.toString)
    assert(r.getDouble(5) > 0.12 && r.getDouble(5) < 0.14, r.toString)
    // all concordant: undefined, NULL not NaN
    val agree = Seq((true, true, true), (false, false, true)).toDF("pred_a", "pred_b", "label")
    val a = DataQuality.mcnemarTest(agree, "pred_a", "pred_b", "label").collect().head
    assert(a.isNullAt(4) && a.isNullAt(5), a.toString)
  }


  test("brierDecompose: Murphy identity closes, perfect forecasts score 0, constant forecast has zero resolution") {
    import spark.implicits._
    // mixed-calibration toy: scale 10, bin width 5 (2 bins)
    val rows = Seq(
      (1, 0), (1, 0), (2, 1), (3, 0),      // low bin
      (8, 1), (8, 1), (9, 0), (9, 1)       // high bin
    ).toDF("s", "y")
    val r = DataQuality.brierDecompose(rows, "s", "y", scale = 10, binWidth = 5).collect().head
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L)
    val (bs, rel, res, unc, wbv, wbc) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    // the coarse-bin Murphy identity BS = REL - RES + UNC + WBV - 2*WBC
    assert(math.abs(bs - (rel - res + unc + wbv - 2 * wbc)) < 1e-5, r.toString)
    assert(wbc == -0.003125, r.toString) // hand: (0.025 - 0.05)/8
    assert(res > 0.0 && unc == 0.25, r.toString) // ybar = 1/2
    // perfect sharp forecasts: BS = 0, REL = 0, RES = UNC
    val perfect = Seq((0, 0), (0, 0), (10, 1), (10, 1)).toDF("s", "y")
    val p = DataQuality.brierDecompose(perfect, "s", "y", scale = 10, binWidth = 5).collect().head
    assert(p.getDouble(2) == 0.0 && p.getDouble(3) == 0.0, p.toString)
    assert(p.getDouble(4) == p.getDouble(5), p.toString)
    // one constant forecast value: RES = 0 and WBV = 0 by construction
    val const = Seq((5, 0), (5, 1), (5, 1), (5, 0)).toDF("s", "y")
    val c = DataQuality.brierDecompose(const, "s", "y", scale = 10, binWidth = 5).collect().head
    assert(c.getDouble(4) == 0.0 && c.getDouble(6) == 0.0 && c.getDouble(7) == 0.0, c.toString)
    assert(c.getDouble(2) == 0.25 && c.getDouble(3) == 0.0, c.toString) // f=0.5 vs ybar=0.5
  }


  test("cramerVonMises: identical samples score 0, disjoint supports hit the maximum, hand case") {
    import spark.implicits._
    val same = Seq(("A", 1), ("A", 2), ("R", 1), ("R", 2)).toDF("g", "v")
    val s = DataQuality.cramerVonMises(same, "g", "v", "A", "R").collect().head
    assert(s.getDouble(2) == 0.0, s.toString)
    // disjoint supports A = {1,2}, R = {11,12}: per-value terms
    // 1*(1/2)^2 + 1*1 + 1*(1/2)^2 + 0 = 1.5, T = (4/16)*1.5 = 0.375 —
    // which equals the classical rank-form U-statistic value
    // (U = 16, T = 16/16 - 15/24 = 0.375)
    val disj = Seq(("A", 1), ("A", 2), ("R", 11), ("R", 12)).toDF("g", "v")
    val d = DataQuality.cramerVonMises(disj, "g", "v", "A", "R").collect().head
    assert(d.getLong(0) == 2L && d.getLong(1) == 2L && d.getDouble(2) == 0.375, d.toString)
    // ties across samples contribute exactly once per distinct value
    val tied = Seq(("A", 5), ("A", 5), ("R", 5), ("R", 9)).toDF("g", "v")
    val t = DataQuality.cramerVonMises(tied, "g", "v", "A", "R").collect().head
    // values 5: F1=1, F2=1/2 -> 3*(1/2)^2 = 0.75 ; value 9: gap 0
    // T = (4/16)*0.75 = 0.1875
    assert(t.getDouble(2) == 0.1875, t.toString)
  }


  test("driftTimeline: reference-like days score 0, a flipped day spikes, absent categories count") {
    import spark.implicits._
    // ref window (days 1-2): a:b = 2:1 each day; day 3 matches; day 4 flips
    val rows =
      Seq.fill(2)(("2024-01-01 10:00:00", "a")) ++ Seq(("2024-01-01 11:00:00", "b")) ++
        Seq.fill(2)(("2024-01-02 10:00:00", "a")) ++ Seq(("2024-01-02 11:00:00", "b")) ++
        Seq.fill(2)(("2024-01-03 10:00:00", "a")) ++ Seq(("2024-01-03 11:00:00", "b")) ++
        Seq.fill(3)(("2024-01-04 10:00:00", "b"))
    val ev = rows.toDF("tss", "event_type").select(to_timestamp(col("tss")).as("ts"), col("event_type"))
    val out = DataQuality.driftTimeline(ev, "ts", "event_type", refEnd = "2024-01-03")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.size == 4)
    assert(out("2024-01-01") == ((3L, 0.0)) && out("2024-01-03") == ((3L, 0.0)), out.toString)
    // the all-b day diverges hard; category a contributes its ref-side term
    val d4 = out("2024-01-04")
    assert(d4._1 == 3L && d4._2 > 0.2, out.toString)
  }


  test("mutualInformation: independence scores 0, determinism scores min-entropy, normalized hits 1") {
    import spark.implicits._
    // perfectly independent 2x2 grid
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val i = DataQuality.mutualInformation(indep, "a", "b").collect().head
    assert(i.getLong(0) == 4L && i.getDouble(1) == 0.0 && i.getDouble(4) == 0.0, i.toString)
    // b determined by a: MI = H(B) = H(A) = ln 2, normalized = 1
    val det = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")).toDF("a", "b")
    val d = DataQuality.mutualInformation(det, "a", "b").collect().head
    assert(d.getDouble(1) == 0.693147 && d.getDouble(2) == 0.693147, d.toString)
    assert(d.getDouble(4) == 1.0, d.toString)
    // single-valued column: zero entropy, MI 0, normalized NULL
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val c = DataQuality.mutualInformation(const, "a", "b").collect().head
    assert(c.getDouble(1) == 0.0 && c.getDouble(2) == 0.0 && c.isNullAt(4), c.toString)
  }


  test("theilDecompose: pure between-group inequality, perfect equality at 0, additivity") {
    import spark.implicits._
    // A = {1,1}, B = {3,3}: within-group shares are uniform -> T_W = 0,
    // T = T_B = 0.25 ln 0.5 + 0.75 ln 1.5 = 0.130812
    val pure = Seq(("A", 1L), ("A", 1L), ("B", 3L), ("B", 3L)).toDF("g", "v")
    val r = DataQuality.theilDecompose(pure, "g", "v").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.130812 && r.getDouble(3) == 0.130812, r.toString)
    assert(r.getDouble(4) == 0.0, r.toString)
    // perfect equality: every component exactly 0
    val eq = Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L)).toDF("g", "v")
    val e = DataQuality.theilDecompose(eq, "g", "v").collect().head
    assert(e.getDouble(2) == 0.0 && e.getDouble(3) == 0.0 && e.getDouble(4) == 0.0, e.toString)
    // mixed case: additivity holds on the term grid; zero values drop
    val mix = Seq(("A", 1L), ("A", 9L), ("B", 5L), ("B", 5L), ("B", 0L)).toDF("g", "v")
    val m = DataQuality.theilDecompose(mix, "g", "v").collect().head
    assert(m.getLong(0) == 4L, m.toString) // the zero row dropped
    assert(math.abs(m.getDouble(2) - (m.getDouble(3) + m.getDouble(4))) < 2e-6, m.toString)
    assert(m.getDouble(4) > 0.0, m.toString)
  }


}
