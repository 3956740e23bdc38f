package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.sources.Tables

/** Sketch aggregates: estimates must land inside a tight error envelope of
  * the exact answers, and the daily-sketch union must agree with the
  * single-pass sketch (mergeability). */
class SketchSpec extends SparkSpec {

  private lazy val t = Tables(spark, SharedSpark.sf001)

  test("HLL distinct estimates are within 5% of exact") {
    val exact = t.events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // Spark's built-in HLL++ rides along here for the envelope check only —
    // it is intentionally NOT part of the distinctCounts operator surface
    // (no exact regime, no cross-engine replay, so it can't be oracled)
    val hllppMap = t.events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("hllpp"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val est = Sketches.distinctCounts(t.events, "event_type", "user_id").collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val k      = r.getString(0)
      val hll    = r.getLong(1).toDouble
      val hllpp  = hllppMap(k).toDouble
      val truth  = exact(k).toDouble
      assert(math.abs(hll - truth) / truth <= 0.05, s"$k hll=$hll exact=$truth")
      assert(math.abs(hllpp - truth) / truth <= 0.05, s"$k hllpp=$hllpp exact=$truth")
    }
  }

  test("portable HLL: within 5% of exact, partitioning-invariant, duplicate-insensitive") {
    val exact = t.events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches
        .portableDistinct(df, "event_type", "user_id")
        .collect()
        .map(r => r.getString(0) -> r.getDouble(1))
        .toMap
    val est = run(t.events)
    assert(est.nonEmpty)
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) <= 0.05 * exact(k), s"$k: est $e vs exact ${exact(k)}")
    }
    // register max is order- and partitioning-free: the merge path must
    // produce the SAME double at any parallelism (the cross-engine
    // auditability contract — not just "close")
    assert(run(t.events.repartition(17, col("user_id"))) == est)
    // duplicate rows cannot move a register
    assert(run(t.events.union(t.events)) == est)
  }

  test("portable HLL union-of-daily-cube == single global pass, bit for bit") {
    val global = Sketches
      .portableDistinct(t.events, "event_type", "user_id")
      .select(col("event_type"), col("hll_portable").as("distinct_est"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    val unioned = Sketches
      .portableUnion(
        Sketches.portableDailyCube(t.events, "ts", "event_type", "user_id"),
        "event_type")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(unioned == global, "register max is order-free: union must reproduce the global estimate exactly")
  }

  test("daily sketch union equals the single-pass sketch estimate") {
    val single = Sketches
      .distinctCounts(t.events, "event_type", "user_id")
      .select(col("event_type"), col("hll_distinct"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val unioned = Sketches
      .unionSketches(Sketches.dailySketches(t.events, "ts", "event_type", "user_id"), "event_type")
      .collect()
    assert(unioned.nonEmpty)
    unioned.foreach { r =>
      // same sketch family + lossless union: estimates agree exactly
      assert(r.getLong(1) == single(r.getString(0)), s"${r.getString(0)}")
    }
  }

  test("portable Bloom: zero false negatives, partitioning/duplicate-invariant, deterministic FPs") {
    import spark.implicits._
    val members = (0L until 500L).filter(_ % 3 == 0).toDF("k")
    val probes  = (0L until 2000L).toDF("k")
    def run(m: org.apache.spark.sql.DataFrame) =
      Sketches.bloomMembership(m, "k", probes, "k", logBits = 10, nHashes = 4)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = run(members)
    // no false negatives — the Bloom contract's hard half
    (0L until 500L).filter(_ % 3 == 0).foreach(k => assert(got(k), s"member $k missing"))
    // tiny filter (1024 bits, 167 members) MUST show false positives, and
    // they are a deterministic pure function of the key set
    val fps = got.count { case (k, hit) => hit && !(k < 500 && k % 3 == 0) }
    assert(fps > 0, "fixture sized to exhibit false positives")
    assert(run(members.repartition(13)) == got, "filter build is order/partitioning-free")
    assert(run(members.union(members)) == got, "duplicate inserts cannot move a bit")
    // h2 is forced odd: the j-progression must vary the bit index
    val bs = Sketches.bloomBitPositions(42L, 10, 4)
    assert(bs.distinct.length > 1)
  }

  test("count-min heavy hitters: estimates within eps*N of exact, no misses") {
    val exact = t.events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val n   = exact.values.sum
    val eps = 0.001
    val got = Sketches
      .heavyHitters(
        t.events,
        "event_type",
        t.events.select(col("event_type")).distinct(),
        minCount = 100,
        eps = eps)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val trueHeavy = exact.filter(_._2 >= 100 + (eps * n).toLong) // can't slip under via over-count
    trueHeavy.keys.foreach(k => assert(got.contains(k), s"missed heavy hitter $k"))
    got.foreach { case (k, est) =>
      val ex = exact(k)
      assert(est >= ex && est <= ex + (eps * n).toLong + 1, s"$k est=$est exact=$ex")
    }
  }

  test("portable count-min: est >= exact always, exact at wide width, partitioning-invariant") {
    import spark.implicits._
    val keys = (1L to 200L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val df   = keys.toDF("k")
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // wide matrix: 200 keys in 2^16 buckets x 4 rows -- collision-free in
    // practice; every estimate still must be >= exact by construction
    val wide = Sketches.cmsBuild(df, "k", logW = 16, depth = 4)
    exact.foreach { case (k, n) =>
      val e = Sketches.cmsEstimate(wide, k, 16, 4)
      assert(e == n, s"key $k est=$e exact=$n (no collision expected at 2^16)")
    }
    // narrow matrix forces collisions: estimates may inflate, never deflate
    val narrow = Sketches.cmsBuild(df, "k", logW = 4, depth = 4)
    exact.foreach { case (k, n) =>
      assert(Sketches.cmsEstimate(narrow, k, 4, 4) >= n, s"undercount at key $k")
    }
    // linear merge: the matrix from an 8-partition build is bit-identical
    // to the 1-partition build (entrywise addition is order-free)
    val repart = Sketches.cmsBuild(df.repartition(8), "k", logW = 10, depth = 4)
    val single = Sketches.cmsBuild(df.coalesce(1), "k", logW = 10, depth = 4)
    assert(repart.sameElements(single))
    // probe path carries probe columns through
    val probes = df.groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
    val out = Sketches.cmsCounts(df, "k", probes, "k", logW = 16, depth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (k, n, e) => assert(e == n, s"key $k est=$e exact=$n") }
  }

  test("approx quantiles are within 2% rank error of exact") {
    val qs = Seq(0.5, 0.95, 0.99)
    val approx = Sketches
      .approxQuantiles(t.orders, "o_orderstatus", col("o_totalprice"), qs)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
      .toMap
    approx.foreach { case (status, est) =>
      val prices = t.orders
        .filter(col("o_orderstatus") === status)
        .select(col("o_totalprice"))
        .collect()
        .map(_.getDouble(0))
        .sorted
      qs.zip(est).foreach { case (q, v) =>
        // value must sit within +-2% rank of the requested quantile
        val lo = prices(math.max(0, (prices.length * (q - 0.02)).toInt))
        val hi = prices(math.min(prices.length - 1, (prices.length * (q + 0.02)).toInt))
        assert(v >= lo && v <= hi, s"$status q$q=$v not in [$lo,$hi]")
      }
    }
  }

  test("daily sketches survive a catalog round-trip: union from storage == union from memory") {
    // the production shape: write the mergeable per-day cube once, answer
    // distinct-over-any-range later WITHOUT re-scanning raw events
    val events = graft.sources.Tables(spark, SharedSpark.sf0001).events
    val cube   = graft.operators.Sketches.dailySketches(events, "ts", "event_type", "user_id")
    val cat = new graft.sources.Catalog(
      spark,
      java.nio.file.Files.createTempDirectory("graft_sketch_").toString)
    cat.putTable("daily_sketches", cube)

    def totals(c: org.apache.spark.sql.DataFrame) =
      graft.operators.Sketches.unionSketches(c, "event_type")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromMemory  = totals(cube)
    val fromStorage = totals(cat.readTable("daily_sketches"))
    assert(fromStorage == fromMemory, "parquet round-trip must not perturb sketch binaries")
    assert(fromMemory.nonEmpty)
  }

  test("KMV distinct: exact below k, inside the envelope above, partitioning/duplicate-invariant") {
    val exact = t.events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    def run(df: org.apache.spark.sql.DataFrame, k: Int) =
      Sketches.kmvDistinct(df, "event_type", "user_id", k)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // k above every group's cardinality → the sample is the set: EXACT
    val big = run(t.events, k = 4096)
    exact.foreach { case (g, n) => assert(big(g) == n.toDouble, s"$g exact-regime: ${big(g)} vs $n") }
    // k below cardinality → approximate; KMV standard error is ~1/sqrt(k-2)
    val approx = run(t.events, k = 128)
    approx.foreach { case (g, e) =>
      val truth = exact(g).toDouble
      assert(math.abs(e - truth) <= 4.0 / math.sqrt(126.0) * truth, s"$g: est $e vs exact $truth")
    }
    // the k-min set is an order statistic: any partitioning/duplication
    // must reproduce the SAME double (cross-engine auditability contract)
    assert(run(t.events.repartition(17, col("user_id")), 128) == approx)
    assert(run(t.events.union(t.events), 128) == approx)
  }

  test("KMV set ops: exact when both samples exhaustive, enveloped when sampled, symmetric-consistent") {
    import spark.implicits._
    // planted overlap: A = 1..300, B = 201..500 → |A∩B| = 100, |A∪B| = 500
    val df = (1 to 300).map(i => ("A", i.toLong)).union((201 to 500).map(i => ("B", i.toLong)))
      .toDF("grp", "uid")
    val exactOps = Sketches.kmvSetOps(df, "grp", "uid", k = 1024).collect().head
    assert(exactOps.getDouble(2) == 100.0, s"exhaustive-sample intersection must be exact: $exactOps")
    assert(exactOps.getDouble(3) == 500.0, s"exhaustive-sample union must be exact: $exactOps")
    // sampled regime: estimates land inside ~4/sqrt(k) of truth
    val est = Sketches.kmvSetOps(df, "grp", "uid", k = 128).collect().head
    assert(math.abs(est.getDouble(2) - 100.0) <= 4.0 / math.sqrt(126.0) * 500.0, s"inter: $est")
    assert(math.abs(est.getDouble(3) - 500.0) <= 4.0 / math.sqrt(126.0) * 500.0, s"union: $est")
    // every event-type pair present, estimates deterministic under reshuffle
    val pairs = Sketches.kmvSetOps(t.events, "event_type", "user_id", k = 128)
    val nTypes = t.events.select("event_type").distinct().count()
    val rows = pairs.collect()
    assert(rows.length == nTypes * (nTypes - 1) / 2, s"expected full pair grid, got ${rows.length}")
    val again = Sketches.kmvSetOps(t.events.repartition(13), "event_type", "user_id", k = 128).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("AMS F2: single-key fixture is hash-free exact, rel_err self-consistent, partitioning-invariant") {
    import spark.implicits._
    // every sign-hash sees one key: S_j = ±N for all j, so every estimate
    // is EXACTLY N^2 whatever the hashes — the closed form that pins the
    // medians-of-means plumbing end to end
    val one = Seq.fill(37)(42L).toDF("k")
    val r1 = Sketches.amsF2(one, "k").collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getDouble(3), r1.getDouble(4))
      == ((37L, 1L, 37L * 37L, 1369.0, 0.0)), r1.toString)
    // skewed fixture: f2_exact is the true moment; rel_err recomputes from
    // the emitted (already-rounded) estimate; repartition changes nothing
    val skew = (Seq.fill(100)(1L) ++ Seq.fill(10)(2L) ++ (3L to 52L)).toDF("k")
    val r = Sketches.amsF2(skew, "k").collect().head
    assert(r.getLong(2) == 100L * 100 + 10 * 10 + 50, r.toString)
    val recomputed = math.abs(r.getDouble(3) - r.getLong(2).toDouble) / r.getLong(2).toDouble
    assert(math.abs(r.getDouble(4) - BigDecimal(recomputed)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12, r.toString)
    val again = Sketches.amsF2(skew.repartition(13), "k").collect().head
    assert(r.toString == again.toString)
  }

  test("cmsHeavyChange: wide sketch recovers exact deltas, planted mover ranks first, partitioning-invariant") {
    import spark.implicits._
    // 50 keys with balanced halves + key 99 appearing only in the second
    // half 40 times: at logW=10 (1024 buckets vs 51 keys) collisions are
    // absent, so est == exact per half and the mover is recovered exactly
    val base = (1L to 50L).flatMap(k => Seq((k, 1000L), (k, 9000L)))
    val spike = Seq.fill(40)((99L, 9000L))
    val df = (base ++ spike).toDF("k", "us")
      .select(col("k"), expr("timestamp_micros(us)").as("ts"))
    val r = Sketches.cmsHeavyChange(df, "k", "ts", logW = 10, depth = 4, topK = 5).collect()
    val top = r.head
    assert((top.getLong(0), top.getLong(3), top.getLong(4)) == ((99L, 40L, 40L)), top.toString)
    // balanced keys: delta exactly 0 (est equals exact both halves)
    r.tail.foreach(x => assert(x.getLong(3) == 0L && x.getLong(4) == 0L, x.toString))
    val again = Sketches.cmsHeavyChange(df.repartition(7), "k", "ts", logW = 10, depth = 4, topK = 5)
      .collect()
    assert(r.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("AMS join size: identical single-key tables are hash-free exact, disjoint keys estimate around 0, exact audit right") {
    import spark.implicits._
    // one shared key on both sides: S^A_j = ±17, S^B_j = ±5 with the SAME
    // sign (same key, same hashes) -> every product is exactly 85
    val a = Seq.fill(17)(9L).toDF("k")
    val b = Seq.fill(5)(9L).toDF("k")
    val r = Sketches.amsJoinSize(a, "k", b, "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5), r.getDouble(6)) == ((17L, 5L, 1L, 1L, 85L, 85.0, 0.0)), r.toString)
    // disjoint key sets: exact 0, rel_err NULL, estimate still emitted
    val d = Sketches.amsJoinSize(
      Seq(1L, 2L, 3L).toDF("k"), "k", Seq(10L, 11L).toDF("k"), "k").collect().head
    assert(d.getLong(4) == 0L && d.isNullAt(6), d.toString)
    // overlapping fixture: the exact audit is the true SUM f_a*f_b
    val x = (Seq.fill(4)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L)).toDF("k")
    val y = (Seq.fill(3)(1L) ++ Seq.fill(5)(2L) ++ Seq(99L)).toDF("k")
    val o = Sketches.amsJoinSize(x, "k", y, "k").collect().head
    assert(o.getLong(4) == 4L * 3 + 2 * 5, o.toString)
  }

  test("native sketch probes: generated code compiles (fallback off), matches interpreted eval, no UDF in plan") {
    import spark.implicits._
    val data   = (Seq.fill(40)(7L) ++ Seq.fill(3)(11L) ++ (100L to 140L)).toDF("k")
    val probes = Seq(7L, 11L, 100L, 999L).toDF("k")
    // fallback=false turns a codegen compile error into a hard failure
    // instead of a silent interpreted-path rescue — this test is what
    // proves the generated Java in SketchExpressions actually compiles
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cms = Sketches.cmsCounts(data, "k", probes, "k", logW = 8, depth = 4)
      assert(!cms.queryExecution.executedPlan.toString.contains("UDF"))
      val cmsMap = cms.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cmsMap(7L) >= 40L && cmsMap(11L) >= 3L, cmsMap.toString) // est >= exact always
      // interpreted eval (the build-side helpers) must agree bit for bit
      val counters = Sketches.cmsBuild(data, "k", logW = 8, depth = 4)
      cmsMap.foreach { case (k, est) =>
        assert(est == Sketches.cmsEstimate(counters, k, 8, 4), s"codegen/interpreted drift at $k")
      }

      val bloom = Sketches.bloomMembership(data, "k", probes, "k", logBits = 12, nHashes = 4)
      assert(!bloom.queryExecution.executedPlan.toString.contains("UDF"))
      val hits = bloom.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(hits(7L) && hits(11L) && hits(100L), s"no false negatives ever: $hits")

      val hh = Sketches.heavyHitters(data, "k", probes, minCount = 10L)
      assert(!hh.queryExecution.executedPlan.toString.contains("UDF"))
      val hhKeys = hh.collect().map(_.getString(0)).toSet
      assert(hhKeys.contains("7") && !hhKeys.contains("999"), hhKeys.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
