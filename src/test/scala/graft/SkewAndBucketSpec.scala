package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

class SkewAndBucketSpec extends SparkSpec {

  test("salted aggregation == plain aggregation (hot-key safe)") {
    import spark.implicits._
    // hot key: "h" carries 10k rows, others 10
    val df = ((1 to 10000).map(i => ("h", i.toLong)) ++ (1 to 10).map(i => (s"k$i", i.toLong)))
      .toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Skew
      .saltedAgg(
        df,
        Seq("k"),
        salts = 16,
        partial = Seq(sum($"v").as("ps"), count(lit(1)).as("pn")),
        merge = Seq(sum($"ps").as("s"), sum($"pn").as("n")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("salted join == plain join on a skewed fact") {
    import spark.implicits._
    val fact = ((1 to 5000).map(_ => 1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val dim = (1L to 50L).map(k => (k, s"dim$k")).toDF("key", "attr")

    val plain  = fact.join(dim, Seq("key")).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8)
      .select("key", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 5000 + 49)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val t  = Tables(spark, SharedSpark.sf0001)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = spark
      .table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not shuffle the fact side:\n$plan")
    // and it still computes the right thing
    val expect = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == expect)
  }

  test("LSH hot band: identical-doc flood — DF cap bounds the fan-out, plan stays an equi-join") {
    import graft.operators.Dedup
    import spark.implicits._
    // pathological fixture: 10% of the corpus is ONE identical document —
    // every band of every hot doc lands on the same (band, bucket) key, the
    // worst case for the candidate self-join. The blowup is OUTPUT-side
    // (m docs in one bucket → m²/2 candidate rows from one join key), which
    // input-size-based AQE skew splitting cannot see — the layered defense
    // is exact-dedup first, then the maxBucketDF boilerplate cap, then AQE
    // for big-but-legitimate input skew (see Dedup.lshCandidatePlan).
    val hotText = (1 to 40).map(j => s"dup$j").mkString(" ")
    val nHot    = 200
    val docs = ((0 until nHot).map(i => (i.toLong, hotText)) ++
      (nHot until 2000).map(i => (i.toLong, (1 to 12).map(j => s"w${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
      .repartition(8, col("doc_id"))
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the plan under test is the one a
      // 100 TB corpus would run (tiny test sides would otherwise broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text").cache()
      // UNCAPPED: the flood's m²/2 true pairs all materialize as candidates
      val (b1, uncapped) = Dedup.lshCandidatePlan(sigs, k = 128, bands = 4)
      try {
        val got = uncapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val hotPairs = (for (a <- 0L until nHot; b <- (a + 1) until nHot) yield (a, b)).toSet
        assert(hotPairs.subsetOf(got), "identical docs must all be candidates when uncapped")
        assert(got.forall { case (a, b) => a < nHot || b < nHot }, "no unique-unique candidates")
        val plan = uncapped.queryExecution.executedPlan.toString
        assert(
          !plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
          s"candidate generation must stay a (skew-splittable) shuffled equi-join:\n$plan")
        assert(
          plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"expected a shuffle join under forced-no-broadcast:\n$plan")
      } finally b1.unpersist(false)
      // CAPPED at 64 << 200: the hot buckets drop wholesale BEFORE the
      // self-join — candidate fan-out collapses from m²/2 ≈ 19 900 to the
      // unique docs' (empty) bucket collisions. The cap set is broadcast
      // as a LeftAnti (only the hot keys travel, never the keep-set).
      val (b2, capped) = Dedup.lshCandidatePlan(sigs, k = 128, bands = 4, maxBucketDF = 64)
      try {
        val plan = capped.queryExecution.executedPlan.toString
        assert(plan.contains("LeftAnti"), s"cap must be an anti-join against the hot set:\n$plan")
        assert(capped.count() == 0, "flood buckets dropped => bounded (here: zero) candidates")
      } finally { b2.unpersist(false); sigs.unpersist(false) }
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("SimHash hot band: identical-doc flood — DF cap bounds the chunk join fan-out") {
    import graft.operators.Dedup
    import spark.implicits._
    // same pathological shape as the LSH flood above, aimed at the 16-bit
    // chunk banding: identical docs share ALL FOUR (pos, chunk) keys, so
    // every hot doc pair materializes 4× from the self-join before the
    // distinct — the worst case for simhashDupPairPlan's candidate join.
    val hotText = (1 to 40).map(j => s"dup$j").mkString(" ")
    val nHot    = 200
    val docs = ((0 until nHot).map(i => (i.toLong, hotText)) ++
      (nHot until 2000).map(i => (i.toLong, (1 to 12).map(j => s"w${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
      .repartition(8, col("doc_id"))
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sigs = Dedup.simhash(docs, "doc_id", "text").cache()
      // UNCAPPED: the flood's m²/2 dist-0 pairs all surface
      val (c1, uncapped) = Dedup.simhashDupPairPlan(sigs, maxDist = 3)
      try {
        val got = uncapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val hotPairs = (for (a <- 0L until nHot; b <- (a + 1) until nHot) yield (a, b)).toSet
        assert(hotPairs.subsetOf(got), "identical docs must all pair when uncapped")
        val plan = uncapped.queryExecution.executedPlan.toString
        assert(
          !plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
          s"banding must stay a (skew-splittable) shuffled equi-join:\n$plan")
      } finally c1.unpersist(false)
      // CAPPED at 64 << 200: all four flood buckets drop BEFORE the join;
      // the hot set travels as a broadcast LeftAnti, never the keep-set.
      // Unique docs' random 16-bit chunks may still collide pairwise, but
      // any survivor must involve no two flood docs and pass hamming<=3.
      val (c2, capped) = Dedup.simhashDupPairPlan(sigs, maxDist = 3, maxBucketDF = 64)
      try {
        val plan = capped.queryExecution.executedPlan.toString
        assert(plan.contains("LeftAnti"), s"cap must be an anti-join against the hot set:\n$plan")
        val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(
          !got.exists { case (a, b) => a < nHot && b < nHot },
          "flood buckets dropped => no hot-hot candidate survives the cap")
      } finally { c2.unpersist(false); sigs.unpersist(false) }
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("exactSubstrSpans flood: one gram in every doc — linear output, no pair join") {
    import spark.implicits._
    // the degenerate worst case for anything occurrence-PAIR-shaped: the
    // same 12-token passage in 5000 docs (12.5M occurrence pairs). The
    // covered-position design never pairs occurrences — the hot gram is
    // one aggregate row and a semi-join key — so output is exactly one
    // full-width span per doc and the plan stays equi-join only.
    val hotText = (1 to 12).map(j => s"boiler$j").mkString(" ")
    val n = 5000
    val docs = (0 until n).map(i => (i.toLong, hotText)).toDF("doc_id", "text")
      .repartition(8, col("doc_id"))
    val out = graft.operators.Corpus.exactSubstrSpans(docs, "doc_id", "text", minLen = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"flood must not degrade to a pair join:\n$plan")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == n, s"one merged span per doc, got ${rows.length}")
    assert(rows.forall { case (_, s, e) => s == 1L && e == 12L },
      "every doc fully covered by the repeated passage")
  }
}
