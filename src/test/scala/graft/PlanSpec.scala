package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.{col, sum}

/** Physical-plan contracts: the scale claims in the query modules are
  * enforced here, not just commented. If Catalyst stops broadcasting a dim,
  * stops pushing a filter into the parquet scan, or materializes a global
  * sort for a top-k, these specs fail.
  */
class PlanSpec extends SparkSpec {
  private val dir = SharedSpark.sf001

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }
  private def formatted(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q1: filter pushed to parquet scan + two-phase (partial) aggregation") {
    val f = formatted("q1_pricing_summary")
    assert(f.contains("PushedFilters"), "scan should push filters")
    assert(
      f.contains("LessThanOrEqual(l_shipdate") || f.contains("LessThanOrEqual(`l_shipdate`"),
      s"shipdate predicate should reach the scan:\n$f")
    assert("HashAggregate".r.findAllIn(f).length >= 2, "partial + final aggregate expected")
  }

  test("q1: scan reads only referenced columns (pruning)") {
    val f = formatted("q1_pricing_summary")
    val read = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"), s"unused columns must be pruned: $read")
  }

  test("q3/q5: dimension joins are broadcast, not shuffled") {
    assert(planOf("q3_topk_revenue").contains("BroadcastHashJoin"))
    val q5 = planOf("q5_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(q5).length >= 3, "customer/supplier/nation should broadcast")
  }

  test("top-k queries use TakeOrderedAndProject, never a global sort") {
    val topk = planOf("sort_topk_lineitem")
    assert(topk.contains("TakeOrderedAndProject"), s"expected heap top-k:\n$topk")
    val q3 = planOf("q3_topk_revenue")
    assert(q3.contains("TakeOrderedAndProject"), "sorted limit should be a heap merge")
  }

  test("semi/anti joins plan as semi/anti, preserving no-duplication semantics") {
    assert(planOf("join_semi_active_customers").contains("LeftSemi"))
    assert(planOf("join_anti_idle_customers").contains("LeftAnti"))
  }

  test("word count is partially aggregated map-side (no raw pair shuffle)") {
    val f = planOf("wc_wordcount")
    assert("HashAggregate".r.findAllIn(f).length >= 2, "expected partial+final count")
  }

  test("kv inversion is a narrow projection — zero exchanges") {
    val f = planOf("rev_kv_invert")
    assert(!f.contains("Exchange"), s"projection must not shuffle:\n$f")
  }

  test("grep filter is evaluated in the scan stage (single stage, no shuffle)") {
    val f = planOf("grep_documents")
    assert(!f.contains("Exchange"), "filter+project must stay narrow")
  }

  test("hash sample filter reaches the scan stage (portable sampling pushes down)") {
    val f = planOf("sample_hash_orders")
    assert(!f.contains("Exchange"), "sampling is a narrow filter")
  }

  test("event time-range filter reaches the parquet scan despite ts conversion") {
    val f = formatted("events_day_window")
    val pushed = f.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("ts"), s"raw nanos range must be pushed:\n$pushed")
    assert(pushed.contains("GreaterThanOrEqual") || pushed.contains("LessThan"), pushed)
  }

  test("vec_dot expression participates in codegen (no HOF fallback in ANN)") {
    val f = planOf("ann_brute_topk")
    assert(f.contains("vec_dot"), "custom expression should appear in the plan")
    assert(!f.contains("aggregate(zip_with"), "HOF fold must be gone from the hot path")
  }

  test("grouping sets plan as ONE Expand + aggregate, not a union of scans") {
    val f = planOf("grouping_sets_flag_status")
    assert("Expand".r.findAllIn(f).length == 1, s"single Expand expected:\n$f")
    assert(!f.contains("Union"), "grouping sets must not union separate scans")
  }

  test("range join keeps an equi-key hash join (no cross product)") {
    val f = planOf("join_range_first_day")
    assert(f.contains("BroadcastHashJoin") || f.contains("SortMergeJoin"), s"equi join expected:\n$f")
    assert(!f.contains("CartesianProduct") && !f.contains("BroadcastNestedLoopJoin"), "range predicate must stay residual")
  }

  test("sketch distinct counts partial-aggregate map-side (mergeable sketches)") {
    val f = planOf("sketch_distinct_users")
    assert("ObjectHashAggregate".r.findAllIn(f).length >= 2 || "HashAggregate".r.findAllIn(f).length >= 2,
      s"partial+final sketch agg expected:\n$f")
  }

  test("corpus-clean pipeline reads documents once per join side with pruned schema") {
    val f = formatted("pipeline_corpus_clean")
    val read = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && read.contains("text"))
  }

  test("ANN top-k ranks with bounded heaps: no sort of the scored candidate set") {
    for (q <- Seq("ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_int8")) {
      val f = planOf(q)
      assert(f.contains("TopKPerGroup"), s"$q should select via the bounded-heap operator:\n$f")
      // the only Sort allowed is the one under the rank-assigning window,
      // which runs ABOVE the heap operator on <= k rows per query — no Sort
      // may appear below TopKPerGroupPartialExec (i.e. over the full scored set)
      val belowHeap = f.linesIterator.dropWhile(!_.contains("TopKPerGroupPartial")).mkString("\n")
      assert(!belowHeap.contains("Sort"), s"$q sorts the full scored set:\n$f")
    }
  }

  test("lshTopK multi-probe expansion is native (no per-row ScalaUDF)") {
    val f = planOf("ann_lsh_topk")
    assert(!f.contains("UDF"), s"probe expansion must not be a ScalaUDF:\n$f")
  }

  test("decontam eval-gram side is broadcast (never a corpus-sized shuffle)") {
    val p = planOf("decontam_overlap")
    assert(p.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$p")
    assert(p.contains("LeftSemi"), s"overlap join must be a semi-join:\n$p")
  }

  test("lineDedup: hot boilerplate set broadcasts as anti-join; no corpus-sized extra exchange") {
    // the public lineDedup localCheckpoints (hiding the join behind a
    // checkpoint scan) — assert on the un-materialized plan variant, the
    // same frame the wrapper executes
    import org.apache.spark.sql.functions.{concat, length, lit, md5}
    val messy = graft.sources.Tables(spark, dir).documents.select(
      col("doc_id"),
      concat(
        lit("ACCEPT COOKIES TO CONTINUE\n"),
        col("text"),
        lit("\nnav: "),
        col("source"),
        lit("\n(c) example.com all rights reserved")).as("text"))
    val (hot, out) =
      graft.operators.Corpus.lineDedupPlan(messy, "doc_id", "text", minDf = 10, hotBroadcastCap = 4000000L)
    try {
      val p = out
        .select(col("doc_id"), length(col("text")).as("n_clean"), md5(col("text")).as("fp"))
        .queryExecution
        .executedPlan
        .toString
      assert(p.contains("BroadcastHashJoin"), s"hot line set must broadcast:\n$p")
      assert(p.contains("LeftAnti"), s"removal must be an anti-join:\n$p")
      // exchanges: line-hash DF aggregation + doc reassembly (+ the spread
      // gate's repartition on the under-split test fixture); the keep-set
      // itself must never be the build side of anything
      assert(!p.contains("BroadcastNestedLoopJoin"), s"no cross-shaped fallback:\n$p")
    } finally hot.unpersist(false)
  }

  test("decontam bloom path: native probe (no UDF), shuffle semi-join verify") {
    val p = planOf("decontam_bloom")
    assert(p.contains("bloom_might_contain"), s"bloom probe must be the native expression:\n$p")
    assert(!p.contains("UDF"), s"bloom probe must not be a ScalaUDF:\n$p")
    assert(p.contains("ShuffledHashJoin") && p.contains("LeftSemi"),
      s"verify must be the beyond-broadcast shuffle semi-join shape:\n$p")
  }

  test("ngram spans aggregate partially map-side (shuffle carries partial counts)") {
    val f = formatted("dedup_ngram_spans")
    assert("HashAggregate".r.findAllIn(f).length >= 2, s"partial + final aggregate expected:\n$f")
    assert(!f.contains("UDF"), s"gram generation must stay codegen'd (no UDF):\n$f")
  }

  test("repetition signals: the up-front doc_id repartition is the ONLY shuffle") {
    val f = formatted("text_repetition")
    assert("HashAggregate".r.findAllIn(f).length >= 2, s"partial + final aggregate expected:\n$f")
    assert(!f.contains("CartesianProduct") && !f.contains("BroadcastNestedLoop"), f)
    // the doc_id-keyed repartition per scan branch satisfies every downstream
    // clustering (the (doc,tok) agg, the (doc) agg, the ratios⋈top join), so
    // Catalyst must never insert a shuffle of its own: every Exchange in the
    // plan is one of our explicit REPARTITION_BY_NUMs (or a BroadcastExchange,
    // which moves the small aggregated side, not corpus rows)
    assert(!f.contains("ENSURE_REQUIREMENTS"),
      s"optimizer inserted a shuffle beyond the explicit repartitions:\n$f")
  }

  test("quality_classifier_score is a narrow projection — zero exchanges, one scan") {
    val p = planOf("quality_classifier_score")
    assert(!p.contains("Exchange"), s"classifier inference must ride the scan:\n$p")
    assert("FileScan".r.findAllIn(p).length == 1, s"one corpus scan:\n$p")
  }

  test("pii scrub is a narrow projection — zero exchanges") {
    val p = planOf("pii_scrub")
    assert(!p.contains("Exchange"), s"scrub must not shuffle:\n$p")
  }

  test("pack_sequences: one shard-keyed shuffle feeding the running-sum window") {
    val f = formatted("pack_sequences")
    assert(f.contains("Window"), s"packing must be a window prefix-sum:\n$f")
    // exactly the shard-partitioning exchange; a second shuffle means the
    // window did not reuse it
    assert("\\bExchange\\b".r.findAllIn(f).length / 2 <= 1,
      s"expected only the shard-key exchange:\n$f")
  }

  test("oov_rate: vocab side broadcast, corpus side partial-aggregated") {
    val f = formatted("oov_rate")
    assert(f.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$f")
    assert("HashAggregate".r.findAllIn(f).length >= 2, s"partial + final agg expected:\n$f")
  }

  test("quota_per_source ranks with bounded heaps, not a window sort") {
    val p = planOf("quota_per_source")
    assert(p.contains("TopKPerGroup"), s"expected the custom bounded-heap operator:\n$p")
    assert(!p.contains("Window") && !p.contains("RunningWindowFunction"),
      s"per-source ranking must not run a window sort:\n$p")
  }

  test("keywords_topk: partial heaps, df via aggregate+join — no window anywhere") {
    val p = planOf("keywords_topk")
    assert(p.contains("TopKPerGroupPartial"), s"map-side heaps must bound the rank shuffle:\n$p")
    // df must NOT be a token-partitioned window (a stopword's window
    // partition is corpus-document-sized at web scale and AQE can't split
    // it); the aggregate+join-back shape is map-side combined and
    // AQE-skew-splittable. No window operator of any kind in the plan.
    assert(!p.contains("Window"), s"token-keyed window skew — df must be aggregate+join:\n$p")
    // exchanges: tokenize-spreading repartition (reused by both tf
    // branches), token-keyed df aggregate + join shuffles, doc-keyed rank
    // shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 4, s"unexpected extra shuffles:\n$p")
  }

  test("vocab_topk: ranking window only sees a bounded TakeOrderedAndProject cut") {
    val p = planOf("vocab_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K must be heap-based (never a vocabulary-sized sort):\n$p")
    // the rank window exists but must sit ABOVE the K-row cut — a window
    // directly over the distinct-token aggregate would funnel the whole
    // vocabulary through one partition
    val win = p.indexOf("Window")
    val cut = p.indexOf("TakeOrderedAndProject")
    assert(win >= 0 && win < cut,
      s"rank window must consume the bounded top-K, not the full vocabulary:\n$p")
  }

  test("bm25 ranks with TakeOrderedAndProject; df/stats sides broadcast") {
    val p = planOf("bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be heap-based, not a global sort:\n$p")
    assert(p.contains("BroadcastExchange"), s"df/corpus-stats joins must broadcast:\n$p")
    // the term filter must prune the token stream before the tf shuffle
    assert(p.toLowerCase.contains("token") && p.contains("INSET") || p.contains(" IN ("),
      s"query-term IN filter missing from the plan:\n$p")
  }

  test("chunk_documents is a narrow transform — zero exchanges") {
    val p = planOf("chunk_documents")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert("FileScan".r.findAllIn(p).length == 1, s"one scan:\n$p")
  }

  test("funnel: stage IN filter reaches the scan, aggregation on one user shuffle") {
    val f = formatted("funnel_view_click_purchase")
    assert(f.contains("PushedFilters"), s"stage filter should reach the scan:\n$f")
    val p = planOf("funnel_view_click_purchase")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"one user-keyed shuffle (+AQE coalesce at most):\n$p")
  }

  test("corpus_shards: assignment is a zero-exchange narrow projection") {
    val p = planOf("corpus_shards")
    assert(!p.contains("Exchange"), s"shard assignment must not shuffle:\n$p")
    assert("FileScan".r.findAllIn(p).length == 1, s"one scan:\n$p")
  }

  test("tokenize/shingle family: well-split input is NOT reshuffled; under-split input is") {
    import org.apache.spark.sql.functions.col
    // Many-file fixture: 8 parquet files on an 8-core session. File-split
    // bin-packing (totalBytes/defaultParallelism bytes-per-core) gives one
    // scan partition per file, >= cores/2, so spreadSmallInput must pass
    // the scan through untouched — the 100 TB shape in miniature.
    val tmp = java.nio.file.Files.createTempDirectory("graft_manyfile_").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    docs.repartition(8).write.mode("overwrite").parquet(s"$tmp/many")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/one")

    val many = spark.read.parquet(s"$tmp/many")
    assume(many.rdd.getNumPartitions >= 4, "fixture must plan as >= cores/2 splits")
    val wellSplit = Seq(
      graft.operators.Corpus.tokenNgramHashes(many, "doc_id", "text", 3),
      graft.operators.Corpus.tokenNgrams(many, "doc_id", "text", 3),
      graft.operators.Dedup.shingleHashRows(many, "doc_id", "text"),
      graft.operators.Dedup.shingleRows(many, "doc_id", "text"))
    wellSplit.foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"well-split corpus must not reshuffle to tokenize:\n$p")
    }

    // Single-file fixture: 1 scan partition < cores/2 — the spread SHOULD
    // fire (dropping it serialized tokenize in round 8: text_entropy 1.89x).
    val one = spark.read.parquet(s"$tmp/one")
    assume(one.rdd.getNumPartitions < 4)
    val p1 = graft.operators.Corpus
      .tokenNgramHashes(one, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(p1.contains("Exchange"), s"under-split input must spread before exploding:\n$p1")
    // and correctness is unchanged either way
    val a = graft.operators.Corpus.tokenNgramHashes(many, "doc_id", "text", 3)
      .groupBy("doc_id").count().orderBy(col("doc_id")).collect().toSeq
    val b = graft.operators.Corpus.tokenNgramHashes(one, "doc_id", "text", 3)
      .groupBy("doc_id").count().orderBy(col("doc_id")).collect().toSeq
    assert(a == b)
  }

  test("spreadSmallInput guard: streaming and non-scan frames pass through unprobed") {
    import org.apache.spark.sql.functions.col
    // streaming frame: df.rdd would throw AnalysisException — the guard
    // must pass it through without touching the physical plan
    val tmpdir = java.nio.file.Files.createTempDirectory("graft_streamguard_").toString
    spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmpdir/docs")
    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$tmpdir/docs").schema)
      .parquet(s"$tmpdir/docs")
    val passed = graft.operators.Corpus.spreadSmallInput(streamIn, col("doc_id"))
    assert(passed.isStreaming, "streaming frame must survive the guard")
    assert(passed.queryExecution.logical eq streamIn.queryExecution.logical,
      "streaming frame must pass through IDENTICALLY, not be rebuilt")

    // aggregated frame (upstream exchange): probing would finalize and
    // eagerly execute the shuffle under AQE — the guard must skip it and
    // add no extra repartition (parallelism is already set by the shuffle)
    val agged = spark.read.parquet(s"$tmpdir/docs")
      .groupBy(col("doc_id")).agg(org.apache.spark.sql.functions.count(col("text")).as("n"))
    val out = graft.operators.Corpus.spreadSmallInput(agged, col("doc_id"))
    assert(out.queryExecution.logical eq agged.queryExecution.logical,
      "a frame with upstream exchanges must not be re-shuffled just to spread")
  }

  test("stratified sample is a scan-side filter — zero exchanges") {
    val p = planOf("sample_stratified")
    assert(!p.contains("Exchange"), s"per-stratum hash sampling must not shuffle:\n$p")
  }

  test("html extraction is a narrow projection — zero exchanges, one scan") {
    val p = planOf("text_html_extract")
    assert(!p.contains("Exchange"), s"extraction chain must stay scan-side:\n$p")
    assert("FileScan|BatchScan".r.findAllIn(p).length == 1, "single pass over documents")
  }

  test("fact-dim joins stay eligible for runtime bloom-filter injection") {
    // The 100 TB contract behind the q3/q5-family join shapes: when the
    // fact side is too big to broadcast (it shuffles) and the dim side
    // carries a selective non-key filter, Catalyst injects a bloom
    // semi-filter (might_contain over the join key) into the fact scan —
    // rows that can't join die at the scan, not at the shuffle. Local SFs
    // are below the size thresholds and broadcast instead, so this spec
    // recreates the at-scale conditions (thresholds to 0, broadcast off)
    // and pins that our join shape qualifies — a conf or shape regression
    // that would silently lose runtime filtering at scale fails here.
    val scanKey = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val oldScan = spark.conf.get(scanKey)
    try {
      spark.conf.set(scanKey, "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = graft.sources.Tables(spark, dir)
      val j = t.lineitem
        .join(
          t.orders.filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")))
      val p = j.queryExecution.optimizedPlan.toString
      assert(
        p.contains("might_contain"),
        s"selective dim filter should inject a runtime bloom filter into the fact scan:\n$p")
    } finally {
      spark.conf.set(scanKey, oldScan)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("score calibration windows over the bounded aggregate, never the corpus") {
    // ONE Window operator, and its input chain reaches a HashAggregate
    // before any file scan — i.e. the percent_rank arithmetic runs on the
    // (source, score) aggregate, not on corpus-sized per-source slices.
    val p = planOf("quality_score_calibrate")
    assert("Window".r.findAllIn(p).length >= 1)
    val lines = p.linesIterator.toSeq
    val wIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.indexWhere(l => l.contains("HashAggregate"), wIdx)
    val scanIdx = lines.indexWhere(l => l.contains("Scan parquet") || l.contains("FileScan"), wIdx)
    assert(wIdx >= 0 && aggIdx >= 0, s"expected Window over an aggregate:\n$p")
    assert(scanIdx < 0 || aggIdx < scanIdx, s"Window must sit over the aggregate, not a raw scan:\n$p")
  }

  test("q13 custdist pre-aggregates orders below the outer join") {
    // The scalable Q13 plan: orders collapse to one row per custkey BEFORE
    // the outer join (map-side partial + final agg), then the customer-sized
    // join feeds the tiny distribution aggregate. If Catalyst ever plans the
    // raw LEFT OUTER first (order-sized join input), the agg count drops.
    val f = formatted("sql_q13_custdist")
    assert("HashAggregate".r.findAllIn(f).length >= 4, s"expected pre-agg + distribution agg pairs:\n$f")
    assert(f.contains("SortMergeJoin") || f.contains("ShuffledHashJoin") || f.contains("BroadcastHashJoin"))
  }

  test("blocklist filter is a narrow projection — zero exchanges, one scan") {
    val p = planOf("corpus_blocklist_filter")
    assert(!p.contains("Exchange"), s"blocklist gate must ride the scan:\n$p")
    assert("FileScan".r.findAllIn(p).length == 1, s"one corpus scan:\n$p")
  }

  test("tfidf pairs: tiny df/norm sides broadcast; posting self-join is the only big exchange") {
    val p = planOf("tfidf_cosine_pairs")
    assert(p.contains("BroadcastHashJoin"), s"df cap side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"posting join must stay equi-keyed:\n$p")
  }

  test("naive bayes serve: model sides broadcast into one scoring pass") {
    val p = planOf("nb_lang_classify")
    assert(p.contains("BroadcastHashJoin"), s"V·C model join should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unkeyed pairing:\n$p")
  }

  test("hashed features: one scan, one map-side-combined aggregation exchange") {
    val p = planOf("text_hashed_features")
    assert("FileScan".r.findAllIn(p).length == 1, s"one corpus scan:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"partial + final aggregate expected:\n$p")
  }

  test("PQ ADC: LUT broadcasts into the code-table scoring join") {
    // The plan DOES contain bounded cross products — the nQ×(m·k) LUT
    // build is a deliberate tiny-model × tiny-model product — so the
    // assertion targets what must NOT degrade: the corpus-sized code
    // table joins the LUT via broadcast equi-join, never a nested loop
    // (the scoring join carries the (sub, code) keys).
    val p = planOf("ann_pq_adc")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1, s"LUT must broadcast-equi-join:\n$p")
  }

  test("round-13 rows keep their plan contracts: row-local scans, partial aggs, bounded top-k") {
    // encoding audit: one corpus scan, zero exchanges (row-local projection)
    val enc = planOf("text_encoding_audit")
    assert("FileScan".r.findAllIn(enc).length == 1, s"one scan:\n$enc")
    assert(!enc.contains("Exchange"), s"row-local projection must not shuffle:\n$enc")
    // skew audit: map-side-combined key count + bounded top-k, no global sort
    val skew = planOf("quality_skew_audit")
    assert("HashAggregate".r.findAllIn(skew).length >= 2, s"partial+final key count:\n$skew")
    assert(skew.contains("TakeOrderedAndProject"), s"top-k must be a bounded heap:\n$skew")
    // DTW: the event log is scanned exactly ONCE (the eager rollup
    // checkpoint); the cartesians left in the plan pair only the
    // model-bounded profile frames
    val dtw = planOf("events_dtw")
    assert(!dtw.contains("FileScan"),
      s"events must be scanned once, at the materialized rollup:\n$dtw")
  }

  test("session-2 rows keep their plan contracts: narrow scans, partial aggs, broadcast sides") {
    // burstiness: one corpus scan; term-keyed aggregations partial-combine
    val burst = planOf("text_burstiness")
    assert("FileScan".r.findAllIn(burst).length <= 2, s"bounded scans:\n$burst")
    assert("HashAggregate".r.findAllIn(burst).length >= 2, s"map-side combine:\n$burst")
    // CDC chunking: the split is row-local; the only shuffles are the
    // chunk-hash rollup's two distinct-agg phases (count(distinct doc)
    // legitimately shuffles (key, doc) partials then the key rollup)
    val cdc = planOf("dedup_cdc_chunks")
    assert("FileScan".r.findAllIn(cdc).length == 1, s"one scan:\n$cdc")
    assert("Exchange hashpartitioning".r.findAllIn(cdc).length <= 2,
      s"only the chunk-hash distinct-agg phases may shuffle:\n$cdc")
    // association rules: the per-type and basket-count sides broadcast
    // into the pair frame — no pair-keyed sort-merge anywhere
    val ar = planOf("events_assoc_rules")
    assert(ar.contains("BroadcastHashJoin") || ar.contains("BroadcastNestedLoopJoin"),
      s"bounded sides must broadcast:\n$ar")
    assert(!ar.contains("SortMergeJoin"), s"no pair-keyed sort-merge:\n$ar")
    // stats battery: single-pass conditional aggregation, no joins at all
    val jb = planOf("quality_jarque_bera")
    assert("FileScan".r.findAllIn(jb).length == 1 && !jb.contains("Join"),
      s"one-pass moment aggregation:\n$jb")
    // ROC AUC: the score histogram is the only data-sized aggregation
    val auc = planOf("ml_roc_auc")
    assert("FileScan".r.findAllIn(auc).length == 1, s"one scan:\n$auc")
  }

  test("joinWithStats: published ANALYZE stats pick broadcast under threshold, forbid it above") {
    import graft.sources.{Catalog, Tables}
    val root = java.nio.file.Files.createTempDirectory("graft-planspec-cat").toString
    val cat  = new Catalog(spark, root)
    val t    = Tables(spark, dir)
    cat.putTable("nation_dim", t.nation)
    cat.analyzeTable("nation_dim")

    val stats = cat.statsFor("nation_dim")
    assert(stats.isDefined, "ANALYZE must publish a readable __stats__ frame")
    assert(stats.get.nRows == 25, s"nation has 25 rows, stats say ${stats.get.nRows}")
    assert(stats.get.estBytes > 0)

    val on = col("c_nationkey") === col("n_nationkey")
    // 25 hydrated rows sit far under the 10 MB default: stats force broadcast
    val bc = cat.joinWithStats(t.customer, "nation_dim", on)
      .queryExecution.executedPlan.toString
    assert(bc.contains("BroadcastHashJoin"), s"stats under threshold must broadcast:\n$bc")

    // 1-byte threshold models "stats say the hydrated side is too big":
    // broadcast must be VETOED even though the on-disk file is tiny enough
    // that Spark's own estimator would have picked it
    val sm = cat.joinWithStats(t.customer, "nation_dim", on, broadcastThresholdBytes = 1L)
      .queryExecution.executedPlan.toString
    assert(!sm.contains("BroadcastHashJoin"), s"stats over threshold must veto broadcast:\n$sm")
    assert(sm.contains("SortMergeJoin") || sm.contains("ShuffledHashJoin"),
      s"vetoed broadcast should fall back to a shuffle join:\n$sm")

    // no stats published → honest fallback: plain join, optimizer decides
    cat.putTable("nation_nostats", t.nation)
    assert(cat.statsFor("nation_nostats").isEmpty)
    val plain = cat.joinWithStats(t.customer, "nation_nostats", on)
    assert(plain.count() == t.customer.count(), "fallback join must still run")
  }

  test("corpus_e2e_pipeline: composed plan depth stays bounded past the fan-out checkpoints") {
    // the pipeline fans out twice (cut -> {decontam, scoring, BPE},
    // final -> {BPE train, encode, output join}); both fan-outs are eagerly
    // checkpointed, so the FINAL frame's plan must be shallow: the counts
    // rollup + its join back, never a replay of the six upstream stages
    val p = planOf("corpus_e2e_pipeline")
    assert(!p.contains("FileScan"),
      s"the final plan must read checkpoint blocks, not re-scan parquet through six stages:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 4, s"composed plan leaks shuffles ($exchanges):\n$p")
  }

  test("readTableWhere: provably-empty predicate never plans a file scan; others push down") {
    import graft.sources.{Catalog, Tables}
    import org.apache.spark.sql.functions.lit
    val t    = Tables(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val cat  = new Catalog(spark, root)
    cat.putTable("orders95", t.orders.filter(
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp")))
    cat.analyzeTable("orders95")

    // literal above the stored max: the whole version is provably excluded
    val pruned = cat.readTableWhere("orders95", "o_orderdate", ">", "1996-01-01 00:00:00")
    val pp = pruned.queryExecution.executedPlan.toString
    assert(!pp.contains("FileScan") && !pp.contains("Scan parquet"),
      s"stats-pruned read must not plan a file scan:\n$pp")
    assert(pp.contains("LocalTableScan"), s"pruned read should be an empty local relation:\n$pp")
    assert(pruned.count() == 0L)
    assert(pruned.schema == cat.readTable("orders95").schema, "pruned frame must keep the schema")

    // numeric domain: totalprice = -1 is below the stored min
    assert(!cat.readTableWhere("orders95", "o_orderkey", "=", "-1")
      .queryExecution.executedPlan.toString.contains("FileScan"))

    // in-range literal: real filtered scan WITH pushdown
    val kept = cat.readTableWhere("orders95", "o_orderdate", ">=", "1995-06-01 00:00:00")
    val kf = kept.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(kf.contains("PushedFilters") && kf.contains("GreaterThanOrEqual"),
      s"non-prunable predicate must still push into the scan:\n$kf")
    assert(kept.count() > 0L)
    // prune + filter agree with the plain filtered scan
    val plain = cat.readTable("orders95")
      .filter(col("o_orderdate") >= lit("1995-06-01 00:00:00").cast("timestamp")).count()
    assert(kept.count() == plain)

    // no stats published: honest fallback to the filtered scan
    cat.putTable("orders95_nostats", t.orders.limit(10))
    val fb = cat.readTableWhere("orders95_nostats", "o_orderkey", "=", "-1")
    assert(fb.queryExecution.executedPlan.toString.contains("Scan") ||
      fb.queryExecution.executedPlan.toString.contains("FileScan"))
    assert(fb.count() == 0L)
  }

  test("readTableWhere: file-granular zone maps scan only intersecting files, results identical") {
    import spark.implicits._
    import graft.sources.Catalog
    val root = java.nio.file.Files.createTempDirectory("graft-fileprune").toString
    val cat  = new Catalog(spark, root)
    // 4 range-partitioned files over id 1..400: disjoint per-file [min,max]
    cat.putTable("zoned", (1L to 400L).map(i => (i, i % 7)).toDF("id", "v")
      .repartitionByRange(4, col("id")))
    // before ANALYZE(fileStats): the selective read scans every file
    val before = cat.readTableWhere("zoned", "id", "<", "5")
    assert(before.inputFiles.length == 4, before.inputFiles.mkString(","))
    cat.analyzeTable("zoned", fileStats = true)
    assert(cat.fileStatsFor("zoned").get.columns.map(_.file).distinct.size == 4)

    // selective low-end literal: only the first range file can intersect
    val low = cat.readTableWhere("zoned", "id", "<", "5")
    assert(low.inputFiles.length == 1,
      s"zone maps should plan exactly 1 of 4 files, got ${low.inputFiles.length}")
    assert(low.collect().map(_.toString).sorted.toSeq ==
      before.collect().map(_.toString).sorted.toSeq, "pruned read changed the results")
    // the predicate still pushes into the reduced scan
    val lf = low.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(lf.contains("PushedFilters") && lf.contains("LessThan"), lf)

    // spanning literal: several files intersect, but fewer than all when
    // the cut lands inside the range (here >= 201 keeps the upper half)
    val mid = cat.readTableWhere("zoned", "id", ">=", "201")
    assert(mid.inputFiles.length < 4 && mid.inputFiles.nonEmpty)
    assert(mid.count() == 200L)

    // whole-table tier still wins for fully-out-of-range literals
    val none = cat.readTableWhere("zoned", "id", ">", "400")
    assert(none.inputFiles.isEmpty && none.count() == 0L)

    // a re-PUT without re-ANALYZE invalidates the zone maps too: the new
    // version's rows land OUTSIDE every recorded zone and must still be read
    cat.putTable("zoned", Seq((9999L, 1L)).toDF("id", "v"))
    val stale = cat.readTableWhere("zoned", "id", ">", "400")
    assert(stale.count() == 1L, "stale file stats pruned rows of the newer version")
  }

  test("Z-order layout composes with zone maps: fewer files scanned than a random layout") {
    import spark.implicits._
    import graft.sources.{Catalog, Sinks}
    val root = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    val cat  = new Catalog(spark, root)
    // 2-D grid: x and y both uniform over [0, 64) — a selective x-range is
    // scattered across EVERY file under a random layout, clustered under Z
    val grid = (0L until 4096L).map(i => (i, i % 64, i / 64)).toDF("id", "x", "y")
    cat.putTable("grid_rand", grid.repartition(8))
    cat.putTable("grid_z", Sinks.zOrdered(grid, "x", "y", files = 8))
    cat.analyzeTable("grid_rand", fileStats = true)
    cat.analyzeTable("grid_z", fileStats = true)
    val predRand = cat.readTableWhere("grid_rand", "x", "<", "8")
    val predZ    = cat.readTableWhere("grid_z", "x", "<", "8")
    assert(predRand.inputFiles.length == 8,
      s"random layout scatters the range over all files, got ${predRand.inputFiles.length}")
    assert(predZ.inputFiles.length < 8 && predZ.inputFiles.nonEmpty,
      s"z-ordered zone maps should skip files, got ${predZ.inputFiles.length}")
    assert(predZ.count() == predRand.count() && predZ.count() == 8 * 64,
      "layout must never change results")

    // conjuncts compose: a 2-D range over the Z layout prunes on BOTH axes
    // — strictly fewer files than either axis alone allows
    val conj = cat.readTableWhereAll(
      "grid_z", Seq(("x", "<", "8"), ("y", "<", "8")))
    val yOnly = cat.readTableWhere("grid_z", "y", "<", "8")
    assert(conj.inputFiles.length <= math.min(predZ.inputFiles.length, yOnly.inputFiles.length))
    assert(conj.inputFiles.length < predZ.inputFiles.length,
      s"second conjunct should tighten the file set: ${conj.inputFiles.length} vs ${predZ.inputFiles.length}")
    assert(conj.count() == 8 * 8)
    // a non-selective conjunct (excludes no zone) never blocks the other's prune
    val mixed = cat.readTableWhereAll("grid_z", Seq(("x", "<", "8"), ("id", ">=", "0")))
    assert(mixed.inputFiles.length == predZ.inputFiles.length && mixed.count() == 8 * 64)
  }

  test("autoSaltedAgg: two-phase salted plan above the skew threshold, single shuffle below") {
    import spark.implicits._
    import graft.operators.Skew
    import org.apache.spark.sql.functions.{count, lit, sum => fsum}
    // hot frame: one key carries ~99% of rows (skew ~ 50); uniform frame ~ 1.0
    val hot = (1 to 5000).map(_ => (0L, 1L)) ++ (1 to 100).map(i => (i.toLong, 1L))
    val hotDf = hot.toDF("k", "v")
    val uniDf = (1 to 5000).map(i => ((i % 50).toLong, 1L)).toDF("k", "v")
    def run(df: DataFrame) = Skew.autoSaltedAgg(
      df, Seq("k"),
      partial = Seq(count(lit(1)).as("n"), fsum(col("v")).as("s")),
      merge   = Seq(fsum(col("n")).as("n"), fsum(col("s")).as("s")),
      skewThreshold = 4.0)

    val salted = run(hotDf)
    val ps = salted.queryExecution.executedPlan.toString
    // two key shuffles: (k, __salt) partials, then the k merge
    assert("Exchange hashpartitioning".r.findAllIn(ps).length == 2,
      s"hot key must route through the two-phase salted plan:\n$ps")
    assert(ps.contains("__salt"), s"phase-1 grouping must carry the salt column:\n$ps")

    val plainAgg = run(uniDf)
    val pp = plainAgg.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(pp).length == 1,
      s"uniform key must keep the plain single-shuffle plan:\n$pp")
    assert(!pp.contains("__salt"), s"no salt below the threshold:\n$pp")

    // ACTION must not change ANSWERS: salted result == plain groupBy
    val expected = hotDf.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), fsum(col("v")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, "salted aggregation diverged from the plain groupBy")

    // knownSkewFactor skips the measurement pass and forces the route
    val forced = Skew.autoSaltedAgg(
      uniDf, Seq("k"),
      partial = Seq(fsum(col("v")).as("s")), merge = Seq(fsum(col("s")).as("s")),
      knownSkewFactor = Some(100.0))
    assert(forced.queryExecution.executedPlan.toString.contains("__salt"))
    // and the estimator itself reads sanely on both shapes
    assert(Skew.skewFactor(hotDf, Seq("k")) > 4.0)
    assert(Skew.skewFactor(uniDf, Seq("k")) < 1.5)
  }

  test("autoSaltedJoin: dim replication only above the skew threshold, identical rows") {
    import spark.implicits._
    import graft.operators.Skew
    val hot = ((1 to 5000).map(_ => (0L, 1L)) ++ (1 to 100).map(i => (i.toLong, 1L)))
      .toDF("k", "v")
    val uni = (1 to 5000).map(i => ((i % 50).toLong, 1L)).toDF("k", "v")
    val dim = (0L to 100L).map(k => (k, s"d$k")).toDF("k", "name")

    val salted = Skew.autoSaltedJoin(hot, dim, "k", skewThreshold = 4.0)
    val ps = salted.queryExecution.executedPlan.toString
    assert(ps.contains("__salt") && ps.contains("Generate"),
      s"hot fact key must replicate dim across salts:\n$ps")

    val plain = Skew.autoSaltedJoin(uni, dim, "k", skewThreshold = 4.0)
    val pp = plain.queryExecution.executedPlan.toString
    assert(!pp.contains("__salt"), s"uniform key must keep the plain join:\n$pp")

    // both routes emit exactly the plain join's rows
    val expected = hot.join(dim, Seq("k")).groupBy(col("k"), col("name"))
      .count().collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = salted.groupBy(col("k"), col("name"))
      .count().collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected, "salted join diverged from the plain join")

    // published-stats route forces salting without a measurement pass
    val forced = Skew.autoSaltedJoin(uni, dim, "k", knownSkewFactor = Some(50.0))
    assert(forced.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("entity-sized cumulatives run two-phase: no data-sized single-partition window survives") {
    // vocabGrowth (per-document), rfmSegments (per-user), giniCoefficient
    // (per-entity) — their windowed tables grow WITH the corpus, so every
    // Window node in their plans must either be partitioned by the
    // two-phase range-partition id or be the offsets window over the
    // partition-count-sized totals (whose inputs are the __t_ partials).
    // A Window line mentioning neither is the single-partition sort the
    // rewrite exists to kill.
    for (q <- Seq("corpus_vocab_growth", "events_rfm_segments", "quality_gini_revenue")) {
      val plan = planOf(q)
      val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
      assert(windows.nonEmpty, s"$q: expected the two-phase windows in the plan")
      val offenders = windows.filterNot(l => l.contains("__psum_pid") || l.contains("__t_"))
      assert(
        offenders.isEmpty,
        s"$q: data-sized global window (no __psum_pid partition) in plan:\n${offenders.mkString("\n")}")
    }
  }
}
