package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Similarity, Sketches, TopK}

/** Degenerate-input hardening: a library operator must return an empty (or
  * well-defined) result on empty/singleton inputs, never throw. */
class EdgeCaseSpec extends SparkSpec {

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  test("dedup operators on an empty corpus return empty results") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", "text", 0.8).count() == 0)
    assert(Dedup.minhashDupPairs(emptyDocs, "doc_id", "text", 0.8).count() == 0)
    assert(Dedup.simhashDupPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.winnowDupPairs(emptyDocs, "doc_id", "text", minShared = 1).count() == 0)
  }

  test("dedup on single/short documents (no shingles possible)") {
    import spark.implicits._
    val tiny = Seq((1L, "one two"), (2L, "x")).toDF("doc_id", "text")
    // both docs have < 3 tokens: no shingles, no pairs — and no crash
    assert(Dedup.jaccardPairs(tiny, "doc_id", "text", 0.8).count() == 0)
    assert(Dedup.minhashDupPairs(tiny, "doc_id", "text", 0.8).count() == 0)
    // simhash still hashes single tokens
    assert(Dedup.simhash(tiny, "doc_id", "text").count() == 2)
  }

  test("duplicateClusters of an empty pair set is empty") {
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long, Double)].toDF("a_id", "b_id", "jacc")
    assert(Dedup.duplicateClusters(noPairs).count() == 0)
  }

  test("similarity search with empty query/corpus sides") {
    import spark.implicits._
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val someVecs  = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteTopK(someVecs, emptyVecs, k = 3).count() == 0)
    assert(Similarity.bruteTopK(emptyVecs, someVecs, k = 3).count() == 0)
    assert(Similarity.cosineDupPairs(emptyVecs, 0.5).count() == 0)
    // k larger than corpus: returns all others, ranked
    assert(Similarity.bruteTopK(someVecs, someVecs, k = 10).count() == 2)
  }

  test("as-of join with an empty right side keeps all left rows, null payload") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(("A", ts("2024-01-01 10:00:00"), 1)).toDF("sym", "ts", "qty")
    val r = Seq.empty[(String, java.sql.Timestamp, Double)].toDF("sym", "qts", "price")
    val out = AsOfJoin.asof(l, r, Seq("sym"), "ts", "qts", Seq("price")).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("asof_price")))
  }

  test("top-k per group on empty input and k=1 groups") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("g", "v")
    assert(TopK.perGroup(empty, Seq("g"), Seq("v" -> false), 3).count() == 0)
    val one = Seq((1L, 2.0)).toDF("g", "v")
    assert(TopK.perGroup(one, Seq("g"), Seq("v" -> false), 3).count() == 1)
  }

  test("sketches on empty input: zero-row outputs, no crash") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("k", "id")
    assert(Sketches.distinctCounts(empty, "k", "id").count() == 0)
    assert(Sketches.approxQuantiles(empty, "k", col("id"), Seq(0.5)).count() == 0)
  }

  test("corpus shaping on empty/degenerate inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(graft.operators.Corpus.quotaPerSource(empty, "doc_id", "source", 5).count() == 0)
    assert(graft.operators.Corpus.keywordsTopK(emptyDocs, "doc_id", "text", 3).count() == 0)
    // docs with empty/whitespace text contribute no keyword rows but don't crash
    val blank = Seq((1L, ""), (2L, "   "), (3L, "word")).toDF("doc_id", "text")
    val kw = graft.operators.Corpus.keywordsTopK(blank, "doc_id", "text", 3).collect()
    assert(kw.map(_.getLong(0)).toSet == Set(3L))
  }

  test("kmeans rejects an empty corpus loudly; semantic dedup empty-in-empty-out") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.kmeans(empty, k = 2, maxIter = 1)
    }
    // the composed operator matches its dedup siblings: empty, not a throw
    assert(Similarity.semanticDupPairs(empty, threshold = 0.5, k = 2, maxIter = 1).count() == 0)
    // orthogonal vectors: clustering succeeds, zero pairs at any threshold
    val ortho = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.semanticDupPairs(ortho, threshold = 0.5, k = 2, maxIter = 2).count() == 0)
  }

  test("retrieval/cdc/funnel/bpe/chunking on empty or unmatched inputs") {
    import spark.implicits._
    import graft.operators.{Bpe, Cdc, Funnel, Retrieval}
    // BM25: no doc contains any query term → empty, never a div-by-zero
    val noHit = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(Retrieval.bm25TopK(noHit, "doc_id", "text", Seq("zzz"), k = 5).count() == 0)
    assert(Retrieval.bm25TopK(emptyDocs, "doc_id", "text", Seq("x"), k = 5).count() == 0)
    // fuzzy join: empty vocab, and a vocab with no close pairs
    assert(Retrieval.fuzzyWordPairs(emptyDocs.select(col("text").as("word")), "word", 2).count() == 0)
    val far = Seq("aaaaaaaa", "zzzzzzzzzzzz").toDF("word")
    assert(Retrieval.fuzzyWordPairs(far, "word", 1).count() == 0)
    // CDC: empty delta is a no-op; empty base means delta inserts wholesale
    val base  = Seq((1L, "a")).toDF("k", "v")
    val eDelta = Seq.empty[(Long, String)].toDF("k", "v")
    assert(Cdc.mergeInto(base, eDelta, Seq("k")).count() == 1)
    assert(Cdc.mergeInto(eDelta, base, Seq("k")).count() == 1)
    // funnel: empty stream, and a stream with only non-stage events
    val eEvents = Seq.empty[(Long, java.sql.Timestamp, String)].toDF("user_id", "ts", "event_type")
    assert(Funnel.firstReach(eEvents, "user_id", "ts", "event_type", Seq("view", "click")).count() == 0)
    // BPE: empty corpus trains an empty model; encoding still works
    val m = Bpe.train(emptyDocs, "text", numMerges = 5)
    assert(m.merges.isEmpty)
    assert(Bpe.tokenCounts(noHit, "doc_id", "text", m).collect().head.getLong(2) == 9L,
      "char-level fallback: alpha(5)+beta(4) symbols with no merges")
    // chunking: empty corpus → empty
    assert(graft.operators.Corpus.chunkDocuments(emptyDocs, "doc_id", "text", 16, 4).count() == 0)
  }

  test("round-11 operators: loud rejections and well-defined degenerate outputs") {
    import spark.implicits._
    val docs2 = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    // parameter validation is loud, not silent
    intercept[IllegalArgumentException](
      graft.operators.Corpus.hashedFeatures(docs2, "doc_id", "text", dim = 3)) // not a power of 2
    intercept[IllegalArgumentException](
      graft.operators.Retrieval.tfidfCosinePairs(Seq((1L, "solo")).toDF("doc_id", "text"), "doc_id", "text"))
    intercept[IllegalArgumentException](
      graft.operators.LanguageModel.pmiCollocations(docs2, "doc_id", "text", minCount = 0))
    intercept[IllegalArgumentException](
      graft.operators.Funnel.kaplanMeier(
        Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))).toDF("user_id", "ts"),
        "user_id", "ts", "2024-01-01", churnGapDays = 0))
    intercept[IllegalArgumentException](
      graft.operators.Wordpiece.trainVocabFrame(docs2, "doc_id", "text", vocabSize = 0))
    intercept[IllegalArgumentException](
      graft.operators.Similarity.pqTrain(
        Seq((1L, Array.fill(10)(0.1f))).toDF("vec_id", "embedding"), m = 3)) // 10 % 3 != 0
    // empty-source BFS: no roots → empty levels, no crash
    assert(graft.operators.Graph
      .bfsLevels(Seq((1L, 2L)).toDF("s", "t"), "s", "t",
        Seq.empty[Long].toDF("id"), maxDepth = 3).count() == 0)
    // NB with an empty training set rejects loudly (no silent empty model)
    intercept[IllegalArgumentException](
      graft.operators.LanguageModel.naiveBayesClassify(
        Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lab"),
        docs2.withColumn("lab", lit("?")), "doc_id", "text", "lab"))
    // incremental refresh: an unknown op code fails the job, never mis-signs
    val base = Seq(("O", 1L, BigDecimal("1.00"))).toDF("k", "n", "s")
    val badDelta = Seq(("O", BigDecimal("2.00"), "X")).toDF("k", "s", "op")
    val ex = intercept[Exception](
      graft.operators.Cdc
        .incrementalAggRefresh(base, badDelta, Seq("k"), "op", "n", Seq("s"))
        .collect())
    assert(ex.getMessage != null)
    // empty blocklisted corpus → empty gate output, not a crash
    assert(graft.operators.Corpus
      .blocklistFilter(emptyDocs, "doc_id", "text", Seq("x"), 0.5).count() == 0)
  }

  test("round-12 continuation operators survive empty and degenerate inputs") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.operators.Graph.adamicAdar(noEdges, "a", "b", maxDegree = 5).count() == 0)
    assert(graft.operators.Graph.betweennessSampled(noEdges, "a", "b", 4, 3).count() == 0)
    assert(graft.operators.Graph.harmonicSampled(noEdges, "a", "b", 4, 3).count() == 0)
    assert(graft.operators.Graph.kTruss(noEdges, "a", "b", k = 3).count() == 0)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Corpus.gopherRules(noDocs, "doc_id", "text").count() == 0)
    assert(graft.operators.Corpus.readability(noDocs, "doc_id", "text").count() == 0)
    assert(graft.operators.Corpus.rakeKeyphrases(noDocs, "doc_id", "text", 5).count() == 0)
    // markov attribution with zero conversions: channels exist, removal
    // effects are NULL (p_conv = 0), never a division error
    val noConv = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val m = graft.operators.Funnel
      .markovRemovalAttribution(noConv, "user_id", "ts", "event_id", "event_type", "purchase")
      .collect()
    assert(m.length == 1 && m.head.getDouble(1) == 0.0 && m.head.isNullAt(3), m.mkString(","))
    // single-group Kruskal-Wallis: H is exactly 0, not a special case
    val one = Seq(("A", 1L), ("A", 2L), ("A", 3L)).toDF("g", "v")
    val kw = graft.operators.DataQuality.kruskalWallis(one, "g", "v").collect().head
    assert(kw.getDouble(2) == 0.0, kw.toString)
    // boosted stumps on a constant-label input: every split gain is 0
    // (zero label variance); training still runs its fixed rounds
    val const = Seq((1L, 1), (2L, 1), (3L, 1)).toDF("b", "y")
    val st = graft.operators.Boosting.trainStumps(const, "y", Seq("f" -> col("b")), 2, 0.5)
      .collect()
    assert(st.forall(r => r.getDouble(5) == 0.0), st.mkString(","))
  }

  test("round-14 operators survive empty and degenerate inputs") {
    import spark.implicits._
    // sccFwBw: empty edges; pure self-loops (filtered -> empty); one edge
    val noE = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.operators.Graph.sccFwBw(noE, "a", "b").count() == 0)
    val selfOnly = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(graft.operators.Graph.sccFwBw(selfOnly, "a", "b").count() == 0)
    val oneEdge = graft.operators.Graph.sccFwBw(Seq((1L, 2L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneEdge == Map(1L -> 1L, 2L -> 2L), oneEdge.toString)

    // epochPlan: empty corpus -> empty plan; zero-share-sum guarded by the
    // left join (shares frame empty -> share_sum NULL -> desired NULL DIV)
    val noDocs = Seq.empty[(String, String)].toDF("source", "text")
    val sh = Seq(("A", 1L)).toDF("source", "share")
    assert(graft.operators.Corpus.epochPlan(noDocs, "source", "text", 100L, sh).count() == 0)

    // binaryQuantize/bqTopK: empty corpus and empty queries
    val noVec = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.binaryQuantize(noVec, dim = 4).count() == 0)
    val v = Seq((1L, Array(1f, -1f, 1f, -1f)), (2L, Array(1f, 1f, -1f, -1f)))
      .toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.bqTopK(v, noVec, dim = 4, k = 2, candidates = 2).count() == 0)
    assert(graft.operators.Similarity.bqTopK(noVec, v, dim = 4, k = 2, candidates = 2).count() == 0)
    val both = graft.operators.Similarity.bqTopK(v, v, dim = 4, k = 2, candidates = 2).collect()
    assert(both.length == 2, both.mkString(",")) // each query's sole other vector

    // autoSaltedAgg: empty input -> empty result on both routes
    val noKv = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(graft.operators.Skew.autoSaltedAgg(
      noKv, Seq("k"), Seq(sum(col("v")).as("s")), Seq(sum(col("s")).as("s"))).count() == 0)
    assert(graft.operators.Skew.autoSaltedAgg(
      noKv, Seq("k"), Seq(sum(col("v")).as("s")), Seq(sum(col("s")).as("s")),
      knownSkewFactor = Some(100.0)).count() == 0)
    assert(graft.operators.Skew.skewFactor(noKv, Seq("k")) == 1.0)

    // readTableWhere: all-NULL column is provably empty for any comparison
    val root = java.nio.file.Files.createTempDirectory("graft_edge_prune_").toString
    val cat  = new graft.sources.Catalog(spark, root)
    cat.putTable("nulls_t", Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "s"))
    cat.analyzeTable("nulls_t")
    val pruned = cat.readTableWhere("nulls_t", "s", "=", "anything")
    assert(pruned.count() == 0)
    assert(!pruned.queryExecution.executedPlan.toString.contains("FileScan"))
  }
}
