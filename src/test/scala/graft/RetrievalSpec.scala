package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Corpus, Retrieval}
import graft.sources.Tables

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, SharedSpark.sf0001).documents

  // ------------------------------------------------------------- BM25

  test("bm25TopK: hand-computed score on a 3-doc corpus") {
    val df = Seq(
      (1L, "cat dog cat"),  // cat tf=2, len=3
      (2L, "dog dog bird"), // len=3
      (3L, "fish fish")     // no query terms
    ).toDF("doc_id", "text")
    val out = Retrieval
      .bm25TopK(df, "doc_id", "text", terms = Seq("cat", "dog"), k = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

    // N=3, avgdl=8/3; idf(t) = ln(1 + (3 - df + 0.5)/(df + 0.5))
    def idf(dfT: Int)            = math.log(1.0 + (3.0 - dfT + 0.5) / (dfT + 0.5))
    def w(tf: Int, len: Int)     = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len / (8.0 / 3.0))))
    def rnd(x: Double)           = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = rnd(idf(1) * w(2, 3) + idf(2) * w(1, 3)) // cat then dog (term-sorted fold)
    val d2 = rnd(idf(2) * w(2, 3))
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - d1) < 1e-9)
    assert(out(2L)._1 == 1 && math.abs(out(2L)._2 - d2) < 1e-9)
    assert(!out.contains(3L), "docs matching no query term must not appear")
    // rarer 'cat' + higher tf must outrank the common term doc
    assert(out(1L)._2 > out(2L)._2)
  }

  test("bm25TopK: k cuts by score desc with doc_id tiebreak, corpus run non-empty") {
    val top = Retrieval
      .bm25TopK(docs, "doc_id", "text", terms = Seq("agg", "join", "scan", "shuffle"), k = 5)
      .collect()
    assert(top.length == 5)
    val scores = top.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-_)), "output ordered by score desc")
  }

  // --------------------------------------------- FastSS fuzzy word join

  test("rrfFuse: hand-computed fusion, lists weight equally, ties break by id") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (10L, 2)).toDF("doc_id", "rank")
    val out = graft.operators.Retrieval
      .rrfFuse(Seq(a, b), "doc_id", "rank", k = 10, c = 60)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 10: 1/61 + 1/62; doc 20: 1/62 + 1/61 — EQUAL scores, tie by id;
    // doc 30: 1/63 from one list only
    val s12 = BigDecimal(1.0 / 61 + 1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s3  = BigDecimal(1.0 / 63).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq((10L, 2L, s12), (20L, 2L, s12), (30L, 1L, s3)))
  }

  test("rrfFuse: duplicate id within one list collapses to its best rank") {
    import spark.implicits._
    // doc 10 appears twice in list a (ranks 1 and 3) — a malformed input.
    // The contract keeps min rank per (id, list): fusion must equal the
    // clean two-list case, with n_lists = 2, not 3.
    val a = Seq((10L, 1), (10L, 3), (20L, 2)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (10L, 2)).toDF("doc_id", "rank")
    val out = graft.operators.Retrieval
      .rrfFuse(Seq(a, b), "doc_id", "rank", k = 10, c = 60)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val s12 = BigDecimal(1.0 / 61 + 1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq((10L, 2L, s12), (20L, 2L, s12)))
  }

  test("deletionVariants: distance-1 neighborhood of 'abc'") {
    val v = Retrieval.deletionVariants("abc", 1).toSet
    assert(v == Set("abc", "bc", "ac", "ab"))
    assert(Retrieval.deletionVariants("abc", 2).toSet ==
      Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("fuzzyWordPairs equals brute-force levenshtein join (maxDist 1 and 2)") {
    val words = Tables(spark, SharedSpark.sf0001).part
      .select(explode(split(col("p_name"), " ")).as("word"))
      .filter(col("word") =!= "")
    for (d <- Seq(1, 2)) {
      val fast = Retrieval
        .fuzzyWordPairs(words, "word", d)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val vocab = words.distinct().as[String].collect()
      val brute = (for {
        a <- vocab; b <- vocab
        if a < b
        dist = levDist(a, b)
        if dist <= d
      } yield (a, b, dist.toLong)).toSet
      assert(fast == brute, s"FastSS blocking must lose nothing at maxDist=$d")
      assert(brute.nonEmpty, "part-name vocabulary has close word pairs")
    }
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  // ------------------------------------------------------ char entropy

  test("charEntropy: uniform and single-char distributions hit closed forms") {
    val df = Seq(
      (1L, "abcd"), // uniform over 4 chars -> exactly 2 bits
      (2L, "aaaa"), // degenerate -> 0 bits
      (3L, "")      // no chars -> absent
    ).toDF("doc_id", "text")
    val out = Corpus
      .charEntropy(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((4L, 4L, 2.0)))
    assert(out(2L) == ((4L, 1L, 0.0)))
    assert(!out.contains(3L))
  }

  test("tfidfCosinePairs: identical docs hit 1, disjoint docs absent, df cap drops stop-words") {
    val d = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana cherry"),  // identical to 1 → sim 1.0
      (3L, "apple dates"),          // shares only 'apple' with 1/2
      (4L, "elder fig grape"),      // disjoint → no pair
      (5L, "the the the"),          // 'the' df=2 — under the cap, tf-heavy
      (6L, "apple the")
    ).toDF("doc_id", "text")
    val out = Retrieval.tfidfCosinePairs(d, "doc_id", "text", maxDfRatio = 0.5, minSim = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // 'apple' (df 4 > cap) is gone, so the identical docs share 2 kept terms
    assert(out((1L, 2L)) == ((2L, 1.0)), s"identical docs: ${out.get((1L, 2L))}")
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L }, "disjoint doc paired")
    // 'apple' df=4 > floor(0.5·6)=3 → capped out: docs 3 and 6 share nothing left
    assert(!out.contains((3L, 6L)) && !out.contains((1L, 3L)), s"stop-term pair leaked: ${out.keys}")
    // every pair is canonical a < b with sim in (0, 1]
    out.foreach { case ((a, b), (_, s)) => assert(a < b && s > 0 && s <= 1.0) }
  }

  test("tfidfCosinePairs on the corpus: non-empty, symmetric-free, weights favor rarer overlap") {
    val out = Retrieval.tfidfCosinePairs(docs, "doc_id", "text", maxDfRatio = 0.5, minSim = 0.1)
      .collect()
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == out.length, "duplicate pairs")
    pairs.foreach { case (a, b) => assert(a < b && !pairs.contains((b, a))) }
  }

  test("rougeNgram: hand-computed clipped overlap, degenerate pairs, bounds") {
    import spark.implicits._
    val pairs = Seq(
      // cand "a b c a" vs ref "a c a d": 1-gram clip = min(2,2)+min(1,1) = 3
      // -> P = R = 3/4; 2-gram bags {ab,bc,ca} vs {ac,ca,ad}: clip = 1 (ca)
      (1L, "a b c a", "a c a d"),
      (2L, "x y", "x y"),      // identical: P = R = F = 1 at both n
      (3L, "q", "z"),           // disjoint singletons: all zeros; no 2-grams
      (4L, "", "w w")           // empty candidate: P = 0 by the guard
    ).toDF("pair_id", "cand", "ref")
    val got = Retrieval.rougeNgram(pairs, "pair_id", "cand", "ref", maxN = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(got((1L, 1)) == ((4L, 4L, 3L, 0.75, 0.75, 0.75)))
    assert(got((1L, 2)) == ((3L, 3L, 1L, 0.333333, 0.333333, 0.333333)))
    assert(got((2L, 1)) == ((2L, 2L, 2L, 1.0, 1.0, 1.0)))
    assert(got((2L, 2)) == ((1L, 1L, 1L, 1.0, 1.0, 1.0)))
    assert(got((3L, 1)) == ((1L, 1L, 0L, 0.0, 0.0, 0.0)))
    assert(got((3L, 2)) == ((0L, 0L, 0L, 0.0, 0.0, 0.0)))
    assert(got((4L, 1)) == ((0L, 2L, 0L, 0.0, 0.0, 0.0)))
    // bounds on every row: 0 <= P,R,F <= 1 and clip <= min(totals)
    got.values.foreach { case (cg, rg, clip, p, r, f) =>
      assert(clip <= math.min(cg, rg) && p >= 0 && p <= 1 && r >= 0 && r <= 1 && f >= 0 && f <= 1)
    }
    intercept[IllegalArgumentException](Retrieval.rougeNgram(pairs, "pair_id", "cand", "ref", 0))
  }

  test("queryLikelihoodTopK: closed-form Dirichlet scores, smoothing mass for zero-tf terms") {
    import spark.implicits._
    // collection: "a b" and "a a" -> cf(a)=3, |C|=4, P(a|C)=0.75
    val docs = Seq((1L, "a b"), (2L, "a a")).toDF("doc_id", "text")
    val got = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text", Seq("a"), k = 10, mu = 100.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def score(tf: Double, len: Double): Double = {
      val c = BigDecimal(math.log((tf + 100.0 * 0.75) / (len + 100.0)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      c.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == Map(1L -> score(1.0, 2.0), 2L -> score(2.0, 2.0)), s"got $got")
    // the doc with higher tf at equal length ranks higher
    assert(got(2L) > got(1L))
    // two-term query: a doc matching one term still pays the smoothing
    // penalty for the other, so the doc holding both terms wins
    val d2 = Seq((1L, "x y y"), (2L, "x q y")).toDF("doc_id", "text")
    val both = Retrieval.queryLikelihoodTopK(d2, "doc_id", "text", Seq("x", "q"), k = 10)
      .collect().map(r => r.getLong(0)).toSeq
    assert(both.head == 2L, both.toString)
  }

  test("bleuPairs: identical pair scores 1, disjoint 0, short candidate pays exp(1-r/c) brevity") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "a b c", "a b c"),
      (2L, "x y", "a b c d"),
      (3L, "a b", "a b c d")
    ).toDF("pair_id", "cand", "ref")
    val out = Retrieval.bleuPairs(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    val same = out(1L)
    assert(same.getLong(1) == 3L && same.getLong(3) == 3L && same.getLong(4) == 2L)
    assert(same.getDouble(5) == 1.0 && same.getDouble(6) == 1.0 && same.getDouble(7) == 1.0)
    val disj = out(2L)
    assert(disj.getLong(3) == 0L && disj.getDouble(7) == 0.0, disj.toString)
    val short = out(3L)
    // p1 = p2 = 1, BP = exp(1 - 4/2) = 0.367879
    assert(short.getDouble(5) == 1.0 && short.getDouble(6) == 1.0)
    assert(math.abs(short.getDouble(7) - math.exp(-1.0)) < 1e-6, short.toString)
  }
}
