package graft

import graft.operators.LanguageModel
import graft.sources.Tables

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigramScore: hand-computed smoothed log-probs on a 3-doc corpus") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "c")       // one token — unscoreable, absent from output
    ).toDF("doc_id", "text")
    val out = LanguageModel
      .bigramScore(docs, docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

    // train counts: uni a=3, b=3, c=1 → V=3; bigrams: (a,b)=3, (b,a)=1
    def p(c2: Long, c1: Long) = (c2 + 0.5) / (c1 + 0.5 * 3)
    def rnd(x: Double)        = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lAB = math.log(p(3, 3)) // a->b
    val lBA = math.log(p(1, 3)) // b->a
    assert(out(1L)._1 == 3)
    assert(math.abs(out(1L)._2 - rnd((lAB + lBA + lAB) / 3)) < 1e-9)
    assert(out(2L) == ((1L, rnd(lAB))))
    assert(!out.contains(3L))
    // the common transition scores higher than the rare one
    assert(out(2L)._2 > rnd(lBA))
  }

  test("kneserNeyScore: hand-computed interpolated KN probabilities, backoff, OOV floor") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // bigram types: (a,b) c2=2, (b,a) c2=1 -> nall=2
    // ctx a: c1=2, n1f=1; ctx b: c1=1, n1f=1; cont: a n1b=1, b n1b=1
    def grid12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def rnd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mirror the engine's op order: grid-12 ln -> exact decimal sum ->
    // round 9 -> double division -> round 6
    def avg(lps: Seq[Double], n: Int) = rnd6(
      lps.map(grid12).sum.setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble / n.toDouble)
    val pAB = (math.max(2 - 0.75, 0.0) + 0.75 * 1.0 * (1.0 / 2.0)) / 2.0 // = 0.8125
    val pBA = (math.max(1 - 0.75, 0.0) + 0.75 * 1.0 * (1.0 / 2.0)) / 1.0 // = 0.625
    val self = LanguageModel.kneserNeyScore(train, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(self(1L) == ((3L, avg(Seq(math.log(pAB), math.log(pBA), math.log(pAB)), 3))),
      self.toString)
    // unseen context backs off to the continuation probability alone
    val backoff = Seq((9L, "z a")).toDF("doc_id", "text")
    val b = LanguageModel.kneserNeyScore(train, backoff, "doc_id", "text").collect().head
    assert(b.getDouble(2) == avg(Seq(math.log(1.0 / 2.0)), 1), b.toString)
    // fully unseen pair floors at 1e-12, never -Infinity
    val oov = Seq((8L, "z q")).toDF("doc_id", "text")
    val o = LanguageModel.kneserNeyScore(train, oov, "doc_id", "text").collect().head
    assert(o.getDouble(2) == avg(Seq(math.log(1e-12)), 1), o.toString)
    // the Kneser-Ney point: the frequent transition outscores the rare one
    assert(pAB > pBA)
  }

  test("goodTuring: counts-of-counts closed form, NULL at gaps") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val rows = LanguageModel.goodTuring(docs, "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    // counts a=3 b=2 c=1 -> N1=N2=N3=1: r*=2 at r=1, r*=3 at r=2, gap at r=3
    assert(rows == Map(
      1L -> ((1L, Some(2.0))),
      2L -> ((1L, Some(3.0))),
      3L -> ((1L, None))), rows.toString)
    // a frequency gap (no words seen exactly r+1 times) yields NULL too
    val gap = Seq((1L, "x x x y")).toDF("doc_id", "text") // counts 3 and 1: N2=0
    val g = LanguageModel.goodTuring(gap, "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(g == Map(1L -> None, 3L -> None), g.toString)
  }

  test("bigramScore on the corpus: repeated boilerplate outscores rare transitions") {
    val docs = Tables(spark, SharedSpark.sf0001).documents
    val out  = LanguageModel.bigramScore(docs, docs, "doc_id", "text").collect()
    assert(out.nonEmpty)
    // scores are finite negatives (log of probabilities < 1)
    out.foreach { r =>
      val s = r.getDouble(2)
      assert(!s.isNaN && !s.isInfinite && s < 0, s"doc ${r.getLong(0)} score $s")
    }
    // self-scored corpus must show spread — the signal separates documents
    val scores = out.map(_.getDouble(2))
    assert(scores.max - scores.min > 0.1, "degenerate constant score would filter nothing")
  }

  test("bigramScore generalizes: unseen bigrams get the smoothed floor, not a crash") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val test_ = Seq((9L, "z q")).toDF("doc_id", "text") // nothing seen in train
    val out = LanguageModel.bigramScore(train, test_, "doc_id", "text").collect()
    assert(out.length == 1)
    // V=2 (a, b); c2=0, c1=0 → p = 0.5 / (0.5*2) = 0.5
    val expected = BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.head.getDouble(2) - expected) < 1e-9)
  }

  test("naiveBayesClassify: separable corpus classifies perfectly, hand-checked decimal score") {
    val docs = Seq(
      (1L, "x x x y", "A"), (2L, "x y x x", "A"), (3L, "x x", "A"),
      (4L, "z z w", "B"), (5L, "w z z z", "B")
    ).toDF("doc_id", "text", "lab")
    val pred = LanguageModel.naiveBayesClassify(docs, docs, "doc_id", "text", "lab")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "A", 2L -> "A", 3L -> "A", 4L -> "B", 5L -> "B"), s"got $pred")
    // hand-check doc 3 ("x x") score: prior ln(3/5) + 2·ln((cnt_A(x)+1)/(tot_A+V))
    // cnt_A(x)=8, tot_A=10, V=4 → ln(9/14); each ln rounded to 1e-12 first
    def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val want = (r12(math.log(3.0 / 5.0)) + BigDecimal(2) * r12(math.log(9.0 / 14.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s3 = LanguageModel.naiveBayesClassify(docs, docs, "doc_id", "text", "lab")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 3L).head().getDouble(2)
    assert(s3 == want, s"doc3 score $s3 vs $want")
    // scoring docs made ONLY of unseen tokens drop out (no vocab rows)
    val unseen = Seq((9L, "qq rr")).toDF("doc_id", "text")
    assert(LanguageModel.naiveBayesClassify(
      docs, unseen.withColumn("lab", org.apache.spark.sql.functions.lit("?")), "doc_id", "text", "lab")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 9L).isEmpty)
  }

  test("pmiCollocations: planted collocation scores high, independent pair near 0") {
    // "aa bb" always adjacent (collocation); "cc" and "dd" co-occur freely
    val docs = (0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) "aa bb cc dd" else "aa bb dd cc")
    }.toDF("doc_id", "text")
    val out = LanguageModel.pmiCollocations(docs, "doc_id", "text", minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // aa→bb appears in every doc: c_xy=40, c_x=c_y=40, U=160, T=120
    // pmi = ln(40·160·160/(120·40·40)) = ln(16/3)
    val want = BigDecimal(math.log(40.0 * 160 * 160 / (120.0 * 40 * 40)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("aa", "bb"))._1 == 40L && out(("aa", "bb"))._2 == want, s"got ${out.get(("aa", "bb"))}")
    // the collocation outranks every other observed pair
    assert(out.values.map(_._2).max == out(("aa", "bb"))._2)
    // min-count: pairs below 5 never surface
    assert(out.values.forall(_._1 >= 5L))
  }

  test("wittenBellScore: hand-computed interpolation, unigram backoff for unseen contexts") {
    import spark.implicits._
    // train "a b a b": bic (a,b)=2 (b,a)=1; ctx a:(2,1) b:(1,1); uni a=2 b=2, ntok=4
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // p(b|a) = (2 + 1*0.5)/3 = 5/6 ; p(a|b) = (1 + 0.5)/2 = 0.75
    val score = Seq((7L, "a b a")).toDF("doc_id", "text")
    val r = graft.operators.LanguageModel.wittenBellScore(train, score, "doc_id", "text")
      .collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 2L)
    // (round12 ln(5/6) + round12 ln(3/4)) / 2 -> -0.235002 at grid 6
    assert(r.getDouble(2) == -0.235002, r.toString)
    // unseen context z: backoff straight to p_uni(a) = 0.5
    val back = Seq((8L, "z a")).toDF("doc_id", "text")
    val b = graft.operators.LanguageModel.wittenBellScore(train, back, "doc_id", "text")
      .collect().head
    assert(b.getLong(1) == 1L && b.getDouble(2) == -0.693147, b.toString)
  }

}
