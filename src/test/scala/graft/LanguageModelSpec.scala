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
}
