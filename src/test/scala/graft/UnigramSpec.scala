package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

import graft.operators.{Unigram, Wordpiece}

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def lp(x: Double): JBig =
    JBig.valueOf(x).setScale(12, RoundingMode.HALF_UP)

  test("viterbiWord: max-likelihood beats greedy, tie prefers longest piece, UNK on unseen char") {
    // plant: greedy longest-match would take 'ab'+'c', but 'a'+'bc' is far
    // more likely — Viterbi must find it
    val m1 = Map(
      "a"  -> lp(-1.0), "b" -> lp(-8.0), "c" -> lp(-8.0),
      "ab" -> lp(-7.0), "bc" -> lp(-1.0))
    assert(Unigram.viterbiWord("abc", m1, 4) == Seq("a", "bc"))
    assert(Wordpiece.encodeWord("abc", m1.keySet, 4) == Seq("ab", "c"), "greedy differs by design")
    // exact decimal tie between 'ab' and 'a'+'b': smallest predecessor
    // (the longest final piece) must win
    val m2 = Map("a" -> lp(-1.0), "b" -> lp(-1.0), "ab" -> lp(-2.0))
    assert(Unigram.viterbiWord("ab", m2, 4) == Seq("ab"))
    // a character never seen in training voids the word to [UNK]
    assert(Unigram.viterbiWord("axb", m2, 4) == Seq(Unigram.Unk))
    assert(Unigram.viterbiWord("x", m2, 4) == Seq(Unigram.Unk))
  }

  test("viterbi optimality in-data: every segmentation scores >= greedy's likelihood") {
    val docs  = sources.Tables(spark, SharedSpark.sf001).documents
    val model = Unigram.train(docs, "doc_id", "text", vocabSize = 96, maxPieceLen = 4)
    val words = docs
      .select(explode(filter(split(col("text"), "\\s+"), t => length(t) > 0)).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    def score(pieces: Seq[String]): JBig =
      pieces.foldLeft(JBig.ZERO)((acc, p) => acc.add(model.logp(p)))
    words.foreach { w =>
      val vit = Unigram.viterbiWord(w, model.logp, model.maxPieceLen)
      val gre = Wordpiece.encodeWord(w, model.logp.keySet, model.maxPieceLen)
      assert(vit.mkString == w, s"lossless: $w")
      assert(score(vit).compareTo(score(gre)) >= 0, s"$w: viterbi ${score(vit)} < greedy ${score(gre)}")
    }
  }

  test("encodeStats conserves corpus mass and is partitioning-deterministic") {
    val docs  = sources.Tables(spark, SharedSpark.sf001).documents
    val model = Unigram.train(docs, "doc_id", "text", vocabSize = 96, maxPieceLen = 4)
    def run(d: org.apache.spark.sql.DataFrame) =
      Unigram.encodeStats(d, "doc_id", "text", model)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run(docs)
    assert(got.nonEmpty && got.values.forall(_ > 0))
    assert(run(docs.repartition(17)) == got)
    // mass conservation: total piece characters == total corpus word chars
    val totChars = docs
      .select(explode(filter(split(col("text"), "\\s+"), t => length(t) > 0)).as("w"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    val pieceChars = got.map { case (p, n) => p.length.toLong * n }.sum
    assert(pieceChars == totChars, s"$pieceChars vs $totChars")
  }

  test("refine: hard-EM rounds deterministic, coverage kept, zero rounds is identity") {
    val docs  = sources.Tables(spark, SharedSpark.sf001).documents
    val model = Unigram.train(docs, "doc_id", "text", vocabSize = 96, maxPieceLen = 4)
    assert(Unigram.refine(docs, "doc_id", "text", model, rounds = 0).pieces == model.pieces)
    val r1a = Unigram.refine(docs, "doc_id", "text", model, rounds = 1)
    val r1b = Unigram.refine(docs.repartition(13), "doc_id", "text", model, rounds = 1)
    assert(r1a.pieces == r1b.pieces, "refinement is partitioning-deterministic")
    // all single chars survive (coverage guarantee), vocab never grows
    val chars = model.pieces.collect { case (p, _) if p.length == 1 => p }.toSet
    assert(chars.subsetOf(r1a.pieces.map(_._1).toSet))
    assert(r1a.pieces.size <= model.pieces.size, "self-pruning only removes")
    // the refined model still segments the whole corpus without UNK
    val tc = Unigram.tokenCounts(docs, "doc_id", "text", r1a)
      .agg(sum(col("n_pieces"))).collect()(0).getLong(0)
    assert(tc > 0)
  }
}
