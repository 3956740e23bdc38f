package graft

import org.apache.spark.sql.functions._

import graft.operators.Wordpiece

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("encodeWord: greedy longest-match-first, single-char fallback, whole-word UNK") {
    val pieces = Set("a", "b", "c", "ab", "abc", "bc")
    assert(Wordpiece.encodeWord("abcabc", pieces, 4) == Seq("abc", "abc"))
    // greedy takes 'abc' even though 'ab'+'c...' would also work
    assert(Wordpiece.encodeWord("abcb", pieces, 4) == Seq("abc", "b"))
    // maxPieceLen caps the lookahead: with cap 2 'abc' is unreachable
    assert(Wordpiece.encodeWord("abcabc", pieces, 2) == Seq("ab", "c", "ab", "c"))
    // chars outside the multi-char set fall back to singles
    assert(Wordpiece.encodeWord("cba", pieces, 4) == Seq("c", "b", "a"))
    // a character NEVER seen in training voids the whole word to [UNK]
    // (the BERT contract) — not a silent pass-through of an untrained
    // symbol that the oracle's vocab join would instead drop
    assert(Wordpiece.encodeWord("abxc", pieces, 4) == Seq(Wordpiece.Unk))
    assert(Wordpiece.encodeWord("x", pieces, 4) == Seq(Wordpiece.Unk))
  }

  test("trainVocabFrame: hand-checked weighted frequencies, char coverage, budget cut") {
    // 'xy' appears 3x (as whole word twice via count + once inside xyz):
    // weighted substring freq of "xy" = 2 (from word xy, n=2) + 1 (xyz)
    val docs = Seq((1L, "xy xy xyz"), (2L, "zq")).toDF("doc_id", "text")
    val v = Wordpiece.trainVocabFrame(docs, "doc_id", "text", vocabSize = 6, maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byPiece = v.map(x => x._1 -> x._2).toMap
    // chars: x(3: 2+1), y(3), z(2: xyz+zq), q(1) — all force-included
    assert(byPiece("x") == 3L && byPiece("y") == 3L && byPiece("z") == 2L && byPiece("q") == 1L)
    // budget 6 − 4 chars = 2 multi pieces: 'xy' (freq 3) then ties at 1 → piece ASC
    assert(byPiece("xy") == 3L)
    assert(v.length == 6)
    // ranks are the (freq DESC, piece ASC) order, 1-based and dense
    assert(v.map(_._3).sorted.toSeq == (1 to 6))
  }

  test("train + encodeStats: usage counts conserve corpus mass; token counts per doc") {
    val docs = Seq((1L, "xy xy xyz"), (2L, "zq zq")).toDF("doc_id", "text")
    val model = Wordpiece.train(docs, "doc_id", "text", vocabSize = 8, maxPieceLen = 3)
    assert(model.pieces.nonEmpty && model.pieceSet.contains("x"))
    val stats = Wordpiece.encodeStats(docs, "doc_id", "text", model)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every character of the corpus lands in exactly one used piece:
    // Σ n_uses·len(piece) == total corpus chars (whitespace excluded)
    val massFromPieces = stats.map { case (p, n) => p.length * n }.sum
    assert(massFromPieces == "xyxyxyz".length + "zqzq".length, s"stats $stats")
    val tc = Wordpiece.tokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(tc.map(x => (x._1, x._2)).toSeq == Seq((1L, 3L), (2L, 2L)))
    // pieces per doc ≥ words per doc; equality iff every word is one piece
    tc.foreach { case (_, w, p) => assert(p >= w) }
  }

  test("vocab is deterministic under repartitioning and bounded by vocabSize") {
    val docs = graft.sources.Tables(spark, SharedSpark.sf0001).documents
    val a = Wordpiece.trainVocabFrame(docs, "doc_id", "text", 96, 4).collect().map(_.toSeq)
    val b = Wordpiece.trainVocabFrame(docs.repartition(13), "doc_id", "text", 96, 4).collect().map(_.toSeq)
    assert(a.sortBy(_.toString).sameElements(b.sortBy(_.toString)))
    assert(a.length <= 96)
  }
}
