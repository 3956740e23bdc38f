package graft

import graft.operators.Bpe
import graft.sources.Tables

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val E = Bpe.Eow

  // the classic BPE teaching corpus: hug×10 pug×5 pun×12 bun×4 hugs×5
  private def corpus = {
    val text =
      (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("train: merge sequence matches the hand computation (count desc, pair asc ties)") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    assert(m.merges == Seq(
      ("u", "g"),       // 20
      ("n", E),         // 16, tie vs (u,n) broken toward lexicographically smaller 'n'
      ("u", "n" + E),   // 16
      ("h", "ug"),      // 15, tie vs (ug,</w>) broken toward 'h'
      ("p", "un" + E)   // 12
    ))
  }

  test("encodeWord applies lowest-rank merges first") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    assert(Bpe.encodeWord("hug", m.ranks) == Seq("hug", E))
    assert(Bpe.encodeWord("pun", m.ranks) == Seq("pun" + E))
    assert(Bpe.encodeWord("bug", m.ranks) == Seq("b", "ug", E))
    assert(Bpe.encodeWord("xyz", m.ranks) == Seq("x", "y", "z", E))
  }

  test("tokenCounts: bare end-of-word sentinel is not counted as a token") {
    val m    = Bpe.train(corpus, "text", numMerges = 5)
    val docs = Seq((7L, "hug pun bug xyz")).toDF("doc_id", "text")
    val r    = Bpe.tokenCounts(docs, "doc_id", "text", m).collect().head
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == 4L)           // whitespace words
    assert(r.getLong(2) == 1 + 1 + 2 + 3) // hug=1, pun=1, bug=2, xyz=3
  }

  test("train stops early when no pair repeats") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every pair occurs once — nothing merges no matter how many rounds
    assert(Bpe.train(tiny, "text", numMerges = 10).merges.isEmpty)
  }

  test("training is deterministic and corpus tokenCounts compress vs chars") {
    val docs = Tables(spark, SharedSpark.sf0001).documents
    val m1   = Bpe.train(docs, "text", numMerges = 50)
    val m2   = Bpe.train(docs, "text", numMerges = 50)
    assert(m1.merges == m2.merges, "same corpus, same merge sequence")
    assert(m1.merges.size == 50)
    val out = Bpe.tokenCounts(docs, "doc_id", "text", m1).collect()
    assert(out.nonEmpty)
    // BPE tokens are never more numerous than characters and at least the
    // whitespace word count (merges only ever shrink the symbol stream)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"doc ${r.getLong(0)}: fewer BPE tokens than words")
    }
  }

  test("encode is lossless: tokens concatenate back to the word (round-trip over corpus vocab)") {
    // The detokenize contract a tokenizer must satisfy before any corpus
    // ships through it: merges only ever CONCATENATE adjacent symbols, so
    // stripping the end-of-word sentinel and joining must reproduce the
    // word exactly — for trained words, partially-merged words, and
    // never-seen words alike.
    val m = Bpe.train(Tables(spark, SharedSpark.sf0001).documents, "text", numMerges = 100)
    val vocab = Tables(spark, SharedSpark.sf0001).documents
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", "\\s+")).as("w"))
      .filter($"w" =!= "").distinct().as[String].take(500)
    (vocab ++ Seq("hug", "xyzzy", "", "a")).foreach { w =>
      val back = Bpe.encodeWord(w, m.ranks).mkString.stripSuffix(E)
      assert(back == w, s"round-trip broke: '$w' -> '$back'")
    }
  }

  test("distributed trainer: merge-for-merge identical to the driver trainer") {
    // the teaching corpus (hand-verified sequence incl. tie-breaks)
    val dist = Bpe.trainDistributed(corpus, "text", numMerges = 5)
    assert(dist.merges == Bpe.train(corpus, "text", numMerges = 5).merges)
    // a real corpus, more merges than distinct pairs survive, crossing a
    // checkpoint boundary — and the early-stop rule must agree too
    val docs = Tables(spark, SharedSpark.sf0001).documents
    val driver = Bpe.train(docs, "text", numMerges = 40, maxVocabWords = 1 << 20)
    val spark40 = Bpe.trainDistributed(docs, "text", numMerges = 40, checkpointEvery = 16)
    assert(spark40.merges == driver.merges,
      s"diverged at ${spark40.merges.zip(driver.merges).indexWhere(p => p._1 != p._2)}")
    // token counts served from either model are identical
    val a = Bpe.tokenCounts(docs, "doc_id", "text", driver).collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = Bpe.tokenCounts(docs, "doc_id", "text", spark40).collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == b)
  }
}
