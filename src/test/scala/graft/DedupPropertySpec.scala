package graft

import scala.util.Random

import graft.operators.Dedup

/** Randomized cross-check: the distributed shingle/hash/join pipeline must
  * agree pair-for-pair and value-for-value with an independent brute-force
  * O(n²) Scala implementation of trigram Jaccard, over corpora with planted
  * near-duplicates. */
class DedupPropertySpec extends SparkSpec {

  private def trigrams(text: String): Set[Seq[String]] = {
    val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.length < 3) Set.empty else toks.sliding(3).map(_.toSeq).toSet
  }

  private def bruteForcePairs(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), Double] =
    (for {
      (ai, at) <- docs
      (bi, bt) <- docs
      if ai < bi
      sa = trigrams(at)
      sb = trigrams(bt)
      if sa.nonEmpty && sb.nonEmpty
      shared = sa.intersect(sb).size
      jacc   = shared.toDouble / (sa.size + sb.size - shared)
      if jacc >= t
    } yield (ai, bi) -> jacc).toMap

  test("jaccardPairs == brute-force reference on random corpora with planted dups") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd   = new Random(1000 + trial)
      val vocab = (0 until 25).map(i => s"w$i")
      def doc() = Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = (0L until 20L).map(i => (i, doc()))
      // plant near-dups: copies with one token appended
      val dups = base.take(5).map { case (i, t) => (100L + i, t + " " + vocab(rnd.nextInt(vocab.size))) }
      val docs = base ++ dups

      val expected = bruteForcePairs(docs, 0.5)
      val got = Dedup
        .jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap

      assert(got.keySet == expected.keySet, s"trial $trial pair sets differ")
      got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-12, s"trial $trial $k") }
      assert(expected.nonEmpty, s"trial $trial should have planted pairs")
    }
  }

  test("minhashDupPairs agrees with jaccardPairs on the same random corpora") {
    import spark.implicits._
    val rnd   = new Random(77)
    val vocab = (0 until 20).map(i => s"t$i")
    def doc() = Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 15L).map(i => (i, doc()))
    val dups = base.take(4).map { case (i, t) => (200L + i, t) } // exact copies
    val df   = (base ++ dups).toDF("doc_id", "text")

    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    val exact = asMap(Dedup.jaccardPairs(df, "doc_id", "text", 0.8).collect())
    val mh    = asMap(Dedup.minhashDupPairs(df, "doc_id", "text", 0.8).collect())
    assert(exact == mh)
    assert(exact.nonEmpty)
  }
}
