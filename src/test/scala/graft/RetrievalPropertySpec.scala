package graft

import scala.util.Random

import graft.operators.{Cdc, Corpus, Retrieval}

/** Randomized invariants for the retrieval / CDC / chunking operators:
  * each distributed pipeline is cross-checked against an independent
  * driver-side computation of the same contract over random inputs. */
class RetrievalPropertySpec extends SparkSpec {

  private def randWords(rnd: Random, n: Int): Seq[String] =
    Seq.fill(n)(Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(6)).toChar).mkString)

  test("chunkDocuments: full coverage, budget respected, overlap exact — random docs") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd       = new Random(3000 + trial)
      val chunkSize = 4 + rnd.nextInt(12)
      val overlap   = rnd.nextInt(chunkSize)
      val stride    = chunkSize - overlap
      val docs = (0L until 40L).map(i => (i, randWords(rnd, rnd.nextInt(40)).mkString(" ")))
      val out = Corpus
        .chunkDocuments(docs.toDF("doc_id", "text"), "doc_id", "text", chunkSize, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

      val byDoc = out.groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) assert(!byDoc.contains(id))
        else {
          val chunks = byDoc(id).sortBy(_._2)
          // chunk ids are contiguous from 0
          assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
          // driver replay: chunk i = toks.slice(i*stride, i*stride + chunkSize)
          chunks.foreach { case (_, cid, textOut, nTok) =>
            val expect = toks.slice((cid * stride).toInt, (cid * stride).toInt + chunkSize)
            assert(textOut == expect.mkString(" "), s"trial $trial doc $id chunk $cid")
            assert(nTok == expect.length)
          }
          // coverage: the last chunk reaches the final token
          val last = chunks.last
          assert(last._2 * stride + last._4 == toks.length, s"trial $trial doc $id tail lost")
        }
      }
    }
  }

  test("fuzzyWordPairs == brute force on random vocabularies") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd   = new Random(4000 + trial)
      val vocab = randWords(rnd, 60).distinct
      val d     = 1 + rnd.nextInt(2)
      val got = Retrieval
        .fuzzyWordPairs(vocab.toDF("word"), "word", d)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      def lev(a: String, b: String): Int = {
        val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(
            math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      val brute = (for {
        a <- vocab; b <- vocab if a < b
        dist = lev(a, b) if dist <= d
      } yield (a, b, dist.toLong)).toSet
      assert(got == brute, s"trial $trial maxDist=$d: FastSS must lose nothing")
      assert(brute.nonEmpty, s"trial $trial degenerate vocabulary")
    }
  }

  test("scd2Apply is idempotent: re-applying the same delta is a no-op") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd = new Random(5000 + trial)
      val ts0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
      val ts1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val current = (0L until 30L)
        .map(k => (k, s"v${rnd.nextInt(4)}", ts0, None: Option[java.sql.Timestamp]))
        .toDF("k", "attr", "valid_from", "valid_to")
      val delta = (0L until 40L by (1 + rnd.nextInt(3)).toLong)
        .map(k => (k, s"v${rnd.nextInt(4)}", ts1))
        .toDF("k", "attr", "ts")

      val once = Cdc.scd2Apply(current, delta, Seq("k"), "ts")
      val twice = Cdc.scd2Apply(once, delta, Seq("k"), "ts")
      def snap(df: org.apache.spark.sql.DataFrame) = df
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), Option(r.getTimestamp(3))))
        .toSet
      assert(snap(twice) == snap(once), s"trial $trial: second application must change nothing")
      // and every key has exactly one open row
      val opens = once.filter(org.apache.spark.sql.functions.col("valid_to").isNull)
        .groupBy("k").count().collect()
      assert(opens.forall(_.getLong(1) == 1), s"trial $trial: open-row uniqueness")
    }
  }

  test("mergeInto: result is exactly base ⊎ delta with delta precedence") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd   = new Random(6000 + trial)
      val base  = (0L until 50L).map(k => (k, rnd.nextInt(100))).toDF("k", "v")
      val delta = (0L until 70L by (1 + rnd.nextInt(4)).toLong).map(k => (k, 1000 + rnd.nextInt(100)))
      val got = Cdc.mergeInto(base, delta.toDF("k", "v"), Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expect = (0L until 50L).map(k => k -> got(k)).toMap // keys preserved
      assert(got.keySet == ((0L until 50L).toSet ++ delta.map(_._1).toSet))
      delta.foreach { case (k, v) => assert(got(k) == v, s"delta wins on $k") }
      assert(expect.size == 50)
    }
  }
}
