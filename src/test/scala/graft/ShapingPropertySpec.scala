package graft

import scala.util.Random

import graft.operators.{Corpus, TimeSeries}

/** Randomized invariants for the corpus-shaping / time-series operators:
  * each distributed pipeline is cross-checked against an independent
  * driver-side computation of the same contract over random inputs. */
class ShapingPropertySpec extends SparkSpec {

  test("quotaPerSource: per-group count = min(quota, group size); survivors are the md5-rank prefix") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd = new Random(2000 + trial)
      val quota = 1 + rnd.nextInt(6)
      val docs = (0L until (20 + rnd.nextInt(60)).toLong)
        .map(i => (i, s"s${rnd.nextInt(5)}"))
      val got = Corpus.quotaPerSource(docs.toDF("doc_id", "source"), "doc_id", "source", quota)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = docs
        .groupBy(_._2)
        .flatMap { case (_, members) =>
          members.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(quota)
        }
        .toSet
      assert(got.toSet == expected, s"trial $trial quota=$quota")
    }
  }

  test("keywordsTopK: agrees with a driver-side tf/df/rank computation") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd = new Random(3000 + trial)
      val vocab = (0 until 12).map(i => s"w$i")
      val k = 1 + rnd.nextInt(4)
      val docs = (0L until 15L).map { i =>
        (i, Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Corpus.keywordsTopK(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val tf = docs.flatMap { case (id, t) =>
        t.split("\\s+").filter(_.nonEmpty).groupBy(identity).map { case (w, o) => (id, w, o.length.toLong) }
      }
      val df = tf.groupBy(_._2).map { case (w, rows) => w -> rows.map(_._1).distinct.size.toLong }
      val expected = tf
        .groupBy(_._1)
        .flatMap { case (_, rows) =>
          rows
            .map { case (id, w, c) => (id, w, c, df(w)) }
            .sortBy { case (_, w, c, d) => (-c, d, w) }
            .take(k)
        }
        .toSet
      assert(got == expected, s"trial $trial k=$k")
    }
  }

  test("gapFill: contiguous grid, count preservation, LOCF totality after first bucket") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd = new Random(4000 + trial)
      val events = (0 until 60).map { _ =>
        val h = rnd.nextInt(48) // two-day window, sparse hours
        (rnd.nextInt(4).toLong,
          java.sql.Timestamp.valueOf(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:${rnd.nextInt(60)}%02d:00"),
          rnd.nextInt(100) / 10.0)
      }
      val out = TimeSeries.gapFill(events.toDF("user_id", "ts", "value"), "user_id", "ts", "value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.isNullAt(4)))
      out.groupBy(_._1).foreach { case (key, rows) =>
        val hours = rows.map(_._2).sorted
        // grid is contiguous at 1h steps from first to last observed bucket
        assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600 * 1000L }, s"key $key grid")
        // zero-filling preserves the raw event count
        assert(rows.map(_._3).sum == events.count(_._1 == key), s"key $key count")
        // LOCF is total: the first bucket is observed, so no row lacks a carried value
        assert(rows.forall(!_._4), s"key $key locf null")
      }
    }
  }
}
