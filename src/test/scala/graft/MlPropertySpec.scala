package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Boosting, Corpus, Features}

/** Randomized invariants for the ML-training operators: algebraic
  * properties that must hold on ANY input (non-negativity, monotonicity,
  * leak-freedom), cross-checked over seeded random data. */
class MlPropertySpec extends SparkSpec {
  import spark.implicits._

  test("histSplitGains: gains non-negative (Cauchy-Schwarz), one best per feature, counts partition N") {
    (0 until 3).foreach { trial =>
      val rnd = new Random(4000 + trial)
      val n = 40 + rnd.nextInt(100)
      val df = (0 until n)
        .map(_ => (rnd.nextInt(6).toLong, rnd.nextInt(2)))
        .toDF("b", "y")
      val rows = Boosting.histSplitGains(df, "y", Seq("f" -> col("b"))).collect()
      // variance-reduction gain is >= 0 for every candidate split
      assert(rows.forall(_.getDouble(4) >= 0.0), s"trial $trial: negative gain")
      assert(rows.count(_.getBoolean(5)) == 1, s"trial $trial: best not unique")
      assert(rows.forall(r => r.getLong(2) + r.getLong(3) == n.toLong))
    }
  }

  test("trainStumps: gains non-negative every round, leaves bounded by eta") {
    (0 until 3).foreach { trial =>
      val rnd = new Random(4100 + trial)
      val df = (0 until 60 + rnd.nextInt(60))
        .map(_ => (rnd.nextInt(5).toLong, rnd.nextInt(2)))
        .toDF("b", "y")
      val model = Boosting.trainStumps(df, "y", Seq("f" -> col("b")), rounds = 3, eta = 0.5)
        .collect()
      assert(model.length == 3)
      assert(model.forall(_.getDouble(5) >= 0.0), s"trial $trial: negative round gain")
      // squared-loss leaves are eta * a residual mean; residuals live in
      // [-1, 1], so |leaf| <= eta
      assert(model.forall(r => math.abs(r.getDouble(6)) <= 0.5 && math.abs(r.getDouble(7)) <= 0.5))
    }
  }

  test("chi2Features: non-negative, zero for independent product data, bounded by N*(min(r,c)-1)") {
    (0 until 3).foreach { trial =>
      val rnd = new Random(4200 + trial)
      val df = (0 until 50 + rnd.nextInt(100))
        .map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(2)))
        .toDF("b", "y")
      val n = df.count()
      val r = Features.chi2Features(df, "y", Seq("f" -> col("b"))).collect().head
      val bound = n.toDouble * (math.min(r.getLong(1), 2L) - 1).toDouble
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= bound + 1e-6,
        s"trial $trial: chi2 ${r.getDouble(3)} outside [0, $bound]")
    }
  }

  test("targetEncode: encodings are label-range means; flipping a row never moves its own cell") {
    (0 until 3).foreach { trial =>
      val rnd = new Random(4300 + trial)
      val rows = (0L until (30 + rnd.nextInt(60)).toLong)
        .map(i => (i, s"c${rnd.nextInt(4)}", rnd.nextInt(2)))
      val enc = Features.targetEncode(rows.toDF("id", "c", "y"), "c", "y", "id", folds = 3)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
      assert(enc.values.forall(v => v >= 0.0 && v <= 1.0), s"trial $trial: enc outside [0,1]")
      // flip one random row's label: its own (category, fold) encoding is
      // computed from the OTHER folds, so it cannot move
      val (fid, fcat, fy) = rows(rnd.nextInt(rows.size))
      val flipped = rows.map { case (i, c, y) => if (i == fid) (i, c, 1 - y) else (i, c, y) }
      val enc2 = Features.targetEncode(flipped.toDF("id", "c", "y"), "c", "y", "id", folds = 3)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
      val ownCell = (fcat, fid % 3)
      assert(enc(ownCell) == enc2(ownCell),
        s"trial $trial: own-cell encoding moved after flipping row $fid")
    }
  }

  test("isotonicFit: monotone non-decreasing and mean-preserving pools on random data") {
    (0 until 3).foreach { trial =>
      val rnd = new Random(4400 + trial)
      val df = (0 until 80 + rnd.nextInt(120))
        .map(_ => (rnd.nextDouble(), rnd.nextInt(2)))
        .toDF("score", "y")
      val out = Corpus.isotonicFit(df, "score", "y", bins = 10)
        .orderBy(col("bin")).collect()
      val iso = out.map(_.getDouble(4))
      assert(iso.zip(iso.tail).forall { case (a, b) => a <= b }, s"trial $trial: not monotone")
      assert(iso.forall(v => v >= -1e-9 && v <= 1.0 + 1e-9))
      // PAV preserves the weighted mean: sum(n*iso) == sum(pos) up to grid error
      val lhs = out.map(r => r.getLong(1) * r.getDouble(4)).sum
      val rhs = out.map(_.getLong(2).toDouble).sum
      assert(math.abs(lhs - rhs) < 1e-3 * out.length, s"trial $trial: mean not preserved ($lhs vs $rhs)")
    }
  }
}
