package graft

import org.apache.spark.sql.functions._

import graft.operators.Features

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncode: out-of-fold means, single-fold categories fall back to the fold prior") {
    // A: fold0 = {y=1, y=1}, fold1 = {y=0}; B: fold1 = {y=1}
    val df = Seq(("A", 0L, 1), ("A", 2L, 1), ("A", 1L, 0), ("B", 3L, 1)).toDF("c", "id", "y")
    val got = Features.targetEncode(df, "c", "y", "id", folds = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // enc(A, f0) excludes fold0: mean of {0} = 0; enc(A, f1) = mean of {1,1} = 1
    assert(got(("A", 0L)) == ((1L, 0.0)), got.toString)
    assert(got(("A", 1L)) == ((2L, 1.0)))
    // B only lives in fold1: f0 sees its fold1 row; f1 has no out-of-fold
    // B rows and takes the fold-1 global prior (3-1)/(4-2) = 1.0
    assert(got(("B", 0L)) == ((1L, 1.0)))
    assert(got(("B", 1L)) == ((0L, 1.0)))
    // no row's own label can reach its encoding: flipping a row's y never
    // changes its own (category, fold) cell
    val flipped = Seq(("A", 0L, 0), ("A", 2L, 1), ("A", 1L, 0), ("B", 3L, 1)).toDF("c", "id", "y")
    val g2 = Features.targetEncode(flipped, "c", "y", "id", folds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(g2(("A", 1L)) == 0.5) // other folds changed...
    assert(g2(("A", 0L)) == 0.0) // ...its own fold's encoding ignores it
  }

  test("chi2Features: perfect association scores N, independence scores 0, zero cells count") {
    val perfect = Seq((1L, 0), (1L, 0), (2L, 1), (2L, 1)).toDF("b", "y")
    val p = Features.chi2Features(perfect, "y", Seq("f" -> col("b"))).collect().head
    assert((p.getString(0), p.getLong(1), p.getLong(2), p.getDouble(3)) == (("f", 2L, 1L, 4.0)),
      p.toString)
    val indep = Seq((1L, 0), (1L, 1), (2L, 0), (2L, 1)).toDF("b", "y")
    val i = Features.chi2Features(indep, "y", Seq("f" -> col("b"))).collect().head
    assert(i.getDouble(3) == 0.0, i.toString)
    // ranking: the perfect feature outranks the constant-ish one
    val both = Seq((1L, 9L, 0), (1L, 9L, 0), (2L, 9L, 1), (2L, 10L, 1)).toDF("b1", "b2", "y")
    val r = Features.chi2Features(both, "y", Seq("weak" -> col("b2"), "strong" -> col("b1")))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("strong", "weak"), r.toString)
  }

  test("olsFit: exact line recovered, r2=1; noisy closed form; degenerate groups yield NULL not NaN") {
    // perfect line y = 3x + 7 -> slope 3, intercept 7, r2 = 1 exactly
    val line = Seq(("g", 1L, 10L), ("g", 2L, 13L), ("g", 3L, 16L), ("g", 4L, 19L))
      .toDF("grp", "x", "y")
    val l = Features.olsFit(line, "grp", col("x"), col("y")).collect().head
    assert((l.getLong(1), l.getDouble(2), l.getDouble(3), l.getDouble(4)) == ((4L, 3.0, 7.0, 1.0)),
      l.toString)
    // hand-checked: (1,1),(2,2),(3,2) -> slope 0.5, intercept 2/3, r2 = 0.75
    val noisy = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 2L)).toDF("grp", "x", "y")
    val n = Features.olsFit(noisy, "grp", col("x"), col("y")).collect().head
    assert(n.getDouble(2) == 0.5 && n.getDouble(3) == 0.666667 && n.getDouble(4) == 0.75,
      n.toString)
    // constant x: den = 0 -> slope/intercept/r2 all NULL
    val cx = Seq(("g", 5L, 1L), ("g", 5L, 9L)).toDF("grp", "x", "y")
    val c = Features.olsFit(cx, "grp", col("x"), col("y")).collect().head
    assert(c.isNullAt(2) && c.isNullAt(3) && c.isNullAt(4), c.toString)
    // constant y: slope 0, r2 NULL (zero variance to explain)
    val cy = Seq(("g", 1L, 4L), ("g", 2L, 4L)).toDF("grp", "x", "y")
    val k = Features.olsFit(cy, "grp", col("x"), col("y")).collect().head
    assert(k.getDouble(2) == 0.0 && k.getDouble(3) == 4.0 && k.isNullAt(4), k.toString)
    // two groups come back sorted by key
    val two = line.union(cy.withColumn("grp", lit("a")))
    val ks = Features.olsFit(two, "grp", col("x"), col("y")).collect().map(_.getString(0)).toSeq
    assert(ks == Seq("a", "g"), ks.toString)
  }

  test("ridgeFit: lambda=0 recovers an exact planted fit; huge lambda shrinks slopes to the mean model") {
    import spark.implicits._
    // y = x1 + 2*x2 exactly, features not collinear -> OLS (lambda=0) is exact
    val df = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 6L), (6L, 5L))
      .map { case (x1, x2) => ("z", x1, x2, x1 + 2 * x2) }
      .toDF("g", "x1", "x2", "y")
    val r0 = Features.ridgeFit(df, "g", col("x1"), col("x2"), col("y"), lambda = 0.0)
      .collect().head
    assert(r0.getString(0) == "z" && r0.getLong(1) == 6L)
    assert(r0.getDouble(2) == 0.0 && r0.getDouble(3) == 1.0 && r0.getDouble(4) == 2.0, r0.toString)
    // ridge path: slopes shrink monotonically toward 0, intercept toward mean(y)=10.5
    val rBig = Features.ridgeFit(df, "g", col("x1"), col("x2"), col("y"), lambda = 1e12)
      .collect().head
    assert(math.abs(rBig.getDouble(3)) < 1e-4 && math.abs(rBig.getDouble(4)) < 1e-4, rBig.toString)
    assert(math.abs(rBig.getDouble(2) - 10.5) < 1e-3, rBig.toString)
    val rMid = Features.ridgeFit(df, "g", col("x1"), col("x2"), col("y"), lambda = 100.0)
      .collect().head
    assert(rMid.getDouble(3) > 0.0 && rMid.getDouble(3) < 1.0, rMid.toString)
    assert(rMid.getDouble(4) > 0.0 && rMid.getDouble(4) < 2.0, rMid.toString)
  }

  test("conformalInterval: planted residual ladder gives the exact order-statistic q and coverage") {
    import spark.implicits._
    // train: y = 5 + 2x exactly -> slope/intercept recovered on the grid
    val train = (1 to 20).map(x => (x.toLong, 5L + 2L * x, 0L))
    // calib |residuals|: 3,2,1,0,1,2,3,4,5,10 -> sorted 0,1,1,2,2,3,3,4,5,10
    val calErr = Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L, 4L, 5L, 10L)
    val calib  = calErr.zipWithIndex.map { case (e, i) => ((i + 1).toLong, 5L + 2L * (i + 1) + e, 1L) }
    // test |residuals|: 0,4,5,6,7 -> covered at q=5: three of five
    val tstErr = Seq(0L, 4L, -5L, 6L, -7L)
    val test   = tstErr.zipWithIndex.map { case (e, i) => ((i + 1).toLong, 5L + 2L * (i + 1) + e, 2L) }
    val df = (train ++ calib ++ test).toDF("x", "y", "s")
    // alpha = 0.2: k = ceil(11 * 0.8) = 9 -> q = 9th smallest = 5
    val r = Features.conformalInterval(df, col("x"), col("y"), col("s"), alpha = 0.2)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((20L, 10L, 5L)), r.toString)
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 2.0, r.toString)
    assert(r.getDouble(5) == 5.0, r.toString)
    assert(r.getDouble(6) == 0.6, r.toString)
    assert(r.getDouble(7) == 10.0, r.toString)
    // alpha = 0.1: k = ceil(11 * 0.9) = 10 -> q = 10 covers everything
    val r2 = Features.conformalInterval(df, col("x"), col("y"), col("s"), alpha = 0.1)
      .collect().head
    assert(r2.getDouble(5) == 10.0 && r2.getDouble(6) == 1.0, r2.toString)
  }

}
