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
}
