package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: hand-interleaved closed forms, masking, monotone tiles") {
    val df = Seq((3L, 5L), (0L, 0L), (7L, 7L), (4L, 1L)).toDF("x", "y")
    val z = df.select(Layout.zValue(col("x"), col("y"), bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3=011, 5=101): x bits at 0,2,4 -> 1+4+0; y bits at 1,3,5 -> 2+0+32 = 39
    // (7,7) -> all six low bits set = 63; (4=100, 1=001) -> x at pos4=16, y at pos1=2
    assert(z == Seq(39L, 0L, 63L, 18L), z.toString)
    // masking: coordinates beyond `bits` wrap to their low bits
    val m = Seq((8L + 3L, 8L + 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 3).as("z"))
      .collect().head.getLong(0)
    assert(m == 39L, m.toString)
  }

  test("zoneMapAudit: on a full 32x32 grid an aligned 8x8 query touches 1 z-tile but 4 lex stripes") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    // bits=5 -> 10-bit z; bucketBits=4 -> 16 buckets of 64 consecutive
    // z-values = aligned 8x8 tiles; lex buckets are 2-x-row stripes
    val r = Layout.zoneMapAudit(grid, "x", "y", bits = 5, bucketBits = 4,
      x0 = 0L, x1 = 7L, y0 = 0L, y1 = 7L)
      .collect().map(row => row.getString(0) ->
        ((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)))).toMap
    assert(r("zorder") == ((16L, 1L, 64L, 64L)), r.toString)
    assert(r("lex") == ((16L, 4L, 256L, 64L)), r.toString)
  }

  test("hValue equals textbook xy2d exhaustively; consecutive indexes are grid-adjacent") {
    import spark.implicits._
    def xy2d(n: Int, x0: Int, y0: Int): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val bits = 6
    val n    = 1 << bits
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = grid.select(col("x"), col("y"), Layout.hValue(col("x"), col("y"), bits).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (x <- 0 until n; y <- 0 until n)
      assert(got((x.toLong, y.toLong)) == xy2d(n, x, y), s"($x,$y)")
    // the curve property z-order lacks: every step moves to an ADJACENT cell
    val byD = got.toSeq.map { case ((x, y), d) => d -> ((x, y)) }.sortBy(_._1)
    assert(byD.map(_._1) == (0L until n.toLong * n).toSeq, "bijection onto 0..n^2-1")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"non-adjacent step at ($x1,$y1)->($x2,$y2)")
    }
  }

  test("zoneMapAuditHilbert: hilbert never reads more than lex on an aligned square, all arms agree on truth") {
    import spark.implicits._
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)).toDF("x", "y")
    val r = Layout.zoneMapAuditHilbert(grid, "x", "y", bits = 5, bucketBits = 4,
      x0 = 0L, x1 = 7L, y0 = 0L, y1 = 7L)
      .collect().map(row => row.getString(0) ->
        ((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)))).toMap
    // the aligned 8x8 square is exactly one quadrant-of-quadrant: hilbert,
    // like zorder, isolates it in ONE bucket; lex smears it across 4
    assert(r("hilbert") == ((16L, 1L, 64L, 64L)), r.toString)
    assert(r("zorder") == ((16L, 1L, 64L, 64L)), r.toString)
    assert(r("lex") == ((16L, 4L, 256L, 64L)), r.toString)
    assert(r.values.map(_._4).toSet.size == 1, "rows_matching is layout-independent")
  }

}
