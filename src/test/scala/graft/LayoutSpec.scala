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
}
