package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — the storage-side
  * lever that matters most at 100 TB: a parquet lake is read through
  * per-file zone maps (min/max column stats), and the fraction of files a
  * range predicate can SKIP is decided entirely by how rows were sorted
  * before writing. A lexicographic sort prunes only the leading column;
  * Z-ORDERING (Morton order — interleaving the bits of the sort keys)
  * keeps every dimension's locality at once, which is why Delta/Iceberg
  * expose it as their multi-dim clustering primitive.
  *
  * Everything here is exact integer arithmetic on codegen'd expressions:
  * [[zValue]] is a statically UNROLLED OR-chain of shift/mask terms (no
  * lambda, no UDF — whole-stage codegen keeps it in the scan stage), and
  * the [[zoneMapAudit]] is two grouped aggregations over bucket ids
  * derived from the same value. No reference counterpart (SURVEY.md §2e
  * extension family — storage/layout).
  */
object Layout {

  /** Morton/Z-value of two non-negative coordinates, `bits` bits each:
    * x's bit i lands at position 2i, y's at 2i+1. Inputs are masked to
    * `bits` bits first (callers hash or bucket wider domains down — the
    * masking is part of the contract, not an overflow hazard). The
    * result fits 2·bits ≤ 62 bits of a long. Statically unrolled:
    * 2·bits shift/mask/or terms, all literals — one codegen'd
    * expression, scan-stage cheap. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val mask = (1L << bits) - 1
    val xm   = x.cast("long").bitwiseAND(lit(mask))
    val ym   = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Zone-map pruning audit: how many buckets (stand-ins for parquet
    * files) a 2-D range predicate must touch under (a) Z-order layout vs
    * (b) lexicographic (x, y) layout, at the same bucket count. For each
    * layout rows are bucketed by the TOP `bucketBits` bits of their
    * 2·bits-wide layout key, each bucket keeps min/max zone stats per
    * dimension, and a bucket is touched iff its [min,max]×[min,max] box
    * intersects the query rectangle — exactly the skipping decision a
    * reader makes from footer stats. Output one row per layout:
    * (layout, n_buckets, buckets_touched, rows_in_touched, rows_matching)
    * — rows_matching is layout-independent (the true result size);
    * rows_in_touched / rows_matching is the read amplification. All
    * counts exact integers.
    *
    * Scale: two map-side-combined aggregations over a narrow projection;
    * the zone-map table is bucket-sized (≤ 2^bucketBits rows). The audit
    * is the MEASUREMENT; an actual lake write would `repartitionByRange`
    * on the chosen key and write per-partition files whose footer stats
    * realize exactly these zone maps. */
  def zoneMapAudit(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      bucketBits: Int,
      x0: Long, x1: Long, y0: Long, y1: Long): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits, s"bucketBits must be 1..${2 * bits}")
    val mask = (1L << bits) - 1
    val base = df.select(
      col(xCol).cast("long").bitwiseAND(lit(mask)).as("x"),
      col(yCol).cast("long").bitwiseAND(lit(mask)).as("y"))
    val shift = 2 * bits - bucketBits
    val keyed = base.select(
      col("x"), col("y"),
      shiftrightunsigned(zValue(col("x"), col("y"), bits), shift).as("b_zorder"),
      shiftrightunsigned(shiftleft(col("x"), bits).bitwiseOR(col("y")), shift).as("b_lex"),
      (col("x").between(x0, x1) && col("y").between(y0, y1)).as("hit"))
    def audit(bCol: String, name: String): DataFrame =
      keyed
        .groupBy(col(bCol).as("b"))
        .agg(
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          count(lit(1)).as("n_rows"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"))
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(when(col("min_x") <= x1 && col("max_x") >= x0 &&
            col("min_y") <= y1 && col("max_y") >= y0, 1L).otherwise(0L)).as("buckets_touched"),
          sum(when(col("min_x") <= x1 && col("max_x") >= x0 &&
            col("min_y") <= y1 && col("max_y") >= y0, col("n_rows")).otherwise(0L)).as("rows_in_touched"),
          sum(col("n_hit")).as("rows_matching"))
        .select(lit(name).as("layout"), col("n_buckets"), col("buckets_touched"),
          col("rows_in_touched"), col("rows_matching"))
    audit("b_zorder", "zorder").unionAll(audit("b_lex", "lex")).orderBy(col("layout").desc)
  }

  /** Hilbert index of two non-negative coordinates, `bits` bits each — the
    * space-filling curve with strictly better locality than Morton (every
    * curve step is an ADJACENT cell, so bucket bounding boxes stay tighter
    * and range scans touch fewer files; BigQuery/Iceberg adopted it over
    * Z-order for exactly this). Computed as a 4-state machine over the
    * quadrant digits from the top bit down — the classic xy2d rotation
    * algorithm refactored so the per-level expression carries ONE state
    * column instead of rotated coordinates (the naive form doubles the
    * expression tree per level; the state form grows linearly and stays
    * inside whole-stage codegen). digit/next tables are literal arrays
    * (validated exhaustively against the textbook xy2d on the full 8-bit
    * grid in LayoutSpec); element_at is 1-based on both engines, so the
    * same chain replays verbatim in SQL. */
  def hValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val mask = (1L << bits) - 1
    val xm   = x.cast("long").bitwiseAND(lit(mask))
    val ym   = y.cast("long").bitwiseAND(lit(mask))
    // state tables: q = 2*xb + yb; states 0..3 from the validated
    // (axis_u, neg_u, axis_v, neg_v) group closure
    val dTab = Seq(0L, 1L, 3L, 2L, 2L, 3L, 1L, 0L, 0L, 3L, 1L, 2L, 2L, 1L, 3L, 0L)
    val nTab = Seq(2L, 0L, 3L, 0L, 1L, 2L, 1L, 3L, 0L, 1L, 2L, 2L, 3L, 3L, 0L, 1L)
    val dArr = typedLit(dTab)
    val nArr = typedLit(nTab)
    var state: Column = lit(0L)
    var d: Column     = lit(0L)
    for (i <- bits - 1 to 0 by -1) {
      val q = shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 1)
        .bitwiseOR(shiftright(ym, i).bitwiseAND(lit(1L)))
      val key = (state * 4 + q + 1).cast("int")
      d = d * 4 + element_at(dArr, key)
      state = element_at(nArr, key)
    }
    d
  }

  /** [[zoneMapAudit]] extended with the Hilbert layout — the three-way
    * read-amplification comparison (hilbert vs zorder vs lex) a lake
    * owner runs before picking the clustering key. Same exact-integer
    * audit; one extra bucket-keyed aggregation. */
  def zoneMapAuditHilbert(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      bucketBits: Int,
      x0: Long, x1: Long, y0: Long, y1: Long): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits, s"bucketBits must be 1..${2 * bits}")
    val mask = (1L << bits) - 1
    val base = df.select(
      col(xCol).cast("long").bitwiseAND(lit(mask)).as("x"),
      col(yCol).cast("long").bitwiseAND(lit(mask)).as("y"))
    val shift = 2 * bits - bucketBits
    val keyed = base.select(
      col("x"), col("y"),
      shiftrightunsigned(hValue(col("x"), col("y"), bits), shift).as("b_hilbert"),
      shiftrightunsigned(zValue(col("x"), col("y"), bits), shift).as("b_zorder"),
      shiftrightunsigned(shiftleft(col("x"), bits).bitwiseOR(col("y")), shift).as("b_lex"),
      (col("x").between(x0, x1) && col("y").between(y0, y1)).as("hit"))
    def audit(bCol: String, name: String): DataFrame =
      keyed
        .groupBy(col(bCol).as("b"))
        .agg(
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          count(lit(1)).as("n_rows"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"))
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(when(col("min_x") <= x1 && col("max_x") >= x0 &&
            col("min_y") <= y1 && col("max_y") >= y0, 1L).otherwise(0L)).as("buckets_touched"),
          sum(when(col("min_x") <= x1 && col("max_x") >= x0 &&
            col("min_y") <= y1 && col("max_y") >= y0, col("n_rows")).otherwise(0L)).as("rows_in_touched"),
          sum(col("n_hit")).as("rows_matching"))
        .select(lit(name).as("layout"), col("n_buckets"), col("buckets_touched"),
          col("rows_in_touched"), col("rows_matching"))
    audit("b_hilbert", "hilbert")
      .unionAll(audit("b_zorder", "zorder"))
      .unionAll(audit("b_lex", "lex"))
      .orderBy(col("layout"))
  }
}
