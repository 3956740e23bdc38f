package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Sketch/approximate aggregates — the 100 TB answer to "how many distinct
  * users" and "what's the p99" when exact answers would shuffle the world.
  *
  * No reference counterpart (SURVEY.md §2e). Built on Spark's Datasketches
  * HLL (mergeable binary sketches — partial-aggregates map-side, unions
  * across partitions/days/tables) and percentile_approx (distributed
  * QuantileSummaries, driver never sees raw rows).
  *
  * The mergeability is the point: daily sketch cubes persisted once can
  * answer any-date-range distinct counts by union, never re-reading events.
  */
object Sketches {

  /** Per-group HLL distinct estimate (one pass, map-side partial agg).
    * `lgConfigK` sizes the Datasketches registers (2^lgK); below ~3/4·2^lgK
    * distinct per group the sketch is still in its coupon (exact) regime
    * and the estimate is the exact count — which is what makes the gate
    * query hash-checkable against an exact-COUNT(DISTINCT) oracle at the
    * test scale factors, while the same code path degrades gracefully to
    * ~1/sqrt(2^lgK) relative error at production cardinality (SketchSpec
    * pins that envelope). Every emitted column is oracle-checkable; for an
    * HLL++ estimate use Spark's `approx_count_distinct` directly (no exact
    * regime, so it stays out of this verified surface), and for a
    * cross-engine-replayable estimate use [[portableDistinct]]. */
  def distinctCounts(df: DataFrame, groupCol: String, idCol: String, lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col(idCol), lit(lgConfigK))).as("hll_distinct"),
        count(lit(1)).as("n_rows"))

  /** Daily sketch cube: one mergeable HLL binary per (day, group). At scale
    * this is written to storage once per day — the reusable aggregate. */
  def dailySketches(df: DataFrame, tsCol: String, groupCol: String, idCol: String, lgConfigK: Int = 12): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"), col(groupCol))
      .agg(hll_sketch_agg(col(idCol), lit(lgConfigK)).as("sketch"))

  /** Re-aggregate a sketch cube to per-group totals: sketches UNION instead
    * of re-scanning raw data — distinct-over-any-range from stored state. */
  def unionSketches(cube: DataFrame, groupCol: String): DataFrame =
    cube
      .groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_total"))

  /** Distributed approximate quantiles (QuantileSummaries): bounded-memory
    * mergeable summaries, relative-error `accuracy` knob. */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: Column, qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        percentile_approx(valueCol, array(qs.map(lit): _*), lit(accuracy)).as("quantiles"),
        count(lit(1)).as("n_rows"))

  /** Long-form quantiles: one row per (group, q, value) — same sketch pass
    * as [[approxQuantiles]], with the array unpivoted via posexplode so the
    * output is all-scalar (sortable/hashable by any downstream harness; the
    * array form crashed the r1 oracle compare). */
  def approxQuantilesLong(df: DataFrame, groupCol: String, valueCol: Column, qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    approxQuantiles(df, groupCol, valueCol, qs, accuracy)
      .select(
        col(groupCol),
        col("n_rows"),
        posexplode(col("quantiles")).as(Seq("pos", "value")))
      .select(
        col(groupCol),
        element_at(array(qs.map(lit): _*), col("pos") + 1).as("q"),
        col("value"),
        col("n_rows"))

  /** PORTABLE HLL: register-level HyperLogLog over the engine-independent
    * [[graft.functions.TextFunctions.mix64]] hash — unlike the
    * Datasketches/HLL++ aggregates above, the ESTIMATE itself is part of
    * the cross-engine contract: any engine replaying splitmix64 + the
    * register max + the Flajolet harmonic estimator reproduces it bit for
    * bit, in the DENSE (approximate) regime, not just a small-n exact
    * mode. That makes stored sketch estimates auditable by an external
    * system — the property the gate query hash-checks against a full
    * DuckDB register replay.
    *
    * Estimator spelled for exact replay: S = Σ 2^(rmax−r) summed EXACTLY
    * over all 2^p registers (BigInt — the harmonic sum's float ordering
    * is the classic nondeterminism trap, dodged by integer arithmetic),
    * raw = alpha·m·m·2^rmax / S with a fixed left-to-right op order, the
    * standard linear-counting small-range correction (m·ln(m/V) — ln
    * agreement to the rounding grid is the same cross-libm contract
    * corpus_dsir_weights relies on), and the result rounded HALF_UP to
    * 1e-6. Map-side partial agg: the buffer is the m-byte register array,
    * merge = elementwise max (order-free). */
  private[graft] def hllReduce(p: Int, regs: Array[Byte], h: Long): Array[Byte] = {
    val bucket = (h >>> (64 - p)).toInt
    val w      = h << p
    val rho    = if (w == 0L) 65 - p else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
    regs
  }

  private[graft] def hllMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** The replayable estimator over a register array — see [[PortableHllAgg]]
    * for the op-order contract. */
  private[graft] def hllEstimate(regs: Array[Byte]): Double = {
    val m    = regs.length
    var rmax = 0
    var i    = 0
    while (i < m) { if (regs(i) > rmax) rmax = regs(i); i += 1 }
    var s     = BigInt(0)
    var zeros = 0
    i = 0
    while (i < m) {
      s += BigInt(1) << (rmax - regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697 else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m * math.pow(2.0, rmax) / s.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    java.math.BigDecimal.valueOf(est).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  }

  final class PortableHllAgg(p: Int) extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Byte], Double] {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    override def zero: Array[Byte]                                = new Array[Byte](1 << p)
    override def reduce(regs: Array[Byte], h: Long): Array[Byte]  = hllReduce(p, regs, h)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = hllMerge(a, b)
    override def finish(regs: Array[Byte]): Double                = hllEstimate(regs)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Double]      = Encoders.scalaDouble
  }

  /** [[PortableHllAgg]] variant that emits the RAW register array — the
    * persistable mergeable artifact: daily register blobs written once can
    * answer any-range distinct counts by [[PortableHllUnionAgg]] without
    * re-reading events, and any engine replaying splitmix64 can both
    * rebuild and CHECK the stored registers byte for byte (the Datasketches
    * blob above is opaque by comparison). */
  final class PortableHllRegsAgg(p: Int) extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    override def zero: Array[Byte]                                = new Array[Byte](1 << p)
    override def reduce(regs: Array[Byte], h: Long): Array[Byte]  = hllReduce(p, regs, h)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = hllMerge(a, b)
    override def finish(regs: Array[Byte]): Array[Byte]           = regs
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union of stored portable register blobs → estimate: elementwise max
    * (order-free, idempotent) then the same replayable estimator. */
  final class PortableHllUnionAgg(p: Int) extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], Double] {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    override def zero: Array[Byte] = new Array[Byte](1 << p)
    override def reduce(a: Array[Byte], regs: Array[Byte]): Array[Byte] = {
      require(regs.length == a.length, s"register width mismatch: ${regs.length} vs ${a.length}")
      hllMerge(a, regs)
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = hllMerge(a, b)
    override def finish(regs: Array[Byte]): Double                  = hllEstimate(regs)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Double]      = Encoders.scalaDouble
  }

  /** Per-group portable-HLL distinct estimate (see [[PortableHllAgg]]):
    * (group, hll_portable, n_rows). Ids must be non-negative longs (the
    * cross-engine replay reads them as unsigned). */
  def portableDistinct(df: DataFrame, groupCol: String, idCol: String, p: Int = 12): DataFrame = {
    val agg = udaf(new PortableHllAgg(p), Encoders.scalaLong)
    df.groupBy(col(groupCol))
      .agg(
        agg(graft.functions.TextFunctions.mix64(col(idCol).cast("long"))).as("hll_portable"),
        count(lit(1)).as("n_rows"))
  }

  /** Daily portable-register cube: one mergeable m-byte blob per
    * (day, group) — the persist-once artifact behind any-date-range
    * distinct queries. */
  def portableDailyCube(df: DataFrame, tsCol: String, groupCol: String, idCol: String, p: Int = 12): DataFrame = {
    val agg = udaf(new PortableHllRegsAgg(p), Encoders.scalaLong)
    df.groupBy(to_date(col(tsCol)).as("day"), col(groupCol))
      .agg(agg(graft.functions.TextFunctions.mix64(col(idCol).cast("long"))).as("regs"))
  }

  /** Re-aggregate a portable cube to per-group estimates — registers union
    * by elementwise max, so union-of-days ≡ single global pass BIT FOR BIT
    * (SketchSpec pins the equality; the gate oracle replays the global
    * build, which by that identity is also the union's contract). */
  def portableUnion(cube: DataFrame, groupCol: String, p: Int = 12): DataFrame = {
    val agg = udaf(new PortableHllUnionAgg(p), Encoders.BINARY)
    cube.groupBy(col(groupCol)).agg(agg(col("regs")).as("distinct_est"))
  }

  // ------------------------------------------------------ portable Bloom

  /** Kirsch-Mitzenmacher double hashing over the portable splitmix64
    * finalizer: bit_j(x) = top `logBits` bits of (h1 + j·h2) mod 2⁶⁴,
    * h1 = mix64(x), h2 = mix64(x ⊕ φ) | 1 (odd ⇒ the j-progression walks
    * the full 2⁶⁴ ring). Every step is wrapping 64-bit integer arithmetic
    * an external engine replays exactly (the mix64/HUGEINT machinery the
    * portable-HLL oracle already exercises) — so membership ANSWERS,
    * including the deterministic false positives, are part of the
    * cross-engine contract, not just an error envelope. */
  private[graft] val BloomGolden = 0x9e3779b97f4a7c15L
  private[graft] def bloomBitPositions(key: Long, logBits: Int, nHashes: Int): Array[Int] = {
    val h1 = graft.functions.Mix64.mix(key)
    val h2 = graft.functions.Mix64.mix(key ^ BloomGolden) | 1L
    Array.tabulate(nHashes)(j => ((h1 + j.toLong * h2) >>> (64 - logBits)).toInt)
  }

  /** Mergeable Bloom filter over long keys: buffer is the fixed 2^logBits
    * bit array (2^logBits/8 bytes), reduce sets `nHashes` bits, merge is
    * bytewise OR (order-free, idempotent — duplicate and re-partitioned
    * inserts cannot change the filter). Map-side partial aggregation keeps
    * the shuffle at one filter per partition regardless of key count. */
  final class PortableBloomAgg(logBits: Int, nHashes: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Byte], Array[Byte]] {
    require(logBits >= 3 && logBits <= 30, s"logBits must be in [3,30], got $logBits")
    require(nHashes >= 1 && nHashes <= 16, s"nHashes must be in [1,16], got $nHashes")
    override def zero: Array[Byte] = new Array[Byte]((1 << logBits) / 8)
    override def reduce(buf: Array[Byte], key: Long): Array[Byte] = {
      bloomBitPositions(key, logBits, nHashes).foreach { b =>
        buf(b >>> 3) = (buf(b >>> 3) | (1 << (b & 7))).toByte
      }
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ------------------------------------------------- portable count-min

  /** Count-min bucket for hash row r: the splitmix64 finalizer over
    * key ⊕ seed_r with seed_r = r+1 golden-ratio steps (wrapping — the
    * same derandomized-seed discipline as the Bloom/DSIR chains), top
    * `logW` bits. Pure wrapping 64-bit arithmetic, replayable in HUGEINT
    * SQL. */
  private[graft] def cmsBucket(key: Long, r: Int, logW: Int): Int =
    (graft.functions.Mix64.mix(key ^ (BloomGolden * (r + 1).toLong)) >>> (64 - logW)).toInt

  /** Mergeable count-min sketch over long keys (Cormode & Muthukrishnan
    * 2005): buffer is the fixed depth × 2^logW counter matrix, reduce
    * adds 1 at one bucket per row, merge is entrywise addition —
    * order-free and linear, so map-side partial aggregation keeps the
    * shuffle at one matrix per partition regardless of stream length,
    * and sketches of disjoint shards merge exactly (the distributed
    * heavy-hitter / frequency-serving shape). Point estimates are
    * min over rows — always ≥ the true count, never an undercount. */
  final class PortableCmsAgg(logW: Int, depth: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
    require(logW >= 3 && logW <= 24, s"logW must be in [3,24], got $logW")
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    override def zero: Array[Long] = new Array[Long](depth << logW)
    override def reduce(buf: Array[Long], key: Long): Array[Long] = {
      var r = 0
      while (r < depth) { buf((r << logW) + cmsBucket(key, r, logW)) += 1L; r += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Point estimate from a counter matrix: min over the depth rows. */
  private[graft] def cmsEstimate(counters: Array[Long], key: Long, logW: Int, depth: Int): Long = {
    var best = Long.MaxValue
    var r    = 0
    while (r < depth) {
      val c = counters((r << logW) + cmsBucket(key, r, logW))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Build the count-min matrix over a key column — ONE aggregate row of
    * depth·2^logW longs (model-bounded: the matrix IS the model). */
  def cmsBuild(df: DataFrame, keyCol: String, logW: Int = 10, depth: Int = 4): Array[Long] = {
    val agg = udaf(new PortableCmsAgg(logW, depth), Encoders.scalaLong)
    df.select(col(keyCol).cast("long").as("k")).agg(agg(col("k")).as("m"))
      .collect()(0).getAs[scala.collection.Seq[Long]](0).toArray
  }

  /** The frequency-serving gate: build the matrix over the data once,
    * broadcast the fixed-size counters, estimate every probe key with a
    * narrow scan — no join, no shuffle on the probe path. Output:
    * probes' columns + `cms_est`. Estimates are deterministic (the
    * derandomized seeds), so they hash-check cross-engine, including
    * every collision-inflated overcount; est ≥ true always. */
  def cmsCounts(
      df: DataFrame,
      keyCol: String,
      probes: DataFrame,
      probeKeyCol: String,
      logW: Int = 10,
      depth: Int = 4): DataFrame = {
    val counters = cmsBuild(df, keyCol, logW, depth)
    // native probe: the matrix rides the plan as a codegen reference object
    // (shipped once per task like a broadcast), the scan stays codegen'd
    val est = graft.functions.SketchExpressions.cmsEstimate(counters, logW, depth) _
    probes.withColumn("cms_est", est(col(probeKeyCol)))
  }

  /** Probe helper: all `nHashes` bits set. */
  private[graft] def bloomContains(filter: Array[Byte], key: Long, logBits: Int, nHashes: Int): Boolean =
    bloomBitPositions(key, logBits, nHashes).forall(b => (filter(b >>> 3) & (1 << (b & 7))) != 0)

  /** Build the filter over a key column — ONE aggregate row of 2^logBits/8
    * bytes (the model-bounded collect judgment: the filter IS the model). */
  def bloomBuild(df: DataFrame, keyCol: String, logBits: Int = 20, nHashes: Int = 4): Array[Byte] = {
    val agg = udaf(new PortableBloomAgg(logBits, nHashes), Encoders.scalaLong)
    df.select(col(keyCol).cast("long").as("k")).agg(agg(col("k")).as("f"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  /** The 100 TB membership gate (decontamination / blocklist / PII-set
    * probe): build the filter over the MEMBER table once, broadcast the
    * fixed-size bit array, probe the big side with a narrow scan — no
    * join, no shuffle on the probe path. Output: one row per probe row,
    * (key, in_filter). No false negatives ever; false positives are
    * deterministic (≈ (1 − e^(−kn/m))^k ≈ 0.2% at the 2^20/4-hash
    * defaults for n = 10⁵) and replay exactly in the oracle. */
  def bloomMembership(
      members: DataFrame,
      memberKeyCol: String,
      probes: DataFrame,
      probeKeyCol: String,
      logBits: Int = 20,
      nHashes: Int = 4): DataFrame = {
    val filter = bloomBuild(members, memberKeyCol, logBits, nHashes)
    // native probe (see cmsCounts): filter ships as a codegen reference obj
    val hit = graft.functions.SketchExpressions.bloomContains(filter, logBits, nHashes) _
    probes.select(
      col(probeKeyCol),
      hit(col(probeKeyCol)).as("in_filter"))
  }

  // --------------------------------------------------------- KMV / theta

  /** Unsigned-long → double, correctly rounded (round-to-odd on the shifted
    * value keeps the sticky bit, the ×2 is exact) — bit-identical to
    * DuckDB's CAST(UBIGINT AS DOUBLE), which is what makes KMV estimates
    * cross-engine hash-checkable. */
  private[graft] def unsignedToDouble(h: Long): Double =
    if (h >= 0L) h.toDouble else ((h >>> 1) | (h & 1L)).toDouble * 2.0

  /** Column form of [[unsignedToDouble]] — same operation order so Spark's
    * codegen produces the identical IEEE sequence. */
  private def u2d(h: Column): Column =
    when(h >= 0, h.cast("double"))
      .otherwise(shiftrightunsigned(h, 1).bitwiseOR(h.bitwiseAND(lit(1L))).cast("double") * lit(2.0))

  private val TwoPow64: Double = math.pow(2.0, 64) // exact power of two

  /** Unsigned order on signed longs: flipping the sign bit is order-
    * preserving, so `a ^ MinValue < b ^ MinValue` ⟺ a <u b. */
  private def flipU(c: Column): Column = c.bitwiseXOR(lit(Long.MinValue))

  /** k-minimum-values aggregator (Bar-Yossef et al. 2002 / the theta-sketch
    * sample): keeps the k smallest DISTINCT mix64 hashes, unsigned-ascending.
    * Unlike HLL registers the retained sample supports SET OPERATIONS
    * (intersection/difference — HLL fundamentally cannot intersect), and
    * because the k-min set under a fixed hash is a pure order statistic it
    * is fully deterministic: the ESTIMATE itself replays in any engine with
    * 64-bit integers (the DuckDB oracle does, via row_number over UBIGINT).
    *
    * Buffer is a sorted-unique long array capped at k — partial aggregation
    * keeps every map-side buffer ≤ k entries, so the shuffle moves
    * O(k · groups) no matter the corpus size. */
  /** Insert a hash into a sorted-unique unsigned-ascending k-min buffer —
    * shared by the batch aggregator and the streaming state twin so both
    * surfaces hold IDENTICAL sample sets. */
  private[graft] def kmvInsert(buf: Array[Long], k: Int, h: Long): Array[Long] = {
    val pos = kmvSearchU(buf, h)
    if (pos >= 0) buf // already present (hashes are a set)
    else {
      val ins = -pos - 1
      if (buf.length < k) kmvInsertAt(buf, ins, h, buf.length + 1)
      else if (ins < k) kmvInsertAt(buf, ins, h, k) // h < current max: displace it
      else buf
    }
  }

  private[graft] def kmvMergeBufs(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA =
        j >= b.length || (i < a.length && java.lang.Long.compareUnsigned(a(i), b(j)) <= 0)
      val v = if (takeA) { val x = a(i); i += 1; x } else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  private def kmvSearchU(buf: Array[Long], h: Long): Int = {
    var lo = 0; var hi = buf.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c   = java.lang.Long.compareUnsigned(buf(mid), h)
      if (c < 0) lo = mid + 1 else if (c > 0) hi = mid - 1 else return mid
    }
    -(lo + 1)
  }

  private def kmvInsertAt(buf: Array[Long], ins: Int, h: Long, newLen: Int): Array[Long] = {
    val out = new Array[Long](newLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, newLen - ins - 1)
    out
  }

  /** Scalar twin of [[kmvDistinct]]'s estimate column: the same fixed op
    * order ((k−1) / (u2d(max)/2⁶⁴)) and the same HALF_UP round-6, so a
    * streaming state fold lands on the identical double. */
  private[graft] def kmvEstimateValue(buf: Array[Long], k: Int): Double = {
    val raw =
      if (buf.length < k) buf.length.toDouble
      else (k - 1).toDouble / (unsignedToDouble(buf(k - 1)) / TwoPow64)
    java.math.BigDecimal.valueOf(raw).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  }

  final class KmvAgg(k: Int) extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, "k must be at least 2")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: Long): Array[Long] = kmvInsert(buf, k, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = kmvMergeBufs(a, b, k)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Per-group KMV sample: (group, kmv sorted unsigned-ascending, n_rows).
    * Ids are mixed through the portable splitmix64 finalizer, so a stored
    * sample is recomputable by any engine. */
  def kmvSketches(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    val agg = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.groupBy(col(groupCol))
      .agg(
        agg(graft.functions.TextFunctions.mix64(col(idCol).cast("long"))).as("kmv"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-group distinct estimate from the KMV sample. Below k distinct the
    * sample IS the distinct set (exact count); at or above, the classic
    * (k−1)/U₍k₎ estimator with U₍k₎ = kth-min/2⁶⁴ — all double arithmetic in
    * a fixed order, so the estimate hash-matches a cross-engine replay at
    * ANY cardinality (no exact-regime gating needed, unlike register HLLs). */
  def kmvDistinct(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame =
    kmvSketches(df, groupCol, idCol, k)
      .select(
        col(groupCol),
        round(
          when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
            .otherwise(
              lit((k - 1).toDouble) / (u2d(element_at(col("kmv"), k)) / lit(TwoPow64))),
          6).as("distinct_est"),
        col("n_rows"))

  /** Theta-sketch set operations over every ordered group pair: estimated
    * |A∩B| and |A∪B| — the queries HLL cannot answer from stored state.
    * θ = min of the two kth-min thresholds (absent when both samples are
    * exhaustive, in which case the counts are exact); retained hashes <u θ
    * common to both sides scale by 2⁶⁴/θ (Dasgupta et al., the Datasketches
    * theta framework). Everything after the one aggregation pass is
    * O(k · groups²) on sketch-sized data. */
  def kmvSetOps(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    val sk = kmvSketches(df, groupCol, idCol, k)
    val meta = sk.select(
      col(groupCol).as("g"),
      col("kmv"),
      (size(col("kmv")) === k).as("full"),
      when(size(col("kmv")) === k, element_at(col("kmv"), k)).as("theta"))

    val pairs = meta.select(col("g").as("type_a"), col("full").as("fa"), col("theta").as("ta"))
      .join(
        meta.select(col("g").as("type_b"), col("full").as("fb"), col("theta").as("tb")),
        col("type_a") < col("type_b"))
      .withColumn(
        "theta_pair",
        when(col("fa") && col("fb"),
          when(flipU(col("ta")) < flipU(col("tb")), col("ta")).otherwise(col("tb")))
          .when(col("fa"), col("ta"))
          .when(col("fb"), col("tb"))
          .otherwise(lit(null).cast("long")))

    val ex = meta.select(col("g"), explode(col("kmv")).as("h"))
    def below(h: Column, theta: Column): Column = theta.isNull || (flipU(h) < flipU(theta))

    // per-pair retained-below-θ counts on each side and in the intersection
    val ca = ex.join(pairs, ex("g") === pairs("type_a") && below(col("h"), col("theta_pair")))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("ca"))
    val cb = ex.join(pairs, ex("g") === pairs("type_b") && below(col("h"), col("theta_pair")))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("cb"))
    val ci = ex.as("x")
      .join(ex.as("y"), col("x.h") === col("y.h") && col("x.g") < col("y.g"))
      .select(col("x.g").as("type_a"), col("y.g").as("type_b"), col("x.h").as("h"))
      .join(pairs, Seq("type_a", "type_b"))
      .filter(below(col("h"), col("theta_pair")))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("ci"))

    val withCnt = pairs
      .join(ca, Seq("type_a", "type_b"), "left")
      .join(cb, Seq("type_a", "type_b"), "left")
      .join(ci, Seq("type_a", "type_b"), "left")
      .select(
        col("type_a"), col("type_b"), col("theta_pair"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("ci"), lit(0L)).as("ci"))

    def scaled(cnt: Column, theta: Column): Column =
      when(theta.isNull, cnt.cast("double"))
        .otherwise(cnt.cast("double") / (u2d(theta) / lit(TwoPow64)))

    withCnt.select(
      col("type_a"),
      col("type_b"),
      round(scaled(col("ci"), col("theta_pair")), 6).as("inter_est"),
      round(scaled(col("ca") + col("cb") - col("ci"), col("theta_pair")), 6).as("union_est"))
  }

  /** Heavy hitters via Count-Min Sketch: ONE pass builds a fixed-size
    * (eps, conf) frequency sketch (mergeable binary — partial-aggregates
    * map-side like the HLLs); candidate keys are then probed against it.
    * At 100 TB the sketch replaces a full groupBy when only the heavy tail
    * matters: O(log(1/δ)/ε) memory regardless of key cardinality, and a
    * stored sketch answers later frequency queries without re-scanning.
    *
    * `candidates` holds the keys to probe (at scale: a distinct() over a
    * sample, or the domain if known). Estimates over-count by at most
    * eps·N with probability conf. */
  /** AMS F₂ sketch (Alon, Matias & Szegedy 1996) — the second frequency
    * moment Σ f_x², i.e. the self-join size / repeat-rate of a key column,
    * in O(R) space: R sign-hash counters S_j = Σ_x f_x·σ_j(x) with
    * σ_j(x) = ±1, each S_j² an unbiased F₂ estimate; variance is tamed by
    * the textbook medians-of-means (R = groups·perGroup). Completes the
    * portable-sketch family: HLL/KMV estimate F₀, count-min point
    * frequencies, AMS the full moment (join planning, skew detection,
    * dedup pressure — n_dup_pairs = (F₂ − N)/2).
    *
    * Fully relational and DETERMINISTIC: σ_j(x) is bit 0 of
    * splitmix64(x ⊕ salt_j) (salt_j = golden·(j+1), the count-min salt
    * schedule), the key-count table is the only data-sized stage (each
    * S_j is a linear functional of it — map-side combinable, mergeable
    * across shards by addition, the same portability contract as the
    * other sketches), and the medians-of-means needs ONE division:
    * sorted group sums g₍₁₎…g₍G₎, estimate = (g₍⌈G/2⌉₎ + g₍⌊G/2⌋₊₁₎) /
    * (2·perGroup) under round(·, 6). Squares ride DECIMAL(38,0) so
    * petabyte counts cannot wrap. Output one row:
    * (n_rows, n_distinct, f2_exact, f2_est, rel_err) — f2_exact rides
    * along for the audit (an external replay checks BOTH, and rel_err is
    * computed from the already-rounded estimate). */
  /** Per-key counts of a key column — the only data-sized AMS stage. */
  private def amsCounts(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol).cast("long").as("x")).agg(count(lit(1)).as("cnt"))

  /** The R sign-hash counters S_j = Σ_x f_x·σ_j(x) of a key-count table:
    * (j, s) rows, σ_j(x) = bit 0 of splitmix64(x ⊕ golden·(j+1)). */
  private def amsSignSums(n: DataFrame, r: Int): DataFrame = {
    val salts = (0 until r)
      .map(j => struct(lit(j).as("j"), lit(BloomGolden * (j + 1).toLong).as("salt")))
    n.select(col("x"), col("cnt"), explode(array(salts: _*)).as("e"))
      .select(col("cnt"), col("e.j").as("j"),
        graft.functions.TextFunctions.mix64(col("x").bitwiseXOR(col("e.salt"))).as("h"))
      .select(col("cnt"), col("j"),
        (lit(1L) - lit(2L) * col("h").bitwiseAND(lit(1L))).as("sign"))
      .groupBy(col("j"))
      .agg(sum(col("cnt") * col("sign")).as("s"))
  }

  /** Medians-of-means over per-estimator products: group sums, rank-select
    * the middle group(s), return (midsum, nmid) — ONE division away from
    * the estimate. */
  private def amsMedianOfMeans(prod: DataFrame, groups: Int, perGroup: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    prod
      .select(shiftright(col("j"), Integer.numberOfTrailingZeros(perGroup)).as("g"), col("p"))
      .groupBy(col("g"))
      .agg(sum(col("p")).as("gsum"))
      .withColumn("rn", row_number().over(W.orderBy(col("gsum").asc, col("g").asc)))
      .filter(col("rn") === (groups + 1) / 2 || col("rn") === groups / 2 + 1)
      .agg(sum(col("gsum")).as("midsum"), count(lit(1)).as("nmid"))
  }

  def amsF2(
      df: DataFrame,
      keyCol: String,
      groups: Int = 4,
      perGroup: Int = 16): DataFrame = {
    require(groups >= 2 && perGroup >= 1, s"need >=2 groups, got $groups x $perGroup")
    require(Integer.bitCount(perGroup) == 1, s"perGroup must be a power of 2, got $perGroup")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val n     = amsCounts(df, keyCol)
    val mid = amsMedianOfMeans(
      amsSignSums(n, groups * perGroup).select(col("j"), (col("s").cast(dec38) * col("s")).as("p")),
      groups, perGroup)
    val exact = n.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_distinct"),
      sum(col("cnt").cast(dec38) * col("cnt")).cast("long").as("f2_exact"))
    exact
      .crossJoin(broadcast(mid))
      .withColumn("f2_est",
        round(col("midsum").cast("double") / (col("nmid") * perGroup).cast("double"), 6))
      .select(
        col("n_rows"), col("n_distinct"), col("f2_exact"), col("f2_est"),
        round(abs(col("f2_est") - col("f2_exact").cast("double")) / col("f2_exact").cast("double"), 6)
          .as("rel_err"))
  }

  /** AMS join-size estimator — the F₂ machinery pointed at JOIN PLANNING:
    * with the SAME sign hashes on both sides, E[S_j^A·S_j^B] =
    * Σ_x f_A(x)·f_B(x), the exact inner-join cardinality (cross terms
    * cancel in expectation because σ is pairwise independent across
    * keys). Two tiny sketches answer "how big is this join" without
    * touching either table again — the planner question broadcast/shuffle
    * decisions hang on at 100 TB, and the sketches persist/merge like
    * every other portable sketch here (S_j is a linear functional).
    *
    * Same determinism story as [[amsF2]]: exact-integer sign sums,
    * DECIMAL(38,0) products, medians-of-means by rank selection, ONE
    * division under round(·, 6). The exact join size (a key-distinct-
    * sized join of the two count tables) rides along for the audit;
    * rel_err is computed from the already-rounded estimate and is NULL
    * when the true size is 0. */
  def amsJoinSize(
      dfA: DataFrame,
      keyColA: String,
      dfB: DataFrame,
      keyColB: String,
      groups: Int = 4,
      perGroup: Int = 16): DataFrame = {
    require(groups >= 2 && perGroup >= 1, s"need >=2 groups, got $groups x $perGroup")
    require(Integer.bitCount(perGroup) == 1, s"perGroup must be a power of 2, got $perGroup")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val nA    = amsCounts(dfA, keyColA)
    val nB    = amsCounts(dfB, keyColB)
    val r     = groups * perGroup
    val prod = amsSignSums(nA, r).select(col("j"), col("s").as("sa"))
      .join(amsSignSums(nB, r).select(col("j"), col("s").as("sb")), Seq("j"))
      .select(col("j"), (col("sa").cast(dec38) * col("sb")).as("p"))
    val mid = amsMedianOfMeans(prod, groups, perGroup)
    val exact = nA.join(nB.select(col("x"), col("cnt").as("cnt_b")), Seq("x"))
      .agg(coalesce(sum(col("cnt").cast(dec38) * col("cnt_b")), lit(0).cast(dec38))
        .cast("long").as("join_exact"))
    val sizes = nA.agg(sum(col("cnt")).as("n_a"), count(lit(1)).as("distinct_a"))
      .crossJoin(nB.agg(sum(col("cnt")).as("n_b"), count(lit(1)).as("distinct_b")))
    sizes
      .crossJoin(broadcast(exact))
      .crossJoin(broadcast(mid))
      .withColumn("join_est",
        round(col("midsum").cast("double") / (col("nmid") * perGroup).cast("double"), 6))
      .select(
        col("n_a"), col("n_b"), col("distinct_a"), col("distinct_b"),
        col("join_exact"), col("join_est"),
        round(
          when(col("join_exact") > 0,
            abs(col("join_est") - col("join_exact").cast("double")) / col("join_exact").cast("double")),
          6).as("rel_err"))
  }

  /** Count-min heavy-CHANGE detection (the deltoid question, Cormode &
    * Muthukrishnan 2005): which keys' traffic moved most between two time
    * windows? Count-min is LINEAR, so two stored depth·2^logW matrices —
    * built here relationally with the portable splitmix64 buckets, no
    * driver arrays — answer it without re-scanning either window: per
    * key, est = min_r cell(r, b_r(key)) in each half, delta_est their
    * difference, movers ranked by (|delta_est| desc, key asc). The
    * windows split at the integer midpoint of the event-time range
    * (floor division — deterministic). Exact per-key deltas ride along
    * for the audit; est ≥ exact per half (count-min never undercounts),
    * so |delta_est| can over- or under-shoot only by collision noise.
    * Every stage is a bounded aggregate: key-distinct probe table,
    * depth·2^logW cells. Output topK rows:
    * (key, est_before, est_after, delta_est, delta_exact). */
  def cmsHeavyChange(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      logW: Int = 10,
      depth: Int = 4,
      topK: Int = 20): DataFrame = {
    val mm = df.agg(
      min(unix_micros(col(tsCol))).as("mn"), max(unix_micros(col(tsCol))).as("mx"))
    val n = df
      .crossJoin(broadcast(mm))
      .select(
        col(keyCol).cast("long").as("x"),
        when(unix_micros(col(tsCol)) <= expr("(mn + mx) div 2"), 0).otherwise(1).as("h"))
      .groupBy(col("x"), col("h"))
      .agg(count(lit(1)).as("cnt"))
    val rs = (0 until depth).map(r =>
      struct(lit(r).as("r"), lit(BloomGolden * (r + 1).toLong).as("salt")))
    val keyed = n
      .select(col("x"), col("h"), col("cnt"), explode(array(rs: _*)).as("e"))
      .select(col("x"), col("h"), col("cnt"), col("e.r").as("r"),
        shiftrightunsigned(
          graft.functions.TextFunctions.mix64(col("x").bitwiseXOR(col("e.salt"))),
          64 - logW).as("b"))
    val cells = keyed.groupBy(col("r"), col("b"), col("h")).agg(sum(col("cnt")).as("cell"))
    val probes = keyed.select(col("x"), col("r"), col("b")).distinct()
    val est = probes
      .join(cells.filter(col("h") === 0).select(col("r"), col("b"), col("cell").as("c0")),
        Seq("r", "b"), "left")
      .join(cells.filter(col("h") === 1).select(col("r"), col("b"), col("cell").as("c1")),
        Seq("r", "b"), "left")
      .groupBy(col("x"))
      .agg(
        min(coalesce(col("c0"), lit(0L))).as("est_before"),
        min(coalesce(col("c1"), lit(0L))).as("est_after"))
    val exact = n.groupBy(col("x")).agg(
      sum(when(col("h") === 0, col("cnt")).otherwise(0L)).as("x0"),
      sum(when(col("h") === 1, col("cnt")).otherwise(0L)).as("x1"))
    val W = org.apache.spark.sql.expressions.Window
    est
      .join(exact, Seq("x"))
      .withColumn("delta_est", col("est_after") - col("est_before"))
      .withColumn("delta_exact", col("x1") - col("x0"))
      .withColumn("rk", row_number().over(W.orderBy(abs(col("delta_est")).desc, col("x").asc)))
      .filter(col("rk") <= topK)
      .select(col("x").as(keyCol), col("est_before"), col("est_after"),
        col("delta_est"), col("delta_exact"), col("rk"))
      .orderBy(col("rk"))
  }

  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      candidates: DataFrame,
      minCount: Long,
      eps: Double = 0.001,
      confidence: Double = 0.99): DataFrame = {
    val sketchRow = df
      .agg(count_min_sketch(col(keyCol).cast("string"), lit(eps), lit(confidence), lit(42)).as("cms"))
    val bytes = sketchRow.head().getAs[Array[Byte]]("cms")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    // native probe (see cmsCounts): the sketch is Serializable and rides the
    // plan references; estimateCount runs inside whole-stage codegen
    val probe = graft.functions.SketchExpressions.cmsSketchEstimate(cms) _
    candidates
      .select(col(keyCol).cast("string").as(keyCol))
      .withColumn("est_count", probe(col(keyCol)))
      .filter(col("est_count") >= minCount)
  }
}
