package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.sql.{Encoder, Encoders}

/** Distributed-buildable Bloom filter over 64-bit keys.
  *
  * The build side is a typed [[Aggregator]] (partial-aggregates map-side,
  * merge = bitwise OR), so the filter is assembled in one pass over any
  * number of partitions and collected as a single Array[Long] — a bounded,
  * fixed-size model (numBits/8 bytes, e.g. 512 KiB at 2²² bits) exactly like
  * an IVF centroid table. The probe side is a native expression that carries
  * the bit array as a codegen REFERENCE object — never as plan literals (a
  * 2²²-bit filter would be 65k literals; the HyperplaneSig lesson: literals
  * at that count make planning the dominant cost) — and participates in
  * whole-stage codegen.
  *
  * Hashing: `numHashes` independent multiply-shift probes
  * `pos_i = (h * C_i) >>> (64 - log2(numBits))` with fixed odd constants
  * C_i (splitmix64 stream). Multiply-shift uses the HIGH bits, which is
  * what makes multiplicative hashing uniform; it forces numBits to a power
  * of two, which the builder requires up front. The same arithmetic runs in
  * the Aggregator (JVM Scala) and the generated Java — bit-identical by
  * construction, so there are NO false negatives ever; false positives are
  * the standard (1 - e^(-kn/m))^k.
  */
object Bloom {

  /** Fixed odd multipliers, one per probe (splitmix64 of the probe index —
    * deterministic, no RNG state, same stream on build and probe side). */
  private[graft] def constants(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes) { i =>
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= (z >>> 31)
      z | 1L // odd multiplier — multiply-shift requirement
    }

  private def log2Exact(n: Int): Int = {
    require(
      n >= 64 && (n & (n - 1)) == 0,
      s"numBits must be a power of two >= 64 (one long word), got $n")
    java.lang.Integer.numberOfTrailingZeros(n)
  }

  /** One-pass distributed build: OR-merge bit arrays of size numBits/64. */
  final class BuildAgg(numBits: Int, numHashes: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    private val shift = 64 - log2Exact(numBits)
    private val cs    = constants(numHashes)
    override def zero: Array[Long] = new Array[Long](numBits / 64)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < cs.length) {
        val pos = (h * cs(i)) >>> shift
        buf((pos >>> 6).toInt) |= (1L << (pos & 63L))
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build the filter from a single long column of `df` (one aggregate job,
    * one bounded collect — the model is numBits/8 bytes regardless of df's
    * size). */
  def build(df: org.apache.spark.sql.DataFrame, hashCol: String, numBits: Int, numHashes: Int): Array[Long] = {
    log2Exact(numBits) // validate early
    import df.sparkSession.implicits._
    df.select(org.apache.spark.sql.functions.col(hashCol).cast("long"))
      .as[Long]
      .select(new BuildAgg(numBits, numHashes).toColumn)
      .head()
  }

  /** Membership-test Column over a long column: true if every probe bit is
    * set. Codegen'd; the bit array rides along as a reference object. */
  def mightContain(bits: Array[Long], numHashes: Int)(h: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(h.cast("long")), bits, numHashes))

  /** Driver-side probe — bit-identical arithmetic to [[BloomMightContain]]
    * (same constants, same multiply-shift) for METADATA-SIZED decisions
    * only: e.g. the per-file grep-index prune tests nFiles blooms on the
    * driver to choose which files to scan. Never call this per data row —
    * that is what the codegen'd expression is for. */
  def testLocal(bits: Array[Long], numHashes: Int, h: Long): Boolean = {
    require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0, "bits length must be a power of two")
    val shift = 64 - (6 + java.lang.Integer.numberOfTrailingZeros(bits.length))
    val cs    = constants(numHashes)
    var i = 0
    while (i < cs.length) {
      val pos = (h * cs(i)) >>> shift
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Native membership probe (see [[Bloom]]). `bits.length * 64` must be a
  * power of two. */
case class BloomMightContain(child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {

  require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0, "bits length must be a power of two")
  private val shift = 64 - (6 + java.lang.Integer.numberOfTrailingZeros(bits.length))
  private val cs    = Bloom.constants(numHashes)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a BIGINT key, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    var i = 0
    while (i < cs.length) {
      val pos = (h * cs(i)) >>> shift
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val csRef   = ctx.addReferenceObj("bloomConsts", cs, "long[]")
    nullSafeCodeGen(
      ctx,
      ev,
      h => {
        val i   = ctx.freshName("i")
        val pos = ctx.freshName("pos")
        val ok  = ctx.freshName("ok")
        s"""
        |boolean $ok = true;
        |for (int $i = 0; $i < ${cs.length}; $i++) {
        |  final long $pos = ($h * $csRef[$i]) >>> $shift;
        |  if (($bitsRef[(int)($pos >>> 6)] & (1L << ($pos & 63L))) == 0L) { $ok = false; break; }
        |}
        |${ev.value} = $ok;
        """.stripMargin
      })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
