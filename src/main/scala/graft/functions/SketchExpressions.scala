package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native probe expressions for the broadcast-sketch serving paths in
  * [[graft.operators.Sketches]].
  *
  * These replace the last Scala UDF probes so every sketch scan stays inside
  * whole-stage codegen: a UDF breaks the codegen span (each row round-trips
  * through the Scala closure + catalyst-converter boundary), and on a
  * 100 TB probe scan that boundary is the dominant cost. Each expression
  * carries its fixed-size sketch as a codegen REFERENCE object (the
  * [[BloomMightContain]] lesson: never as plan literals), so planning cost
  * is O(1) in the sketch size and tasks ship the model once.
  *
  * Hash parity: the generated Java inlines exactly the splitmix64 finalizer
  * in [[Mix64.mix]] and the bucket/bit arithmetic of the build-side
  * aggregators (`Sketches.cmsBucket`, `Sketches.bloomBitPositions`), and the
  * interpreted `nullSafeEval` delegates to those very build-side helpers —
  * the two paths cannot drift apart without a SketchSpec hash mismatch.
  */
object SketchExpressions {

  /** Point-estimate Column over a long key: min over the `depth` rows of the
    * portable count-min matrix (`counters`, laid out row-major with 2^logW
    * buckets per row). */
  def cmsEstimate(counters: Array[Long], logW: Int, depth: Int)(key: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(key.cast("long")), counters, logW, depth))

  /** Membership Column over a long key against the PortableBloomAgg byte
    * array (double-hash probes, `nHashes` bits). */
  def bloomContains(filter: Array[Byte], logBits: Int, nHashes: Int)(key: Column): Column =
    Bridge.column(BloomByteContains(Bridge.expression(key.cast("long")), filter, logBits, nHashes))

  /** Frequency Column over a string key against Spark's built-in
    * [[CountMinSketch]] (the `count_min_sketch` aggregate's binary form). */
  def cmsSketchEstimate(cms: CountMinSketch)(key: Column): Column =
    Bridge.column(CmsSketchEstimate(Bridge.expression(key.cast("string")), cms))
}

/** min_r counters[r][bucket_r(key)] — the count-min point estimate, always
  * ≥ the true count. Bucket arithmetic mirrors `Sketches.cmsBucket`. */
case class CmsEstimate(child: Expression, counters: Array[Long], logW: Int, depth: Int)
    extends UnaryExpression {

  require(logW >= 1 && logW <= 26, s"logW must be in [1,26], got $logW")
  require(depth >= 1 && counters.length == depth << logW,
    s"counters must be depth*2^logW = ${depth << logW} longs, got ${counters.length}")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"cms_estimate needs a BIGINT key, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    graft.operators.Sketches.cmsEstimate(counters, input.asInstanceOf[Long], logW, depth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cmsCounters", counters, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val r    = ctx.freshName("r")
      val z    = ctx.freshName("z")
      val c    = ctx.freshName("c")
      val best = ctx.freshName("best")
      s"""
      |long $best = Long.MAX_VALUE;
      |for (int $r = 0; $r < $depth; $r++) {
      |  long $z = $h ^ (0x9e3779b97f4a7c15L * ($r + 1L));
      |  $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
      |  $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
      |  $z = $z ^ ($z >>> 31);
      |  long $c = $cRef[($r << $logW) + (int)($z >>> ${64 - logW})];
      |  if ($c < $best) $best = $c;
      |}
      |${ev.value} = $best;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** All-bits-set membership test against the PortableBloomAgg byte array
  * (double hashing h1 + j·h2, top `logBits` bits). Mirrors
  * `Sketches.bloomBitPositions`; no false negatives by construction. */
case class BloomByteContains(child: Expression, filter: Array[Byte], logBits: Int, nHashes: Int)
    extends UnaryExpression {

  require(logBits >= 3 && logBits <= 30, s"logBits must be in [3,30], got $logBits")
  require(filter.length == 1 << (logBits - 3),
    s"filter must be 2^${logBits}/8 = ${1 << (logBits - 3)} bytes, got ${filter.length}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_byte_contains"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"bloom_byte_contains needs a BIGINT key, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    graft.operators.Sketches.bloomContains(filter, input.asInstanceOf[Long], logBits, nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("bloomFilter", filter, "byte[]")
    nullSafeCodeGen(ctx, ev, h => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val j  = ctx.freshName("j")
      val b  = ctx.freshName("b")
      val ok = ctx.freshName("ok")
      s"""
      |long $h1 = graft.functions.Mix64.mix($h);
      |long $h2 = graft.functions.Mix64.mix($h ^ 0x9e3779b97f4a7c15L) | 1L;
      |boolean $ok = true;
      |for (int $j = 0; $j < $nHashes; $j++) {
      |  int $b = (int)(($h1 + (long)$j * $h2) >>> ${64 - logBits});
      |  if (($fRef[$b >>> 3] & (1 << ($b & 7))) == 0) { $ok = false; break; }
      |}
      |${ev.value} = $ok;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Frequency estimate of a string key against Spark's built-in
  * [[CountMinSketch]] ([[CountMinSketchImpl]] is Serializable, so the
  * sketch rides the plan references like any broadcast model). The generated
  * code calls `estimateCount` directly — one virtual call per row, no
  * closure/converter boundary. */
case class CmsSketchEstimate(child: Expression, cms: CountMinSketch) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_sketch_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"cms_sketch_estimate needs a STRING key, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    cms.estimateCount(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $ref.estimateCount($k.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
