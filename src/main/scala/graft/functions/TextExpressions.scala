package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-hash text expressions (SURVEY.md "document fingerprinting
  * (rolling hash)").
  *
  * [[RollHash]]: Karp–Rabin polynomial hash of the whole UTF-8 byte stream
  * (Horner, wrapping 64-bit) — a codegen'd one-pass digest usable as an
  * exact-dedup key, cheaper than md5 (no allocation, no hex round-trip).
  *
  * [[WinnowFingerprints]]: the winnowing fingerprint set of Schleimer,
  * Wilkerson & Aiken (SIGMOD'03, the MOSS algorithm): rolling k-gram hashes,
  * then the minimum hash of every w-window, consecutive duplicates dropped,
  * returned distinct. Guarantees: any shared substring of length >= k+w-1
  * yields at least one shared fingerprint — the positional near-dup
  * detector that complements set-based MinHash.
  */
case class RollHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  // a non-string child is an ANALYSIS error, not a runtime ClassCastException
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "roll_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h     = 0L
    var i     = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      x => {
        val b = ctx.freshName("bytes")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        s"""
        |final byte[] $b = $x.getBytes();
        |long $h = 0L;
        |for (int $i = 0; $i < $b.length; $i++) {
        |  $h = $h * 1000003L + ($b[$i] & 0xff);
        |}
        |${ev.value} = $h;
        """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** splitmix64 finalizer (Steele, Lea & Flood, "Fast splittable pseudorandom
  * number generators", OOPSLA'14 — public reference constants): a bijective
  * xor-shift/wrapping-multiply mixer that turns the structured bits of a
  * polynomial Karp–Rabin digest into 64 well-diffused bits. SimHash reads
  * EVERY bit of the token hash as an independent vote, and a plain
  * polynomial hash of a short token leaves the high bits near-zero — mixed,
  * [[RollHash]]∘[[Mix64]] is a portable replacement for xxhash64: any
  * engine with 64-bit integers replays it exactly (the DuckDB oracle does,
  * in HUGEINT mod 2^64), so signatures persisted by one engine stay
  * recomputable by another. */
case class Mix64(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override def nullSafeEval(input: Any): Any = Mix64.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      x => {
        val z = ctx.freshName("z")
        s"""
        |long $z = $x;
        |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
        |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
        |${ev.value} = $z ^ ($z >>> 31);
        """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object Mix64 {
  def mix(h: Long): Long = {
    var z = h
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Winnowing fingerprints: distinct min-hashes of each w-window over the
  * k-gram rolling hashes. Interpreted eval (one call per DOCUMENT, O(n));
  * candidate pairing happens relationally downstream. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 2 && w >= 1, s"k=$k must be >=2, w=$w >=1")

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "winnow_fingerprints"

  private val B = 1000003L
  // B^(k-1) for the rolling subtract, wrapping arithmetic
  private val Bk1: Long = { var p = 1L; var i = 1; while (i < k) { p *= B; i += 1 }; p }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n     = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling k-gram hashes
    val m      = n - k + 1
    val hashes = new Array[Long](m)
    var h      = 0L
    var i      = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * Bk1) * B + (bytes(i) & 0xff)
      hashes(i - k + 1) = h
      i += 1
    }
    // winnow: rightmost-min of each w-window; LinkedHashSet collapses
    // repeated selections into a distinct fingerprint set
    val out  = scala.collection.mutable.LinkedHashSet.empty[Long]
    val last = math.max(m - w, 0)
    var win  = 0
    while (win <= last) {
      val end  = math.min(win + w, m)
      var best = win
      var j    = win + 1
      while (j < end) { if (hashes(j) <= hashes(best)) best = j; j += 1 }
      out += hashes(best)
      win += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Unicode NFC normalization — Spark ships no normalize builtin, so this is
  * a codegen'd wrapper over `java.text.Normalizer`. The already-normalized
  * fast path (true for all-ASCII corpora) returns the input UTF8String
  * without allocating; only strings containing combining sequences pay the
  * String round-trip. Oracle parity: DuckDB's `nfc_normalize`. */
case class NfcNormalize(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      x => {
        val s = ctx.freshName("s")
        s"""
        |final String $s = $x.toString();
        |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
        |  ? $x
        |  : org.apache.spark.unsafe.types.UTF8String.fromString(
        |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
        """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object TextFunctions {
  /** Whole-string Karp–Rabin digest — codegen'd exact-dedup key. */
  def roll_hash(c: Column): Column = Bridge.column(RollHash(Bridge.expression(c)))

  /** splitmix64 bit-diffusion finalizer over a long column. */
  def mix64(c: Column): Column = Bridge.column(Mix64(Bridge.expression(c)))

  /** Portable 64-bit token hash: [[roll_hash]] diffused by [[mix64]] —
    * the engine-independent stand-in for xxhash64 wherever the hash value
    * itself is part of the operator contract (SimHash signatures). */
  def portable_hash64(c: Column): Column = mix64(roll_hash(c))

  /** Unicode NFC normalization (codegen'd; no-alloc fast path on
    * already-normalized input). */
  def nfc_normalize(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** Winnowing fingerprint set (distinct array<long>) of a text column. */
  def winnow_fingerprints(c: Column, k: Int = 8, w: Int = 16): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), k, w))
}
