package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the similarity hot path.
  *
  * The declarative alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates a lambda frame per element and defeats whole-stage codegen's
  * tight loops; on the all-pairs cosine join it is the bottleneck (~75 s at
  * sf0.1). This BinaryExpression emits a primitive double loop via
  * doGenCode — the generated code participates in WholeStageCodegen like a
  * built-in, which is preference order (b) of the build brief: a custom
  * Expression before any UDF.
  *
  * Summation is sequential left-to-right, matching DuckDB's list-reduce
  * order — the oracle's FP-parity contract.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  // callers guarantee array<double> inputs (VectorFunctions.vec_dot casts)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
        |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += $x.getDouble($i) * $y.getDouble($i);
        |}
        |${ev.value} = $s;
        """.stripMargin
      })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH signatures of a vector in ONE expression:
  * output is array<long> of length `tables`, element t = the `bits`-bit
  * bucket of hash table t. Plane components are deterministic ±1 from
  * splitmix64(t, p, d) computed on the fly — no 4,000-literal plane matrix
  * in the plan (which made planning dominate runtime), no RNG state.
  *
  * Interpreted eval (CodegenFallback) is fine here: one call per VECTOR
  * (not per pair), O(tables·bits·dims) ≈ 5k mults — planning savings dwarf
  * the codegen loss.
  */
case class HyperplaneSig(child: Expression, bits: Int, tables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(bits > 0 && bits <= 62 && tables > 0)

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "hyperplane_sig"

  @inline private def planeSign(table: Int, plane: Int, dim: Int): Double = {
    var z = (table.toLong << 40) + (plane.toLong << 20) + dim + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  override def nullSafeEval(input: Any): Any = {
    val v    = input.asInstanceOf[ArrayData]
    val dims = v.numElements()
    val out  = new Array[Long](tables)
    var t    = 0
    while (t < tables) {
      var bucket = 0L
      var p      = 0
      while (p < bits) {
        var s = 0.0
        var d = 0
        while (d < dims) { s += v.getDouble(d) * planeSign(t, p, d); d += 1 }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Symmetric int8 scalar quantization of a vector: per-vector scale
  * s = maxAbs/127, bytes q_i = round(v_i / s). Output struct(scale double,
  * q binary) — d + 8 bytes instead of 8d, the 100 TB memory/IO lever for
  * ANN indexes (dot(a,b) ≈ s_a·s_b·dotq8(q_a,q_b); on unit vectors that IS
  * the cosine up to quantization error ~1e-2, which an exact rerank of the
  * shortlist absorbs).
  *
  * CodegenFallback like [[HyperplaneSig]]: one call per VECTOR at
  * index-build/query-prep time, never per pair — the per-pair hot path is
  * [[VecDotQ8]], which does codegen. */
case class VecQ8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("q", org.apache.spark.sql.types.BinaryType, nullable = false)))
  override def prettyName: String = "vec_q8"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < d) { val a = math.abs(v.getDouble(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val scale = if (maxAbs > 0) maxAbs / 127.0 else 1.0
    val q = new Array[Byte](d)
    i = 0
    while (i < d) { q(i) = math.round(v.getDouble(i) / scale).toByte; i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(scale, q)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Integer dot product of two int8-quantized vectors (binary columns) —
  * the quantized scoring hot path, codegen'd like [[VecDot]]. Returns long
  * (d·127² never overflows). */
case class VecDotQ8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_q8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) {
      throw new IllegalArgumentException(
        s"vec_dot_q8: dimension mismatch (${x.length} vs ${y.length})")
    }
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
        |if ($x.length != $y.length) {
        |  throw new IllegalArgumentException(
        |    "vec_dot_q8: dimension mismatch (" + $x.length + " vs " + $y.length + ")");
        |}
        |long $s = 0L;
        |for (int $i = 0; $i < $x.length; $i++) {
        |  $s += (long)$x[$i] * (long)$y[$i];
        |}
        |${ev.value} = $s;
        """.stripMargin
      })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Argmin over a driver-held k×d centroid matrix: struct(cluster int,
  * dist2 double) of the nearest centroid (squared L2; ties toward the
  * lower cluster index — k-means' determinism contract). Replaces the
  * ScalaUDF that used to sit in the k-means hot loop: the UDF paid
  * catalyst→Seq[Double] conversion per ROW per ITERATION; this expression
  * reads the unsafe array buffer in place and participates in whole-stage
  * codegen. The matrix rides the expression as a reference object
  * (serialized once per task with the plan, like a broadcast closure —
  * k·d doubles, bounded by the same contract as the k-means driver
  * state). Rows whose dimension differs from the model's fail loudly. */
case class VecNearest(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty, "vec_nearest needs at least one centroid")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("cluster", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dist2", DoubleType, nullable = false)))
  override def prettyName: String = "vec_nearest"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != centroids(0).length) {
      throw new IllegalArgumentException(
        s"vec_nearest: dimension mismatch ($n vs model ${centroids(0).length})")
    }
    var best = 0; var bd = Double.MaxValue; var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c); var d = 0.0; var i = 0
      while (i < n) { val x = v.getDouble(i) - ctr(i); d += x * x; i += 1 }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bd)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(
      ctx,
      ev,
      v => {
        val n    = ctx.freshName("n")
        val best = ctx.freshName("best")
        val bd   = ctx.freshName("bd")
        val c    = ctx.freshName("c")
        val ctr  = ctx.freshName("ctr")
        val d    = ctx.freshName("d")
        val i    = ctx.freshName("i")
        val x    = ctx.freshName("x")
        s"""
        |final int $n = $v.numElements();
        |if ($n != $cs[0].length) {
        |  throw new IllegalArgumentException(
        |    "vec_nearest: dimension mismatch (" + $n + " vs model " + $cs[0].length + ")");
        |}
        |int $best = 0; double $bd = Double.MAX_VALUE;
        |for (int $c = 0; $c < $cs.length; $c++) {
        |  final double[] $ctr = $cs[$c];
        |  double $d = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $x = $v.getDouble($i) - $ctr[$i];
        |    $d += $x * $x;
        |  }
        |  if ($d < $bd) { $bd = $d; $best = $c; }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |  new Object[]{$best, $bd});
        """.stripMargin
      })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** The m nearest centroids (ascending L2² on the COSINE sphere — the input
  * is unit-normalized in place before the scan, so cells match the IVF
  * coarse quantizer exactly) as array<int> of centroid indices. Replaces
  * the `nearestCells` ScalaUDF that sat on every IVF assign/probe path:
  * the UDF paid catalyst→Seq[Double] boxing per row; this expression reads
  * the unsafe buffer in place, keeps the m-best insertion heap in
  * primitives, and participates in whole-stage codegen. Tie semantics are
  * the UDF's, bit for bit: equal distances keep ascending-index order and
  * a boundary tie keeps the incumbent (strict `<`/`>` compares only).
  * Centroids ride as a reference object (k·d doubles, model-bounded). */
case class VecNearestCells(child: Expression, centroids: Array[Array[Double]], m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty, "vec_nearest_cells needs at least one centroid")
  require(m >= 1, s"m must be >= 1, got $m")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "vec_nearest_cells"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != centroids(0).length)
      throw new IllegalArgumentException(
        s"vec_nearest_cells: dimension mismatch ($n vs model ${centroids(0).length})")
    // unit-normalize a primitive copy (the UDF's `normalized(v.toArray)`)
    val u = new Array[Double](n)
    var s = 0.0; var i = 0
    while (i < n) { val x = v.getDouble(i); u(i) = x; s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    if (nrm > 0) { i = 0; while (i < n) { u(i) /= nrm; i += 1 } }
    val mm    = math.min(m, centroids.length)
    val dBest = new Array[Double](mm)
    val iBest = new Array[Int](mm)
    var size  = 0
    var c     = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0; i = 0
      while (i < n) { val x = u(i) - ctr(i); d += x * x; i += 1 }
      if (size < mm) {
        var p = size
        while (p > 0 && dBest(p - 1) > d) { dBest(p) = dBest(p - 1); iBest(p) = iBest(p - 1); p -= 1 }
        dBest(p) = d; iBest(p) = c; size += 1
      } else if (d < dBest(mm - 1)) {
        var p = mm - 1
        while (p > 0 && dBest(p - 1) > d) { dBest(p) = dBest(p - 1); iBest(p) = iBest(p - 1); p -= 1 }
        dBest(p) = d; iBest(p) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(iBest, size))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(
      ctx,
      ev,
      v => {
        val n     = ctx.freshName("n")
        val u     = ctx.freshName("u")
        val s     = ctx.freshName("s")
        val nrm   = ctx.freshName("nrm")
        val mm    = ctx.freshName("mm")
        val dBest = ctx.freshName("dBest")
        val iBest = ctx.freshName("iBest")
        val size  = ctx.freshName("size")
        val c     = ctx.freshName("c")
        val ctr   = ctx.freshName("ctr")
        val d     = ctx.freshName("d")
        val i     = ctx.freshName("i")
        val x     = ctx.freshName("x")
        val p     = ctx.freshName("p")
        s"""
        |final int $n = $v.numElements();
        |if ($n != $cs[0].length) {
        |  throw new IllegalArgumentException(
        |    "vec_nearest_cells: dimension mismatch (" + $n + " vs model " + $cs[0].length + ")");
        |}
        |final double[] $u = new double[$n];
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $x = $v.getDouble($i); $u[$i] = $x; $s += $x * $x;
        |}
        |final double $nrm = Math.sqrt($s);
        |if ($nrm > 0) { for (int $i = 0; $i < $n; $i++) $u[$i] /= $nrm; }
        |final int $mm = Math.min($m, $cs.length);
        |final double[] $dBest = new double[$mm];
        |final int[] $iBest = new int[$mm];
        |int $size = 0;
        |for (int $c = 0; $c < $cs.length; $c++) {
        |  final double[] $ctr = $cs[$c];
        |  double $d = 0.0;
        |  for (int $i = 0; $i < $n; $i++) { final double $x = $u[$i] - $ctr[$i]; $d += $x * $x; }
        |  if ($size < $mm) {
        |    int $p = $size;
        |    while ($p > 0 && $dBest[$p - 1] > $d) { $dBest[$p] = $dBest[$p - 1]; $iBest[$p] = $iBest[$p - 1]; $p--; }
        |    $dBest[$p] = $d; $iBest[$p] = $c; $size++;
        |  } else if ($d < $dBest[$mm - 1]) {
        |    int $p = $mm - 1;
        |    while ($p > 0 && $dBest[$p - 1] > $d) { $dBest[$p] = $dBest[$p - 1]; $iBest[$p] = $iBest[$p - 1]; $p--; }
        |    $dBest[$p] = $d; $iBest[$p] = $c;
        |  }
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        |  .fromPrimitiveArray(java.util.Arrays.copyOf($iBest, $size));
        """.stripMargin
      })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object VectorFunctions {
  /** vec_dot as a Column — drop-in for the HOF fold, whole-stage-codegen'd.
    * Inputs are cast to array<double> so the expression always sees doubles. */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(
      VecDot(
        Bridge.expression(a.cast(ArrayType(DoubleType))),
        Bridge.expression(b.cast(ArrayType(DoubleType)))))

  /** Per-table LSH bucket array for a vector (see [[HyperplaneSig]]). */
  def hyperplane_sig(v: Column, bits: Int, tables: Int): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(v.cast(ArrayType(DoubleType))), bits, tables))

  /** struct(scale, q): int8 scalar quantization of a vector (see [[VecQ8]]). */
  def vec_q8(v: Column): Column =
    Bridge.column(VecQ8(Bridge.expression(v.cast(ArrayType(DoubleType)))))

  /** Integer dot of two int8-quantized (binary) vectors (see [[VecDotQ8]]). */
  def vec_dot_q8(a: Column, b: Column): Column =
    Bridge.column(VecDotQ8(Bridge.expression(a), Bridge.expression(b)))

  /** struct(cluster, dist2) of the nearest centroid (see [[VecNearest]]). */
  def vec_nearest(v: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(VecNearest(Bridge.expression(v.cast(ArrayType(DoubleType))), centroids))

  /** array<int> of the m nearest cosine cells (see [[VecNearestCells]]). */
  def vec_nearest_cells(v: Column, centroids: Array[Array[Double]], m: Int): Column =
    Bridge.column(VecNearestCells(Bridge.expression(v.cast(ArrayType(DoubleType))), centroids, m))
}
