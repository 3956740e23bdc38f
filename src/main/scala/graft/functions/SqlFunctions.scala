package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the engine's native expressions, so a
  * `spark.sql(...)`-only user gets the same codegen'd kernels the
  * DataFrame API uses:
  *
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT roll_hash(text), winnow_fingerprints(text, 5, 4) FROM docs
  *   SELECT hyperplane_sig(embedding, 16, 8) FROM embeddings
  *
  * Shape parameters (bits/tables/k/w) must be INTEGER LITERALS — they fix
  * the expression's output schema, so a non-literal is rejected at analysis
  * time with a targeted error rather than failing downstream. Wired into
  * [[graft.plans.GraftExtensions]] for config-driven sessions
  * (`spark.sql.extensions`) and exposed as [[SqlFunctions.register]] for
  * already-built ones. */
object SqlFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal (got ${other.sql}) — it fixes the output schema")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (name, info, builder) for every SQL-registrable native expression. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      args => { arity("vec_dot", args, 2); VecDot(args(0), args(1)) }),
    (
      "vec_q8",
      new ExpressionInfo(classOf[VecQ8].getName, "vec_q8"),
      args => { arity("vec_q8", args, 1); VecQ8(args(0)) }),
    (
      "vec_dot_q8",
      new ExpressionInfo(classOf[VecDotQ8].getName, "vec_dot_q8"),
      args => { arity("vec_dot_q8", args, 2); VecDotQ8(args(0), args(1)) }),
    (
      "roll_hash",
      new ExpressionInfo(classOf[RollHash].getName, "roll_hash"),
      args => { arity("roll_hash", args, 1); RollHash(args(0)) }),
    (
      "mix64",
      new ExpressionInfo(classOf[Mix64].getName, "mix64"),
      args => { arity("mix64", args, 1); Mix64(args(0)) }),
    (
      "winnow_fingerprints",
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      args => {
        arity("winnow_fingerprints", args, 3)
        WinnowFingerprints(
          args(0),
          intLit(args(1), "winnow_fingerprints", "k"),
          intLit(args(2), "winnow_fingerprints", "w"))
      }),
    (
      "hyperplane_sig",
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      args => {
        arity("hyperplane_sig", args, 3)
        HyperplaneSig(
          args(0),
          intLit(args(1), "hyperplane_sig", "bits"),
          intLit(args(2), "hyperplane_sig", "tables"))
      }))

  /** Register every function on an already-built session (idempotent:
    * re-registration replaces the identical builder). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, info, builder)
    }

  /** Builder-time injection hook for GraftExtensions. */
  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
