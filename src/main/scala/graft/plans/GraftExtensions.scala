package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point for the engine's custom planning
  * (build-brief preference (c): LogicalPlan + Strategy registered via
  * extensions). Activate with
  *
  *   SparkSession.builder().config("spark.sql.extensions",
  *     "graft.plans.GraftExtensions")
  *
  * or `.withExtensions(new GraftExtensions)`. [[graft.operators.TopK]] also
  * self-registers its strategy per session (Bridge.addStrategy) so the
  * operator works on un-configured sessions; this class is the cluster-wide
  * config-driven path a deployment uses. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    // SQL window-top-k (`row_number() OVER (...) <= k`) auto-rewrites to
    // the bounded-heap operator the strategy above plans
    ext.injectOptimizerRule(_ => WindowTopKRewrite)
    // SQL names for the native expressions (vec_dot, roll_hash, ...) so a
    // spark.sql-only user reaches the same codegen'd kernels
    graft.functions.SqlFunctions.inject(ext)
  }
}
