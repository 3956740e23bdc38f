package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.graftbridge.Bridge

import graft.plans.{TopKPerGroup, TopKStrategy}

/** Public API for the custom top-k-per-group operator (graft.plans).
  *
  * `TopK.perGroup(df, Seq("k"), Seq("score" -> false, "id" -> true), 3)`
  * (false = descending) returns the top-3 rows per key — the same row set
  * as the `row_number().over(...) <= 3` window filter, but executed with
  * bounded per-group heaps and a k-rows-per-group shuffle instead of a
  * full shuffle + partition sort (see TopKPerGroup scaladoc).
  *
  * Columns are resolved by name against the frame's analyzed output —
  * expression-valued keys are pre-projected by the caller (`withColumn`).
  */
object TopK {
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], // (column, ascending)
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(orderCols.nonEmpty, "at least one order column")
    val spark = df.sparkSession
    Bridge.addStrategy(spark, TopKStrategy)
    val plan = Bridge.logicalPlan(df)
    def attr(n: String) =
      plan.output
        .find(_.name.equalsIgnoreCase(n))
        .getOrElse(throw new IllegalArgumentException(s"no column '$n' in ${plan.output.map(_.name)}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(spark, TopKPerGroup(groupCols.map(attr), order, k, plan))
  }
}
