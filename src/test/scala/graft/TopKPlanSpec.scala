package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK
import graft.sources.Tables

class TopKPlanSpec extends SparkSpec {

  test("custom top-k operator returns exactly the window top-k row set") {
    val orders = Tables(spark, SharedSpark.sf0001).orders
    val custom = TopK
      .perGroup(orders, Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val window = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    assert(custom == window)
    assert(custom.nonEmpty)
  }

  test("physical plan: partial heaps before the exchange, final after") {
    val orders = Tables(spark, SharedSpark.sf0001).orders
    val df     = TopK.perGroup(orders, Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 2)
    val plan   = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), s"map-side heap phase missing:\n$plan")
    assert(plan.contains("TopKPerGroupExec") || "TopKPerGroup\\b".r.findFirstIn(plan).isDefined,
      s"final phase missing:\n$plan")
    assert(plan.contains("Exchange"), "final phase requires clustering on the group key")
    // no sort and no window in the plan — that's the point
    assert(!plan.contains("Window"), "must not fall back to window execution")
  }

  test("k larger than any group degenerates to identity row set") {
    import spark.implicits._
    val df  = Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)).toDF("g", "v")
    val out = TopK.perGroup(df, Seq("g"), Seq("v" -> false), 10).collect()
    assert(out.length == 3)
  }

  test("empty group list = global top-k") {
    import spark.implicits._
    val df  = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = TopK.perGroup(df, Seq.empty, Seq("v" -> false), 5)
      .collect().map(_.getDouble(1)).toSet
    assert(out == Set(100.0, 99.0, 98.0, 97.0, 96.0))
  }
}
