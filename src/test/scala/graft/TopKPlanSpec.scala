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

  test("GraftExtensions registers the strategy via spark.sql.extensions") {
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive  = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the JVM's SparkContext. spark.sql.extensions is a STATIC
      // conf (frozen once a context exists), so the test exercises the
      // equivalent builder API; a fresh cluster sets the config string.
      val s2 = SparkSession
        .builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.catalyst.expressions.{Descending, SortOrder}
      import org.apache.spark.sql.graftbridge.Bridge
      import s2.implicits._
      val df = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("g", "v")
      val lp = Bridge.logicalPlan(df)
      def attr(n: String) = lp.output.find(_.name == n).get
      // plan the logical node through the session DIRECTLY — no
      // Bridge.addStrategy; only the config-injected strategy can plan it
      val out = Bridge.ofRows(
        s2,
        graft.plans.TopKPerGroup(Seq(attr("g")), Seq(SortOrder(attr("v"), Descending)), 1, lp))
      assert(out.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      assert(out.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((1L, 2.0), (2L, 3.0)))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
