package graft

/** The optimizer-rule path of the custom top-k operator: plain SQL window
  * top-k must plan through TopKPerGroup when the rule is active, produce
  * identical results, and leave non-matching shapes untouched. The rule is
  * registered only within this suite (and removed after), so every other
  * suite keeps the stock planner. */
class WindowTopKRewriteSpec extends SparkSpec {

  test("SQL row_number()<=k rewrites to the bounded-heap operator with identical results") {
    import graft.plans.{TopKStrategy, WindowTopKRewrite}
    org.apache.spark.sql.graftbridge.Bridge.addStrategy(spark, TopKStrategy)
    // total order (price desc, orderkey, linenumber) — the top-4 row SET is
    // deterministic, so rewritten vs stock results compare exactly
    val sql =
      s"""SELECT * FROM (
         |  SELECT l_orderkey, l_partkey, l_quantity,
         |         row_number() OVER (PARTITION BY l_returnflag
         |                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
         |  FROM parquet.`${SharedSpark.sf0001}/lineitem.parquet`)
         |WHERE rn <= 4""".stripMargin
    val expected = spark.sql(sql).collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ WindowTopKRewrite
    try {
      val df   = spark.sql(sql)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"rewrite must fire:\n$plan")
      assert(df.collect().map(_.toSeq).toSet == expected, "rewritten results must match stock plan")

      // rank() assigns equal ranks to ties — NOT the proven shape; no rewrite
      val rankDf = spark.sql(sql.replace("row_number()", "rank()"))
      assert(!rankDf.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "rank() must not rewrite")
      // k beyond the bounded-heap budget — window form's spillable sort is safer
      val bigK = spark.sql(sql.replace("rn <= 4", "rn <= 2000000"))
      assert(!bigK.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "unbounded k must not rewrite")
      // a filter that is not a rank bound — no rewrite
      val other = spark.sql(sql.replace("WHERE rn <= 4", "WHERE l_quantity > 10"))
      assert(!other.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "non-rank filter must not rewrite")
      // rn = k bounds to top-k; the surviving filter picks exactly the k-th
      val kthSql = sql.replace("rn <= 4", "rn = 3")
      val kthExpected = {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ eq WindowTopKRewrite)
        try spark.sql(kthSql).collect().map(_.toSeq).toSet
        finally spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ WindowTopKRewrite
      }
      val kth = spark.sql(kthSql)
      assert(kth.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "rn = k must rewrite")
      assert(kth.collect().map(_.toSeq).toSet == kthExpected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq WindowTopKRewrite)
    }
  }
}
