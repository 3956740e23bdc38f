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

      // rank() keeps boundary ties — rewrites through the keep-ties heap.
      // ORDER BY l_quantity alone is tie-HEAVY (small integer domain), so
      // the rank<=4 row set is far larger than 4 per group and exercises
      // the tie buffer; the set (incl. every boundary tie) must match.
      val rankSql =
        s"""SELECT * FROM (
           |  SELECT l_orderkey, l_partkey, l_quantity,
           |         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rn
           |  FROM parquet.`${SharedSpark.sf0001}/lineitem.parquet`)
           |WHERE rn <= 4""".stripMargin
      val rankExpected = {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ eq WindowTopKRewrite)
        try spark.sql(rankSql).collect().map(_.toSeq).toSet
        finally spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ WindowTopKRewrite
      }
      val rankDf = spark.sql(rankSql)
      assert(rankDf.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "rank() <= k must rewrite through the keep-ties heap")
      val rankGot = rankDf.collect().map(_.toSeq).toSet
      assert(rankGot.size > 8, "fixture must actually produce boundary ties beyond 4 rows/group")
      assert(rankGot == rankExpected, "keep-ties rewrite must preserve every boundary tie")
      // dense_rank() <= k keeps k DISTINCT keys — not provable by any
      // k-bounded heap retention; must NOT rewrite
      val dense = spark.sql(rankSql.replace("rank()", "dense_rank()"))
      assert(!dense.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "dense_rank() must not rewrite")
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

  test("keep-ties heap: adversarial arrival orders (ties first, stale buffer must drop)") {
    import graft.plans.{TopKStrategy, WindowTopKRewrite}
    org.apache.spark.sql.graftbridge.Bridge.addStrategy(spark, TopKStrategy)
    import spark.implicits._
    // one partition so arrival order is exactly this sequence: the three 5s
    // fill the heap, then better rows evict them pairwise — first eviction
    // ties the remaining boundary (5 enters the buffer), the 1-eviction
    // strictly improves it (buffer must drop wholesale), then fresh 3-ties
    // rebuild it. rank() <= 3 ascending keeps {1,2,3,3,3}.
    val rows = Seq(("g", 5), ("g", 5), ("g", 5), ("g", 1), ("g", 2), ("g", 3), ("g", 3), ("g", 3))
    val df = rows.toDF("g", "v").coalesce(1)
    df.createOrReplaceTempView("tie_fixture")
    val sql = """SELECT g, v FROM (
                |  SELECT g, v, rank() OVER (PARTITION BY g ORDER BY v) AS rn FROM tie_fixture)
                |WHERE rn <= 3""".stripMargin
    val expected = spark.sql(sql).collect().map(_.getInt(1)).sorted.toSeq
    assert(expected == Seq(1, 2, 3, 3, 3))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ WindowTopKRewrite
    try {
      val got = spark.sql(sql)
      assert(got.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      assert(got.collect().map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 3, 3))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq WindowTopKRewrite)
    }
  }
}
