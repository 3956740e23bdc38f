package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

class SkewAndBucketSpec extends SparkSpec {

  test("salted aggregation == plain aggregation (hot-key safe)") {
    import spark.implicits._
    // hot key: "h" carries 10k rows, others 10
    val df = ((1 to 10000).map(i => ("h", i.toLong)) ++ (1 to 10).map(i => (s"k$i", i.toLong)))
      .toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Skew
      .saltedAgg(
        df,
        Seq("k"),
        salts = 16,
        partial = Seq(sum($"v").as("ps"), count(lit(1)).as("pn")),
        merge = Seq(sum($"ps").as("s"), sum($"pn").as("n")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("salted join == plain join on a skewed fact") {
    import spark.implicits._
    val fact = ((1 to 5000).map(_ => 1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val dim = (1L to 50L).map(k => (k, s"dim$k")).toDF("key", "attr")

    val plain  = fact.join(dim, Seq("key")).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8)
      .select("key", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 5000 + 49)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val t  = Tables(spark, SharedSpark.sf0001)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = spark
      .table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not shuffle the fact side:\n$plan")
    // and it still computes the right thing
    val expect = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == expect)
  }
}
