package graft

import org.apache.spark.sql.functions._

import graft.operators.Aggregators
import graft.sources.Tables

class AggregatorsSpec extends SparkSpec {

  test("TopK aggregator matches the window top-k on real data") {
    import spark.implicits._
    val orders = Tables(spark, SharedSpark.sf0001).orders
    val viaAgg = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new Aggregators.TopK(3).toColumn.name("top"))
      .collect()
      .map { case (k, top) => k -> top }
      .toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }

    assert(viaAgg == viaWindow)
  }

  test("Welford aggregator matches built-in avg/var_samp") {
    import spark.implicits._
    val li = Tables(spark, SharedSpark.sf0001).lineitem
    val got = li
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new Aggregators.WelfordAgg().toColumn.name("w"))
      .collect()
      .map { case (k, (mean, variance, n)) => k -> (mean, variance, n) }
      .toMap
    val expect = li
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_extendedprice")), var_samp(col("l_extendedprice")), count(lit(1)))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    expect.foreach { case (k, (m, v, n)) =>
      val (gm, gv, gn) = got(k)
      assert(gn == n)
      assert(math.abs(gm - m) / m < 1e-9)
      assert(math.abs(gv - v) / v < 1e-9)
    }
  }

  test("DistinctSample is order-insensitive and bounded") {
    import spark.implicits._
    val pairs = Seq(("k", "b"), ("k", "a"), ("k", "c"), ("k", "a"), ("j", "z")).toDS()
    val out = pairs
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new Aggregators.DistinctSample(2).toColumn.name("vals"))
      .collect()
      .toMap
    assert(out("k") == Seq("a", "b")) // sorted, capped at 2
    assert(out("j") == Seq("z"))
  }

  test("DistinctSample keeps the cap-smallest regardless of arrival order") {
    import spark.implicits._
    // descending arrival with many partitions: a first-seen cap would
    // retain late-alphabet values on some partitionings
    val vals  = ('a' to 'z').map(_.toString).reverse
    val pairs = vals.map(v => ("k", v)).toDS().repartition(8)
    val out = pairs
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new Aggregators.DistinctSample(3).toColumn.name("vals"))
      .collect()
      .toMap
    assert(out("k") == Seq("a", "b", "c"))
  }
}
