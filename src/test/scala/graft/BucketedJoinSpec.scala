package graft

import org.apache.spark.sql.functions._

import graft.sources.{Catalog, Tables}

/** Catalog bucketing: the persisted-co-location contract. The join of two
  * tables bucketed on the join key — and the groupBy on that key — must
  * plan with ZERO exchanges; results must equal the plain (shuffled) plan;
  * a spec whose version stamp no longer matches the data must refuse; and
  * a fresh session (no session-catalog entry) must re-register from the
  * published spec and still get the shuffle-free plan.
  */
class BucketedJoinSpec extends SparkSpec {
  private lazy val t = Tables(spark, SharedSpark.sf0001)

  private def withCat[A](f: Catalog => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-bkt-spec").toString
    f(new Catalog(spark, root))
  }

  private def noBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def putBoth(cat: Catalog): Unit = {
    cat.putBucketedTable(
      "ord_b",
      t.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")),
      "o_orderkey",
      8)
    cat.putBucketedTable(
      "li_b",
      t.lineitem.select(col("l_orderkey"), col("l_extendedprice")),
      "l_orderkey",
      8)
  }

  private def joined(cat: Catalog) =
    cat.readBucketedTable("ord_b")
      .join(cat.readBucketedTable("li_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"))

  test("bucketed join + groupBy on the bucket key plans ZERO exchanges") {
    withCat { cat =>
      putBoth(cat)
      noBroadcast {
        val plan = joined(cat).queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"co-located join must not shuffle:\n$plan")
        assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join over bucketed scans:\n$plan")
      }
    }
  }

  test("shuffle-free plan returns exactly the plain join's result") {
    withCat { cat =>
      putBoth(cat)
      val got = noBroadcast(joined(cat))
      val want = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
        .join(
          t.lineitem.select(col("l_orderkey"), col("l_extendedprice")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"))
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("stale bucket spec refuses loudly after a plain re-PUT") {
    withCat { cat =>
      putBoth(cat)
      cat.putTable("ord_b", t.orders.select(col("o_orderkey")))
      val e = intercept[IllegalArgumentException](cat.readBucketedTable("ord_b"))
      assert(e.getMessage.contains("superseded by a plain PUT"), e.getMessage)
    }
  }

  test("fresh session re-registers from the published spec, plan stays shuffle-free") {
    withCat { cat =>
      putBoth(cat)
      // simulate a new session: the session-catalog entries are gone, only
      // the published __bucketspec__ side tables survive
      spark.sql("DROP TABLE IF EXISTS `graft_bkt_ord_b`")
      spark.sql("DROP TABLE IF EXISTS `graft_bkt_li_b`")
      noBroadcast {
        val plan = joined(cat).queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"re-registered read must keep the bucket spec:\n$plan")
      }
    }
  }
}
