package graft

import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** The sampled approximate-aggregation tier: estimates are EXACTLY the
  * scaled sample aggregate (determinism — same rows, same arithmetic,
  * every run and every engine), reads touch only the sample table,
  * estimates land near truth for well-populated groups, and a stale
  * sample refuses loudly.
  */
class SampleTierSpec extends SparkSpec {
  import spark.implicits._

  private def withCat[A](f: Catalog => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-sample-spec").toString
    f(new Catalog(spark, root))
  }

  private def fixture = (1 to 8000).map(i => (i.toLong, s"g${i % 4}", (i % 100).toDouble)).toDF("k", "g", "x")

  test("approxAgg equals the manually scaled deterministic sample aggregate") {
    withCat { cat =>
      cat.putTable("t", fixture)
      cat.analyzeSample("t", "k")
      val got = cat.approxAgg("t", "g", "x").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val want = fixture
        .filter(substring(md5(col("k").cast("string")), 1, 1) < "1")
        .groupBy(col("g"))
        .agg(
          (count(lit(1)) * 16).as("n_est"),
          (sum(col("x").cast("decimal(18,2)")) * 16).cast("decimal(38,2)").cast("double").as("sum_est"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got === want)
    }
  }

  test("approxAgg reads only the sample table, never the base data") {
    withCat { cat =>
      cat.putTable("t2", fixture)
      cat.analyzeSample("t2", "k")
      val baseFiles = cat.readTable("t2").inputFiles.toSet
      val est       = cat.approxAgg("t2", "g", "x")
      assert(est.inputFiles.toSet.intersect(baseFiles).isEmpty, "estimate must come from the sample tier")
    }
  }

  test("estimates land near truth for well-populated groups (1/16 of 2000 rows per group)") {
    withCat { cat =>
      cat.putTable("t3", fixture)
      cat.analyzeSample("t3", "k")
      val truth = fixture.groupBy(col("g")).agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      cat.approxAgg("t3", "g", "x").collect().foreach { r =>
        val (g, nEst) = (r.getString(0), r.getLong(1))
        val rel = math.abs(nEst - truth(g)).toDouble / truth(g)
        assert(rel < 0.5, s"group $g estimate $nEst vs truth ${truth(g)} off by ${rel * 100}%")
      }
    }
  }

  test("incremental sample refresh scans only new files and equals the full resample") {
    withCat { cat =>
      val base  = fixture.filter(col("k") <= 4000).repartition(2, col("k"))
      val delta = fixture.filter(col("k") > 4000).coalesce(1)
      cat.putTable("t6", base)
      cat.analyzeSample("t6", "k")
      cat.appendTable("t6", delta)
      val rep = cat.analyzeSampleIncremental("t6").head()
      assert(rep.getAs[Long]("n_files_scanned") === 1L)
      assert(rep.getAs[Long]("n_files_inherited") === 2L)
      val incr = cat.approxAgg("t6", "g", "x").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      cat.analyzeSample("t6", "k") // full resample over the same data
      val full = cat.approxAgg("t6", "g", "x").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(incr === full, "union-of-samples must equal sample-of-union exactly")
    }
  }

  test("incremental sample refuses after a mutation that rewrote covered files") {
    withCat { cat =>
      cat.putTable("t7", fixture)
      cat.analyzeSample("t7", "k")
      cat.deleteWhere("t7", "k", "<=", "100") // rewrites covered files
      val e = intercept[IllegalArgumentException](cat.analyzeSampleIncremental("t7"))
      assert(e.getMessage.contains("no longer live"))
    }
  }

  test("stale sample refuses loudly after a re-PUT") {
    withCat { cat =>
      cat.putTable("t4", fixture)
      cat.analyzeSample("t4", "k")
      cat.putTable("t4", fixture.limit(100))
      val e = intercept[IllegalArgumentException](cat.approxAgg("t4", "g", "x"))
      assert(e.getMessage.contains("re-run analyzeSample"))
    }
  }

  test("larger sixteenths trade cost for accuracy with exact integer scaling") {
    withCat { cat =>
      cat.putTable("t5", fixture)
      cat.analyzeSample("t5", "k", sixteenths = 8)
      val total = cat.approxAgg("t5", "g", "x").agg(sum(col("n_est"))).head().getLong(0)
      val rel   = math.abs(total - 8000L).toDouble / 8000L
      assert(rel < 0.15, s"half-sample total estimate $total vs 8000 off by ${rel * 100}%")
      val e = intercept[IllegalArgumentException](cat.analyzeSample("t5", "k", sixteenths = 3))
      assert(e.getMessage.contains("1,2,4,8"))
    }
  }

  test("sample tier composes with hive-partitioned tables: incremental refresh scans the partitioned delta only") {
    withCat { cat =>
      val base  = fixture.filter(col("k") <= 4000).repartition(2, col("k"))
      val delta = fixture.filter(col("k") > 4000).coalesce(1)
      cat.putPartitionedTable("tp", base, "g")
      cat.analyzeSample("tp", "k")
      cat.appendTable("tp", delta)
      val rep = cat.analyzeSampleIncremental("tp").head()
      // the partitioned delta generation lands one file PER PARTITION DIR
      // (4 g-values × 1 task); only those files scan, the base inherits
      assert(rep.getAs[Long]("n_files_scanned") === 4L, rep.toString)
      val incr = cat.approxAgg("tp", "g", "x").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      cat.analyzeSample("tp", "k") // full resample over the same data
      val full = cat.approxAgg("tp", "g", "x").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(incr === full, "partitioned union-of-samples must equal sample-of-union exactly")
      // the estimate groups BY THE PARTITION COLUMN — if the layout-aware
      // delta scan had NULLed it, g-groups would be wrong, not just off
      assert(incr.keySet === Set("g0", "g1", "g2", "g3"), incr.keySet.toString)
    }
  }
}
