package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Engine, SparkEntry}

/** Per-query profiler (dev tool): time named SparkEntry queries for N
  * full-materialization runs each — the isolation probe behind the bench's
  * 2× regression gate (a flagged query is either reproducibly slow here,
  * or the flag was box noise).
  *
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <n> <query>[,<query>...]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n     = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq("q1_pricing_summary"))
    val noAqe = args.lift(3).contains("noaqe") // A/B probe: AQE latency share
    val spark = Engine
      .tune(
        SparkSession
          .builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (noAqe) spark.conf.set("spark.sql.adaptive.enabled", "false")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      materialize(fn(spark, "/root/testdata/sf0.001")) // JIT/codegen warmup
      val times = (0 until n).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        materialize(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-30s min=${times.min}%.3f median=${times.sorted.apply(n / 2)}%.3f max=${times.max}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
