package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.{Engine, SparkEntry}

/** Plan dump (dev tool): print the formatted physical plan of named
  * SparkEntry queries — the `.explain("formatted")` loop the build rules
  * require after each operator lands, runnable against any SF dir.
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <query>[,<query>...]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq("q1_pricing_summary"))
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
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      val df = fn(spark, dir)
      println(s"==== $name (pre-execution) ====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      // materialize so AQE's final (runtime re-planned) shape is visible too
      df.queryExecution.toRdd.foreach(_ => ())
      println(s"==== $name (after AQE) ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
