package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.{Engine, SparkEntry}

/** Plan dump (dev tool): print the formatted physical plan of named
  * SparkEntry queries — the `.explain("formatted")` loop the build rules
  * require after each operator lands, runnable against any SF dir.
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <query>[,<query>...] [outDir suffix]
  *
  * With the optional 3rd/4th args, each query's dump is ALSO written to
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq("q1_pricing_summary"))
    val outDir  = args.lift(2)
    val suffix  = args.lift(3).getOrElse("before")
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
      val sb = new StringBuilder
      sb ++= s"==== $name (pre-execution) ====\n"
      sb ++= df.queryExecution.explainString(ExplainMode.fromString("formatted")) + "\n"
      // materialize so AQE's final (runtime re-planned) shape is visible too
      df.queryExecution.toRdd.foreach(_ => ())
      sb ++= s"==== $name (after AQE) ====\n"
      sb ++= df.queryExecution.executedPlan.toString + "\n"
      println(sb.result())
      outDir.foreach { od =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(od))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(od, s"${name}_$suffix.txt"),
          sb.result().getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
