package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.{Engine, SparkEntry}

/** Job/stage anatomy profiler (dev tool, guide §1/§7): for each named
  * SparkEntry query, run it once warm and report HOW MANY Spark actions it
  * launches and where the stage time goes — job count, stage count, task
  * count, summed task/GC time, and the slowest stages with their
  * callsites. The 2-20 s gate rows at sf0.1 are overwhelmingly per-action
  * fixed cost (plan + job launch + 32-task churn), so the first question
  * for every slow row is "how many actions is it paying for?", which wall
  * clock alone cannot answer.
  *
  * Usage: runMain graft.tools.ProfileJobs <sfDir> <query>[,<query>...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())

    @volatile var jobs = 0
    val stages = mutable.ArrayBuffer[(String, Long, Int)]() // (name, ms, tasks)
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    @volatile var gcMs = 0L
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(0L)
        stages.synchronized { stages += ((i.name, ms, i.numTasks)) }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = e.taskMetrics
        if (m != null) { taskMs += m.executorRunTime; gcMs += m.jvmGCTime }
      }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      materialize(fn(spark, "/root/testdata/sf0.001")) // JIT/codegen warmup
      spark.catalog.clearCache()
      // settle, then attach counters for exactly one measured run
      jobs = 0; tasks = 0; taskMs = 0; gcMs = 0; stages.synchronized(stages.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      materialize(fn(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener bus before reading counters (listenerBus is
      // private[spark] — a short sleep suffices for a dev tool)
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      val snap = stages.synchronized(stages.toVector)
      println(f"PROFILEJOBS $name%-32s wall=$wall%7.3f jobs=$jobs%4d stages=${snap.size}%4d tasks=$tasks%6d taskSec=${taskMs / 1e3}%8.2f gcSec=${gcMs / 1e3}%6.2f")
      snap.sortBy(-_._2).take(8).foreach { case (n, ms, t) =>
        println(f"    stage ${ms / 1e3}%7.3fs tasks=$t%4d  ${n.take(140)}")
      }
    }
    spark.stop()
  }
}
