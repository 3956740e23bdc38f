package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.SparkSession

/** Fault-injection probe for the durable-checkpoint contract — run in its
  * OWN JVM (ResilienceSpec launches it via ProcessBuilder; never inside the
  * shared test session, which owns a `local[...]` context).
  *
  * What it proves: the engine-wide reliable-checkpoint mode
  * ([[graft.operators.IterState]], `checkpointDir = Some(dir)`) actually
  * SURVIVES executor loss — the claim the mode exists for (hour-6 of a
  * 100-TB pagerank on preemptible nodes resumes instead of restarting; the
  * reference's whole SDFS replication layer, replication.go:11-91 and the
  * REJUICE path node.go:1129-1221, exists for this same failure mode).
  *
  * Mechanics:
  *   1. starts `local-cluster[2,1,1536]` — a REAL standalone mini-cluster:
  *      master + workers in-process, executors as separate child JVMs
  *      (unlike `local[k]`, where there is no process to kill);
  *   2. runs [[graft.operators.Graph.pageRank]] over a deterministic
  *      synthetic graph with `checkpointDir = Some(...)`,
  *      `checkpointInterval = 1`;
  *   3. a watchdog thread waits for the FIRST reliable checkpoint file to
  *      land (proof the iteration is mid-flight), then kill -9s one
  *      executor JVM (found among this process's descendants by its
  *      CoarseGrainedExecutorBackend main class);
  *   4. the standalone master relaunches a replacement executor, lost
  *      tasks/stages retry, recomputation reads the reliable checkpoint
  *      files instead of dead lineage, and the job completes;
  *   5. the probe exits 0 ONLY if (a) the kill landed BEFORE the job
  *      finished, (b) Spark itself observed the loss (an
  *      onExecutorRemoved event fired), and (c) results were written.
  *
  * The spec then compares the written ranks against an unperturbed run —
  * identical labels, which is the whole durability contract.
  *
  * Usage: FaultProbe <outFile>   (writes "id,rank9" lines, sorted)
  * Exit codes: 0 ok; 2 kill never landed (job too fast — enlarge the
  * fixture); 3 no executor-removed event; nonzero JVM death on job failure.
  */
object FaultProbe {
  // the same deterministic fixture the spec's unperturbed run builds:
  // a ring (guarantees one strongly-connected mass) plus affine chords
  // (breaks symmetry so ranks are non-uniform and order-sensitive)
  val N = 6000
  def fixtureEdges: Seq[(Long, Long)] =
    (0L until N).flatMap(i => Seq((i, (i + 1) % N), (i, (i * 17 + 3) % N)))

  val Iterations = 8

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse(sys.error("usage: FaultProbe <outFile>"))
    val ckptDir = Files.createTempDirectory("graft_fault_ckpt_")

    val spark = SparkSession
      .builder()
      .appName("graft-fault-probe")
      .master("local-cluster[2,1,1536]")
      // executors are fresh JVMs: give them the probe's full classpath
      // (spark jars + graft classes) and the JDK17 module opens
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config(
        "spark.executor.extraJavaOptions",
        org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.default.parallelism", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var removedSeen = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        println(s"FAULTPROBE_EXECUTOR_REMOVED id=${e.executorId} reason=${e.reason}")
        removedSeen = true
      }
    })

    @volatile var killedPid = -1L
    @volatile var jobDone   = false
    val watchdog = new Thread(() => {
      // distinct rdd-N checkpoint dirs with data: ≥3 means the edge frame
      // plus at least two iteration rounds are durably on disk — the kill
      // lands genuinely mid-iteration, with ≥5 rounds still to run
      def ckptRounds: Int = {
        val it = Files.walk(ckptDir)
        try it.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-"))
          .map(_.getParent.getFileName.toString).toSet.size
        finally it.close()
      }
      while (!jobDone && ckptRounds < 3) Thread.sleep(50)
      if (!jobDone) {
        // an executor JVM is a descendant running CoarseGrainedExecutorBackend.
        // ProcessHandle.info().commandLine() comes back empty for the huge
        // executor classpath, so fall back to command(): the ONLY child
        // processes this probe ever spawns are executor JVMs.
        val victim = ProcessHandle.current().descendants().iterator().asScala
          .find { p =>
            val info = p.info()
            info.commandLine().map[Boolean](_.contains("CoarseGrainedExecutorBackend")).orElse(false) ||
            info.command().map[Boolean](_.endsWith("java")).orElse(false)
          }
        victim match {
          case Some(p) =>
            killedPid = p.pid()
            p.destroyForcibly()
            println(s"FAULTPROBE_KILLED pid=$killedPid")
          case None =>
            println("FAULTPROBE_NO_EXECUTOR_FOUND descendants=" +
              ProcessHandle.current().descendants().iterator().asScala
                .map(p => s"${p.pid()}:${p.info().command().orElse("?")}").mkString(","))
        }
      }
    }, "graft-fault-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()

    import spark.implicits._
    val edges = fixtureEdges.toDF("s", "t").repartition(8)
    val ranks = graft.operators.Graph
      .pageRank(edges, "s", "t", iterations = Iterations,
        checkpointDir = Some(ckptDir.toString), checkpointInterval = 1)
      .collect()
      .map(r => s"${r.getLong(0)},${BigDecimal(r.getDouble(1)).setScale(9, BigDecimal.RoundingMode.HALF_UP)}")
      .sorted
    jobDone = true

    if (killedPid < 0) {
      println("FAULTPROBE_JOB_FINISHED_BEFORE_KILL")
      spark.stop(); sys.exit(2)
    }
    // give the loss event time to propagate (generous: on a loaded box the
    // listener bus can lag far behind the kill), then require Spark saw it
    val deadline = System.nanoTime() + 120e9.toLong
    while (!removedSeen && System.nanoTime() < deadline) Thread.sleep(100)
    if (!removedSeen) { spark.stop(); sys.exit(3) }

    Files.write(Paths.get(outFile), ranks.mkString("\n").getBytes("UTF-8"))
    println(s"FAULTPROBE_DONE rows=${ranks.length}")
    spark.stop()
    sys.exit(0)
  }
}
