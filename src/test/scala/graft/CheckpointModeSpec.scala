package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}

/** Pins the engine-wide durable-checkpoint contract: every iterative
  * operator accepts `checkpointDir`, and
  *   - with it set, iteration state goes through RELIABLE `df.checkpoint`
  *     (observable: RDD checkpoint files appear under the dir — this is
  *     what survives a lost executor at hour 6 of a 100-TB pagerank);
  *   - without it, state stays on fast `localCheckpoint` (observable: the
  *     dir keeps no files);
  * and the two modes return IDENTICAL results (checkpoint placement must
  * never change arithmetic). */
class CheckpointModeSpec extends SparkSpec {
  import spark.implicits._

  // a small graph with two components, a cycle, triangles and a dangler —
  // enough structure that every operator below does real multi-round work
  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
    (2L, 4L), (6L, 7L), (7L, 8L), (8L, 6L), (1L, 5L), (9L, 1L)
  ).toDF("s", "t")

  private def checkpointFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    if (dir.exists()) walk(dir).filter(_.isFile) else Seq.empty
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertBothModes(name: String)(run: Option[String] => DataFrame): Unit = {
    val local = sorted(run(None))
    val dir   = java.nio.file.Files.createTempDirectory(s"graft_ckpt_${name}_").toFile
    val durable = sorted(run(Some(dir.toString)))
    assert(durable == local, s"$name: durable-checkpoint result diverged from local mode")
    assert(
      checkpointFiles(dir).nonEmpty,
      s"$name: no RDD checkpoint files under $dir — reliable df.checkpoint was not used")
    assert(local.nonEmpty, s"$name: empty result, the mode comparison proved nothing")
  }

  test("pageRank: reliable checkpoint when dir set, local otherwise, same ranks") {
    assertBothModes("pagerank")(cd =>
      Graph.pageRank(edges, "s", "t", iterations = 4, checkpointDir = cd)
        .select(col("id"), round(col("rank"), 9).as("r")))
  }

  test("weightedPageRank threads checkpointDir") {
    val w = edges.withColumn("w", (col("s") + col("t")) % 3 + 1)
    assertBothModes("wpr")(cd =>
      Graph.weightedPageRank(w, "s", "t", "w", iterations = 4, checkpointDir = cd)
        .select(col("id"), round(col("rank"), 9).as("r")))
  }

  test("personalizedPageRank threads checkpointDir") {
    val sources = Seq(1L).toDF("id")
    assertBothModes("ppr")(cd =>
      Graph.personalizedPageRank(edges, "s", "t", sources, iterations = 4, checkpointDir = cd)
        .select(col("id"), round(col("rank"), 9).as("r")))
  }

  test("labelPropagation threads checkpointDir") {
    assertBothModes("lpa")(cd =>
      Graph.labelPropagation(edges, "s", "t", iterations = 3, checkpointDir = cd))
  }

  test("louvain threads checkpointDir") {
    assertBothModes("louvain")(cd => Graph.louvain(edges, "s", "t", rounds = 3, checkpointDir = cd))
  }

  test("louvainTwoLevel / louvainMultilevel thread checkpointDir") {
    assertBothModes("louvainTwoLevel")(cd =>
      Graph.louvainTwoLevel(edges, "s", "t", rounds1 = 3, rounds2 = 3, checkpointDir = cd))
    assertBothModes("louvainMultilevel")(cd =>
      Graph.louvainMultilevel(edges, "s", "t", roundsPerLevel = 3, maxLevels = 3, checkpointDir = cd))
  }

  test("connectedComponents / starComponents thread checkpointDir") {
    assertBothModes("cc")(cd => Graph.connectedComponents(edges, "s", "t", checkpointDir = cd))
    val pairs = edges.select(col("s").as("a"), col("t").as("b"))
    assertBothModes("star")(cd => Dedup.starComponents(pairs, checkpointDir = cd)._1)
  }

  test("bfsLevels threads checkpointDir") {
    assertBothModes("bfs")(cd =>
      Graph.bfsLevels(edges, "s", "t", Seq(1L).toDF("id"), maxDepth = 3, checkpointDir = cd))
  }

  test("hits threads checkpointDir") {
    assertBothModes("hits")(cd =>
      Graph.hits(edges, "s", "t", iterations = 4, checkpointDir = cd))
  }

  test("kCore threads checkpointDir") {
    assertBothModes("kcore")(cd =>
      Graph.kCore(edges, "s", "t", k = 2, checkpointInterval = 1, checkpointDir = cd))
  }

  test("kTruss threads checkpointDir") {
    assertBothModes("ktruss")(cd =>
      Graph.kTruss(edges, "s", "t", k = 3, rounds = 3, checkpointDir = cd))
  }

  test("betweenness / harmonic / eccentricity sampled thread checkpointDir") {
    assertBothModes("btw")(cd =>
      Graph.betweennessSampled(edges, "s", "t", nSources = 3, maxDepth = 3, checkpointDir = cd))
    assertBothModes("harm")(cd =>
      Graph.harmonicSampled(edges, "s", "t", nSources = 3, maxDepth = 3, checkpointDir = cd))
    assertBothModes("ecc")(cd =>
      Graph.eccentricitySampled(edges, "s", "t", nSources = 3, maxDepth = 3, checkpointDir = cd))
  }

  test("stronglyConnectedComponents threads checkpointDir") {
    assertBothModes("scc")(cd =>
      Graph.stronglyConnectedComponents(edges, "s", "t", checkpointDir = cd))
  }

  test("sccFwBw threads checkpointDir") {
    assertBothModes("sccfwbw")(cd => Graph.sccFwBw(edges, "s", "t", checkpointDir = cd))
  }

  test("trainStumps / mondrianAnonymize / dbscan thread checkpointDir") {
    import graft.operators.{Boosting, DataQuality, Similarity}
    val labeled = (1 to 200)
      .map(i => (i.toLong % 7, (i % 3).toLong, if (i % 7 < 3) 1 else 0))
      .toDF("f_a", "f_b", "y")
    assertBothModes("stumps")(cd =>
      Boosting.trainStumps(
        labeled, "y", Seq("a" -> col("f_a"), "b" -> col("f_b")), rounds = 3, eta = 0.5,
        checkpointDir = cd))

    val qi = (1 to 120).map(i => ((i % 13).toLong, (i % 7).toLong)).toDF("qa", "qb")
    assertBothModes("mondrian")(cd =>
      DataQuality.mondrianAnonymize(qi, Seq("qa", "qb"), k = 10, rounds = 3, checkpointDir = cd))

    val vecs = (0 until 40)
      .map(i => (i.toLong, Array.tabulate(4)(d => (if (i / 10 == d) 1f else 0f) + 0.01f * (i % 10))))
      .toDF("vec_id", "embedding")
    assertBothModes("dbscan")(cd =>
      Similarity.dbscan(vecs, simThreshold = 0.99, minPts = 3, checkpointDir = cd))
  }

  test("Bpe.trainDistributed threads checkpointDir; models identical") {
    import graft.operators.Bpe
    val docs = (1 to 60).map(i => s"abab abba baba c${i % 5}").toDF("text")
    val local = Bpe.trainDistributed(docs, "text", numMerges = 4, checkpointEvery = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_bpe_").toFile
    val durable = Bpe.trainDistributed(
      docs, "text", numMerges = 4, checkpointEvery = 1, checkpointDir = Some(dir.toString))
    assert(durable.merges == local.merges, "durable-mode BPE learned different merges")
    assert(checkpointFiles(dir).nonEmpty, "no reliable checkpoint files from the merge rounds")
  }

  test("FAULT INJECTION: executor JVM killed mid-iteration — durable pageRank completes, ranks identical") {
    // The durability claim, actually exercised: graft.tools.FaultProbe runs
    // in its OWN JVM (this suite's shared context is local[8]; killable
    // executors need a real standalone mini-cluster, local-cluster[2,1,1536]),
    // runs pageRank in RELIABLE checkpoint mode, kill -9s one executor JVM
    // once ≥3 checkpoint rounds are durably on disk, and exits 0 only if
    // the kill landed BEFORE completion AND Spark observed the loss. Here
    // we assert the recovered ranks equal an unperturbed run bit-for-bit
    // at the shared round-9 rendering.
    import scala.jdk.CollectionConverters._
    import graft.tools.FaultProbe

    val expected = Graph
      .pageRank(FaultProbe.fixtureEdges.toDF("s", "t"), "s", "t", iterations = FaultProbe.Iterations)
      .collect()
      .map(r => s"${r.getLong(0)},${BigDecimal(r.getDouble(1)).setScale(9, BigDecimal.RoundingMode.HALF_UP)}")
      .sorted.toSeq

    def runProbe(): (Int, String, java.nio.file.Path) = {
      val out     = java.nio.file.Files.createTempFile("graft_fault_ranks_", ".csv")
      val javaBin = java.nio.file.Paths.get(sys.props("java.home"), "bin", "java").toString
      val addOpens = org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()
        .split("\\s+").toSeq.filter(_.nonEmpty)
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx3g", "-cp", sys.props("java.class.path"),
        "graft.tools.FaultProbe", out.toString)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.environment().put("SPARK_HOME", "/opt/spark")
      // in-process Worker skips bin/load-spark-env.sh, which normally sets this
      pb.environment().put("SPARK_SCALA_VERSION", "2.13")
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val log  = new StringBuilder
      val drain = new Thread(() => {
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(proc.getInputStream))
        Iterator.continually(r.readLine()).takeWhile(_ != null).foreach(l => log.synchronized { log.append(l).append('\n') })
      })
      drain.setDaemon(true); drain.start()
      val finished = proc.waitFor(480, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) {
        proc.descendants().forEach(_.destroyForcibly()); proc.destroyForcibly()
        fail(s"fault probe timed out; log tail:\n${log.synchronized(log.toString).takeRight(4000)}")
      }
      drain.join(10000)
      (proc.exitValue(), log.synchronized(log.toString), out)
    }
    // exits 2 (job won the kill race) and 3 (loss event outran its wait)
    // are ENVIRONMENTAL races under heavy box load, not durability bugs —
    // retry once; every other failure, and any result divergence, is real
    var (exit, logText, out) = runProbe()
    if (exit == 2 || exit == 3) {
      info(s"fault probe raced (exit $exit) — retrying once on a calmer scheduler")
      val r2 = runProbe(); exit = r2._1; logText = r2._2; out = r2._3
    }
    assert(exit == 0, s"fault probe exited $exit; log tail:\n${logText.takeRight(4000)}")
    assert(logText.contains("FAULTPROBE_KILLED pid="), "probe never killed an executor")
    assert(logText.contains("FAULTPROBE_EXECUTOR_REMOVED"), "Spark never observed the executor loss")
    val got = new String(java.nio.file.Files.readAllBytes(out), "UTF-8").split("\n").toSeq
    assert(got == expected,
      s"ranks diverged after executor loss: ${got.diff(expected).take(5)} vs ${expected.diff(got).take(5)}")
  }
}
