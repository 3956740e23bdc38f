package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, Dataset}

/** The reference's MapReduce surface ("MapleJuice") re-expressed on Datasets.
  *
  * Reference semantics being reproduced (SURVEY.md §2b):
  *  - maple: run a mapper over line-text input, parse stdout as `key value`
  *    lines (parse contract src/node.go:919-943 via strings.Fields).
  *  - shuffle/partition-by-key: src/node.go:911-944 buckets map output by key;
  *    the master merges + hash-distributes (src/master.go:518-614). Here this
  *    is Spark's distributed shuffle — the reference funnels every shuffle
  *    byte through one master node buffered in memory, which is its main
  *    scalability ceiling; Spark's shuffle removes it.
  *  - juice: whole-group reduce — the reducer sees every value of one key
  *    (src/juice_helpers.go:86-125). Value order within a group is
  *    NONDETERMINISTIC in the reference (append order of concurrent mappers,
  *    src/master.go:554-564), so the contract here is explicitly
  *    order-insensitive reduce functions.
  *
  * Cleaned semantics (SURVEY.md §2f — reference warts NOT copied): the last
  * record is never dropped, keys are arbitrary strings (not
  * filename-restricted), keys survive exactly.
  *
  * Exe-compat mode mirrors the reference's any-language UDF executables
  * (src/reverse_map.go, src/reduce_exe_word_count.go) via RDD.pipe (map) and
  * per-group temp file + process exec (reduce). These are the compatibility
  * path only — native Scala functions stay inside Tungsten and are preferred.
  */
object MapleJuice {

  /** Parse one mapper-stdout line into (key, value): first whitespace field is
    * the key, the remainder the value (reference: strings.Fields at
    * src/node.go:929-931 — but unlike src/node.go:924-926 we keep the final
    * record even without a trailing newline). */
  def parseKV(line: String): Option[(String, String)] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) None
    else {
      val parts = trimmed.split("\\s+", 2)
      if (parts.length == 2) Some((parts(0), parts(1))) else Some((parts(0), ""))
    }
  }

  /** maple with a native Scala mapper: line => (key, value) pairs.
    *
    * `numTasks` mirrors `num_maples` (README.md:28). The reference statically
    * range-splits input files (src/master.go:458-516); Spark's input-split
    * planning + dynamic scheduling is strictly better, so numTasks <= 0 means
    * "let Spark decide" and a positive value forces a repartition (useful to
    * spread a few large gzip'd/whole files).
    */
  def maple(lines: Dataset[String], numTasks: Int = 0)(
      fn: String => IterableOnce[(String, String)]): Dataset[(String, String)] = {
    import lines.sparkSession.implicits._
    val src = if (numTasks > 0) lines.repartition(numTasks) else lines
    src.flatMap(fn)
  }

  /** Exe distribution: the reference requires "the executables must be there
    * for every machine" (README.md:27) by hand. [[ship]] makes it automatic:
    * every command element that is a local file is registered with
    * `sc.addFile` (torrent-style broadcast to every executor, any cluster
    * size) and rewritten to a `sparkfile:` token that [[resolveShipped]]
    * resolves INSIDE the task via `SparkFiles.get` — the executor-local
    * path cannot be known on the driver. Non-file elements (binaries on
    * PATH, flags) pass through untouched. */
  private val ShipPrefix = "sparkfile:"

  def ship(spark: org.apache.spark.sql.SparkSession, command: Seq[String]): Seq[String] =
    command.map { el =>
      val f = new java.io.File(el)
      if (f.isFile) {
        spark.sparkContext.addFile(f.getAbsolutePath)
        ShipPrefix + f.getName
      } else el
    }

  private[operators] def resolveShipped(el: String): String =
    if (el.startsWith(ShipPrefix)) {
      val p = org.apache.spark.SparkFiles.get(el.stripPrefix(ShipPrefix))
      new java.io.File(p).setExecutable(true) // fetch does not promise exec bits
      p
    } else el

  /** maple with an arbitrary executable, reference-style (mapper reads lines
    * on stdin, writes `key value` lines on stdout). Streams each partition
    * through the process — no whole-file materialization, unlike the
    * reference's whole-file GET per worker (src/node.go:892-909). A
    * dedicated writer thread feeds stdin while the task iterator drains
    * stdout (same deadlock-free shape as RDD.pipe, which can't be used here:
    * `sparkfile:` command tokens must resolve executor-side). */
  def mapleExe(lines: Dataset[String], command: Seq[String], numTasks: Int = 0): Dataset[(String, String)] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val src = if (numTasks > 0) lines.repartition(numTasks) else lines
    val piped = src.rdd.mapPartitions { it =>
      val ctx  = org.apache.spark.TaskContext.get()
      val cmd  = command.map(resolveShipped)
      val proc = new ProcessBuilder(cmd: _*).start()

      // Drain child stderr: an exe logging more than the OS pipe buffer
      // (~64 KB) would otherwise block on write, stop emitting stdout, and
      // hang the task forever (RDD.pipe runs the same dedicated reader).
      val stderrDrain = new Thread(() => {
        val err = proc.getErrorStream
        val buf = new Array[Byte](8192)
        try { while (err.read(buf) != -1) () }
        catch { case _: java.io.IOException => () }
      }, "graft-maple-stderr")
      stderrDrain.setDaemon(true)
      stderrDrain.start()

      // Stdin writer. Two hard requirements mirrored from Spark's PipedRDD:
      //  - the thread carries the task's TaskContext (consuming a shuffle or
      //    cached-block iterator off-thread without it can mis-release block
      //    locks);
      //  - an upstream failure (shuffle fetch, cached-block read) must NOT
      //    die silently in the thread — closing stdin would hand the exe a
      //    truncated-but-EOF-terminated input, it would exit 0, and the task
      //    would succeed with silently partial output. The failure is stored
      //    and rethrown from the consuming iterator below.
      val upstreamFailure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val sink = new java.io.PrintWriter(
        new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8)))
      val writer = new Thread(() => {
        if (ctx != null) org.apache.spark.sql.graftbridge.Bridge.setTaskContext(ctx)
        try it.foreach(sink.println)
        catch { case t: Throwable => upstreamFailure.set(t) }
        finally sink.close()
      }, "graft-maple-stdin")
      writer.setDaemon(true)
      writer.start()

      // Partial consumption downstream (limit/take/first) abandons the
      // iterator before the exit-status tail runs — without this listener
      // the child process would leak until executor shutdown.
      if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
        if (proc.isAlive) proc.destroyForcibly()
      }

      def rethrowUpstream(): Unit = {
        val t = upstreamFailure.get()
        if (t != null)
          throw new RuntimeException(s"maple upstream input failed feeding ${cmd.head}", t)
      }

      val parsed = scala.io.Source
        .fromInputStream(proc.getInputStream)(scala.io.Codec.UTF8)
        .getLines()
        .flatMap(parseKV)
      new scala.collection.AbstractIterator[(String, String)] {
        private var tailChecked = false
        override def hasNext: Boolean = {
          rethrowUpstream()
          if (parsed.hasNext) true
          else {
            if (!tailChecked) {
              val status = proc.waitFor()
              writer.join()
              rethrowUpstream()
              require(status == 0, s"maple exe exited with $status")
              tailChecked = true
            }
            false
          }
        }
        override def next(): (String, String) = {
          if (!hasNext) throw new NoSuchElementException("empty maple output")
          parsed.next()
        }
      }
    }
    spark.createDataset(piped)
  }

  /** juice with a native order-insensitive reduce function over the whole
    * group. Streams each group through an iterator (no per-key file
    * materialization, unlike src/node.go:933-939).
    *
    * `numTasks` mirrors `num_juices`; <= 0 lets AQE size the shuffle.
    */
  def juice(pairs: Dataset[(String, String)], numTasks: Int = 0)(
      fn: (String, Iterator[String]) => String): Dataset[(String, String)] = {
    import pairs.sparkSession.implicits._
    if (numTasks > 0) {
      // Exact parity with the reference's reduce-task partitioner semantics
      // (hash(key) mod num_juices, src/juice_helpers.go:286-293) — same
      // key-disjointness guarantee, Spark's HashPartitioner instead of FNV.
      val rdd = pairs.rdd
        .map { case (k, v) => (k, v) }
        .groupByKey(new HashPartitioner(numTasks))
        .map { case (k, vs) => (k, fn(k, vs.iterator)) }
      pairs.sparkSession.createDataset(rdd)
    } else {
      pairs.groupByKey(_._1).mapGroups((k, it) => (k, fn(k, it.map(_._2))))
    }
  }

  /** juice with an arbitrary executable: reproduces `reducer <keyfile>` —
    * the group's values are written one-per-line to an executor-local temp
    * file, the exe runs on it, stdout (trimmed) becomes the reduced value
    * (src/juice_helpers.go:86-125; output line contract `key <stdout>` at
    * src/juice_helpers.go:113-116).
    *
    * Scale note: one temp file per key on the EXECUTOR (never the driver);
    * skewed keys are bounded by disk, not memory. For associative reductions
    * prefer native [[juice]] or an Aggregator — this path exists for
    * any-language UDF parity only.
    */
  def juiceExe(pairs: Dataset[(String, String)], command: Seq[String], numTasks: Int = 0): Dataset[(String, String)] =
    juice(pairs, numTasks) { (_, values) =>
      val tmp = Files.createTempFile("graft_juice_", ".txt")
      try {
        val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
        try values.foreach { v => w.write(v); w.write('\n') }
        finally w.close()
        val out = new StringBuilder
        import scala.sys.process._
        val cmd    = command.map(resolveShipped) :+ tmp.toString
        val status = cmd.!(ProcessLogger(line => { out.append(line); out.append('\n') }, _ => ()))
        require(status == 0, s"juice exe exited with $status")
        out.toString.trim
      } finally Files.deleteIfExists(tmp)
    }

  /** Whole job: maple → shuffle → juice, as one lazy Dataset. */
  def run(lines: Dataset[String], numMaples: Int = 0, numJuices: Int = 0)(
      mapFn: String => IterableOnce[(String, String)])(
      reduceFn: (String, Iterator[String]) => String): DataFrame = {
    juice(maple(lines, numMaples)(mapFn), numJuices)(reduceFn).toDF("key", "value")
  }
}
