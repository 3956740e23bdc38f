package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query at SPARK_GRAFT_SF_DIR on
  * local[N], best-of-3 full-materialization passes, and emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "regressed":[...]}.
  *
  * The same JSON is also written to BENCH_LOCAL.json next to the repo root so
  * a driver that only captures a bounded tail of stdout can never lose the
  * head of the per-query map (BENCH_r02/r03 lost the first ~18 queries that
  * way).
  *
  * Regression gate: if BASELINE_LOCAL.json (flat {"query": best_seconds})
  * exists, any query slower than 2x its pinned baseline is listed under
  * "regressed" with its pinned and measured times, so round-over-round swings
  * are mechanically adjudicated instead of eyeballed.
  */
object Bench {
  private val RegressionFactor = 2.0

  /** Parse a flat {"name": 1.23, ...} JSON object (the only shape
    * BASELINE_LOCAL.json has); avoids dragging a JSON library into main.
    */
  private def parseFlatJson(text: String): Map[String, Double] =
    "\"([A-Za-z0-9_]+)\"\\s*:\\s*([0-9.eE+-]+)".r
      .findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional family filter (isolated re-adjudication as the suite grows):
    //   runMain graft.Bench graph_,dedup_   -> only names with those prefixes
    // A filtered run is a PARTIAL measurement: it writes
    // BENCH_LOCAL_partial.json (never clobbering the full-suite record the
    // driver reads), reports metric "partial_total", and restricts the
    // pin-discipline check to the selection.
    val prefixes: Seq[String] =
      args.headOption.map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    val partial = prefixes.nonEmpty
    val selected: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (partial) SparkEntry.queries.filter { case (n, _) => prefixes.exists(n.startsWith) }
      else SparkEntry.queries
    if (selected.isEmpty) {
      println(s"""{"metric":"error","reason":"no query matches the family filter","filter":"${prefixes.mkString(",")}"}""")
      sys.exit(1)
    }
    val spark = Engine.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // pin discipline: every registered query must carry a baseline pin in
    // the SAME commit that adds it, or round-over-round regressions on it
    // are invisible. Refuse to measure an unpinned set — loudly and BEFORE
    // the ~15-minute measurement spend. (BenchContractSpec enforces the
    // same invariant at `sbt test` time.)
    locally {
      val repoRoot = sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")
      val pinPath  = java.nio.file.Paths.get(repoRoot, "BASELINE_LOCAL.json")
      if (java.nio.file.Files.exists(pinPath)) {
        val pins = parseFlatJson(new String(java.nio.file.Files.readAllBytes(pinPath), "UTF-8"))
        val unpinned = selected.keySet -- pins.keySet
        if (unpinned.nonEmpty) {
          println(s"""{"metric":"error","reason":"unpinned queries (add BASELINE_LOCAL.json entries in the same commit)","queries":[${unpinned.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}]}""")
          spark.stop()
          sys.exit(1)
        }
      }
    }
    // full-result materialization: iterate every InternalRow of the final
    // plan (all columns evaluated, nothing collected to the driver).
    // `.count()` let Catalyst prune final projections, timing projection-
    // heavy queries as little more than a scan — wrong measurements.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    // session warmup: run every query once at tiny sf0.001 so no measured
    // query absorbs JVM/codegen/JIT cold-start (profiled at ~10s for the
    // first documents-pipeline query otherwise); sf0.1 data is NOT touched
    val warmDir = "/root/testdata/sf0.001"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    selected.toSeq
      .map { case (_, fn) =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try { materialize(fn(spark, warmDir)) }
            catch { case _: Throwable => () }
        })
      }
      .foreach(_.get())
    pool.shutdown()
    spark.catalog.clearCache()
    // JVM-wide GC time; queries run serially, so the delta across one
    // query's window attributes its GC cost. Recorded per query so a
    // driver-run spike adjudicates itself: a >2x-over-pin row whose extra
    // time is GC/sandbox contention shows gc_frac >> the quiet-run norm
    // (the round-7/8 dedup_* flags were exactly this, cleared by hand).
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    // three full measured passes, best-of per query (single-shot numbers on
    // this box swing +-25% under GC/fs noise); caches cleared between
    // passes so all are comparable executions
    // A failed execution must NOT look like a fast one: a pass poisoned by a
    // crash (executor loss, interrupt) throws fast from every remaining
    // query, and a silent `catch => 0.02s` minimum would overwrite real
    // times in the best-of fold (observed once: a corrupted BENCH_LOCAL with
    // 141 sub-50ms rows). Failed runs record +Inf so they can never win,
    // and are reported in an "errors" field instead of vanishing.
    val failures = scala.collection.mutable.LinkedHashSet[String]()
    def onePass(): Seq[(String, (Double, Double))] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        val ok = try { materialize(fn(spark, sfDir)); true }
                 catch { case _: Throwable => failures += name; false }
        val sec = if (ok) (System.nanoTime() - t0) / 1e9 else Double.PositiveInfinity
        name -> (sec, (gcMillis() - g0) / 1e3)
      }
    val passes = (0 until 3).map { i =>
      if (i > 0) spark.catalog.clearCache()
      onePass().toMap
    }
    // best pass per query, carrying THAT run's GC window; a query that
    // failed in EVERY pass surfaces as +Inf (and in "errors"), never as 0
    val best = selected.keys.toSeq.sorted
      .map(name => name -> passes.map(_(name)).minBy(_._1))
    // queries that failed every pass: excluded from the numeric map/total
    // (Infinity is not valid JSON) and emitted under "errors" instead
    val errored = best.collect { case (n, (sec, _)) if sec.isInfinite => n }
    val results = best.collect { case (n, (sec, _)) if !sec.isInfinite => n -> sec }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val gcs = best.map { case (k, (_, g)) => s"\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val gcByName = best.toMap
    val total = results.map(_._2).sum
    val repoRoot = sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")
    val baselinePath = java.nio.file.Paths.get(repoRoot, "BASELINE_LOCAL.json")
    val baseline: Map[String, Double] =
      if (java.nio.file.Files.exists(baselinePath))
        parseFlatJson(new String(java.nio.file.Files.readAllBytes(baselinePath), "UTF-8"))
      else Map.empty
    val regressed = results.collect {
      case (name, sec) if baseline.get(name).exists(b => sec > b * RegressionFactor) =>
        s"""{"query":"$name","baseline":${baseline(name)},"measured":$sec,"ratio":${sec / baseline(name)},"gc_sec":${gcByName(name)._2}}"""
    }
    // "errors" = failed every pass (no time at all); "flaky" = failed at
    // least one pass but has a real best-of time from a surviving pass
    val flaky = (failures.toSet -- errored).toSeq.sorted
    val errsJson =
      s""""errors":[${errored.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""flaky":[${flaky.map("\"" + _ + "\"").mkString(",")}]"""
    val metric = if (partial) "partial_total" else "total"
    val line =
      s"""{"metric":"$metric","value":$total,"unit":"sec","queries":$qs,"gc":$gcs,"sf":"$sfDir",$errsJson,"regressed":[${regressed.mkString(",")}]}"""
    // full-precision record: survives any stdout tail-window truncation.
    // Partial (family-filtered) runs write a SEPARATE file so the
    // driver-read full-suite record is never clobbered by a subset map.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(repoRoot, if (partial) "BENCH_LOCAL_partial.json" else "BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    // The driver keeps only the last ~2000 chars of stdout and parses the
    // JSON line out of that window; the full-precision line above is ~2.6 KB
    // and gets its head evicted (BENCH_r01-r04 all came back `parsed: null`)
    // — and a full per-query map cannot fit (80 query names alone are
    // ~1.4 KB and the set only grows). So the LAST line printed is a compact
    // summary guaranteed to fit whole: total + the 20 slowest queries
    // (3-decimal) + a pointer to BENCH_LOCAL.json, which carries every
    // query at full precision and is committed with the repo. `regressed`
    // is computed from full precision and capped at 10 entries here.
    def fmt(v: Double): String = {
      val s = f"$v%.3f"
      val t = s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      if (t.isEmpty) "0" else t
    }
    val slowest = results.sortBy(-_._2).take(20).sortBy(_._1)
    val qsCompact = slowest.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val sfLabel = java.nio.file.Paths.get(sfDir).getFileName.toString
    val regCompact = results.collect {
      case (name, sec) if baseline.get(name).exists(b => sec > b * RegressionFactor) =>
        s"""{"q":"$name","base":${fmt(baseline(name))},"got":${fmt(sec)},"gc":${fmt(gcByName(name)._2)}}"""
    }
    val regShown = regCompact.take(10)
    val compact =
      s"""{"metric":"$metric","value":${fmt(total)},"unit":"sec","n_queries":${results.size},""" +
        s""""queries_full":"${if (partial) "BENCH_LOCAL_partial.json" else "BENCH_LOCAL.json"}","queries":$qsCompact,"sf":"$sfLabel",""" +
        s""""n_errors":${errored.size},""" +
        s""""regressed_total":${regCompact.size},"regressed":[${regShown.mkString(",")}]}"""
    spark.stop()
    // after stop(): nothing (shutdown warnings included) may print below this
    println(compact)
  }
}
