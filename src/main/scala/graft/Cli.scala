package graft

import org.apache.spark.sql.SparkSession

import graft.operators.MapleJuice
import graft.sources.Catalog

/** Command-surface parity with the reference's stdin REPL (README.md:17-29
  * of the reference; client loop src/node.go:59-233):
  *
  *   PUT <sdfsname> <localfile>     upload/overwrite
  *   GET <sdfsname> <localfile>     download
  *   DELETE <sdfsname>              remove everywhere
  *   LS <sdfsname>                  where a file lives
  *   STORE                          names in the namespace
  *   LIST                           live cluster members
  *   SELF                           own id/uptime
  *   LEAVE                          stop the session
  *   ping                           liveness probe of every live executor
  *   maple <exe> <num_maples> <prefix> <src_prefix>
  *   juice <exe> <num_juices> <prefix> <dest> <delete_input 0|1>
  *   grep <pattern> <src_prefix>    distributed grep over named datasets
  *
  * Intermediate layout divergence (deliberate, SURVEY.md §2f): the reference
  * materializes one SDFS file per key named `<prefix>_<key>`
  * (src/node.go:933); here the shuffle is Spark's and the maple output is ONE
  * named dataset `<prefix>` of `key value` lines. juice consumes it by name.
  * Semantics (whole-group reduce over per-key values) are identical; the
  * per-key-file layout was an artifact of the reference's master-mediated
  * shuffle.
  */
final class Cli(spark: SparkSession, storageRoot: String) {
  val catalog      = new Catalog(spark, storageRoot)
  private val startedAt = System.currentTimeMillis()

  /** Dispatch one command line; returns the printable result. */
  def handle(line: String): String = {
    val parts = line.trim.split("\\s+").toList
    parts match {
      case Nil | List("") => ""
      case "PUT" :: name :: local :: Nil =>
        // reference parity: a PUT racing a <60s-old write needs confirmation
        // (src/master.go:121-178); non-interactively that is reject-by-default
        // with an explicit `PUT <name> <local> force` override (the "Y").
        try { catalog.put(name, local); s"put $name" }
        catch {
          case c: graft.sources.PutConflictException =>
            s"put conflict: ${c.getMessage} — rerun as: PUT $name $local force"
        }
      case "PUT" :: name :: local :: "force" :: Nil =>
        catalog.put(name, local, force = true); s"put $name"
      case "GET" :: name :: local :: Nil =>
        catalog.get(name, local); s"got $name -> $local"
      case "DELETE" :: name :: Nil =>
        if (catalog.delete(name)) s"deleted $name" else s"no such file $name"
      case "LS" :: name :: Nil =>
        val locs = catalog.ls(name)
        if (locs.isEmpty) s"no such file $name" else locs.mkString("\n")
      case "STORE" :: Nil =>
        catalog.store().mkString("\n")
      case "LIST" :: Nil =>
        // executor set = the engine's "membership list"
        spark.sparkContext.statusTracker.getExecutorInfos.map(_.host()).distinct.mkString("\n")
      case "SELF" :: Nil =>
        val up = (System.currentTimeMillis() - startedAt) / 1000
        s"${spark.sparkContext.applicationId} up ${up}s"
      case "LEAVE" :: Nil =>
        spark.stop(); "left"
      case ("ping" | "PING") :: Nil =>
        // reference README.md:17 "ping": the heartbeat liveness check. Here:
        // one no-op task per live core slot, round-trip timed — proves the
        // scheduler AND every responding executor are alive.
        val t0    = System.nanoTime()
        val slots = math.max(spark.sparkContext.defaultParallelism, 1)
        val hosts = spark.sparkContext
          .parallelize(1 to slots, slots)
          .map(_ => java.net.InetAddress.getLocalHost.getHostName)
          .distinct()
          .collect()
        val ms = (System.nanoTime() - t0) / 1e6
        f"pong from ${hosts.length} host(s) [${hosts.sorted.mkString(",")}] in $ms%.0f ms"
      case "maple" :: exe :: num :: prefix :: src :: Nil =>
        maple(exe, num.toInt, prefix, src)
      case "juice" :: exe :: num :: prefix :: dest :: del :: Nil =>
        juice(exe, num.toInt, prefix, dest, del == "1")
      case "grep" :: pattern :: src :: Nil =>
        // codegen'd rlike (unanchored find ≡ the reference's grep), not a
        // per-row closure recompiling the Pattern on every line
        import org.apache.spark.sql.functions.col
        val n = catalog.readPrefix(src).toDF("line").filter(col("line").rlike(pattern)).count()
        s"$n matching lines"
      case other =>
        s"unknown command: ${other.mkString(" ")}"
    }
  }

  /** maple: run the exe over every dataset with the src prefix, store the
    * shuffled `key value` pairs as dataset `<prefix>`. */
  def maple(exe: String, numMaples: Int, prefix: String, srcPrefix: String): String = {
    import spark.implicits._
    val lines = catalog.readPrefix(srcPrefix)
    // ship local exe files to every executor (reference README.md:27 done
    // automatically); PATH binaries/flags pass through
    val pairs = MapleJuice.mapleExe(lines, MapleJuice.ship(spark, exe.split(',').toSeq), numMaples)
    catalog.putText(prefix, pairs.map { case (k, v) => s"$k $v" })
    s"maple $prefix done"
  }

  /** juice: group dataset `<prefix>` by key, reduce each group with the exe,
    * store `key value` results as dataset `<dest>`. */
  def juice(exe: String, numJuices: Int, prefix: String, dest: String, deleteInput: Boolean): String = {
    import spark.implicits._
    val pairs = catalog
      .readText(prefix)
      .flatMap(MapleJuice.parseKV(_))
    val reduced = MapleJuice.juiceExe(pairs, MapleJuice.ship(spark, exe.split(',').toSeq), numJuices)
    catalog.putText(dest, reduced.map { case (k, v) => s"$k $v" })
    if (deleteInput) catalog.delete(prefix)
    s"juice $dest done"
  }
}

object Cli {
  def main(args: Array[String]): Unit = {
    val root  = args.headOption.getOrElse("/tmp/graft_storage")
    val spark = Engine.session()
    val cli   = new Cli(spark, root)
    println(s"graft engine CLI — storage root $root (LEAVE to exit)")
    Iterator
      .continually(scala.io.StdIn.readLine("> "))
      .takeWhile(l => l != null && l.trim != "LEAVE")
      .foreach(l => println(cli.handle(l)))
    spark.stop()
  }
}
