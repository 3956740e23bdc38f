package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

/** SDFS-equivalent namespace: a flat catalog of named line-text datasets.
  *
  * The reference's SDFS (src/master.go, src/replication.go) hand-implements a
  * replicated flat-namespace file store: FNV-32a placement to 4 replicas
  * (src/master_helpers.go:25,84-139), broadcast metadata tables
  * (src/node.go:24,701-723), and re-replication on failure
  * (src/replication.go:11-91). On Spark, durability and replication are the
  * storage layer's job (HDFS replication factor / object-store redundancy), so
  * the catalog is just a namespace → path mapping over a storage root, using
  * the Hadoop FileSystem API so the same code runs on local FS, HDFS, or S3A.
  *
  * Command surface parity (README.md:17-29 of the reference):
  * PUT / GET / DELETE / LS / STORE, plus prefix listing used by maple source
  * scans (src/master.go:448-453).
  */
final class Catalog(spark: SparkSession, root: String, putConflictWindowMs: Long = Catalog.DefaultConflictWindowMs) {
  private val conf: Configuration = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem      = new Path(root).getFileSystem(conf)
  private def pathOf(name: String): Path = new Path(root, name)

  fs.mkdirs(new Path(root))

  /** PUT: upload a local file under a global name (overwrite semantics, like
    * the reference's subsequent-PUT branch src/master.go:212-298).
    *
    * Write-write conflict window: the reference interactively confirms a PUT
    * landing within 60 s of the previous write to the same name
    * (src/master.go:121-178, src/master.go:225-227, minute=60 at
    * src/master_helpers.go:27). The non-interactive equivalent here: the
    * racing PUT is REJECTED with [[PutConflictException]] unless
    * `force = true` (the "Y" answer). The last-write time is the storage
    * layer's modification time, so the check holds across concurrent
    * clients of the same namespace — no driver-local state. Engine-native
    * writes ([[putText]]/[[putTable]]) are deliberate pipeline sinks, not
    * interactive uploads, and keep plain overwrite semantics. */
  def put(name: String, localFile: String, force: Boolean = false): Unit = {
    if (!force && putConflictWindowMs > 0) {
      val p = pathOf(name)
      if (fs.exists(p)) {
        val ageMs = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
        if (ageMs < putConflictWindowMs) throw new PutConflictException(name, ageMs, putConflictWindowMs)
      }
    }
    fs.copyFromLocalFile(false, true, new Path(localFile), pathOf(name))
  }

  /** PUT of an in-memory dataset (engine-native write path). */
  def putText(name: String, ds: Dataset[String]): Unit = {
    val tmp = pathOf(name + ".__tmp__")
    ds.write.mode("overwrite").text(tmp.toString)
    val dst = pathOf(name)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  /** GET: copy an SDFS file to a local path (src/node.go:336-418). */
  def get(name: String, localFile: String): Unit =
    fs.copyToLocalFile(pathOf(name), new Path(localFile))

  /** Read a named dataset as lines (the engine-native GET). */
  def readText(name: String): Dataset[String] =
    spark.read.textFile(pathOf(name).toString)

  /** Read every dataset whose name starts with `prefix` — the reference's
    * "directory" concept (src/master.go:448-453: prefix match over the file
    * table). */
  def readPrefix(prefix: String): Dataset[String] = {
    val names = lsPrefix(prefix)
    require(names.nonEmpty, s"no catalog entries with prefix '$prefix'")
    spark.read.textFile(names.map(n => pathOf(n).toString): _*)
  }

  /** Structured dataset write: parquet (default), orc, csv, or json under
    * the same flat namespace. The reference is text-only (SURVEY.md §2a
    * "File formats"); structured formats are the engine's extension. */
  def putTable(name: String, df: org.apache.spark.sql.DataFrame, format: String = "parquet"): Unit = {
    val tmp = pathOf(name + ".__tmp__")
    val w   = df.write.mode("overwrite")
    format match {
      case "parquet" => w.parquet(tmp.toString)
      case "orc"     => w.orc(tmp.toString)
      case "csv"     => w.option("header", "true").csv(tmp.toString)
      case "json"    => w.json(tmp.toString)
      case other     => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    val dst = pathOf(name)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  /** Structured dataset read, format-symmetric with [[putTable]]. For csv,
    * pass `schema` to avoid a driver inference pass over the data. */
  def readTable(
      name: String,
      format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None): org.apache.spark.sql.DataFrame = {
    val p = pathOf(name).toString
    format match {
      case "parquet" => spark.read.parquet(p)
      case "orc"     => spark.read.orc(p)
      case "csv" =>
        val r = spark.read.option("header", "true")
        schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(p)
      case "json" =>
        val r = spark.read
        schema.fold(r)(s => r.schema(s)).json(p)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  /** DELETE from all replicas + metadata (src/master.go:82-108) — on Spark,
    * one recursive FS delete. */
  def delete(name: String): Boolean = fs.delete(pathOf(name), true)

  /** LS: where a file lives (src/node.go:191-204). The reference prints the 4
    * replica node ids; here the storage layer owns placement, so we report the
    * fully-qualified path(s) + block locations when the FS exposes them. */
  def ls(name: String): Seq[String] = {
    val p = pathOf(name)
    if (!fs.exists(p)) Seq.empty
    else {
      val status = fs.getFileStatus(p)
      if (status.isDirectory) Seq(p.toString)
      else
        fs.getFileBlockLocations(status, 0L, status.getLen)
          .flatMap(_.getHosts)
          .toSeq match {
          case Nil   => Seq(p.toString)
          case hosts => hosts.map(h => s"${p.toString}@$h")
        }
    }
  }

  /** STORE: list every name in the namespace (src/node.go:211-217 lists the
    * local node's files; with storage-layer placement the namespace itself is
    * the answer). */
  def store(): Seq[String] =
    if (!fs.exists(new Path(root))) Seq.empty
    else fs.listStatus(new Path(root)).map(_.getPath.getName).toSeq.sorted

  def lsPrefix(prefix: String): Seq[String] =
    store().filter(_.startsWith(prefix))

  def exists(name: String): Boolean = fs.exists(pathOf(name))
}

object Catalog {
  /** Reference parity: `minute = 60` seconds at src/master_helpers.go:27. */
  val DefaultConflictWindowMs: Long = 60000L
}

/** A PUT raced a recent write to the same name (within the reference's 60 s
  * confirm window) and was rejected; retry with `force = true` to overwrite. */
final class PutConflictException(val name: String, val ageMs: Long, val windowMs: Long)
    extends RuntimeException(
      s"'$name' was written ${ageMs}ms ago (< ${windowMs}ms conflict window)")
