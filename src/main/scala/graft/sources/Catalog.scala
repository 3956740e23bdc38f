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
final class Catalog(
    spark: SparkSession,
    root: String,
    putConflictWindowMs: Long = Catalog.DefaultConflictWindowMs,
    writerLeaseMs: Long = Catalog.DefaultWriterLeaseMs,
    retainVersions: Int = Catalog.DefaultRetainVersions) {
  require(retainVersions >= 2, s"retainVersions must be >= 2 (current + previous), got $retainVersions")
  import Catalog.{OldSuffix, SystemDirs, TmpSuffix, VersionRe}
  private val conf: Configuration = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem      = new Path(root).getFileSystem(conf)
  private def pathOf(name: String): Path = new Path(root, name)

  fs.mkdirs(new Path(root))

  /** The qualified storage root — the identity of this namespace. Two
    * Catalog instances with equal rootPath address the SAME tables, which
    * is what cross-instance coordinators (e.g. AnnIndex's per-name
    * maintenance locks) must key on instead of instance identity. */
  def rootPath: String = fs.makeQualified(new Path(root)).toString

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
    * interactive uploads, and keep plain overwrite semantics.
    *
    * The check is BEST-EFFORT, exactly like the reference's (its master
    * serializes the check through one goroutine but a crashed confirmer
    * leaves the same race): check-then-act over storage modtime means two
    * racing PUTs can both observe an old modtime and both proceed — true
    * exclusion would need an atomic create on the storage layer. A negative
    * age (client clock behind the storage clock, i.e. skew) is treated as
    * conflicting rather than silently passing, since it proves the modtime
    * is too fresh to trust. */
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

  /** Per-name monitor so in-process concurrent overwrites of the same name
    * serialize. Cross-JVM writers remain best-effort (documented at [[put]]);
    * cross-JVM READERS are always safe — the publish protocol below never
    * renames or deletes a directory a reader could currently hold. */
  private val nameLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(name: String): Object =
    nameLocks.computeIfAbsent(name, _ => new Object)

  /** Overwrite publishing — why versioned write-once dirs and not renames.
    *
    * The reference blocks GET while a PUT is in flight (src/master.go:72-113)
    * so a reader never observes a half-written or missing file. A lock-free
    * engine needs the equivalent guarantee structurally. Delete-then-rename
    * leaves a reader-visible hole; even a tight rename-shuffle breaks Spark
    * readers, which capture concrete part-file paths at load time and open
    * them later — any rename of the live directory invalidates in-flight
    * scans. And on object stores (the 100 TB deployment target) directory
    * rename isn't atomic at all — it's copy+delete.
    *
    * So engine-native writes never mutate a published directory:
    *
    *   - each put writes a fresh dir `name.__v<N>__` (N strictly increasing);
    *     the `_SUCCESS` marker the committer writes last makes it visible
    *   - readers resolve `name` → the highest `_SUCCESS`-complete version
    *   - the writer retains the immediately-previous complete version and
    *     garbage-collects older ones, so a reader that resolved the previous
    *     version mid-write keeps its snapshot until two further puts complete
    *     — with full Spark write jobs in between, a practical impossibility
    *     for an in-flight scan
    *
    * This is the same write-once-plus-pointer discipline table formats use
    * (Iceberg/Delta); the "pointer" here is the max-complete-version listing
    * rule, which needs no atomic file replace from the storage layer. */
  private def versionDirs(name: String): Seq[(Long, Path)] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else
      fs.listStatus(rootPath).toSeq.flatMap { st =>
        st.getPath.getName match {
          case VersionRe(base, n) if base == name => Some((n.toLong, st.getPath))
          case _                                  => None
        }
      }
  }

  private def isComplete(dir: Path): Boolean = fs.exists(new Path(dir, "_SUCCESS"))

  /** Resolve `name` to a currently-readable path: the newest complete
    * version dir, else the plain path (interactive [[put]] uploads / legacy
    * layouts). */
  private def resolveReadable(name: String): Path =
    versionDirs(name)
      .filter { case (_, p) => isComplete(p) }
      .sortBy(-_._1)
      .headOption
      .map(_._2)
      .getOrElse(pathOf(name))

  /** Run `write` into the next version dir for `name`, then GC: drop failed
    * partials and every complete version older than the immediately-previous
    * one, plus any plain-path upload this engine-native write shadows.
    *
    * Manifest awareness: a retained MANIFEST version ([[appendTable]] /
    * [[deleteWhere]]) may reference data files living in an OLDER version
    * dir or at the plain path (the append chained off them without
    * rewriting). Deleting those dirs would corrupt the live table, so the
    * GC first collects every directory the retained manifests reference and
    * skips it. Unreferenced superseded dirs die exactly as before; the ones
    * a manifest keeps alive die on a later publish, once rewrites (compact /
    * deleteWhere) drop the last reference. Blob-area (`<name>.__data__`)
    * garbage is [[vacuum]]'s job — version GC never reaches in there. */
  // ------------------------------------------- commit counter + writer lease

  /** Per-name commit HIGH-WATER MARK, stored OUTSIDE the name's own
    * directory tree (`__hwm__/<name>`) so it SURVIVES [[delete]]: version
    * numbers are monotonic across the name's whole lifetime, including
    * DELETE + re-PUT. Without it, numbering restarts at v1 after a delete
    * and [[readTableVersion]] time travel could silently conflate a
    * pre-delete generation's version id with the re-put table's — the
    * reference's `files_present`/`last_processed` metadata likewise never
    * reuses state across DELETE (src/master.go:82-108). A missing or
    * unparsable mark degrades to the directory scan (the pre-hwm
    * behavior), never an error. */
  private def hwmPath(name: String): Path = new Path(root, s"__hwm__/$name")

  private def readHwm(name: String): Long = {
    val p = hwmPath(name)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        new String(bytes.toByteArray, "UTF-8").trim.toLongOption.getOrElse(0L)
      } finally in.close()
    }
  }

  private def writeHwm(name: String, v: Long): Unit = {
    val p = hwmPath(name)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** CROSS-JVM writer fence: every publish takes a create-exclusive lease
    * file (`__locks__/<name>.lock`) for the duration of the write. The
    * in-process per-name monitors serialize writers within one driver;
    * two DRIVERS publishing the same name could still interleave version
    * scans and GC — the reference solves this with a single master
    * serializing all writes through one goroutine (src/master.go:212-298);
    * the storage-level equivalent is an exclusive-create lock (atomic on
    * HDFS and local FS; object stores want a conditional put). A held
    * lease REFUSES loudly ([[ConcurrentWriteException]]) rather than
    * queueing — the caller decides whether to retry. Leases from crashed
    * writers expire after `writerLeaseMs` (age by storage modtime) and are
    * taken over; the default is generous because a lease spans a full
    * Spark write job. `writerLeaseMs <= 0` disables the fence. */
  private def leasePath(name: String): Path = new Path(root, s"__locks__/$name.lock")

  private def acquireLease(name: String): Unit = {
    if (writerLeaseMs <= 0L) return
    val p = leasePath(name)
    fs.mkdirs(p.getParent)
    if (fs.exists(p)) {
      val ageMs = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
      if (ageMs > writerLeaseMs) fs.delete(p, false) // expired: crashed writer
      else throw new ConcurrentWriteException(name, ageMs, writerLeaseMs)
    }
    val out =
      try fs.create(p, false)
      catch {
        case _: java.io.IOException => // lost the create race to another writer
          throw new ConcurrentWriteException(name, 0L, writerLeaseMs)
      }
    try out.write(s"${java.lang.ProcessHandle.current().pid()}\n".getBytes("UTF-8"))
    finally out.close()
  }

  private def releaseLease(name: String): Unit =
    if (writerLeaseMs > 0L) fs.delete(leasePath(name), false)

  private def publishVersion(name: String)(write: Path => Unit): Unit =
    lockFor(name).synchronized {
      acquireLease(name)
      try publishVersionLocked(name)(write)
      finally releaseLease(name)
    }

  private def publishVersionLocked(name: String)(write: Path => Unit): Unit = {
      val existing = versionDirs(name)
      // next = max(directory scan, lifetime high-water mark) + 1: the scan
      // alone restarts at 1 after DELETE wiped the dirs; the mark survives
      val next =
        math.max(existing.map(_._1).maxOption.getOrElse(0L), readHwm(name)) + 1L
      write(pathOf(s"$name.__v${next}__"))
      writeHwm(name, next)
      // protect the OWNING version/blob directory of every referenced
      // file, not its immediate parent: a hive-partitioned file's parent
      // is the leaf `k=v` dir, which the version-dir GC check below would
      // never match — the naive parent mapping silently deleted a
      // partitioned base dir out from under manifests that still
      // referenced its files (flat tables only survived because there
      // parent == version dir)
      // the GC horizon: keep the newest `retainVersions` complete versions
      // (default 2 = current + previous, the minimum reader-stability
      // window) — a deployment wanting deeper time travel / changefeed
      // history raises the knob, not the protocol
      val horizon = next - (retainVersions - 1)
      // protection = files referenced by this table's retained manifests
      // PLUS files referenced by any live shallow clone of this table
      // (cloneTable publishes manifests that point INTO this table's
      // version/blob dirs — without the cross-table set, the third publish
      // after a clone would GC the clone's data out from under it)
      val protectedDirs: Set[Path] = (versionDirs(name)
        .filter { case (v, p) => v >= horizon && isComplete(p) }
        .flatMap { case (_, p) => manifestOf(p).getOrElse(Nil) }
        ++ cloneProtectedFiles(name))
        .map(protectRootOf)
        .toSet
      versionDirs(name).foreach { case (v, p) =>
        if (v < next && (v < horizon || !isComplete(p)) &&
            !protectedDirs.contains(fs.makeQualified(p))) fs.delete(p, true)
      }
      // a superseded interactive upload at the plain path; versioned reads
      // shadow it already, delete only once the new version is live (and
      // never while a retained manifest still references its files)
      if (fs.exists(pathOf(name)) && !protectedDirs.contains(fs.makeQualified(pathOf(name))))
        fs.delete(pathOf(name), true)
    }

  /** The GC-protection root of a referenced data file: its ancestor
    * version dir (`*.__vN__`), blob area (`*.__data__`), or — for legacy
    * plain layouts — the file's own directory. This is the unit the
    * version GC deletes, so it is the unit protection must name. */
  private def protectRootOf(file: String): Path = {
    val rootQ = fs.makeQualified(new Path(root))
    var p     = fs.makeQualified(new Path(file)).getParent
    var last  = p
    while (p != null && p != rootQ) {
      val n = p.getName
      if (VersionRe.matches(n) || n.endsWith(".__data__")) return p
      last = p
      p = p.getParent
    }
    // no version/blob ancestor below the root: a legacy plain layout —
    // protect the topmost dir under the root (the plain table dir itself)
    last
  }

  // --------------------------------------------------- manifest plumbing

  private val ManifestFile = "_MANIFEST"

  /** The file list a complete manifest version references (absolute paths,
    * one per line), or None for a plain materialized version dir. */
  private def manifestOf(dir: Path): Option[Seq[String]] = {
    val m = new Path(dir, ManifestFile)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, false)
        Some(new String(bytes.toByteArray, "UTF-8").linesIterator.filter(_.nonEmpty).toSeq)
      } finally in.close()
    }
  }

  private val ManifestSchemaFile = "_SCHEMA.json"

  private val CommitFile = "_COMMIT"

  /** Publish a manifest version: the file list, the table schema (so an
    * all-rows-deleted empty manifest still reads with its schema, and
    * manifest reads never pay a footer-inference pass), an optional
    * commit id (the exactly-once marker for streaming appends), and the
    * _SUCCESS completeness marker — marker LAST, so a crash mid-write never
    * leaves a resolvable half-version, and the commit id becomes visible
    * atomically WITH the data it stamps. */
  private def writeManifest(
      dir: Path,
      files: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      commitId: Option[Long] = None): Unit = {
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, ManifestFile), true)
    try out.write(files.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val sOut = fs.create(new Path(dir, ManifestSchemaFile), true)
    try sOut.write(schema.json.getBytes("UTF-8"))
    finally sOut.close()
    commitId.foreach { id =>
      val cOut = fs.create(new Path(dir, CommitFile), true)
      try cOut.write(id.toString.getBytes("UTF-8"))
      finally cOut.close()
    }
    val marker = new Path(dir, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker).close()
  }

  /** Highest commit id stamped on any retained complete version, -1 if
    * none. Valid as a replay guard while the stream is the table's sole
    * writer (the ingest deployment) — an interleaved non-stream write
    * publishes without a stamp and eventually GCs the stamped version. */
  private def lastCommittedBatch(name: String): Long =
    versionDirs(name)
      .filter { case (_, p) => isComplete(p) }
      .flatMap { case (_, p) =>
        val c = new Path(p, CommitFile)
        if (!fs.exists(c)) None
        else {
          val in = fs.open(c)
          try {
            val bytes = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
            Some(new String(bytes.toByteArray, "UTF-8").trim.toLong)
          } finally in.close()
        }
      }
      .maxOption
      .getOrElse(-1L)

  private def manifestSchemaOf(dir: Path): Option[org.apache.spark.sql.types.StructType] = {
    val m = new Path(dir, ManifestSchemaFile)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, false)
        Some(
          org.apache.spark.sql.types.DataType
            .fromJson(new String(bytes.toByteArray, "UTF-8"))
            .asInstanceOf[org.apache.spark.sql.types.StructType])
      } finally in.close()
    }
  }

  /** Manifest-aware parquet read of a resolved version path. A version
    * carrying a deletion vector ([[deleteByKeys]]) serves its EFFECTIVE
    * rows: data files anti-joined against the (broadcast, tombstone-sized)
    * key set — merge-on-read, every reader, including time travel (each
    * version applies ITS OWN vector). */
  private def readParquetAt(p: Path): org.apache.spark.sql.DataFrame =
    manifestOf(p) match {
      case Some(files) =>
        val schema = manifestSchemaOf(p).getOrElse(
          throw new IllegalStateException(s"corrupt manifest version at $p: no $ManifestSchemaFile"))
        val df =
          if (files.isEmpty)
            spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
          else readFilesWithLayout(files, schema)
        applyDeletesOf(p, df)
      case None => spark.read.parquet(p.toString)
    }

  /** RAW physical read of the current version — the manifest's files
    * WITHOUT the deletion-vector anti-join. For the per-FILE index/stat
    * builders only (`input_file_name()` cannot span the anti-join, and an
    * index describing a file's physical contents is exactly right: a
    * tombstoned row in a Bloom or zone map costs a false positive, never
    * a false negative — conservative, like every prune tier). */
  private def readTableRaw(name: String, format: String = "parquet"): org.apache.spark.sql.DataFrame =
    format match {
      case "parquet" =>
        val p = resolveReadable(name)
        manifestOf(p) match {
          case Some(files) =>
            val schema = manifestSchemaOf(p).getOrElse(
              throw new IllegalStateException(s"corrupt manifest version at $p: no $ManifestSchemaFile"))
            if (files.isEmpty)
              spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
            else readFilesWithLayout(files, schema)
          case None => spark.read.parquet(p.toString)
        }
      case other => readTable(name, other)
    }

  // ------------------------------- deletion vectors (merge-on-read DELETE)

  private val DeletesDir = "_DELETES"

  /** The deletion vector of a version dir: a one-column parquet frame
    * whose column IS the key column, or None. Lives INSIDE the version
    * dir, so it versions, time-travels, GC-protects, and DELETE-purges
    * with its manifest for free. */
  private def deletesAt(dir: Path): Option[org.apache.spark.sql.DataFrame] = {
    val p = new Path(dir, DeletesDir)
    if (!fs.exists(p)) None else Some(spark.read.parquet(p.toString))
  }

  /** Anti-join `df` against the version's deletion vector (broadcast —
    * vectors are tombstone-sized by contract). Rows with a NULL key
    * survive: a NULL never equals a tombstoned key, the same semantics
    * every equality path in the engine keeps. */
  private def applyDeletesOf(dir: Path, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    deletesAt(dir) match {
      case None => df
      case Some(dv) =>
        import org.apache.spark.sql.functions.broadcast
        val kc = dv.schema.fields.head.name
        df.join(broadcast(dv), df(kc) === dv(kc), "left_anti")
    }

  /** Apply the CURRENT version's deletion vector — for pruned path-list
    * reads ([[readTableWhereAll]] tier 2, [[readTableLookupIn]],
    * [[grepPruned]]) that bypass [[readParquetAt]]. */
  private def applyCurrentDeletes(name: String, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    applyDeletesOf(resolveReadable(name), df)

  /** Copy the previous version's deletion vector into a new version dir —
    * the carry-forward every delta-publishing verb (append, evolve,
    * clone, restore) performs BEFORE its `_SUCCESS` marker exists, so no
    * crash point yields a complete version whose tombstones vanished. */
  private def carryDeletes(fromDir: Path, toDir: Path): Unit = {
    val src = new Path(fromDir, DeletesDir)
    if (fs.exists(src)) {
      fs.mkdirs(toDir)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, new Path(toDir, DeletesDir), false, conf): Unit
    }
  }

  /** Loud guard for verbs whose file-granular rewrites don't understand
    * vectors yet ([[deleteWhere]], [[upsertTable]], [[compactSmallFiles]]):
    * run [[mergeDeletes]] first. (Full rewrites — [[compact]],
    * [[compactZOrdered]] — go through [[readTable]], which applies the
    * vector, so they materialize the deletes correctly and need no guard.) */
  private def requireNoDeletes(name: String, verb: String): Unit =
    require(
      deletesAt(resolveReadable(name)).isEmpty,
      s"$verb on '$name' refused: a deletion vector is pending — run mergeDeletes('$name') first")

  /** Merge-on-read DELETE by key — the scattered-delete shape
    * (GDPR "remove user X everywhere") where [[deleteWhere]]'s
    * copy-on-write rewrite is wrong at scale: when the matching rows are
    * scattered across a 100-TB table, the candidate set is EVERY file and
    * CoW rewrites the corpus. This verb rewrites NOTHING: it publishes a
    * new version with the SAME file list plus a deletion vector (the
    * distinct key set, one column named as the key), and every reader —
    * live reads, pruned reads, time travel, the changefeed — serves
    * effective rows by anti-joining the broadcast vector. O(tombstones)
    * write; read overhead is one broadcast anti-join until
    * [[mergeDeletes]] folds the vector into a targeted rewrite.
    *
    * `keys` must be exactly one column, named as the table's key column;
    * it is cast to the column's type (the vector must probe in the
    * column's exact domain) and unioned with any pending vector (same key
    * column required — one key domain per table at a time). Appending a
    * tombstoned key refuses loudly ([[appendTable]]'s resurrect guard);
    * bucketed tables refuse (their layout contract is rewrite-based).
    * Returns a one-row report (n_tombstones_total, n_tombstones_new). */
  def deleteByKeys(name: String, keys: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    lockFor(name).synchronized {
      import org.apache.spark.sql.functions.col
      require(
        keys.schema.fields.length == 1,
        s"keys frame must carry exactly the key column, got ${keys.schema.fieldNames.mkString(",")}")
      val keyCol = keys.schema.fields.head.name
      require(
        !this.exists(s"$name.__bucketspec__"),
        s"'$name' is bucketed — deletion vectors would break the bucket-file contract; use deleteWhere")
      val cur    = resolveReadable(name)
      val schema = manifestSchemaOf(cur).getOrElse(readTable(name).schema)
      val field = schema.fields
        .find(_.name == keyCol)
        .getOrElse(throw new IllegalArgumentException(s"no key column '$keyCol' in $name"))
      val prev = deletesAt(cur)
      prev.foreach(d =>
        require(
          d.schema.fields.head.name == keyCol,
          s"pending deletion vector of '$name' is keyed by '${d.schema.fields.head.name}' — " +
            s"one key domain per table; mergeDeletes first"))
      val typed = keys.select(col(keyCol).cast(field.dataType).as(keyCol)).na.drop().distinct()
      val nPrev = prev.map(_.count()).getOrElse(0L)
      val newDv = prev.fold(typed)(d => d.unionByName(typed).distinct()).persist()
      try {
        val nTotal = newDv.count()
        val files  = liveFiles(name)
        publishVersion(name) { dir =>
          newDv.write.mode("overwrite").parquet(new Path(dir, DeletesDir).toString)
          writeManifest(dir, files, schema)
        }
        spark
          .createDataFrame(Seq((nTotal, nTotal - nPrev)))
          .toDF("n_tombstones_total", "n_tombstones_new")
      } finally { newDv.unpersist(); () }
    }

  /** [[deleteByKeys]] convenience for a driver-side key list. */
  def deleteByKeys(name: String, keyCol: String, values: Seq[Any]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{array, explode, lit}
    require(values.nonEmpty, "deleteByKeys needs at least one key")
    deleteByKeys(
      name,
      spark.range(1).select(explode(array(values.map(lit): _*)).as(keyCol)))
  }

  /** The pending deletion vector (empty frame when none) — audit surface. */
  def deletedKeysOf(name: String): Option[org.apache.spark.sql.DataFrame] =
    deletesAt(resolveReadable(name))

  /** Fold the pending deletion vector into a TARGETED rewrite — the
    * maintenance half of merge-on-read (Delta/Iceberg's rewrite of
    * position/equality deletes): rewrite ONLY the files that can contain
    * a tombstoned key — pruned through the per-file value Blooms
    * ([[analyzeBloomIndex]]) when a fresh index covers the key column,
    * every file otherwise (correct, just unpruned) — anti-joined against
    * the broadcast vector, republish untouched files verbatim, drop the
    * vector. Read results are bit-identical before and after (the spec's
    * invariant); what changes is that readers stop paying the anti-join.
    * Returns (n_files_live, n_files_rewritten, n_tombstones_merged). */
  def mergeDeletes(name: String): org.apache.spark.sql.DataFrame = lockFor(name).synchronized {
    import org.apache.spark.sql.functions.{broadcast, col, xxhash64}
    val cur = resolveReadable(name)
    def report(live: Long, rewritten: Long, merged: Long) =
      spark
        .createDataFrame(Seq((live, rewritten, merged)))
        .toDF("n_files_live", "n_files_rewritten", "n_tombstones_merged")
    deletesAt(cur) match {
      case None => report(liveFiles(name).size.toLong, 0L, 0L) // idempotent no-op
      case Some(dv) =>
        val keyCol = dv.schema.fields.head.name
        val schema = manifestSchemaOf(cur).getOrElse(readTable(name).schema)
        val files  = liveFiles(name)
        def norm(s: String): String = new Path(s).toUri.getPath
        val currentVersion = versions(name).headOption.getOrElse(-1L)
        // candidate selection through the value Blooms when fresh: a file
        // whose Bloom misses EVERY tombstoned key provably holds none
        val candidateNorm: Option[Set[String]] =
          if (!this.exists(s"$name.__valbloom__")) None
          else {
            val idx = readTable(s"$name.__valbloom__")
              .filter(col("colname") === keyCol)
              .collect()
            val fresh = idx.nonEmpty && currentVersion >= 0 &&
              idx.forall(_.getAs[Long]("analyzed_version") == currentVersion)
            if (!fresh) None
            else {
              val hashes = dv.select(xxhash64(col(keyCol))).collect().map(_.getLong(0)) // tombstone-sized
              Some(idx.collect {
                case r
                    if hashes.exists(h =>
                      graft.functions.Bloom
                        .testLocal(r.getAs[Seq[Long]]("bits").toArray, r.getAs[Int]("num_hashes"), h)) =>
                  norm(r.getAs[String]("file"))
              }.toSet)
            }
          }
        val (candidates, untouched) = candidateNorm match {
          case Some(c) => files.partition(f => c.contains(norm(f)))
          case None    => (files, Seq.empty[String])
        }
        val nTomb = dv.count()
        val rewrittenFiles =
          if (candidates.isEmpty) Seq.empty[String]
          else {
            val cand     = readFilesWithLayout(candidates, schema)
            val partCols = partitionColsOf(candidates)
            val gen      = new Path(pathOf(s"$name.__data__"), s"gen-${java.util.UUID.randomUUID()}")
            val w = cand
              .join(broadcast(dv), cand(keyCol) === dv(keyCol), "left_anti")
              .write
              .mode("overwrite")
            (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(gen.toString)
            listDataFiles(gen)
          }
        publishVersion(name)(dir => writeManifest(dir, untouched ++ rewrittenFiles, schema))
        report(files.size.toLong, candidates.size.toLong, nTomb)
    }
  }

  /** Parquet data files under `dir` (committer markers and metadata
    * excluded), as absolute path strings — RECURSIVE, preserving hive
    * partition paths (`partCol=…` subdirs from [[putPartitionedTable]]),
    * so manifest mutations and file-granular services see a partitioned
    * table's full file set. A flat listing here once silently truncated a
    * partitioned table to its delta on the next manifest publish; every
    * consumer now goes through [[readFilesWithLayout]], which restores
    * partition-column values from the directory names. */
  private def listDataFiles(dir: Path): Seq[String] =
    fs.listStatus(dir)
      .toSeq
      .filterNot(st => st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
      .flatMap { st =>
        if (st.isDirectory) listDataFiles(st.getPath)
        else Seq(st.getPath.toString)
      }

  /** The index of the table-directory segment (`<name>.__vN__` version dir
    * or `<name>.__data__` blob area) in a catalog file path's segments —
    * hive `k=v` detection must scan strictly BELOW it. Anchoring matters:
    * a `=` in the catalog ROOT itself (an object-store prefix or run dir
    * like `.../run=5/...`) is not a partition directory, and treating it
    * as one would misclassify every table under that root as partitioned
    * (bogus basePath, fabricated columns on reads, partitionBy on
    * nonexistent columns during mutations). -1 when the path is not a
    * versioned/blob layout (legacy plain dirs — never partitioned). */
  private def tableDirIdx(segs: Array[String]): Int =
    segs.indexWhere(s => VersionRe.matches(s) || s.endsWith(".__data__"))

  /** The path prefix ending just BEFORE the first hive `k=v` directory
    * segment BELOW the table/version directory — the `basePath` Spark
    * needs to re-derive partition-column values when reading that file by
    * explicit path. None for flat files (the trailing segment is the
    * filename and never counts). */
  private def hiveBaseOf(file: String): Option[String] = {
    val segs   = file.split('/')
    val anchor = tableDirIdx(segs)
    if (anchor < 0) return None
    val i = segs.indexWhere(_.contains("="), anchor + 1)
    if (i <= 0 || i == segs.length - 1) None
    else Some(segs.take(i).mkString("/"))
  }

  /** The hive partition COLUMNS a file list carries (directory-segment
    * keys in path order, scanned below the table dir like [[hiveBaseOf]]),
    * from its first partitioned member — empty for a flat layout.
    * putPartitionedTable writes one level, but the walk is generic over
    * nested layouts. */
  private def partitionColsOf(files: Seq[String]): Seq[String] =
    files
      .find(f => hiveBaseOf(f).isDefined)
      .toSeq
      .flatMap { f =>
        val segs = f.split('/')
        segs
          .slice(tableDirIdx(segs) + 1, segs.length - 1)
          .filter(_.contains("="))
          .map(_.takeWhile(_ != '='))
          .toSeq
      }

  /** Read an explicit FILE LIST with hive-layout awareness: files under a
    * partitioned directory are grouped by their [[hiveBaseOf]] prefix and
    * read with `basePath` so the partition column comes back from the
    * directory names (a bare explicit-schema path read would fill it with
    * NULLs — silently wrong rows); flat files read plainly. One group per
    * layout root (manifests mix the original PUT's root with blob
    * generations), unioned by name under the single explicit schema. */
  private def readFilesWithLayout(
      files: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    require(files.nonEmpty, "readFilesWithLayout needs at least one file")
    files
      .groupBy(hiveBaseOf)
      .toSeq
      .sortBy(_._1.getOrElse(""))
      .map { case (base, group) =>
        val r0 = spark.read.schema(schema)
        val r  = base.fold(r0)(b => r0.option("basePath", b))
        if (format == "orc") r.orc(group: _*) else r.parquet(group: _*)
      }
      .reduce(_ unionByName _)
  }

  /** The data files the CURRENT readable version comprises: the manifest's
    * list for a manifest version, the dir listing otherwise. */
  private def liveFiles(name: String): Seq[String] = {
    val p = resolveReadable(name)
    manifestOf(p).getOrElse(listDataFiles(p))
  }

  /** PUT of an in-memory dataset (engine-native write path). */
  def putText(name: String, ds: Dataset[String]): Unit =
    publishVersion(name)(dir => ds.write.mode("overwrite").text(dir.toString))

  /** GET: copy an SDFS file to a local path (src/node.go:336-418). */
  def get(name: String, localFile: String): Unit =
    fs.copyToLocalFile(resolveReadable(name), new Path(localFile))

  /** Read a named dataset as lines (the engine-native GET). */
  def readText(name: String): Dataset[String] =
    spark.read.textFile(resolveReadable(name).toString)

  /** Read every dataset whose name starts with `prefix` — the reference's
    * "directory" concept (src/master.go:448-453: prefix match over the file
    * table). */
  def readPrefix(prefix: String): Dataset[String] = {
    val names = lsPrefix(prefix)
    require(names.nonEmpty, s"no catalog entries with prefix '$prefix'")
    spark.read.textFile(names.map(n => resolveReadable(n).toString): _*)
  }

  /** Structured dataset write: parquet (default), orc, csv, or json under
    * the same flat namespace. The reference is text-only (SURVEY.md §2a
    * "File formats"); structured formats are the engine's extension. */
  def putTable(name: String, df: org.apache.spark.sql.DataFrame, format: String = "parquet"): Unit =
    publishVersion(name) { dir =>
      val w = df.write.mode("overwrite")
      format match {
        case "parquet" => w.parquet(dir.toString)
        case "orc"     => w.orc(dir.toString)
        case "csv"     => w.option("header", "true").csv(dir.toString)
        case "json"    => w.json(dir.toString)
        case other     => throw new IllegalArgumentException(s"unsupported format: $other")
      }
    }

  /** Hive-layout PUT: the rows land under one directory PER VALUE of
    * `partCol` (Spark's partitionBy), so an equality/IN predicate on that
    * column prunes DIRECTORIES at planning time (PartitionFilters — zero
    * data files of other partitions are even listed). The coarse sibling
    * of the zone-map tier: use it when a column's values are few and
    * queries select by them (date partitions, ANN index cells, language
    * shards). Reads go through the ordinary [[readTable]] — Spark
    * reconstructs the partition column from the directory names. */
  def putPartitionedTable(
      name: String,
      df: org.apache.spark.sql.DataFrame,
      partCol: String,
      format: String = "parquet"): Unit =
    putPartitionedTableBy(name, df, Seq(partCol), format)

  /** Multi-level hive layout: one directory level PER listed column, in
    * order (`date=…/region=…/…`) — the standard warehouse shape when two
    * coarse dimensions both carry selective predicates. Every downstream
    * verb is already layout-generic ([[partitionColsOf]] walks all `k=v`
    * levels): append/deleteWhere/compact keep the nested layout, pruned
    * reads push predicates on ANY prefix or combination of the levels
    * into the directory listing. Order the columns coarsest-first — the
    * directory fan-out is the PRODUCT of the cardinalities, and a
    * high-cardinality inner level multiplies small files (the same
    * judgment call every table format documents). */
  def putPartitionedTableBy(
      name: String,
      df: org.apache.spark.sql.DataFrame,
      partCols: Seq[String],
      format: String = "parquet"): Unit = {
    require(partCols.nonEmpty, "putPartitionedTableBy needs at least one partition column")
    partCols.foreach(c =>
      require(
        df.schema.fieldNames.contains(c),
        s"partition column '$c' not in schema ${df.schema.fieldNames.mkString(",")}"))
    publishVersion(name) { dir =>
      val w = df.write.mode("overwrite").partitionBy(partCols: _*)
      format match {
        case "parquet" => w.parquet(dir.toString)
        case "orc"     => w.orc(dir.toString)
        case other     => throw new IllegalArgumentException(s"unsupported partitioned format: $other")
      }
    }
  }

  /** Structured dataset read, format-symmetric with [[putTable]]. For csv,
    * pass `schema` to avoid a driver inference pass over the data. */
  def readTable(
      name: String,
      format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None): org.apache.spark.sql.DataFrame = {
    val p = resolveReadable(name).toString
    format match {
      case "parquet" => readParquetAt(resolveReadable(name))
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
    * recursive FS deletes of every version of the name, PLUS every derived
    * side table under `<name>.__…` (`__stats__`, `__filestats__`,
    * `__sample__`/`__samplemeta__`, `__grepidx__`, `__bucketspec__`, ANN
    * metadata/generations). A surviving side table from the name's
    * previous life would carry stamps from that life — purging them keeps
    * the stale-stats discipline airtight, and the commit high-water mark
    * (which delete deliberately does NOT remove) keeps version ids
    * monotonic across the delete so time travel can never conflate the
    * two lives. Returns whether the BASE name existed. */
  def delete(name: String): Boolean = lockFor(name).synchronized {
    // a live shallow clone reads THIS table's data files — deleting the
    // base would truncate the clone silently; refuse loudly instead
    // (delete the clones first, or never clone what you plan to drop)
    val liveClones = cloneRefsOf(name).filter(c => versionDirs(c).nonEmpty || fs.exists(pathOf(c)))
    if (liveClones.nonEmpty)
      throw new LiveCloneException(name, liveClones)
    lsPrefix(s"$name.__").foreach(deleteOne)
    val r = deleteOne(name)
    // deregister this name everywhere: its own (now-empty) refs dir, and
    // any back-reference a cloneTable(src, name) registered under a src
    fs.delete(refsDirOf(name), true)
    val refsRoot = new Path(root, "__refs__")
    if (fs.exists(refsRoot))
      fs.listStatus(refsRoot).foreach { d =>
        if (d.isDirectory) fs.delete(new Path(d.getPath, name), false)
      }
    r
  }

  private def deleteOne(name: String): Boolean = {
    val versioned = versionDirs(name).map { case (_, p) => fs.delete(p, true) }
    val blobs     = fs.delete(pathOf(s"$name.__data__"), true) // manifest-referenced data files
    val plain     = fs.delete(pathOf(name), true)
    plain || blobs || versioned.exists(identity)
  }

  /** LS: where a file lives (src/node.go:191-204). The reference prints the 4
    * replica node ids; here the storage layer owns placement, so we report the
    * fully-qualified path(s) + block locations when the FS exposes them. */
  def ls(name: String): Seq[String] = {
    val p = resolveReadable(name)
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
    * the answer). Version dirs collapse to their logical name; incomplete
    * (in-flight or failed) first writes are not listed. */
  def store(): Seq[String] =
    if (!fs.exists(new Path(root))) Seq.empty
    else {
      val entries = fs.listStatus(new Path(root)).toSeq
      val (versioned, plain) = entries.partition(st => VersionRe.matches(st.getPath.getName))
      val versionedNames = versioned.flatMap { st =>
        st.getPath.getName match {
          case VersionRe(base, _) if isComplete(st.getPath) => Some(base)
          case _                                            => None
        }
      }
      val plainNames = plain
        .map(_.getPath.getName)
        .filterNot(n => n.endsWith(TmpSuffix) || n.endsWith(OldSuffix) || SystemDirs.contains(n))
      (versionedNames ++ plainNames).distinct.sorted
    }

  def lsPrefix(prefix: String): Seq[String] =
    store().filter(_.startsWith(prefix))

  def exists(name: String): Boolean = fs.exists(resolveReadable(name))

  /** Version numbers currently readable for `name`, newest first — the
    * time-travel / changefeed window. The publish GC retains the newest
    * `retainVersions` complete versions (constructor knob; default 2 =
    * current + previous), plus any older version whose files a retained
    * manifest still references. Deeper history = a bigger knob, same
    * protocol. */
  def versions(name: String): Seq[Long] =
    versionDirs(name).filter { case (_, p) => isComplete(p) }.map(_._1).sorted.reverse

  /** Read a SPECIFIC retained version (shallow time travel): the
    * reproducibility hook for "re-run the job against yesterday's corpus
    * snapshot" while a new version is being published. Throws if that
    * version has been garbage-collected. */
  /** ANALYZE: one-scan column statistics for a stored table — per column
    * (min, max, ndv, null_count) as strings plus the row count — the
    * inputs every cost-based decision reads (broadcast-vs-shuffle
    * thresholds, min-max data skipping, partition-pruning sanity). The
    * stats are PUBLISHED back through the same versioned write-once path
    * (`<name>.__stats__`), so they version with the data and a reader
    * never sees stats for a half-written table. All aggregates run in ONE
    * pass (no per-column scans); ndv is exact count-distinct — swap to
    * approx_count_distinct at extreme widths, the stats contract allows
    * it. Returns the stats frame it published.
    *
    * Every row carries the DATA VERSION that was analyzed
    * (`analyzed_version`), resolved once before the scan: consumers whose
    * correctness (not just plan shape) depends on the stats — the
    * [[readTableWhere]] provably-empty prune — refuse stats stamped with a
    * version other than the one they are about to read, so a re-PUT
    * without a re-ANALYZE degrades to a normal filtered scan instead of
    * silently pruning rows the newer version contains.
    *
    * `fileStats = true` additionally publishes PER-FILE min/max/null
    * stats (`<name>.__filestats__`) from the same scan pass — the
    * zone-map tier between "prune the whole table" and "read everything":
    * [[readTableWhere]] uses them to plan the scan over only the files
    * whose [min, max] can intersect the predicate (see there). One extra
    * map-side-combined aggregation keyed by `input_file_name()`; the
    * result is nFiles × schema-width — metadata-sized, never data-sized. */
  def analyzeTable(
      name: String,
      format: String = "parquet",
      frequencyColumns: Seq[String] = Nil,
      fileStats: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val analyzedVersion = versions(name).headOption.getOrElse(-1L)
    val df = readTable(name, format)
    // atomic columns only: min/max/ndv over arrays or structs is not a
    // meaningful pruning stat (and not consistently orderable)
    val fields = df.schema.fields.filterNot(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] ||
        f.dataType == org.apache.spark.sql.types.BinaryType)
    require(fields.nonEmpty, s"table $name has no atomic columns to analyze")
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"),
        countDistinct(c).as(s"${f.name}__ndv"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs.toSeq: _*).head()
    val nRows = row.getLong(0)
    // opt-in heavy-hitter stat: the MAX per-value frequency of a would-be
    // join/aggregation key — one extra (map-side combined) pass per listed
    // column, and the published number autoSaltedAgg's skew decision can
    // consume WITHOUT a measurement pass (skewFactorFor). -1 = not computed.
    val maxFreqs: Map[String, Long] = frequencyColumns.map { c =>
      require(fields.exists(_.name == c), s"frequencyColumns: no atomic column '$c' in $name")
      val r = df.groupBy(col(c)).agg(count(lit(1)).as("c")).agg(max(col("c"))).head()
      c -> (if (r.isNullAt(0)) 0L else r.getLong(0))
    }.toMap
    val stats = fields.map { f =>
      (
        f.name,
        f.dataType.simpleString,
        nRows,
        Option(row.getAs[String](s"${f.name}__min")).getOrElse(null),
        Option(row.getAs[String](s"${f.name}__max")).getOrElse(null),
        row.getAs[Long](s"${f.name}__ndv"),
        row.getAs[Long](s"${f.name}__nulls"),
        maxFreqs.getOrElse(f.name, -1L),
        analyzedVersion)
    }.toSeq
    val out = spark.createDataFrame(stats).toDF(
      "column", "data_type", "n_rows", "min_value", "max_value", "n_distinct", "n_nulls",
      "max_freq", "analyzed_version")
    putTable(s"$name.__stats__", out, format)
    // file stats describe PHYSICAL files (raw read: input_file_name can't
    // span a deletion-vector anti-join, and per-file zone maps over raw
    // rows stay conservative for every prune)
    if (fileStats) publishFileStats(name, readTableRaw(name, format), fields, analyzedVersion, format)
    readTable(s"$name.__stats__", format)
  }

  /** One map-side-combined pass keyed by source file; the collect is
    * nFiles × schema-width (metadata-sized), reshaped long for storage.
    * Shared by [[analyzeTable]] (fileStats = true) and [[compact]]'s
    * zone-map rebuild. */
  private def publishFileStats(
      name: String,
      df: org.apache.spark.sql.DataFrame,
      fields: Array[org.apache.spark.sql.types.StructField],
      analyzedVersion: Long,
      format: String): Unit = {
    import org.apache.spark.sql.functions._
    val fAggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"))
    }
    val perFile = df
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("__rows"), fAggs.toSeq: _*)
      .collect()
    val fRows = perFile.toSeq.flatMap { r =>
      val file = r.getString(0)
      val n    = r.getLong(1)
      fields.map { f =>
        (file, f.name, f.dataType.simpleString, n,
          Option(r.getAs[String](s"${f.name}__min")).orNull,
          Option(r.getAs[String](s"${f.name}__max")).orNull,
          r.getAs[Long](s"${f.name}__nulls"),
          analyzedVersion)
      }
    }
    val fOut = spark.createDataFrame(fRows).toDF(
      "file", "column", "data_type", "n_rows", "min_value", "max_value", "n_nulls",
      "analyzed_version")
    putTable(s"$name.__filestats__", fOut, format)
  }

  /** Parse the published `__filestats__` frame (see [[analyzeTable]] with
    * `fileStats = true`): per (file, column) min/max/null stats plus the
    * stamped data version, or None if never published. The collect is
    * nFiles × schema-width — catalog metadata, never data. */
  def fileStatsFor(name: String, format: String = "parquet"): Option[Catalog.FileStats] = {
    if (!exists(s"$name.__filestats__")) return None
    val rows = readTable(s"$name.__filestats__", format)
      .select(
        org.apache.spark.sql.functions.col("file"),
        org.apache.spark.sql.functions.col("column"),
        org.apache.spark.sql.functions.col("data_type"),
        org.apache.spark.sql.functions.col("n_rows"),
        org.apache.spark.sql.functions.col("min_value"),
        org.apache.spark.sql.functions.col("max_value"),
        org.apache.spark.sql.functions.col("n_nulls"),
        org.apache.spark.sql.functions.col("analyzed_version"))
      .collect()
    if (rows.isEmpty) return None
    val cols = rows.toSeq.map { r =>
      Catalog.FileColumnStats(
        file = r.getString(0),
        column = r.getString(1),
        dataType = r.getString(2),
        nRows = r.getLong(3),
        minValue = Option(r.getString(4)),
        maxValue = Option(r.getString(5)),
        nNulls = r.getLong(6))
    }
    val ver = if (rows.head.isNullAt(7)) None else Some(rows.head.getLong(7))
    Some(Catalog.FileStats(ver, cols))
  }

  /** Parse the published `__stats__` frame back into a sizing estimate, or
    * None if ANALYZE was never run for `name`. The frame is one row per
    * atomic column (bounded by schema width, never by data), so the collect
    * is metadata-sized.
    *
    * Row-width model: fixed in-memory widths for numeric/temporal types;
    * strings are bounded by the LONGER of the stored min/max values (a
    * lexicographic min/max is not a length max, so a floor of 16 bytes
    * absorbs short-extreme cases) plus object overhead. This deliberately
    * estimates the DECOMPRESSED row, not the on-disk bytes — the number
    * that actually matters for a broadcast decision, and exactly what
    * Spark's own file-size estimator gets wrong on well-compressed parquet
    * (a 9 MB file can hydrate to gigabytes and OOM every executor that
    * receives the broadcast). */
  def statsFor(name: String, format: String = "parquet"): Option[Catalog.TableStats] = {
    if (!exists(s"$name.__stats__")) return None
    val frame = readTable(s"$name.__stats__", format)
    // max_freq / analyzed_version are absent in stats published before
    // those passes existed — tolerate old frames (None = not recorded)
    val hasFreq = frame.columns.contains("max_freq")
    val hasVer  = frame.columns.contains("analyzed_version")
    val base = Seq("column", "data_type", "n_rows", "min_value", "max_value", "n_distinct", "n_nulls")
    val names = base ++ (if (hasFreq) Seq("max_freq") else Nil) ++ (if (hasVer) Seq("analyzed_version") else Nil)
    val rows = frame.select(names.map(org.apache.spark.sql.functions.col): _*).collect()
    if (rows.isEmpty) return None
    val cols = rows.toSeq.map { r =>
      Catalog.ColumnStats(
        column = r.getString(0),
        dataType = r.getString(1),
        minValue = Option(r.getString(3)),
        maxValue = Option(r.getString(4)),
        nDistinct = r.getLong(5),
        nNulls = r.getLong(6),
        maxFreq = if (hasFreq && !r.isNullAt(7) && r.getLong(7) >= 0) Some(r.getLong(7)) else None)
    }
    val verIdx = if (hasFreq) 8 else 7
    val analyzedVersion =
      if (hasVer && !rows.head.isNullAt(verIdx)) Some(rows.head.getLong(verIdx)) else None
    val nRows = rows.head.getLong(2)
    val rowBytes = cols.map { c =>
      c.dataType match {
        case "boolean" | "tinyint"                         => 1L
        case "smallint"                                    => 2L
        case "int" | "float" | "date"                      => 4L
        case "bigint" | "double" | "timestamp" | "timestamp_ntz" => 8L
        case t if t.startsWith("decimal")                  => 16L
        case _ => // string-ish: bounded by the longer stored extreme + JVM object overhead
          val seen = math.max(c.minValue.map(_.length).getOrElse(0), c.maxValue.map(_.length).getOrElse(0))
          math.max(seen.toLong, 16L) + 24L
      }
    }.sum
    Some(Catalog.TableStats(nRows, rowBytes, cols, analyzedVersion))
  }

  /** The PUBLISHED skew factor of a stored table's column — the same
    * max_cnt · n_keys / n_rows statistic [[graft.operators.Skew.skewFactor]]
    * measures live, read instead from ANALYZE's heavy-hitter stat (run
    * `analyzeTable(name, frequencyColumns = Seq(col))` first). Feed it to
    * `Skew.autoSaltedAgg(knownSkewFactor = ...)` and the salting decision
    * costs a metadata read, not a key-count pass over 100 TB. None when
    * stats or the frequency pass are missing (callers fall back to the
    * live estimate — never a silent 1.0). */
  def skewFactorFor(name: String, column: String, format: String = "parquet"): Option[Double] =
    for {
      s  <- statsFor(name, format)
      cs <- s.columns.find(_.column == column)
      mf <- cs.maxFreq
      if s.nRows > 0
    } yield mf.toDouble * cs.nDistinct / s.nRows

  /** Stats-driven join: joins `left` against the stored table `rightName`,
    * picking the physical shape from the PUBLISHED `__stats__` estimate
    * rather than Spark's on-disk-bytes guess.
    *
    *  - stats say the hydrated right side fits under `broadcastThresholdBytes`
    *    → force `broadcast(right)`: no shuffle of the (arbitrarily large)
    *    left side, the plan you want when right is a dimension;
    *  - stats say it does NOT fit → hint `merge`: explicitly FORBID the
    *    broadcast Spark's compressed-file-size estimator might still pick.
    *    This is the 100×-scale guard — a snappy-parquet table under the
    *    10 MB conf default can decompress to gigabytes, and an auto-chosen
    *    broadcast of it kills the job; a sort-merge join is merely slower,
    *    never fatal;
    *  - no stats published → plain join, Spark's own estimate decides
    *    (honest fallback: we know nothing the optimizer doesn't).
    *
    * The default threshold mirrors `spark.sql.autoBroadcastJoinThreshold`'s
    * default (10 MB); deployments that raised the conf pass the same value
    * here. */
  def joinWithStats(
      left: org.apache.spark.sql.DataFrame,
      rightName: String,
      joinExprs: org.apache.spark.sql.Column,
      joinType: String = "inner",
      format: String = "parquet",
      broadcastThresholdBytes: Long = 10L * 1024 * 1024): org.apache.spark.sql.DataFrame = {
    val right = readTable(rightName, format)
    statsFor(rightName, format) match {
      case Some(s) if s.estBytes <= broadcastThresholdBytes =>
        left.join(org.apache.spark.sql.functions.broadcast(right), joinExprs, joinType)
      case Some(_) =>
        left.join(right.hint("merge"), joinExprs, joinType)
      case None =>
        left.join(right, joinExprs, joinType)
    }
  }

  /** Stats-driven SCAN pruning — the read-side complement of
    * [[joinWithStats]] and the table-level sibling of the Z-order/Hilbert
    * zone-map audits: evaluate a conjunct `colName op literal` against the
    * PUBLISHED per-column min/max, and when the predicate is PROVABLY
    * empty over the whole stored version (literal outside [min, max], or
    * the column is all-NULL), return an empty LOCAL relation with the
    * table's schema — the scan never plans a single file read (PlanSpec
    * pins the plan shape: LocalTableScan, no FileScan). Otherwise the
    * filtered read runs normally with the literal cast to the column type
    * so the predicate still pushes into the parquet scan; no published
    * stats → honest fallback to the filtered scan.
    *
    * At 100 TB this is the metadata short-circuit for time-partitioned
    * reads ("yesterday's version can't contain today's data"): the prune
    * decision reads ONE schema-width stats frame, never data. Comparisons
    * run in the column's domain — numerically for numeric/decimal types,
    * lexicographically for strings and ISO-rendered date/timestamp stats
    * (pass literals in the same ISO rendering). Ops: < <= > >= =. */
  def readTableWhere(
      name: String,
      colName: String,
      op: String,
      value: String,
      format: String = "parquet"): org.apache.spark.sql.DataFrame =
    readTableWhereAll(name, Seq((colName, op, value)), format)

  /** The N-conjunct form of [[readTableWhere]]: `conjuncts` is a Seq of
    * (column, op, literal) ANDed together. Both prune tiers compose
    * conjunct-wise — the table (tier 1) or a file (tier 2) is skipped as
    * soon as ANY conjunct provably excludes it, which is where multi-column
    * layouts pay off: over a Z-ordered table each file is a tight
    * rectangle in BOTH clustered dimensions, so a 2-D range predicate
    * prunes on each axis independently (PlanSpec pins the composed file
    * counts). A conjunct whose column lacks (complete) stats simply never
    * excludes anything — per-conjunct conservatism, never a wrong prune. */
  def readTableWhereAll(
      name: String,
      conjuncts: Seq[(String, String, String)],
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(conjuncts.nonEmpty, "need at least one conjunct")
    conjuncts.foreach { case (_, op, _) =>
      require(Set("<", "<=", ">", ">=", "=").contains(op), s"unsupported op: $op")
    }
    val table = readTable(name, format)
    val fields = conjuncts.map { case (cn, _, _) =>
      cn -> table.schema.fields
        .find(_.name == cn)
        .getOrElse(throw new IllegalArgumentException(s"no column '$cn' in $name"))
    }.toMap
    def predicate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      conjuncts.foldLeft(df) { case (acc, (cn, op, value)) =>
        val c = col(cn)
        val v = lit(value).cast(fields(cn).dataType)
        acc.filter(op match {
          case "<"  => c < v
          case "<=" => c <= v
          case ">"  => c > v
          case ">=" => c >= v
          case "="  => c === v
        })
      }
    def emptyLocal =
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), table.schema)
    // Both prune tiers change RESULTS, not just the plan, so they only
    // fire when the stats were analyzed against the EXACT data version
    // this read resolves: a re-PUT without re-ANALYZE (stale stats), a
    // pre-versioning stats frame (no stamp), or an unversioned plain-path
    // layout (a re-PUT there never bumps a version, so staleness is
    // undetectable) all degrade to the normal filtered scan. Version dirs
    // are write-once, so a matching stamp also guarantees the recorded
    // FILE LIST is exactly the live version's file list.
    val currentVersion = versions(name).headOption.getOrElse(-1L)
    def stampOk(v: Option[Long]): Boolean = currentVersion >= 0 && v.contains(currentVersion)
    // tier 1: whole-table prune — the read plans no file at all
    val provablyEmpty = statsFor(name, format).exists { s =>
      stampOk(s.analyzedVersion) &&
      conjuncts.exists { case (cn, op, value) =>
        s.columns.find(_.column == cn).exists(st =>
          Catalog.rangeExcludes(st.minValue, st.maxValue, st.nNulls, s.nRows, st.dataType, op, value))
      }
    }
    if (provablyEmpty) emptyLocal
    else {
      // tier 2: file-granular prune from __filestats__ zone maps — plan the
      // scan over only the files NO conjunct can exclude. Path-list reads
      // carry the resolved table schema explicitly; parquet/orc only
      // (csv/json header/inference plumbing isn't worth a metadata tier
      // they'd rarely deploy with).
      val subset: Option[org.apache.spark.sql.DataFrame] =
        if (format != "parquet" && format != "orc") None
        else {
          def normP(s: String): String = new Path(s).toUri.getPath
          val zone: Option[(Seq[String], Set[String])] = fileStatsFor(name, format) match {
            case Some(fs) if stampOk(fs.analyzedVersion) =>
              val allFiles = fs.columns.map(_.file).distinct
              if (allFiles.isEmpty) None
              else {
                // per conjunct: the set of files it provably excludes; a
                // conjunct with incomplete column coverage excludes nothing
                val excluded: Set[String] = conjuncts.flatMap { case (cn, op, value) =>
                  val colStats = fs.columns.filter(_.column == cn)
                  if (colStats.map(_.file).distinct.size != allFiles.size) Nil
                  else
                    colStats.filter(st =>
                      Catalog.rangeExcludes(st.minValue, st.maxValue, st.nNulls, st.nRows, st.dataType, op, value))
                      .map(_.file)
                }.toSet
                Some((allFiles, excluded))
              }
            case _ => None
          }
          // tier 2b: EQUALITY conjuncts additionally probe the per-file
          // value Blooms ([[analyzeBloomIndex]]) — the prune zone maps
          // can't make on an unclustered column (every file's [min, max]
          // overlaps a point probe; its Bloom usually doesn't). The two
          // exclusion sets UNION: a file survives only if no conjunct
          // excludes it by range OR by membership. Works with zone maps,
          // without them (the file list then comes from the manifest), or
          // not at all (no fresh index → empty set, plain scan).
          val bloomExcludedNorm: Set[String] =
            if (format != "parquet") Set.empty
            else
              conjuncts
                .filter(_._2 == "=")
                .flatMap { case (cn, _, value) => bloomEqualityExcluded(name, cn, value, currentVersion) }
                .toSet
          val base: Seq[String] =
            zone.map(_._1).getOrElse(if (bloomExcludedNorm.isEmpty) Nil else liveFiles(name))
          if (base.isEmpty) None
          else {
            val zoneExcludedNorm = zone.map(_._2.map(normP)).getOrElse(Set.empty[String])
            val keep = base.filterNot(f =>
              zoneExcludedNorm.contains(normP(f)) || bloomExcludedNorm.contains(normP(f)))
            if (keep.size >= base.size) None // nothing pruned: plain scan
            else if (keep.isEmpty) Some(emptyLocal)
            else
              Some(predicate(applyCurrentDeletes(name, readFilesWithLayout(keep, table.schema, format))))
          }
        }
      subset.getOrElse(predicate(table))
    }
  }

  /** Zone-overlap AUDIT over the published `__filestats__` maps — the
    * measurement half of the layout loop (the skew family's audit→action
    * discipline applied to storage): per column, how many unordered FILE
    * PAIRS have intersecting [min, max] ranges. 0 = perfectly disjoint
    * zones (every point/range predicate touches the minimum file set);
    * → 1 = every file overlaps every other (zone maps prune nothing —
    * the scattered layout a round-robin write produces). Feed a high
    * fraction to [[compactZOrdered]], which re-clusters and re-publishes.
    *
    * Driver-side O(nFiles² per column) over the metadata frame — nFiles
    * is catalog metadata (thousands), never data; ranges compare in the
    * column's domain via the same parser the prune uses (unparseable or
    * missing extremes count as overlapping — conservative, like the
    * prune). Requires zone maps stamped to the LIVE version (loud
    * otherwise: auditing stale geometry would mis-advise the rewrite). */
  def zoneOverlapAudit(
      name: String,
      columns: Seq[String],
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    require(columns.nonEmpty, "need at least one column to audit")
    val currentVersion = versions(name).headOption.getOrElse(-1L)
    val fs = fileStatsFor(name, format).getOrElse(
      throw new IllegalStateException(s"no __filestats__ for $name — run analyzeTable(fileStats = true)"))
    require(currentVersion >= 0 && fs.analyzedVersion.contains(currentVersion),
      s"stale zone maps for $name (stamped ${fs.analyzedVersion}, live $currentVersion) — re-ANALYZE first")
    val rows = columns.map { cn =>
      val st = fs.columns.filter(_.column == cn)
      require(st.nonEmpty, s"no zone stats for column '$cn' in $name")
      val n = st.size
      var overlap = 0L
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val a = st(i); val b = st(j)
          // [mnA, mxA] ∩ [mnB, mxB] ≠ ∅ ⟺ mnA ≤ mxB ∧ mnB ≤ mxA;
          // unknown extremes are treated as overlapping (conservative)
          val disjoint = (for {
            mnA <- a.minValue; mxA <- a.maxValue
            mnB <- b.minValue; mxB <- b.maxValue
            c1  <- Catalog.compareInDomain(mnA, mxB, a.dataType)
            c2  <- Catalog.compareInDomain(mnB, mxA, a.dataType)
          } yield c1 > 0 || c2 > 0).getOrElse(false)
          if (!disjoint) overlap += 1
          j += 1
        }
        i += 1
      }
      val maxPairs = n.toLong * (n - 1) / 2
      (cn, n.toLong, overlap, maxPairs,
        if (maxPairs == 0) 0.0
        else BigDecimal(overlap.toDouble / maxPairs).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(rows).toDF("column", "n_files", "overlap_pairs", "max_pairs", "overlap_frac")
  }

  /** The ACTION on [[zoneOverlapAudit]]: rewrite the table Z-clustered on
    * two columns ([[Sinks.zOrdered]] — each output file a tight rectangle
    * in both dimensions), publish as a new version, and re-ANALYZE with
    * fresh zone maps so [[readTableWhereAll]] prunes on both axes
    * immediately. Returns the post-rewrite audit of the two columns —
    * callers assert the overlap actually dropped instead of trusting the
    * rewrite blindly. One clustering shuffle + one stats pass, both
    * corpus-linear. */
  def compactZOrdered(
      name: String,
      colA: String,
      colB: String,
      files: Int = 8,
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    putTable(name, Sinks.zOrdered(readTable(name, format), colA, colB, files), format)
    analyzeTable(name, format, fileStats = true)
    zoneOverlapAudit(name, Seq(colA, colB), format)
  }

  def readTableVersion(name: String, version: Long, format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    val p = versionDirs(name).collectFirst {
      case (v, path) if v == version && isComplete(path) => path
    }
    require(p.isDefined, s"version $version of $name is not retained (have: ${versions(name).mkString(",")})")
    format match {
      case "parquet" => readParquetAt(p.get)
      case "orc"     => spark.read.orc(p.get.toString)
      case "csv"     => spark.read.option("header", "true").option("inferSchema", "true").csv(p.get.toString)
      case "json"    => spark.read.json(p.get.toString)
      case other     => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  /** RESTORE (rollback) — publish a NEW version whose content is exactly
    * a retained older version's: the undo verb for a bad deleteWhere /
    * append / compaction (Delta's RESTORE, Iceberg's rollback). O(METADATA)
    * by construction: no data moves — the new version's manifest simply
    * references the target version's file list (referencing other
    * versions' directories is already the manifest protocol's normal
    * state, and the publish GC protects every directory a retained
    * manifest references). History is preserved, not rewritten: the
    * restore is a new monotonic commit on top, so [[tableChanges]] across
    * the restore span reports the undone rows flowing back (a reverted
    * delete shows them as inserts — the file-diff algebra gives the
    * audit trail for free), and time travel into the mistake window still
    * works while it is retained. Throws if `toVersion` is not retained —
    * you cannot restore to history the GC horizon already dropped. */
  def restoreTable(name: String, toVersion: Long): Unit = lockFor(name).synchronized {
    val target = versionDirs(name).collectFirst {
      case (v, p) if v == toVersion && isComplete(p) => p
    }
    require(
      target.isDefined,
      s"version $toVersion of $name is not retained (have: ${versions(name).mkString(",")})")
    val current = versions(name).headOption.getOrElse(-1L)
    require(toVersion != current, s"version $toVersion of $name is already current")
    val files  = manifestOf(target.get).getOrElse(listDataFiles(target.get))
    val schema = manifestSchemaOf(target.get)
      .getOrElse(spark.read.parquet(target.get.toString).schema)
    publishVersion(name) { dir =>
      // the restored state is the TARGET's effective rows — its deletion
      // vector (or absence of one) comes along with its file list
      carryDeletes(target.get, dir)
      writeManifest(dir, files, schema)
    }
  }

  /** CHANGEFEED — the row-level difference between two retained versions
    * (Delta/Iceberg's change-data-feed read, built from what the manifest
    * protocol already records): every version IS a file-list snapshot, so
    * the change set is the multiset difference of the FILE diff —
    * `inserts = rows(added files) ∖ rows(removed files)` and
    * `deletes = rows(removed files) ∖ rows(added files)` — which is
    * O(changed files), never O(table), for every manifest mutation:
    * an append touches only the delta generation (removed = ∅, zero
    * diff work), a deleteWhere touches only the rewritten candidates,
    * and a pure COMPACTION (same rows, new files) cancels to an EMPTY
    * feed — file churn is not data change, the invariance falls out of
    * the algebra instead of needing a special case. A re-PUT (full
    * overwrite) honestly diffs the whole table — it IS a full change.
    *
    * Both sides read with the TO version's schema, so pre-evolution files
    * serve NULL for later columns exactly as the live read does; the
    * multiset (exceptAll) semantics keep duplicate rows honest. Output =
    * the changed rows plus a `_change_type` column ('insert' | 'delete');
    * an UPDATE appears as its delete + insert pair, as in every
    * file-granular CDC feed. Version ids are the monotonic commit ids
    * ([[versions]]) — spans never conflate across DELETE + re-PUT. */
  def tableChanges(name: String, vFrom: Long, vTo: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    require(vFrom < vTo, s"tableChanges needs vFrom < vTo, got $vFrom >= $vTo")
    val retained = versionDirs(name).filter { case (_, p) => isComplete(p) }.toMap
    def dirOf(v: Long): Path = retained.getOrElse(
      v,
      throw new IllegalArgumentException(
        s"version $v of $name is not retained (have: ${versions(name).mkString(",")})"))
    val (pFrom, pTo) = (dirOf(vFrom), dirOf(vTo))
    def filesOf(p: Path): Set[String] = manifestOf(p).getOrElse(listDataFiles(p)).toSet
    val (fFrom, fTo) = (filesOf(pFrom), filesOf(pTo))
    val added   = (fTo -- fFrom).toSeq.sorted
    val removed = (fFrom -- fTo).toSeq.sorted
    val schema = manifestSchemaOf(pTo)
      .getOrElse(spark.read.parquet(pTo.toString).schema)
    def readOrEmpty(files: Seq[String]): org.apache.spark.sql.DataFrame =
      if (files.isEmpty)
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      else readFilesWithLayout(files, schema)
    // Deletion vectors make each side's EFFECTIVE rows = files ∖ vector,
    // so file-identical versions can still differ ([[deleteByKeys]]).
    // Changed files diff as before (each side minus ITS vector); COMMON
    // files contribute only the rows whose key is in the vectors'
    // symmetric difference — O(delta keys), never O(table). A span with
    // no vectors on either side reduces exactly to the file-diff algebra.
    val (dvFrom, dvTo) = (deletesAt(pFrom), deletesAt(pTo))
    (dvFrom, dvTo) match {
      case (Some(a), Some(b)) =>
        require(
          a.schema.fields.head.name == b.schema.fields.head.name,
          s"changefeed span of '$name' crosses deletion vectors with different key columns")
      case _ => ()
    }
    def antiDv(
        df: org.apache.spark.sql.DataFrame,
        dv: Option[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame =
      dv.fold(df) { d =>
        val kc = d.schema.fields.head.name
        df.join(broadcast(d), df(kc) === d(kc), "left_anti")
      }
    val deltaKeys: Option[org.apache.spark.sql.DataFrame] = (dvFrom, dvTo) match {
      case (None, None) => None
      case _ =>
        val ex = dvFrom.orElse(dvTo).get
        val f  = dvFrom.getOrElse(ex.limit(0))
        val t  = dvTo.getOrElse(ex.limit(0))
        Some(f.exceptAll(t).unionByName(t.exceptAll(f)).distinct())
    }
    val common = (fFrom intersect fTo).toSeq.sorted
    val commonDelta: org.apache.spark.sql.DataFrame = deltaKeys match {
      case Some(dk) if common.nonEmpty =>
        val kc = dk.schema.fields.head.name
        val c  = readOrEmpty(common)
        // materialize once (delta-key-sized): it feeds BOTH diff sides,
        // and re-scanning the common files twice would double the I/O
        c.join(broadcast(dk), c(kc) === dk(kc), "left_semi").localCheckpoint(true)
      case _ => readOrEmpty(Nil)
    }
    val addRows = antiDv(readOrEmpty(added), dvTo).unionByName(antiDv(commonDelta, dvTo))
    val remRows = antiDv(readOrEmpty(removed), dvFrom).unionByName(antiDv(commonDelta, dvFrom))
    val cols = schema.fieldNames.map(col).toSeq
    // align column ORDER before exceptAll (layout groups union by name,
    // and pre/post-evolution file groups can disagree on position)
    val (a, r) = (addRows.select(cols: _*), remRows.select(cols: _*))
    a.exceptAll(r).withColumn("_change_type", lit("insert"))
      .unionByName(r.exceptAll(a).withColumn("_change_type", lit("delete")))
  }

  /** Incremental changefeed consumption — the poll loop every downstream
    * incremental job runs against a CDC-capable table: "give me everything
    * since my cursor". Returns (currentVersion, feed); the consumer
    * persists the returned version as its new cursor and the feed is
    * empty (schema intact) when nothing changed. A cursor that fell
    * behind the retention window refuses loudly via [[tableChanges]] —
    * the consumer must re-bootstrap from a full read, never silently skip
    * missed changes (size the `retainVersions` knob to the slowest
    * consumer's lag). Cursors are the monotonic commit ids, so a DELETE +
    * re-PUT between polls can never masquerade as "no change". */
  def changesSince(name: String, sinceVersion: Long): (Long, org.apache.spark.sql.DataFrame) = {
    val current = versions(name).headOption.getOrElse(
      throw new IllegalArgumentException(s"no readable versions of $name"))
    require(
      sinceVersion <= current,
      s"cursor $sinceVersion is ahead of $name's current version $current")
    if (sinceVersion == current) {
      val schema = readTable(name).schema
        .add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
      (current,
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
    } else (current, tableChanges(name, sinceVersion, current))
  }

  // ------------------------------------------------------------ bucketing

  private def bucketIdent(name: String): String =
    "graft_bkt_" + name.replaceAll("[^A-Za-z0-9_]", "_")

  /** Bucketed PUT — data co-location as a catalog property. The rows are
    * hash-partitioned into `nBuckets` files by `bucketCol` (one file per
    * bucket: the write is repartitioned on the bucket expression first, the
    * same Murmur3 hash bucketing uses, so each task owns exactly one
    * bucket) and sorted within each bucket. Spark keeps bucket specs in
    * table metadata, not in the files, so the spec is recorded twice: in
    * the session catalog (for this session's reads) and in a versioned
    * `<name>.__bucketspec__` side table stamped with the DATA VERSION it
    * describes (for any later session — [[readBucketedTable]] re-registers
    * from it, and refuses a spec whose stamp doesn't match the readable
    * version, so a plain re-PUT can't silently masquerade as bucketed).
    *
    * Why this matters at 100 TB: two tables bucketed on their join key
    * join WITHOUT a shuffle — the scan itself satisfies the join's
    * distribution requirement — and a groupBy on the bucket key aggregates
    * without an exchange. For a fact table joined every day on the same
    * key, the one-time bucketed write amortizes the shuffle away from
    * every subsequent query. (The reference's closest concept is its fixed
    * hash-partitioned juice assignment, mapleJuice.go's `hash mod n` —
    * per-job, never persisted; persisting the partitioning IS the
    * extension.) */
  def putBucketedTable(
      name: String,
      df: org.apache.spark.sql.DataFrame,
      bucketCol: String,
      nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(
      df.schema.fieldNames.contains(bucketCol),
      s"bucket column '$bucketCol' not in schema ${df.schema.fieldNames.mkString(",")}")
    val ident = bucketIdent(name)
    publishVersion(name) { dir =>
      spark.sql(s"DROP TABLE IF EXISTS `$ident`")
      df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
        .write
        .mode("overwrite")
        .format("parquet")
        .bucketBy(nBuckets, bucketCol)
        .sortBy(bucketCol)
        .option("path", dir.toString)
        .saveAsTable(ident)
      // the bucketed write goes through the same committer, but be explicit:
      // an incomplete version must never resolve
      val marker = new Path(dir, "_SUCCESS")
      if (!fs.exists(marker)) fs.create(marker).close()
    }
    val v = versions(name).headOption.getOrElse(-1L)
    putTable(
      s"$name.__bucketspec__",
      spark.createDataFrame(Seq((bucketCol, nBuckets, v)))
        .toDF("bucket_col", "n_buckets", "data_version"))
  }

  /** Read a [[putBucketedTable]] dataset WITH its bucket spec attached, so
    * Catalyst plans co-located joins/aggregations shuffle-free. Fails
    * loudly when the published spec's version stamp doesn't match the
    * readable data version (a plain [[putTable]] re-PUT superseded the
    * bucketed layout) — the silent alternative would be a correct-looking
    * read whose co-location promise is a lie, exactly the staleness class
    * the stats prune refuses. Re-registers the session-catalog entry from
    * the side table when absent (fresh session) or pointing at a stale
    * location. */
  def readBucketedTable(name: String): org.apache.spark.sql.DataFrame = {
    val specRows = readTable(s"$name.__bucketspec__").collect()
    require(specRows.length == 1, s"corrupt bucket spec for '$name': ${specRows.length} rows")
    val spec        = specRows.head
    val bucketCol   = spec.getAs[String]("bucket_col")
    val nBuckets    = spec.getAs[Int]("n_buckets")
    val specVersion = spec.getAs[Long]("data_version")
    val current     = versions(name).headOption.getOrElse(-1L)
    require(
      current >= 0 && specVersion == current,
      s"bucket spec for '$name' is stamped v$specVersion but the readable data is v$current — " +
        s"the bucketed layout was superseded by a plain PUT; re-PUT with putBucketedTable")
    val ident = bucketIdent(name)
    val path  = resolveReadable(name)
    val cat   = spark.sessionState.catalog
    val id    = org.apache.spark.sql.catalyst.TableIdentifier(ident)
    val registeredHere = cat.tableExists(id) && {
      val have = fs.makeQualified(new Path(cat.getTableMetadata(id).location)).toUri
      val want = fs.makeQualified(path).toUri
      have == want
    }
    if (!registeredHere) {
      val schemaDdl = spark.read.parquet(path.toString).schema.toDDL
      spark.sql(s"DROP TABLE IF EXISTS `$ident`")
      spark.sql(
        s"CREATE TABLE `$ident` ($schemaDdl) USING PARQUET " +
          s"CLUSTERED BY (`$bucketCol`) SORTED BY (`$bucketCol`) INTO $nBuckets BUCKETS " +
          s"LOCATION '${path.toString}'")
    }
    spark.table(ident)
  }

  // ----------------------------------------------- mutations without rewrite

  /** APPEND without rewriting: the new rows land as parquet files in the
    * table's blob area (`<name>.__data__/gen-*`), and the published next
    * version is a MANIFEST — the current version's file list plus the new
    * files. Cost is O(delta), never O(table): at 100 TB an hourly ingest
    * appends gigabytes without touching the corpus, where the plain
    * [[putTable]] path would rewrite everything it read. Readers keep full
    * version semantics (write-once manifests, read-stable under concurrent
    * append, [[readTableVersion]] time travel), and the versioned-GC
    * protects any older materialized dir the manifest still references.
    *
    * Schema is strict: an append whose columns differ (names or types) is a
    * pipeline bug and fails loudly — silent widening would poison every
    * downstream zone-map and bucket assumption. Stats/zone maps stay
    * stamped with the pre-append version, so [[readTableWhereAll]] degrades
    * to correct full scans until the caller re-ANALYZEs. Parquet only. */
  def appendTable(
      name: String,
      df: org.apache.spark.sql.DataFrame,
      commitId: Option[Long] = None): Unit =
    lockFor(name).synchronized {
      val (base, baseSchema) =
        if (exists(name)) {
          val t = readTable(name)
          (liveFiles(name), Some(t.schema))
        } else (Seq.empty[String], None)
      // name-set + type equality, then ALIGN to the table's column order:
      // partition discovery moves the partition column to the end of a
      // partitioned table's schema, so a by-position compare would reject
      // the very frame putPartitionedTable originally accepted
      val aligned = baseSchema.fold(df) { s =>
        val have = df.schema.fields.map(f => (f.name, f.dataType)).toSet
        val want = s.fields.map(f => (f.name, f.dataType)).toSet
        require(
          have == want,
          s"appendTable schema mismatch for '$name': table has $want, append has $have")
        df.select(s.fieldNames.map(org.apache.spark.sql.functions.col(_)): _*)
      }
      // pending deletion vector: carried forward (tombstones survive the
      // append), and a batch REINSERTING a tombstoned key refuses loudly —
      // the anti-join would silently swallow the new row otherwise
      val prevDir = if (exists(name)) Some(resolveReadable(name)) else None
      prevDir.flatMap(deletesAt).foreach { dv =>
        import org.apache.spark.sql.functions.broadcast
        val kc = dv.schema.fields.head.name
        require(
          aligned.join(broadcast(dv), aligned(kc) === dv(kc), "left_semi").isEmpty,
          s"append to '$name' refused: the batch reinserts tombstoned '$kc' key(s) — " +
            s"mergeDeletes('$name') first (or the delete was a mistake: restoreTable)")
      }
      // a hive-partitioned base keeps its layout: the delta generation is
      // written partitionBy the same columns, so its files carry partition
      // values in THEIR directory names and every partition-pruned /
      // layout-aware read treats old and new files alike
      val partCols = partitionColsOf(base)
      val gen = new Path(pathOf(s"$name.__data__"), s"gen-${java.util.UUID.randomUUID()}")
      val w   = aligned.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(gen.toString)
      val newFiles = listDataFiles(gen)
      publishVersion(name) { dir =>
        prevDir.foreach(carryDeletes(_, dir))
        writeManifest(dir, base ++ newFiles, baseSchema.getOrElse(df.schema), commitId)
      }
    }

  /** Schema-EVOLVING append — the lakehouse ADD COLUMN verb [[appendTable]]
    * deliberately refuses: `df` must carry every existing column (same
    * type) and may ADD new ones, which are appended to the table schema.
    * The manifest's schema becomes the evolved one, and because manifest
    * reads pass that schema explicitly ([[readFilesWithLayout]]), the
    * PRE-EVOLUTION files serve NULL for the new columns without any
    * rewrite — O(delta) evolution, the parquet-native contract every
    * table format (Delta/Iceberg/Hudi) exposes. Dropping or retyping a
    * column stays refused (that's a rewrite, not an append).
    *
    * Stats/sample/grep tiers keep their staleness discipline: their
    * schema-drift guards detect the widened schema and refuse the
    * incremental paths until a full ANALYZE/analyzeSample re-covers the
    * table — degraded loudly, never silently wrong. Partitioned bases
    * keep their layout exactly as in [[appendTable]]. */
  def appendTableEvolve(name: String, df: org.apache.spark.sql.DataFrame, commitId: Option[Long] = None): Unit =
    lockFor(name).synchronized {
      require(exists(name), s"no such dataset: $name — appendTableEvolve needs an existing table (use putTable)")
      val t         = readTable(name)
      val base      = liveFiles(name)
      val haveTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val missing   = t.schema.fields.filterNot(f => haveTypes.contains(f.name))
      require(
        missing.isEmpty,
        s"appendTableEvolve cannot DROP columns of '$name': append lacks ${missing.map(_.name).mkString(", ")}")
      val retyped = t.schema.fields.filter(f => haveTypes(f.name) != f.dataType)
      require(
        retyped.isEmpty,
        s"appendTableEvolve cannot RETYPE columns of '$name': ${retyped.map(_.name).mkString(", ")}")
      val existingNames = t.schema.fieldNames.toSet
      val added         = df.schema.fields.filterNot(f => existingNames.contains(f.name))
      val evolved       = org.apache.spark.sql.types.StructType(t.schema.fields ++ added)
      val aligned       = df.select(evolved.fieldNames.map(org.apache.spark.sql.functions.col(_)): _*)
      // same deletion-vector discipline as appendTable: resurrect check +
      // carry-forward (an evolved column never touches the key domain)
      val prevDir = resolveReadable(name)
      deletesAt(prevDir).foreach { dv =>
        import org.apache.spark.sql.functions.broadcast
        val kc = dv.schema.fields.head.name
        require(
          aligned.join(broadcast(dv), aligned(kc) === dv(kc), "left_semi").isEmpty,
          s"appendTableEvolve to '$name' refused: the batch reinserts tombstoned '$kc' key(s) — " +
            s"mergeDeletes('$name') first")
      }
      val partCols      = partitionColsOf(base)
      val gen = new Path(pathOf(s"$name.__data__"), s"gen-${java.util.UUID.randomUUID()}")
      val w   = aligned.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(gen.toString)
      publishVersion(name) { dir =>
        carryDeletes(prevDir, dir)
        writeManifest(dir, base ++ listDataFiles(gen), evolved, commitId)
      }
    }

  /** Exactly-once [[appendTable]] for replayable sources (Structured
    * Streaming's foreachBatch re-delivers a batch after a failure): the
    * batch id commits ATOMICALLY with the data — it's a marker inside the
    * manifest version, made visible by the same _SUCCESS flip — so a
    * replayed id is detected and skipped instead of double-appended,
    * whether the crash hit before or after the publish. Returns whether
    * the batch was appended. Sole-writer guarantee: see
    * [[lastCommittedBatch]]. */
  def appendTableExactlyOnce(name: String, df: org.apache.spark.sql.DataFrame, batchId: Long): Boolean =
    lockFor(name).synchronized {
      if (batchId <= lastCommittedBatch(name)) false
      else {
        appendTable(name, df, commitId = Some(batchId))
        true
      }
    }

  /** Targeted DELETE (the GDPR / retention primitive): remove exactly the
    * rows matching `column op value`, rewriting ONLY the files that can
    * contain them. The zone maps ([[analyzeTable]] fileStats, stamped to
    * the live version) split the file list into provably-unaffected files —
    * which the new manifest re-references untouched — and candidate files,
    * which are re-written minus the matching rows into the blob area. On a
    * time-clustered 100 TB table a "delete user X's last week" touches the
    * week's files, not the corpus. Without current zone maps every file is
    * a candidate — correct, just unpruned.
    *
    * NULL semantics are SQL's: a row whose `column` is NULL never matches
    * the predicate and always survives. A delete matching zero rows
    * publishes nothing (no version churn). Returns a one-row report
    * (n_files_live, n_files_rewritten, n_rows_deleted); the superseded
    * blob files become [[vacuum]] garbage. Parquet only. */
  def deleteWhere(
      name: String,
      colName: String,
      op: String,
      value: String): org.apache.spark.sql.DataFrame = lockFor(name).synchronized {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    require(Set("<", "<=", ">", ">=", "=").contains(op), s"unsupported op: $op")
    requireNoDeletes(name, "deleteWhere")
    val table = readTable(name)
    val field = table.schema.fields
      .find(_.name == colName)
      .getOrElse(throw new IllegalArgumentException(s"no column '$colName' in $name"))
    val files          = liveFiles(name)
    val currentVersion = versions(name).headOption.getOrElse(-1L)
    def norm(s: String): String = new Path(s).toUri.getPath
    // files the predicate provably can't match — same zone-map logic (and
    // the same version-stamp discipline) as the readTableWhereAll prune
    val excludedNorm: Set[String] = fileStatsFor(name) match {
      case Some(fsStats) if currentVersion >= 0 && fsStats.analyzedVersion.contains(currentVersion) =>
        val colStats = fsStats.columns.filter(_.column == colName)
        val allFiles = fsStats.columns.map(_.file).distinct
        if (colStats.map(_.file).distinct.size != allFiles.size) Set.empty
        else
          colStats
            .filter(st =>
              Catalog.rangeExcludes(st.minValue, st.maxValue, st.nNulls, st.nRows, st.dataType, op, value))
            .map(st => norm(st.file))
            .toSet
      case _ => Set.empty
    }
    val (untouched, candidates) = files.partition(f => excludedNorm.contains(norm(f)))
    def report(rewritten: Long, deleted: Long) =
      spark
        .createDataFrame(Seq((files.size.toLong, rewritten, deleted)))
        .toDF("n_files_live", "n_files_rewritten", "n_rows_deleted")
    if (candidates.isEmpty) report(0L, 0L)
    else {
      val cand  = readFilesWithLayout(candidates, table.schema)
      val c     = col(colName)
      val v     = lit(value).cast(field.dataType)
      val predT = op match {
        case "<"  => c < v
        case "<=" => c <= v
        case ">"  => c > v
        case ">=" => c >= v
        case "="  => c === v
      }
      val matches = coalesce(predT, lit(false)) // NULL column ⇒ survives
      // one pass over the candidates: deleted AND surviving counts (the
      // survivor count decides whether a rewrite generation exists at all)
      val cnts = cand
        .agg(
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.when(matches, 1L).otherwise(0L)),
          org.apache.spark.sql.functions.count(lit(1)))
        .head()
      val nDel = if (cnts.isNullAt(0)) 0L else cnts.getLong(0)
      val nTot = cnts.getLong(1)
      if (nDel == 0L) report(0L, 0L)
      else if (nDel == nTot) {
        // nothing survives the candidate set: no rewrite generation — the
        // manifest simply drops the candidate files (an all-empty-file
        // generation would be live data that yields zero stats rows, which
        // the incremental-ANALYZE coverage guard rightly refuses)
        publishVersion(name)(dir => writeManifest(dir, untouched, table.schema))
        report(candidates.size.toLong, nDel)
      } else {
        val gen = new Path(pathOf(s"$name.__data__"), s"gen-${java.util.UUID.randomUUID()}")
        // survivors of a partitioned table rewrite back into the same hive
        // layout (their partition values came from the layout-aware read)
        val partCols = partitionColsOf(candidates)
        val w        = cand.filter(not(matches)).write.mode("overwrite")
        (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(gen.toString)
        val rewritten = listDataFiles(gen)
        publishVersion(name)(dir => writeManifest(dir, untouched ++ rewritten, table.schema))
        report(candidates.size.toLong, nDel)
      }
    }
  }

  /** UPSERT (MERGE) — the UPDATE verb completing the DML set (append =
    * insert, deleteWhere = delete): for each row of `updates`, REPLACE the
    * stored row carrying the same key, or INSERT it if the key is new —
    * Delta/Iceberg's `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`
    * for whole rows. O(touched files + delta), never O(table):
    *
    *   - files whose key-column zone provably can't contain ANY update
    *     key are untouched (zone-map prune against the update batch's
    *     [min, max] key range — fresh `__filestats__` only, same
    *     version-stamp discipline as [[deleteWhere]]);
    *   - candidate files rewrite minus the matched keys: a BROADCAST
    *     anti-join against the update key set (update batches are
    *     delta-sized — the join never shuffles the table);
    *   - the update rows land as a new generation keeping the hive
    *     layout, exactly like [[appendTable]].
    *
    * MERGE semantics require one row per key in `updates` (duplicate or
    * NULL keys refuse loudly — "which copy wins" must never be an
    * accident of partitioning). The changefeed reports an update as its
    * delete + insert pair, as in every file-granular CDC feed. Returns a
    * report frame (files live/rewritten, rows replaced/upserted). */
  def upsertTable(
      name: String,
      updates: org.apache.spark.sql.DataFrame,
      keyCol: String): org.apache.spark.sql.DataFrame = lockFor(name).synchronized {
    import org.apache.spark.sql.functions.{broadcast, col, count, countDistinct, lit, max, min}
    requireNoDeletes(name, "upsertTable")
    val table = readTable(name)
    require(
      table.schema.fieldNames.contains(keyCol),
      s"no key column '$keyCol' in $name")
    // same name-set + type alignment contract as appendTable
    val have = updates.schema.fields.map(f => (f.name, f.dataType)).toSet
    val want = table.schema.fields.map(f => (f.name, f.dataType)).toSet
    require(have == want, s"upsertTable schema mismatch for '$name': table has $want, updates has $have")
    val aligned = updates.select(table.schema.fieldNames.map(col(_)): _*)
    val keyField = table.schema.fields.find(_.name == keyCol).get
    // one delta-sized pass: key sanity + the prune range
    val k = aligned.agg(
      count(lit(1)).as("n"),
      countDistinct(col(keyCol)).as("nk"),
      org.apache.spark.sql.functions.sum(col(keyCol).isNull.cast("long")).as("nulls"),
      min(col(keyCol)).cast("string").as("kmin"),
      max(col(keyCol)).cast("string").as("kmax")).head()
    val nUpd = k.getAs[Long]("n")
    if (nUpd == 0L) {
      return spark.createDataFrame(Seq((liveFiles(name).size.toLong, 0L, 0L, 0L)))
        .toDF("n_files_live", "n_files_rewritten", "n_rows_replaced", "n_rows_upserted")
    }
    require(k.getAs[Long]("nulls") == 0L, s"upsertTable: NULL keys in the update batch for '$name'")
    require(
      k.getAs[Long]("nk") == nUpd,
      s"upsertTable: duplicate keys in the update batch for '$name' (${nUpd - k.getAs[Long]("nk")} extra rows) — one row per key")
    val (kmin, kmax)   = (k.getAs[String]("kmin"), k.getAs[String]("kmax"))
    val files          = liveFiles(name)
    val currentVersion = versions(name).headOption.getOrElse(-1L)
    def norm(s: String): String = new Path(s).toUri.getPath
    // untouched = zone provably DISJOINT from [kmin, kmax] (outside either
    // end); unknown stats exclude nothing — degrade to the rewrite
    val excludedNorm: Set[String] = fileStatsFor(name) match {
      case Some(fsStats) if currentVersion >= 0 && fsStats.analyzedVersion.contains(currentVersion) =>
        val colStats = fsStats.columns.filter(_.column == keyCol)
        val allFiles = fsStats.columns.map(_.file).distinct
        if (colStats.map(_.file).distinct.size != allFiles.size) Set.empty
        else
          colStats
            .filter(st =>
              // entirely below the batch (no row >= kmin) or entirely
              // above it (no row <= kmax) — either proves disjointness
              Catalog.rangeExcludes(st.minValue, st.maxValue, st.nNulls, st.nRows, st.dataType, ">=", kmin) ||
                Catalog.rangeExcludes(st.minValue, st.maxValue, st.nNulls, st.nRows, st.dataType, "<=", kmax))
            .map(st => norm(st.file))
            .toSet
      case _ => Set.empty
    }
    val (untouched, candidates) = files.partition(f => excludedNorm.contains(norm(f)))
    val partCols = partitionColsOf(files)
    val gens     = scala.collection.mutable.ArrayBuffer.empty[String]
    def writeGen(df: org.apache.spark.sql.DataFrame): Unit = {
      val gen = new Path(pathOf(s"$name.__data__"), s"gen-${java.util.UUID.randomUUID()}")
      val w   = df.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(gen.toString)
      gens ++= listDataFiles(gen)
    }
    val keys = aligned.select(col(keyCol))
    val nReplaced =
      if (candidates.isEmpty) 0L
      else {
        val cand      = readFilesWithLayout(candidates, table.schema)
        val survivors = cand.join(broadcast(keys), Seq(keyCol), "left_anti")
        val nCand     = cand.count()
        val nSurv     = survivors.count()
        if (nSurv > 0L && nSurv < nCand) writeGen(survivors)
        // nSurv == nCand: no key matched — candidates stay AS THEY ARE
        // (no rewrite generation; the manifest keeps the original files)
        nCand - nSurv
      }
    writeGen(aligned)
    val keep       = if (nReplaced == 0L) untouched ++ candidates else untouched
    val nRewritten = if (nReplaced == 0L) 0L else candidates.size.toLong
    publishVersion(name)(dir => writeManifest(dir, keep ++ gens, table.schema))
    spark
      .createDataFrame(Seq((files.size.toLong, nRewritten, nReplaced, nUpd)))
      .toDF("n_files_live", "n_files_rewritten", "n_rows_replaced", "n_rows_upserted")
  }

  /** VACUUM: physically delete blob-area files no retained version's
    * manifest references anymore (the rewrite garbage [[deleteWhere]] and
    * compaction leave behind), plus emptied generation dirs. Version GC
    * never reaches into the blob area, so this is the explicit reclaim
    * step — run it when the retained-version window (current + previous)
    * is past needing the old bytes. Returns the number of files removed.
    * Driver-side file-list work only: the reference walks its whole SDFS
    * file table the same way on DELETE (src/master.go:82-108). */
  def vacuum(name: String): Long = lockFor(name).synchronized {
    val dataRoot = pathOf(s"$name.__data__")
    if (!fs.exists(dataRoot)) 0L
    else {
      val referenced: Set[String] = (versionDirs(name)
        .filter { case (_, p) => isComplete(p) }
        .flatMap { case (_, p) => manifestOf(p).getOrElse(Nil) }
        // a live shallow clone's manifests may reference this table's
        // blob-area files — vacuum must treat them as live too
        ++ cloneProtectedFiles(name))
        .map(f => new Path(f).toUri.getPath)
        .toSet
      var n = 0L
      fs.listStatus(dataRoot).foreach { gen =>
        if (gen.isDirectory) {
          // RECURSIVE walk: partitioned generations (appendTable/deleteWhere
          // /compactSmallFiles keep the hive layout) nest their data files
          // under partCol=… subdirs — a one-level walk never examined them,
          // so unreferenced partitioned blobs leaked forever
          def reclaim(p: Path): Unit = fs.listStatus(p).foreach { st =>
            val meta = st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith(".")
            if (!meta && st.isDirectory) reclaim(st.getPath)
            else if (!meta && st.isFile && !referenced.contains(st.getPath.toUri.getPath)) {
              fs.delete(st.getPath, false)
              n += 1L
            }
          }
          reclaim(gen.getPath)
          def liveFilesBelow(p: Path): Long = fs.listStatus(p).map { st =>
            val meta = st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith(".")
            if (meta) 0L
            else if (st.isDirectory) liveFilesBelow(st.getPath)
            else 1L
          }.sum
          if (liveFilesBelow(gen.getPath) == 0L) fs.delete(gen.getPath, true)
        }
      }
      n
    }
  }

  /** Partial compaction, manifest-aware — the OPTIMIZE that respects what
    * append built: [[compact]] rewrites the whole table (right after a
    * clustering change), but the streaming-append pathology is many SMALL
    * generations sitting next to perfectly good large files. This bin-packs
    * ONLY the files under `smallBytes` into ~`targetBytes` outputs and
    * publishes a manifest that re-references every large file verbatim —
    * O(small bytes), not O(table). Compose with [[analyzeAppended]] (the
    * packed outputs are the only unseen files, so the stats refresh is
    * O(delta) too) and [[vacuum]] (the packed-away inputs become
    * unreferenced blobs once their last referencing version GCs). Returns
    * a one-row report (n_files_live, n_files_packed, n_files_written);
    * 0/0 written when ≤1 small file exists (packing one file is churn).
    * Parquet only. */
  def compactSmallFiles(
      name: String,
      smallBytes: Long = 8L << 20,
      targetBytes: Long = 64L << 20): org.apache.spark.sql.DataFrame = lockFor(name).synchronized {
    require(smallBytes > 0 && targetBytes > 0, "thresholds must be positive")
    requireNoDeletes(name, "compactSmallFiles")
    val files = liveFiles(name)
    val sized = files.map(f => f -> fs.getFileStatus(new Path(f)).getLen)
    val (small, big) = sized.partition(_._2 < smallBytes)
    def report(packed: Long, written: Long) =
      spark
        .createDataFrame(Seq((files.size.toLong, packed, written)))
        .toDF("n_files_live", "n_files_packed", "n_files_written")
    if (small.size <= 1) report(0L, 0L)
    else {
      val schema = readTable(name).schema
      val nOut = math.max(1, math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
      val gen  = new Path(pathOf(s"$name.__data__"), s"gen-${java.util.UUID.randomUUID()}")
      // partitioned layouts pack WITHIN the layout: partitionBy re-splits
      // the packed rows into their hive directories (per-partition file
      // counts shrink; partition pruning keeps working on the packed gen)
      val partCols = partitionColsOf(small.map(_._1))
      val packedW = readFilesWithLayout(small.map(_._1), schema)
        .repartition(nOut)
        .write
        .mode("overwrite")
      (if (partCols.nonEmpty) packedW.partitionBy(partCols: _*) else packedW).parquet(gen.toString)
      val packedFiles = listDataFiles(gen)
      publishVersion(name)(dir => writeManifest(dir, big.map(_._1) ++ packedFiles, schema))
      report(small.size.toLong, packedFiles.size.toLong)
    }
  }

  // --------------------------------------------------------- sample tier

  /** ANALYZE-time SAMPLE tier: publish `<name>.__sample__`, a DETERMINISTIC
    * `sixteenths`/16 hash sample of the table (rows where the first hex
    * digit of md5(keyCol) is below the threshold — a pure function of the
    * row, so reruns, other engines, and the DuckDB oracle select the SAME
    * rows), plus a version-stamped `__samplemeta__` describing it. The
    * point at 100 TB: a pre-materialized 1/16 (or 1/8, 1/4, 1/2) slice
    * answers exploratory aggregations at sample cost via [[approxAgg]]
    * without touching the corpus, with the same staleness discipline as
    * every other stats tier. `sixteenths` is restricted to {1,2,4,8} so the
    * scale-up factor 16/sixteenths is an exact integer — estimates stay
    * decimal-exact and cross-engine reproducible. */
  def analyzeSample(
      name: String,
      keyCol: String,
      sixteenths: Int = 1,
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(Set(1, 2, 4, 8).contains(sixteenths), s"sixteenths must be one of 1,2,4,8; got $sixteenths")
    val analyzedVersion = versions(name).headOption.getOrElse(-1L)
    val threshold = sixteenths.toHexString // '1','2','4','8'
    val sample = readTable(name, format)
      .filter(substring(md5(col(keyCol).cast("string")), 1, 1) < lit(threshold))
    putTable(s"$name.__sample__", sample, format)
    publishSampleMeta(name, keyCol, sixteenths, analyzedVersion, liveFiles(name), format)
    readTable(s"$name.__sample__", format)
  }

  private def publishSampleMeta(
      name: String,
      keyCol: String,
      sixteenths: Int,
      version: Long,
      covered: Seq[String],
      format: String): Unit =
    putTable(
      s"$name.__samplemeta__",
      spark
        .createDataFrame(Seq((keyCol, sixteenths, 16 / sixteenths, version, covered)))
        .toDF("key_col", "sixteenths", "scale", "data_version", "covered_files"),
      format)

  /** O(delta) refresh of the sample tier after [[appendTable]] — the hash
    * sample of a union IS the union of the hash samples (membership is a
    * pure row property), so only the files the previous sample never
    * covered need scanning; the prior sampled rows carry over verbatim.
    * Sound ONLY for pure appends: if any previously-covered file left the
    * live set (a delete or compaction rewrote it), carried-over sample
    * rows could represent rows that no longer exist, so that case is
    * refused loudly — run a full [[analyzeSample]]. Returns a one-row
    * report (n_files_live, n_files_scanned, n_files_inherited). */
  def analyzeSampleIncremental(name: String, format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(format == "parquet", s"analyzeSampleIncremental is parquet-only, got $format")
    require(this.exists(s"$name.__samplemeta__"), s"no sample tier for '$name' — run analyzeSample first")
    val meta       = readTable(s"$name.__samplemeta__", format).head()
    val keyCol     = meta.getAs[String]("key_col")
    val sixteenths = meta.getAs[Int]("sixteenths")
    val covered    = meta.getAs[scala.collection.Seq[String]]("covered_files").toSeq
    def norm(s: String): String = new Path(s).toUri.getPath
    val live     = liveFiles(name)
    val liveNorm = live.map(norm).toSet
    val goneAway = covered.filterNot(f => liveNorm.contains(norm(f)))
    require(
      goneAway.isEmpty,
      s"${goneAway.size} file(s) the sample covered are no longer live in '$name' " +
        "(a delete/compaction rewrote them) — carried-over sample rows could describe deleted rows; " +
        "run a full analyzeSample")
    val coveredNorm = covered.map(norm).toSet
    val missing     = live.filterNot(f => coveredNorm.contains(norm(f)))
    val current     = versions(name).headOption.getOrElse(-1L)
    if (missing.nonEmpty) {
      val threshold = sixteenths.toHexString
      val schema    = readTable(name, format).schema
      val fresh = readFilesWithLayout(missing, schema)
        .filter(substring(md5(col(keyCol).cast("string")), 1, 1) < lit(threshold))
      putTable(s"$name.__sample__", readTable(s"$name.__sample__", format).unionByName(fresh), format)
    }
    publishSampleMeta(name, keyCol, sixteenths, current, live, format)
    spark
      .createDataFrame(Seq((live.size.toLong, missing.size.toLong, covered.size.toLong)))
      .toDF("n_files_live", "n_files_scanned", "n_files_inherited")
  }

  /** Approximate grouped COUNT/SUM from the published sample tier — reads
    * ONLY `<name>.__sample__` (sample cost, never corpus cost) and scales
    * by the exact integer factor the sample was built with. Estimates from
    * a stale sample are silently wrong in the worst way (they LOOK
    * plausible), so a version-stamp mismatch is refused loudly, not
    * degraded. Sums run through DECIMAL(18,2) so the estimate is
    * bit-reproducible across engines. Unbiased for any group whose
    * membership is independent of the md5 hash (i.e. everything that isn't
    * keyed on the sample key itself); expected relative error ~
    * 1/sqrt(group's sample count). */
  def approxAgg(
      name: String,
      groupCol: String,
      sumCol: String,
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(this.exists(s"$name.__samplemeta__"), s"no sample tier for '$name' — run analyzeSample first")
    val meta = readTable(s"$name.__samplemeta__", format).head()
    val stamped = meta.getAs[Long]("data_version")
    val current = versions(name).headOption.getOrElse(-1L)
    require(
      current >= 0 && stamped == current,
      s"sample for '$name' is stamped v$stamped but the data is v$current — re-run analyzeSample " +
        "(a stale-sample estimate would be silently biased)")
    val scale = meta.getAs[Int]("scale")
    readTable(s"$name.__sample__", format)
      .groupBy(col(groupCol))
      .agg(
        (count(lit(1)) * scale).as("n_est"),
        (sum(col(sumCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))) * scale)
          .cast(org.apache.spark.sql.types.DecimalType(38, 2))
          .cast("double")
          .as("sum_est"))
  }

  // ------------------------------------------------ incremental ANALYZE

  /** O(delta) stats refresh after [[appendTable]] — the piece that makes
    * append and pruning COMPOSE: a full [[analyzeTable]] after every
    * append re-scans the corpus (O(table), exactly what the append avoided
    * paying), while zone maps are per-file and therefore mergeable — only
    * the files the previous `__filestats__` has never seen need scanning.
    *
    * Mechanics: per-file rows for still-live covered files are inherited
    * verbatim (version restamped); the missing files get the same one-pass
    * per-file aggregation a full ANALYZE runs, over ONLY those files. The
    * table-level `__stats__` are recomputed by exact merge where the math
    * is exact — row counts and null counts add, min/max compose in the
    * column's domain — and published as UNKNOWN (-1 / null) where it is
    * not: NDV and max_freq don't merge from per-file data, and a made-up
    * number would quietly mis-size a broadcast or a salt factor, so the
    * consumers' conservative missing-stat paths take over instead. Run a
    * full ANALYZE when those two matter again.
    *
    * Loud on misuse: no prior `__filestats__` (nothing to be incremental
    * against) or a schema drift since the last ANALYZE both throw.
    * Returns a one-row report (n_files_live, n_files_scanned,
    * n_files_inherited). Parquet only — same boundary as the mutations. */
  def analyzeAppended(name: String, format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(format == "parquet", s"analyzeAppended is parquet-only, got $format")
    val currentVersion = versions(name).headOption.getOrElse(-1L)
    require(currentVersion >= 0, s"no versioned data for '$name'")
    require(
      this.exists(s"$name.__filestats__"),
      s"no __filestats__ for '$name' — run analyzeTable(fileStats = true) once before going incremental")
    val table = readTable(name, format)
    val fields = table.schema.fields.filterNot(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] ||
        f.dataType == org.apache.spark.sql.types.BinaryType)
    val prior = readTable(s"$name.__filestats__", format).collect()
    def norm(s: String): String = new Path(s).toUri.getPath
    val live     = liveFiles(name)
    val liveNorm = live.map(norm).toSet
    // an EMPTY stats frame is legitimate exactly when the table is empty
    // (a delete-all left nothing to describe); empty stats over live data
    // is a coverage hole only a full ANALYZE can fill
    require(
      prior.nonEmpty || live.isEmpty,
      s"__filestats__ for '$name' is empty but the table has data — run a full analyzeTable(fileStats = true)")
    val priorColumns = prior.map(_.getAs[String]("column")).toSet
    require(
      prior.isEmpty || priorColumns == fields.map(_.name).toSet,
      s"schema drift since last ANALYZE of '$name' (stats cover $priorColumns) — run a full analyzeTable")
    val priorByNorm  = prior.groupBy(r => norm(r.getAs[String]("file")))
    val coveredNorm  = liveNorm.intersect(priorByNorm.keySet)
    val missing      = live.filterNot(f => coveredNorm.contains(norm(f)))
    // inherited rows: still-live files keep their stats verbatim, restamped
    val inherited = prior
      .filter(r => coveredNorm.contains(norm(r.getAs[String]("file"))))
      .map(r =>
        (r.getAs[String]("file"), r.getAs[String]("column"), r.getAs[String]("data_type"),
          r.getAs[Long]("n_rows"), r.getAs[String]("min_value"), r.getAs[String]("max_value"),
          r.getAs[Long]("n_nulls"), currentVersion))
      .toSeq
    // scanned rows: the full ANALYZE's per-file pass, over ONLY the delta
    val scanned: Seq[(String, String, String, Long, String, String, Long, Long)] =
      if (missing.isEmpty) Nil
      else {
        val fAggs = fields.flatMap { f =>
          val c = col(f.name)
          Seq(
            min(c).cast("string").as(s"${f.name}__min"),
            max(c).cast("string").as(s"${f.name}__max"),
            sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"))
        }
        readFilesWithLayout(missing, table.schema)
          .groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("__rows"), fAggs.toSeq: _*)
          .collect()
          .toSeq
          .flatMap { r =>
            val file = r.getString(0)
            val n    = r.getLong(1)
            fields.map { f =>
              (file, f.name, f.dataType.simpleString, n,
                Option(r.getAs[String](s"${f.name}__min")).orNull,
                Option(r.getAs[String](s"${f.name}__max")).orNull,
                r.getAs[Long](s"${f.name}__nulls"),
                currentVersion)
            }
          }
      }
    val allRows = inherited ++ scanned
    putTable(
      s"$name.__filestats__",
      spark.createDataFrame(allRows).toDF(
        "file", "column", "data_type", "n_rows", "min_value", "max_value", "n_nulls",
        "analyzed_version"),
      format)
    // table-level merge from the per-file rows: exact where exact
    val nRowsTotal = allRows.groupBy(_._1).map(_._2.head._4).sum
    val tableRows = fields.map { f =>
      val rs   = allRows.filter(_._2 == f.name)
      val mins = rs.flatMap(r => Option(r._5))
      val maxs = rs.flatMap(r => Option(r._6))
      // any unparseable extreme poisons the whole fold to null (unknown is
      // the safe answer — a null extreme never excludes anything)
      def fold(vals: Seq[String], takeFirst: Int => Boolean): String =
        if (vals.isEmpty) null
        else
          vals.tail
            .foldLeft(Option(vals.head)) { (accOpt, b) =>
              accOpt.flatMap(a =>
                Catalog.compareInDomain(a, b, f.dataType.simpleString).map(c => if (takeFirst(c)) a else b))
            }
            .orNull
      val mn = fold(mins, c => c <= 0)
      val mx = fold(maxs, c => c >= 0)
      (f.name, f.dataType.simpleString, nRowsTotal, mn, mx, -1L, rs.map(_._7).sum, -1L, currentVersion)
    }.toSeq
    putTable(
      s"$name.__stats__",
      spark.createDataFrame(tableRows).toDF(
        "column", "data_type", "n_rows", "min_value", "max_value", "n_distinct", "n_nulls",
        "max_freq", "analyzed_version"),
      format)
    spark
      .createDataFrame(Seq((live.size.toLong, missing.size.toLong, coveredNorm.size.toLong)))
      .toDF("n_files_live", "n_files_scanned", "n_files_inherited")
  }

  // ------------------------------------------------------- grep text index

  /** Zone maps for TEXT: a per-file token Bloom index. One map-side-combined
    * pass tokenizes `textCol` (maximal lowercase `[a-z0-9]+` runs — the same
    * domain [[grepPruned]] validates its required tokens against), hashes
    * each token, and folds the hashes into ONE Bloom bit array per source
    * file ([[graft.functions.Bloom.BuildAgg]] as a grouped aggregate —
    * partials merge by bitwise OR, so the shuffle moves nFiles × numBits/8
    * bytes, not tokens). Published as `<name>.__grepidx__` (file, bits,
    * num_hashes, analyzed_version): nFiles rows — metadata-sized, the text
    * twin of `__filestats__`'s numeric min/max.
    *
    * Why: `grep_documents` is a full corpus scan by construction. At 100 TB
    * the only way a literal-word grep gets cheaper is skipping FILES, and
    * numeric zone maps can't see into a text column — a token Bloom can.
    * numBits sizes per file (2^17 bits = 16 KiB/file holds ~1e-3 FP to
    * ~9k distinct tokens/file; raise it for bigger files). */
  def analyzeGrepIndex(
      name: String,
      textCol: String,
      numBits: Int = 1 << 17,
      numHashes: Int = 4,
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val analyzedVersion = versions(name).headOption.getOrElse(-1L)
    val bloomAgg = udaf(new graft.functions.Bloom.BuildAgg(numBits, numHashes))
    val idx = readTableRaw(name, format)
      .select(input_file_name().as("file"), col(textCol))
      // per-row distinct tokens; cross-row duplicates are fine (Bloom insert
      // is idempotent), so no distinct() shuffle before the aggregate
      .select(col("file"), explode(array_distinct(split(lower(col(textCol)), "[^a-z0-9]+"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("file"), xxhash64(col("tok")).as("h"))
      .groupBy(col("file"))
      .agg(bloomAgg(col("h")).as("bits"))
      .withColumn("num_hashes", lit(numHashes))
      .withColumn("analyzed_version", lit(analyzedVersion))
    putTable(s"$name.__grepidx__", idx, format)
    readTable(s"$name.__grepidx__", format)
  }

  /** O(delta) refresh of the [[analyzeGrepIndex]] token Blooms after an
    * append — per-file Blooms are the ideal incremental stat: a still-live
    * file's bloom is inherited verbatim (restamped), and only the files the
    * index has never seen are tokenized, with the SAME numBits/numHashes
    * the existing index was built with (read back from its rows — a mixed
    * geometry index would probe wrong). Loud when there's no prior index.
    * Returns a one-row report (n_files_live, n_files_scanned,
    * n_files_inherited). */
  def analyzeGrepIndexAppended(
      name: String,
      textCol: String,
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(format == "parquet", s"analyzeGrepIndexAppended is parquet-only, got $format")
    require(
      this.exists(s"$name.__grepidx__"),
      s"no __grepidx__ for '$name' — run analyzeGrepIndex once before going incremental")
    val currentVersion = versions(name).headOption.getOrElse(-1L)
    require(currentVersion >= 0, s"no versioned data for '$name'")
    val priorDf   = readTable(s"$name.__grepidx__", format)
    val priorMeta = priorDf.select(col("file"), col("num_hashes"), size(col("bits")).as("words")).collect()
    require(priorMeta.nonEmpty, s"empty __grepidx__ for '$name'")
    val numHashes = priorMeta.head.getAs[Int]("num_hashes")
    val numBits   = priorMeta.head.getAs[Int]("words") * 64
    require(
      priorMeta.forall(r => r.getAs[Int]("num_hashes") == numHashes && r.getAs[Int]("words") * 64 == numBits),
      s"mixed bloom geometry in __grepidx__ for '$name' — rebuild with analyzeGrepIndex")
    def norm(s: String): String = new Path(s).toUri.getPath
    val live      = liveFiles(name)
    val liveNorm  = live.map(norm).toSet
    val keepFiles = priorMeta.map(_.getAs[String]("file")).filter(f => liveNorm.contains(norm(f)))
    val keptNorm  = keepFiles.map(norm).toSet
    val missing   = live.filterNot(f => keptNorm.contains(norm(f)))
    val inherited = priorDf
      .filter(col("file").isin(keepFiles.toSeq: _*))
      .withColumn("analyzed_version", lit(currentVersion))
    val idx =
      if (missing.isEmpty) inherited
      else {
        val bloomAgg = udaf(new graft.functions.Bloom.BuildAgg(numBits, numHashes))
        val schema   = readTable(name, format).schema
        val fresh = readFilesWithLayout(missing, schema)
          .select(input_file_name().as("file"), col(textCol))
          .select(col("file"), explode(array_distinct(split(lower(col(textCol)), "[^a-z0-9]+"))).as("tok"))
          .filter(length(col("tok")) > 0)
          .select(col("file"), xxhash64(col("tok")).as("h"))
          .groupBy(col("file"))
          .agg(bloomAgg(col("h")).as("bits"))
          .withColumn("num_hashes", lit(numHashes))
          .withColumn("analyzed_version", lit(currentVersion))
        inherited.unionByName(fresh)
      }
    putTable(s"$name.__grepidx__", idx, format)
    spark
      .createDataFrame(Seq((live.size.toLong, missing.size.toLong, keepFiles.size.toLong)))
      .toDF("n_files_live", "n_files_scanned", "n_files_inherited")
  }

  /** Grep with file-granular pruning through the [[analyzeGrepIndex]] token
    * Blooms: scan ONLY the files whose index says they might contain EVERY
    * required token, then verify survivors with the real regex. Exact by
    * construction — Blooms have no false negatives, so a file containing a
    * match always scans; false-positive files are eliminated by the regex.
    *
    * `requiredTokens` is the caller's assertion that every document matching
    * `pattern` contains each token as a maximal lowercase `[a-z0-9]+` run
    * (e.g. pattern `"join .* shuffle"` requires `join` and `shuffle`; for an
    * alternation, pass only tokens common to ALL branches, or run one call
    * per branch and union). Tokens outside the tokenizer's domain are a
    * caller bug and fail loudly. Missing or stale index (re-PUT without
    * re-ANALYZE) degrades to the full filtered scan — same
    * correctness-preserving fallback as [[readTableWhere]]. */
  def grepPruned(
      name: String,
      textCol: String,
      pattern: String,
      requiredTokens: Seq[String],
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(requiredTokens.nonEmpty, "grepPruned needs at least one required token (else use a plain grep)")
    requiredTokens.foreach(t =>
      require(
        t.matches("[a-z0-9]+"),
        s"required token '$t' is outside the index tokenizer's domain [a-z0-9]+ — " +
          "the prune would false-negative; lowercase it or split it"))
    def fullScan = readTable(name, format).filter(col(textCol).rlike(pattern))
    // file-list reads below are parquet-specific; other formats keep the
    // correct full-scan path
    if (format != "parquet") return fullScan
    if (!this.exists(s"$name.__grepidx__")) return fullScan
    val idx = readTable(s"$name.__grepidx__", format).collect() // nFiles rows — metadata-sized
    val current = versions(name).headOption.getOrElse(-1L)
    val fresh = current >= 0 && idx.forall(_.getAs[Long]("analyzed_version") == current)
    if (!fresh) return fullScan
    // token hashes via a one-row local relation — exact xxhash64 parity with
    // the executor-side index build (never re-implement the hash driver-side)
    val hashes = spark
      .createDataFrame(requiredTokens.map(Tuple1(_)))
      .toDF("tok")
      .select(xxhash64(col("tok")))
      .collect()
      .map(_.getLong(0))
    val files = idx.collect {
      case r if hashes.forall(h =>
            graft.functions.Bloom.testLocal(r.getAs[Seq[Long]]("bits").toArray, r.getAs[Int]("num_hashes"), h)) =>
        r.getAs[String]("file")
    }
    if (files.isEmpty) readTable(name, format).filter(lit(false))
    else {
      // layout-aware: a partitioned corpus keeps its partition column in
      // the pruned read (and the text column filter is unaffected)
      val schema = readTable(name, format).schema
      applyCurrentDeletes(name, readFilesWithLayout(files.toSeq, schema))
        .filter(col(textCol).rlike(pattern))
    }
  }

  /** Small-file compaction (lakehouse OPTIMIZE): rewrite the dataset's
    * current version into ~`targetBytes`-sized files and publish the
    * compacted copy as a NEW version — concurrent readers keep their
    * resolved (previous) version untouched until they re-resolve; the
    * versioned-publish GC then retires it. Returns the file count written.
    *
    * The pathology this fixes is real at scale: a streaming
    * [[graft.streaming.EventStreams.mergeStream]] sink or a
    * high-parallelism job leaves hundreds of KB-sized part files per
    * version, and scan startup cost becomes file-count-bound rather than
    * byte-bound. One `repartition(n)` round-robin shuffle is the standard
    * fix. */
  def compact(
      name: String,
      format: String = "parquet",
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val current = resolveReadable(name)
    require(fs.exists(current), s"no such dataset: $name")
    val bytes  = fs.getContentSummary(current).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    putTable(name, readTable(name, format).repartition(nFiles), format)
    // Stats coherence: compaction rewrites FILES, never data, so published
    // TABLE stats remain true — re-stamp them to the compacted version
    // (otherwise the version gate would needlessly disable the prune until
    // the next ANALYZE). FILE zone maps describe the OLD files and are
    // rebuilt from one map-side-combined pass when they existed; on any
    // failure mid-way the stamps simply stay stale and every consumer
    // degrades to the full scan — never a wrong prune.
    val newVersion = versions(name).headOption.getOrElse(-1L)
    if (newVersion >= 0 && exists(s"$name.__stats__")) {
      val frame = readTable(s"$name.__stats__", format)
      if (frame.columns.contains("analyzed_version"))
        putTable(
          s"$name.__stats__",
          frame.withColumn("analyzed_version", org.apache.spark.sql.functions.lit(newVersion)),
          format)
    }
    if (newVersion >= 0 && exists(s"$name.__filestats__")) {
      val df = readTable(name, format)
      val fields = df.schema.fields.filterNot(f =>
        f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
          f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] ||
          f.dataType == org.apache.spark.sql.types.BinaryType)
      publishFileStats(name, df, fields, newVersion, format)
    }
    nFiles
  }

  // ------------------------------------------------------ shallow clones

  /** Directory of clone back-references for `src`: one zero-byte file per
    * registered clone name, under the namespace-level `__refs__` area
    * (hidden from [[store]] like `__hwm__`/`__locks__`). */
  private def refsDirOf(src: String): Path = new Path(root, s"__refs__/$src")

  /** Names registered as shallow clones of `name`, TRANSITIVELY: a clone
    * of a clone can still reference the ORIGINAL table's data files after
    * the middle table diverges (its manifest dropped them but the
    * grandchild's didn't), so GC protection must see the whole closure.
    * Cycle-safe; order is discovery order. */
  private def cloneRefsOf(name: String): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    def walk(n: String): Unit = {
      val d = refsDirOf(n)
      if (fs.exists(d))
        fs.listStatus(d).map(_.getPath.getName).foreach(c => if (seen.add(c)) walk(c))
    }
    walk(name)
    seen.toSeq
  }

  /** Every data file referenced by a retained complete version of any
    * (transitive) clone of `name` — the cross-table protection set the
    * publish GC and [[vacuum]] honor. O(clones × manifest lines), pure
    * metadata. */
  private def cloneProtectedFiles(name: String): Seq[String] =
    cloneRefsOf(name).flatMap { c =>
      versionDirs(c)
        .filter { case (_, p) => isComplete(p) }
        .flatMap { case (_, p) => manifestOf(p).getOrElse(Nil) }
    }

  /** ZERO-COPY shallow clone (the lakehouse `CREATE TABLE dst SHALLOW
    * CLONE src` verb): publish a manifest for `dst` that references the
    * SOURCE's current data files — no bytes move, so cloning a 100-TB
    * table is one metadata write. From then on the two names diverge
    * independently: appends/deletes/compactions on either side publish
    * their own generations and never touch the other's rows.
    *
    * The sharp edge every shallow-clone implementation has is GC: the
    * clone's manifest points INTO the source's version/blob directories,
    * which the source's own publish GC and [[vacuum]] would otherwise
    * reclaim two publishes later. The clone therefore registers a
    * BACK-REFERENCE (`__refs__/<src>/<dst>`) BEFORE its manifest is
    * written — a crash between the two leaves an orphan ref that only
    * over-protects (and is cleaned by `delete(dst)`); the reverse order
    * would let a racing source publish GC the files the new clone is
    * about to reference. Both GC paths extend their protection set with
    * every live clone's referenced files ([[cloneProtectedFiles]]),
    * transitively, and `delete(src)` refuses loudly while clones live.
    *
    * The whole operation holds the source's writer lease, so no publish
    * can slip between the snapshot read and the ref registration —
    * cross-JVM included.
    *
    * The reference's SDFS has no snapshot verb at all (a PUT overwrites
    * in place, src/master.go:212-298); this is the engine-side extension
    * that makes dev/test branching free at scale. */
  def cloneTable(src: String, dst: String): Unit = {
    require(src != dst, s"cannot clone '$src' onto itself")
    lockFor(src).synchronized {
      acquireLease(src)
      try {
        require(
          versionDirs(dst).isEmpty && !fs.exists(pathOf(dst)),
          s"clone target '$dst' already exists — clone creates, it never overwrites")
        require(exists(src), s"clone source '$src' does not exist")
        val srcDir = resolveReadable(src)
        val files  = liveFiles(src)
        val schema = manifestSchemaOf(srcDir).getOrElse(readTable(src).schema)
        fs.mkdirs(refsDirOf(src))
        fs.create(new Path(refsDirOf(src), dst), true).close()
        publishVersion(dst) { dir =>
          // a pending deletion vector is part of the source's effective
          // state — the clone snapshots it (and diverges from there)
          carryDeletes(srcDir, dir)
          writeManifest(dir, files, schema)
        }
      } finally releaseLease(src)
    }
  }

  // ------------------------- expectation-gated writes (data-quality CHECKs)

  /** Constraint-gated APPEND — the write-path data-quality gate a training
    * pipeline puts in front of every ingest (the "expectations" verb of
    * Delta Live Tables / Great Expectations, engine-native here). Each
    * expectation is `(ruleName, boolean SQL predicate over the batch's
    * columns)`; a row violating ANY rule is dirty. ANSI CHECK-constraint
    * NULL semantics: a predicate evaluating to NULL counts as SATISFIED —
    * declare `col IS NOT NULL` explicitly when null itself is the defect.
    *
    * `onViolation`:
    *   - `"quarantine"` (default): clean rows append to the table; dirty
    *     rows land in `<name>.__quarantine__` with a `_violated`
    *     array<string> of the rules they broke and the `_quarantined_commit`
    *     table version their clean siblings published — the re-driveable
    *     dead-letter queue (fix upstream, re-append the quarantine).
    *   - `"drop"`: clean rows append; dirty rows are counted and discarded.
    *   - `"fail"`: if ANY row violates, nothing is written and
    *     [[ExpectationViolationException]] reports per-rule counts — the
    *     all-or-nothing CI gate.
    *
    * Scale shape: ONE scan of the batch — every rule evaluates in a single
    * projection (an array of `when`s, codegen'd), the batch is persisted
    * delta-sized so the clean/dirty split and per-rule counts never
    * recompute the source, and both appends are O(delta) manifest appends.
    * Table-size never appears in the cost. Returns the per-rule report
    * `(rule, n_violations)` with a row for EVERY declared rule (zeros
    * included — a silent rule is indistinguishable from a skipped one
    * otherwise). Parquet only (the manifest-append path). */
  def appendTableExpect(
      name: String,
      df: org.apache.spark.sql.DataFrame,
      expectations: Seq[(String, String)],
      onViolation: String = "quarantine"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(expectations.nonEmpty, "appendTableExpect needs at least one expectation")
    require(
      expectations.map(_._1).distinct.size == expectations.size,
      "duplicate expectation rule names")
    require(
      Set("quarantine", "drop", "fail").contains(onViolation),
      s"onViolation must be quarantine|drop|fail, got '$onViolation'")
    require(
      !df.columns.contains("_violated") && !df.columns.contains("_quarantined_commit"),
      "batch already carries a _violated/_quarantined_commit column")
    // cast to containsNull=true: parquet round-trips array elements as
    // nullable, and the quarantine's second append would otherwise refuse
    // its own first batch's schema
    val viol = array_compact(
      array(expectations.map { case (rule, p) => when(!expr(p), lit(rule)) }: _*))
      .cast(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, true))
    val checked = df.withColumn("_violated", viol).persist()
    try {
      val perRule: Map[String, Long] = checked
        .select(explode(col("_violated")).as("rule"))
        .groupBy(col("rule"))
        .count()
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      val nDirty = checked.filter(size(col("_violated")) > 0).count()
      if (onViolation == "fail" && nDirty > 0)
        throw new ExpectationViolationException(name, nDirty, perRule)
      val clean = checked.filter(size(col("_violated")) === 0).drop("_violated")
      appendTable(name, clean)
      if (onViolation == "quarantine" && nDirty > 0) {
        val commit = versions(name).headOption.getOrElse(-1L)
        val dirty = checked
          .filter(size(col("_violated")) > 0)
          .withColumn("_quarantined_commit", lit(commit))
        appendTable(s"$name.__quarantine__", dirty)
      }
      val rows = expectations.map { case (rule, _) => (rule, perRule.getOrElse(rule, 0L)) }
      spark.createDataFrame(rows).toDF("rule", "n_violations")
    } finally { checked.unpersist(); () }
  }

  /** The dead-letter queue [[appendTableExpect]] fills: original columns +
    * `_violated` (array of broken rule names) + `_quarantined_commit`. */
  def quarantineOf(name: String): org.apache.spark.sql.DataFrame =
    readTable(s"$name.__quarantine__")

  /** [[appendTableExpect]] (quarantine mode) × [[appendTableExactlyOnce]]:
    * the per-micro-batch body of an expectation-gated STREAMING ingest
    * ([[graft.streaming.EventStreams.expectStream]]). Both sides carry
    * their own replay guard — foreachBatch can re-deliver a batch id
    * after a crash that landed the clean append but not the quarantine
    * one (or vice versa), and each side independently skips what it
    * already committed, so a replay can never double-append either. A
    * clean-only batch leaves the quarantine's commit cursor behind on
    * purpose: Structured Streaming replays the FAILED batch before
    * advancing, so the cursor is always ≤ the replayed id when it
    * matters. Returns false when BOTH sides had already committed this
    * batch. */
  def appendTableExpectExactlyOnce(
      name: String,
      df: org.apache.spark.sql.DataFrame,
      expectations: Seq[(String, String)],
      batchId: Long): Boolean = lockFor(name).synchronized {
    import org.apache.spark.sql.functions._
    require(expectations.nonEmpty, "appendTableExpectExactlyOnce needs at least one expectation")
    val q        = s"$name.__quarantine__"
    val needMain = batchId > lastCommittedBatch(name)
    val needQuar = batchId > lastCommittedBatch(q)
    if (!needMain && !needQuar) false
    else {
      val viol = array_compact(
        array(expectations.map { case (rule, p) => when(!expr(p), lit(rule)) }: _*))
        .cast(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, true))
      val checked = df.withColumn("_violated", viol).persist()
      try {
        if (needMain)
          appendTable(name, checked.filter(size(col("_violated")) === 0).drop("_violated"),
            commitId = Some(batchId))
        if (needQuar) {
          val dirty = checked.filter(size(col("_violated")) > 0)
          if (dirty.limit(1).count() > 0) {
            val commit = versions(name).headOption.getOrElse(-1L)
            appendTable(q, dirty.withColumn("_quarantined_commit", lit(commit)),
              commitId = Some(batchId))
          }
        }
        true
      } finally { checked.unpersist(); () }
    }
  }

  // ------------------- per-file value Blooms (point-lookup file pruning)

  /** Per-file, per-column VALUE Bloom filters — the equality-lookup
    * complement to the min/max zone maps ([[analyzeTable]] fileStats) and
    * the token Blooms ([[analyzeGrepIndex]]): zone maps prune range
    * predicates on CLUSTERED columns, but an equality/IN probe on a
    * column with no sort order (ids, foreign keys) overlaps every file's
    * [min,max] and prunes nothing. A per-file Bloom of `xxhash64(col)`
    * answers "might this FILE contain this VALUE" regardless of layout —
    * the needle-in-100-TB lookup reads only the files whose Bloom fires.
    *
    * One scan builds all `cols` at once (explode of per-column hash
    * structs, NULLs excluded — an equality probe can never match NULL, so
    * an all-NULL file correctly vanishes from the index and prunes). Rows:
    * `(file, colname, bits, num_hashes, datatype, analyzed_version)`;
    * `datatype` is the column's Catalyst JSON so probes hash literals in
    * the EXACT same domain (an int probed as a long hashes differently).
    * Version-stamped like every stats tier: readers refuse a stale index
    * and degrade to the full scan, never prune on yesterday's files. */
  def analyzeBloomIndex(
      name: String,
      cols: Seq[String],
      numBits: Int = 1 << 17,
      numHashes: Int = 4,
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "analyzeBloomIndex needs at least one column")
    val t = readTableRaw(name, format)
    cols.foreach(c =>
      require(t.columns.contains(c), s"column '$c' not in table '$name' (${t.columns.mkString(",")})"))
    val analyzedVersion = versions(name).headOption.getOrElse(-1L)
    val dtJson = map(cols.flatMap(c => Seq(lit(c), lit(t.schema(c).dataType.json))): _*)
    val bloomAgg = udaf(new graft.functions.Bloom.BuildAgg(numBits, numHashes))
    val pairs = array(cols.map(c =>
      struct(lit(c).as("colname"), xxhash64(col(c)).as("h"), col(c).isNull.as("isnull"))): _*)
    val idx = t
      .select(input_file_name().as("file"), explode(pairs).as("p"))
      .filter(!col("p.isnull"))
      .select(col("file"), col("p.colname").as("colname"), col("p.h").as("h"))
      .groupBy(col("file"), col("colname"))
      .agg(bloomAgg(col("h")).as("bits"))
      .withColumn("num_hashes", lit(numHashes))
      .withColumn("datatype", element_at(dtJson, col("colname")))
      .withColumn("analyzed_version", lit(analyzedVersion))
    putTable(s"$name.__valbloom__", idx, format)
    readTable(s"$name.__valbloom__", format)
  }

  /** O(delta) refresh of [[analyzeBloomIndex]] after an append: still-live
    * files inherit their Blooms verbatim (restamped); only never-seen
    * files scan, with the prior index's exact geometry, columns, and type
    * domains. Loud when no prior index exists. Returns `(n_files_live,
    * n_files_scanned, n_files_inherited)`. */
  def analyzeBloomIndexAppended(name: String, format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(format == "parquet", s"analyzeBloomIndexAppended is parquet-only, got $format")
    require(
      this.exists(s"$name.__valbloom__"),
      s"no __valbloom__ for '$name' — run analyzeBloomIndex once before going incremental")
    val currentVersion = versions(name).headOption.getOrElse(-1L)
    require(currentVersion >= 0, s"no versioned data for '$name'")
    val priorDf = readTable(s"$name.__valbloom__", format)
    val priorMeta = priorDf
      .select(col("file"), col("colname"), col("num_hashes"), size(col("bits")).as("words"))
      .collect()
    require(priorMeta.nonEmpty, s"empty __valbloom__ for '$name'")
    val numHashes = priorMeta.head.getAs[Int]("num_hashes")
    val numBits   = priorMeta.head.getAs[Int]("words") * 64
    require(
      priorMeta.forall(r => r.getAs[Int]("num_hashes") == numHashes && r.getAs[Int]("words") * 64 == numBits),
      s"mixed bloom geometry in __valbloom__ for '$name' — rebuild with analyzeBloomIndex")
    val cols = priorMeta.map(_.getAs[String]("colname")).distinct.toSeq.sorted
    def norm(s: String): String = new Path(s).toUri.getPath
    val live      = liveFiles(name)
    val liveNorm  = live.map(norm).toSet
    val keepFiles = priorMeta.map(_.getAs[String]("file")).distinct.filter(f => liveNorm.contains(norm(f)))
    val keptNorm  = keepFiles.map(norm).toSet
    val missing   = live.filterNot(f => keptNorm.contains(norm(f)))
    val inherited = priorDf
      .filter(col("file").isin(keepFiles.toSeq: _*))
      .withColumn("analyzed_version", lit(currentVersion))
    val idx =
      if (missing.isEmpty) inherited
      else {
        val schema = readTable(name, format).schema
        val dtJson = map(cols.flatMap(c => Seq(lit(c), lit(schema(c).dataType.json))): _*)
        val bloomAgg = udaf(new graft.functions.Bloom.BuildAgg(numBits, numHashes))
        val pairs = array(cols.map(c =>
          struct(lit(c).as("colname"), xxhash64(col(c)).as("h"), col(c).isNull.as("isnull"))): _*)
        val fresh = readFilesWithLayout(missing, schema)
          .select(input_file_name().as("file"), explode(pairs).as("p"))
          .filter(!col("p.isnull"))
          .select(col("file"), col("p.colname").as("colname"), col("p.h").as("h"))
          .groupBy(col("file"), col("colname"))
          .agg(bloomAgg(col("h")).as("bits"))
          .withColumn("num_hashes", lit(numHashes))
          .withColumn("datatype", element_at(dtJson, col("colname")))
          .withColumn("analyzed_version", lit(currentVersion))
        inherited.unionByName(fresh)
      }
    putTable(s"$name.__valbloom__", idx, format)
    spark
      .createDataFrame(Seq((live.size.toLong, missing.size.toLong, keepFiles.size.toLong)))
      .toDF("n_files_live", "n_files_scanned", "n_files_inherited")
  }

  /** Files an equality conjunct `colName = value` provably cannot match,
    * per a FRESH `__valbloom__` index for that column: files whose Bloom
    * misses the probe hash, plus live files ABSENT from the index — the
    * index was built at this exact version, so absence means the column
    * had no non-NULL value in that file, and equality never matches NULL.
    * NORMALIZED paths. Empty when no fresh index covers the column
    * (conservative: nothing excluded). The probe literal arrives as a
    * string ([[readTableWhereAll]]'s domain) and is cast to the index's
    * recorded type — the exact build-side hash domain; a literal that
    * casts to NULL hashes degenerately, which stays CORRECT because the
    * final predicate (`col = NULL`) matches nothing regardless of which
    * files scan. */
  private def bloomEqualityExcluded(
      name: String,
      colName: String,
      value: String,
      currentVersion: Long): Set[String] = {
    import org.apache.spark.sql.functions._
    if (currentVersion < 0) return Set.empty
    if (!this.exists(s"$name.__valbloom__")) return Set.empty
    val idx =
      try readTable(s"$name.__valbloom__").filter(col("colname") === colName).collect()
      catch { case scala.util.control.NonFatal(_) => return Set.empty }
    if (idx.isEmpty) return Set.empty
    if (!idx.forall(_.getAs[Long]("analyzed_version") == currentVersion)) return Set.empty
    def normP(s: String): String = new Path(s).toUri.getPath
    val dt =
      try org.apache.spark.sql.types.DataType.fromJson(idx.head.getAs[String]("datatype"))
      catch { case scala.util.control.NonFatal(_) => return Set.empty }
    val h = spark.range(1).select(xxhash64(lit(value).cast(dt))).head().getLong(0)
    val misses = idx.collect {
      case r
          if !graft.functions.Bloom
            .testLocal(r.getAs[Seq[Long]]("bits").toArray, r.getAs[Int]("num_hashes"), h) =>
        normP(r.getAs[String]("file"))
    }.toSet
    val indexed = idx.map(r => normP(r.getAs[String]("file"))).toSet
    val absent  = liveFiles(name).map(normP).filterNot(indexed).toSet
    misses ++ absent
  }

  /** The files an IN-list equality probe must read according to the
    * [[analyzeBloomIndex]] Blooms: every live file whose Bloom fires for
    * AT LEAST ONE probe value. `None` = no fresh index for this column —
    * the caller must full-scan (correctness-preserving degrade, same
    * discipline as [[grepPruned]]). Public so deployments (and the spec)
    * can audit prune ratios without reading plans. */
  def lookupCandidateFiles(
      name: String,
      colName: String,
      values: Seq[Any],
      format: String = "parquet"): Option[Seq[String]] = {
    import org.apache.spark.sql.functions._
    require(values.nonEmpty, "lookup needs at least one probe value")
    if (format != "parquet") return None
    if (!this.exists(s"$name.__valbloom__")) return None
    val idx = readTable(s"$name.__valbloom__", format)
      .filter(col("colname") === colName)
      .collect() // nFiles rows — metadata-sized
    if (idx.isEmpty) return None
    val current = versions(name).headOption.getOrElse(-1L)
    if (!(current >= 0 && idx.forall(_.getAs[Long]("analyzed_version") == current))) return None
    // probe hashes via a one-row relation CAST to the indexed column's
    // exact type — xxhash64 parity with the executor-side build (an int
    // probed as a long hashes differently; never re-implement the hash)
    val dt = org.apache.spark.sql.types.DataType.fromJson(idx.head.getAs[String]("datatype"))
    val row = spark
      .range(1)
      .select(values.zipWithIndex.map { case (v, i) => xxhash64(lit(v).cast(dt)).as(s"h$i") }: _*)
      .head()
    val hashes = values.indices.map(row.getLong)
    Some(idx.collect {
      case r
          if hashes.exists(h =>
            graft.functions.Bloom
              .testLocal(r.getAs[Seq[Long]]("bits").toArray, r.getAs[Int]("num_hashes"), h)) =>
        r.getAs[String]("file")
    }.toSeq)
  }

  /** Point lookup `column IN (values)` through the per-file value Blooms:
    * read ONLY the candidate files, then apply the exact predicate (Bloom
    * false positives are eliminated; no false negatives exist). Missing or
    * stale index degrades to the full filtered scan. An all-files-pruned
    * probe returns the empty frame with the table's schema. Layout-aware:
    * partitioned tables keep their partition columns in the pruned read. */
  def readTableLookupIn(
      name: String,
      colName: String,
      values: Seq[Any],
      format: String = "parquet"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def fullScan = readTable(name, format).filter(col(colName).isin(values: _*))
    lookupCandidateFiles(name, colName, values, format) match {
      case None      => fullScan
      case Some(Nil) => readTable(name, format).filter(lit(false))
      case Some(files) =>
        applyCurrentDeletes(name, readFilesWithLayout(files, readTable(name, format).schema, format))
          .filter(col(colName).isin(values: _*))
    }
  }
}

object Catalog {
  /** Reference parity: `minute = 60` seconds at src/master_helpers.go:27. */
  val DefaultConflictWindowMs: Long = 60000L
  /** Legacy staging/backup suffixes, still hidden from [[Catalog.store]]. */
  val TmpSuffix: String = ".__tmp__"
  val OldSuffix: String = ".__old__"
  /** Namespace-level bookkeeping dirs (commit high-water marks, writer
    * leases) — not tables, hidden from [[Catalog.store]]. */
  val SystemDirs: Set[String] = Set("__hwm__", "__locks__", "__refs__")
  /** A writer lease spans a full Spark write job, so expiry is generous. */
  val DefaultWriterLeaseMs: Long = 15 * 60 * 1000L
  /** GC keeps this many newest complete versions; 2 = current + previous,
    * the minimum that guarantees in-flight readers their snapshot. */
  val DefaultRetainVersions: Int = 2
  /** Engine-native write-once version dirs: `<name>.__v<N>__`. */
  val VersionRe: scala.util.matching.Regex = "^(.*)\\.__v(\\d+)__$".r

  /** Compare two values rendered as strings in a column's domain: numeric
    * and decimal types compare as exact BigDecimal; everything else —
    * strings, and the ISO renderings ANALYZE stores for date/timestamp —
    * compares lexicographically (chronological for ISO). Used by the
    * [[Catalog.readTableWhere]] prune decision. None when either side
    * does not parse in the numeric domain — a float/double column
    * containing NaN/Infinity renders a non-finite min/max, and the prune
    * must degrade to a normal scan, not throw. */
  private[sources] def compareInDomain(a: String, b: String, dataType: String): Option[Int] = {
    val numeric = Set("tinyint", "smallint", "int", "bigint", "float", "double")
    if (numeric.contains(dataType) || dataType.startsWith("decimal"))
      try Some(new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)))
      catch { case _: NumberFormatException => None }
    else Some(a.compareTo(b))
  }

  /** True iff `<col> <op> <value>` PROVABLY matches no row of a unit (the
    * whole table, or one file's zone) whose column stats are given: the
    * unit is all-NULL (no comparison matches NULL), or the literal falls
    * outside [min, max] in the op's direction. Unknown stats — missing
    * min/max, or non-finite numeric renderings (NaN/Infinity) that
    * [[compareInDomain]] refuses to parse — answer false: degrade to the
    * scan, never prune on a guess. Shared by both prune tiers of
    * [[Catalog.readTableWhere]]. */
  private[sources] def rangeExcludes(
      minValue: Option[String],
      maxValue: Option[String],
      nNulls: Long,
      nRows: Long,
      dataType: String,
      op: String,
      value: String): Boolean = {
    if (nNulls >= nRows && nRows > 0) true
    else (minValue, maxValue) match {
      case (Some(mn), Some(mx)) =>
        (compareInDomain(mn, value, dataType), compareInDomain(mx, value, dataType)) match {
          case (Some(cmpMin), Some(cmpMax)) =>
            op match {
              case "="  => cmpMin > 0 || cmpMax < 0 // literal outside [min, max]
              case "<"  => cmpMin >= 0              // min >= literal: nothing below it
              case "<=" => cmpMin > 0
              case ">"  => cmpMax <= 0              // max <= literal: nothing above it
              case ">=" => cmpMax < 0
              case _    => false
            }
          case _ => false
        }
      case _ => false
    }
  }

  /** One (file, column) row of the published `__filestats__` zone map. */
  final case class FileColumnStats(
      file: String,
      column: String,
      dataType: String,
      nRows: Long,
      minValue: Option[String],
      maxValue: Option[String],
      nNulls: Long)

  /** Parsed `__filestats__` frame: the stamped data version plus one
    * [[FileColumnStats]] per (file, column). */
  final case class FileStats(analyzedVersion: Option[Long], columns: Seq[FileColumnStats])

  /** One atomic column's published ANALYZE stats (see [[Catalog.analyzeTable]]). */
  final case class ColumnStats(
      column: String,
      dataType: String,
      minValue: Option[String],
      maxValue: Option[String],
      nDistinct: Long,
      nNulls: Long,
      maxFreq: Option[Long] = None)

  /** Table-level sizing parsed from the `__stats__` frame: row count plus a
    * conservative DECOMPRESSED per-row width (see [[Catalog.statsFor]]).
    * `analyzedVersion` is the data version ANALYZE scanned (None for
    * pre-versioning stats frames) — result-correctness consumers must
    * match it against the version they read. */
  final case class TableStats(
      nRows: Long,
      estRowBytes: Long,
      columns: Seq[ColumnStats],
      analyzedVersion: Option[Long] = None) {
    def estBytes: Long = nRows * estRowBytes
  }
}

/** A PUT raced a recent write to the same name (within the reference's 60 s
  * confirm window) and was rejected; retry with `force = true` to overwrite. */
final class PutConflictException(val name: String, val ageMs: Long, val windowMs: Long)
    extends RuntimeException(
      s"'$name' was written ${ageMs}ms ago (< ${windowMs}ms conflict window)")

/** Another writer (possibly another JVM) holds the publish lease for this
  * name — the engine-native write was refused rather than risking
  * interleaved version scans/GC. Retry once the other write completes, or
  * wait out the lease expiry if its holder crashed. */
final class ConcurrentWriteException(val name: String, val ageMs: Long, val leaseMs: Long)
    extends RuntimeException(
      s"another writer holds the publish lease for '$name' " +
        s"(held ${ageMs}ms, expires after ${leaseMs}ms)")

/** DELETE refused: live shallow clones still read this table's data files
  * ([[Catalog.cloneTable]]) — dropping the base would truncate them
  * silently. Delete the clones first. */
final class LiveCloneException(val name: String, val clones: Seq[String])
    extends RuntimeException(
      s"cannot delete '$name': live shallow clone(s) ${clones.mkString(", ")} " +
        "reference its data files — delete the clones first")

/** `onViolation = "fail"` tripped: the batch had rows violating declared
  * expectations, nothing was written ([[Catalog.appendTableExpect]]). */
final class ExpectationViolationException(
    val name: String,
    val nDirty: Long,
    val perRule: Map[String, Long])
    extends RuntimeException(
      s"append to '$name' refused: $nDirty row(s) violate expectations " +
        perRule.toSeq.sorted.map { case (r, n) => s"$r=$n" }.mkString("(", ", ", ")"))
