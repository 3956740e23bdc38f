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
  import Catalog.{OldSuffix, TmpSuffix, VersionRe}
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
    * one, plus any plain-path upload this engine-native write shadows. */
  private def publishVersion(name: String)(write: Path => Unit): Unit =
    lockFor(name).synchronized {
      val existing = versionDirs(name)
      val next     = existing.map(_._1).maxOption.getOrElse(0L) + 1L
      write(pathOf(s"$name.__v${next}__"))
      versionDirs(name).foreach { case (v, p) =>
        if (v < next && (v < next - 1 || !isComplete(p))) fs.delete(p, true)
      }
      // a superseded interactive upload at the plain path; versioned reads
      // shadow it already, delete only once the new version is live
      if (fs.exists(pathOf(name))) fs.delete(pathOf(name), true)
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

  /** Structured dataset read, format-symmetric with [[putTable]]. For csv,
    * pass `schema` to avoid a driver inference pass over the data. */
  def readTable(
      name: String,
      format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None): org.apache.spark.sql.DataFrame = {
    val p = resolveReadable(name).toString
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
    * recursive FS deletes of every version of the name. */
  def delete(name: String): Boolean = lockFor(name).synchronized {
    val versioned = versionDirs(name).map { case (_, p) => fs.delete(p, true) }
    val plain     = fs.delete(pathOf(name), true)
    plain || versioned.exists(identity)
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
        .filterNot(n => n.endsWith(TmpSuffix) || n.endsWith(OldSuffix))
      (versionedNames ++ plainNames).distinct.sorted
    }

  def lsPrefix(prefix: String): Seq[String] =
    store().filter(_.startsWith(prefix))

  def exists(name: String): Boolean = fs.exists(resolveReadable(name))

  /** Version numbers currently readable for `name`, newest first — the
    * time-travel window. The publish GC retains the current and
    * immediately-previous complete versions, so depth is at most 2 (plus
    * any in-flight write); a deployment wanting deeper history raises the
    * GC horizon, not this API. */
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
    if (fileStats) publishFileStats(name, df, fields, analyzedVersion, format)
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
        else fileStatsFor(name, format) match {
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
              val keep = allFiles.filterNot(excluded)
              if (keep.size >= allFiles.size) None // nothing pruned: plain scan
              else if (keep.isEmpty) Some(emptyLocal)
              else {
                val r = spark.read.schema(table.schema)
                Some(predicate(if (format == "parquet") r.parquet(keep: _*) else r.orc(keep: _*)))
              }
            }
          case _ => None
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
      case "parquet" => spark.read.parquet(p.get.toString)
      case "orc"     => spark.read.orc(p.get.toString)
      case "csv"     => spark.read.option("header", "true").option("inferSchema", "true").csv(p.get.toString)
      case "json"    => spark.read.json(p.get.toString)
      case other     => throw new IllegalArgumentException(s"unsupported format: $other")
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
}

object Catalog {
  /** Reference parity: `minute = 60` seconds at src/master_helpers.go:27. */
  val DefaultConflictWindowMs: Long = 60000L
  /** Legacy staging/backup suffixes, still hidden from [[Catalog.store]]. */
  val TmpSuffix: String = ".__tmp__"
  val OldSuffix: String = ".__old__"
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
