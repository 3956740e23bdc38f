package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** CATALOG-PERSISTED IVF index — the "index once, query many" lifecycle the
  * in-memory ANN rows rebuild per query. [[Similarity.ivfSearch]] already
  * documents serving from a reloaded index; this closes the loop through
  * the storage layer with the property that makes it pay at 100 TB: the
  * assignments are hive-partitioned BY CELL ([[Catalog.putPartitionedTable]]),
  * so a probe of `nprobe` cells is a PARTITION-PRUNED scan — the planner
  * lists only the probed cells' directories, and the other
  * (nlist − nprobe)/nlist of the index contributes zero I/O (AnnIndexSpec
  * pins PartitionFilters and the pruned file set; the gate row pins
  * result-identity with the in-memory path against the full DuckDB k-means
  * replay oracle).
  *
  * Layout: `<name>` = (neighbor_id, cv, cn) partitioned by cell (the
  * full-precision vectors ride the index rows, so serving never touches
  * the corpus); `<name>.__centroids__` = (cell, dim, v) — the nlist × d
  * model, published AFTER the assignments so a crash mid-build can't leave
  * a centroid table pointing at a missing index (search requires both).
  * Both are versioned catalog tables; rebuild = re-run build.
  *
  * The deterministic trainer ([[Similarity.kmeans]] with tol = 0) keeps
  * the whole lifecycle — train, persist, reload, probe, exact rerank —
  * replayable in SQL, which is what lets the gate hash-check a PERSISTED
  * index against DuckDB.
  */
object AnnIndex {

  /** Per-(catalog-ROOT, index-name) monitor: [[append]] and
    * [[deleteVectors]] read-modify-write shared side tables (generation
    * counter, tombstone set), so in-process concurrent maintainers must
    * serialize. Keyed by the qualified root PATH, not the instance: the
    * query suite's common pattern is a fresh `new Catalog(spark, root)`
    * per call, and instance-keyed monitors would let two instances on the
    * same root race each other (identityHashCode can also collide across
    * unrelated catalogs). Same discipline as the catalog's own per-name
    * locks; cross-JVM exclusion is the catalog writer lease's job. */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(cat: Catalog, name: String): Object =
    locks.computeIfAbsent(s"${cat.rootPath}#$name", _ => new Object)

  /** Train the centroid model, persist assignments (cell-partitioned), the
    * model, and the build parameters (so [[append]] assigns new vectors
    * with the SAME multiplicity); returns the centroids for immediate use.
    * A REBUILD on an existing name clears the derived side tables in
    * CRASH-SAFE order: (1) superseded generations go first — they were
    * assigned with the OLD model and must never union with the new base's
    * cell space (a crash here loses only appends the rebuild corpus
    * supersedes, and the old base still serves WITH its tombstones);
    * (2) centroids and meta are overwritten in place (versioned puts —
    * never a delete window where search loses its model); (3) tombstones
    * are cleared LAST, only after the new index is fully published. The
    * invariant this ordering buys: no crash point can RESURRECT a deleted
    * vector on the read path — a rebuild that dies between base publish
    * and tombstone clear leaves conservative over-exclusion (old
    * tombstone ids anti-joined against the new base) until build is
    * re-run, never the silent staleness [[deleteVectors]] exists to
    * prevent. */
  def build(
      cat: Catalog,
      name: String,
      corpus: DataFrame,
      nlist: Int,
      iters: Int = 5,
      assign: Int = 1): Array[Array[Double]] = lockFor(cat, name).synchronized {
    cat.lsPrefix(s"$name.__anngen").foreach(cat.delete)
    val centroids = Similarity.kmeans(corpus, k = nlist, maxIter = iters, tol = 0.0).centroids
    cat.putPartitionedTable(name, Similarity.ivfAssign(corpus, centroids, assign), "cell")
    val spark = corpus.sparkSession
    val rows = centroids.zipWithIndex.flatMap { case (arr, c) =>
      arr.zipWithIndex.map { case (v, d) => (c, d, v) }
    }.toSeq
    cat.putTable(s"$name.__centroids__", spark.createDataFrame(rows).toDF("cell", "dim", "v"))
    cat.putTable(
      s"$name.__annmeta__",
      spark.createDataFrame(Seq((nlist, iters, assign))).toDF("nlist", "iters", "assign"))
    cat.lsPrefix(s"$name.__anntomb").foreach(cat.delete)
    centroids
  }

  /** Incremental maintenance: assign `vectors` with the FROZEN persisted
    * model (no retraining — the appended vectors see exactly the geometry
    * the base build froze, which is what keeps the whole multi-generation
    * index replayable in the oracle) and persist them as a new
    * cell-partitioned GENERATION table (`<name>.__anngenNNNN__`).
    * [[search]] serves across the base and every generation; probes stay
    * partition-pruned per generation (the IN-filter pushes through the
    * union into each branch's directory listing). O(delta) by
    * construction. Retrain when [[audit]] says the frozen geometry has
    * drifted — rebuild re-trains and new appends chain off the new model.
    * Returns the generation index. */
  def append(cat: Catalog, name: String, vectors: DataFrame): Int =
    lockFor(cat, name).synchronized {
      val meta      = cat.readTable(s"$name.__annmeta__").head()
      val centroids = loadCentroids(cat, name)
      // max existing generation + 1 (NOT the list's size: a crashed append
      // can leave gaps, and size-derived names would then collide); the
      // per-name lock serializes concurrent appenders so two maintainers
      // can never mint the same generation and publish over each other.
      val k = cat
        .lsPrefix(s"$name.__anngen")
        .flatMap(g => "\\d+".r.findFirstIn(g.stripPrefix(s"$name.__anngen")))
        .map(_.toInt)
        .maxOption
        .map(_ + 1)
        .getOrElse(0)
      val gen = f"$name.__anngen$k%04d__"
      cat.putPartitionedTable(gen, Similarity.ivfAssign(vectors, centroids, meta.getAs[Int]("assign")), "cell")
      k
    }

  /** TOMBSTONE deletion — the index-side twin of the corpus
    * `deleteWhere`: record the ids in `<name>.__anntomb__` so every read
    * path ([[search]], [[audit]]) excludes them from this call on. Without
    * it the index silently serves neighbors the corpus already deleted —
    * the staleness the catalog's sample tier refuses loudly
    * (Catalog.analyzeSampleIncremental's coverage guard); an ANN index
    * can do better than refuse, because exclusion is cheap: one
    * tombstone-table anti-join, applied AFTER partition pruning, so probe
    * I/O is unchanged. Tombstones accumulate across calls (set-union,
    * idempotent); [[build]] clears them — a rebuild re-indexes only what
    * its corpus argument contains, so the tombstones' work is done.
    * `ids`' FIRST column is the vector id. Returns the live tombstone
    * count. */
  def deleteVectors(cat: Catalog, name: String, ids: DataFrame): Long =
    lockFor(cat, name).synchronized {
      require(cat.exists(name), s"no ANN index '$name' — nothing to delete from")
      val tomb = ids.select(col(ids.columns.head).cast("long").as("neighbor_id")).distinct()
      val merged =
        if (cat.exists(s"$name.__anntomb__"))
          cat.readTable(s"$name.__anntomb__").unionByName(tomb).distinct()
        else tomb
      // materialize BEFORE the overwrite: `merged` lazily reads the old
      // version, and putTable's publish must not race its own input
      val rows = merged.collect() // tombstone-sized, not corpus-sized
      val fresh = cat.readTable(name).sparkSession
        .createDataFrame(java.util.Arrays.asList(rows: _*), merged.schema)
      cat.putTable(s"$name.__anntomb__", fresh)
      rows.length.toLong
    }

  /** The serving frame as a SNAPSHOT: base index plus every appended
    * generation, minus tombstoned vectors — what [[search]] scans after
    * pruning, exposed publicly so online paths compose with index
    * maintenance. Snapshot semantics, stated plainly: the catalog state
    * (manifest version, generation list, tombstone-table existence)
    * resolves EAGERLY at this call — maintenance issued afterwards is
    * invisible to the returned frame, so a long-lived consumer (a
    * stream-static join captures the frame at stream start) keeps serving
    * the snapshot until it re-derives. For per-micro-batch propagation of
    * appends and deletes with no restart, use
    * [[graft.streaming.AnnStreams.ivfServeStreamLive]], which re-resolves
    * this frame inside every batch. */
  def liveIndex(cat: Catalog, name: String): DataFrame = readIndex(cat, name)

  /** The base index plus every appended generation, minus tombstoned
    * vectors. The anti-join's right side is the tombstone table (bounded
    * by deletes, not corpus size); the cell filter the searcher applies
    * above this still pushes into each generation's directory listing, so
    * pruning is unaffected. */
  private def readIndex(cat: Catalog, name: String): DataFrame = {
    val base = cat.lsPrefix(s"$name.__anngen").sorted
      .foldLeft(cat.readTable(name))((acc, g) => acc.unionByName(cat.readTable(g)))
    if (cat.exists(s"$name.__anntomb__"))
      base.join(
        broadcast(cat.readTable(s"$name.__anntomb__").select(col("neighbor_id"))),
        Seq("neighbor_id"),
        "left_anti")
    else base
  }

  /** GENERATION COMPACTION — the maintenance verb that closes the append
    * lifecycle: fold every appended generation into the base table (one
    * cell-partitioned rewrite of base ∪ generations — the assignments
    * were all made with the SAME frozen model, so cell geometry is
    * untouched) and drop the generation tables. Why it matters at scale:
    * each generation is its own hive directory tree, so a probe of p
    * cells lists p directories PER GENERATION — after thousands of small
    * appends the listing tax dominates; compaction restores one-listing-
    * per-cell probes without retraining (audit()'s imbalance signal, not
    * this, decides retraining). Tombstones are untouched — they anti-join
    * ids, not generations.
    *
    * Crash-safe by the scorer's own algebra: the new base publishes FIRST,
    * so a reader in the window (or after a crash mid-cleanup) unions the
    * folded base with still-present old generations — duplicate index
    * rows with identical payloads, which the searcher collapses
    * (candidates.distinct + per-(query, neighbor) max) — results are
    * bit-identical at every crash point, never missing and never doubled.
    * Returns the number of generations folded. */
  def compactGenerations(cat: Catalog, name: String): Int =
    lockFor(cat, name).synchronized {
      require(cat.exists(name), s"no ANN index '$name' — nothing to compact")
      val gens = cat.lsPrefix(s"$name.__anngen").sorted
      if (gens.isEmpty) return 0
      val folded = gens.foldLeft(cat.readTable(name))((acc, g) => acc.unionByName(cat.readTable(g)))
      // cluster by cell before the partitionBy write: without it every
      // write task fans one file into every cell directory (tasks × cells
      // shards — the exact small-file churn this verb exists to remove)
      cat.putPartitionedTable(name, folded.repartition(col("cell")), "cell")
      gens.foreach(cat.delete)
      gens.size
    }

  /** The retrain signal: per-generation/vector counts and the CELL
    * IMBALANCE of the combined index (max cell population / mean). A
    * frozen model serving drifted data funnels new vectors into few
    * cells, so probes stop pruning — imbalance rising past ~2–3 means
    * rebuild. One map-side-combined count over index metadata columns. */
  def audit(cat: Catalog, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{countDistinct => cd}
    val idx    = readIndex(cat, name)
    val nGens  = cat.lsPrefix(s"$name.__anngen").size
    val counts = idx.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val r = counts
      .agg(max(col("n")).cast("double").as("mx"), avg(col("n")).as("mean"), sum(col("n")).as("rows"), cd(col("cell")).as("cells"))
      .head()
    // an empty index (everything tombstoned / deleted) aggregates to NULL
    // max/avg/sum — report an honest zero row, not an unboxing NPE
    val empty = r.isNullAt(r.fieldIndex("rows"))
    idx.sparkSession
      .createDataFrame(Seq((
        nGens.toLong,
        if (empty) 0L else r.getAs[Long]("rows"),
        if (empty) 0L else r.getAs[Long]("cells"),
        if (empty) 0.0
        else
          BigDecimal(r.getAs[Double]("mx") / r.getAs[Double]("mean")).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      .toDF("n_gens", "n_index_rows", "n_cells", "cell_imbalance")
  }

  /** Reload the nlist × d centroid model (model-sized collect). */
  def loadCentroids(cat: Catalog, name: String): Array[Array[Double]] = {
    val rows = cat.readTable(s"$name.__centroids__").collect()
    require(rows.nonEmpty, s"no persisted centroids for ANN index '$name' — run build first")
    val nlist = rows.map(_.getAs[Int]("cell")).max + 1
    val d     = rows.map(_.getAs[Int]("dim")).max + 1
    val cs    = Array.fill(nlist)(new Array[Double](d))
    rows.foreach(r => cs(r.getAs[Int]("cell"))(r.getAs[Int]("dim")) = r.getAs[Double]("v"))
    cs
  }

  /** Serve `queries` (a SMALL batch — it is broadcast by the searcher and
    * its probed-cell union is computed as a tiny job) from the persisted
    * index: restrict the scan to the union of every query's `nprobe`
    * nearest cells — a partition-pruning IN-filter on the cell directory
    * column — then run the standard exact-rerank search over the sliver.
    * Identical results to the in-memory path by construction: the pruned
    * cells are exactly the cells the searcher joins on. */
  def search(
      cat: Catalog,
      name: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4): DataFrame =
    searchFiltered(cat, name, queries, k, nprobe, allowed = None)

  /** FILTERED search — the metadata-predicate variant every production
    * vector store exposes (and the pre-filtering trap they all document):
    * `allowed` is an id allowlist (first column = vector id, typically a
    * corpus predicate's projection), applied to the candidate set BEFORE
    * the top-k cut, so the k results are the best-scoring vectors that
    * SATISFY the predicate — post-filtering the unfiltered top-k would
    * silently return fewer than k (or zero) matches for selective
    * predicates. The allowlist lands as a semi-join AFTER partition
    * pruning: probe I/O is unchanged, and the join side is the
    * predicate's id set, not the corpus. Tombstones still apply on top. */
  def searchFiltered(
      cat: Catalog,
      name: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      allowed: Option[DataFrame] = None): DataFrame = {
    val centroids = loadCentroids(cat, name)
    val probed: Array[Int] = queries
      .select(
        explode(
          graft.functions.VectorFunctions
            .vec_nearest_cells(col("embedding").cast("array<double>"), centroids, nprobe)).as("cell"))
      .distinct()
      .collect()
      .map(_.getInt(0))
    val pruned = readIndex(cat, name).filter(col("cell").isin(probed.toSeq: _*))
    val candidates = allowed.fold(pruned) { ids =>
      pruned.join(
        ids.select(col(ids.columns.head).cast("long").as("neighbor_id")).distinct(),
        Seq("neighbor_id"),
        "left_semi")
    }
    Similarity.ivfSearch(candidates, queries, centroids, k, nprobe)
  }
}
