package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity}
import graft.sources.{Catalog, Tables}

/** Persisted IVF index: identical results to the in-memory path, probes as
  * PARTITION-PRUNED scans (directory pruning, not data filtering), the
  * model round-trips exactly, and a missing index is loud.
  */
class AnnIndexSpec extends SparkSpec {
  private lazy val emb = Tables(spark, SharedSpark.sf0001).embeddings

  private def withCat[A](f: Catalog => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-annidx-spec").toString
    f(new Catalog(spark, root))
  }

  test("persisted search equals the in-memory ivfSearch exactly") {
    withCat { cat =>
      val built   = AnnIndex.build(cat, "ix", emb, nlist = 8, iters = 3, assign = 2)
      val queries = emb.filter(col("vec_id") < 6)
      val got     = AnnIndex.search(cat, "ix", queries, k = 5, nprobe = 4)
      val want = Similarity.ivfSearch(Similarity.ivfAssign(emb, built, assign = 2), queries, built, k = 5, nprobe = 4)
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("the probe scan prunes partitions: only probed cells' directories are read") {
    withCat { cat =>
      AnnIndex.build(cat, "ix2", emb, nlist = 8, iters = 3, assign = 1)
      val allFiles = cat.readTable("ix2").inputFiles.length
      val oneQuery = emb.filter(col("vec_id") === 0)
      val served   = AnnIndex.search(cat, "ix2", oneQuery, k = 5, nprobe = 2)
      val plan = served.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PartitionFilters"), s"cell probe must prune directories:\n$plan")
      // actual files READ (inputFiles is the pre-pruning listing): a 2-cell
      // subset must touch strictly fewer files than the full index
      val readFiles = cat.readTable("ix2")
        .filter(col("cell").isin(0, 1))
        .select(input_file_name())
        .distinct()
        .count()
      assert(readFiles < allFiles, s"a cell subset must scan a file subset ($readFiles vs $allFiles)")
    }
  }

  test("centroids round-trip the model exactly") {
    withCat { cat =>
      val built    = AnnIndex.build(cat, "ix3", emb, nlist = 8, iters = 3)
      val reloaded = AnnIndex.loadCentroids(cat, "ix3")
      assert(reloaded.length === built.length)
      built.zip(reloaded).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    }
  }

  test("append assigns with the frozen model; search serves across generations") {
    withCat { cat =>
      val base  = emb.filter(col("vec_id") % 2 === 0)
      val delta = emb.filter(col("vec_id") % 2 === 1)
      val built = AnnIndex.build(cat, "inc", base, nlist = 8, iters = 3, assign = 2)
      val gen   = AnnIndex.append(cat, "inc", delta)
      assert(gen === 0)
      val queries = emb.filter(col("vec_id") < 6)
      val got     = AnnIndex.search(cat, "inc", queries, k = 5, nprobe = 4)
      // equal to the in-memory search over ALL vectors assigned with the
      // SAME frozen (base-trained) centroids
      val want = Similarity.ivfSearch(Similarity.ivfAssign(emb, built, assign = 2), queries, built, k = 5, nprobe = 4)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(AnnIndex.append(cat, "inc", delta.limit(3)) === 1, "generations must number sequentially")
    }
  }

  test("audit reports generations, rows, and cell imbalance") {
    withCat { cat =>
      AnnIndex.build(cat, "aud", emb.filter(col("vec_id") % 2 === 0), nlist = 8, iters = 3)
      AnnIndex.append(cat, "aud", emb.filter(col("vec_id") % 2 === 1))
      val r = AnnIndex.audit(cat, "aud").head()
      assert(r.getAs[Long]("n_gens") === 1L)
      assert(r.getAs[Long]("n_index_rows") === emb.count())
      assert(r.getAs[Double]("cell_imbalance") >= 1.0)
    }
  }

  test("searching a missing index is loud") {
    withCat { cat =>
      val e = intercept[Exception](AnnIndex.search(cat, "nope", emb.limit(1), k = 3))
      assert(e.getMessage != null)
    }
  }

  test("deleteVectors tombstones: search never serves a deleted neighbor (the corpus-deleteWhere twin)") {
    withCat { cat =>
      AnnIndex.build(cat, "del", emb, nlist = 8, iters = 3, assign = 2)
      val queries = emb.filter(col("vec_id") < 6)
      val before  = AnnIndex.search(cat, "del", queries, k = 5, nprobe = 4)
      // delete every neighbor the first query currently sees — the
      // strongest staleness probe: each of them WAS being served
      val victims = before.filter(col("query_id") === 0).select(col("neighbor_id")).distinct()
      val victimIds = victims.collect().map(_.getLong(0)).toSet
      assert(victimIds.nonEmpty)
      val n = AnnIndex.deleteVectors(cat, "del", victims)
      assert(n === victimIds.size.toLong)
      val after = AnnIndex.search(cat, "del", queries, k = 5, nprobe = 4)
      val servedAfter = after.select(col("neighbor_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(servedAfter.intersect(victimIds).isEmpty,
        s"tombstoned vectors still served: ${servedAfter.intersect(victimIds)}")
      // deletion is read-path exclusion over the SAME frozen geometry:
      // query 0's new neighbors are the next-best candidates, not a retrain
      assert(after.filter(col("query_id") === 0).count() > 0)
      // idempotent: deleting again changes nothing
      assert(AnnIndex.deleteVectors(cat, "del", victims) === n)
      // audit sees the shrunken live set (assign=2 → two rows per vector)
      val live = AnnIndex.audit(cat, "del").head().getAs[Long]("n_index_rows")
      assert(live === 2L * (emb.count() - victimIds.size))
    }
  }

  test("deleting every vector leaves an empty index: audit reports a zero row, never an NPE") {
    withCat { cat =>
      AnnIndex.build(cat, "del2", emb, nlist = 8, iters = 3)
      AnnIndex.deleteVectors(cat, "del2", emb.select(col("vec_id")))
      val r = AnnIndex.audit(cat, "del2").head()
      assert(r.getAs[Long]("n_index_rows") === 0L)
      assert(r.getAs[Long]("n_cells") === 0L)
      assert(r.getAs[Double]("cell_imbalance") === 0.0)
    }
  }

  test("rebuild clears tombstones and stale generations (old-model leftovers must not leak in)") {
    withCat { cat =>
      AnnIndex.build(cat, "rb", emb.filter(col("vec_id") % 2 === 0), nlist = 8, iters = 3, assign = 2)
      AnnIndex.append(cat, "rb", emb.filter(col("vec_id") % 2 === 1))
      AnnIndex.deleteVectors(cat, "rb", emb.filter(col("vec_id") < 100).select(col("vec_id")))
      // rebuild on the FULL corpus: generations assigned with the old
      // model and tombstones for the old rows must all be gone
      val built = AnnIndex.build(cat, "rb", emb, nlist = 8, iters = 3, assign = 2)
      val r = AnnIndex.audit(cat, "rb").head()
      assert(r.getAs[Long]("n_gens") === 0L, "stale generations survived the rebuild")
      assert(r.getAs[Long]("n_index_rows") === emb.count() * 2, "tombstones survived the rebuild")
      val queries = emb.filter(col("vec_id") < 6)
      val got     = AnnIndex.search(cat, "rb", queries, k = 5, nprobe = 4)
      val want = Similarity.ivfSearch(
        Similarity.ivfAssign(emb, built, assign = 2), queries, built, k = 5, nprobe = 4)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("searchFiltered: k best AMONG the allowlist, not a post-filter of the unfiltered top-k") {
    withCat { cat =>
      AnnIndex.build(cat, "flt", emb, nlist = 8, iters = 3, assign = 2)
      val queries = emb.filter(col("vec_id") < 4)
      val allowed = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      val got = AnnIndex.searchFiltered(cat, "flt", queries, k = 5, nprobe = 4, Some(allowed))
      // every neighbor satisfies the predicate
      val bad = got.filter(col("neighbor_id") % 3 =!= 0).count()
      assert(bad === 0L, "filtered search served a neighbor outside the allowlist")
      // and it's NOT a post-filter: ranking among allowed rows only — the
      // reference is the in-memory search over the pre-filtered index
      val built = AnnIndex.loadCentroids(cat, "flt")
      val want = Similarity.ivfSearch(
        Similarity.ivfAssign(emb, built, assign = 2)
          .filter(col("neighbor_id") % 3 === 0),
        queries, built, k = 5, nprobe = 4)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "filtered search diverged from ranking over the pre-filtered candidates")
      // unfiltered search still works through the same entry
      assert(AnnIndex.search(cat, "flt", queries, k = 5, nprobe = 4).count() > 0)
    }
  }

  test("concurrent appends serialize: distinct generations, no lost vectors") {
    withCat { cat =>
      AnnIndex.build(cat, "cc", emb.filter(col("vec_id") % 4 === 0), nlist = 8, iters = 3)
      val slices = (1 to 3).map(i => emb.filter(col("vec_id") % 4 === i))
      val pool   = java.util.concurrent.Executors.newFixedThreadPool(3)
      try {
        val futures = slices.map(s =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call(): Int = AnnIndex.append(cat, "cc", s)
          }))
        val gens = futures.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
        assert(gens.toSet === Set(0, 1, 2), s"generation numbers must be distinct+dense, got $gens")
      } finally pool.shutdown()
      val r = AnnIndex.audit(cat, "cc").head()
      assert(r.getAs[Long]("n_gens") === 3L)
      assert(r.getAs[Long]("n_index_rows") === emb.count(), "a concurrent append overwrote another's generation")
    }
  }

  test("compactGenerations folds appends into the base with bit-identical search; tombstones survive") {
    withCat { cat =>
      AnnIndex.build(cat, "gc", emb.filter(col("vec_id") % 2 === 0), nlist = 8, iters = 3, assign = 2)
      AnnIndex.append(cat, "gc", emb.filter(col("vec_id") % 4 === 1))
      AnnIndex.append(cat, "gc", emb.filter(col("vec_id") % 4 === 3))
      AnnIndex.deleteVectors(cat, "gc", emb.filter(col("vec_id") % 5 === 0).select(col("vec_id")))
      val queries = emb.filter(col("vec_id") < 6)
      val before  = AnnIndex.search(cat, "gc", queries, k = 5, nprobe = 4).collect().toSet
      assert(AnnIndex.compactGenerations(cat, "gc") === 2)
      // generations gone, audit agrees, index row count preserved
      assert(cat.lsPrefix("gc.__anngen").isEmpty, "generation tables must be dropped")
      val a = AnnIndex.audit(cat, "gc").head()
      assert(a.getAs[Long]("n_gens") === 0L)
      // search results are bit-identical — compaction is pure file motion
      val after = AnnIndex.search(cat, "gc", queries, k = 5, nprobe = 4).collect().toSet
      assert(after === before, "generation compaction changed search results")
      // tombstones survive the fold: deleted ids still never served
      assert(!after.exists(_.getLong(1) % 5 == 0), "a tombstoned vector reappeared after compaction")
      // idempotent second call: nothing to fold
      assert(AnnIndex.compactGenerations(cat, "gc") === 0)
      // CRASH WINDOW replay: the folded base coexisting with a stale
      // generation (cleanup died) must serve the same results — the
      // scorer collapses duplicate index rows
      val stale = Similarity.ivfAssign(
        emb.filter(col("vec_id") % 4 === 1), AnnIndex.loadCentroids(cat, "gc"), assign = 2)
      cat.putPartitionedTable("gc.__anngen0007__", stale, "cell")
      val window = AnnIndex.search(cat, "gc", queries, k = 5, nprobe = 4).collect().toSet
      assert(window === before, "duplicate rows in the crash window changed search results")
    }
  }
}
