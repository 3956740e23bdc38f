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
}
