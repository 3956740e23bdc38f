package graft

import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Manifest-based mutations: O(delta) append, zone-map-targeted delete,
  * refcounted vacuum — plus the safety properties that make them trustable:
  * GC never eats a file a retained manifest references, NULL rows survive
  * deletes, time travel still works across mutations, schema drift on
  * append fails loudly.
  */
class MutationSpec extends SparkSpec {
  import spark.implicits._

  private def withCat[A](f: Catalog => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-mut-spec").toString
    f(new Catalog(spark, root))
  }

  private def kv(range: Range, tag: String) =
    range.map(i => (i.toLong, tag)).toDF("k", "tag")

  test("append equals put-of-union; the base files are reused, not rewritten") {
    withCat { cat =>
      cat.putTable("t", kv(1 to 100, "base").repartition(3, col("k")))
      val baseFiles = cat.readTable("t").inputFiles.toSet
      cat.appendTable("t", kv(101 to 150, "delta"))
      val after = cat.readTable("t")
      assert(after.count() === 150)
      assert(after.filter(col("tag") === "base").count() === 100)
      // O(delta): every base file is still referenced verbatim
      assert(baseFiles.subsetOf(after.inputFiles.toSet), "append must reference the old files, not rewrite them")
    }
  }

  test("append to a missing table creates it; chained appends survive version GC") {
    withCat { cat =>
      cat.appendTable("t2", kv(1 to 10, "a"))
      cat.appendTable("t2", kv(11 to 20, "b"))
      cat.appendTable("t2", kv(21 to 30, "c"))
      cat.appendTable("t2", kv(31 to 40, "d"))
      assert(cat.readTable("t2").count() === 40)
      assert(
        cat.readTable("t2").agg(sum(col("k"))).head().getLong(0) === (1L to 40L).sum)
    }
  }

  test("append after a plain putTable keeps the materialized dir alive through GC") {
    withCat { cat =>
      cat.putTable("t3", kv(1 to 50, "base"))
      cat.appendTable("t3", kv(51 to 60, "d1"))
      cat.appendTable("t3", kv(61 to 70, "d2"))
      cat.appendTable("t3", kv(71 to 80, "d3")) // GC has run 3x over the plain v1 by now
      assert(cat.readTable("t3").count() === 80)
    }
  }

  test("append schema mismatch fails loudly") {
    withCat { cat =>
      cat.putTable("t4", kv(1 to 5, "x"))
      val e = intercept[IllegalArgumentException](
        cat.appendTable("t4", Seq((1L, 2L)).toDF("k", "tag")))
      assert(e.getMessage.contains("schema mismatch"))
    }
  }

  test("deleteWhere removes exactly the matching rows; NULL column rows survive") {
    withCat { cat =>
      val rows = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None), (4L, Some(5L)))
        .map { case (k, v) => (k, v.map(Long.box).orNull) }
      cat.putTable("t5", spark.createDataFrame(rows).toDF("k", "v"))
      val rep = cat.deleteWhere("t5", "v", "<=", "10")
      assert(rep.head().getAs[Long]("n_rows_deleted") === 2L)
      val left = cat.readTable("t5").select(col("k")).as[Long].collect().sorted
      assert(left.toSeq === Seq(2L, 3L), "NULL-v row must survive the delete")
    }
  }

  test("zone-map-targeted delete rewrites only the files that can match") {
    withCat { cat =>
      cat.putTable("t6", kv(1 to 1000, "x").repartitionByRange(5, col("k")))
      cat.analyzeTable("t6", fileStats = true)
      val before = cat.readTable("t6").inputFiles.toSet
      val rep    = cat.deleteWhere("t6", "k", "<=", "100").head()
      assert(rep.getAs[Long]("n_rows_deleted") === 100L)
      assert(
        rep.getAs[Long]("n_files_rewritten") < rep.getAs[Long]("n_files_live"),
        "range layout must leave most files provably unaffected")
      val after = cat.readTable("t6")
      assert(after.count() === 900)
      // the unaffected files are re-referenced verbatim
      assert(after.inputFiles.toSet.intersect(before).nonEmpty)
    }
  }

  test("delete matching nothing publishes no new version") {
    withCat { cat =>
      cat.putTable("t7", kv(1 to 10, "x"))
      val vBefore = cat.versions("t7").head
      val rep     = cat.deleteWhere("t7", "k", ">", "9999")
      assert(rep.head().getAs[Long]("n_rows_deleted") === 0L)
      assert(cat.versions("t7").head === vBefore, "no-op delete must not churn versions")
    }
  }

  test("delete ALL rows leaves a readable empty table with its schema") {
    withCat { cat =>
      cat.putTable("t8", kv(1 to 10, "x"))
      cat.deleteWhere("t8", "k", ">=", "0")
      val left = cat.readTable("t8")
      assert(left.count() === 0)
      assert(left.schema.fieldNames.toSeq === Seq("k", "tag"))
    }
  }

  test("time travel: the pre-delete version still reads the deleted rows") {
    withCat { cat =>
      cat.putTable("t9", kv(1 to 100, "x"))
      cat.appendTable("t9", kv(101 to 200, "y"))
      val vAppend = cat.versions("t9").head
      cat.deleteWhere("t9", "k", "<=", "50")
      assert(cat.readTable("t9").count() === 150)
      assert(cat.readTableVersion("t9", vAppend).count() === 200)
    }
  }

  test("vacuum reclaims unreferenced blobs and never a referenced one") {
    withCat { cat =>
      cat.putTable("t10", kv(1 to 200, "x").repartition(2, col("k")))
      cat.appendTable("t10", kv(201 to 400, "y"))
      // rewrite everything: no stats -> all files are candidates
      cat.deleteWhere("t10", "k", "<=", "300")
      // retire the version that still references the append generation
      cat.deleteWhere("t10", "k", "<=", "350")
      val n = cat.vacuum("t10")
      assert(n > 0, "the superseded rewrite generations must be reclaimable")
      val left = cat.readTable("t10")
      assert(left.count() === 50)
      assert(left.agg(min(col("k"))).head().getLong(0) === 351L)
    }
  }

  test("compactSmallFiles packs only the small files; large files are re-referenced verbatim") {
    withCat { cat =>
      // one large generation + several tiny ones (the streaming-append shape)
      cat.putTable("c1", kv(1 to 20000, "base").coalesce(1))
      (1 to 4).foreach(i =>
        cat.appendTable("c1", kv((20000 + i * 10 - 9) to (20000 + i * 10), s"g$i").coalesce(1)))
      val files = cat.readTable("c1").inputFiles
      val bigFile = files.maxBy(f => new java.io.File(new java.net.URI(f).getPath).length())
      val bigLen  = new java.io.File(new java.net.URI(bigFile).getPath).length()
      val rep = cat.compactSmallFiles("c1", smallBytes = bigLen, targetBytes = 1L << 30).head()
      assert(rep.getAs[Long]("n_files_packed") === 4L)
      assert(rep.getAs[Long]("n_files_written") >= 1L)
      val after = cat.readTable("c1")
      assert(after.count() === 20040)
      assert(after.inputFiles.contains(bigFile), "the large file must be re-referenced, not rewritten")
      // O(delta) stats compose: only the packed outputs are unseen
      cat.analyzeTable("c1", fileStats = true)
      cat.appendTable("c1", kv(30001 to 30010, "tail").coalesce(1))
      val rep2 = cat.analyzeAppended("c1").head()
      assert(rep2.getAs[Long]("n_files_scanned") === 1L)
    }
  }

  test("compactSmallFiles is a no-op below two small files") {
    withCat { cat =>
      cat.putTable("c2", kv(1 to 100, "x").coalesce(1))
      val v   = cat.versions("c2").head
      val rep = cat.compactSmallFiles("c2").head()
      assert(rep.getAs[Long]("n_files_packed") === 0L)
      assert(cat.versions("c2").head === v, "no-op compaction must not churn versions")
    }
  }

  test("appendTableExactlyOnce: a replayed batch id is skipped, a fresh one lands") {
    withCat { cat =>
      assert(cat.appendTableExactlyOnce("s1", kv(1 to 10, "b0"), 0L))
      assert(cat.appendTableExactlyOnce("s1", kv(11 to 20, "b1"), 1L))
      // failure replay: same id, same (or differently computed) batch
      assert(!cat.appendTableExactlyOnce("s1", kv(11 to 20, "b1"), 1L), "replayed id must be skipped")
      assert(cat.readTable("s1").count() === 20)
      assert(cat.appendTableExactlyOnce("s1", kv(21 to 30, "b2"), 2L))
      assert(cat.readTable("s1").count() === 30)
    }
  }

  test("appended data is immediately visible to grep and stats reads (manifest read path)") {
    withCat { cat =>
      cat.putTable("t11", Seq((1L, "alpha words")).toDF("doc_id", "text"))
      cat.appendTable("t11", Seq((2L, "zebrafish text")).toDF("doc_id", "text"))
      // stale grep index must not hide the appended file
      cat.analyzeGrepIndex("t11", "text")
      cat.appendTable("t11", Seq((3L, "another zebrafish")).toDF("doc_id", "text"))
      val got = cat.grepPruned("t11", "text", "zebrafish", Seq("zebrafish"))
      assert(got.count() === 2, "stale index after append must degrade to the full scan")
    }
  }
}
