package graft

import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** O(delta) incremental ANALYZE: only appended files are scanned, inherited
  * zone maps stay byte-identical, the merged table stats match a full
  * re-ANALYZE everywhere the merge is exact (and say UNKNOWN where it
  * isn't), pruning works immediately after the refresh, and misuse is loud.
  */
class IncrementalAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def withCat[A](f: Catalog => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-incr-spec").toString
    f(new Catalog(spark, root))
  }

  private def kv(range: Range) = range.map(i => (i.toLong, s"v$i")).toDF("k", "v")

  test("only the appended files are scanned; zone-map prune composes immediately") {
    withCat { cat =>
      cat.putTable("t", kv(1 to 1000).repartitionByRange(5, col("k")))
      cat.analyzeTable("t", fileStats = true)
      cat.appendTable("t", kv(1001 to 1200).repartitionByRange(2, col("k")))
      val rep = cat.analyzeAppended("t").head()
      assert(rep.getAs[Long]("n_files_scanned") === 2L, "must scan exactly the delta generation")
      assert(rep.getAs[Long]("n_files_inherited") === 5L)
      assert(rep.getAs[Long]("n_files_live") === 7L)
      // prune through the refreshed stats: an appended-range predicate
      // must read at most the appended files
      val tail = cat.readTableWhere("t", "k", ">", "1100")
      assert(tail.inputFiles.length <= 2, s"prune must skip the base files, scanned ${tail.inputFiles.length}")
      assert(tail.count() === 100)
      val head = cat.readTableWhere("t", "k", "<=", "100")
      assert(head.inputFiles.length <= 1)
      assert(head.count() === 100)
    }
  }

  test("merged table stats equal a full re-ANALYZE where the merge is exact; NDV says unknown") {
    withCat { cat =>
      cat.putTable("t2", kv(1 to 500).repartitionByRange(3, col("k")))
      cat.analyzeTable("t2", fileStats = true)
      cat.appendTable("t2", kv(501 to 800).repartitionByRange(2, col("k")))
      cat.analyzeAppended("t2")
      val incr = cat.readTable("t2.__stats__").collect().map(r =>
        r.getAs[String]("column") -> r).toMap
      cat.analyzeTable("t2", fileStats = true) // full pass over the same data
      val full = cat.readTable("t2.__stats__").collect().map(r =>
        r.getAs[String]("column") -> r).toMap
      for (c <- Seq("k", "v")) {
        assert(incr(c).getAs[Long]("n_rows") === full(c).getAs[Long]("n_rows"))
        assert(incr(c).getAs[Long]("n_nulls") === full(c).getAs[Long]("n_nulls"))
        assert(incr(c).getAs[String]("min_value") === full(c).getAs[String]("min_value"))
        assert(incr(c).getAs[String]("max_value") === full(c).getAs[String]("max_value"))
        assert(incr(c).getAs[Long]("n_distinct") === -1L, "NDV does not merge — must be published unknown")
      }
    }
  }

  test("loud without a prior fileStats ANALYZE, and on schema drift") {
    withCat { cat =>
      cat.putTable("t3", kv(1 to 10))
      val e1 = intercept[IllegalArgumentException](cat.analyzeAppended("t3"))
      assert(e1.getMessage.contains("analyzeTable(fileStats = true)"))
      cat.analyzeTable("t3", fileStats = true)
      cat.putTable("t3", Seq((1L, 2L, 3L)).toDF("k", "v", "w")) // drifted re-PUT
      val e2 = intercept[IllegalArgumentException](cat.analyzeAppended("t3"))
      assert(e2.getMessage.contains("schema drift"))
    }
  }

  test("grep index refresh scans only the new files and prunes correctly") {
    withCat { cat =>
      cat.putTable("docs", (1 to 200).map(i => (i.toLong, s"plain filler row $i")).toDF("doc_id", "text")
        .repartition(2, col("doc_id")))
      cat.analyzeGrepIndex("docs", "text")
      cat.appendTable("docs", Seq((201L, "a zebrafish appears")).toDF("doc_id", "text"))
      val rep = cat.analyzeGrepIndexAppended("docs", "text").head()
      assert(rep.getAs[Long]("n_files_scanned") === 1L)
      assert(rep.getAs[Long]("n_files_inherited") === 2L)
      val hit = cat.grepPruned("docs", "text", "zebrafish", Seq("zebrafish"))
      assert(hit.inputFiles.length === 1, "refreshed index must prune down to the one new file")
      assert(hit.count() === 1)
      // and the inherited blooms still serve the old content
      val old = cat.grepPruned("docs", "text", "filler", Seq("filler"))
      assert(old.count() === 200)
    }
  }

  test("delete-all then refresh: empty table yields empty stats, refresh stays legal") {
    withCat { cat =>
      cat.putTable("t4", kv(1 to 100))
      cat.analyzeTable("t4", fileStats = true)
      cat.deleteWhere("t4", "k", ">=", "0") // everything goes
      cat.analyzeAppended("t4")             // refresh over the empty table
      assert(cat.readTable("t4.__filestats__").count() === 0)
      val rep = cat.analyzeAppended("t4").head() // and AGAIN: empty prior + empty table is legal
      assert(rep.getAs[Long]("n_files_live") === 0L)
      // but empty stats over LIVE data is a coverage hole and must refuse
      cat.appendTable("t4", kv(1 to 5))
      val e = intercept[IllegalArgumentException](cat.analyzeAppended("t4"))
      assert(e.getMessage.contains("empty but the table has data"))
    }
  }

  test("grep index refresh composes with compaction: packed files scan, content stays findable") {
    withCat { cat =>
      cat.putTable("cdocs", (1 to 100).map(i => (i.toLong, s"filler row $i")).toDF("doc_id", "text").coalesce(1))
      (1 to 3).foreach(g =>
        cat.appendTable("cdocs", Seq((100L + g, s"gen$g zebrafish")).toDF("doc_id", "text").coalesce(1)))
      cat.analyzeGrepIndex("cdocs", "text")
      val rep1 = cat.compactSmallFiles("cdocs", smallBytes = 1L << 30, targetBytes = 1L << 30).head()
      assert(rep1.getAs[Long]("n_files_packed") === 4L)
      // post-compaction: every live file is new to the index → full rescan
      // through the SAME incremental API, then pruning works again
      val rep2 = cat.analyzeGrepIndexAppended("cdocs", "text").head()
      assert(rep2.getAs[Long]("n_files_inherited") === 0L)
      val hits = cat.grepPruned("cdocs", "text", "zebrafish", Seq("zebrafish"))
      assert(hits.count() === 3)
    }
  }

  test("grep index refresh is loud without a prior index") {
    withCat { cat =>
      cat.putTable("docs2", Seq((1L, "alpha")).toDF("doc_id", "text"))
      val e = intercept[IllegalArgumentException](cat.analyzeGrepIndexAppended("docs2", "text"))
      assert(e.getMessage.contains("analyzeGrepIndex"))
    }
  }
}
