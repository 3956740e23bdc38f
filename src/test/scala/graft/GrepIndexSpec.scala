package graft

import org.apache.spark.sql.functions._

import graft.sources.{Catalog, Tables}

/** Per-file token-Bloom grep index: exactness vs the full scan, REAL file
  * skipping on a planted fixture, the stale-index fallback, the loud
  * out-of-domain-token guard, and the zero-file fast path.
  */
class GrepIndexSpec extends SparkSpec {
  import spark.implicits._

  private def withCat[A](f: Catalog => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-grepidx-spec").toString
    f(new Catalog(spark, root))
  }

  test("pruned grep equals the full-scan grep on real documents") {
    withCat { cat =>
      val docs = Tables(spark, SharedSpark.sf001).documents.select(col("doc_id"), col("text"))
      cat.putTable("docs", docs.repartition(8, col("doc_id")))
      cat.analyzeGrepIndex("docs", "text")
      val got  = cat.grepPruned("docs", "text", "window agg", Seq("window", "agg"))
      val want = cat.readTable("docs").filter(col("text").rlike("window agg"))
      assert(want.count() > 0, "fixture must have matches")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("planted fixture: the index skips every file that can't match") {
    withCat { cat =>
      val rows = (1 to 400).map(i => (i.toLong, s"common filler text row $i")) :+
        (401L, "the zebrafish swims upstream")
      cat.putTable("planted", rows.toDF("doc_id", "text").repartition(4, col("doc_id")))
      cat.analyzeGrepIndex("planted", "text")
      val nFiles = cat.readTable("planted").inputFiles.length
      assert(nFiles >= 3, s"fixture needs multiple files, got $nFiles")
      val pruned = cat.grepPruned("planted", "text", "zebrafish", Seq("zebrafish"))
      assert(pruned.inputFiles.length < nFiles, "prune must skip files")
      assert(pruned.count() === 1)
      assert(pruned.head().getLong(0) === 401L)
    }
  }

  test("no matching file anywhere: zero-file scan, empty exact result") {
    withCat { cat =>
      cat.putTable("planted2", (1 to 50).map(i => (i.toLong, s"plain row $i")).toDF("doc_id", "text"))
      cat.analyzeGrepIndex("planted2", "text")
      val pruned = cat.grepPruned("planted2", "text", "quokka", Seq("quokka"))
      assert(pruned.inputFiles.isEmpty, "no file may be read when every bloom rejects")
      assert(pruned.count() === 0)
    }
  }

  test("stale index (re-PUT without re-ANALYZE) degrades to the correct full scan") {
    withCat { cat =>
      cat.putTable("docs2", Seq((1L, "alpha beta")).toDF("doc_id", "text"))
      cat.analyzeGrepIndex("docs2", "text")
      // supersede: new data CONTAINS a match the stale index has never seen
      cat.putTable("docs2", Seq((1L, "alpha beta"), (2L, "fresh zebrafish row")).toDF("doc_id", "text"))
      val got = cat.grepPruned("docs2", "text", "zebrafish", Seq("zebrafish"))
      assert(got.count() === 1, "stale index must fall back to scanning the new version, not prune it away")
    }
  }

  test("out-of-domain required token fails loudly") {
    withCat { cat =>
      cat.putTable("docs3", Seq((1L, "alpha")).toDF("doc_id", "text"))
      cat.analyzeGrepIndex("docs3", "text")
      val e = intercept[IllegalArgumentException](
        cat.grepPruned("docs3", "text", "Alpha", Seq("Alpha")))
      assert(e.getMessage.contains("tokenizer's domain"))
    }
  }
}
