package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Engine, SparkEntry}
import graft.sources.Tables

/** Scale probe (dev tool): materialize ×m id-offset, CONTENT-DECORRELATED
  * copies of the big tables as real parquet dirs, then time SparkEntry
  * queries against each multiple — the per-query scaling exponent
  * alpha = log(t_m/t_1)/log(m) is the "would the plan survive 100 TB"
  * smoke signal (alpha ≈ 1 linear, ≈ 2 quadratic blowup).
  *
  * Decorrelation matters: naive exact copies make every dedup/similarity
  * OUTPUT quadratic in m (each doc gains m−1 true near-dups), which
  * measures the workload, not the engine. Copies here are disjoint by
  * construction — ids offset by 1e9·i; document text letter-remapped per
  * copy (translate of the 9 most frequent letters, rotated by copy) so
  * token/shingle hashes decorrelate; embeddings perturbed by a
  * (vec_id, dim, copy)-keyed integer offset so cross-copy cosine is
  * noise. Graph keys offset jointly (orders+lineitem), so the graph
  * becomes m disjoint copies — node and edge counts scale ×m, iteration
  * count fixed.
  *
  * Usage: runMain graft.tools.ProfileScale [sfDir] [mults] [reps] [q,...]
  */
object ProfileScale {

  private val Letters = "etaoinshr"

  private def rotated(i: Int): String = {
    val r = i % Letters.length
    Letters.substring(r) + Letters.substring(0, r)
  }

  /** One scaled copy (index i) of the five big tables; dimension tables are
    * file-copied unscaled.
    *
    * `sharedVocab` switches the DOCUMENT decorrelation from letter
    * remapping (which MINTS a new word vocabulary per copy — the right
    * default for dedup/similarity probes, but it makes any
    * vocabulary-state stage, e.g. BPE pair counting, grow with m even
    * though a real re-crawl would share its vocabulary) to a per-copy
    * stride PERMUTATION of each doc's token order: n-gram shingles,
    * exact-substring spans and hashes decorrelate (order destroyed),
    * while every token spelling stays inside copy-0's vocabulary — the
    * probe that separates "the operator is superlinear" from "the
    * synthetic decorrelation inflated the vocabulary". */
  private def scaledCopy(t: Tables, i: Int, sharedVocab: Boolean = false): Map[String, DataFrame] = {
    val off = lit(1000000000L * i)
    val docText =
      if (i == 0) col("text") else translate(col("text"), Letters, rotated(i))
    val documents =
      if (!sharedVocab)
        t.documents.select(
          (col("doc_id") + off).as("doc_id"),
          docText.as("text"),
          col("lang"),
          col("source"),
          col("n_chars"))
      else {
        val primes = Seq(1, 3, 5, 7, 11, 13, 17, 19)
        val p      = lit(primes(i % primes.length))
        val base = t.documents.select(
          (col("doc_id") + off).as("doc_id"),
          split(col("text"), " ").as("__toks"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        val n = size(col("__toks"))
        val permuted =
          if (i == 0) col("text")
          else
            when(
              n > 1,
              array_join(
                transform(
                  sequence(lit(0), n - 1),
                  j => element_at(col("__toks"), pmod(j * p, n) + 1)),
                " ")).otherwise(col("text"))
        base.select(col("doc_id"), permuted.as("text"), col("lang"), col("source"), col("n_chars"))
      }
    Map(
      "documents" -> documents,
      "embeddings" -> t.embeddings.select(
        (col("vec_id") + off).as("vec_id"),
        (if (i == 0) col("embedding")
         else
           transform(
             col("embedding"),
             (v, d) =>
               (v + ((pmod(col("vec_id") * 31 + d * 7 + lit(i) * 13, lit(17)) - lit(8))
                 .cast("float") * lit(0.3f))).cast("float"))).as("embedding"),
        col("label")),
      "events" -> t.events.select(
        (col("event_id") + off).as("event_id"),
        col("ts"),
        (col("user_id") + off).as("user_id"),
        col("event_type"),
        col("value"),
        col("props")),
      "orders" -> t.orders.select(
        (col("o_orderkey") + off).as("o_orderkey"),
        (col("o_custkey") + off).as("o_custkey"),
        col("o_orderstatus"),
        col("o_totalprice"),
        col("o_orderdate"),
        col("o_orderpriority")),
      "lineitem" -> t.lineitem.select(
        (col("l_orderkey") + off).as("l_orderkey"),
        (col("l_partkey") + off).as("l_partkey"),
        (col("l_suppkey") + off).as("l_suppkey"),
        col("l_linenumber"),
        col("l_quantity"),
        col("l_extendedprice"),
        col("l_discount"),
        col("l_tax"),
        col("l_returnflag"),
        col("l_linestatus"),
        col("l_shipdate")))
  }

  /** Materialize the ×m dir (idempotent per JVM run: overwrites). */
  private def buildScaled(
      spark: SparkSession, srcDir: String, outDir: String, m: Int,
      sharedVocab: Boolean = false): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val t = Tables(spark, srcDir)
    val copies = (0 until m).map(i => scaledCopy(t, i, sharedVocab))
    copies.head.keys.foreach { name =>
      copies
        .map(_(name))
        .reduce(_ union _)
        .write
        .mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
    }
    for (dim <- Seq("region", "nation", "customer", "supplier", "part")) {
      Files.copy(
        Paths.get(s"$srcDir/$dim.parquet"),
        Paths.get(s"$outDir/$dim.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private val DefaultQueries = Seq(
    "graph_pagerank",
    "graph_communities",
    "graph_common_neighbors",
    "cluster_kmeans",
    "dedup_semantic",
    "dedup_embedding_cosine",
    "corpus_dsir_weights",
    "corpus_ccnet_buckets",
    "dedup_simhash",
    "quality_classifier_train")

  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 2, 4))
    val reps  = args.lift(2).map(_.toInt).getOrElse(2)
    val names = args.lift(3).map(_.split(",").toSeq).getOrElse(DefaultQueries)
    val sharedVocab = args.lift(4).contains("sharedvocab")
    val spark = Engine
      .tune(
        SparkSession
          .builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaledDirs = mults.map { m =>
      val out = if (sharedVocab) s"/tmp/graft_scale/sv_x$m" else s"/tmp/graft_scale/x$m"
      buildScaled(spark, dir, out, m, sharedVocab)
      m -> out
    }

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.foreach(_ => ()) // warmup
      val times = scaledDirs.map { case (m, sd) =>
        val best = (0 until reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, sd).queryExecution.toRdd.foreach(_ => ())
          (System.nanoTime() - t0) / 1e9
        }.min
        m -> best
      }
      val t1     = times.head._2
      val (mMax, tMax) = times.last
      val alpha = math.log(tMax / t1) / math.log(mMax.toDouble)
      val ts = times.map { case (m, s) => f"x$m=$s%.2f" }.mkString(" ")
      println(f"[scale] $name%-28s $ts alpha=$alpha%.2f")
    }
    println("[scale] done; alpha ~ log(t_max/t_1)/log(m_max); >1.3 = investigate")
    spark.stop()
  }
}
