package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Engine
import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc profiling of the dedup_clusters cost structure (not shipped API). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine
      .tune(
        SparkSession
          .builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables(spark, dir).documents
    time("scan documents")(docs.count())
    spark.catalog.clearCache()
    val rows = Dedup.shingleHashRows(docs, "doc_id", "text")
    time("shingleRows cold")(rows.count())
    spark.catalog.clearCache()
    time("jaccardPairs cold")(
      Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8).count())
    time("jaccardPairs warm-cache")(
      Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8).count())
    time("clusters warm")(
      Dedup
        .duplicateClusters(Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8))
        .count())
    spark.catalog.clearCache()
    time("clusters cold")(
      Dedup
        .duplicateClusters(Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8))
        .count())
    spark.stop()
  }
}
