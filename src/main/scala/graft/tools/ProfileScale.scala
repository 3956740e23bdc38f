package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Dedup
import graft.sources.Tables

/** Scale probe (dev tool): multiply the documents corpus Nx (id-offset
  * copies — a dup-heavy worst case: every doc gains N exact copies) and
  * time the MinHash+LSH path. Detects superlinear blowups in the
  * candidate-pair stage before they'd surface at real scale. */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 2, 4))
    val spark = Engine
      .tune(
        SparkSession
          .builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base  = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val nBase = base.count()
    // JIT warmup
    Dedup.minhashDupPairs(base, "doc_id", "text", threshold = 0.8).count()
    spark.catalog.clearCache()

    mults.foreach { m =>
      val docs = (0 until m)
        .map(i => base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
        .reduce(_ union _)
      val t0    = System.nanoTime()
      val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text", threshold = 0.8).count()
      val secs  = (System.nanoTime() - t0) / 1e9
      println(f"[scale] x$m%-3d docs=${nBase * m}%-8d dup_pairs=$pairs%-10d ${secs}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
