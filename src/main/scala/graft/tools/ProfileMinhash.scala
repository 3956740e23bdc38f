package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.sources.Tables

/** Dev profiling harness for the MinHash pipeline stages (not part of the
  * driver contract). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine
      .tune(SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).documents

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val rows = time("shingleRows+cache") {
      val r = Dedup.shingleHashRows(docs, "doc_id", "text").cache(); r.count(); r
    }
    val sigs = time("signatures") {
      val s = Dedup.minhashSignaturesFromRows(rows, 128).cache(); s.count(); s
    }
    val cand = time("lshCandidates") {
      val c = Dedup.lshCandidates(sigs, 128, 32).cache(); c.count(); c
    }
    println(s"candidates: ${cand.count()}")
    time("verify") {
      import org.apache.spark.sql.functions._
      val sets = rows.groupBy(col("doc_id")).agg(collect_set(xxhash64(col("shingle"))).as("hs"))
      cand
        .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha")), Seq("a_id"))
        .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb")), Seq("b_id"))
        .withColumn("shared", size(array_intersect(col("ha"), col("hb"))))
        .withColumn("jacc", col("shared").cast("double") / (size(col("ha")) + size(col("hb")) - col("shared")))
        .filter(col("jacc") >= 0.8)
        .count()
    }
    time("end-to-end uncached run") {
      Dedup.minhashDupPairs(docs, "doc_id", "text", 0.8).count()
    }
    spark.stop()
  }
}
