package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Similarity
import graft.sources.Tables

/** Recall grid for the ANN paths vs the exact bruteTopK oracle — the tool
  * behind the pinned bits/tables/probe/nlist/nprobe defaults. Run:
  *   runMain graft.tools.ProfileAnn /root/testdata/sf0.001 /root/testdata/sf0.01
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.001")
    val spark = Engine
      .tune(
        SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions", 8)
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    dirs.foreach { dir =>
      val emb     = Tables(spark, dir).embeddings.cache()
      val n       = emb.count()
      val queries = emb.filter(col("vec_id") < 8)
      val brute = Similarity
        .bruteTopK(emb, queries, k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      println(s"== $dir (n=$n corpus, ${brute.size} truth pairs) ==")

      for {
        bits   <- Seq(6, 8, 10, 12)
        tables <- Seq(6, 12)
        radius <- Seq(0, 1, 2)
      } {
        val t0 = System.nanoTime()
        val got = Similarity
          .lshTopK(emb, queries, k = 10, bits = bits, tables = tables, probeHamming = radius)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toSet
        val sec    = (System.nanoTime() - t0) / 1e9
        val recall = got.intersect(brute).size.toDouble / brute.size
        println(f"lsh bits=$bits%2d tables=$tables%2d radius=$radius recall=$recall%.3f t=$sec%.2fs")
      }

      for {
        nlist  <- Seq(16, 32)
        nprobe <- Seq(4, 6, 8)
        assign <- Seq(1, 2, 3)
      } {
        val t0 = System.nanoTime()
        val got = Similarity
          .ivfTopK(emb, queries, k = 10, nlist = nlist, nprobe = nprobe, assign = assign)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toSet
        val sec    = (System.nanoTime() - t0) / 1e9
        val recall = got.intersect(brute).size.toDouble / brute.size
        println(f"ivf nlist=$nlist%2d nprobe=$nprobe assign=$assign recall=$recall%.3f t=$sec%.2fs")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
