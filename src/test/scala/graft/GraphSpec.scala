package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.Tables

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side power-iteration reference with identical semantics. */
  private def reference(
      edges: Seq[(Long, Long)],
      iterations: Int,
      d: Double): Map[Long, Double] = {
    val e       = edges.distinct
    val nodes   = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n       = nodes.size
    val outDeg  = e.groupBy(_._1).view.mapValues(_.size).toMap
    var ranks   = nodes.map(_ -> 1.0 / n).toMap
    (1 to iterations).foreach { _ =>
      val dangling = nodes.filterNot(outDeg.contains).map(ranks).sum
      val contrib = e
        .groupBy(_._2)
        .view
        .mapValues(_.map { case (s, _) => ranks(s) / outDeg(s) }.sum)
        .toMap
      ranks = nodes.map(v => v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    ranks
  }

  test("pageRank: cycle is uniform; star concentrates rank at the hub") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val r = Graph.pageRank(cycle, "s", "t", iterations = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, s"cycle must stay uniform, got $r"))

    // spokes → hub; hub is dangling (mass redistributed uniformly)
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)).toDF("s", "t")
    val s = Graph.pageRank(star, "s", "t", iterations = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(s(0L) > s(1L) * 3, s"hub must dominate spokes: $s")
    assert(math.abs(s.values.sum - 1.0) < 1e-9, "total rank mass conserved")
  }

  test("pageRank equals the driver power-iteration reference on the order graph") {
    val t = Tables(spark, SharedSpark.sf0001)
    val edges = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("s"), col("l_suppkey").as("t"))
      .distinct()
    val dist = Graph.pageRank(edges, "s", "t", iterations = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val ref = reference(
      edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      iterations = 10,
      d = 0.85)
    assert(dist.keySet == ref.keySet)
    dist.foreach { case (id, r) =>
      assert(math.abs(r - ref(id)) < 1e-9, s"node $id: $r vs ${ref(id)}")
    }
    assert(math.abs(dist.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: constant-depth plans across iterations (checkpoint discipline)") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val few  = Graph.pageRank(cycle, "s", "t", iterations = 2)
    val many = Graph.pageRank(cycle, "s", "t", iterations = 12)
    // eager per-iteration checkpoints: the final plan must not grow with
    // iteration count (a lazily-built lineage would be ~6x deeper)
    val depthFew  = few.queryExecution.executedPlan.toString.count(_ == '\n')
    val depthMany = many.queryExecution.executedPlan.toString.count(_ == '\n')
    assert(depthMany <= depthFew + 2, s"plan grew with iterations: $depthFew -> $depthMany")
  }
}
