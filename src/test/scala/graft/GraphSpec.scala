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

  /** Driver-side synchronous LPA reference with identical semantics. */
  private def lpaReference(edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val sym   = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val nbrs  = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = nbrs.keys.map(v => v -> v).toMap
    (1 to iterations).foreach { _ =>
      labels = nbrs.map { case (v, ns) =>
        val hist = ns.map(labels).groupBy(identity).view.mapValues(_.size).toMap
        v -> hist.toSeq.minBy { case (l, n) => (-n, l) }._1
      }
    }
    labels
  }

  test("commonNeighborPairs: hand-checked counts; hub over the cap contributes nothing") {
    import spark.implicits._
    // suppliers 1,2,3 over customers 10,20,30; customer 99 is a hub all
    // three touch
    val edges = Seq(
      (1L, 10L), (1L, 20L), (1L, 99L),
      (2L, 10L), (2L, 20L), (2L, 30L), (2L, 99L),
      (3L, 30L), (3L, 99L),
      (2L, 10L) // duplicate edge must not double-count
    ).toDF("supp", "cust")
    def pairsWithCap(cap: Int) = Graph
      .commonNeighborPairs(edges, "supp", "cust", maxDegree = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // cap 2: customer 99 (degree 3) is dropped; shared counts from 10,20,30
    assert(pairsWithCap(2) == Map((1L, 2L) -> 2L, (2L, 3L) -> 1L))
    // cap 3: the hub participates and every pair gains one
    assert(pairsWithCap(3) == Map((1L, 2L) -> 3L, (2L, 3L) -> 2L, (1L, 3L) -> 1L))
  }

  test("labelPropagation: bridge between two triangles splits into two communities") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "t")
    val out = Graph.labelPropagation(g, "s", "t", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1, s"triangle A must share a label: $out")
    assert(Set(out(4L), out(5L), out(6L)).size == 1, s"triangle B must share a label: $out")
    assert(out(1L) != out(4L), s"the bridge must not merge the communities: $out")
  }

  test("louvain: recovers planted communities, modularity >= LPA on the fixture graphs") {
    import spark.implicits._
    def q(edges: org.apache.spark.sql.DataFrame, labels: org.apache.spark.sql.DataFrame): Double =
      Graph.modularity(edges, "s", "t", labels.withColumnRenamed("community", "label"), "id", "label")
        .collect().head.getDouble(4)
    def qLpa(edges: org.apache.spark.sql.DataFrame): Double =
      q(edges, Graph.labelPropagation(edges, "s", "t", iterations = 4)
        .withColumnRenamed("label", "community"))

    // two triangles + a bridge: Louvain must keep the triangles separate
    val bridge = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "t")
    val outB = Graph.louvain(bridge, "s", "t", rounds = 4)
    val mB = outB.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(mB(1L), mB(2L), mB(3L)).size == 1, mB.toString)
    assert(Set(mB(4L), mB(5L), mB(6L)).size == 1, mB.toString)
    assert(mB(1L) != mB(4L), s"bridge must not merge the triangles: $mB")
    assert(q(bridge, outB) >= qLpa(bridge), "louvain must not score below LPA on the bridge graph")

    // random graphs: gain-driven beats (or ties) the frequency vote, and
    // every node gets exactly one community
    (0 until 3).foreach { trial =>
      val rnd = new scala.util.Random(9100 + trial)
      val edges = Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2).distinct.toDF("s", "t")
      val lv = Graph.louvain(edges, "s", "t", rounds = 4)
      val nodes = edges.select(col("s")).union(edges.select(col("t"))).distinct().count()
      assert(lv.count() == nodes && lv.select(col("id")).distinct().count() == nodes)
      val (ql, qp) = (q(edges, lv), qLpa(edges))
      assert(ql >= qp, s"trial $trial: louvain Q=$ql below LPA Q=$qp")
      // determinism: a second run is bit-identical
      val again = Graph.louvain(edges, "s", "t", rounds = 4)
      assert(again.collect().map(_.toString).sorted.toSeq ==
        lv.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("louvainTwoLevel: condensed second sweep never lowers modularity; weighted sweep handles self-loops") {
    import spark.implicits._
    def q(edges: org.apache.spark.sql.DataFrame, labels: org.apache.spark.sql.DataFrame): Double =
      Graph.modularity(edges, "s", "t", labels.withColumnRenamed("community", "label"), "id", "label")
        .collect().head.getDouble(4)

    // a ring of 4 triangle-pairs: level 1 finds the triangles, level 2 can
    // merge adjacent ones where that pays; Q must never go down
    val rnd = new scala.util.Random(77)
    val cliques = (0 until 4).flatMap { c =>
      val base = c * 10L
      Seq((base, base + 1), (base + 1, base + 2), (base, base + 2),
        (base + 3, base + 4), (base + 4, base + 5), (base + 3, base + 5),
        (base + 2, base + 3)) // intra-pair bridge
    } ++ (0 until 4).map(c => (c * 10L + 5, ((c + 1) % 4) * 10L)) // ring bridges
    val edges = cliques.toDF("s", "t")
    val l1 = Graph.louvain(edges, "s", "t", rounds = 4)
    val l2 = Graph.louvainTwoLevel(edges, "s", "t", rounds1 = 4, rounds2 = 4)
    val (q1, q2) = (q(edges, l1), q(edges, l2))
    assert(q2 >= q1, s"two-level Q=$q2 below one-level Q=$q1")
    // composition: every node labeled exactly once, labels from the node space
    val n = edges.select(col("s")).union(edges.select(col("t"))).distinct().count()
    assert(l2.count() == n && l2.select("id").distinct().count() == n)

    // random graphs: Q(two-level) >= Q(one-level), runs deterministic
    (0 until 2).foreach { trial =>
      val rg = Seq.fill(90)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2).distinct.toDF("s", "t")
      val a = Graph.louvainTwoLevel(rg, "s", "t")
      val b = Graph.louvainTwoLevel(rg, "s", "t")
      assert(a.collect().map(_.toString).sorted.toSeq == b.collect().map(_.toString).sorted.toSeq)
      assert(q(rg, a) >= q(rg, Graph.louvain(rg, "s", "t")), s"trial $trial")
    }

    // louvainWeighted self-loop handling: two supernodes with heavy
    // self-loops and one weak link must NOT merge (gain is negative);
    // hand check: m=21, k_1 = 2*10+1 = 21, k_2 = 21; moving 1 into {2}:
    // score = 2*21*1 - 21*21 < 0 vs stay 2*21*0 - 21*(21-21) = 0 -> stay
    val wEdges = Seq((1L, 1L, 10L), (2L, 2L, 10L), (1L, 2L, 1L)).toDF("a", "b", "w")
    val lw = Graph.louvainWeighted(wEdges, "a", "b", "w", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lw == Map(1L -> 1L, 2L -> 2L), lw.toString)
    // flip the balance: weak self-loops, heavy link -> they merge
    val wEdges2 = Seq((1L, 1L, 1L), (2L, 2L, 1L), (1L, 2L, 10L)).toDF("a", "b", "w")
    val lw2 = Graph.louvainWeighted(wEdges2, "a", "b", "w", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lw2(1L) == lw2(2L), lw2.toString)
  }

  test("louvainMultilevel: Q >= two-level, early-exits to a fixpoint, deterministic") {
    import spark.implicits._
    def q(edges: org.apache.spark.sql.DataFrame, labels: org.apache.spark.sql.DataFrame): Double =
      Graph.modularity(edges, "s", "t", labels.withColumnRenamed("community", "label"), "id", "label")
        .collect().head.getDouble(4)

    // the triangle-pair ring again: multilevel must do at least as well as
    // the hard-capped two-level recipe, and label every node exactly once
    val cliques = (0 until 4).flatMap { c =>
      val base = c * 10L
      Seq((base, base + 1), (base + 1, base + 2), (base, base + 2),
        (base + 3, base + 4), (base + 4, base + 5), (base + 3, base + 5),
        (base + 2, base + 3))
    } ++ (0 until 4).map(c => (c * 10L + 5, ((c + 1) % 4) * 10L))
    val edges = cliques.toDF("s", "t")
    val l2 = Graph.louvainTwoLevel(edges, "s", "t", rounds1 = 4, rounds2 = 4)
    val lm = Graph.louvainMultilevel(edges, "s", "t", roundsPerLevel = 4, maxLevels = 4)
    val (q2, qm) = (q(edges, l2), q(edges, lm))
    assert(qm >= q2, s"multilevel Q=$qm below two-level Q=$q2")
    val n = edges.select(col("s")).union(edges.select(col("t"))).distinct().count()
    assert(lm.count() == n && lm.select("id").distinct().count() == n)

    // maxLevels = 1 degenerates to the single sweep exactly
    val l1  = Graph.louvain(edges, "s", "t", rounds = 4)
    val lm1 = Graph.louvainMultilevel(edges, "s", "t", roundsPerLevel = 4, maxLevels = 1)
    assert(lm1.collect().map(_.toString).sorted.toSeq ==
      l1.collect().map(_.toString).sorted.toSeq)

    // a generous level budget must not change the answer once the identity
    // fixpoint certificate fires (post-convergence levels are no-ops), and
    // reruns are bit-identical
    val rnd = new scala.util.Random(4242)
    (0 until 2).foreach { trial =>
      val rg = Seq.fill(90)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2).distinct.toDF("s", "t")
      val a = Graph.louvainMultilevel(rg, "s", "t", roundsPerLevel = 4, maxLevels = 4)
      val b = Graph.louvainMultilevel(rg, "s", "t", roundsPerLevel = 4, maxLevels = 8)
      assert(a.collect().map(_.toString).sorted.toSeq ==
        b.collect().map(_.toString).sorted.toSeq,
        s"trial $trial: maxLevels 4 vs 8 diverged after the fixpoint certificate")
      assert(q(rg, a) >= q(rg, Graph.louvainTwoLevel(rg, "s", "t")), s"trial $trial")
    }
  }

  test("labelPropagation equals the driver synchronous-LPA reference on random graphs") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd = new scala.util.Random(7000 + trial)
      val edges = Seq.fill(60)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)).filter(e => e._1 != e._2).distinct
      val got = Graph.labelPropagation(edges.toDF("s", "t"), "s", "t", iterations = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = lpaReference(edges, iterations = 4)
      assert(got == ref, s"trial $trial")
    }
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

  test("triangleStats: hand-checked planted graph, hub-safe orientation ≡ brute 3-way join") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, every node in 3) + pendant 5 + isolated edge 6-7
    val k4 = for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((4L, 5L), (6L, 7L))).toDF("pa", "pb")
    val got = graft.operators.Graph.triangleStats(edges, "pa", "pb")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)) && got(2L) == ((3L, 3L, 1.0)) && got(3L) == ((3L, 3L, 1.0)))
    assert(got(4L) == ((4L, 3L, 0.5)), s"hub 4: ${got(4L)}") // 3 of C(4,2)=6 wedges closed
    assert(got(5L) == ((1L, 0L, 0.0)) && got(6L) == ((1L, 0L, 0.0)) && got(7L) == ((1L, 0L, 0.0)))
    // random-ish graph: degree-ordered plan ≡ brute canonical 3-way join
    val rnd = (0 until 400).map { i =>
      val a = (i * 37 + i * i * 11) % 60; val b = (i * 53 + 7) % 60
      (a.toLong, b.toLong)
    }.filter(p => p._1 != p._2).toDF("pa", "pb")
    val fast = graft.operators.Graph.triangleStats(rnd, "pa", "pb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = rnd.select(least($"pa", $"pb").as("a"), greatest($"pa", $"pb").as("b")).distinct()
    val brute = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
      .select(explode(array(col("e1.a"), col("e1.b"), col("e2.b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast.foreach { case (id, _, t) => assert(t == brute.getOrElse(id, 0L), s"node $id: $t vs ${brute.get(id)}") }
    assert(fast.map(_._3).sum == brute.values.sum)
  }

  test("weightedPageRank: uniform weights reduce to pageRank; heavy edge pulls rank") {
    val uw = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("s", "t", "w")
    val wpr = Graph.weightedPageRank(uw, "s", "t", "w", iterations = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pr = Graph.pageRank(uw.select("s", "t"), "s", "t", iterations = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // with all weights equal the share w/Σw equals 1/outdeg — same fixpoint
    wpr.foreach { case (id, r) => assert(math.abs(r - pr(id)) < 1e-12, s"node $id: $r vs ${pr(id)}") }
    // node 0 splits 9:1 between 10 and 11 — rank follows the weight
    val skew = Seq((0L, 10L, 9L), (0L, 11L, 1L), (10L, 0L, 1L), (11L, 0L, 1L)).toDF("s", "t", "w")
    val sk = Graph.weightedPageRank(skew, "s", "t", "w", iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sk(10L) > 3 * sk(11L), s"heavy edge must dominate: $sk")
    assert(math.abs(sk.values.sum - 1.0) < 1e-9)
    // non-positive weights are dropped (loud empty-graph rejection if all are)
    intercept[IllegalArgumentException](
      Graph.weightedPageRank(Seq((1L, 2L, 0L)).toDF("s", "t", "w"), "s", "t", "w"))
    // fractional weights raise loudly instead of truncating (1.9 is not 1)
    val frac = Seq((1L, 2L, 1.9), (2L, 1L, 1.0)).toDF("s", "t", "w")
    val err = intercept[Exception](Graph.weightedPageRank(frac, "s", "t", "w", iterations = 2).collect())
    assert(err.getMessage != null, "fractional weight must fail the job")
    // decimal inputs that ARE integral pass through exactly (cents-scaled money)
    val cents = Seq((1L, 2L, BigDecimal("40.00")), (2L, 1L, BigDecimal("1.00"))).toDF("s", "t", "w")
    val cr = Graph.weightedPageRank(cents, "s", "t", "w", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(cr.values.sum - 1.0) < 1e-9)
  }

  test("degreeAssortativity: star is -1, regular graph is NULL, closed forms") {
    // star K1,4: every edge pairs degree 4 with degree 1 — perfectly
    // disassortative, r = -1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val s = Graph.degreeAssortativity(star, "a", "b").head()
    assert(s.getLong(0) == 5L && s.getLong(1) == 4L && s.getDouble(2) == -1.0, s.toString)
    // 4-cycle: all degrees equal → zero variance → NULL, never NaN
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val c = Graph.degreeAssortativity(cyc, "a", "b").head()
    assert(c.isNullAt(2), c.toString)
    // two disjoint stars: still -1 (mixing is per-edge, components don't mix)
    val two = star.union(Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L)).toDF("a", "b"))
    assert(Graph.degreeAssortativity(two, "a", "b").head().getDouble(2) == -1.0)
    // duplicate/reversed rows canonicalize
    val dup = Graph.degreeAssortativity(star.union(star.select(col("b"), col("a"))), "a", "b").head()
    assert(dup.getDouble(2) == -1.0 && dup.getLong(1) == 4L)
  }

  test("adamicAdar: closed-form weights, hub cap, minShared floor") {
    // lefts {1,2} share rights {10, 11} (deg 2 each); right 12 is 1's alone.
    // AA(1,2) = 2 * round(1/ln 2, 12) = 2.885390081778 -> round 6
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L), (1L, 12L)).toDF("l", "r")
    val got = Graph.adamicAdar(edges, "l", "r", maxDegree = 50, minShared = 2L)
      .select(col("a"), col("b"), col("shared"), round(col("aa_exact"), 6).cast("double").as("aa"))
      .collect()
    assert(got.length == 1)
    val r0 = got.head
    assert(r0.getLong(0) == 1L && r0.getLong(1) == 2L && r0.getLong(2) == 2L)
    assert(r0.getDouble(3) == 2.88539, r0.toString)
    // a popular right node (3 lefts) above maxDegree=2 is dropped BEFORE
    // pairing: with 99 gone, (1,2) keeps its two witnesses, (1,3)/(2,3)
    // fall under minShared and vanish
    val withHub = edges.union(Seq((1L, 99L), (2L, 99L), (3L, 99L)).toDF("l", "r"))
    val capped = Graph.adamicAdar(withHub, "l", "r", maxDegree = 2, minShared = 2L).collect()
    assert(capped.length == 1 && capped.head.getLong(2) == 2L)
    // uncapped, 99 contributes 1/ln 3 to (1,2) and makes three pairs, but
    // only (1,2) reaches minShared = 2
    val open = Graph.adamicAdar(withHub, "l", "r", maxDegree = 50, minShared = 2L)
      .select(col("a"), col("b"), round(col("aa_exact"), 6).cast("double").as("aa"))
      .collect()
    assert(open.length == 1)
    // round(1/ln 2, 12) = 1.442695040889; round(1/ln 3, 12) = 0.910239226627
    val expected = BigDecimal("1.442695040889") * 2 + BigDecimal("0.910239226627")
    assert(open.head.getDouble(2) == expected.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      open.head.toString)
  }

  test("betweennessSampled: path and star closed forms, truncation horizon") {
    // path 1-2-3-4-5, all 5 sources, full depth: Brandes raw dependency
    // sums are bc(2)=6, bc(3)=8, bc(4)=6; endpoints carry none
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.betweennessSampled(path, "a", "b", nSources = 5, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(2L -> 6.0, 3L -> 8.0, 4L -> 6.0), s"got $got")
    // 1-hop horizon: no path has an intermediate node — empty
    assert(Graph.betweennessSampled(path, "a", "b", nSources = 5, maxDepth = 1).collect().isEmpty)
    // star K1,4: every leaf-to-leaf shortest path brokers through the hub
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val s = Graph.betweennessSampled(star, "a", "b", nSources = 5, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s == Map(0L -> 12.0), s"got $s")
    // σ counts: 4-cycle 1-2-4-3-1 — two equal-length paths split the
    // dependency: δ_1(2) = δ_1(3) = 0.5. Each node brokers exactly its
    // opposite pair, 0.5 per direction -> 1.0 everywhere
    val cyc = Seq((1L, 2L), (2L, 4L), (3L, 4L), (1L, 3L)).toDF("a", "b")
    val c = Graph.betweennessSampled(cyc, "a", "b", nSources = 4, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(c == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 1.0), s"got $c")
  }

  test("kTruss: pendant peels, triangle survives k=3, clique survives k=4, k=5 empties") {
    // K4 on {1..4} + pendant (4,5) + separate triangle {5,6,7}
    val k4  = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val tri = Seq((5L, 6L), (6L, 7L), (5L, 7L))
    val edges = (k4 ++ Seq((4L, 5L)) ++ tri).toDF("a", "b")
    val t3 = Graph.kTruss(edges, "a", "b", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // pendant gone; K4 edges carry support 2, triangle edges support 1
    assert(!t3.contains((4L, 5L)) && t3.size == 9, t3.toString)
    assert(k4.forall(e => t3(e) == 2L) && tri.forall(e => t3(e) == 1L), t3.toString)
    val t4 = Graph.kTruss(edges, "a", "b", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t4 == k4.toSet, t4.toString)
    assert(Graph.kTruss(edges, "a", "b", k = 5).collect().isEmpty)
    // reversed/duplicate rows canonicalize
    val dup = Graph.kTruss(edges.union(edges.select(col("b"), col("a"))), "a", "b", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dup == k4.toSet)
  }

  test("harmonicSampled: path closed form, horizon truncation, degree at depth 1") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.harmonicSampled(path, "a", "b", nSources = 5, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // h(1) = 1 + 1/2 + 1/3 + 1/4 (grid-snapped) = 2.083333; h(3) = 3.0
    assert(got(1L) == 2.083333 && got(5L) == 2.083333, s"got $got")
    assert(got(2L) == 2.833333 && got(4L) == 2.833333)
    assert(got(3L) == 3.0)
    // depth 1: each node collects 1.0 per adjacent pivot = its degree
    val d1 = Graph.harmonicSampled(path, "a", "b", nSources = 5, maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d1 == Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 2.0, 5L -> 1.0), s"got $d1")
  }

  test("eccentricitySampled: path closed form, horizon clipping, ball sizes") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.eccentricitySampled(path, "a", "b", nSources = 5, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // ends see the whole path (ecc 4); the middle sees ecc 2
    assert(got == Map(
      1L -> ((4, 4L)), 2L -> ((3, 4L)), 3L -> ((2, 4L)), 4L -> ((3, 4L)), 5L -> ((4, 4L))),
      s"got $got")
    // a 2-hop horizon clips the ends' eccentricity and their ball
    val clipped = Graph.eccentricitySampled(path, "a", "b", nSources = 5, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(clipped(1L) == ((2, 2L)) && clipped(3L) == ((2, 4L)), s"got $clipped")
  }

  test("kCore: cascading peel to the unique fixpoint, survivors keep >= k, empty when none") {
    // 5-clique (a 4-core) with a pendant chain hanging off node 0: the
    // chain peels over CASCADING rounds (8 -> exposes 7 -> exposes 6...),
    // the clique survives with within-core degree exactly 4
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain  = Seq((0L, 6L), (6L, 7L), (7L, 8L))
    val edges  = (clique ++ chain).toDF("a", "b")
    val got = Graph.kCore(edges, "a", "b", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 4L).map(_ -> 4L).toMap, s"got $got")
    // k above the densest kernel: everything peels, output empty
    assert(Graph.kCore(edges, "a", "b", k = 5).collect().isEmpty)
    // k = 1 keeps every non-isolated node at its plain degree fixpoint
    val k1 = Graph.kCore(edges, "a", "b", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k1(8L) == 1L && k1(0L) == 5L)
    // duplicate/reversed rows canonicalize first
    val dup = Graph.kCore(edges.union(edges.select(col("b"), col("a"))), "a", "b", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup == got)
    intercept[IllegalArgumentException](Graph.kCore(edges, "a", "b", k = 0))
  }

  test("personalizedPageRank equals a driver RWR reference; mass conserved; proximity ordering") {
    // chain 1→2→3→4 plus a far component 7→8; restart at {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
    val got = Graph.personalizedPageRank(
      edges.toDF("s", "t"), "s", "t", Seq(1L).toDF("id"), iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver reference with identical semantics
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val outDeg = e.groupBy(_._1).view.mapValues(_.size).toMap
    val d = 0.85
    val inS = nodes.map(v => v -> (if (v == 1L) 1.0 else 0.0)).toMap
    var ranks = nodes.map(v => v -> inS(v)).toMap
    (1 to 20).foreach { _ =>
      val dm = nodes.filterNot(outDeg.contains).map(ranks).sum
      val contrib = e.groupBy(_._2).view.mapValues(_.map { case (s, _) => ranks(s) / outDeg(s) }.sum).toMap
      ranks = nodes.map(v => v -> ((1 - d) * inS(v) + d * (contrib.getOrElse(v, 0.0) + dm * inS(v)))).toMap
    }
    nodes.foreach(v => assert(math.abs(got(v) - ranks(v)) < 1e-9, s"node $v: ${got(v)} vs ${ranks(v)}"))
    // all mass stays reachable-from-S: the far component gets exactly 0
    assert(got(7L) == 0.0 && got(8L) == 0.0)
    // proximity ordering along the chain from the restart node
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L), s"got $got")
    // mass conservation (dangling node 4 recycles to S, nothing leaks)
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass ${got.values.sum}")
  }

  test("cooccurrenceCosine: hand-checked normalization, identical-neighborhood pair hits 1") {
    // items 1,2 share BOTH customers (deg 2 each) → cos = 2/√4 = 1.0;
    // item 3 shares one customer with each (deg 1) → cos = 1/√2
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L)).toDF("item", "cust")
    val got = Graph.cooccurrenceCosine(e, "item", "cust", maxDegree = 50, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got((1L, 2L)) == ((2L, 1.0)), s"got ${got.get((1L, 2L))}")
    val inv2 = BigDecimal(1.0 / math.sqrt(2.0 * 1.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, 3L)) == ((1L, inv2)) && got((2L, 3L)) == ((1L, inv2)))
    // a hub customer above the cap contributes nothing — and its removal
    // also shrinks the degrees (cosine is over the capped graph)
    val withHub = e.union(Seq.tabulate(60)(i => (i + 100L, 10L)).toDF("item", "cust"))
    val capped = Graph.cooccurrenceCosine(withHub, "item", "cust", maxDegree = 50, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped == Map((1L, 2L) -> 1L), s"got $capped") // only cust 11 survives
  }

  test("bfsLevels: path graph levels, depth cap, isolated source, early exit") {
    // path 1-2-3-4-5 plus isolated source 99
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "t")
    val src = Seq(1L, 99L).toDF("id")
    val got = Graph.bfsLevels(e, "s", "t", src, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 99L -> 0, 2L -> 1, 3L -> 2), s"got $got")
    // full depth reaches the whole path; undirected so 1 also reaches back
    val full = Graph.bfsLevels(e, "s", "t", Seq(3L).toDF("id"), maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(full == Map(3L -> 0, 2L -> 1, 4L -> 1, 1L -> 2, 5L -> 2), s"got $full")
    // directed: no back-edges from 3
    val dir = Graph.bfsLevels(e, "s", "t", Seq(3L).toDF("id"), maxDepth = 10, undirected = false)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dir == Map(3L -> 0, 4L -> 1, 5L -> 2), s"got $dir")
  }

  test("connectedComponents equals driver union-find on random graphs incl. long paths") {
    val rnd = new scala.util.Random(7)
    // a long path (adversarial diameter for label propagation — the star
    // fix-point is O(log n) regardless) plus random clutter
    val path = (0L until 40L).sliding(2).map(s => (s(0) + 500, s(1) + 500)).toSeq
    val rand = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).filter(p => p._1 != p._2)
    val edges = (path ++ rand).toDF("s", "t")
    val got = Graph.connectedComponents(edges, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    (path ++ rand).foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val want = parent.keys.map(v => v -> find(v)).toMap
    // normalize driver labels to min-of-component
    val minOf = want.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    assert(got == want.map { case (v, r) => v -> minOf(r) }, "component labels differ from union-find")
  }

  test("hits equals the driver alternating-eigenvector reference; L2 norms are 1") {
    val edges = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 10L),
      (3L, 11L), (4L, 12L), (5L, 10L), (5L, 13L))
    val got = Graph.hits(edges.toDF("s", "t"), "s", "t", iterations = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // driver reference: same fixed op sequence modulo summation order
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    var h = nodes.map(_ -> 1.0 / nodes.size).toMap
    var a = Map.empty[Long, Double]
    (1 to 8).foreach { _ =>
      val ar = e.groupBy(_._2).view.mapValues(_.map(p => h(p._1)).sum).toMap
      val an = math.sqrt(ar.values.map(x => x * x).sum)
      a = ar.view.mapValues(_ / an).toMap
      val hr = e.groupBy(_._1).view.mapValues(_.map(p => a(p._2)).sum).toMap
      val hn = math.sqrt(hr.values.map(x => x * x).sum)
      h = hr.view.mapValues(_ / hn).toMap
    }
    got.foreach { case (id, hub, auth) =>
      assert(math.abs(hub - h.getOrElse(id, 0.0)) < 1e-6, s"hub $id: $hub vs ${h.get(id)}")
      assert(math.abs(auth - a.getOrElse(id, 0.0)) < 1e-6, s"auth $id: $auth vs ${a.get(id)}")
    }
    // normalized: both vectors are unit length (pre-rounding drift < 1e-6)
    assert(math.abs(got.map(x => x._2 * x._2).sum - 1.0) < 1e-4)
    assert(math.abs(got.map(x => x._3 * x._3).sum - 1.0) < 1e-4)
    // bipartite: pure sources have 0 authority, pure sinks 0 hub
    got.filter(_._1 <= 5).foreach { case (id, _, auth) => assert(auth == 0.0, s"source $id") }
    got.filter(_._1 >= 10).foreach { case (id, hub, _) => assert(hub == 0.0, s"sink $id") }
  }

  test("modularity: two disjoint cliques score 1/2, their random split scores lower, single community 0-ish") {
    import spark.implicits._
    // two disjoint triangles, labeled by their own component: m=6,
    // e_c = 3 each, d_c = 6 each -> Q*4m^2 = 2*(4*6*3 - 36) = 72 ->
    // Q = 72/144 = 0.5, the textbook two-clique maximum
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a", "b")
    val goodLab = (1L to 6L).map(i => (i, if (i <= 3) "x" else "y")).toDF("id", "c")
    val g = Graph.modularity(edges, "a", "b", goodLab, "id", "c").collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getDouble(4))
      == ((6L, 2L, 6L, 72L, 0.5)), g.toString)
    // a cross-cutting split scores strictly lower
    val badLab = (1L to 6L).map(i => (i, if (i % 2 == 0) "x" else "y")).toDF("id", "c")
    val b = Graph.modularity(edges, "a", "b", badLab, "id", "c").collect().head
    assert(b.getDouble(4) < 0.5, b.toString)
    // everything in one community: e_c = m, d_c = 2m -> Q = 0 exactly
    val oneLab = (1L to 6L).map(i => (i, "z")).toDF("id", "c")
    val o = Graph.modularity(edges, "a", "b", oneLab, "id", "c").collect().head
    assert(o.getLong(3) == 0L && o.getDouble(4) == 0.0, o.toString)
  }

  test("richClub: clique-plus-pendants closed form, insufficient-node rungs NULL") {
    import spark.implicits._
    // K4 on 1..4 (each degree >= 3) plus a pendant chain 4-5 (deg 5 = 1):
    // deg: 1,2,3 -> 3; 4 -> 4; 5 -> 1
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)
    ).toDF("a", "b")
    val r = Graph.richClub(edges, "a", "b", ks = Seq(0L, 2L, 3L, 10L))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(0L) == ((5L, 7L)))            // whole graph: phi = 14/20
    assert(r(2L) == ((4L, 6L)))            // the K4: phi = 1
    assert(r(3L) == ((1L, 0L)))            // only node 4 qualifies -> NULL phi
    val rows = Graph.richClub(edges, "a", "b", ks = Seq(0L, 2L, 3L, 10L)).collect()
    val phi = rows.map(x => x.getLong(0) -> x).toMap
    assert(phi(0L).getDouble(3) == 0.7 && phi(2L).getDouble(3) == 1.0)
    assert(phi(3L).isNullAt(3) && phi(10L).isNullAt(3))
  }

  test("stronglyConnectedComponents equals driver Tarjan on random digraphs; cycle+tail hand case") {
    import spark.implicits._

    def tarjan(nodes: Seq[Long], adj: Map[Long, Seq[Long]]): Map[Long, Long] = {
      var index = 0
      val idx     = scala.collection.mutable.Map[Long, Int]()
      val low     = scala.collection.mutable.Map[Long, Int]()
      val onStack = scala.collection.mutable.Set[Long]()
      val stack   = scala.collection.mutable.Stack[Long]()
      val comp    = scala.collection.mutable.Map[Long, Long]()
      def connect(v: Long): Unit = {
        idx(v) = index; low(v) = index; index += 1
        stack.push(v); onStack += v
        for (w <- adj.getOrElse(v, Nil)) {
          if (!idx.contains(w)) { connect(w); low(v) = math.min(low(v), low(w)) }
          else if (onStack(w)) low(v) = math.min(low(v), idx(w))
        }
        if (low(v) == idx(v)) {
          val members = scala.collection.mutable.Buffer[Long]()
          var w = -1L
          do { w = stack.pop(); onStack -= w; members += w } while (w != v)
          val label = members.min
          members.foreach(m => comp(m) = label)
        }
      }
      nodes.foreach(v => if (!idx.contains(v)) connect(v))
      comp.toMap
    }

    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val n = 24
      val edges = (1 to 70)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val expected = tarjan(nodes, adj)
      val got = Graph
        .stronglyConnectedComponents(edges.toDF("s", "d"), "s", "d")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == expected, s"trial $trial: got $got expected $expected")
    }

    // 2-cycle with a tail: {1,2} mutual, 3 alone downstream
    val e2 = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("s", "d")
    val m = Graph.stronglyConnectedComponents(e2, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), m.toString)
  }

  test("sccFwBw equals driver Tarjan and the closure variant on random digraphs; hand cases") {
    import spark.implicits._
    // the same Tarjan as the closure spec, re-derived here so this test is
    // self-contained against the FW–BW peeling path
    def tarjan(nodes: Seq[Long], adj: Map[Long, Seq[Long]]): Map[Long, Long] = {
      var index = 0
      val idx     = scala.collection.mutable.Map[Long, Int]()
      val low     = scala.collection.mutable.Map[Long, Int]()
      val onStack = scala.collection.mutable.Set[Long]()
      val stack   = scala.collection.mutable.Stack[Long]()
      val comp    = scala.collection.mutable.Map[Long, Long]()
      def connect(v: Long): Unit = {
        idx(v) = index; low(v) = index; index += 1
        stack.push(v); onStack += v
        for (w <- adj.getOrElse(v, Nil)) {
          if (!idx.contains(w)) { connect(w); low(v) = math.min(low(v), low(w)) }
          else if (onStack(w)) low(v) = math.min(low(v), idx(w))
        }
        if (low(v) == idx(v)) {
          val members = scala.collection.mutable.Buffer[Long]()
          var w = -1L
          do { w = stack.pop(); onStack -= w; members += w } while (w != v)
          val label = members.min
          members.foreach(m => comp(m) = label)
        }
      }
      nodes.foreach(v => if (!idx.contains(v)) connect(v))
      comp.toMap
    }
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 4) {
      // vary density across trials: sparse DAG-ish through cycle-rich
      val n = 20 + trial * 4
      val edges = (1 to (n * 2 + trial * 10))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val expected = tarjan(nodes, adj)
      val got = Graph.sccFwBw(edges.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: got $got expected $expected")
      val closure = Graph.stronglyConnectedComponents(edges.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == closure, s"trial $trial: FW–BW and closure variants diverged")
    }
    // hand cases: 2-cycle + tail; pure cycle; path (all trivial); empty
    val m = Graph.sccFwBw(Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), m.toString)
    val cyc = Graph.sccFwBw(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cyc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), cyc.toString)
    val path = Graph.sccFwBw(Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(path == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L), path.toString)
    assert(Graph.sccFwBw(Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d").count() == 0L)
    // string ids work (the transition-graph gate shape)
    val sg = Graph.sccFwBw(
      Seq(("view", "cart"), ("cart", "view"), ("cart", "purchase")).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sg == Map("view" -> "cart", "cart" -> "cart", "purchase" -> "purchase"), sg.toString)
  }

  test("sccCondense: two 2-cycles and a pendant collapse to a 3-node DAG") {
    import spark.implicits._
    // {1,2} -> {3,4} via 2->3; {1,2} -> {5} via 2->5
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (2L, 3L), (2L, 5L)).toDF("s", "d")
    val got = Graph.sccCondense(edges, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 3L) -> 1L, (1L, 5L) -> 1L), got.toString)
    // a single SCC condenses to nothing
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    assert(Graph.sccCondense(cycle, "s", "d").count() == 0L)
  }


  test("degreePowerlawFit: hand MLE on a planted degree ladder, star vs clique separation") {
    import spark.implicits._
    // degrees: hub d=4, leaves d=1 (below dmin) -> tail = {4}
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val s = Graph.degreePowerlawFit(star, "a", "b", dmin = 2L).collect().head
    assert(s.getLong(0) == 5L && s.getLong(1) == 1L && s.getLong(5) == 4L, s.toString)
    // alpha = 1 + 1/ln(4/1.5), with the grid-12 snap on the ln term
    val lnTerm = BigDecimal(math.log(4.0 / 1.5)).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expA   = BigDecimal(1.0 + 1.0 / lnTerm).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s.getDouble(3) == expA, s.toString)
    // K5: every degree 4, n_tail = 5, same per-node term -> same alpha,
    // sigma shrinks by sqrt(5)
    val k5 = (for { a <- 0 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)).toDF("a", "b")
    val k = Graph.degreePowerlawFit(k5, "a", "b", dmin = 2L).collect().head
    assert(k.getLong(1) == 5L && k.getDouble(3) == expA, k.toString)
    assert(k.getDouble(4) < s.getDouble(4), "more tail mass tightens sigma")
    // all degrees below dmin: NULL alpha, not NaN
    val pair = Seq((1L, 2L)).toDF("a", "b")
    val p = Graph.degreePowerlawFit(pair, "a", "b", dmin = 2L).collect().head
    assert(p.getLong(1) == 0L && p.isNullAt(3) && p.isNullAt(4), p.toString)
  }

}
