package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables derived from relational data — the
  * companion family to [[Dedup]]'s large-star/small-star connected
  * components: where CC answers "which rows are the same entity", PageRank
  * answers "which entities matter", the standard importance prior for
  * dedup survivor selection and corpus source weighting (Page et al. 1999;
  * Common Crawl ranks hosts exactly this way to weight crawl frontiers).
  *
  * Scale design (100 TB of edges): each power iteration is ONE keyed
  * shuffle (contributions grouped by destination) plus a broadcast-sized
  * rank⋈degree join keyed on source; ranks are eagerly checkpointed every
  * `checkpointInterval` iterations (composed in between — same values,
  * fewer jobs) with the same local/reliable discipline as
  * [[Dedup.starComponents]], so the plan tree stays bounded-depth across
  * iterations instead of growing linearly. Per iteration there is exactly
  * one O(1) driver scalar (the dangling-mass sum — the same shape GraphX
  * uses); node and edge sets never collect.
  */
object Graph {

  /** PageRank by power iteration over a directed edge list.
    *
    * rank(v) = (1−d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + danglingMass/N)
    *
    * Dangling nodes (no out-edges) spread their rank uniformly — the
    * standard correction that keeps Σ rank = 1 every iteration (spec
    * asserts it). Duplicate edges are collapsed (unweighted graph);
    * self-loops count like any edge. Returns (id, rank). */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointDir: Option[String] = None,
      checkpointInterval: Int = 2): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    require(checkpointInterval >= 1, s"checkpointInterval must be >= 1, got $checkpointInterval")

    val spark = edges.sparkSession
    val st = IterState(edges, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    val e = materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val nodes0 = materialize(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    val n = nodes0.count()
    require(n > 0, "pageRank needs at least one edge")
    // the iterated state is NODE-sized, usually orders of magnitude smaller
    // than the edge set — size its partitioning to the node count (~500k
    // rows/partition) instead of inheriting the edge scan's parallelism, or
    // ten iterations of per-partition task overhead dominate small graphs
    val stateParts = math.max(
      1,
      math.min(spark.sparkContext.defaultParallelism.toLong, n / 500000L + 1L)).toInt
    val nodes  = materialize(nodes0.repartition(stateParts))
    release(nodes0)
    val outDeg = materialize(e.groupBy("src").agg(count(lit(1)).as("deg")).repartition(stateParts))
    // the DANGLING ID SET is iteration-invariant (only the rank mass over
    // it changes) — materialize it once instead of re-running a node-scale
    // anti-join against outDeg every iteration
    val dangling = materialize(
      nodes
        .join(outDeg, nodes("id") === outDeg("src"), "left_anti")
        .select(col("id").as("did"))
        .repartition(stateParts))

    var ranks   = materialize(nodes.select(col("id"), lit(1.0 / n).as("rank")))
    var lastMat = ranks
    var i = 0
    while (i < iterations) {
      // dangling mass rides the SAME job as the rank update (one-row agg
      // cross-joined into the plan) — no per-iteration driver round-trip.
      // Iterations are composed and only every `checkpointInterval`-th one
      // (plus the last) runs an action: the eager checkpoint. Composition
      // changes NO arithmetic — the un-checkpointed iteration's plan nodes
      // are identical, its shuffle is deduped plan-wide by exchange reuse
      // — it only removes job launches + state materializations, the
      // dominant per-iteration cost when the node state is small relative
      // to job overhead (and at scale, fewer bigger jobs mean fewer driver
      // round-trips). Plan depth stays bounded by the interval.
      val danglingMass = ranks
        .join(dangling, ranks("id") === col("did"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      val weights = ranks
        .join(outDeg, ranks("id") === outDeg("src"))
        .select(col("id").as("wsrc"), (col("rank") / col("deg")).as("w"))
      val contribs = e
        .join(weights, col("src") === col("wsrc"))
        .groupBy(col("dst"))
        .agg(sum(col("w")).as("c"))
      val nextPlan = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(
          col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dmass") / n)).as("rank"))
      if ((i + 1) % checkpointInterval == 0 || i == iterations - 1) {
        val next = materialize(nextPlan)
        release(lastMat)
        lastMat = next
        ranks = next
      } else ranks = nextPlan
      i += 1
    }
    // the returned ranks are checkpointed (self-contained blocks), so every
    // intermediate can be dropped now
    release(e); release(outDeg); release(nodes); release(dangling)
    ranks
  }

  /** Weighted PageRank: the [[pageRank]] power iteration over a WEIGHTED
    * edge list — each source distributes its rank proportionally to edge
    * weight (w(u→v)/Σ_x w(u→x)) instead of uniformly across out-edges,
    * the standard extension when edges carry INTEGER interaction counts
    * (a supplier a customer bought from 40 times should pull 40× the rank
    * of a one-off). Weights must be integral — a fractional weight raises
    * at execution time rather than silently truncating (scale monetary
    * amounts to integer cents first; exact long Σw keeps the w/Σw shares
    * deterministic, which a double sum cannot). Duplicate (src, dst) rows
    * pre-sum their weights; non-positive-total sources count as dangling. Same
    * scale/float discipline as [[pageRank]]: one dst-keyed shuffle per
    * iteration, in-plan dangling mass, composed checkpoints, round at
    * the caller. Returns (id, rank). */
  def weightedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointInterval: Int = 2,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    require(checkpointInterval >= 1, s"checkpointInterval must be >= 1, got $checkpointInterval")

    val st = IterState(edges, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    // collapse duplicates to exact LONG weights (integer interaction
    // counts — exact Σw, so the w/Σw shares are deterministic doubles).
    // Integrality is checked in-plan (decimal compare — exact for decimal
    // inputs and for doubles below 2^53): a fractional weight raises
    // loudly instead of truncating 1.9 and 1.1 both to 1.
    val wLong = col(weightCol).cast("long")
    val wChecked = when(
      col(weightCol).cast("decimal(38,18)") === wLong.cast("decimal(38,18)"),
      wLong)
      .otherwise(raise_error(concat(
        lit(s"weightedPageRank: non-integral weight in '$weightCol': "),
        col(weightCol).cast("string"))).cast("long"))
    val e = materialize(
      edges
        .select(col(srcCol).as("src"), col(dstCol).as("dst"), wChecked.as("w"))
        .filter(col("w") > 0)
        .groupBy(col("src"), col("dst"))
        .agg(sum(col("w")).as("w")))
    val nodes = materialize(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    val n = nodes.count()
    require(n > 0, "weightedPageRank needs at least one positive-weight edge")
    val outW = materialize(e.groupBy("src").agg(sum(col("w")).as("tw")))
    val dangling = materialize(
      nodes.join(outW, nodes("id") === outW("src"), "left_anti").select(col("id").as("did")))

    var ranks   = materialize(nodes.select(col("id"), lit(1.0 / n).as("rank")))
    var lastMat = ranks
    var i = 0
    while (i < iterations) {
      val danglingMass = ranks
        .join(dangling, ranks("id") === col("did"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      val weights = ranks
        .join(outW, ranks("id") === outW("src"))
        .select(col("id").as("wsrc"), (col("rank") / col("tw")).as("rpw"))
      val contribs = e
        .join(weights, col("src") === col("wsrc"))
        .groupBy(col("dst"))
        .agg(sum(col("rpw") * col("w")).as("c"))
      val nextPlan = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(
          col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dmass") / n)).as("rank"))
      if ((i + 1) % checkpointInterval == 0 || i == iterations - 1) {
        val next = materialize(nextPlan)
        release(lastMat)
        lastMat = next
        ranks = next
      } else ranks = nextPlan
      i += 1
    }
    release(e); release(outW); release(nodes); release(dangling)
    ranks
  }

  /** Personalized PageRank (random walk with restart — Jeh & Widom 2003
    * "Scaling Personalized Web Search"): identical power iteration to
    * [[pageRank]] except the teleport mass lands ONLY on the `sources`
    * set — rank(v) = (1−d)·1[v∈S]/|S| + d·(Σ_{u→v} rank(u)/outdeg(u) +
    * danglingMass·1[v∈S]/|S|). The result ranks every node by proximity
    * to S, the relevance measure behind graph-based recommendation
    * ("items near what this user touched") and seed-expansion entity
    * resolution. Same scale discipline as [[pageRank]]: one dst-keyed
    * shuffle per iteration, in-plan dangling mass, composed checkpoints,
    * broadcast source membership. Returns (id, rank). */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      sources: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointInterval: Int = 2,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    require(checkpointInterval >= 1, s"checkpointInterval must be >= 1, got $checkpointInterval")
    require(sources.columns.length == 1, "sources must be a single-column id frame")

    val spark = edges.sparkSession
    val st = IterState(edges, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    val e = materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val nodes = materialize(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    // restart set restricted to nodes that exist in the graph (a source
    // outside the edge set would receive teleport mass no walk can leave)
    val srcSet = materialize(
      sources.toDF("id").distinct().join(nodes, Seq("id"), "left_semi"))
    val nS = srcSet.count()
    require(nS > 0, "personalizedPageRank needs at least one source present in the graph")
    val outDeg = materialize(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val dangling = materialize(
      nodes.join(outDeg, nodes("id") === outDeg("src"), "left_anti").select(col("id").as("did")))

    val isSrc = srcSet.select(col("id"), lit(1.0).as("inS"))
    var ranks = materialize(
      nodes
        .join(isSrc, Seq("id"), "left")
        .select(col("id"), (coalesce(col("inS"), lit(0.0)) / nS).as("rank")))
    var lastMat = ranks
    var i = 0
    while (i < iterations) {
      val danglingMass = ranks
        .join(dangling, ranks("id") === col("did"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      val weights = ranks
        .join(outDeg, ranks("id") === outDeg("src"))
        .select(col("id").as("wsrc"), (col("rank") / col("deg")).as("w"))
      val contribs = e
        .join(weights, col("src") === col("wsrc"))
        .groupBy(col("dst"))
        .agg(sum(col("w")).as("c"))
      val nextPlan = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .join(isSrc, Seq("id"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(
          col("id"),
          (lit(1.0 - damping) * coalesce(col("inS"), lit(0.0)) / nS +
            lit(damping) * (coalesce(col("c"), lit(0.0)) +
              col("dmass") * coalesce(col("inS"), lit(0.0)) / nS)).as("rank"))
      if ((i + 1) % checkpointInterval == 0 || i == iterations - 1) {
        val next = materialize(nextPlan)
        release(lastMat)
        lastMat = next
        ranks = next
      } else ranks = nextPlan
      i += 1
    }
    release(e); release(outDeg); release(dangling); release(srcSet); release(nodes)
    ranks
  }

  /** Community detection by synchronous label propagation (Raghavan et al.
    * 2007) over an UNDIRECTED edge list: each round every node adopts the
    * most frequent label among its neighbors, ties broken toward the
    * SMALLEST label — fully deterministic, unlike the classic randomized
    * LPA (determinism is what makes the result testable and reproducible
    * across cluster sizes). Labels start as node ids; up to `iterations`
    * rounds of one neighbor-keyed shuffle each, labels checkpointed on the
    * same composed-interval bounded-depth discipline as [[pageRank]], with
    * an early exit once a checkpoint boundary certifies a consecutive-
    * iteration fixpoint (hash-identical to running the full budget).
    * Returns (id, label).
    *
    * Communities are denser-than-CC structure: connected components merge
    * everything reachable; LPA splits a component along sparse cuts —
    * the grouping that separates topically-distinct near-dup clusters
    * sharing a few accidental edges. Known LPA caveat (inherited from the
    * paper, not this implementation): synchronous updates can oscillate on
    * bipartite-ish subgraphs, so run a fixed iteration budget and treat
    * labels as heuristic communities, not a fix-point. */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      checkpointDir: Option[String] = None,
      checkpointInterval: Int = 2): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(checkpointInterval >= 1, s"checkpointInterval must be >= 1, got $checkpointInterval")

    val st = IterState(edges, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    val raw = edges.select(col(srcCol).as("a"), col(dstCol).as("b")).filter(col("a") =!= col("b"))
    val sym = materialize(
      raw.union(raw.select(col("b").as("a"), col("a").as("b"))).distinct())
    var labels = materialize(
      sym.select(col("a").as("id")).distinct().select(col("id"), col("id").as("label")))

    var lastMat = labels
    var i         = 0
    var converged = false
    while (i < iterations && !converged) {
      // neighbor label histogram per node; adopt (max count, min label).
      // Same composed-iteration checkpoint discipline as [[pageRank]] —
      // integer-exact labels, so composition cannot even shift a float.
      val nextPlan = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("a").as("id"))
        .agg(min_by(col("label"), struct((-col("n")).as("negn"), col("label"))).as("label"))
      if ((i + 1) % checkpointInterval == 0 || i == iterations - 1) {
        // early-exit probe, computed IN the checkpointed plan: flag each
        // node whose label differs from the immediately-PRECEDING
        // iteration (consecutive, not boundary-to-boundary — comparing
        // labels(t) to labels(t-interval) would false-trigger on LPA's
        // known synchronous 2-cycles, changing the budget-parity result).
        // The join against `labels` re-reads the same exchange the step
        // itself consumes; the changed-count is a scan over the fresh
        // checkpoint blocks, not a recompute. A zero count certifies a
        // FIXPOINT (labels(t) == labels(t-1)), so every later iteration
        // returns the same frame and stopping is hash-identical.
        val flagged = nextPlan
          .join(
            labels.select(col("id").as("pid"), col("label").as("plabel")),
            col("id") === col("pid"))
          .select(col("id"), col("label"), (col("label") =!= col("plabel")).as("changed"))
        val next = materialize(flagged)
        converged = next.filter(col("changed")).limit(1).isEmpty
        release(lastMat)
        lastMat = next
        labels = next.select(col("id"), col("label"))
      } else labels = nextPlan
      i += 1
    }
    release(sym)
    labels
  }

  /** Connected components over an undirected edge list: (id, component)
    * with component = the MINIMUM node id in each component — the
    * entity-consolidation primitive ("all these rows are one entity"),
    * here exposed as a first-class graph operator delegating to the same
    * alternating large-star/small-star fix-point [[Dedup]] clusters
    * duplicate documents with (Kiveris et al. 2014 — O(log n) rounds, one
    * keyed shuffle per star step, edge-set signature convergence test,
    * never a driver collect). Nodes with no non-self edge are absent (an
    * edge list does not enumerate isolated nodes). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      checkpointDir: Option[String] = None): DataFrame = {
    val pairs = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val (labels, _) = Dedup.starComponents(pairs, checkpointDir = checkpointDir)
    labels.select(col("doc_id").as("id"), col("cluster_id").as("component"))
  }

  /** Multi-source BFS levels over an edge list: level(v) = the minimum hop
    * count from any node in `sources`, explored frontier-by-frontier up to
    * `maxDepth` (nodes farther than that — or unreachable — are absent
    * from the output). `undirected` symmetrizes the edge set first.
    *
    * Scale shape: the textbook frontier iteration — each round is ONE
    * neighbor-keyed shuffle (frontier ⋈ edges) plus a left_anti against
    * the visited set, both frontier-sized (shrinking), never node²; the
    * visited set is checkpointed per round so plan depth stays O(1) per
    * level, and the loop exits the first time a frontier comes back empty
    * (the count rides the checkpoint action). This is the reachability /
    * contamination-blast-radius primitive: "everything within k hops of
    * these flagged nodes". Returns (id, level). */
  def bfsLevels(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      sources: DataFrame,
      maxDepth: Int,
      undirected: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    require(sources.columns.length == 1, "sources must be a single-column id frame")

    val st = IterState(edges, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    val raw = edges.select(col(srcCol).as("a"), col(dstCol).as("b")).filter(col("a") =!= col("b"))
    val dir = if (undirected) raw.union(raw.select(col("b").as("a"), col("a").as("b"))) else raw
    val sym = materialize(dir.distinct())
    // sources may name nodes outside the edge set — they are still level-0
    // roots (a flagged doc with no links is its own blast radius)
    val srcIds = sources.toDF("id").distinct()
    var visited  = materialize(srcIds.select(col("id"), lit(0).as("level")))
    var frontier = visited.select("id")
    var lastVisited = visited
    var prevFrontier: DataFrame = null
    var level = 0
    var done  = frontier.limit(1).isEmpty
    while (level < maxDepth && !done) {
      level += 1
      val nextFrontier = materialize(
        sym
          .join(frontier.select(col("id").as("fid")), col("a") === col("fid"))
          .select(col("b").as("id"))
          .distinct()
          .join(visited, Seq("id"), "left_anti"))
      done = nextFrontier.limit(1).isEmpty
      if (!done) {
        val nextVisited = materialize(
          visited.union(nextFrontier.select(col("id"), lit(level).as("level"))))
        release(lastVisited)
        lastVisited = nextVisited
        visited = nextVisited
        if (prevFrontier != null) release(prevFrontier)
        prevFrontier = nextFrontier
        frontier = nextFrontier
      } else release(nextFrontier)
    }
    if (prevFrontier != null) release(prevFrontier)
    release(sym)
    visited
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a directed edge list:
    * a = A·h / ‖A·h‖₂, h = Aᵀ·a / ‖Aᵀ·a‖₂ alternating for `iterations`
    * rounds from h₀ = 1/N — the bipartite-friendly importance pair
    * PageRank can't express (a customer is a good HUB when it buys from
    * good suppliers; a supplier a good AUTHORITY when good hubs buy from
    * it). Returns (id, hub, authority) rounded to 6dp.
    *
    * Same float discipline as [[pageRank]]: plain double arithmetic, one
    * dst-keyed shuffle per half-step, per-round L2 normalization (keeps
    * magnitudes O(1) at any scale/iteration count), composed-iteration
    * checkpoints every `checkpointInterval` rounds for bounded plan depth.
    * The only cross-engine freedom is unordered-SUM ulp order (~1e-15),
    * eight orders under the final round(·, 6) — the proven pagerank
    * envelope. */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 8,
      checkpointInterval: Int = 2,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(checkpointInterval >= 1, s"checkpointInterval must be >= 1, got $checkpointInterval")

    val st = IterState(edges, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    val e = materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val nodes = materialize(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    val n = nodes.count()
    require(n > 0, "hits needs at least one edge")

    var hubs    = nodes.select(col("id"), lit(1.0 / n).as("h"))
    var auths: DataFrame = null
    var lastMat = materialize(hubs)
    hubs = lastMat
    var i = 0
    while (i < iterations) {
      // authority: in-neighbor hub mass, L2-normalized in-plan (the norm is
      // a one-row agg cross-joined in — no driver round-trip, same shape as
      // pagerank's dangling mass)
      val araw = e
        .join(hubs.select(col("id").as("hid"), col("h")), col("src") === col("hid"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("h")).as("ar"))
      val anorm = araw.agg(sqrt(sum(col("ar") * col("ar"))).as("an"))
      val aPlan = araw.crossJoin(broadcast(anorm)).select(col("id"), (col("ar") / col("an")).as("a"))
      // hub: out-neighbor authority mass, L2-normalized
      val hraw = e
        .join(aPlan.select(col("id").as("aid"), col("a")), col("dst") === col("aid"))
        .groupBy(col("src").as("id"))
        .agg(sum(col("a")).as("hr"))
      val hnorm = hraw.agg(sqrt(sum(col("hr") * col("hr"))).as("hn"))
      val hPlan = hraw.crossJoin(broadcast(hnorm)).select(col("id"), (col("hr") / col("hn")).as("h"))
      if ((i + 1) % checkpointInterval == 0 || i == iterations - 1) {
        // one composed checkpoint carries BOTH halves of the round (the
        // authority exchange is reused by the hub step plan-wide)
        val packed = materialize(
          hPlan.join(aPlan.select(col("id").as("aid2"), col("a")), col("id") === col("aid2"), "full")
            .select(coalesce(col("id"), col("aid2")).as("id"), col("h"), col("a")))
        release(lastMat)
        lastMat = packed
        hubs  = packed.select(col("id"), col("h")).filter(col("h").isNotNull)
        auths = packed.select(col("id"), col("a")).filter(col("a").isNotNull)
      } else {
        hubs = hPlan
        auths = aPlan
      }
      i += 1
    }
    val out = nodes
      .join(hubs.select(col("id").as("hid"), col("h")), col("id") === col("hid"), "left")
      .join(auths.select(col("id").as("aid"), col("a")), col("id") === col("aid"), "left")
      .select(
        col("id"),
        round(coalesce(col("h"), lit(0.0)), 6).as("hub"),
        round(coalesce(col("a"), lit(0.0)), 6).as("authority"))
    val materialized = out.localCheckpoint(true)
    release(e); release(nodes); release(lastMat)
    materialized
  }

  /** Common-neighbor pairs over a bipartite edge list (left, right): for
    * every pair of LEFT nodes, how many RIGHT neighbors they share — the
    * "customers who bought from the same suppliers" co-occurrence
    * primitive behind item-item recommenders and bipartite link
    * prediction.
    *
    * Scale discipline (the reason this isn't a naive self-join): pair
    * fan-out is Σ_r deg(r)², so ONE hot right-node floods the output
    * quadratically. `maxDegree` drops right nodes above the cap before
    * pairing — the hot set is tiny by construction and broadcasts as a
    * LeftAnti (same shape as the LSH bucket cap); a hub shared by
    * everyone carries no signal for "these two specifically co-occur"
    * anyway (the same reason IDF discounts common terms). Then one
    * self-equi-join on the right key (never a cross product), map-side
    * counted into (a, b, shared) with a < b. */
  def commonNeighborPairs(
      edges: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDegree: Int): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must allow pairs, got $maxDegree")
    // The distinct edge set feeds FOUR consumers (deg, both anti-join
    // probe sides, and through them both self-join sides) and Catalyst
    // plans each as a full recompute — lineitem-sized join + distinct
    // executed 4x (measured 6.1s -> 3.1s at sf0.1 when persisted once).
    // MEMORY_AND_DISK is the cluster-realistic multi-consumer
    // materialization (spills, never OOMs), the same role the pagerank/LPA
    // checkpoints play; e is the DISTINCT bipartite edge list, already the
    // smallest relation in the query.
    val e = edges
      .select(col(leftCol).cast("long").as("l"), col(rightCol).cast("long").as("r"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = e
      .groupBy(col("r"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") > maxDegree)
      .select("r")
    val cold = e.join(broadcast(hot), Seq("r"), "left_anti")
    // measured choice: the r-keyed self-join beats the exploded-adjacency-
    // array alternative here (pair structs allocated in-row cost more than
    // the second SMJ side); the join never cross-products (equi-key on r)
    // and the pair counts partial-aggregate map-side before the exchange
    cold
      .as("x")
      .join(cold.as("y"), col("x.r") === col("y.r") && col("x.l") < col("y.l"))
      .groupBy(col("x.l").as("a"), col("y.l").as("b"))
      .agg(count(lit(1)).as("shared"))
  }

  /** Adamic-Adar link prediction over a bipartite edge list (left, right):
    * for every pair of LEFT nodes, AA(a,b) = Σ_{z ∈ Γ(a)∩Γ(b)} 1/ln(deg z)
    * (Adamic & Adar 2003) — [[commonNeighborPairs]]' raw shared counts with
    * each shared right-neighbor discounted by its popularity, the standard
    * "rarer witnesses count more" link-prediction score (the soft version
    * of the IDF argument the hub cap makes by fiat).
    *
    * Scale discipline is identical to [[commonNeighborPairs]]: right hubs
    * over `maxDegree` are dropped BEFORE pairing (broadcast LeftAnti — a
    * neighbor shared by everyone carries ~no signal AND floods the pair
    * join quadratically), the pair join is equi-keyed on the right node,
    * `minShared` bounds the long tail of singleton coincidences.
    *
    * Exactness: the weight 1/ln(deg) is snapped to the 1e-12 decimal grid
    * (shared z implies deg ≥ 2, so ln > 0) and summed as DECIMAL — exact,
    * order-free, replayable; rank by the EXACT decimal sum (aa desc, a, b)
    * before the final round(·, 6) so a top-N cut never straddles a rounding
    * collision. Returns (a, b, shared, aa). */
  def adamicAdar(
      edges: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDegree: Int,
      minShared: Long = 2L): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must allow pairs, got $maxDegree")
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val e = edges
      .select(col(leftCol).cast("long").as("l"), col(rightCol).cast("long").as("r"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("r")).agg(count(lit(1)).as("dg"))
    val hot = deg.filter(col("dg") > maxDegree).select("r")
    val cold = e.join(broadcast(hot), Seq("r"), "left_anti")
    // deg==1 right nodes can never be SHARED neighbors (and ln 1 = 0), so
    // the weight table starts at 2; the inner join below drops their rows
    // before pairing instead of carrying zero-weight edges.
    val w = deg
      .filter(col("dg") <= maxDegree && col("dg") >= 2)
      .select(
        col("r"),
        round(lit(1.0) / log(col("dg").cast("double")), 12).cast(dec12).as("w"))
    // w is right-node-sized (already a groupBy reduction) — broadcast it
    // so the weight attach never adds a shuffle to the pair join's input
    val out = cold
      .join(broadcast(w), Seq("r"))
      .as("x")
      .join(cold.as("y"), col("x.r") === col("y.r") && col("x.l") < col("y.l"))
      .groupBy(col("x.l").as("a"), col("y.l").as("b"))
      .agg(count(lit(1)).as("shared"), sum(col("x.w")).as("aa_exact"))
      .filter(col("shared") >= minShared)
    val materialized = out.localCheckpoint(true)
    e.unpersist()
    materialized
  }

  /** Item-item cosine similarity from bipartite co-occurrence: for left
    * nodes a, b sharing right-neighbors, cos(a,b) = shared/√(deg_a·deg_b)
    * over the hub-capped edge set — [[commonNeighborPairs]]' raw shared
    * counts normalized into the classic item-item collaborative-filtering
    * score (co-purchase similarity), so prolific items don't dominate by
    * volume. Same scale discipline: right hubs over `maxDegree` are
    * dropped before pairing (broadcast LeftAnti), the pair join is
    * equi-keyed on the right node, `minShared` bounds the output tail.
    * Degrees are counted over the SAME capped set the pairs come from, so
    * cosine ≤ 1 exactly. Returns (a, b, shared, cosine) rounded to 6. */
  def cooccurrenceCosine(
      edges: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDegree: Int,
      minShared: Long = 2L): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must allow pairs, got $maxDegree")
    val e = edges
      .select(col(leftCol).cast("long").as("l"), col(rightCol).cast("long").as("r"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = e
      .groupBy(col("r"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") > maxDegree)
      .select("r")
    val cold = e.join(broadcast(hot), Seq("r"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ldeg = cold.groupBy(col("l")).agg(count(lit(1)).as("deg"))
    val out = cold
      .as("x")
      .join(cold.as("y"), col("x.r") === col("y.r") && col("x.l") < col("y.l"))
      .groupBy(col("x.l").as("a"), col("y.l").as("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(ldeg.select(col("l").as("a"), col("deg").as("da")), Seq("a"))
      .join(ldeg.select(col("l").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        col("a"),
        col("b"),
        col("shared"),
        round(
          col("shared").cast("double") /
            sqrt(col("da").cast("double") * col("db").cast("double")),
          6).as("cosine"))
    val materialized = out.localCheckpoint(true)
    e.unpersist(); cold.unpersist()
    materialized
  }

  /** Per-node triangle counts + local clustering coefficient via
    * DEGREE-ORDERED wedge closing (the "compact-forward" scheme, Latapy
    * 2008 / Suri-Vassilvitskii WWW'11 for the MapReduce form): orient every
    * undirected edge from its lower-(degree, id) endpoint to the higher
    * one, build wedges only at each edge's LOW-rank endpoint, and close
    * them against the oriented edge set. The orientation bounds every
    * out-neighborhood by O(√m) regardless of hubs — the naive
    * adjacency self-join is quadratic in the max degree (a celebrity node
    * in a co-purchase graph explodes it), while oriented wedge counts are
    * Σ outdeg² ≤ O(m^1.5), the proven worst case for triangle listing.
    * Every triangle (ranked u < v < w) is emitted exactly once as the
    * wedge (v, w) at u closed by the oriented edge v→w.
    *
    * Output: (id, degree, n_triangles, clustering) for every endpoint —
    * lcc = 2T/(deg·(deg−1)) rounded to 6, the standard cohesion signal
    * (spam/bot subgraphs in web corpora read as lcc anomalies). Exact
    * integers until the one division, so the row hash-checks against an
    * algorithm-independent 3-way-join oracle. */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("degree"))
    // rank = (degree, id): a total order that sends wedge-building to the
    // LOW-degree endpoint of every edge
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("degree").as("db")), Seq("b"))
    def rankLt(d1: org.apache.spark.sql.Column, i1: org.apache.spark.sql.Column,
               d2: org.apache.spark.sql.Column, i2: org.apache.spark.sql.Column) =
      d1 < d2 || (d1 === d2 && i1 < i2)
    val oriented = withDeg
      .select(
        when(rankLt(col("da"), col("a"), col("db"), col("b")), col("a")).otherwise(col("b")).as("u"),
        when(rankLt(col("da"), col("a"), col("db"), col("b")), col("b")).otherwise(col("a")).as("v"),
        when(rankLt(col("da"), col("a"), col("db"), col("b")), col("db")).otherwise(col("da")).as("dv"))
      .cache()
    val wedges = oriented.as("x")
      .join(oriented.as("y"),
        col("x.u") === col("y.u") &&
          rankLt(col("x.dv"), col("x.v"), col("y.dv"), col("y.v")))
      .select(col("x.u").as("tu"), col("x.v").as("tv"), col("y.v").as("tw"))
    val triangles = wedges
      .join(oriented.select(col("u").as("tv"), col("v").as("tw")), Seq("tv", "tw"))
    val perNode = triangles
      .select(explode(array(col("tu"), col("tv"), col("tw"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_triangles"))
    val out = deg
      .join(perNode, Seq("id"), "left")
      .select(
        col("id"),
        col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        round(
          when(col("degree") >= 2,
            (coalesce(col("n_triangles"), lit(0L)) * 2).cast("double") / (col("degree") * (col("degree") - 1)))
            .otherwise(lit(0.0)),
          6).as("clustering"))
    val materialized = out.localCheckpoint(true)
    und.unpersist()
    oriented.unpersist()
    materialized
  }

  /** Degree assortativity (Newman 2002) — the one-number graph-health
    * signal beside the corpus's Zipf/Heaps fits: the Pearson correlation
    * of endpoint degrees over the symmetrized edge list. Positive = hubs
    * attach to hubs (social graphs), negative = hubs attach to leaves
    * (hub-and-spoke / star floods — the spam topology), ~0 = neutral
    * mixing. On the symmetrized list both marginals coincide, so
    * r = (n·Σxy − (Σx)²)/(n·Σxx − (Σx)²) — EXACT integer moments (degrees
    * are ints; one canonical-edge pass computes Σ(x+y), Σ(x²+y²), Σ2xy
    * without materializing the mirror), ONE double division, round 6 —
    * the fully-replayable shape, no sqrt. A regular graph has zero degree
    * variance: NULL, not NaN. Output: (n_nodes, n_edges, assortativity). */
  /** Newman modularity (Newman & Girvan 2004) of a given node partition:
    * Q = Σ_c (e_c/m − (d_c/2m)²) — the standard "is this community
    * structure real" score, here as an AUDIT of any labeling (LPA output,
    * a metadata partition, an external clustering). Cross-multiplied
    * exact form: Q·4m² = Σ_c (4m·e_c − d_c²) is an exact integer
    * (DECIMAL(38,0) products), so Q is ONE division under round(·, 6).
    * Nodes are labeled by inner join — unlabeled nodes (and their edges)
    * drop, documented. One canonical-edge pass + two label-keyed
    * aggregations; everything after is community-sized. Output one row:
    * (n_nodes, n_communities, m_edges, q_num, q_modularity). */
  def modularity(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      labels: DataFrame,
      idCol: String,
      labelCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val lab = labels.select(col(idCol).as("id"), col(labelCol).cast("string").as("c"))
    val el = und
      .join(lab.select(col("id").as("a"), col("c").as("ca")), Seq("a"))
      .join(lab.select(col("id").as("b"), col("c").as("cb")), Seq("b"))
      .cache()
    val m = el.count()
    val ec = el.filter(col("ca") === col("cb")).groupBy(col("ca").as("c"))
      .agg(count(lit(1)).as("e_c"))
    val dc = el
      .select(explode(array(col("ca"), col("cb"))).as("c"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("d_c"))
    val nNodes = el.select(explode(array(col("a"), col("b"))).as("id")).distinct().count()
    val out = dc
      .join(ec, Seq("c"), "left")
      .select(col("c"), coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c"))
      .agg(
        count(lit(1)).as("n_communities"),
        sum(lit(4L * m).cast(dec38) * col("e_c") - col("d_c").cast(dec38) * col("d_c"))
          .as("q_num"))
      .select(
        lit(nNodes).as("n_nodes"),
        col("n_communities"),
        lit(m).as("m_edges"),
        col("q_num").cast("long").as("q_num"),
        round(
          when(lit(m) > 0,
            col("q_num").cast("double") / (lit(4.0) * m.toDouble * m.toDouble)),
          6).as("q_modularity"))
    el.unpersist()
    out
  }

  /** Louvain community detection (Blondel et al. 2008), one aggregation
    * level as a BOUNDED-ROUND synchronous sweep — the gain-driven upgrade
    * over [[labelPropagation]]'s frequency vote (GraphSpec pins that its
    * modularity is ≥ LPA's on the fixture graphs; the `graph_louvain` gate
    * row replays every round in SQL).
    *
    * Each round, every ELIGIBLE node evaluates moving to each neighboring
    * community and takes the best strictly-improving move; all moves apply
    * simultaneously. Classic sequential Louvain is visit-order-dependent —
    * unreproducible across cluster sizes — so this sweep derandomizes it:
    *
    *   - the modularity-gain comparison is INTEGER-exact. With unweighted
    *     degree k_u, community degree sums Σtot, m edges, the standard
    *     gain of joining c is [k_in(u,c) − k_u·Σtot(c)/2m]/m up to the
    *     shared 1/m factor, so moves compare score(c) = 2m·k_in(u,c) −
    *     k_u·Σtot(c) (staying scores with u removed from its own
    *     community: 2m·k_in(u,cu) − k_u·(Σtot(cu) − k_u)) — products run
    *     in DECIMAL, no float ever decides a move, ties break to the
    *     smallest community label;
    *   - rounds alternate PARITY CLASSES (round r moves only nodes with
    *     id % 2 == r % 2) — the 2-coloring guard synchronous Louvain
    *     implementations use against oscillating label swaps (Grappolo-
    *     style coloring, Lu/Halappanavar/Kalyanaraman 2015, reduced to
    *     its cheapest deterministic form);
    *   - a fixed `rounds` budget, labels checkpointed each round through
    *     the shared [[IterState]] (durable under `checkpointDir`).
    *
    * One neighbor-keyed shuffle (k_in) plus two community-keyed
    * aggregations (Σtot, argmax) per round; the only driver scalar is m.
    * Skewed community sizes hot-key the Σtot aggregation exactly like any
    * hot groupBy — compose with [[Skew.autoSaltedAgg]] at extreme scale.
    * Returns (id, community); node ids must be non-negative (the parity
    * guard uses id % 2; every graft id domain is). Second aggregation
    * levels compose by condensing edges over the returned labels and
    * calling this again. */
  def louvain(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      rounds: Int = 4,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    val st = IterState(edges, checkpointDir)
    val raw = edges.select(col(aCol).as("a"), col(bCol).as("b")).filter(col("a") =!= col("b"))
    val und = st.mat(
      raw.select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b")).distinct())
    val sym = st.mat(
      und.union(und.select(col("b").as("a"), col("a").as("b"))).withColumn("w", lit(1L)))
    val deg = st.mat(sym.groupBy(col("a").as("id")).agg(sum(col("w")).as("k")))
    val m   = und.count() // the one driver scalar; everything below is in-plan
    st.release(und)
    louvainSweep(sym, deg, m, rounds, st)
  }

  /** WEIGHTED Louvain over an undirected weighted edge list — the sweep
    * [[louvain]] runs, generalized to integer edge weights and self-loops,
    * which is exactly what a CONDENSED community graph carries (weight =
    * inter-community edge count, self-loop = intra-community count):
    * multi-edges sum, a self-loop contributes 2w to its node's weighted
    * degree (and moves WITH the node, so it never biases the candidate
    * comparison), m = total edge weight including self-loops. The gain
    * arithmetic is the same integer 2m·k_in − k·Σtot, now over weighted
    * sums — still exact. Used by [[louvainTwoLevel]]; callable directly
    * for natively weighted graphs. Weights must be positive longs. */
  def louvainWeighted(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      weightCol: String,
      rounds: Int = 4,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    val st = IterState(edges, checkpointDir)
    // canonicalize and SUM multi-edges; keep self-loops separate
    val grouped = st.mat(
      edges
        .select(
          least(col(aCol), col(bCol)).as("a"),
          greatest(col(aCol), col(bCol)).as("b"),
          col(weightCol).cast("long").as("w"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("w")).as("w")))
    val out = louvainWeightedCanonical(grouped, rounds, st)
    st.release(grouped)
    out
  }

  /** [[louvainWeighted]] minus the canonicalization shuffle, for callers
    * whose edge list is ALREADY canonical-grouped (a ≤ b, one row per
    * pair, self-loops on the diagonal) and checkpointed — which is exactly
    * what [[louvainMultilevel]]'s condensation emits every level. */
  private def louvainWeightedCanonical(
      grouped: DataFrame,
      rounds: Int,
      st: IterState): DataFrame = {
    val selfW = grouped.filter(col("a") === col("b")).select(col("a").as("id"), col("w").as("sw"))
    val inter = grouped.filter(col("a") =!= col("b"))
    val sym = st.mat(
      inter.select(col("a"), col("b"), col("w"))
        .union(inter.select(col("b").as("a"), col("a").as("b"), col("w"))))
    // weighted degree: incident inter-edge weight + 2x self-loop weight;
    // union-then-sum also labels nodes whose ONLY edge is their self-loop
    val deg = st.mat(
      sym.select(col("a").as("id"), col("w").as("k"))
        .union(selfW.select(col("id"), (col("sw") * 2).as("k")))
        .groupBy(col("id"))
        .agg(sum(col("k")).as("k")))
    val m = grouped.agg(sum(col("w"))).head().getLong(0) // total weight incl self-loops
    // `grouped`'s lifecycle belongs to the caller (louvainMultilevel keeps
    // using it for the NEXT condensation after this sweep returns)
    louvainSweep(sym, deg, m, rounds, st)
  }

  /** The shared bounded-round synchronous Louvain sweep over prepared
    * inputs: `sym` = both directions of every inter-node edge with weight
    * `w`, `deg` = weighted degrees (self-loops already doubled in), `m` =
    * total edge weight. See [[louvain]] for the derandomization contract
    * (integer scores, smallest-label ties, parity classes, per-round
    * IterState checkpoints).
    *
    * Convergence early-exit (same in-plan probe discipline as
    * [[labelPropagation]]'s): each round's checkpointed frame carries a
    * `moved` flag (the move predicate itself), and the sweep stops after
    * TWO consecutive zero-move rounds. One quiet round is NOT a fixpoint
    * here — the parity classes alternate, so round r only updates ids of
    * parity r%2 and the OTHER class may still have pending moves — but two
    * quiet rounds cover both parities over the same label state, and the
    * update is a deterministic function of that state, so every later
    * round is the identity: stopping is hash-identical to running the full
    * budget. The probe is a limit-1 scan over blocks the checkpoint just
    * wrote — no recompute, one extra cheap job per round, and it turns the
    * fixed 4/8-round budget into "as many rounds as the graph needs". */
  private def louvainSweep(
      sym: DataFrame,
      deg: DataFrame,
      m: Long,
      rounds: Int,
      st: IterState): DataFrame = {
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val twoM  = lit(2L * m).cast(dec19)
    var labels = st.mat(deg.select(col("id"), col("id").as("c")))
    var r = 1
    var quiet = 0 // consecutive rounds with zero moves (covers both parities at 2)
    while (r <= rounds && quiet < 2) {
      val tot = labels
        .join(deg, Seq("id"))
        .groupBy(col("c"))
        .agg(sum(col("k")).as("tot"))
      val kin = sym
        .join(labels.select(col("id").as("b"), col("c")), Seq("b"))
        .groupBy(col("a").as("id"), col("c"))
        .agg(sum(col("w")).as("kin"))
      val base = labels
        .select(col("id"), col("c").as("cu"))
        .join(deg, Seq("id"))
        .join(tot.select(col("c").as("cu"), col("tot").as("tot_cu")), Seq("cu"))
        .join(
          kin.select(col("id"), col("c").as("cu"), col("kin").as("kin_cu")),
          Seq("id", "cu"), "left")
        .select(
          col("id"), col("cu"), col("k"),
          (twoM * coalesce(col("kin_cu"), lit(0L)).cast(dec19) -
            col("k").cast(dec19) * (col("tot_cu").cast(dec19) - col("k").cast(dec19)))
            .as("s_stay"))
      val cand = kin
        .join(tot, Seq("c"))
        .join(base.select(col("id"), col("cu"), col("k")), Seq("id"))
        .filter(col("c") =!= col("cu"))
        .select(
          col("id"), col("c"),
          (twoM * col("kin").cast(dec19) - col("k").cast(dec19) * col("tot").cast(dec19)).as("s"))
      val best = cand
        .groupBy(col("id"))
        .agg(min_by(struct(col("c"), col("s")), struct((-col("s")).as("ns"), col("c"))).as("bs"))
      // `moved` is exactly the adopt predicate (cand already filters
      // c <> cu, so firing implies the label genuinely changes); it rides
      // the same checkpointed plan, making the convergence probe a scan
      // over just-written blocks instead of a recompute.
      val movePred = col("bs").isNotNull && col("bs.s") > col("s_stay") &&
        col("id") % 2 === lit(r % 2)
      val next = base
        .join(best, Seq("id"), "left")
        .select(
          col("id"),
          when(movePred, col("bs.c")).otherwise(col("cu")).as("c"),
          movePred.as("moved"))
      val mat = st.mat(next)
      quiet = if (mat.filter(col("moved")).limit(1).isEmpty) quiet + 1 else 0
      st.release(labels)
      labels = mat
      r += 1
    }
    st.release(sym); st.release(deg)
    labels.select(col("id"), col("c").as("community"))
  }

  /** TWO-LEVEL Louvain — the full Blondel et al. 2008 recipe's second
    * phase: run the level-1 sweep ([[louvain]]), CONDENSE the graph over
    * its labels (supernode per community; weight = inter-community edge
    * count, self-loop = intra-community count — the exact bookkeeping the
    * paper prescribes), run the WEIGHTED sweep ([[louvainWeighted]]) on
    * the condensed graph, and compose the two label maps. Level 2 merges
    * the communities level 1 was too myopic to join (each level-1 label
    * is one decision unit at level 2), which is where Louvain's
    * modularity advantage over single-sweep methods comes from — GraphSpec
    * pins Q(two-level) ≥ Q(one-level) ≥ Q(LPA) on the fixtures.
    *
    * Condensation is one labels-join + community-keyed count — community-
    * space-sized, so level 2 runs on a graph that is usually orders of
    * magnitude smaller than the input (THE scale argument for multi-level
    * community detection at 100 TB). Composition is one broadcast-sized
    * join from level-1 labels to level-2 communities. Deterministic end
    * to end; the gate oracle replays both sweeps and the condensation. */
  def louvainTwoLevel(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      rounds1: Int = 4,
      rounds2: Int = 4,
      checkpointDir: Option[String] = None): DataFrame = {
    val st = IterState(edges, checkpointDir)
    val l1 = st.mat(louvain(edges, aCol, bCol, rounds1, checkpointDir))
    // the SAME canonical undirected simple edge set level 1 swept
    val und = edges
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val condensed = und
      .join(l1.select(col("id").as("a"), col("community").as("ca")), Seq("a"))
      .join(l1.select(col("id").as("b"), col("community").as("cb")), Seq("b"))
      .groupBy(
        least(col("ca"), col("cb")).as("sa"),
        greatest(col("ca"), col("cb")).as("sb"))
      .agg(count(lit(1)).as("w"))
    val l2 = louvainWeighted(condensed, "sa", "sb", "w", rounds2, checkpointDir)
    // materialize the composition BEFORE releasing l1 — the lazy plan
    // reads l1's checkpoint blocks, so releasing first would plan over
    // freed blocks (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
    val out = st.mat(
      l1.join(
          l2.select(col("id").as("community"), col("community").as("community2")),
          Seq("community"), "left")
        .select(col("id"), coalesce(col("community2"), col("community")).as("community")))
    st.release(l1)
    out
  }

  /** N-LEVEL Louvain — the full recursive Blondel et al. 2008 pipeline
    * [[louvainTwoLevel]] hard-caps at two levels: sweep, condense over the
    * labels (supernode per community; weight = summed inter-community
    * weight, self-loop = summed intra weight — condensing a condensed
    * graph just re-applies the same bookkeeping), and RECURSE on the
    * condensed graph "as long as modularity improves" (the paper's literal
    * stop rule) up to `maxLevels`. Each level's sweep is ACCEPTED only if
    * its partition strictly raises the EXACT integer modularity numerator
    * Σ_c(2m·A_in(c) − Σtot(c)²) over the level's input partition
    * ([[weightedQNum]]; m is level-invariant, so numerators compare
    * across levels): a synchronous parity-guarded sweep makes only
    * locally-positive-gain moves, but simultaneous same-parity moves can
    * interact and LOWER global Q — the acceptance gate is what makes
    * Q(level ℓ+1) ≥ Q(level ℓ) a guarantee rather than a hope, and it
    * subsumes the no-moves fixpoint (identity labels give an equal
    * numerator, hence rejection). Rejection stops the recursion; the
    * DuckDB oracle replays the same unrolled levels with the same HUGEINT
    * acceptance flags, so the early-exited result hashes equal.
    *
    * Scale shape: level 1 is node/edge-sized; every deeper level runs on a
    * community-space graph that shrinks geometrically (the paper's "the
    * number of communities decreases drastically at each pass"), so the
    * recursion's total cost is dominated by level 1 plus fixed per-round
    * job overhead — each extra level is nearly free while buying the
    * coarse merges single- and two-level sweeps are too myopic to make.
    * Composition is one broadcast-sized label join per level. GraphSpec
    * pins Q(multilevel) ≥ Q(two-level) ≥ Q(one-level) on the fixtures. */
  def louvainMultilevel(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      roundsPerLevel: Int = 4,
      maxLevels: Int = 4,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxLevels >= 1, s"maxLevels must be >= 1, got $maxLevels")
    val st = IterState(edges, checkpointDir)
    // level 1: unweighted sweep over the canonical undirected simple edges
    var acc = st.mat(louvain(edges, aCol, bCol, roundsPerLevel, checkpointDir))
    // labels of the most recently swept level, keyed by THAT level's node
    // ids (level 1: original ids; level ℓ: level-(ℓ−1) community ids)
    var lastLabels = acc
    // current condensable graph: canonical weighted edges INCLUDING
    // self-loops (level 1's carries w=1 and, having filtered a<>b, none)
    var cur = st.mat(
      edges
        .select(col(aCol).as("a"), col(bCol).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct()
        .withColumn("w", lit(1L)))
    var level     = 1
    var converged = false
    while (level < maxLevels && !converged) {
      // condense over the labels of the level just swept: supernode per
      // community, weights summed; intra edges land on the diagonal as
      // self-loops (louvainWeighted doubles them into degrees and keeps
      // them in m — the paper's exact bookkeeping)
      val nextCur = st.mat(
        cur
          .join(lastLabels.select(col("id").as("a"), col("community").as("ca")), Seq("a"))
          .join(lastLabels.select(col("id").as("b"), col("community").as("cb")), Seq("b"))
          .groupBy(least(col("ca"), col("cb")).as("a"), greatest(col("ca"), col("cb")).as("b"))
          .agg(sum(col("w")).as("w")))
      st.release(cur)
      cur = nextCur
      // cur is already canonical-grouped (the condensation above) — skip
      // louvainWeighted's re-canonicalization shuffle
      val l = st.mat(louvainWeightedCanonical(cur, roundsPerLevel, st))
      // accept the level only if it STRICTLY raises the exact modularity
      // numerator over this level's input partition — the identity
      // partition of the condensed graph, whose numerator equals the
      // accepted partition's by condensation-invariance; both sides score
      // on the COMMUNITY-SPACE graph, so the gate costs two tiny
      // aggregation passes per level (see Scaladoc)
      converged = weightedQNum(cur, Some(l)).compareTo(weightedQNum(cur, None)) <= 0
      if (converged) st.release(l)
      else {
        val nextAcc = st.mat(
          acc.join(
              l.select(col("id").as("community"), col("community").as("c2")),
              Seq("community"), "left")
            .select(col("id"), coalesce(col("c2"), col("community")).as("community")))
        if (!(lastLabels eq acc)) st.release(lastLabels)
        st.release(acc)
        acc = nextAcc
        lastLabels = l
      }
      level += 1
    }
    if (!(lastLabels eq acc)) st.release(lastLabels)
    st.release(cur)
    acc.select(col("id"), col("community"))
  }

  /** EXACT modularity numerator Σ_c (2m·A_in(c) − Σtot(c)²) of a node
    * partition over a canonical weighted edge list (a ≤ b per inter pair,
    * self-loops on the diagonal) — the standard A_ii = 2·loopweight
    * convention, so m, degrees and the numerator all match the sweep's
    * gain arithmetic. Q = numerator / (2m)², and m is invariant under
    * condensation, so numerators compare partitions ACROSS Louvain levels
    * without ever leaving integers (DECIMAL(38,0) in-plan, BigDecimal at
    * the driver — one community-space-sized aggregation pass, one scalar
    * out). `labels` = None scores the identity partition (every node its
    * own community), the "before" side of the acceptance gate. */
  private def weightedQNum(
      canonEdges: DataFrame,
      labels: Option[DataFrame]): java.math.BigDecimal = {
    val dec   = org.apache.spark.sql.types.DecimalType(38, 0)
    val inter = canonEdges.filter(col("a") =!= col("b"))
    val selfW = canonEdges.filter(col("a") === col("b"))
    val deg = inter
      .select(col("a").as("id"), col("w"))
      .union(inter.select(col("b").as("id"), col("w")))
      .union(selfW.select(col("a").as("id"), (col("w") * 2).as("w")))
      .groupBy(col("id"))
      .agg(sum(col("w")).as("k"))
    val lab = labels
      .map(_.select(col("id"), col("community").as("c")))
      .getOrElse(deg.select(col("id"), col("id").as("c")))
    val ain = canonEdges
      .join(lab.select(col("id").as("a"), col("c").as("ca")), Seq("a"))
      .join(lab.select(col("id").as("b"), col("c").as("cb")), Seq("b"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("c"))
      .agg((sum(col("w")) * 2).cast(dec).as("ain"))
    val tot = deg
      .join(lab, Seq("id"))
      .groupBy(col("c"))
      .agg(sum(col("k")).cast(dec).as("tot"))
    val mTwice = canonEdges.agg((sum(col("w")) * 2).cast(dec).as("m2"))
    val row = tot
      .join(ain, Seq("c"), "left")
      .crossJoin(mTwice)
      .select(
        sum(
          col("m2") * coalesce(col("ain"), lit(0L).cast(dec)) - col("tot") * col("tot"))
          .cast(dec)
          .as("qn"))
      .head()
    if (row.isNullAt(0)) java.math.BigDecimal.ZERO else row.getDecimal(0)
  }

  /** Rich-club coefficient (Zhou & Mondragón 2004; Colizza et al. 2006
    * for the normalization caveat) — do high-degree nodes preferentially
    * link to EACH OTHER? φ(k) = 2·E₍>k₎ / (N₍>k₎·(N₍>k₎−1)) over the
    * subgraph induced by nodes of degree > k: the elite-clique signal
    * beside [[degreeAssortativity]]'s one-number mixing coefficient
    * (assortativity averages over the whole graph; the rich-club ladder
    * localizes it to the hubs, where spam rings and co-purchase cliques
    * live).
    *
    * One canonical-edge pass + one degree aggregate; every ladder rung is
    * a CONDITIONAL SUM in the same aggregation (no per-k jobs): an edge
    * counts at rung k iff min(deg_a, deg_b) > k, a node iff deg > k.
    * Exact integers until φ's one division under round(·, 6); rungs with
    * fewer than 2 qualifying nodes emit NULL, never NaN. Output one row
    * per rung: (k, n_nodes, n_edges, phi). */
  def richClub(edges: DataFrame, aCol: String, bCol: String, ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.distinct == ks, "ks must be sorted distinct")
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("dg"))
    val eAggs = ks.map(k =>
      sum(when(least(col("da"), col("db")) > k, 1L).otherwise(0L)).as(s"e_$k"))
    val nAggs = ks.map(k => sum(when(col("dg") > k, 1L).otherwise(0L)).as(s"n_$k"))
    val ek = und
      .join(deg.select(col("id").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("dg").as("db")), Seq("b"))
      .agg(eAggs.head, eAggs.tail: _*)
    val nk = deg.agg(nAggs.head, nAggs.tail: _*)
    val rungs = ks.map(k =>
      struct(lit(k).as("k"), col(s"n_$k").as("n_nodes"), col(s"e_$k").as("n_edges")))
    val out = nk
      .crossJoin(broadcast(ek))
      .select(explode(array(rungs: _*)).as("r"))
      .select(
        col("r.k").as("k"),
        col("r.n_nodes").as("n_nodes"),
        col("r.n_edges").as("n_edges"),
        round(
          when(col("r.n_nodes") >= 2,
            (col("r.n_edges") * 2).cast("double")
              / (col("r.n_nodes").cast("double") * (col("r.n_nodes") - 1).cast("double"))),
          6).as("phi"))
      .orderBy(col("k"))
    val materialized = out.localCheckpoint(true)
    und.unpersist()
    materialized
  }

  def degreeAssortativity(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("dg"))
    val nNodes = deg.count()
    val m = und
      .join(deg.select(col("id").as("a"), col("dg").as("x")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("dg").as("y")), Seq("b"))
      .agg(
        (count(lit(1)) * 2).as("n"),
        sum(col("x") + col("y")).as("sx"),
        sum(col("x") * col("x") + col("y") * col("y")).as("sxx"),
        sum(col("x") * col("y") * 2).as("sxy"))
    val out = m.select(
      lit(nNodes).as("n_nodes"),
      (col("n") / 2).cast("long").as("n_edges"),
      when(
        col("n") * col("sxx") - col("sx") * col("sx") === 0,
        lit(null).cast("double"))
        .otherwise(
          round(
            (col("n") * col("sxy") - col("sx") * col("sx")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
            6))
        .as("assortativity"))
    val materialized = out.localCheckpoint(true)
    und.unpersist()
    materialized
  }

  /** Sampled bounded-distance betweenness centrality (Brandes 2001; the
    * pivot-sampling and k-bounded variants are Brandes 2008 §3) — "which
    * nodes sit on the shortest paths", the broker/bottleneck signal beside
    * PageRank's popularity. From each of the `nSources` smallest node ids
    * (a deterministic pivot set): a forward BFS accumulating shortest-path
    * counts σ level by level, then Brandes' backward dependency pass
    * δ(v) = Σ_{w child} σ(v)/σ(w) · (1 + δ(w)) over the BFS DAG —
    * predecessors of w are exactly its neighbors one level up, so
    * consecutive-level joins ARE the DAG. Paths are truncated at
    * `maxDepth` hops (bounded-distance betweenness): the horizon that
    * makes both work and replay size finite.
    *
    * Exactness: σ are exact integer path counts; each dependency
    * contribution snaps to the 1e-9 grid (scale 9 ⇒ the decimal→double
    * cast back is EXACT, the Similarity/PSI discipline) and δ is an exact
    * decimal sum of snapped terms, so the per-level trajectory replays
    * bit-for-bit in an unrolled CTE; final score = round(Σ_src δ, 6).
    *
    * Scale: per level ONE frontier⋈edges shuffle + an anti-join against
    * the seen set (both keyed, never cross), all sources batched in one
    * DataFrame keyed by src — the standard way Brandes shards on
    * MapReduce; levels and sources are fixed small constants, frontiers
    * are checkpointed so plan depth stays bounded. Returns
    * (id, betweenness) for every node reached with nonzero dependency. */
  def betweennessSampled(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      nSources: Int,
      maxDepth: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(nSources >= 1, s"nSources must be positive, got $nSources")
    require(maxDepth >= 1, s"maxDepth must be positive, got $maxDepth")
    val dec9 = org.apache.spark.sql.types.DecimalType(20, 9)
    val st = IterState(edges, checkpointDir)
    def mat(df: DataFrame): DataFrame = st.mat(df)
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val dir = mat(und.union(und.select(col("b").as("a"), col("a").as("b"))))
    val srcs = dir.select(col("a").as("id")).distinct().orderBy(col("id")).limit(nSources)

    // forward: per-level frontiers carrying exact σ path counts
    var frontier = mat(srcs.select(col("id").as("src"), col("id").as("v"), lit(1L).as("sigma")))
    var seen     = frontier.select(col("src"), col("v"))
    val levels   = scala.collection.mutable.ArrayBuffer(frontier)
    for (_ <- 1 to maxDepth) {
      val next = mat(
        dir
          .join(frontier.select(col("src"), col("v"), col("sigma")), dir("a") === col("v"))
          .select(col("src"), col("b").as("v"), col("sigma"))
          .groupBy(col("src"), col("v"))
          .agg(sum(col("sigma")).as("sigma"))
          .join(seen, Seq("src", "v"), "left_anti"))
      seen = mat(seen.union(next.select(col("src"), col("v"))))
      levels += next
      frontier = next
    }

    // backward: dependency accumulation over consecutive-level DAG joins
    var delta = mat(levels(maxDepth).select(
      col("src"), col("v"), lit(java.math.BigDecimal.ZERO).cast(dec9).as("delta")))
    val deltas = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    deltas += delta
    for (l <- (maxDepth - 1) to 0 by -1) {
      val child = levels(l + 1)
        .join(delta, Seq("src", "v"))
        .select(col("src"), col("v").as("w"), col("sigma").as("sw"), col("delta").as("dw"))
      val contrib = levels(l).as("f")
        .join(dir, col("f.v") === dir("a"))
        .join(child, col("b") === col("w") && col("f.src") === child("src"))
        .select(
          col("f.src").as("src"),
          col("f.v").as("v"),
          round(
            (col("f.sigma").cast("double") / col("sw").cast("double")) *
              (lit(1.0) + col("dw").cast("double")),
            9).cast(dec9).as("c"))
        .groupBy(col("src"), col("v"))
        .agg(sum(col("c")).cast(dec9).as("dsum"))
      delta = mat(
        levels(l)
          .join(contrib, Seq("src", "v"), "left")
          .select(
            col("src"), col("v"),
            coalesce(col("dsum"), lit(java.math.BigDecimal.ZERO).cast(dec9)).as("delta")))
      deltas += delta
    }

    // betweenness: Σ_src δ_src(v) for v ≠ src, exact decimal sum
    val out = deltas
      .map(d => d.filter(col("v") =!= col("src")).select(col("v"), col("delta")))
      .reduce(_ unionAll _)
      .groupBy(col("v").as("id"))
      .agg(round(sum(col("delta")), 6).cast("double").as("betweenness"))
      .filter(col("betweenness") > 0.0)
    mat(out)
  }

  /** Pivot eccentricities within a hop horizon — the diameter/radius
    * probe (iFUB-style pivot sampling; the max over pivots is a DIAMETER
    * LOWER BOUND, the standard cheap estimate): for each of the
    * `nSources` smallest-id pivots, the farthest BFS level reached
    * within `maxDepth` plus the ball size. Shares [[harmonicSampled]]'s
    * forward machinery (one keyed shuffle + seen anti-join per level);
    * all-integer output. Returns (id, eccentricity, n_reached) — note
    * eccentricity is horizon-clipped: a value of `maxDepth` means
    * "at least maxDepth". */
  def eccentricitySampled(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      nSources: Int,
      maxDepth: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(nSources >= 1 && maxDepth >= 1, "nSources and maxDepth must be positive")
    val st = IterState(edges, checkpointDir)
    def mat(df: DataFrame): DataFrame = st.mat(df)
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val dir = mat(und.union(und.select(col("b").as("a"), col("a").as("b"))))
    val srcs = dir.select(col("a").as("id")).distinct().orderBy(col("id")).limit(nSources)
    var frontier = mat(srcs.select(col("id").as("src"), col("id").as("v")))
    var seen     = frontier
    val levels   = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (l <- 1 to maxDepth) {
      val next = mat(
        dir
          .join(frontier.select(col("src"), col("v")), dir("a") === col("v"))
          .select(col("src"), col("b").as("v"))
          .distinct()
          .join(seen, Seq("src", "v"), "left_anti"))
      seen = mat(seen.union(next))
      levels += next.select(col("src"), lit(l).as("lvl"))
      frontier = next
    }
    mat(
      levels
        .reduce(_ unionAll _)
        .groupBy(col("src").as("id"))
        .agg(max(col("lvl")).as("eccentricity"), count(lit(1)).as("n_reached")))
  }

  /** Bounded-round k-truss peeling (Cohen 2008) — the EDGE analog of
    * [[kCore]]: repeatedly drop every edge in fewer than k−2 triangles
    * (its "support"), leaving the subgraph where every surviving edge is
    * embedded in dense mutual-neighbor structure — stricter than k-core
    * (a star survives coring but carries no triangles) and the standard
    * community-kernel/spam-ring extractor one tier up from it.
    *
    * Runs a FIXED `rounds` of peel steps (both engine and replay — the
    * oracle unrolls the same count, so equality is by construction, with
    * post-fixpoint rounds no-ops exactly like the kCore replay; the gate
    * graphs converge well inside the budget). Per round, support comes
    * from degree-ordered compact-forward triangle listing
    * (Σ outdeg² ≤ O(m^1.5) — [[triangleStats]]' orientation argument, a
    * hub's wedges never explode), each triangle crediting its three
    * canonical edges; one keyed aggregation + one join per round, edge
    * set checkpointed. Returns surviving (a, b, support) with support
    * recomputed on the final set. */
  def kTruss(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      k: Int,
      rounds: Int = 6,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val st = IterState(edges, checkpointDir)
    def mat(df: DataFrame): DataFrame = st.mat(df)
    def rankLt(d1: org.apache.spark.sql.Column, i1: org.apache.spark.sql.Column,
               d2: org.apache.spark.sql.Column, i2: org.apache.spark.sql.Column) =
      d1 < d2 || (d1 === d2 && i1 < i2)
    // per-edge triangle support via degree-ordered wedge closing
    def support(e: DataFrame): DataFrame = {
      val deg = e
        .select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("dg"))
      val withDeg = e
        .join(deg.select(col("id").as("a"), col("dg").as("da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("dg").as("db")), Seq("b"))
      val oriented = withDeg
        .select(
          when(rankLt(col("da"), col("a"), col("db"), col("b")), col("a")).otherwise(col("b")).as("u"),
          when(rankLt(col("da"), col("a"), col("db"), col("b")), col("b")).otherwise(col("a")).as("v"),
          when(rankLt(col("da"), col("a"), col("db"), col("b")), col("db")).otherwise(col("da")).as("dv"))
      val tri = oriented.as("x")
        .join(oriented.as("y"),
          col("x.u") === col("y.u") &&
            rankLt(col("x.dv"), col("x.v"), col("y.dv"), col("y.v")))
        .select(col("x.u").as("tu"), col("x.v").as("tv"), col("y.v").as("tw"))
        .join(oriented.select(col("u").as("tv"), col("v").as("tw")), Seq("tv", "tw"))
      tri
        .select(explode(array(
          struct(least(col("tu"), col("tv")).as("a"), greatest(col("tu"), col("tv")).as("b")),
          struct(least(col("tv"), col("tw")).as("a"), greatest(col("tv"), col("tw")).as("b")),
          struct(least(col("tu"), col("tw")).as("a"), greatest(col("tu"), col("tw")).as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("supp"))
    }
    var e = mat(
      edges
        .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    for (_ <- 1 to rounds) {
      val s = support(e)
      e = mat(
        e.join(s, Seq("a", "b"))
          .filter(col("supp") >= k - 2)
          .select(col("a"), col("b")))
    }
    val finalSupp = support(e)
    mat(
      e.join(finalSupp, Seq("a", "b"), "left")
        .select(col("a"), col("b"), coalesce(col("supp"), lit(0L)).as("support")))
  }

  /** Sampled bounded-distance harmonic centrality (Boldi & Vigna 2014 —
    * the closeness variant that handles disconnection gracefully):
    * h(v) = Σ_{pivot s ≠ v} 1/d(s, v), summed over the `nSources`
    * smallest-id pivots within a `maxDepth`-hop horizon — unreached
    * pairs contribute 0 instead of poisoning a mean like closeness does.
    * Shares [[betweennessSampled]]'s forward machinery: per level ONE
    * frontier⋈edges shuffle + a seen-set anti-join, pivots batched by a
    * src key. 1/d snaps to the 1e-12 grid (d is a small positive int),
    * sums are exact decimal, final round(·, 6). Returns (id, harmonic)
    * for every node reached from at least one pivot. */
  def harmonicSampled(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      nSources: Int,
      maxDepth: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(nSources >= 1, s"nSources must be positive, got $nSources")
    require(maxDepth >= 1, s"maxDepth must be positive, got $maxDepth")
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val st = IterState(edges, checkpointDir)
    def mat(df: DataFrame): DataFrame = st.mat(df)
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val dir = mat(und.union(und.select(col("b").as("a"), col("a").as("b"))))
    val srcs = dir.select(col("a").as("id")).distinct().orderBy(col("id")).limit(nSources)
    var frontier = mat(srcs.select(col("id").as("src"), col("id").as("v")))
    var seen     = frontier
    val contribs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (l <- 1 to maxDepth) {
      val next = mat(
        dir
          .join(frontier.select(col("src"), col("v")), dir("a") === col("v"))
          .select(col("src"), col("b").as("v"))
          .distinct()
          .join(seen, Seq("src", "v"), "left_anti"))
      seen = mat(seen.union(next))
      contribs += next.select(
        col("v"),
        round(lit(1.0) / lit(l.toDouble), 12).cast(dec12).as("w"))
      frontier = next
    }
    mat(
      contribs
        .reduce(_ unionAll _)
        .groupBy(col("v").as("id"))
        .agg(round(sum(col("w")), 6).cast("double").as("harmonic")))
  }

  /** k-core decomposition for a fixed k (Seidman 1983; the "dense kernel"
    * extraction behind community seeds, spam-farm detection, and graph
    * sparsification): repeatedly PEEL every node whose current degree is
    * below k — all at once per round, the standard parallel peeling — until
    * the fixpoint, which is the unique maximal subgraph where every node
    * has degree ≥ k. Returns the survivors with their within-core degree:
    * (id, core_degree), all ≥ k.
    *
    * Scale shape: each round is one degree aggregation (map-side combined)
    * plus two left_anti joins against the (usually small, AQE-broadcast)
    * dropped-node set — edges-linear, no pairwise stage; peel rounds are
    * data-bounded (the gate graph converges in ≤ 4) and the edge set is
    * checkpointed every `checkpointInterval` rounds so plan depth stays
    * bounded; the only driver scalar per round is the dropped-node count
    * (the [[bfsLevels]] frontier-empty pattern). The SQL oracle unrolls a
    * fixed round budget — rounds after the fixpoint are no-ops, so engine
    * early-exit and oracle padding agree exactly. */
  def kCore(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      k: Int,
      maxRounds: Int = 32,
      checkpointInterval: Int = 4,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(maxRounds >= 1, s"maxRounds must be positive, got $maxRounds")
    val st = IterState(edges, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    var live = materialize(
      edges
        .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    var lastMat = live
    var round   = 0
    var done    = false
    while (round < maxRounds && !done) {
      val deg = live
        .select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("degree"))
      val drop = deg.filter(col("degree") < k).select(col("id")).cache()
      if (drop.count() == 0L) { drop.unpersist(false); done = true }
      else {
        val nextPlan = live
          .join(drop.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
          .join(drop.withColumnRenamed("id", "b"), Seq("b"), "left_anti")
          .select(col("a"), col("b"))
        round += 1
        if (round % checkpointInterval == 0) {
          val next = materialize(nextPlan)
          release(lastMat)
          lastMat = next
          live = next
        } else live = nextPlan
        drop.unpersist(false)
      }
    }
    val out = live
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("core_degree"))
    val materialized = materialize(out)
    release(lastMat)
    materialized
  }

  /** Strongly connected components of a DIRECTED graph: scc(v) = the
    * minimum node id u with u →* v AND v →* u — the mutual-reachability
    * consolidation that undirected [[connectedComponents]] cannot express
    * (cycle structure: which states of a transition graph can return to
    * each other). Computed from the transitive closure by REACHABILITY
    * DOUBLING: R ← R ∪ R∘R squares the reach radius each round, so
    * ⌈log₂ diameter⌉ rounds suffice; the loop stops early at the exact
    * fix-point (row-count convergence, the [[connectedComponents]]
    * discipline) and `maxRounds` caps it.
    *
    * Scale boundary, stated honestly: the closure materializes REACH PAIRS,
    * Θ(Σ_v |reach(v)|) — the right tool for transition/metadata/state
    * graphs (event types, schema lineage, service call graphs: thousands of
    * nodes, bounded reach), NOT for the billion-node content graph — that
    * regime is [[sccFwBw]], the frontier-BFS forward–backward peeling whose
    * state stays NODE-sized. Rule of thumb: closure when Σ|reach(v)| fits a
    * shuffle (dense mutual reach, small node count — it then needs only
    * ~log₂ diameter rounds), FW–BW when nodes are huge and reach sets would
    * explode. Each round here is one self-join + distinct on the pair key —
    * shuffle-partitioned, no driver data. */
  def stronglyConnectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 8,
      checkpointDir: Option[String] = None): DataFrame = {
    val st = IterState(edges, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)
    val dir = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val nodes = dir.select(col("u").as("id"))
      .union(dir.select(col("v").as("id")))
      .distinct()
    var reach = materialize(
      nodes.select(col("id").as("u"), col("id").as("v")).union(dir).distinct())
    var n     = reach.count()
    var done  = false
    var round = 0
    while (!done && round < maxRounds) {
      val squared = reach.as("x")
        .join(reach.as("y"), col("x.v") === col("y.u"))
        .select(col("x.u").as("u"), col("y.v").as("v"))
        .union(reach)
        .distinct()
      val next = materialize(squared)
      val m    = next.count()
      release(reach)
      reach = next
      done  = m == n
      n     = m
      round += 1
    }
    val mutual = reach.as("f")
      .join(reach.as("b"), col("f.u") === col("b.v") && col("f.v") === col("b.u"))
      .select(col("f.u").as("id"), col("f.v").as("peer"))
    val out = mutual
      .groupBy(col("id"))
      .agg(min(col("peer")).as("scc"))
    val materialized = materialize(out)
    release(reach)
    materialized
  }

  /** Strongly connected components by FORWARD–BACKWARD peeling (Fleischer,
    * Hendrickson & Pınar 2000; the Multistep refinement of Slota et al.
    * 2014) — the SCC algorithm for graphs whose transitive closure would
    * explode: state is always NODE-sized (never reach-pairs, the
    * [[stronglyConnectedComponents]] boundary). Per peel round, every live
    * partition picks its minimum node id as pivot, one batched multi-source
    * BFS follows edges FORWARD from all pivots and one BACKWARD (the same
    * frontier machinery as [[bfsLevels]], keyed by partition so all
    * partitions advance in the same jobs); F ∩ B is exactly the pivot's
    * SCC (emitted with label = pivot, which IS the SCC minimum: the pivot
    * is the partition min and the SCC is contained in the partition), and
    * the remainder splits three ways — F∖SCC, B∖SCC, V∖(F∪B) — each a
    * union of whole SCCs, so they recurse independently as new partition
    * labels (part·4 + 1/2/3, collision-free for ≤ 31 rounds in a long).
    * A TRIM step first peels every node with no in- or no out-edge inside
    * its live partition (a trivial SCC by definition — the standard
    * accelerator that collapses DAG-like regions without BFS work).
    *
    * Output (id, scc = min node id of the component) — identical semantics
    * to [[stronglyConnectedComponents]], verified against it and against a
    * driver-side Kosaraju on random digraphs (GraphSpec), and replayed by
    * the same closure oracle in the gate (same results, different regime).
    *
    * Scale shape: per BFS level ONE frontier⋈edges shuffle + a seen-set
    * anti-join (frontier-sized); per peel round one live-edge semi-join
    * rebuild. Peel rounds are bounded by how many times the pivot's SCC
    * fails to cover its partition — O(log n) expected on random structure
    * (each split strictly removes the pivot's SCC); `maxPeelRounds` /
    * `maxBfsRounds` cap both loops and the operator THROWS on
    * non-convergence rather than emitting partial labels (the
    * [[Dedup.starComponents]] discipline). All state goes through the
    * [[IterState]] local/reliable checkpoint contract. */
  def sccFwBw(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxPeelRounds: Int = 30,
      maxBfsRounds: Int = 64,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxPeelRounds >= 1 && maxPeelRounds <= 31,
      s"maxPeelRounds must be in [1, 31] (partition labels pack into a long), got $maxPeelRounds")
    require(maxBfsRounds >= 1, s"maxBfsRounds must be positive, got $maxBfsRounds")
    val st = IterState(edges, checkpointDir)
    def mat(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    val dirE = mat(
      edges
        .select(col(srcCol).as("a"), col(dstCol).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())

    // multi-source BFS reach over a live (part, a, b) edge set from the
    // per-part pivots; returns the (part, id) reach set including pivots
    def reach(live: DataFrame, pivots: DataFrame, forward: Boolean): DataFrame = {
      val g =
        if (forward) live
        else live.select(col("part"), col("b").as("a"), col("a").as("b"))
      var frontier = mat(pivots.select(col("part"), col("pivot").as("id")))
      var seen     = frontier
      var rounds   = 0
      var done     = frontier.limit(1).isEmpty
      while (!done && rounds < maxBfsRounds) {
        val next = mat(
          g.join(frontier.select(col("part").as("fpart"), col("id").as("fid")),
              g("part") === col("fpart") && g("a") === col("fid"))
            .select(g("part").as("part"), col("b").as("id"))
            .distinct()
            .join(seen, Seq("part", "id"), "left_anti"))
        done = next.limit(1).isEmpty
        if (!done) {
          // the new seen checkpoint COPIES both inputs' rows, so the
          // superseded seen and the consumed frontier can drop their
          // blocks now — without this, a deep BFS holds every level's
          // frontier in executor memory for the whole reach call
          val newSeen = mat(seen.union(next))
          if (!(seen eq frontier)) release(seen)
          release(frontier)
          seen = newSeen
          frontier = next
          rounds += 1
        } else release(next)
      }
      if (!done)
        throw new IllegalStateException(
          s"sccFwBw: BFS did not drain within maxBfsRounds=$maxBfsRounds " +
            "(graph diameter exceeds the budget) — raise maxBfsRounds")
      if (!(frontier eq seen)) release(frontier) // last level's rows live in seen
      seen
    }

    var active = mat(
      dirE.select(col("a").as("id"))
        .union(dirE.select(col("b").as("id")))
        .distinct()
        .select(col("id"), lit(0L).as("part")))
    val emitted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    while (round < maxPeelRounds && !active.limit(1).isEmpty) {
      // live subgraph: edges whose BOTH endpoints are active in the same part
      val live = mat(
        dirE
          .join(active.select(col("id").as("a"), col("part")), Seq("a"))
          .join(active.select(col("id").as("b"), col("part").as("pb")), Seq("b"))
          .filter(col("part") === col("pb"))
          .select(col("part"), col("a"), col("b")))
      // TRIM: a node with no in-edge or no out-edge in its live partition
      // is a singleton SCC — peel without BFS. (Such a node can never sit
      // INSIDE a path either, so leaving its edges in `live` for the BFS
      // below cannot add anyone to F ∩ B.)
      val hasOut = live.select(col("part"), col("a").as("id"))
      val hasIn  = live.select(col("part"), col("b").as("id"))
      val nonTrivial = hasOut.intersect(hasIn)
      val trimmed = active.join(nonTrivial, Seq("part", "id"), "left_anti")
      emitted += mat(trimmed.select(col("id"), col("id").as("scc")))
      val act = mat(active.join(nonTrivial, Seq("part", "id"), "left_semi"))
      release(active)
      if (!act.limit(1).isEmpty) {
        val pivots = mat(act.groupBy(col("part")).agg(min(col("id")).as("pivot")))
        val fwd = reach(live, pivots, forward = true)
        val bwd = reach(live, pivots, forward = false)
        val scc = fwd.join(bwd, Seq("part", "id"), "left_semi")
        emitted += mat(
          scc.join(pivots, Seq("part")).select(col("id"), col("pivot").as("scc")))
        // three-way split of the remainder, each a union of whole SCCs
        val nextActive = act
          .join(scc, Seq("part", "id"), "left_anti")
          .join(fwd.select(col("part"), col("id"), lit(1).as("in_f")), Seq("part", "id"), "left")
          .join(bwd.select(col("part"), col("id"), lit(1).as("in_b")), Seq("part", "id"), "left")
          .select(
            col("id"),
            (col("part") * 4 +
              when(col("in_f") === 1, 1).when(col("in_b") === 1, 2).otherwise(3)).as("part"))
        active = mat(nextActive)
        release(act); release(fwd); release(bwd); release(pivots)
      } else active = act
      release(live)
      round += 1
    }
    if (!active.limit(1).isEmpty)
      throw new IllegalStateException(
        s"sccFwBw did not converge within maxPeelRounds=$maxPeelRounds — " +
          "refusing to emit partial SCC labels")
    val out =
      if (emitted.isEmpty) active.select(col("id"), col("id").as("scc")).limit(0)
      else emitted.reduce(_ unionAll _).select(col("id"), col("scc"))
    val materialized = mat(out)
    release(active)
    // the output checkpoint is self-contained — every per-round emitted
    // frame (and the edge set) can drop its blocks now
    emitted.foreach(release)
    release(dirE)
    materialized
  }

  /** Discrete power-law fit of the degree distribution (Clauset–Shalizi–
    * Newman's continuous-approximation MLE, the standard first read):
    * α̂ = 1 + n / Σ ln(d / (dmin − ½)) over nodes with degree ≥ dmin, with
    * σ = (α̂−1)/√n — the heavy-tail audit that says whether the graph is
    * hub-dominated (α ≲ 2.5: a few hubs carry everything — the salting /
    * broadcast-planning signal) or homogeneous (α ≳ 3.5). Degrees are
    * exact integers from one canonical-edge pass; each ln term snaps to
    * the 1e-12 grid before the exact decimal sum; α̂/σ round at 6. Output
    * one row: (n_nodes, n_tail, dmin, alpha, sigma, dmax). */
  def degreePowerlawFit(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      dmin: Long = 2L): DataFrame = {
    require(dmin >= 1, s"dmin must be positive, got $dmin")
    val dec12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("d"))
    val all = deg.agg(count(lit(1)).as("n_nodes"), max(col("d")).as("dmax"))
    val tail = deg
      .filter(col("d") >= dmin)
      .agg(
        count(lit(1)).as("n_tail"),
        sum(
          round(log(col("d").cast("double") / lit(dmin.toDouble - 0.5)), 12).cast(dec12))
          .cast(dec12).as("slog12"))
    val nD    = col("n_tail").cast("double")
    val alpha = lit(1.0) + nD / col("slog12").cast("double")
    all
      .crossJoin(broadcast(tail))
      .select(
        col("n_nodes"),
        col("n_tail"),
        lit(dmin).as("dmin"),
        round(when(col("slog12").cast("double") > 0.0, alpha), 6).as("alpha"),
        round(when(col("slog12").cast("double") > 0.0, (alpha - lit(1.0)) / sqrt(nD)), 6)
          .as("sigma"),
        col("dmax"))
  }

  /** Condensation of a directed graph: collapse each SCC (from
    * [[stronglyConnectedComponents]]) to one node and count the edges
    * between distinct components — the acyclic "which state clusters feed
    * which" DAG that is the usable summary of any cyclic transition graph
    * (topological order exists on the condensation, never on the raw
    * graph). One edge scan joined twice against the component map
    * (component-count-sized, broadcast), then a component-pair rollup.
    * Inherits the SCC operator's bounded-reach scope. */
  def sccCondense(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val scc = stronglyConnectedComponents(edges, srcCol, dstCol)
    val dir = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    dir
      .join(broadcast(scc.select(col("id").as("u"), col("scc").as("scc_src"))), Seq("u"))
      .join(broadcast(scc.select(col("id").as("v"), col("scc").as("scc_dst"))), Seq("v"))
      .filter(col("scc_src") =!= col("scc_dst"))
      .groupBy(col("scc_src"), col("scc_dst"))
      .agg(count(lit(1)).as("n_edges"))
  }
}
