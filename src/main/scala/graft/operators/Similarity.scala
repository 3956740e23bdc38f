package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * No reference counterpart (SURVEY.md §2e) — north-star extension.
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline. Query set is broadcast; the
  *    corpus streams once; per-partition ranking happens inside the window.
  *    Cost O(|Q|·n·d) — correct answer, fine for small |Q|, the oracle.
  *  - LSH-bucketed (random hyperplane signatures): the 100 TB path. Each
  *    vector gets a deterministic p-bit signature; only same-bucket (or
  *    near-bucket) pairs are scored. Recall is tunable via multiple tables
  *    (independent signature sets).
  *
  * All arithmetic is done in double (cast from float) with sequential
  * left-to-right summation — deterministic, and bit-identical to DuckDB's
  * double-list cosine, which the oracle relies on.
  */
object Similarity {

  /** Dot product of two double-array columns via the native codegen'd
    * VecDot expression (graft.functions) — sequential left-to-right sum,
    * same FP result as the declarative fold but inside WholeStageCodegen's
    * tight loop (the HOF version was the all-pairs bottleneck). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDoubleVec(c: Column): Column = c.cast("array<double>")

  /** Rank scored (query_id, neighbor_id, sim9, sim) candidates to top-k per
    * query. Selection runs through the custom bounded-heap operator
    * (graft.plans.TopKPerGroup): O(n) per partition with O(k·queries)
    * memory, shuffling only k candidates per (query, partition) — never a
    * full per-query sort of the scored set. The row_number window that
    * assigns ranks afterwards only ever sees ≤ k rows per query and reuses
    * the heap shuffle's clustering.
    *
    * Ranking is by cosine rounded to 9 dp with vec_id tiebreak — a total,
    * FP-robust order (1e-15 cross-engine float noise cannot flip a 1e-9
    * bucket except on exact boundaries). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.operators.TopK.perGroup(
      scored,
      groupCols = Seq("query_id"),
      orderCols = Seq("sim9" -> false, "neighbor_id" -> true),
      k = k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim9").desc, col("neighbor_id"))
    top
      .withColumn("rn", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
  }

  /** Exact top-k neighbors for each query vector (brute force over the
    * corpus, bounded-heap selection — the corpus is streamed, never sorted). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms are computed ONCE per side before the join (not per pair); the
    // cosine formula dot/(na*nb) is unchanged, so FP results are identical
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), asDoubleVec(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    rankTopK(
      q.join(c, col("query_id") =!= col("neighbor_id"))
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(sim, 9).as("sim9"),
          round(sim, 6).as("sim")),
      k)
  }

  /** Binary (sign-bit) quantization: dim floats → ⌈dim/64⌉ packed longs,
    * bit j of word w set iff embedding[64w+j] > 0 — the 32×-compression
    * candidate representation modern vector stores default to (hamming
    * distance over packed words ≈ 2 cpu ops/word vs a float dot product).
    * Packing folds Horner-style (acc·2 + bit, high bit first) inside ONE
    * codegen'd aggregate per word — no shift-by-column, no UDF. Bit 63 of
    * a full word is the long's SIGN bit: the Horner fold covers bits
    * 0..62 (its intermediates stay ≤ 2⁶³−1, ANSI-overflow-free) and the
    * top bit adds Long.MinValue separately — the same split the oracle
    * replays, since neither engine allows 1<<63 under checked arithmetic.
    * Output (vec_id, bq: array<bigint>). */
  def binaryQuantize(vectors: DataFrame, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be positive, got $dim")
    val nWords = (dim + 63) / 64
    // In-plan length guard: element_at past the array end returns NULL,
    // which the packing would silently fold to 0-bits — a truncated or
    // corrupt vector must fail loudly, not quantize to a plausible code
    // and degrade recall invisibly (the weightedSample raise_error
    // discipline). Guarded vector gets its OWN projection so the Horner
    // lambdas slice an attribute, not a re-evaluated size() check.
    val raw = asDoubleVec(col("embedding"))
    val guarded = vectors.select(
      col("vec_id"),
      when(size(raw) >= lit(dim), raw)
        .otherwise(raise_error(concat(
          lit(s"binaryQuantize: embedding shorter than dim=$dim (size="),
          size(raw).cast("string"), lit(") at vec_id="), col("vec_id").cast("string"))))
        .as("__emb"))
    val emb = col("__emb")
    def bit(j0: Int): Column = element_at(emb, lit(j0 + 1)) > lit(0.0) // absolute 0-based
    val words = (0 until nWords).map { w =>
      val lo   = w * 64
      val hi   = math.min(lo + 63, dim - 1)
      val full = hi - lo == 63
      val bodyHi = if (full) hi - 1 else hi
      val horner = aggregate(
        sequence(lit(bodyHi), lit(lo), lit(-1)), // high bit first
        lit(0L),
        (acc, j) => acc * 2 + when(element_at(emb, j.cast("int") + 1) > lit(0.0), 1L).otherwise(0L))
      if (full) horner + when(bit(hi), lit(Long.MinValue)).otherwise(lit(0L)) else horner
    }
    guarded.select(col("vec_id"), array(words: _*).as("bq"))
  }

  /** Top-k by BINARY-QUANTIZED candidate generation + exact rerank — the
    * cheap-candidate regime between [[bruteTopK]] (exact but float-heavy)
    * and [[ivfTopK]] (cell-pruned): hamming distance over the packed sign
    * bits scans 32× fewer bytes than the float corpus, the bounded heap
    * keeps the best `candidates` per query (ham asc, id asc — total
    * order), and only those rerank with the EXACT cosine, so the emitted
    * scores are true similarities (approximation lives only in which
    * candidates survive; SimilaritySpec pins recall vs [[bruteTopK]]).
    * Deterministic end to end — no trained state at all, which is the
    * operational argument for BQ as the first ANN tier: nothing to fit,
    * nothing to drift. Composes with IVF at extreme scale (quantize per
    * cell and probe as usual); queries broadcast, corpus streams once. */
  def bqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      dim: Int,
      k: Int,
      candidates: Int): DataFrame = {
    require(k >= 1 && candidates >= k, s"need candidates >= k >= 1, got $candidates/$k")
    val cb = binaryQuantize(corpus, dim).select(col("vec_id").as("neighbor_id"), col("bq").as("cbq"))
    val qb = broadcast(
      binaryQuantize(queries, dim).select(col("vec_id").as("query_id"), col("bq").as("qbq")))
    val ham = aggregate(
      zip_with(col("cbq"), col("qbq"), (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0),
      (acc, h) => acc + h)
    val cand = graft.operators.TopK.perGroup(
      cb.join(qb, col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), ham.as("hamming")),
      groupCols = Seq("query_id"),
      orderCols = Seq("hamming" -> true, "neighbor_id" -> true),
      k = candidates)
    val qv = broadcast(
      queries
        .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv"))))
    val cv = corpus
      .select(col("vec_id").as("neighbor_id"), asDoubleVec(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    rankTopK(
      cand.select(col("query_id"), col("neighbor_id"))
        .join(qv, Seq("query_id"))
        .join(cv, Seq("neighbor_id"))
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(sim, 9).as("sim9"),
          round(sim, 6).as("sim")),
      k)
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998) —
    * the DIVERSIFIED top-k every retrieval-for-training pipeline needs
    * once plain top-k starts returning near-duplicates: greedily pick the
    * candidate maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) against
    * the already-selected set S.
    *
    * Split into the distributed stage and the inherently sequential one:
    * relevance scoring + the top-`poolSize` pool cut + all pairwise pool
    * similarities run as Spark plans (the corpus is streamed once through
    * the bounded-heap top-k; the pool pair grid is poolSize²-bounded);
    * the greedy k-step selection itself folds DRIVER-SIDE over the
    * collected pool (a model-bounded collect — poolSize² rows, the
    * reranker-serving shape; k-means cells and kNN serving make the same
    * judgment). Every quantity the selection compares sits on the 1e-9
    * decimal grid (rel9/sim9 rounded before use, each step's score
    * re-snapped after the fixed-order λ-blend), ties break on vec_id —
    * the whole trajectory replays as unrolled argmax CTEs.
    *
    * First pick maximizes rel alone (max-sim over the empty set is 0 by
    * convention). Output: (rank, vec_id, rel9, score9) for the k picks. */
  def mmrSelect(
      corpus: DataFrame,
      queryId: Long,
      poolSize: Int,
      k: Int,
      lambda: Double): DataFrame = {
    require(poolSize >= k && k >= 1, s"need poolSize >= k >= 1, got $poolSize/$k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(
      corpus.filter(col("vec_id") === queryId)
        .select(asDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv"))))
    val c = corpus.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), asDoubleVec(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val rel = q.crossJoin(c)
      .select(col("vec_id"), round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("rel9"))
    val pool = graft.operators.TopK
      .perGroup(
        rel.withColumn("g", lit(1)), groupCols = Seq("g"),
        orderCols = Seq("rel9" -> false, "vec_id" -> true), k = poolSize)
      .select(col("vec_id"), col("rel9"))
    val pv = pool
      .join(c.select(col("vec_id"), col("cv"), col("cn")), Seq("vec_id"))
    val sims = pv.as("x")
      .join(pv.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(dot(col("x.cv"), col("y.cv")) / (col("x.cn") * col("y.cn")), 9).as("sim9"))
    // model-bounded collects: poolSize rows + poolSize^2/2 sims
    val cand = pool.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val simM = sims.collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getDouble(2),
        (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    def snap9(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ cand.keys
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val best = remaining
        .map { id =>
          val maxSim = if (selected.isEmpty) 0.0
          else selected.map(s => simM.getOrElse((id, s._2), 0.0)).max
          (id, snap9(lambda * cand(id) - (1.0 - lambda) * maxSim))
        }
        .minBy { case (id, score) => (-score, id) }
      selected += ((rank, best._1, cand(best._1), best._2))
      remaining -= best._1
      rank += 1
    }
    selected.toSeq.toDF("rank", "vec_id", "rel9", "score9")
  }

  /** DBSCAN density clustering over the embedding space (Ester et al.
    * 1996), COMPOSED from the engine's verified primitives: the
    * ε-neighbor graph is [[cosineDupPairs]] at `simThreshold` (exact
    * below the gate, LSH-bucketed + exact-verified at scale), core points
    * have ≥ `minPts` neighbors, clusters are connected components of the
    * core-core subgraph (Dedup.duplicateClusters — driver union-find
    * small, large-star/small-star at scale), border points attach to the
    * SMALLEST cluster label among their core neighbors (a total order —
    * DBSCAN's border assignment is famously order-dependent; this makes
    * it deterministic), and everything else is noise. All decisions are
    * exact integer/label comparisons on top of the round-6 similarity
    * gate, so the whole clustering replays. Returns one row per vector:
    * (vec_id, role ∈ core|border|noise, cluster_id — NULL for noise;
    * an isolated core anchors its own singleton cluster). */
  /** SIMPLIFIED SILHOUETTE cluster-quality audit (Hruschka et al. 2004 —
    * the O(n·k) variant of Rousseeuw 1987 that swaps all-pairs distances
    * for centroid distances, the only silhouette that scales): per vector,
    * a = distance to its own final centroid, b = min distance to any other
    * centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; per-cluster mean s is the
    * "did k make sense" read (near 0 = overlapping clusters, negative =
    * misassigned mass). Runs the SAME deterministic k-means as
    * cluster_kmeans, so the replay composes the proven unrolled-Lloyd
    * oracle.
    *
    * Exactness: distances reuse the (v−c)² sequential left fold the
    * k-means oracle already proves bit-equal; each s snaps to the 1e-9
    * grid and cluster means are exact DECIMAL sums with one final rounded
    * division. Scale: one crossjoin of vectors × the k-row broadcast
    * centroid frame (O(n·k), the algorithm's own cost), one per-vector
    * aggregate, k-row output. */
  def kmeansSilhouette(
      vectors: DataFrame,
      k: Int,
      maxIter: Int = 10,
      tol: Double = 0.0): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val r = kmeans(vectors, k, maxIter, tol)
    val cents = r.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cluster", "cv")
    // the kmeans prep arithmetic, reproduced: norm = sequential √Σt², x/n
    val prep = vectors
      .select(col("vec_id"), asDoubleVec(col("embedding")).as("v0"))
      .withColumn("nrm", norm(col("v0")))
      .select(
        col("vec_id"),
        when(col("nrm") > 0, transform(col("v0"), x => x / col("nrm")))
          .otherwise(col("v0")).as("v"))
    val d2 = expr(
      """aggregate(sequence(1, size(v)), 0D,
        |  (acc, i) -> acc + (element_at(v, i) - element_at(cv, i)) * (element_at(v, i) - element_at(cv, i)))""".stripMargin)
    val ab = prep
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cluster"), d2.as("d2"))
      .join(r.assignments.select(col("vec_id"), col("cluster").as("own")), Seq("vec_id"))
      .groupBy(col("vec_id"), col("own"))
      .agg(
        max(when(col("cluster") === col("own"), col("d2"))).as("a2"),
        min(when(col("cluster") =!= col("own"), col("d2"))).as("b2"))
    val sRaw = (sqrt(col("b2")) - sqrt(col("a2"))) /
      greatest(sqrt(col("a2")), sqrt(col("b2")))
    val s9 = round(
      when(coalesce(greatest(sqrt(col("a2")), sqrt(col("b2"))), lit(0.0)) === 0.0, lit(0.0))
        .otherwise(sRaw), 9)
      .cast(org.apache.spark.sql.types.DecimalType(12, 9))
    ab.select(col("own").as("cluster"), s9.as("s9"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(sum(col("s9")).cast("double") / count(lit(1)), 6).as("mean_silhouette"))
  }

  def dbscan(
      vectors: DataFrame,
      simThreshold: Double,
      minPts: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(minPts >= 1, s"minPts must be positive, got $minPts")
    val st = IterState(vectors, checkpointDir)
    val pairs = st.mat(
      cosineDupPairs(vectors, simThreshold)
        .select(col("a_id"), col("b_id")))
    val und = pairs
      .select(col("a_id").as("id"), col("b_id").as("nb"))
      .unionAll(pairs.select(col("b_id").as("id"), col("a_id").as("nb")))
    val deg  = und.groupBy(col("id")).agg(count(lit(1)).as("nn"))
    val core = deg.filter(col("nn") >= minPts).select(col("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("a_id")), Seq("a_id"))
      .join(core.select(col("id").as("b_id")), Seq("b_id"))
    val ccLabels = Dedup
      .duplicateClusters(coreEdges, checkpointDir = checkpointDir)
      .select(col("doc_id").as("id"), col("cluster_id"))
    // isolated cores (no core neighbor) anchor their own singleton cluster
    val coreLabels = st.mat(
      core
        .join(ccLabels, Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id")))
    val borderLabels = und
      .join(core.select(col("id").as("nb")), Seq("nb"))            // neighbor is core
      .join(core, Seq("id"), "left_anti")                          // self is not
      .join(coreLabels.select(col("id").as("nb"), col("cluster_id")), Seq("nb"))
      .groupBy(col("id"))
      .agg(min(col("cluster_id")).as("cluster_id"))
    vectors
      .select(col("vec_id"))
      .join(coreLabels.select(col("id").as("vec_id"), col("cluster_id").as("core_cl")), Seq("vec_id"), "left")
      .join(borderLabels.select(col("id").as("vec_id"), col("cluster_id").as("border_cl")), Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        when(col("core_cl").isNotNull, lit("core"))
          .when(col("border_cl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("core_cl"), col("border_cl")).as("cluster_id"))
  }

  /** Matryoshka truncation audit (Kusupati et al. 2022): recall@k of
    * brute-force cosine over the embedding's first `d` components against
    * the full-dimension truth, for each d in `dims` — the measurement
    * behind serving MRL embeddings at a fraction of the storage/compute
    * (prefix dims carry most of the signal IF the embedding was trained
    * that way; this audit is how you check yours was). Each truncated run
    * is [[bruteTopK]] on sliced vectors — same exact cosine, same
    * (round-9 sim desc, neighbor_id) ranking — and the overlap against
    * the full-dim top-k is exact integer counting with one division
    * under round(·, 6). Query side broadcasts; corpus scans once per
    * dim (dims is a handful — the audit shape, not the serving path).
    * Returns (dims, query_id, hits, recall). */
  def matryoshkaRecall(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty, "need at least one truncation dim")
    val truth = bruteTopK(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"))
    val runs = dims.map { d =>
      bruteTopK(
        corpus.withColumn("embedding", slice(col("embedding"), 1, d)),
        queries.withColumn("embedding", slice(col("embedding"), 1, d)),
        k)
        .select(lit(d).as("dims"), col("query_id"), col("neighbor_id"))
    }
    runs
      .reduce(_ unionAll _)
      .join(truth.withColumn("hit", lit(1L)), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("dims"), col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(
        col("dims"),
        col("query_id"),
        col("hits"),
        round(col("hits").cast("double") / lit(k.toDouble), 6).as("recall"))
  }

  /** p-bit random-hyperplane signature per vector, for `tables` independent
    * hash tables. Returns (vec_id, table, bucket). One HyperplaneSig
    * expression computes every table's bucket in a single pass — plane
    * signs are derived deterministically inside the expression (an earlier
    * literal-plane-matrix formulation put ~5k literals in the plan and made
    * PLANNING the dominant cost). Dimensionality is taken from the data. */
  def hyperplaneBuckets(vectors: DataFrame, bits: Int = 16, tables: Int = 4): DataFrame =
    vectors
      .select(
        col("vec_id"),
        posexplode(graft.functions.VectorFunctions.hyperplane_sig(col("embedding"), bits, tables)))
      .select(col("vec_id"), col("pos").as("table"), col("col").as("bucket"))

  /** Multi-probe expansion of a signature bucket: every bucket within
    * hamming distance <= `radius` of the query's own. Standard multi-probe
    * LSH — the near neighbors a query misses are overwhelmingly in buckets
    * that differ by one or two sign bits, so probing them buys the recall
    * of many extra tables for the cost of a few extra (tiny) bucket reads.
    * QUERY-side only: the corpus still stores exactly one bucket per table,
    * so index size and the equi-join shape are unchanged at any scale. */
  private def probeBuckets(bucket: Column, bits: Int, radius: Int): Column = {
    require(radius >= 0 && radius <= 2, s"probe radius 0..2 supported, got $radius")
    // the hamming ball around 0 depends only on (bits, radius): precompute
    // the XOR masks on the driver and expand with a native HOF over the
    // literal array — no per-row UDF, stays inside Catalyst
    val masks = scala.collection.mutable.ArrayBuffer(0L)
    if (radius >= 1) for (i <- 0 until bits) masks += (1L << i)
    if (radius >= 2) for (i <- 0 until bits; j <- (i + 1) until bits) masks += ((1L << i) | (1L << j))
    transform(lit(masks.toArray), m => bucket.bitwiseXOR(m))
  }

  /** ANN top-k via LSH: score only candidates sharing a (multi-probed)
    * bucket in any table, exact cosine on that candidate set. Recall < 1 by
    * design; rows-only checked (the exact contract is [[bruteTopK]]).
    *
    * Query-cardinality contract: the QUERY side is broadcast, including its
    * multi-probe expansion — tables × ball(bits, radius) rows per query
    * (e.g. 37× at bits=8/radius=2, 137× at bits=16/radius=2). That is the
    * right shape for the retrieve-few-against-many workload this serves
    * (|Q| up to ~10⁵); for a QUERY SET approaching corpus scale, broadcast
    * stops being the right plan regardless of expansion — self-join via
    * [[cosineDupPairsBucketed]] is that workload's shape. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      bits: Int = 12,
      tables: Int = 6,
      probeHamming: Int = 1): DataFrame = {
    val cb = hyperplaneBuckets(corpus, bits, tables)
      .withColumnRenamed("vec_id", "neighbor_id")
    val qb = broadcast(
      hyperplaneBuckets(queries, bits, tables)
        .withColumn("bucket", explode(probeBuckets(col("bucket"), bits, probeHamming)))
        .withColumnRenamed("vec_id", "query_id"))
    val candidates = qb
      .join(cb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), asDoubleVec(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    rankTopK(
      candidates
        .join(q, Seq("query_id"))
        .join(c, Seq("neighbor_id"))
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(sim, 9).as("sim9"),
          round(sim, 6).as("sim")),
      k)
  }

  /** k-means coarse quantizer trained DRIVER-LOCALLY on a deterministic
    * sample (hash-ordered top-`sampleN` — a TakeOrdered, no full shuffle):
    * the standard IVF recipe (FAISS trains on ~256·nlist points). At 100 TB
    * the cluster never iterates — one O(n log s) sampling pass, then Lloyd's
    * on ≤ sampleN×dims doubles in driver memory. Deterministic: hash order
    * and farthest-point-style init are seed-free functions of the data. */
  /** L2-normalize in place (zero vectors pass through). The quantizer and
    * cell assignment work on UNIT vectors: search ranks by cosine, and on
    * the unit sphere L2² = 2·(1−cos), so normalized-L2 cells are exactly
    * cosine cells — unnormalized L2 cells disagree with cosine whenever
    * vector norms vary, which was the main IVF recall leak. */
  private[graft] def normalized(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < v.length) { v(i) /= n; i += 1 } }
    v
  }

  def trainCoarseQuantizer(
      corpus: DataFrame,
      nlist: Int,
      sampleN: Int,
      iters: Int = 10): Array[Array[Double]] = {
    // mix64(vec_id), not xxhash64: same uniform-draw property, but the
    // hash replays in SQL — with it, the whole sampled trainer (sample
    // set, iteration order, every double add) is engine-replayable, which
    // is what lets ann_ivf_topk / ann_ivf_int8 / ann_recall_audit carry
    // full DuckDB oracles despite being "approximate" (they are
    // approximate versus brute force, never nondeterministic).
    val sample: Array[Array[Double]] = corpus
      .select(
        asDoubleVec(col("embedding")).as("v"),
        graft.functions.TextFunctions.mix64(col("vec_id")).as("h"))
      .orderBy(col("h"), col("v")(0))
      .limit(sampleN)
      .collect()
      .map(r => normalized(r.getSeq[Double](0).toArray))
    if (sample.isEmpty) return Array(Array.empty[Double])
    val kk = math.min(nlist, sample.length)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    // init: first kk sample points in hash order (hash order ≈ uniform draw)
    val centroids = Array.tabulate(kk)(i => sample(i).clone())
    var it = 0
    while (it < iters) {
      val sums   = Array.fill(kk)(new Array[Double](sample.head.length))
      val counts = new Array[Long](kk)
      sample.foreach { v =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < kk) { val d = d2(v, centroids(c)); if (d < bd) { bd = d; best = c }; c += 1 }
        counts(best) += 1
        val s = sums(best); var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) { var i = 0; while (i < centroids(c).length) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 } }
        c += 1 // empty cell keeps its previous centroid
      }
      it += 1
    }
    centroids
  }

  /** IVF-style ANN: a k-means coarse quantizer assigns every vector to its
    * nearest of `nlist` centroids; a query scores only vectors in its
    * `nprobe` closest cells, exact-cosine-reranked. The second standard ANN
    * shape next to [[lshTopK]] — at 100 TB the centroid model is tiny
    * (nlist × dims doubles, broadcast) and the probed fraction is
    * nprobe/nlist of the corpus.
    */
  /** Assign vectors to their `assign` nearest centroid cells: the
    * INDEX-BUILD step, reusable incrementally — new vectors are assigned
    * with the stored centroid model, no retraining (write the output per
    * batch; the centroids array is the tiny persistent model).
    *
    * `assign > 1` is corpus-side multi-assignment: a vector near a cell
    * boundary is indexed into each of its closest cells, so a query probing
    * either side still finds it. Index size scales ×assign (storage), but
    * probe cost per query is unchanged — the standard recall lever when the
    * corpus has weak cluster structure. */
  /** Indices of the `m` nearest centroids to unit vector `u`, ascending by
    * (distance, index) — a BOUNDED insertion selection, O(nlist·m) with a
    * tiny m instead of sorting all nlist distances per row. Tie behavior
    * matches the stable `sortBy(distance).take(m)` it replaces: equal
    * distances keep ascending-index order, and a boundary tie keeps the
    * incumbent (lower index). nlist can now grow (√n cells at corpus
    * scale) without the probe cost growing n·log n per row. */
  // private[graft]: SimilaritySpec pins the codegen'd VecNearestCells
  // expression bit-equal to this reference implementation (incl. ties)
  private[graft] def nearestCells(u: Array[Double], centroids: Array[Array[Double]], m: Int): Seq[Int] = {
    val mm    = math.min(math.max(m, 1), centroids.length)
    val dBest = new Array[Double](mm)
    val iBest = new Array[Int](mm)
    var size  = 0
    var c     = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val ctr = centroids(c)
      while (i < u.length) { val x = u(i) - ctr(i); d += x * x; i += 1 }
      if (size < mm) {
        var p = size
        while (p > 0 && dBest(p - 1) > d) { dBest(p) = dBest(p - 1); iBest(p) = iBest(p - 1); p -= 1 }
        dBest(p) = d; iBest(p) = c; size += 1
      } else if (d < dBest(mm - 1)) {
        var p = mm - 1
        while (p > 0 && dBest(p - 1) > d) { dBest(p) = dBest(p - 1); iBest(p) = iBest(p - 1); p -= 1 }
        dBest(p) = d; iBest(p) = c
      }
      c += 1
    }
    iBest.take(size).toSeq
  }

  def ivfAssign(corpus: DataFrame, centroids: Array[Array[Double]], assign: Int = 1): DataFrame = {
    // native codegen'd probe (graft.functions.VecNearestCells): same cosine
    // cells as the quantizer, same tie semantics as the old ScalaUDF, no
    // per-row Seq[Double] boxing
    def cellsOf(c: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.vec_nearest_cells(c, centroids, assign)
    corpus
      .select(col("vec_id").as("neighbor_id"), asDoubleVec(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("cell", explode(cellsOf(col("cv"))))
  }

  /** SERVE step over a prebuilt cell index — [[ivfAssign]] output, fresh
    * or RELOADED from storage (the index lifecycle: train the tiny
    * centroid model once, `ivfAssign` batches as they arrive, persist
    * (cell, neighbor_id, cv, cn) via the catalog, then answer queries from
    * the stored index with this method — no corpus access, no retraining).
    * Probes each query's `nprobe` nearest cells and exact-cosine-reranks
    * candidates against the full-precision vectors carried IN the index. */
  def ivfSearch(
      cellIndex: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Double]],
      k: Int,
      nprobe: Int = 4): DataFrame = {
    def probesOf(c: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.vec_nearest_cells(c, centroids, nprobe)
    val qprobe = broadcast(
      queries
        .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qv"))
        .withColumn("cell", explode(probesOf(col("qv"))))
        .select(col("query_id"), col("cell")))
    // with multi-assignment a (query, neighbor) pair can meet in several
    // shared cells — dedupe BEFORE ranking or row_number counts duplicates
    val candidates = qprobe
      .join(cellIndex.select(col("cell"), col("neighbor_id")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()

    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv"))))
    // full-precision vectors ride the index rows; a multi-assigned vector
    // appears once per cell with identical (cv, cn). Dedupe AFTER scoring
    // on the scalar (query, neighbor, sim) rows — a plain hash aggregate —
    // NOT via dropDuplicates over the array payload, which plans as a
    // SortAggregate and sorts the candidate set the heap exists to avoid
    val c   = cellIndex.select(col("neighbor_id"), col("cv"), col("cn"))
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val scored = candidates
      .join(q, Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(round(sim, 9)).as("sim9"), max(round(sim, 6)).as("sim"))
    rankTopK(scored, k)
  }

  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      assign: Int = 2): DataFrame = {
    val centroids = trainCoarseQuantizer(corpus, nlist, sampleN = 256 * nlist)
    ivfSearch(ivfAssign(corpus, centroids, assign), queries, centroids, k, nprobe)
  }

  /** IVF over an int8-quantized index with exact rerank — the memory/IO
    * variant of [[ivfTopK]] for corpora where even the probed cells'
    * full-precision vectors dominate cost. The resident index row is
    * (id, cell, scale, q8 bytes): d + 16 bytes per vector instead of 8d —
    * ~7× less to store, scan, and shuffle at d=64, the standard
    * SQ8 recipe (FAISS IndexIVFScalarQuantizer).
    *
    * Search: probe nprobe cells, score candidates with the CODEGEN'd
    * integer dot (cos ≈ s_q·s_c·dotq8 on unit vectors, error ~1e-2),
    * bounded-heap a `rerank`·k shortlist per query, then exact-cosine
    * rerank ONLY the shortlist against full-precision vectors — a
    * shortlist-sized keyed join, so the 8d-byte vectors are touched for
    * rerank·k rows per query, never per candidate. Quantization error
    * only costs recall when the true #k and the #(rerank·k) quantized
    * scores differ by more than the error — the spec pins recall ≥ 0.9 at
    * gate settings. */
  def ivfTopKQ8(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      assign: Int = 2,
      rerank: Int = 4): DataFrame =
    ivfServeQ8(
      trainCoarseQuantizer(corpus, nlist, sampleN = 256 * nlist),
      corpus,
      queries,
      k,
      nprobe,
      assign,
      rerank)

  /** [[ivfTopKQ8]] with a caller-supplied centroid model — the serve step
    * decoupled from training, mirroring [[ivfSearch]]'s lifecycle split
    * (train once — sampled or the deterministic [[kmeans]] — then build
    * and serve the quantized index from the stored model). */
  def ivfServeQ8(
      centroids: Array[Array[Double]],
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      assign: Int,
      rerank: Int): DataFrame = {
    import graft.functions.VectorFunctions.{vec_dot_q8, vec_q8}

    // the quantized resident index: unit-normalize (cosine contract), then
    // int8-quantize; full-precision cv/cn are dropped before the join
    def q8(v: Column, n: Column): Column =
      vec_q8(when(n > 0, transform(v, x => x / n)).otherwise(v))
    val index = ivfAssign(corpus, centroids, assign)
      .withColumn("cq8", q8(col("cv"), col("cn")))
      .select(
        col("neighbor_id"),
        col("cell"),
        col("cq8.scale").as("cscale"),
        col("cq8.q").as("cq"))

    def probesOf(c: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.vec_nearest_cells(c, centroids, nprobe)
    val qprep = queries
      .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val qprobe = broadcast(
      qprep
        .withColumn("qq8", q8(col("qv"), col("qn")))
        .select(
          col("query_id"),
          explode(probesOf(col("qv"))).as("cell"),
          col("qq8.scale").as("qscale"),
          col("qq8.q").as("qq")))

    // quantized scoring: integer dot in codegen; multi-assign duplicates
    // carry identical scores, so a plain per-(query, neighbor) dedup after
    // scoring is exact
    val scored = qprobe
      .join(index, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        (col("qscale") * col("cscale") * vec_dot_q8(col("qq"), col("cq"))).as("simq"))
      .dropDuplicates("query_id", "neighbor_id")
    val shortlist = graft.operators.TopK.perGroup(
      scored,
      groupCols = Seq("query_id"),
      orderCols = Seq("simq" -> false, "neighbor_id" -> true),
      k = math.max(rerank, 1) * k)

    // exact rerank of the shortlist only — full-precision vectors enter
    // here, keyed by the shortlist's ids
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), asDoubleVec(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    rankTopK(
      shortlist
        .select(col("query_id"), col("neighbor_id"))
        .join(broadcast(qprep), Seq("query_id"))
        .join(c, Seq("neighbor_id"))
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(sim, 9).as("sim9"),
          round(sim, 6).as("sim")),
      k)
  }

  /** Gate-visible ANN recall audit: overlap of each approximate index's
    * top-k against [[bruteTopK]] ground truth, computed IN Spark so the
    * recall numbers ride the correctness artifact instead of living only
    * in ScalaTest. One row per method: (method, n_true, n_hits, recall).
    *
    * Fully SQL-oracled: every method here is approximate versus brute
    * force but DETERMINISTIC — the LSH planes are derandomized splitmix64
    * and the sampled IVF trainer draws by mix64(vec_id) — so the driver
    * replays each method's entire pipeline in DuckDB and hash-checks the
    * overlap counts; SimilaritySpec additionally pins recall ≥ 0.9 per
    * method and audit ≡ an independently computed overlap. Scale shape:
    * truth is
    * k·|queries| rows (bounded), every join here is against that bounded
    * set — the expensive parts are the underlying index searches
    * themselves. */
  def recallAudit(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int,
      nprobe: Int,
      assign: Int,
      rerank: Int,
      bits: Int,
      tables: Int,
      probeHamming: Int): DataFrame = {
    val truth = bruteTopK(corpus, queries, k).select(col("query_id"), col("neighbor_id"))
    def audit(method: String, approx: DataFrame): DataFrame = {
      val hits = approx
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
      truth
        .agg(count(lit(1)).as("n_true"))
        .crossJoin(hits)
        .select(
          lit(method).as("method"),
          col("n_true"),
          col("n_hits"),
          round(col("n_hits").cast("double") / col("n_true"), 6).as("recall"))
    }
    audit("ivf", ivfTopK(corpus, queries, k, nlist, nprobe, assign))
      .unionAll(audit("ivf_int8", ivfTopKQ8(corpus, queries, k, nlist, nprobe, assign, rerank)))
      .unionAll(audit("lsh", lshTopK(corpus, queries, k, bits, tables, probeHamming)))
  }

  /** Closed-loop ANN tuning — the ACTION on [[recallAudit]]'s measurement,
    * the same audit→action discipline [[graft.operators.Skew.autoSaltedAgg]]
    * applies to ANALYZE's skew stats: walk nprobe up a doubling ladder
    * (1, 2, 4, …, capped at nlist) and stop at the FIRST rung whose
    * measured IVF recall against the brute-force truth meets
    * `recallTarget`. Returns (chosen nprobe, walk trace) — one audit row
    * per rung actually probed, `chosen = true` on the stopping rung.
    *
    * Deterministic end to end (sampled trainer seeded by mix64(vec_id),
    * every rung's search and overlap exact), so the early-stopped walk is
    * replayable — the gate row's DuckDB oracle recomputes every rung's
    * recall and applies the same stop rule. nprobe = nlist probes every
    * cell, which recovers the brute candidate set and recall 1.0, so the
    * walk always terminates chosen for any target ≤ 1.
    *
    * Cost shape: the truth (nQueries·k rows) and the assigned index are
    * materialized ONCE and reused across rungs (the fan-out checkpoint
    * discipline); each rung is one cell-probed search + a counted join —
    * ≤ log₂(nlist)+1 rungs, and the driver reads one 3-column audit row
    * per rung to decide the next step, never data. The recall the
    * decision consumes is computed IN-PLAN with the same round(·, 6) the
    * audit publishes, so the stop rule and the trace can never disagree. */
  /** [[autoProbe]]'s LSH sibling: walk the multi-probe Hamming RADIUS up
    * from 0 and stop at the first radius whose measured recall-vs-brute
    * meets the target. Each +1 of radius expands every query's probe ball
    * (1, 1+bits, 1+bits+C(bits,2), …), so the ladder is the natural
    * cost/recall dial LSH exposes — unlike IVF there is no "probe
    * everything" rung that guarantees recall 1.0, so the walk can END
    * UNCHOSEN at `maxRadius` (chosen = -1, trace still emitted: the
    * honest "this index can't reach that target, re-index with more
    * tables/bits" answer rather than a silent best-effort). Same
    * discipline as [[autoProbe]]: truth materialized once, in-plan
    * round(·, 6) recall drives both the stop rule and the trace. */
  def autoProbeLsh(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      recallTarget: Double,
      bits: Int = 8,
      tables: Int = 12,
      maxRadius: Int = 2): (Int, DataFrame) = {
    require(recallTarget > 0.0 && recallTarget <= 1.0,
      s"recallTarget must be in (0, 1], got $recallTarget")
    require(maxRadius >= 0 && maxRadius <= 2,
      s"maxRadius must be in 0..2 (lshTopK's supported probe radii), got $maxRadius")
    val spark = corpus.sparkSession
    import spark.implicits._
    val truth = bruteTopK(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(eager = true)
    val trace  = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Double, Boolean)]
    var chosen = -1
    var radius = 0
    while (chosen < 0 && radius <= maxRadius) {
      val row = lshTopK(corpus, queries, k, bits, tables, probeHamming = radius)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
        .select(
          col("n_true"),
          col("n_hits"),
          round(col("n_hits").cast("double") / col("n_true"), 6).as("recall"))
        .head()
      val recall = row.getDouble(2)
      val hit    = recall >= recallTarget
      trace += ((radius, row.getLong(0), row.getLong(1), recall, hit))
      if (hit) chosen = radius
      radius += 1
    }
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(truth)
    (chosen, trace.toSeq.toDF("radius", "n_true", "n_hits", "recall", "chosen"))
  }

  def autoProbe(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      recallTarget: Double,
      nlist: Int = 16,
      assign: Int = 2): (Int, DataFrame) = {
    require(recallTarget > 0.0 && recallTarget <= 1.0,
      s"recallTarget must be in (0, 1], got $recallTarget")
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = trainCoarseQuantizer(corpus, nlist, sampleN = 256 * nlist)
    val index = ivfAssign(corpus, centroids, assign).localCheckpoint(eager = true)
    val truth = bruteTopK(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(eager = true)
    val ladder = (Iterator.iterate(1)(_ * 2).takeWhile(_ < nlist).toSeq :+ nlist).distinct
    val trace  = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Double, Boolean)]
    var chosen = -1
    val rungs  = ladder.iterator
    while (chosen < 0 && rungs.hasNext) {
      val p = rungs.next()
      val row = ivfSearch(index, queries, centroids, k, p)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
        .select(
          col("n_true"),
          col("n_hits"),
          round(col("n_hits").cast("double") / col("n_true"), 6).as("recall"))
        .head()
      val recall = row.getDouble(2)
      val hit    = recall >= recallTarget
      trace += ((p, row.getLong(0), row.getLong(1), recall, hit))
      if (hit) chosen = p
    }
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(index)
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(truth)
    (chosen, trace.toSeq.toDF("nprobe", "n_true", "n_hits", "recall", "chosen"))
  }

  /** kNN classification: majority label among each query vector's k exact
    * nearest neighbors (cosine), ties broken toward the smallest label — a
    * fully deterministic, oracle-checkable label-propagation shape (the
    * "retrieve-then-vote" pattern over an embedding corpus). */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val neighbors = bruteTopK(corpus, queries, k)
      .join(
        broadcast(corpus.select(col("vec_id").as("neighbor_id"), col("label"))),
        Seq("neighbor_id"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    neighbors
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  /** Hard-negative mining for embedding-model training: for each query
    * vector, the k most-similar corpus vectors carrying a DIFFERENT label,
    * below an optional cosine ceiling. The two filters are the standard
    * contrastive-training recipe: a different label makes the pair a
    * negative; the ceiling (`maxSim`) drops near-duplicates that are likely
    * mislabeled positives rather than informative negatives.
    *
    * Same 100 TB shape as [[bruteTopK]]: queries broadcast, corpus streamed
    * once, bounded-heap top-k per query — no corpus shuffle, no per-query
    * sort of the scored set. The label predicate rides the broadcast join
    * condition so rejected pairs never materialize. The `maxSim` cut is
    * FP-robust cross-engine: the operator itself nudges the caller's bound
    * up by 5e-7 before comparing the round-6 cosine, so a caller passing a
    * plain 0.4 gets the offset cut — no caller-side epsilon needed (an
    * unset bound, `Double.MaxValue`, is left exact). Bounds must sit ON
    * the 1e-6 grid: a pre-offset bound (e.g. 0.4000005, the pre-r10
    * recipe) would silently double-guard, so off-grid values are rejected
    * loudly instead of reinterpreted. */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      maxSim: Double = Double.MaxValue): DataFrame = {
    require(
      maxSim == Double.MaxValue ||
        math.abs(maxSim * 1e6 - math.rint(maxSim * 1e6)) < 1e-3,
      s"maxSim must sit on the 1e-6 cosine grid (got $maxSim): the operator applies its own " +
        "5e-7 FP guard — pass the plain bound, not a pre-offset one")
    val q = broadcast(
      queries
        .select(
          col("vec_id").as("query_id"),
          col("label").as("q_label"),
          asDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(
        col("vec_id").as("neighbor_id"),
        col("label").as("neg_label"),
        asDoubleVec(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val scored = q
      .join(c, col("query_id") =!= col("neighbor_id") && col("q_label") =!= col("neg_label"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("neg_label"),
        round(sim, 9).as("sim9"),
        round(sim, 6).as("sim"))
      .filter(col("sim") < lit(if (maxSim == Double.MaxValue) maxSim else maxSim + 5e-7))
    val top = graft.operators.TopK.perGroup(
      scored,
      groupCols = Seq("query_id"),
      orderCols = Seq("sim9" -> false, "neighbor_id" -> true),
      k = k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim9").desc, col("neighbor_id"))
    top
      .withColumn("rn", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("neg_label"), col("sim"), col("rn"))
  }

  /** Embedding near-dup pairs, exact: ALL pairs with cosine >= threshold via
    * an O(n²·d) self-join. This is the oracle/baseline path — correct at any
    * threshold, affordable only for small n (thousands). [[cosineDupPairs]]
    * gates into it automatically. */
  def cosineDupPairsExact(vectors: DataFrame, threshold: Double): DataFrame = {
    val withNorm = prepped(vectors)
    val a = withNorm.select(col("vec_id").as("a_id"), col("v").as("va"), col("n").as("na"))
    val b = withNorm.select(col("vec_id").as("b_id"), col("v").as("vb"), col("n").as("nb"))
    scorePairs(a.join(b, col("a_id") < col("b_id")), threshold)
  }

  /** Embedding near-dup pairs, LSH-bucketed: candidate pairs are vectors
    * sharing a hyperplane bucket in ANY of `tables` hash tables; each
    * candidate is then verified with the EXACT cosine, so every emitted pair
    * satisfies the threshold — only recall is approximate. Join cost is
    * bounded by bucket occupancy (equi-join on (table, bucket)), never n².
    *
    * Recall math (random hyperplanes): a pair at angle θ collides per table
    * with prob (1-θ/π)^bits. Defaults bits=8, tables=12 give ~0.98 recall at
    * cosine 0.9 — near-dup territory. LOW thresholds (<0.7) are not LSH
    * territory at any setting; use the exact path or raise tables. */
  def cosineDupPairsBucketed(
      vectors: DataFrame,
      threshold: Double,
      bits: Int = 8,
      tables: Int = 12): DataFrame = {
    val buckets = hyperplaneBuckets(vectors, bits = bits, tables = tables)
    val candidates = buckets
      .select(col("table"), col("bucket"), col("vec_id").as("a_id"))
      .join(
        buckets.select(col("table"), col("bucket"), col("vec_id").as("b_id")),
        Seq("table", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val withNorm = prepped(vectors)
    val a = withNorm.select(col("vec_id").as("a_id"), col("v").as("va"), col("n").as("na"))
    val b = withNorm.select(col("vec_id").as("b_id"), col("v").as("vb"), col("n").as("nb"))
    scorePairs(candidates.join(a, Seq("a_id")).join(b, Seq("b_id")), threshold)
  }

  /** (vec_id, v, n) pair-search operand with zero-norm vectors DROPPED:
    * cosine is undefined for the zero vector, and 0/0 = NaN would ride
    * Spark's NaN-largest total order straight through a `>= threshold`
    * filter as a spurious pair (every co-candidate of a zero embedding
    * would be reported as its near-dup). A zero vector can never be a
    * near-duplicate of anything; it simply does not participate. */
  private def prepped(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"), asDoubleVec(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .filter(col("n") > 0)

  /** The one shared tail of every *DupPairs path: exact cosine over a
    * candidate frame carrying (a_id, va, na, b_id, vb, nb), rounded to 6dp
    * for engine-portable FP equality, threshold-filtered. `extra` appends
    * passthrough columns (e.g. the semantic cluster id). */
  private def scorePairs(pairs: DataFrame, threshold: Double, extra: Column*): DataFrame =
    pairs
      .withColumn("sim6", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim6") >= threshold)
      .select(Seq(col("a_id"), col("b_id"), col("sim6").as("sim")) ++ extra: _*)

  /** Incremental embedding near-dup pairs, exact: every pair with cosine >=
    * threshold TOUCHING the new batch — new×stored and new×new, never
    * stored×stored (the daily-ingestion contract, mirroring
    * Dedup.incrementalJaccardPairs). Cost O(|new|·|all|·d), proportional to
    * the batch — re-running the full dedup would be O(|all|²·d) and redo
    * yesterday's work. Ids must be disjoint across the two frames. Output
    * (a_id, b_id, sim) normalized to a_id < b_id. */
  def cosineDupPairsIncrementalExact(
      newVecs: DataFrame,
      oldVecs: DataFrame,
      threshold: Double): DataFrame = {
    val a = prepped(newVecs)
      .select(col("vec_id").as("a_id"), col("v").as("va"), col("n").as("na"))
    val b = prepped(newVecs).withColumn("is_new", lit(true))
      .unionByName(prepped(oldVecs).withColumn("is_new", lit(false)))
      .select(col("vec_id").as("b_id"), col("v").as("vb"), col("n").as("nb"), col("is_new"))
    // each new×new pair meets once (a < b); new×old pairs always qualify
    val cand = a
      .join(b, col("a_id") =!= col("b_id") && (!col("is_new") || col("a_id") < col("b_id")))
      .select(
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        col("va"), col("na"), col("vb"), col("nb"))
    scorePairs(cand, threshold)
  }

  /** Incremental near-dup pairs, LSH-bucketed: candidates are (new, any)
    * bucket collisions — the stored side contributes index rows but never
    * pairs among itself — then exact-verified like
    * [[cosineDupPairsBucketed]]. The stored side's buckets are exactly the
    * persistent index [[hyperplaneBuckets]] builds (deterministic
    * signatures: recomputing here equals reading a stored copy). */
  def cosineDupPairsIncrementalBucketed(
      newVecs: DataFrame,
      oldVecs: DataFrame,
      threshold: Double,
      bits: Int = 8,
      tables: Int = 12): DataFrame = {
    val newB = hyperplaneBuckets(newVecs, bits, tables)
    val allB = newB.withColumn("is_new", lit(true))
      .unionByName(hyperplaneBuckets(oldVecs, bits, tables).withColumn("is_new", lit(false)))
      .select(col("table"), col("bucket"), col("vec_id").as("b_id"), col("is_new"))
    val candidates = newB
      .select(col("table"), col("bucket"), col("vec_id").as("a_id"))
      .join(allB, Seq("table", "bucket"))
      .filter(col("a_id") =!= col("b_id") && (!col("is_new") || col("a_id") < col("b_id")))
      .select(
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
      .distinct()
    val withNorm = prepped(newVecs).unionByName(prepped(oldVecs))
    val a = withNorm.select(col("vec_id").as("a_id"), col("v").as("va"), col("n").as("na"))
    val b = withNorm.select(col("vec_id").as("b_id"), col("v").as("vb"), col("n").as("nb"))
    scorePairs(candidates.join(a, Seq("a_id")).join(b, Seq("b_id")), threshold)
  }

  /** The cosine threshold below which random-hyperplane LSH stops being an
    * honest recall proposition at the default bits/tables (its own docstring
    * math: collision probability decays exponentially in the pair's angle). */
  val LshThresholdFloor = 0.8

  /** Embedding near-dup pairs with cosine >= threshold. Size-gated the way
    * Dedup.duplicateClusters gates union-find: at or under `exactGate` rows
    * the exact all-pairs join runs (small-corpus/oracle contract, exact at
    * ANY threshold); above it the LSH-bucketed candidates + exact-verify
    * path runs — emitted pairs are still exact, recall ~0.98 at near-dup
    * thresholds (0.9+), and the join is bucket-bounded instead of O(n²).
    *
    * The bucketed path is auto-dispatched ONLY in LSH territory
    * (threshold >= [[LshThresholdFloor]]): below it LSH recall collapses
    * and silently shrinking the result set as the corpus grows would be a
    * correctness bug, so a low-threshold query stays exact at any size —
    * callers who explicitly want approximate low-threshold pairs opt in
    * via [[cosineDupPairsBucketed]] with raised `tables`.
    *
    * `sizeHint` skips the gate's `count()` — which on a derived frame
    * executes the whole upstream plan once — when the caller already knows
    * the cardinality (a parquet scan's count is metadata-cheap; a
    * post-filter frame's is not). */
  def cosineDupPairs(
      vectors: DataFrame,
      threshold: Double,
      exactGate: Long = 1L << 16,
      bits: Int = 8,
      tables: Int = 12,
      sizeHint: Option[Long] = None): DataFrame = {
    lazy val n = sizeHint.getOrElse(vectors.count())
    if (threshold < LshThresholdFloor) {
      // below the LSH floor only the exact join is honest — but it is
      // O(n²·d), so a large corpus here deserves a loud flag, not a silent
      // quadratic dispatch (the caller's levers: raise the threshold, or
      // opt into cosineDupPairsBucketed with many more tables)
      if (n > exactGate)
        org.slf4j.LoggerFactory
          .getLogger(getClass)
          .warn(
            s"cosineDupPairs: threshold $threshold is below the LSH floor $LshThresholdFloor " +
              s"and the corpus has $n rows (> exactGate $exactGate); running the EXACT O(n^2) " +
              "all-pairs join. For approximate low-threshold pairs call cosineDupPairsBucketed " +
              "with raised `tables` explicitly.")
      cosineDupPairsExact(vectors, threshold)
    } else if (n <= exactGate) cosineDupPairsExact(vectors, threshold)
    else cosineDupPairsBucketed(vectors, threshold, bits, tables)
  }

  /** [[cosineDupPairsIncrementalExact]] / [[cosineDupPairsIncrementalBucketed]]
    * behind the same size/threshold gate as [[cosineDupPairs]]: exact while
    * small or below the LSH recall floor, bucketed candidates + exact verify
    * at scale. */
  def cosineDupPairsIncremental(
      newVecs: DataFrame,
      oldVecs: DataFrame,
      threshold: Double,
      exactGate: Long = 1L << 16,
      bits: Int = 8,
      tables: Int = 12,
      sizeHint: Option[Long] = None): DataFrame = {
    lazy val n = sizeHint.getOrElse(newVecs.count() + oldVecs.count())
    if (threshold < LshThresholdFloor) {
      if (n > exactGate)
        org.slf4j.LoggerFactory
          .getLogger(getClass)
          .warn(
            s"cosineDupPairsIncremental: threshold $threshold is below the LSH floor " +
              s"$LshThresholdFloor and the corpus has $n rows (> exactGate $exactGate); " +
              "running the EXACT new-vs-all join.")
      cosineDupPairsIncrementalExact(newVecs, oldVecs, threshold)
    } else if (n <= exactGate) cosineDupPairsIncrementalExact(newVecs, oldVecs, threshold)
    else cosineDupPairsIncrementalBucketed(newVecs, oldVecs, threshold, bits, tables)
  }

  // ----------------------------------------------------------------- k-means

  /** Result of [[kmeans]]: per-vector assignments (vec_id, cluster, dist2),
    * the trained k×d centroid matrix, iterations actually run, and the
    * final inertia (sum of squared unit-sphere distances to the assigned
    * centroid). `inertia` is LAZY — it costs one full corpus pass, and most
    * consumers (the gate query, [[semanticDupPairs]]) only want the
    * assignments, so the pass runs only if someone asks. */
  final class KMeansResult(
      val assignments: DataFrame,
      val centroids: Array[Array[Double]],
      val iters: Int) {
    lazy val inertia: Double =
      assignments.agg(sum(col("dist2"))).head().getDouble(0)
  }

  /** struct(cluster, dist2) of the nearest centroid in `cs` — the codegen'd
    * [[graft.functions.VecNearest]] expression (no ScalaUDF ser/de in the
    * k-means hot loop); distance ties break toward the lower cluster
    * index. The one model-closure scorer every k-means phase shares. */
  private def nearest(cs: Array[Array[Double]])(vc: Column): Column =
    graft.functions.VectorFunctions.vec_nearest(vc, cs)

  /** Distributed k-means (Lloyd's) over an embedding column — the corpus
    * clustering step semantic pipelines run before balancing or pruning
    * (cluster-then-sample: SemDeDup, Abbas et al. 2023, clusters embeddings
    * and prunes within cells; mixture balancing samples per cell). Vectors
    * are unit-normalized first, so squared L2 equals 2 − 2·cosine —
    * spherical k-means in cosine order, matching the rest of this module.
    *
    * Deterministic end to end: the assignment argmin breaks distance ties
    * toward the lower cluster index; empty cells keep their previous
    * centroid; no RNG anywhere. Two runs (any parallelism) produce
    * identical assignments — the property the spec pins by comparing
    * against a single-node Lloyd's with the same tie rules.
    *
    * `initMode`:
    *  - `"ids"` (default): the k lowest-id vectors. One cheap job; quality
    *    depends on id order being uncorrelated with geometry.
    *  - `"parallel"`: k-means‖ (Bahmani et al. 2012) — `initRounds` passes
    *    each keep a vector with probability min(1, 2k·d²(x,C)/φ), decided
    *    by a PORTABLE md5 threshold instead of an RNG (same derandomization
    *    as Corpus.resampleMixture), then the ≤ ~2k·rounds weighted
    *    candidates are Lloyd'd on the driver down to k seeds. Costs
    *    `initRounds` extra corpus scans; buys seeds spread ∝ the data's own
    *    density — the standard fix when cheap seeding collapses into one
    *    dense region.
    *
    * Scale shape per iteration: ONE cached-corpus scan, a narrow assignment
    * against the broadcast k×d model (UDF justified: driver-held model
    * closure), and ONE shuffle of (cluster, pos) partial sums — map-side
    * combine caps each task's contribution at k·d cells regardless of row
    * count, and the driver only ever holds the k×d matrix (same bounded-
    * model contract as [[trainCoarseQuantizer]], which stays the
    * SAMPLE-based seeder for IVF; this is the full-corpus trainer whose
    * every iteration is a distributed job). */
  def kmeans(
      vectors: DataFrame,
      k: Int,
      maxIter: Int = 20,
      tol: Double = 1e-9,
      initMode: String = "ids",
      initRounds: Int = 5,
      normalize: Boolean = true): KMeansResult = {
    require(k > 0, "k must be positive")
    require(maxIter >= 1, "maxIter must be >= 1")
    require(initMode == "ids" || initMode == "parallel", s"unknown initMode $initMode")
    // normalize=false is the PRODUCT-QUANTIZATION regime ([[pqTrain]]):
    // sub-vector codebooks must quantize raw coordinates — normalizing an
    // 8-dim slice would distort every distance the code stands in for
    val prep =
      if (normalize)
        vectors
          .select(col("vec_id"), asDoubleVec(col("embedding")).as("v0"))
          .withColumn("nrm", norm(col("v0")))
          .select(
            col("vec_id"),
            when(col("nrm") > 0, transform(col("v0"), x => x / col("nrm")))
              .otherwise(col("v0"))
              .as("v"))
      else vectors.select(col("vec_id"), asDoubleVec(col("embedding")).as("v"))
    // deterministic seed: the k lowest-id vectors (already unit-normalized);
    // collected BEFORE persisting so an empty corpus rejects without leaving
    // a cached entry behind
    var centroids: Array[Array[Double]] = prep
      .orderBy("vec_id")
      .limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "kmeans needs at least one input vector")
    val dim = centroids.head.length
    prep.persist()
    var iters = 0
    var moved = Double.MaxValue
    try {
      if (initMode == "parallel" && centroids.length > 1)
        centroids = parallelSeeds(prep, centroids.head, k, initRounds)
      while (iters < maxIter && moved > tol) {
      // Coordinates are summed as DECIMAL(38,18), not double: decimal
      // addition is exact, so the result is independent of partition and
      // merge order — the model (and therefore every assignment) is
      // bit-identical run to run at any parallelism. Unit-sphere coords are
      // in [-1,1], leaving 20 integer digits of headroom (10^12 rows deep).
        val cells = prep
          .select(nearest(centroids)(col("v")).getField("cluster").as("cluster"), col("v"))
          .select(col("cluster"), posexplode(col("v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(
            sum(col("col").cast(org.apache.spark.sql.types.DecimalType(38, 18))).as("s"),
            count(lit(1)).as("n"))
          .collect() // bounded: exactly k·d populated cells
        val next = centroids.map(_.clone())
        cells.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDecimal(2).doubleValue / r.getLong(3)
        }
        moved = 0.0
        var c = 0
        while (c < next.length) {
          var d = 0.0; var i = 0
          while (i < dim) { val x = next(c)(i) - centroids(c)(i); d += x * x; i += 1 }
          if (d > moved) moved = d
          c += 1
        }
        centroids = next
        iters += 1
      }
    } finally prep.unpersist() // iterations used the cache; consumers rescan
    val a = nearest(centroids)(col("v"))
    val assignments = prep.select(
      col("vec_id"),
      a.getField("cluster").as("cluster"),
      a.getField("dist2").as("dist2"))
    new KMeansResult(assignments, centroids, iters)
  }

  /** k-means‖ seeding (Bahmani et al. 2012 "Scalable K-Means++"),
    * derandomized: each round scores every vector by d²(x, C) against the
    * current center set, computes φ = Σd² EXACTLY (decimal sum — so the
    * keep-threshold is identical at any parallelism), and keeps x iff
    * u(x) < 2k·d²(x)/φ where u(x) is a 52-bit uniform read from
    * md5(vec_id:round) — the same md5-threshold derandomization as
    * Corpus.resampleMixture, so the candidate set is a deterministic
    * function of the data. Expected ~2k candidates/round (hard-capped at
    * 10k per round by lowest-id, the documented bounded-collect contract);
    * candidates are then weighted by the size of their Voronoi cell (one
    * scan) and reduced to k seeds by a driver-side weighted Lloyd's.
    * Cost: `rounds` scans for scoring + one for weights. */
  private def parallelSeeds(
      prep: DataFrame,
      firstCenter: Array[Double],
      k: Int,
      rounds: Int): Array[Array[Double]] = {
    val centers = scala.collection.mutable.ArrayBuffer[Array[Double]](firstCenter)
    val cap = 10 * k
    var r = 1
    while (r <= rounds) {
      val cs = centers.toArray
      val scored = prep.select(
        col("vec_id"), col("v"), nearest(cs)(col("v")).getField("dist2").as("d2"))
      val phi = scored
        .agg(sum(col("d2").cast(org.apache.spark.sql.types.DecimalType(38, 18))))
        .head().getDecimal(0).doubleValue
      if (phi <= 0) return centers.toArray // all vectors coincide with centers
      val u = conv(substring(md5(concat_ws(":", col("vec_id"), lit(r))), 1, 13), 16, 10)
        .cast("double") / lit(math.pow(16.0, 13))
      val picked = scored
        .filter(u < col("d2") * lit(2.0 * k) / lit(phi))
        .orderBy("vec_id")
        .limit(cap)
        .collect()
      centers ++= picked.map(_.getSeq[Double](1).toArray)
      r += 1
    }
    val cs = centers.toArray
    val weightRows = prep
      .select(nearest(cs)(col("v")).getField("cluster").as("c"))
      .groupBy("c").agg(count(lit(1)).as("n"))
      .collect()
    val weights = new Array[Long](cs.length)
    weightRows.foreach(row => weights(row.getInt(0)) = row.getLong(1))
    weightedLloyd(cs, weights, k)
  }

  /** Driver-side weighted Lloyd's reducing the ≤ ~2k·rounds k-means‖
    * candidates to k seeds. Deterministic: init = the k heaviest candidates
    * (insertion index breaks ties), assignment ties to the lower index,
    * empty cells keep their centroid. */
  private def weightedLloyd(
      cand: Array[Array[Double]],
      w: Array[Long],
      k: Int,
      iters: Int = 20): Array[Array[Double]] = {
    val kk = math.min(k, cand.length)
    val d = cand.head.length
    val order = cand.indices.sortBy(i => (-w(i), i))
    val centroids = Array.tabulate(kk)(i => cand(order(i)).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](d))
      val counts = new Array[Long](kk)
      var p = 0
      while (p < cand.length) {
        if (w(p) > 0) {
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < kk) {
            var dd = 0.0; var i = 0
            while (i < d) { val x = cand(p)(i) - centroids(c)(i); dd += x * x; i += 1 }
            if (dd < bd) { bd = dd; best = c }
            c += 1
          }
          counts(best) += w(p)
          val s = sums(best); var i = 0
          while (i < d) { s(i) += cand(p)(i) * w(p); i += 1 }
        }
        p += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var i = 0
          while (i < d) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): k-means
    * clusters the embedding space, then the exact cosine pair search runs
    * ONLY within each cluster — the published recipe for pushing embedding
    * dedup past the all-pairs wall. The cluster-equality join key turns the
    * O(n²) self-join into Σᵢ O(nᵢ²): with k balanced cells that is a k×
    * candidate reduction, and the shuffle co-locates one cell per task.
    * Every emitted pair is exact-cosine-verified (≥ threshold); recall is
    * approximate only in that a near-dup pair straddling a cell boundary is
    * not examined — the same contract as [[cosineDupPairsBucketed]], with
    * cells in place of hash buckets (SimilaritySpec pins recall on the
    * planted near-dups, which sit at cosine ≥0.95 and land together).
    *
    * Output: (a_id, b_id, sim, cluster). */
  def semanticDupPairs(
      vectors: DataFrame,
      threshold: Double,
      k: Int = 64,
      maxIter: Int = 10,
      initMode: String = "ids",
      tol: Double = 1e-9): DataFrame = {
    // empty corpus → empty pairs, like every sibling dedup operator (the
    // kmeans trainer itself rejects an empty input loudly)
    if (vectors.isEmpty) {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("a_id", LongType), StructField("b_id", LongType),
        StructField("sim", DoubleType), StructField("cluster", IntegerType)))
      return vectors.sparkSession.createDataFrame(
        vectors.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val cells = kmeans(vectors, k, maxIter, tol = tol, initMode = initMode)
      .assignments.select(col("vec_id"), col("cluster"))
    val withNorm = prepped(vectors).join(cells, "vec_id")
    val a = withNorm.select(
      col("cluster"), col("vec_id").as("a_id"), col("v").as("va"), col("n").as("na"))
    val b = withNorm.select(
      col("cluster"), col("vec_id").as("b_id"), col("v").as("vb"), col("n").as("nb"))
    scorePairs(
      a.join(b, Seq("cluster")).filter(col("a_id") < col("b_id")),
      threshold,
      col("cluster"))
  }

  /** Johnson–Lindenstrauss random projection with a deterministic ±1 sign
    * matrix (Achlioptas 2001: E[⟨proj(u), proj(v)⟩] = ⟨u, v⟩, distortion
    * O(1/√outDim)) — the dimensionality-reduction step that shrinks an
    * embedding table before an ANN index or pair search.
    *
    * The sign matrix is generated driver-side from a splitmix64 stream of
    * (seed, j·inDim + i) and embedded as a PLAN LITERAL (outDim·inDim
    * bytes-as-ints — KBs for any practical dim), so the projection is a
    * purely narrow zero-shuffle map over built-in HOFs: no UDF, no
    * broadcast join, no nondeterministic RNG state anywhere. Rows whose
    * vector length ≠ inDim fail loudly (raise_error) rather than silently
    * projecting garbage. */
  /** The deterministic ±1 Achlioptas sign matrix [[randomProject]] embeds
    * as a plan literal — public so an external checker (e.g. a SQL oracle)
    * can regenerate the exact same matrix from (inDim, outDim, seed) and
    * verify the projection value-for-value. Row j, column i is the sign of
    * splitmix64(seed ^ (j·inDim + i)). */
  def projectionSigns(inDim: Int, outDim: Int, seed: Long = 42L): Seq[Seq[Int]] = {
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until outDim).map { j =>
      (0 until inDim).map(i => if (mix(seed ^ (j.toLong * inDim + i)) < 0) -1 else 1)
    }
  }

  def randomProject(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      inDim: Int,
      outDim: Int,
      seed: Long = 42L): DataFrame = {
    require(inDim > 0 && outDim > 0, s"dims must be positive, got $inDim -> $outDim")
    require(outDim <= inDim, s"projection should reduce: $outDim > $inDim")
    val signs = projectionSigns(inDim, outDim, seed)
    val signsLit = typedLit(signs)
    val invSqrt  = 1.0 / math.sqrt(outDim.toDouble)
    val checked = when(
      size(col(vecCol)) === inDim,
      col(vecCol).cast("array<double>"))
      .otherwise(raise_error(concat(
        lit(s"randomProject: expected dim $inDim, got "), size(col(vecCol)).cast("string"))))
    vectors.select(
      col(idCol),
      transform(
        sequence(lit(0), lit(outDim - 1)),
        j =>
          aggregate(
            zip_with(checked, element_at(signsLit, (j + 1).cast("int")), (a, s) => a * s),
            lit(0.0),
            (acc, x) => acc + x) * invSqrt).as("projected"))
  }

  /** IR ranking quality of the exact top-k list, graded by embedding
    * labels (relevant ⇔ same label as the query — the standard proxy when
    * no human judgments exist): per query, hits@k, reciprocal rank of the
    * first relevant result, and NDCG@k with binary gains — the eval
    * artifact a retrieval pipeline reads before trusting its index. DCG
    * uses the natural-log discount Σ rel/ln(rank+1) (the base cancels in
    * the NDCG ratio); both DCG and the ideal fold in FIXED rank order, so
    * the only cross-engine freedom is ln's last ulp under the round(·, 6)
    * envelope. Returns (query_id, n_relevant, hits_at_k, rr, ndcg).
    *
    * Scale shape: [[bruteTopK]]'s bounded ranked lists joined to the
    * label column and a broadcast per-label count table; everything after
    * the ranking is k-row-per-query arithmetic. n_relevant subtracts the
    * query itself only when it actually is a corpus member (explicit
    * membership semi-join), so held-out query sets are graded against the
    * full same-label count. */
  def rankingMetrics(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val ranked = bruteTopK(corpus, queries, k)
    val labels = corpus.select(col("vec_id"), col("label"))
    val labCnt = labels.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    // n_relevant = same-label corpus rows EXCLUDING the query itself when
    // (and only when) the query is a corpus member — an explicit
    // (vec_id, label) membership check, so a query set disjoint from the
    // corpus gets the full same-label count instead of an off-by-one
    // (which would also miscalibrate the NDCG ideal denominator below)
    val qLabBase = queries.select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    val selfHit = qLabBase
      .join(
        labels,
        labels("vec_id") === qLabBase("query_id") && labels("label") === qLabBase("qlabel"),
        "left_semi")
      .select(col("query_id"), lit(1L).as("self_in_corpus"))
    val qLab = qLabBase
      .join(labCnt.withColumnRenamed("label", "qlabel"), "qlabel")
      .join(selfHit, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("qlabel"),
        (col("cnt") - coalesce(col("self_in_corpus"), lit(0L))).cast("long").as("n_relevant"))
    val graded = ranked
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nlabel")), "neighbor_id")
      .join(broadcast(qLab), "query_id")
      .select(
        col("query_id"),
        col("n_relevant"),
        col("rn"),
        (col("nlabel") === col("qlabel")).cast("long").as("rel"))
    graded
      .groupBy(col("query_id"), col("n_relevant"))
      .agg(
        sum(col("rel")).as("hits_at_k"),
        min(when(col("rel") === 1, col("rn"))).as("first_rel"),
        aggregate(
          array_sort(collect_list(struct(col("rn"), col("rel")))),
          lit(0.0),
          (acc, x) =>
            acc + x.getField("rel").cast("double") /
              log(x.getField("rn").cast("double") + lit(1.0))).as("dcg"))
      .select(
        col("query_id"),
        col("n_relevant"),
        col("hits_at_k"),
        when(col("first_rel").isNotNull, round(lit(1.0) / col("first_rel").cast("double"), 6))
          .otherwise(lit(0.0)).as("rr"),
        when(
          col("n_relevant") > 0,
          round(
            col("dcg") / aggregate(
              transform(
                sequence(lit(1), least(col("n_relevant"), lit(k.toLong)).cast("int")),
                i => lit(1.0) / log(i.cast("double") + lit(1.0))),
              lit(0.0),
              (acc, x) => acc + x),
            6)).otherwise(lit(0.0)).as("ndcg"))
  }

  // ----------------------------------------------------- product quantization

  /** PQ codebooks: `codebooks(sub)(code)` is the d/m-dim centroid of code
    * `code` in subspace `sub` (Jégou et al. 2011 "Product Quantization for
    * Nearest Neighbor Search"). m·k·(d/m) doubles — the whole model is
    * m·k rows, the usual bounded-model judgment. */
  final case class PqModel(codebooks: Array[Array[Array[Double]]], dsub: Int) {
    def m: Int = codebooks.length
  }

  /** Train a product quantizer: split d dims into `m` contiguous
    * subspaces and run the decimal-exact [[kmeans]] (normalize = false —
    * RAW coordinates; tol = 0 so the iteration count is the contract) per
    * subspace with k = 2^codeBits centroids. With m=8, k=16 a 64-float
    * vector compresses 256 B → 4 B of codes (64×) while ADC distances
    * stay within quantization error — THE memory/IO story for
    * billion-vector search. Training cost: m small k-means over sliced
    * columns of one table (each iteration collects k·(d/m) cells). */
  def pqTrain(
      embs: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3): PqModel = {
    val d = embs.select(size(col("embedding"))).head().getInt(0)
    require(d % m == 0, s"dimension $d not divisible by m=$m subspaces")
    val dsub = d / m
    // All m sub-quantizers train JOINTLY — one scan per Lloyd's iteration
    // instead of m (measured 4.1 s → ~1.6 s at sf0.1 for m=8, iters=3):
    // each row explodes into its m (sub, nearest-cluster, slice) structs,
    // coordinates sum as DECIMAL(38,18) per (sub, cluster, pos) — the
    // exact-decimal/lowest-id-seed/tie-to-lower-cluster contract of
    // [[kmeans]] per subspace, bit-identical to training them separately
    // (the per-sub argmin sees the same slices and the same seeds).
    val prep = embs
      .select(col("vec_id"), asDoubleVec(col("embedding")).as("v"))
      .persist()
    try {
      val seeds = prep.orderBy("vec_id").limit(k).collect().map(_.getSeq[Double](1).toArray)
      require(seeds.nonEmpty, "pqTrain needs at least one input vector")
      var books: Array[Array[Array[Double]]] =
        Array.tabulate(m)(s => seeds.map(v => v.slice(s * dsub, s * dsub + dsub)))
      var it = 0
      while (it < iters) {
        val perSub = array((0 until m).map { s =>
          val sv = slice(col("v"), s * dsub + 1, dsub)
          struct(
            nearest(books(s))(sv).getField("cluster").as("cluster"),
            sv.as("sv"))
        }: _*)
        val cells = prep
          .select(posexplode(perSub).as(Seq("sub", "sc")))
          .select(col("sub"), col("sc.cluster").as("cluster"), posexplode(col("sc.sv")))
          .groupBy(col("sub"), col("cluster"), col("pos"))
          .agg(
            sum(col("col").cast(org.apache.spark.sql.types.DecimalType(38, 18))).as("s"),
            count(lit(1)).as("n"))
          .collect() // bounded: m·k·dsub = d·k cells
        val next = books.map(_.map(_.clone()))
        cells.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDecimal(3).doubleValue / r.getLong(4)
        }
        books = next
        it += 1
      }
      PqModel(books, dsub)
    } finally prep.unpersist()
  }

  /** The compact code table: (vec_id, sub, code) — the resident index,
    * log2(k)/8 bytes per subspace per vector. Assignment is the codegen'd
    * argmin ([[graft.functions.VectorFunctions.vec_nearest]]) per
    * subspace, ties toward the lower code — a ZERO-SHUFFLE narrow
    * projection over the embedding scan. */
  def pqCodes(embs: DataFrame, model: PqModel): DataFrame = {
    val m = model.m
    val codeCols = array((0 until m).map { s =>
      nearest(model.codebooks(s))(
        asDoubleVec(slice(col("embedding"), s * model.dsub + 1, model.dsub)))
        .getField("cluster")
    }: _*)
    embs.select(col("vec_id"), posexplode(codeCols).as(Seq("sub", "code")))
  }

  /** ADC top-k search (asymmetric distance computation): per query build
    * the m×k lookup table of exact subspace distances ‖q_sub − c_code‖²,
    * score every CODE row by Σ_sub lut[sub][code] (a fixed sub-order
    * fold — deterministic doubles), shortlist rerank·k per query, then
    * exact full-dim L2 rerank of the shortlist. Returns
    * (query_id, neighbor_id, d2, rn), d2 rounded to 6.
    *
    * Scale shape: the scored relation is the CODE table (log2(k)·m bits a
    * vector — the thing that fits in memory at 10⁹ vectors), joined to a
    * broadcast nQ·m·k LUT on (sub, code) and partial-aggregated map-side;
    * only shortlist·nQ rows ever touch the full-precision vectors again
    * (the rerank join). No full-dim scan per query anywhere. */
  def pqSearch(
      embs: DataFrame,
      queries: DataFrame,
      model: PqModel,
      k: Int = 10,
      rerank: Int = 4): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    require(k >= 1 && rerank >= 1, "k and rerank must be positive")
    val m = model.m
    val dsub = model.dsub

    // LUT: (query_id, sub, code, pd) — nQ·m·k rows, broadcast. The
    // codebook enters the plan as a literal-backed frame (bounded model).
    val bookDf = model.codebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, code) => (s, code, c.toSeq) }
    }.toSeq.toDF("sub", "code", "cv")
    val lut = queries
      .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qx"))
      .crossJoin(bookDf)
      .select(
        col("query_id"),
        col("sub"),
        col("code"),
        aggregate(
          zip_with(
            slice(col("qx"), col("sub") * dsub + lit(1), lit(dsub)),
            col("cv"),
            (a, b) => (a - b) * (a - b)),
          lit(0.0),
          (acc, x) => acc + x).as("pd"))

    val approx = pqCodes(embs, model)
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("sub"), col("pd")))),
          lit(0.0),
          (acc, x) => acc + x.getField("pd")).as("ad"))
    import org.apache.spark.sql.expressions.Window
    val shortlist = approx
      .withColumn(
        "srk",
        row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("ad").asc, col("neighbor_id").asc)))
      .filter(col("srk") <= k * rerank)
      .select(col("query_id"), col("neighbor_id"))

    val qx = queries.select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qx"))
    val nx = embs.select(col("vec_id").as("neighbor_id"), asDoubleVec(col("embedding")).as("nx"))
    shortlist
      .join(qx, Seq("query_id"))
      .join(nx, Seq("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        aggregate(
          zip_with(col("qx"), col("nx"), (a, b) => (a - b) * (a - b)),
          lit(0.0),
          (acc, x) => acc + x).as("d2raw"))
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("d2raw").asc, col("neighbor_id").asc)))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("d2raw"), 6).as("d2"), col("rn"))
  }

  /** IVF-PQ: the canonical billion-vector index (Jégou et al. 2011 §IV) —
    * a coarse quantizer partitions the corpus into `nlist` cells (the
    * decimal-exact spherical [[kmeans]], so cell assignment matches the
    * rest of the IVF family), and a product quantizer codes each vector's
    * RESIDUAL u − c(cell) (residuals are centered near 0, so the same
    * code budget quantizes them far tighter than raw coordinates — the
    * whole point of the composition). Serving probes each query's
    * `nprobe` nearest cells, scores codes by per-(query, cell) residual
    * LUTs (ADC), shortlists rerank·k, and exact-cosine-reranks — output
    * (query_id, neighbor_id, sim, rn), the IVF-family contract.
    *
    * Scale shape: the resident index is (cell, m codes) per vector —
    * m·log2(pqK)/8 bytes + a cell id; scoring joins the code table to a
    * BROADCAST nQ·nprobe·m·pqK LUT and partial-aggregates map-side; only
    * shortlist rows touch full-precision vectors (the rerank join). The
    * coarse model is nlist·d, the PQ model m·pqK·(d/m) = pqK·d — both
    * bounded driver models. */
  def ivfPq(
      embs: DataFrame,
      queries: DataFrame,
      nlist: Int = 16,
      coarseIters: Int = 5,
      m: Int = 8,
      pqK: Int = 16,
      pqIters: Int = 3,
      nprobe: Int = 8,
      k: Int = 10,
      rerank: Int = 10): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val km    = kmeans(embs, nlist, maxIter = coarseIters, tol = 0.0)
    val cents = km.centroids
    val dsub  = cents.head.length / m
    val centDf = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "ccv"))
    val unit = embs
      .select(col("vec_id"), asDoubleVec(col("embedding")).as("v0"))
      .withColumn("nrm", norm(col("v0")))
      .select(
        col("vec_id"),
        when(col("nrm") > 0, transform(col("v0"), x => x / col("nrm")))
          .otherwise(col("v0"))
          .as("u"))
    val resid = unit
      .join(km.assignments.select(col("vec_id"), col("cluster").as("cell")), "vec_id")
      .join(centDf, "cell")
      .select(
        col("vec_id"),
        col("cell"),
        zip_with(col("u"), col("ccv"), (a, b) => a - b).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = pqTrain(resid.select(col("vec_id"), col("embedding")), m, pqK, pqIters)
      val codes = pqCodes(resid.select(col("vec_id"), col("embedding")), model)
        .join(resid.select(col("vec_id"), col("cell")), "vec_id")

      def probesOf(c: org.apache.spark.sql.Column) =
        graft.functions.VectorFunctions.vec_nearest_cells(c, cents, nprobe)
      val qunit = queries
        .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv")))
        .select(
          col("query_id"),
          col("qv"),
          when(col("qn") > 0, transform(col("qv"), x => x / col("qn")))
            .otherwise(col("qv"))
            .as("qu"))
      val qprobe = qunit.withColumn("cell", explode(probesOf(col("qv"))))
      val bookDf = model.codebooks.zipWithIndex.flatMap { case (book, s) =>
        book.zipWithIndex.map { case (c, code) => (s, code, c.toSeq) }
      }.toSeq.toDF("sub", "code", "cv")
      val lut = broadcast(
        qprobe
          .join(centDf, "cell")
          .select(
            col("query_id"),
            col("cell"),
            zip_with(col("qu"), col("ccv"), (a, b) => a - b).as("qr"))
          .crossJoin(bookDf)
          .select(
            col("query_id"),
            col("cell"),
            col("sub"),
            col("code"),
            aggregate(
              zip_with(
                slice(col("qr"), col("sub") * dsub + lit(1), lit(dsub)),
                col("cv"),
                (a, b) => (a - b) * (a - b)),
              lit(0.0),
              (acc, x) => acc + x).as("pd")))
      val approx = codes
        .join(lut, Seq("cell", "sub", "code"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
        .agg(
          aggregate(
            array_sort(collect_list(struct(col("sub"), col("pd")))),
            lit(0.0),
            (acc, x) => acc + x.getField("pd")).as("ad"))
      import org.apache.spark.sql.expressions.Window
      val shortlist = approx
        .withColumn(
          "srk",
          row_number().over(
            Window.partitionBy(col("query_id")).orderBy(col("ad").asc, col("neighbor_id").asc)))
        .filter(col("srk") <= k * rerank)
        .select(col("query_id"), col("neighbor_id"))
      // exact rerank with the IVF family's raw-double cosine discipline
      val qraw = queries.select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qx"))
        .withColumn("qn", norm(col("qx")))
      val nraw = embs.select(col("vec_id").as("neighbor_id"), asDoubleVec(col("embedding")).as("nx"))
        .withColumn("nn", norm(col("nx")))
      val sim = dot(col("qx"), col("nx")) / (col("qn") * col("nn"))
      val out = shortlist
        .join(qraw, Seq("query_id"))
        .join(nraw, Seq("neighbor_id"))
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(sim, 9).as("sim9"),
          round(sim, 6).as("sim"))
        .withColumn(
          "rn",
          row_number().over(
            Window.partitionBy(col("query_id")).orderBy(col("sim9").desc, col("neighbor_id").asc)))
        .filter(col("rn") <= k)
        .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
      out.localCheckpoint(true)
    } finally resid.unpersist()
  }

  // ------------------------------------------------------------------ PCA

  /** Trained PCA model: per-dimension means and the top principal
    * component after exactly `iters` power iterations (the unrolled-
    * iteration contract — convergence is the user's knob, the iteration
    * count is the spec). */
  final case class PcaModel(means: Array[Double], component: Array[Double])

  private def grid9(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  /** Top-principal-component PCA by power iteration over a decimal-exact
    * distributed covariance — the whitening/dim-reduction step embedding
    * pipelines run before clustering, made engine-deterministic the same
    * way [[kmeans]] was:
    *
    *  - inputs land on the 1e-9 grid (round → DECIMAL) so every cross-
    *    moment Σ cᵢ·c_j is EXACT decimal arithmetic, order-free at any
    *    parallelism;
    *  - the d×d covariance (CAST(Σ AS DOUBLE)/(n−1)) is the bounded-model
    *    collect (d² doubles — the k·d k-means judgment);
    *  - each power iteration re-grids: raw = Σ_j grid(C·v), norm =
    *    √(Σ grid(raw²)), v = grid(raw/norm) — fixed double op sequences
    *    an external engine replays term for term (the oracle unrolls all
    *    iterations as CTEs).
    *
    * Scale shape: one narrow centered-projection scan feeding a d²-group
    * aggregation (map-side combined; the double posexplode emits d² terms
    * per row — the classic Gram-matrix pass, embarrassingly parallel);
    * iterations run on the driver over the d² model, never the data. */
  /** Cross-moment aggregator over 1e-9-grid vectors: one pass, NO explode —
    * the d² exploded-pair formulation spent ~9 s at sf0.1 on 8M per-term
    * Round/decimal evaluations; this buffer does the same arithmetic in
    * pure long ops (~ms). Grid doubles convert to exact 1e-9-unit longs
    * (Math.round recovers the integer: the double's representation error
    * is ≪ 0.5 units), centered units multiply EXACTLY in 1e-18 units, and
    * each product splits into (quotient, remainder) halves accumulated in
    * two long cells — overflow-safe to ~2e9 rows per cell and guarded by
    * addExact (loud, never silent wraparound). The finished buffer IS the
    * exact Σ cᵢ·c_j decimal — identical to SUM(DECIMAL(13,9)×DECIMAL(13,9))
    * in any engine, which is what the oracle replays. */
  final class CovUnitsAgg(d: Int, meanUnits: Array[Long])
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Double], Array[Long], Array[Long]] {
    private val B = 1000000000L // unit split base (1e9)

    override def zero: Array[Long] = new Array[Long](2 * d * d)

    override def reduce(buf: Array[Long], xs: Seq[Double]): Array[Long] = {
      require(xs.length == d, s"vector length ${xs.length} != declared dim $d")
      val u = new Array[Long](d)
      var j = 0
      while (j < d) {
        u(j) = Math.round(xs(j) * 1e9) - meanUnits(j)
        require(math.abs(u(j)) <= 3037000499L, s"centered value ${xs(j)} overflows the unit grid")
        j += 1
      }
      var i = 0
      while (i < d) {
        val ui   = u(i)
        val base = i * d
        var k = 0
        while (k < d) {
          val p = ui * u(k) // exact: both factors <= 3.03e9
          val q = Math.floorDiv(p, B)
          buf(base + k) = Math.addExact(buf(base + k), q)
          buf(d * d + base + k) = Math.addExact(buf(d * d + base + k), p - q * B)
          k += 1
        }
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The shared data pass behind [[pcaFit]] / [[pcaFitK]]: per-dimension
    * grid-9 means and the decimal-exact covariance — one scan for the
    * means, one unit-aggregator scan for the d² cross moments. */
  private def covModel(embs: DataFrame, vecCol: String): (Array[Double], Array[Array[Double]]) = {
    val dec9 = org.apache.spark.sql.types.DecimalType(13, 9)
    val n = embs.count()
    require(n >= 2, "PCA needs at least 2 vectors")
    val sums = embs
      .select(posexplode(col(vecCol)).as(Seq("j", "xe")))
      .select(col("j"), round(col("xe").cast("double"), 9).cast(dec9).as("xd"))
      .groupBy(col("j"))
      .agg(sum(col("xd")).as("s"))
      .orderBy(col("j"))
      .collect()
    // means land on the 1e-9 grid too, so centered values are exact grid
    // differences — the property the unit-arithmetic aggregator needs
    val means = sums.map(r => grid9(r.getDecimal(1).doubleValue / n))
    val d     = means.length
    val meanUnits = means.map(m => Math.round(m * 1e9))

    val covAgg = udaf(
      new CovUnitsAgg(d, meanUnits),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val units = embs
      .select(transform(col(vecCol), x => round(x.cast("double"), 9)).as("c"))
      .agg(covAgg(col("c")).as("u"))
      .head()
      .getSeq[Long](0)
    // exact Σ cᵢc_j from the (quotient, remainder) halves. Scale-18
    // decimals must be ROUNDED TO SCALE 9 while still decimal, BEFORE any
    // double cast: DuckDB's DECIMAL(38,18)→DOUBLE cast double-rounds
    // (measured: ~27% of random scale-18 values off by an ulp), while its
    // scale-9 cast and decimal ROUND are exact/HALF_UP — so the replayable
    // boundary is decimal-round-then-cast, never cast-at-scale-18.
    val cov = Array.tabulate(d, d) { (i, j) =>
      val s = java.math.BigDecimal
        .valueOf(units(i * d + j)).movePointLeft(9)
        .add(java.math.BigDecimal.valueOf(units(d * d + i * d + j)).movePointLeft(18))
      grid9(s.setScale(9, java.math.RoundingMode.HALF_UP).doubleValue / (n - 1))
    }
    (means, cov)
  }

  /** `iters` grid-re-rounding power iterations over a d×d grid-9 matrix —
    * the fixed double-op sequence both [[pcaFit]] and the deflated
    * components of [[pcaFitK]] run (and the oracle unrolls as CTEs). */
  private def powerIterate(cov: Array[Array[Double]], iters: Int): Array[Double] = {
    val d = cov.length
    var v = Array.fill(d)(grid9(1.0 / math.sqrt(d.toDouble)))
    var t = 0
    while (t < iters) {
      // raw = Σ_j C·v as EXACT decimal products of grid values (scale 18),
      // decimal-rounded to scale 9 before the double boundary (see cov)
      val raw = Array.tabulate(d) { i =>
        var s = java.math.BigDecimal.ZERO
        var j = 0
        while (j < d) {
          s = s.add(
            java.math.BigDecimal.valueOf(cov(i)(j)).setScale(9)
              .multiply(java.math.BigDecimal.valueOf(v(j)).setScale(9)))
          j += 1
        }
        s.setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
      }
      var n2 = java.math.BigDecimal.ZERO
      raw.foreach { r =>
        val rd = java.math.BigDecimal.valueOf(r).setScale(9)
        n2 = n2.add(rd.multiply(rd))
      }
      val norm = math.sqrt(n2.setScale(9, java.math.RoundingMode.HALF_UP).doubleValue)
      require(norm > 0.0, "power iteration collapsed to the zero vector (degenerate covariance)")
      v = raw.map(r => grid9(r / norm))
      t += 1
    }
    v
  }

  def pcaFit(embs: DataFrame, idCol: String, vecCol: String, iters: Int = 8): PcaModel = {
    require(iters >= 1, "iters must be >= 1")
    val (means, cov) = covModel(embs, vecCol)
    PcaModel(means, powerIterate(cov, iters))
  }

  /** Multi-component PCA model: per-dimension means, the top `k`
    * components (row per component), their Rayleigh eigenvalues, and the
    * covariance trace (total variance) the explained ratios divide by. */
  final case class PcaModelK(
      means: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      trace: Double)

  /** w = grid(C·v) and the Rayleigh quotient λ = grid(Σ grid(w)·v) —
    * exact-decimal two-stage contraction (never a triple-decimal product,
    * which would overflow scale 27). */
  private def rayleigh(cov: Array[Array[Double]], v: Array[Double]): Double = {
    val d = cov.length
    val w = Array.tabulate(d) { i =>
      var s = java.math.BigDecimal.ZERO
      var j = 0
      while (j < d) {
        s = s.add(
          java.math.BigDecimal.valueOf(cov(i)(j)).setScale(9)
            .multiply(java.math.BigDecimal.valueOf(v(j)).setScale(9)))
        j += 1
      }
      s.setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    }
    var lam = java.math.BigDecimal.ZERO
    var i = 0
    while (i < d) {
      lam = lam.add(
        java.math.BigDecimal.valueOf(w(i)).setScale(9)
          .multiply(java.math.BigDecimal.valueOf(v(i)).setScale(9)))
      i += 1
    }
    lam.setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
  }

  /** Hotelling deflation C' = grid(C − grid(λv)·vᵀ): u = grid(λ·vᵢ) first
    * (scale-18 product rounded to the grid), then each cell is the EXACT
    * decimal C(i,j) − u(i)·v(j) rounded HALF_UP to scale 9 — the same
    * decimal-before-double boundary discipline as the covariance itself,
    * so an external engine replays the deflated matrix cell for cell. */
  private def deflate(
      cov: Array[Array[Double]], v: Array[Double], lambda: Double): Array[Array[Double]] = {
    val d = cov.length
    val lamDec = java.math.BigDecimal.valueOf(lambda).setScale(9)
    val u = v.map { vi =>
      grid9(
        lamDec.multiply(java.math.BigDecimal.valueOf(vi).setScale(9))
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue)
    }
    Array.tabulate(d, d) { (i, j) =>
      java.math.BigDecimal.valueOf(cov(i)(j)).setScale(9)
        .subtract(
          java.math.BigDecimal.valueOf(u(i)).setScale(9)
            .multiply(java.math.BigDecimal.valueOf(v(j)).setScale(9)))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    }
  }

  /** Guarded power iteration for [[pcaFitK]]'s `orthoTol` path: the same
    * grid-9 decimal multiply/normalize loop as [[powerIterate]], plus (a)
    * a per-iteration projection of the iterate against every
    * previously-found component (classic orthogonal/subspace iteration —
    * the cure for near-degenerate spectra, where Hotelling deflation of a
    * NOT-yet-converged v₁ leaves v₂ measurably correlated with it) and
    * (b) a movement-based early-exit that keeps iterating past `iters`
    * (up to 16× `iters`) until max|v_{t+1} − v_t| ≤ tol. Deterministic:
    * same fixed op order every run, stop rule over exact grid values. */
  private def powerIterateOrtho(
      cov: Array[Array[Double]],
      prev: Seq[Array[Double]],
      iters: Int,
      tol: Double): Array[Double] = {
    val d   = cov.length
    val cap = iters * 16
    var v     = Array.fill(d)(grid9(1.0 / math.sqrt(d.toDouble)))
    var moved = Double.MaxValue
    var t     = 0
    while (t < iters || (moved > tol && t < cap)) {
      val raw = Array.tabulate(d) { i =>
        var s = java.math.BigDecimal.ZERO
        var j = 0
        while (j < d) {
          s = s.add(
            java.math.BigDecimal.valueOf(cov(i)(j)).setScale(9)
              .multiply(java.math.BigDecimal.valueOf(v(j)).setScale(9)))
          j += 1
        }
        s.setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
      }
      // project out prior components (grid-9 after each subtraction); this
      // branch is spec-pinned, not oracle-replayed, so plain double dot
      // products suffice inside the grid boundary
      prev.foreach { u =>
        var dot = 0.0
        var i = 0
        while (i < d) { dot += raw(i) * u(i); i += 1 }
        i = 0
        while (i < d) { raw(i) = grid9(raw(i) - dot * u(i)); i += 1 }
      }
      var n2 = 0.0
      raw.foreach(r => n2 += r * r)
      val norm = math.sqrt(n2)
      require(norm > 0.0, "power iteration collapsed to the zero vector (degenerate covariance)")
      val next = raw.map(r => grid9(r / norm))
      moved = 0.0
      var i = 0
      while (i < d) { val m = math.abs(next(i) - v(i)); if (m > moved) moved = m; i += 1 }
      v = next
      t += 1
    }
    v
  }

  /** Top-`nComponents` PCA by power iteration + Hotelling deflation over
    * the decimal-exact covariance — closes the single-component limitation
    * [[pcaFit]] shipped with: component c is `iters` power iterations on
    * the (c-times-deflated) matrix, then C ← C − λvvᵀ and repeat. Every
    * deflation step re-grids through exact decimal arithmetic (see
    * [[deflate]]), so all components AND eigenvalues replay in an external
    * engine. Data cost is unchanged from [[pcaFit]] — the two covariance
    * scans; the per-component work is driver-side over the d² model
    * (the k·d bounded-model judgment, d=64 → 32 KB).
    *
    * CONVERGENCE CAVEAT: with the default fixed budget, a near-degenerate
    * spectrum (λ₁ ≈ λ₂) converges slowly — deflating a not-yet-converged
    * v₁ can leave |v₁·v₂| around 10⁻² at small `iters` (measured ≈0.06 on
    * isotropic synthetics at the default 8). Either raise `iters`, or set
    * `orthoTol` > 0 (e.g. 1e-6) to enable the guard: each component then
    * projects out the previously-found ones every iteration and keeps
    * iterating past `iters` (≤16×) until the iterate moves by at most
    * `orthoTol` — components come out orthogonal by construction
    * (SimilaritySpec pins |v₁·v₂| < 1e-3 on an isotropic fixture). The
    * default `orthoTol = 0` path is bit-identical to previous behavior
    * and is what the gate oracle unrolls. */
  def pcaFitK(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int = 8,
      nComponents: Int = 2,
      orthoTol: Double = 0.0): PcaModelK = {
    require(iters >= 1, "iters must be >= 1")
    require(nComponents >= 1, "nComponents must be >= 1")
    require(orthoTol >= 0.0, "orthoTol must be >= 0")
    val (means, cov0) = covModel(embs, vecCol)
    val d = means.length
    require(nComponents <= d, s"nComponents $nComponents > dimension $d")
    var trace = java.math.BigDecimal.ZERO
    var i = 0
    while (i < d) {
      trace = trace.add(java.math.BigDecimal.valueOf(cov0(i)(i)).setScale(9))
      i += 1
    }
    val comps = Array.ofDim[Array[Double]](nComponents)
    val lams  = Array.ofDim[Double](nComponents)
    var cov   = cov0
    var c = 0
    while (c < nComponents) {
      val v =
        if (orthoTol > 0.0) powerIterateOrtho(cov, comps.take(c).toSeq, iters, orthoTol)
        else powerIterate(cov, iters)
      comps(c) = v
      lams(c) = rayleigh(cov, v)
      c += 1
      if (c < nComponents) cov = deflate(cov, v, lams(c - 1))
    }
    PcaModelK(means, comps, lams, trace.doubleValue)
  }

  /** The trained components as a frame: (component, dim, loading) — the
    * persistable multi-component model artifact. */
  def pcaComponents(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int = 8,
      nComponents: Int = 2): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val m = pcaFitK(embs, idCol, vecCol, iters, nComponents)
    m.components.zipWithIndex.flatMap { case (vs, c) =>
      vs.zipWithIndex.map { case (l, dim) => (c, dim, l) }
    }.toSeq.toDF("component", "dim", "loading")
  }

  /** Per-component spectrum: (component, eigenvalue, explained_ratio) —
    * eigenvalues are the Rayleigh quotients λ_c = v_cᵀ C_c v_c on the
    * c-times-deflated matrix, ratio = round(λ_c / trace(C), 9): the
    * how-many-dimensions-do-I-need curve embedding pipelines read before
    * fixing an output width. */
  def pcaExplainedVariance(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int = 8,
      nComponents: Int = 2): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val m = pcaFitK(embs, idCol, vecCol, iters, nComponents)
    m.eigenvalues.zipWithIndex.map { case (lam, c) =>
      (c, lam, grid9(lam / m.trace))
    }.toSeq.toDF("component", "eigenvalue", "explained_ratio")
  }

  /** The trained component as a frame: (dim, loading) — the persistable
    * model artifact, hash-checkable against an engine replay. */
  def pcaTopComponent(embs: DataFrame, idCol: String, vecCol: String, iters: Int = 8): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val m = pcaFit(embs, idCol, vecCol, iters)
    m.component.zipWithIndex.map { case (l, i) => (i, l) }.toSeq.toDF("dim", "loading")
  }

  /** Per-vector projection onto the top component: score = Σ grid(c_j·v_j)
    * over the centered coordinates — a zero-shuffle serving pass with the
    * model broadcast as plan literals (the [[graft.operators.Corpus]]
    * linearQualityScore shape). */
  def pcaProject(embs: DataFrame, idCol: String, vecCol: String, iters: Int = 8): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(13, 9)
    // accumulator sized so (37,18) + (27,18) peaks at precision 38 EXACTLY:
    // one digit higher and Spark's DecimalPrecision silently drops the
    // result scale to fit the 38 cap (observed: terms re-rounded to 1e-8,
    // breaking the cross-engine replay by ~1e-7) — the same precision-loss
    // trap corpus_dsir_weights documents for decimal×bigint products
    val decAcc = org.apache.spark.sql.types.DecimalType(37, 18)
    val m     = pcaFit(embs, idCol, vecCol, iters)
    val mArr  = array(m.means.toSeq.map(lit): _*)
    val vArr  = array(m.component.toSeq.map(lit): _*)
    embs.select(
      col(idCol),
      aggregate(
        zip_with(
          zip_with(col(vecCol), mArr, (xv, mm) => round(xv.cast("double"), 9) - mm),
          vArr,
          // both factors are 1e-9-grid values: the DECIMAL(13,9) casts are
          // exact and the product is EXACT at scale 18 — no rounding site
          (c, vv) => c.cast(dec9) * vv.cast(dec9)),
        lit(0).cast(decAcc),
        (acc, x) => (acc + x).cast(decAcc)).as("score_raw"))
      .select(
        col(idCol),
        // decimal-round to scale 9 BEFORE the double cast (the scale-18
        // cast is not correctly rounded in every engine — see pcaFit)
        round(col("score_raw"), 9).cast("double").as("score"))
  }
}
