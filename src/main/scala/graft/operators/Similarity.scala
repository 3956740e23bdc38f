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

  /** Exact top-k neighbors for each query vector (brute force).
    *
    * Ranking is by cosine rounded to 9 dp with vec_id tiebreak — a total,
    * FP-robust order (1e-15 cross-engine float noise cannot flip a 1e-9
    * bucket except on exact boundaries).
    */
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
    val w   = Window.partitionBy(col("query_id")).orderBy(round(sim, 9).desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(sim, 6).as("sim"), col("rn"))
  }

  /** p-bit random-hyperplane signature per vector, for `tables` independent
    * hash tables. Returns (vec_id, table, bucket). One HyperplaneSig
    * expression computes every table's bucket in a single pass — plane
    * signs are derived deterministically inside the expression (an earlier
    * literal-plane-matrix formulation put ~5k literals in the plan and made
    * PLANNING the dominant cost). `dims` is taken from the data. */
  def hyperplaneBuckets(vectors: DataFrame, dims: Int, bits: Int = 16, tables: Int = 4): DataFrame =
    vectors
      .select(
        col("vec_id"),
        posexplode(graft.functions.VectorFunctions.hyperplane_sig(col("embedding"), bits, tables)))
      .select(col("vec_id"), col("pos").as("table"), col("col").as("bucket"))

  /** ANN top-k via LSH: score only same-bucket candidates (union over
    * tables), exact cosine on that candidate set. Recall < 1 by design;
    * rows-only checked (the exact contract is [[bruteTopK]]). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dims: Int, k: Int, bits: Int = 12, tables: Int = 6): DataFrame = {
    val cb = hyperplaneBuckets(corpus, dims, bits, tables)
      .withColumnRenamed("vec_id", "neighbor_id")
    val qb = broadcast(
      hyperplaneBuckets(queries, dims, bits, tables).withColumnRenamed("vec_id", "query_id"))
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
    val w   = Window.partitionBy(col("query_id")).orderBy(round(sim, 9).desc, col("neighbor_id"))
    candidates
      .join(q, Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(sim, 6).as("sim"), col("rn"))
  }

  /** k-means coarse quantizer trained DRIVER-LOCALLY on a deterministic
    * sample (hash-ordered top-`sampleN` — a TakeOrdered, no full shuffle):
    * the standard IVF recipe (FAISS trains on ~256·nlist points). At 100 TB
    * the cluster never iterates — one O(n log s) sampling pass, then Lloyd's
    * on ≤ sampleN×dims doubles in driver memory. Deterministic: hash order
    * and farthest-point-style init are seed-free functions of the data. */
  private[operators] def trainCoarseQuantizer(
      corpus: DataFrame,
      nlist: Int,
      sampleN: Int,
      iters: Int = 10): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .select(asDoubleVec(col("embedding")).as("v"), xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h"), col("v")(0))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
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
  /** Assign vectors to their nearest centroid cell: the INDEX-BUILD step,
    * reusable incrementally — new vectors are assigned with the stored
    * centroid model, no retraining (write the output per batch; the
    * centroids array is the tiny persistent model). */
  def ivfAssign(corpus: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val cellOf = udf { (v: Seq[Double]) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        var d = 0.0; var i = 0
        val ctr = centroids(c)
        while (i < v.length) { val x = v(i) - ctr(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    corpus
      .select(col("vec_id").as("neighbor_id"), asDoubleVec(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("cell", cellOf(col("cv")))
  }

  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val centroids = trainCoarseQuantizer(corpus, nlist, sampleN = 256 * nlist)
    // assignment is a deterministic function of the model — compute cell
    // membership for corpus rows and the probe list for query rows
    val probesOf = udf { (v: Seq[Double]) =>
      centroids.indices
        .map { c =>
          var d = 0.0; var i = 0
          val ctr = centroids(c)
          while (i < v.length) { val x = v(i) - ctr(i); d += x * x; i += 1 }
          (d, c)
        }
        .sortBy(_._1)
        .take(nprobe)
        .map(_._2)
    }

    val cells = ivfAssign(corpus, centroids)
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), asDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv")))
        .withColumn("cell", explode(probesOf(col("qv")))))

    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val w   = Window.partitionBy(col("query_id")).orderBy(round(sim, 9).desc, col("neighbor_id"))
    q.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(sim, 6).as("sim"), col("rn"))
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

  /** Embedding near-dup pairs, exact: ALL pairs with cosine >= threshold via
    * an O(n²·d) self-join. This is the oracle/baseline path — correct at any
    * threshold, affordable only for small n (thousands). [[cosineDupPairs]]
    * gates into it automatically. */
  def cosineDupPairsExact(vectors: DataFrame, threshold: Double): DataFrame = {
    val withNorm = vectors
      .select(col("vec_id"), asDoubleVec(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val a   = withNorm.select(col("vec_id").as("a_id"), col("v").as("va"), col("n").as("na"))
    val b   = withNorm.select(col("vec_id").as("b_id"), col("v").as("vb"), col("n").as("nb"))
    val sim = dot(col("va"), col("vb")) / (col("na") * col("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim6", round(sim, 6))
      .filter(col("sim6") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim6").as("sim"))
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
    val buckets = hyperplaneBuckets(vectors, dims = 0, bits = bits, tables = tables)
    val candidates = buckets
      .select(col("table"), col("bucket"), col("vec_id").as("a_id"))
      .join(
        buckets.select(col("table"), col("bucket"), col("vec_id").as("b_id")),
        Seq("table", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val withNorm = vectors
      .select(col("vec_id"), asDoubleVec(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val a   = withNorm.select(col("vec_id").as("a_id"), col("v").as("va"), col("n").as("na"))
    val b   = withNorm.select(col("vec_id").as("b_id"), col("v").as("vb"), col("n").as("nb"))
    val sim = dot(col("va"), col("vb")) / (col("na") * col("nb"))
    candidates
      .join(a, Seq("a_id"))
      .join(b, Seq("b_id"))
      .withColumn("sim6", round(sim, 6))
      .filter(col("sim6") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim6").as("sim"))
  }

  /** Embedding near-dup pairs with cosine >= threshold. Size-gated the way
    * Dedup.duplicateClusters gates union-find: at or under `exactGate` rows
    * (one cheap count — parquet metadata at scale) the exact all-pairs join
    * runs (small-corpus/oracle contract, exact at ANY threshold); above it
    * the LSH-bucketed candidates + exact-verify path runs — emitted pairs
    * are still exact, recall ~0.98 at near-dup thresholds (0.9+), and the
    * join is bucket-bounded instead of O(n²). */
  def cosineDupPairs(
      vectors: DataFrame,
      threshold: Double,
      exactGate: Long = 1L << 16,
      bits: Int = 8,
      tables: Int = 12): DataFrame =
    if (vectors.count() <= exactGate) cosineDupPairsExact(vectors, threshold)
    else cosineDupPairsBucketed(vectors, threshold, bits, tables)
}
