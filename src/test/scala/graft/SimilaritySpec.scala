package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  private lazy val emb = Tables(spark, SharedSpark.sf0001).embeddings.cache()

  test("cosine column matches a hand-computed value") {
    import spark.implicits._
    val df = Seq((Array(1.0, 0.0, 2.0), Array(2.0, 1.0, 0.0))).toDF("a", "b")
    val c  = df.select(Similarity.cosine(col("a"), col("b")).as("c")).head().getDouble(0)
    val expected = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(math.abs(c - expected) < 1e-12)
  }

  test("bruteTopK returns k deterministic, correctly-ranked neighbors") {
    val out  = Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 3), k = 5).collect()
    val byQ  = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }) // ranked desc
      assert(!rows.exists(r => r.getLong(1) == r.getLong(0)))      // self excluded
    }
  }

  test("matryoshkaRecall: full-dim truncation is perfect recall, prefix tie inverts it") {
    import spark.implicits._
    // full-length truncation reproduces the truth exactly
    val full = Similarity.matryoshkaRecall(emb, emb.filter(col("vec_id") < 3), k = 5, dims = Seq(64))
      .collect()
    assert(full.length == 3 && full.forall(_.getDouble(3) == 1.0), full.mkString(","))
    // planted: q=(1,.9): full top-1 is B=(1,1); at d=1 all prefixes tie
    // and the id tie-break picks A -> recall 0 at d=1, 1 at d=2
    val tiny = Seq(
      (10L, Array(1.0f, 0.0f)), // A
      (11L, Array(1.0f, 1.0f)), // B
      (12L, Array(1.0f, 0.9f))  // query
    ).toDF("vec_id", "embedding")
    val got = Similarity.matryoshkaRecall(
        tiny, tiny.filter(col("vec_id") === 12L), k = 1, dims = Seq(1, 2))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(3))
      .toMap
    assert(got == Map(1 -> 0.0, 2 -> 1.0), s"got $got")
  }

  test("dbscan: chain geometry — cores, borders to the smallest label, noise") {
    import spark.implicits._
    // angles 0/25/50/75 degrees: adjacent cos ~0.906 >= 0.898, skip cos
    // ~0.64 < 0.898. minPts 2 -> middle nodes core, ends border, 150 noise
    def vec(deg: Double) =
      Array(math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
    val vs = Seq(
      (10L, vec(0)), (11L, vec(25)), (12L, vec(50)), (13L, vec(75)), (14L, vec(150))
    ).toDF("vec_id", "embedding")
    val got = Similarity.dbscan(vs, simThreshold = 0.898, minPts = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(got == Map(
      10L -> (("border", 11L)),
      11L -> (("core", 11L)),
      12L -> (("core", 11L)),
      13L -> (("border", 11L)),
      14L -> (("noise", -1L))), s"got $got")
    // raising minPts to 3 dissolves the chain: no cores, everyone noise
    val strict = Similarity.dbscan(vs, simThreshold = 0.898, minPts = 3)
      .collect().map(_.getString(1)).toSet
    assert(strict == Set("noise"), strict.toString)
  }

  test("hardNegatives: different label, below ceiling, exact top-k among eligible") {
    // Caller passes the PLAIN bound; the operator applies the 5e-7 FP guard
    // internally, so the effective cut sits between the 1e-6 round-6 grid
    // points — sims at 0.400000 survive, 0.400001 and up are cut.
    val cap = 0.4000005
    val out = Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 4), k = 5, maxSim = 0.4).collect()
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length == 5)
      rows.foreach { r =>
        assert(r.getInt(2) == labels(r.getLong(1)))       // neg_label is the corpus label
        assert(r.getInt(2) != labels(qid))                // never the query's own label
        assert(r.getDouble(3) < cap)                      // ceiling enforced
      }
    }
    // cross-check vs the exact path: bruteTopK over the full corpus with the
    // label/ceiling filters applied post-hoc must agree on the top-5 sets
    // when k is large enough that filtering never exhausts the shortlist.
    val brute = Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 4), k = 400).collect()
    byQ.foreach { case (qid, rows) =>
      val expect = brute.filter(_.getLong(0) == qid)
        .filter(r => labels(r.getLong(1)) != labels(qid) && r.getDouble(2) < cap)
        .sortBy(_.getInt(3)).take(5).map(_.getLong(1)).toSet
      assert(rows.map(_.getLong(1)).toSet == expect)
    }
  }

  test("lshTopK recall against bruteTopK is >= 0.9 at the shipped settings") {
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Similarity
      .bruteTopK(emb, queries, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // EXACTLY the ann_lsh_topk gate-query settings (PipelineQueries) — this
    // is the self-oracle that catches a broken hash family or probe logic
    val lsh = Similarity
      .lshTopK(emb, queries, k = 10, bits = 8, tables = 12, probeHamming = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(lsh.nonEmpty)
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"LSH recall $recall below the pinned 0.9 floor")
    // and every LSH hit is scored with the true cosine ranking discipline
    assert(lsh.forall { case (q, n) => q != n })
  }

  test("ivfTopK recall against bruteTopK is >= 0.9 at the shipped settings") {
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // EXACTLY the ann_ivf_topk gate-query settings (PipelineQueries)
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 8, assign = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall below the pinned 0.9 floor")
  }

  test("ivfTopKQ8 recall against bruteTopK is >= 0.9 at the shipped settings") {
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // EXACTLY the ann_ivf_int8 gate-query settings (PipelineQueries)
    val q8 = Similarity.ivfTopKQ8(emb, queries, k = 10, nlist = 16, nprobe = 8, assign = 3, rerank = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q8.nonEmpty)
    val recall = q8.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"int8-IVF recall $recall below the pinned 0.9 floor")
  }

  test("recallAudit: gate-query settings, one row per method, >= 0.9, audit == independent overlap") {
    val queries = emb.filter(col("vec_id") < 8)
    val audit = Similarity
      .recallAudit(emb, queries, k = 10, nlist = 16, nprobe = 8, assign = 3, rerank = 4,
        bits = 8, tables = 12, probeHamming = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(audit.keySet == Set("ivf", "ivf_int8", "lsh"))
    val brute = Similarity.bruteTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def overlap(df: org.apache.spark.sql.DataFrame): Long =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(brute).size.toLong
    val expected = Map(
      "ivf" -> overlap(Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 8, assign = 3)),
      "ivf_int8" -> overlap(
        Similarity.ivfTopKQ8(emb, queries, k = 10, nlist = 16, nprobe = 8, assign = 3, rerank = 4)),
      "lsh" -> overlap(Similarity.lshTopK(emb, queries, k = 10, bits = 8, tables = 12, probeHamming = 2)))
    audit.foreach { case (m, (nTrue, nHits, recall)) =>
      assert(nTrue == brute.size.toLong, s"$m n_true")
      assert(nHits == expected(m), s"$m audit hits must equal the independent overlap")
      assert(recall >= 0.9, s"$m recall $recall below the pinned 0.9 floor")
    }
  }

  test("IVF index lifecycle: build → persist via catalog → reload → serve identically") {
    import spark.implicits._
    val queries   = emb.filter(col("vec_id") < 6)
    val centroids = Similarity.trainCoarseQuantizer(emb, nlist = 8, sampleN = 512)
    val cells     = Similarity.ivfAssign(emb, centroids, assign = 2)
    val inMem = Similarity.ivfSearch(cells, queries, centroids, k = 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(inMem.nonEmpty)

    // persist BOTH artifacts — the cell index and the tiny centroid model —
    // through the catalog's versioned publish, then serve from the reload
    val cat = new graft.sources.Catalog(
      spark, java.nio.file.Files.createTempDirectory("graft_ann_index_").toString)
    cat.putTable("ann_cells", cells)
    cat.putTable(
      "ann_model",
      centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid"))

    val reloadedModel = cat.readTable("ann_model")
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    val served = Similarity
      .ivfSearch(cat.readTable("ann_cells"), queries, reloadedModel, k = 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(served == inMem, "the persisted index must answer exactly like the in-memory one")
  }

  test("int8 quantized cosine approximates the exact cosine within quantization error") {
    import spark.implicits._
    import graft.functions.VectorFunctions.{vec_dot_q8, vec_q8}
    val rnd  = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val pairs = (0 until 200).map(_ => (unit(), unit())).toDF("a", "b")
    val rows = pairs
      .withColumn("qa", vec_q8(col("a")))
      .withColumn("qb", vec_q8(col("b")))
      .select(
        Similarity.cosine(col("a"), col("b")).as("exact"),
        (col("qa.scale") * col("qb.scale") * vec_dot_q8(col("qa.q"), col("qb.q"))).as("approx"))
      .collect()
    val maxErr = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    // per-element error <= scale/2 ~ maxAbs/254; accumulated over d=64 unit
    // vectors the observed error is ~1e-2 — pin an order-of-magnitude bound
    assert(maxErr < 0.05, s"quantized cosine max error $maxErr")
  }

  test("hyperplane buckets are deterministic") {
    val b1 = Similarity.hyperplaneBuckets(emb, bits = 8, tables = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b2 = Similarity.hyperplaneBuckets(emb, bits = 8, tables = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(b1 == b2)
  }

  test("cosineDupPairs is symmetric-free and threshold-filtered") {
    val pairs = Similarity.cosineDupPairs(emb, 0.4).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  /** Planted near-dup corpus: `n` deterministic base vectors, each with a
    * slightly-perturbed copy (cosine ≈ 0.99+) — ground truth for the
    * bucketed path's recall. */
  private def plantedNearDups(n: Int, dims: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until n).flatMap { i =>
      val base = Array.fill(dims)(rnd.nextGaussian().toFloat)
      val near = base.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, near))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("bucketed dup pairs: no quadratic join in the plan, exact-verified output") {
    val vecs = plantedNearDups(64, dims = 32)
    val bucketed = Similarity.cosineDupPairsBucketed(vecs, threshold = 0.95)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "bucketed path must not cross-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "bucketed path must equi-join on buckets")
    // precision 1.0 by construction: every emitted pair passed the exact check
    val exact = Similarity.cosineDupPairsExact(vecs, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "bucketed output must be a subset of the exact pairs")
    // recall at near-dup threshold: expected ~1.0 with bits=8 x 12 tables
    assert(exact.nonEmpty)
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"bucketed recall $recall too low at threshold 0.95")
  }

  test("incremental dup pairs == full pairs restricted to new-touching, no old×old emitted") {
    val newVecs = emb.filter(col("vec_id") % 2 === 1)
    val oldVecs = emb.filter(col("vec_id") % 2 === 0)
    val incr = Similarity.cosineDupPairsIncremental(newVecs, oldVecs, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = Similarity.cosineDupPairsExact(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = full.filter { case ((a, b), _) => a % 2 == 1 || b % 2 == 1 }
    assert(expected.nonEmpty)
    assert(incr == expected)
    assert(incr.keys.forall { case (a, b) => a % 2 == 1 || b % 2 == 1 })
  }

  test("incremental bucketed path: exact-verified subset, high recall, no quadratic join") {
    val vecs    = plantedNearDups(64, dims = 32)
    val newVecs = vecs.filter(col("vec_id") % 4 < 2)  // mix of bases and copies
    val oldVecs = vecs.filter(col("vec_id") % 4 >= 2)
    val bucketed = Similarity.cosineDupPairsIncrementalBucketed(newVecs, oldVecs, threshold = 0.95)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val exact = Similarity.cosineDupPairsIncrementalExact(newVecs, oldVecs, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(got.subsetOf(exact), "bucketed output must be exact-verified")
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"incremental bucketed recall $recall")
  }

  test("cosineDupPairs size gate dispatches to the bucketed path above the gate") {
    val vecs = plantedNearDups(16, dims = 16)
    // gate=0 forces the scale path; same exact-verified contract
    val gated = Similarity.cosineDupPairs(vecs, threshold = 0.95, exactGate = 0)
    val plan  = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val exact = Similarity.cosineDupPairsExact(vecs, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = gated.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
  }

  // single-node Lloyd's with EXACTLY the kmeans contract (lowest-id seed,
  // unit sphere, argmin ties to lower index, empty cell keeps centroid) —
  // the distributed version must reproduce it bit-for-bit on assignments
  private def lloydReference(
      data: Array[(Long, Array[Double])],
      k: Int,
      iters: Int): (Map[Long, Int], Array[Array[Double]]) = {
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    val pts = data.sortBy(_._1).map { case (id, v) => (id, unit(v)) }
    var cs = pts.take(k).map(_._2.map(identity))
    def nearest(v: Array[Double]): Int =
      cs.zipWithIndex.minBy { case (c, i) => (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, i) }._2
    for (_ <- 0 until iters) {
      val byCell = pts.groupBy { case (_, v) => nearest(v) }
      cs = cs.zipWithIndex.map { case (old, i) =>
        byCell.get(i) match {
          case Some(members) =>
            val d = old.length
            // mirror the engine's arithmetic EXACTLY: each coordinate cast
            // to DECIMAL(38,18) (HALF_UP), summed exactly, decimal→double,
            // then double division — so centroids are bit-identical and the
            // assignment comparison below can never flake on a near-tie
            Array.tabulate(d) { j =>
              val s = members
                .map(m => BigDecimal(m._2(j)).setScale(18, BigDecimal.RoundingMode.HALF_UP))
                .sum
              s.toDouble / members.length
            }
          case None => old
        }
      }
    }
    (pts.map { case (id, v) => id -> nearest(v) }.toMap, cs)
  }

  test("kmeans: distributed Lloyd's == single-node reference, assignments exact") {
    val iters = 4
    val r = Similarity.kmeans(emb, k = 6, maxIter = iters)
    assert(r.iters <= iters)
    val data = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(row => (row.getLong(0), row.getSeq[Double](1).toArray))
    // reference runs the iterations the engine actually ran (it may have
    // converged early), then assigns with the final model — same as engine
    val (refAssign, refCs) = lloydReference(data, k = 6, iters = r.iters)
    val got = r.assignments.collect().map(row => row.getLong(0) -> row.getInt(1)).toMap
    assert(got == refAssign)
    // decimal-mirrored arithmetic → centroids bit-identical, not merely close
    r.centroids.zip(refCs).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    }
  }

  test("kmeans: inertia is non-increasing over iterations, runs deterministic") {
    val i1 = Similarity.kmeans(emb, k = 8, maxIter = 1).inertia
    val i3 = Similarity.kmeans(emb, k = 8, maxIter = 3).inertia
    val i8 = Similarity.kmeans(emb, k = 8, maxIter = 8).inertia
    assert(i1 >= i3 - 1e-9 && i3 >= i8 - 1e-9, s"inertia not monotone: $i1 $i3 $i8")
    val a = Similarity.kmeans(emb, k = 8, maxIter = 3)
      .assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Similarity.kmeans(emb, k = 8, maxIter = 3)
      .assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("kmeans parallel init escapes pathological id-ordered seeding, stays deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 4 tight blobs on orthogonal axes; ids assigned so the first four ids
    // (the "ids" seeds at k=4) ALL sit in blob 0 — worst case for cheap
    // seeding, the case k-means|| exists for
    val dim = 8
    val rows = for (b <- 0 until 4; i <- 0 until 25) yield {
      val v = new Array[Float](dim)
      v(b * 2) = 1f
      for (j <- 0 until dim) v(j) += (0.02 * rnd.nextGaussian()).toFloat
      (b * 25L + i, v) // ids 0..24 are blob 0, 25..49 blob 1, ...
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val ids = Similarity.kmeans(vecs, k = 4, maxIter = 15)
    val par = Similarity.kmeans(vecs, k = 4, maxIter = 15, initMode = "parallel")
    assert(par.inertia < ids.inertia * 0.5,
      s"parallel init should beat in-blob seeding: ${par.inertia} vs ${ids.inertia}")
    // parallel mode recovers the 4 planted blobs exactly
    val byBlob = par.assignments.collect()
      .groupBy(r => r.getLong(0) / 25).view.mapValues(_.map(_.getInt(1)).distinct.toSeq)
    assert(byBlob.values.forall(_.length == 1), s"each blob one cluster: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 4, "four distinct clusters")
    // derandomized init: a second run is bit-identical
    val again = Similarity.kmeans(vecs, k = 4, maxIter = 15, initMode = "parallel")
    assert(par.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      again.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq)
  }

  test("kmeans: every vector assigned, clusters within range, k > n degenerates safely") {
    val r = Similarity.kmeans(emb.limit(5), k = 16, maxIter = 2)
    val rows = r.assignments.collect()
    assert(rows.length == 5)
    assert(rows.forall(x => x.getInt(1) >= 0 && x.getInt(1) < r.centroids.length))
  }

  test("zero-norm vectors never emit pairs (0/0 NaN would pass Spark's NaN-largest filter)") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f)), // cosine undefined — must not pair with anything
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(1f, 0.01f, 0f))).toDF("vec_id", "embedding")
    val exact = Similarity.cosineDupPairsExact(vecs, threshold = 0.5).collect()
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(exact.forall(r => !r.getDouble(2).isNaN))
    val sem = Similarity.semanticDupPairs(vecs, threshold = 0.5, k = 1, maxIter = 1).collect()
    assert(sem.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(sem.forall(r => !r.getDouble(2).isNaN))
  }

  test("semanticDupPairs: exact-verified subset of all-pairs, high recall on planted dups") {
    // planted corpus: each base vector has a cosine≈0.99 twin — the SemDeDup
    // regime (true near-dups are FAR tighter than cell diameters)
    val vecs = plantedNearDups(64, dims = 32)
    val threshold = 0.95
    val exact = Similarity.cosineDupPairsExact(vecs, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val sem = Similarity.semanticDupPairs(vecs, threshold, k = 8, maxIter = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact), "every emitted pair must be exact-cosine-verified")
    val recall = sem.size.toDouble / exact.size
    assert(recall >= 0.9, s"cell co-location recall $recall (${sem.size}/${exact.size})")
    // and on the real corpus the gate-query settings return a sane shape
    val gate = Similarity.semanticDupPairs(emb, threshold = 0.4, k = 10, maxIter = 5)
    val rows = gate.collect()
    assert(rows.nonEmpty, "gate settings must produce pairs on the sf corpus")
    assert(rows.forall(_.getDouble(2) >= 0.4))
  }

  test("randomProject: deterministic, norm-preserving in expectation, loud on bad dims") {
    import spark.implicits._
    val proj = Similarity.randomProject(emb, "vec_id", "embedding", inDim = 64, outDim = 16)
    // deterministic literal sign matrix: two plans, identical output
    val a = proj.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Similarity.randomProject(emb, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    assert(a.head._2.length == 16)
    // E[||proj||^2] = ||v||^2 (Achlioptas): the corpus-mean ratio concentrates
    val exact = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => x * x).sum).toMap
    val ratios = a.map { case (id, p) => p.map(x => x * x).sum / exact(id) }
    val mean   = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean squared-norm ratio $mean drifted from 1")
    // a different seed gives a different (but equally deterministic) projection
    val c = Similarity.randomProject(emb, "vec_id", "embedding", 64, 16, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(c != a)
    // wrong declared dim fails loudly instead of silently projecting garbage
    val bad = Seq((1L, Array(1f, 2f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      Similarity.randomProject(bad, "vec_id", "embedding", inDim = 64, outDim = 16).collect()
    }
  }

  test("PCA: unit component, partitioning-deterministic, recovers a planted dominant direction") {
    val embs = graft.sources.Tables(spark, SharedSpark.sf0001).embeddings
    val m = Similarity.pcaFit(embs, "vec_id", "embedding", iters = 8)
    assert(m.means.length == 64 && m.component.length == 64)
    // power iteration normalizes every round: ||v|| == 1 up to the 1e-9
    // grid (64 gridded squares + a gridded norm → ~1e-6 accumulated slack)
    val norm = math.sqrt(m.component.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"component norm $norm")
    // the exact-decimal moments make the model invariant to partitioning
    val m2 = Similarity.pcaFit(embs.repartition(17), "vec_id", "embedding", iters = 8)
    assert(m2.component.sameElements(m.component) && m2.means.sameElements(m.means))
    // planted anisotropy: dim 0 carries 10x the variance of the rest —
    // the component must align overwhelmingly with dim 0
    import spark.implicits._
    val planted = (0 until 200).map { i =>
      val arr = Array.tabulate(64)(j => (((i * 31 + j * 17) % 13) - 6).toFloat / 60f)
      arr(0) = (if (i % 2 == 0) 1f else -1f) * (1f + (i % 5) / 10f)
      (i.toLong, arr)
    }.toDF("vec_id", "embedding")
    val pm = Similarity.pcaFit(planted, "vec_id", "embedding", iters = 8)
    assert(math.abs(pm.component(0)) > 0.9, s"dominant dim loading ${pm.component(0)}")
    // projection scores separate the two planted signs
    val scores = Similarity.pcaProject(planted, "vec_id", "embedding", iters = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val even = (0 until 200 by 2).map(i => scores(i.toLong))
    val odd  = (1 until 200 by 2).map(i => scores(i.toLong))
    assert(even.min * odd.max < 0, "sign groups must land on opposite sides of the component")
  }

  test("PQ: codebooks partition-deterministic, codes in range, ADC recall vs brute L2") {
    val emb = graft.sources.Tables(spark, SharedSpark.sf0001).embeddings
    val model = Similarity.pqTrain(emb, m = 8, k = 16, iters = 3)
    assert(model.m == 8 && model.dsub == 8)
    // decimal-exact training: identical books at any parallelism
    val model2 = Similarity.pqTrain(emb.repartition(13), m = 8, k = 16, iters = 3)
    (0 until 8).foreach { s =>
      val a = model.codebooks(s).map(_.toSeq).toSeq
      val b = model2.codebooks(s).map(_.toSeq).toSeq
      assert(a == b, s"sub $s differs")
    }
    val codes = Similarity.pqCodes(emb, model).collect()
    assert(codes.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 16))
    val n = emb.count()
    assert(codes.length == n * 8, "one code per (vector, subspace)")

    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val got = Similarity.pqSearch(emb, queries, model, k = 10, rerank = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    // driver brute L2 top-10
    val all = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var hit = 0; var tot = 0
    (0L until 8L).foreach { q =>
      val brute = all.keys.filter(_ != q).toSeq
        .sortBy(id => (d2(all(q), all(id)), id)).take(10).toSet
      hit += got(q).intersect(brute).size; tot += 10
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.8, s"PQ ADC recall $recall below floor")
    // every query returns exactly k ranked rows
    got.foreach { case (_, ns) => assert(ns.size == 10) }
  }

  test("ivfPq: recall vs brute cosine at gate settings, k ranked rows per query") {
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPq(
      emb, queries, nlist = 16, coarseIters = 5, m = 8, pqK = 16, pqIters = 3,
      nprobe = 8, k = 10, rerank = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val pairs = got.map(x => (x._1, x._2)).toSet
    // residual-PQ shortlist under nprobe=8/16 cells: recall floor 0.7 on
    // the isotropic worst case (raw PQ measured 0.64 at rerank=4; the
    // coarse+residual composition with rerank=10 recovers most of it)
    val recall = pairs.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"IVF-PQ recall $recall below floor")
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == 10, s"query $q returned ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq == (1 to 10), s"ranks not dense for $q")
    }
  }

  test("pcaFitK: component 0 ≡ pcaFit, orthogonal spectrum, planted two-direction recovery") {
    val embs = graft.sources.Tables(spark, SharedSpark.sf0001).embeddings
    val m1 = Similarity.pcaFit(embs, "vec_id", "embedding", iters = 8)
    val mk = Similarity.pcaFitK(embs, "vec_id", "embedding", iters = 8, nComponents = 2)
    // deflation is strictly additive: the first component is bit-identical
    assert(mk.components(0).sameElements(m1.component) && mk.means.sameElements(m1.means))
    // positivity + near-ordering on a real covariance: the corpus spectrum
    // is close to isotropic, so a FIXED 8-iteration budget may stop with
    // λ0 marginally under λ1 (the iteration count is the contract, not
    // convergence — same clause as pcaFit's scaladoc); strict ordering is
    // asserted on the planted separated spectrum below
    assert(mk.eigenvalues.forall(_ > 0), mk.eigenvalues.toSeq)
    assert(mk.eigenvalues(0) >= mk.eigenvalues(1) * 0.9, mk.eigenvalues.toSeq)
    assert(mk.trace > mk.eigenvalues.sum, "explained variance cannot exceed total")
    // loose orthogonality on the near-degenerate spectrum (an unconverged
    // v1 leaves deflation residual along itself); tight on planted below
    val dot = mk.components(0).zip(mk.components(1)).map { case (x, y) => x * y }.sum
    assert(math.abs(dot) < 0.2, s"components grossly non-orthogonal: $dot")
    // partitioning-invariant like the single-component path
    val mk2 = Similarity.pcaFitK(embs.repartition(17), "vec_id", "embedding", iters = 8, nComponents = 2)
    assert(mk2.components(1).sameElements(mk.components(1)) && mk2.eigenvalues.sameElements(mk.eigenvalues))
    // planted: dim 0 dominates, dim 1 second — components align in order
    import spark.implicits._
    val planted = (0 until 200).map { i =>
      val arr = Array.tabulate(64)(j => (((i * 31 + j * 17) % 13) - 6).toFloat / 600f)
      arr(0) = (if (i % 2 == 0) 1f else -1f) * (1f + (i % 5) / 10f)
      arr(1) = (if (i % 3 == 0) 0.5f else -0.25f) * (1f + (i % 7) / 10f)
      (i.toLong, arr)
    }.toDF("vec_id", "embedding")
    val pk = Similarity.pcaFitK(planted, "vec_id", "embedding", iters = 8, nComponents = 2)
    assert(math.abs(pk.components(0)(0)) > 0.9, s"c0 dim0 ${pk.components(0)(0)}")
    assert(math.abs(pk.components(1)(1)) > 0.9, s"c1 dim1 ${pk.components(1)(1)}")
    assert(pk.eigenvalues(0) > pk.eigenvalues(1), pk.eigenvalues.toSeq)
    // separated spectrum → converged v1 → deflation leaves v2 ⊥ v1 tightly
    val pdot = pk.components(0).zip(pk.components(1)).map { case (x, y) => x * y }.sum
    assert(math.abs(pdot) < 1e-3, s"planted components not orthogonal: $pdot")
    // explained ratios from the frame API match the model and sum below 1
    val ev = Similarity.pcaExplainedVariance(planted, "vec_id", "embedding", 8, 2)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(ev(0)._2 == pk.eigenvalues(0) && ev(1)._2 == pk.eigenvalues(1))
    assert(ev.map(_._3).sum < 1.0 && ev.forall(_._3 > 0))
  }

  test("pcaFitK orthoTol guard: orthogonal components on the isotropic corpus, default path untouched") {
    val embs = graft.sources.Tables(spark, SharedSpark.sf0001).embeddings
    // the near-isotropic corpus spectrum is exactly where the fixed budget
    // leaves deflation residual along an unconverged v1 — the guard must
    // drive |v1·v2| below 1e-3 where the default budget cannot promise it
    val g = Similarity.pcaFitK(embs, "vec_id", "embedding", iters = 8, nComponents = 3, orthoTol = 1e-6)
    for (a <- 0 until 3; b <- (a + 1) until 3) {
      val dot = g.components(a).zip(g.components(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-3, s"guarded components $a,$b not orthogonal: $dot")
    }
    assert(g.eigenvalues.forall(_ > 0) && g.trace > g.eigenvalues.sum)
    // deterministic under repartitioning, like the default path
    val g2 = Similarity.pcaFitK(
      embs.repartition(17), "vec_id", "embedding", iters = 8, nComponents = 3, orthoTol = 1e-6)
    assert(g2.components(2).sameElements(g.components(2)) && g2.eigenvalues.sameElements(g.eigenvalues))
    // orthoTol = 0 is bit-identical to the pre-guard behavior (the oracle
    // contract): same components as an explicit default call
    val d0 = Similarity.pcaFitK(embs, "vec_id", "embedding", iters = 8, nComponents = 2)
    val d1 = Similarity.pcaFitK(embs, "vec_id", "embedding", iters = 8, nComponents = 2, orthoTol = 0.0)
    assert(d0.components(0).sameElements(d1.components(0)) && d0.components(1).sameElements(d1.components(1)))
  }

  test("mmrSelect: low lambda swaps the duplicate for the diverse pick, lambda=1 is pure top-k, deterministic") {
    import spark.implicits._
    // query along x; ids 1,2 collinear with it (mutual sim exactly 1),
    // id 3 at 45 degrees (rel = sim-to-twins = 1/sqrt(2))
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0)), (1L, Array(2.0, 0.0, 0.0)),
      (2L, Array(3.0, 0.0, 0.0)), (3L, Array(1.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val lo = Similarity.mmrSelect(vecs, queryId = 0L, poolSize = 3, k = 2, lambda = 0.25)
      .collect().sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getLong(1)))
    assert(lo.toSeq == Seq((1, 1L), (2, 3L)), lo.mkString(",")) // diversity beats the twin
    val hi = Similarity.mmrSelect(vecs, queryId = 0L, poolSize = 3, k = 2, lambda = 1.0)
      .collect().sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getLong(1)))
    assert(hi.toSeq == Seq((1, 1L), (2, 2L)), hi.mkString(",")) // pure relevance keeps both twins
    val again = Similarity.mmrSelect(vecs.repartition(5), queryId = 0L, poolSize = 3, k = 2, lambda = 0.25)
      .collect().sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getLong(1)))
    assert(again.sameElements(lo))
  }

  test("VecNearestCells codegen == reference nearestCells bit-for-bit, ties included, fallback off") {
    import spark.implicits._
    // deterministic vectors with PLANTED exact ties: centroid 5 == centroid 2
    def vec(seed: Long, d: Int): Array[Double] =
      Array.tabulate(d)(i => ((graft.functions.Mix64.mix(seed * 31 + i) >>> 11).toDouble / (1L << 53)) - 0.5)
    val d         = 8
    val centroids = Array.tabulate(6)(c => if (c == 5) vec(2L, d) else vec(c.toLong, d))
    val rows      = (0 until 200).map(i => (i.toLong, vec(1000L + i, d).toSeq)) :+
      (999L, Array.fill(d)(0.0).toSeq) // zero vector: normalization no-op branch
    val df = rows.toDF("vec_id", "embedding")
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false") // codegen must COMPILE
    try {
      for (m <- Seq(1, 3, 6)) {
        val got = df
          .select(col("vec_id"),
            graft.functions.VectorFunctions.vec_nearest_cells(col("embedding"), centroids, m).as("cells"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq)
          .toMap
        rows.foreach { case (id, emb) =>
          val want = Similarity.nearestCells(Similarity.normalized(emb.toArray), centroids, m)
          assert(got(id) == want, s"id=$id m=$m: got ${got(id)}, reference $want")
        }
        // the planted duplicate centroid must keep ascending-index tie order
        val full = got(0L)
        if (m == 6) assert(full.indexOf(2) < full.indexOf(5), s"tie order broke: $full")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("binaryQuantize packs sign bits exactly; bqTopK reranks true cosines with high recall") {
    import spark.implicits._
    // hand packing: dim 3, bits (1,0,1) -> word 0b101 = 5
    val tiny = Seq((1L, Array(1.0f, -1.0f, 2.0f)), (2L, Array(-0.5f, 0.5f, -0.1f)))
      .toDF("vec_id", "embedding")
    val packed = Similarity.binaryQuantize(tiny, dim = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(packed(1L) == Seq(5L), packed(1L).toString)
    assert(packed(2L) == Seq(2L), packed(2L).toString)
    // two words: bit 0 and bit 64 set
    val wide = Seq((7L, Array.tabulate(70)(i => if (i == 0 || i == 64) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val pw = Similarity.binaryQuantize(wide, dim = 70).collect().head.getSeq[Long](1)
    assert(pw == Seq(1L, 1L), pw.toString)

    // corpus: rerank emits TRUE cosines (equal to brute's for shared pairs)
    // and recall at the gate settings stays high
    val emb = graft.sources.Tables(spark, SharedSpark.sf0001).embeddings
    val queries = emb.filter(col("vec_id") < 8)
    val bq = Similarity.bqTopK(emb, queries, dim = 64, k = 10, candidates = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = Similarity.bruteTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = bq.keySet.intersect(brute.keySet)
    assert(shared.forall(p2 => bq(p2) == brute(p2)), "reranked sims must be the exact cosines")
    val recall = shared.size.toDouble / brute.size
    assert(recall >= 0.9, s"bq recall $recall below 0.9 at gate settings (150 candidates = 30% of the corpus hamming-scanned)")

    // an exact duplicate has hamming 0 -> always survives and ranks first
    val dup = emb.limit(0).unionByName(
      Seq((9999L, Array.tabulate(64)(i => (math.sin(i + 1) * 100).toFloat), 0))
        .toDF("vec_id", "embedding", "label")
        .unionByName(Seq((9998L, Array.tabulate(64)(i => (math.sin(i + 1) * 100).toFloat), 0))
          .toDF("vec_id", "embedding", "label")))
    val both = emb.unionByName(dup)
    val r = Similarity.bqTopK(both, both.filter(col("vec_id") === 9999L), dim = 64, k = 3, candidates = 20)
      .collect().sortBy(_.getInt(3))
    assert(r.head.getLong(1) == 9998L && r.head.getDouble(2) == 1.0, r.mkString(";"))
  }

  test("autoProbe: stops at the first ladder rung meeting the target; recall monotone in nprobe") {
    val emb     = graft.sources.Tables(spark, SharedSpark.sf0001).embeddings
    val queries = emb.filter(col("vec_id") < 8)

    // target 1.0 forces the FULL ladder: nprobe = nlist probes every cell,
    // recovers the brute candidate set, recall exactly 1.0
    val (allChosen, allTrace) = Similarity.autoProbe(
      emb, queries, k = 10, recallTarget = 1.0, nlist = 16, assign = 3)
    val full = allTrace.collect()
      .map(r => (r.getInt(0), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(full.map(_._1) == Seq(1, 2, 4, 8, 16), full.toString)
    assert(full.map(_._2) == full.map(_._2).sorted,
      s"recall must be non-decreasing in nprobe (candidate sets are supersets): $full")
    assert(full.last._2 == 1.0 && full.last._3 && allChosen == 16, full.toString)
    assert(full.init.forall(!_._3), "only the stopping rung may be marked chosen")

    // a reachable target stops the walk EARLY with a prefix of that ladder
    val reachable = full.map(_._2).filter(_ < 1.0).lastOption.getOrElse(0.5)
    val (chosen, trace) = Similarity.autoProbe(
      emb, queries, k = 10, recallTarget = reachable, nlist = 16, assign = 3)
    val walked = trace.collect()
      .map(r => (r.getInt(0), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(walked.map(_._1) == full.map(_._1).take(walked.size),
      "early-stopped walk must be a prefix of the full ladder")
    assert(walked.size < full.size, "a below-1.0 target should stop before the last rung")
    assert(walked.last._3 && chosen == walked.last._1)
    assert(walked.init.forall { case (_, r, c) => !c && r < reachable }, walked.toString)
    // the walk's per-rung recalls replay the full ladder's (determinism)
    assert(walked.map(_._2) == full.map(_._2).take(walked.size))
  }

  test("autoProbeLsh: radius ladder early-stops; unreachable targets end honestly unchosen") {
    val emb     = graft.sources.Tables(spark, SharedSpark.sf0001).embeddings
    val queries = emb.filter(col("vec_id") < 8)
    // hardest target: walk as far as the ladder allows
    val (c0, t0) = Similarity.autoProbeLsh(
      emb, queries, k = 10, recallTarget = 1.0, bits = 8, tables = 12, maxRadius = 2)
    val full = t0.collect().map(r => (r.getInt(0), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(full.map(_._1) == (0 until full.size), full.toString)
    assert(full.map(_._2) == full.map(_._2).sorted,
      s"recall must be non-decreasing in radius (probe balls are supersets): $full")
    if (c0 == -1) assert(full.size == 3 && full.forall(!_._3), full.toString)
    else assert(full.last._3 && c0 == full.last._1 && full.init.forall(!_._3), full.toString)

    // a target equal to rung 0's own recall stops immediately
    val (c1, t1) = Similarity.autoProbeLsh(
      emb, queries, k = 10, recallTarget = full.head._2, bits = 8, tables = 12, maxRadius = 2)
    assert(c1 == 0 && t1.count() == 1)

    // an index too weak for the target: single table, exact-bucket probing
    // only — the walk exhausts the ladder and says so, never best-efforts
    val (c2, t2) = Similarity.autoProbeLsh(
      emb, queries, k = 10, recallTarget = 0.99, bits = 12, tables = 1, maxRadius = 0)
    val weak = t2.collect().map(r => (r.getDouble(3), r.getBoolean(4)))
    assert(c2 == -1 && weak.length == 1 && !weak.head._2 && weak.head._1 < 0.99, weak.toString)
  }

  test("binaryQuantize: a truncated embedding fails loudly, never packs silent 0-bits") {
    import spark.implicits._
    val bad = Seq((1L, Array(1.0f, -1.0f, 2.0f)), (2L, Array(1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](Similarity.binaryQuantize(bad, dim = 3).collect())
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") + Option(t.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
    assert(msg(e).contains("shorter than dim"), msg(e))
    // oversized is fine: extra dimensions are simply not packed
    val over = Seq((3L, Array(1.0f, -1.0f, 2.0f, 9.0f))).toDF("vec_id", "embedding")
    val p = Similarity.binaryQuantize(over, dim = 3).collect().head.getSeq[Long](1)
    assert(p == Seq(5L), p.toString)
  }

}
