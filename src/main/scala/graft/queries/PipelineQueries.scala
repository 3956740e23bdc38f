package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, DataQuality, Dedup, LanguageModel, Multimodal, Similarity}
import graft.sources.Tables

/** Training-data pipeline operators registered for the correctness gate:
  * dedup (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine)
  * and similarity search (brute-force + LSH ANN).
  *
  * Oracle notes: thresholds are chosen from the corpus's actual similarity
  * structure (planted near-dup pairs sit at jaccard >= 0.9 with a clean gap
  * below 0.1; embedding cosines top out ~0.5) so every query returns
  * non-empty, boundary-safe output. FP-sensitive comparisons go through
  * round(·, 6) on BOTH engines.
  */
object PipelineQueries {

  /** Shared WITH-chain prefix replaying [[Similarity.kmeans]] (initMode =
    * "ids", tol = 0) in DuckDB — the unrolled-iteration discipline of the
    * pagerank/LPA oracles applied to Lloyd's:
    *  - `nv`: unit-normalized double vectors (float→double cast exact,
    *    left-fold dot ≡ VecDot's sequential sum, IEEE sqrt/divide);
    *  - `c0`: the k lowest-vec_id vectors, cluster = rank − 1 (the
    *    collect order of the Spark seeder);
    *  - per round: `a{i}` assigns by ROW_NUMBER over (dist2 ASC, cluster
    *    ASC) — exactly VecNearest's strict-< argmin with its lower-index
    *    tie-break, with dist2 the same ascending-i left fold; `m{i}` sums
    *    coordinates as DECIMAL(38,18) (exact, order-free — the engine's
    *    partition-order-independence trick replayed verbatim) and divides
    *    in double; `c{i}` keeps the previous centroid for empty cells.
    * Spark stops early only at an exact fixpoint (tol = 0), where further
    * unrolled rounds are identities — iteration counts can't diverge. */
  private def kmeansCellsPrefix(k: Int, iters: Int, dim: Int = 64, trainWhere: String = ""): String = {
    val d1 = dim + 1
    // tv = the TRAINING set (all vectors unless a subset predicate is
    // given — the incremental-index rows train on a slice and assign
    // everything); init and every round run on tv, downstream assignment
    // CTEs keep using nv (all vectors)
    val head =
      s"""WITH v0 AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         nrm AS MATERIALIZED (SELECT vec_id, x, sqrt(list_reduce(list_transform(x, t -> t * t), (a, b) -> a + b)) AS nr FROM v0),
         nv AS MATERIALIZED (SELECT vec_id, CASE WHEN nr > 0 THEN list_transform(x, t -> t / nr) ELSE x END AS v FROM nrm),
         tv AS MATERIALIZED (SELECT vec_id, v FROM nv $trainWhere),
         c0 AS MATERIALIZED (SELECT cluster, cv FROM (
              SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv FROM tv) WHERE cluster < $k)"""
    val rounds = (1 to iters)
      .map { it =>
        val p = it - 1
        s"""a$it AS MATERIALIZED (SELECT vec_id, cluster, v FROM (
              SELECT nv.vec_id, c.cluster, nv.v,
                     ROW_NUMBER() OVER (PARTITION BY nv.vec_id ORDER BY
                       list_reduce(list_transform(range(1, $d1), i -> (nv.v[i] - c.cv[i]) * (nv.v[i] - c.cv[i])), (a, b) -> a + b) ASC,
                       c.cluster ASC) AS rk
              FROM tv AS nv CROSS JOIN c$p c) WHERE rk = 1),
            m$it AS MATERIALIZED (SELECT cluster, list(m ORDER BY pos) AS cv FROM (
              SELECT cluster, pos, CAST(SUM(CAST(val AS DECIMAL(38, 18))) AS DOUBLE) / COUNT(*) AS m
              FROM (SELECT cluster, unnest(range(1, $d1)) - 1 AS pos, unnest(v) AS val FROM a$it)
              GROUP BY cluster, pos) GROUP BY cluster),
            c$it AS MATERIALIZED (SELECT c$p.cluster AS cluster, COALESCE(m$it.cv, c$p.cv) AS cv
              FROM c$p LEFT JOIN m$it ON c$p.cluster = m$it.cluster)"""
      }
      .mkString(",\n")
    val finalAssign =
      s"""af AS MATERIALIZED (SELECT vec_id, cluster FROM (
            SELECT nv.vec_id, c.cluster,
                   ROW_NUMBER() OVER (PARTITION BY nv.vec_id ORDER BY
                     list_reduce(list_transform(range(1, $d1), i -> (nv.v[i] - c.cv[i]) * (nv.v[i] - c.cv[i])), (a, b) -> a + b) ASC,
                     c.cluster ASC) AS rk
            FROM nv CROSS JOIN c$iters c) WHERE rk = 1)"""
    s"$head,\n$rounds,\n$finalAssign"
  }

  /** DuckDB replay of [[Similarity.pcaFit]]: 1e-9-grid inputs, exact-
    * decimal covariance moments, then `iters` unrolled power iterations —
    * each re-gridding raw = Σ grid(C·v), norm = √(Σ grid(raw²)),
    * v = grid(raw/norm), the same fixed double sequences the driver runs.
    * v0 = round(1/√64, 9) = 0.125 exactly. Exposes cx (centered arrays)
    * and v`iters` (the component, 1-based dims). */
  private def pcaPrefix(iters: Int): String = {
    val head =
      s"""WITH ncte AS (SELECT COUNT(*) AS n FROM embeddings),
        m AS (SELECT j, ROUND(CAST(SUM(CAST(ROUND(CAST(embedding[j] AS DOUBLE), 9) AS DECIMAL(13,9))) AS DOUBLE)
                        / (SELECT n FROM ncte), 9) AS m
              FROM embeddings, (SELECT unnest(range(1, 65)) AS j) jj GROUP BY j),
        mm AS (SELECT list(m ORDER BY j) AS marr FROM m),
        cx AS MATERIALIZED (
          SELECT vec_id, list_transform(range(1, 65), j -> ROUND(CAST(embedding[j] AS DOUBLE), 9) - mm.marr[j]) AS c
          FROM embeddings, mm),
        cov AS MATERIALIZED (
          SELECT ii.i, jj.j,
                 ROUND(CAST(ROUND(SUM(CAST(c[ii.i] AS DECIMAL(13,9)) * CAST(c[jj.j] AS DECIMAL(13,9))), 9) AS DOUBLE)
                       / (SELECT n - 1 FROM ncte), 9) AS cv
          FROM cx, (SELECT unnest(range(1, 65)) AS i) ii, (SELECT unnest(range(1, 65)) AS j) jj
          GROUP BY ii.i, jj.j),
        v0 AS (SELECT j, CAST(0.125 AS DOUBLE) AS v FROM (SELECT unnest(range(1, 65)) AS j) jj)"""
    // scale-18 sums are decimal-ROUNDed to scale 9 BEFORE every double
    // cast: DuckDB's scale-18→DOUBLE cast is not correctly rounded, its
    // scale-9 cast and decimal ROUND (half away from zero ≡ HALF_UP) are
    val its = (1 to iters).map { t =>
      s"""r$t AS (SELECT c.i AS j,
                CAST(ROUND(SUM(CAST(c.cv AS DECIMAL(13,9)) * CAST(v${t - 1}.v AS DECIMAL(13,9))), 9) AS DOUBLE) AS raw
              FROM cov c JOIN v${t - 1} ON v${t - 1}.j = c.j GROUP BY c.i),
        n$t AS (SELECT sqrt(CAST(ROUND(SUM(CAST(raw AS DECIMAL(13,9)) * CAST(raw AS DECIMAL(13,9))), 9) AS DOUBLE)) AS nrm FROM r$t),
        v$t AS (SELECT j, ROUND(raw / nrm, 9) AS v FROM r$t, n$t)"""
    }.mkString(",\n")
    s"$head,\n$its"
  }

  /** Extends [[pcaPrefix]] with the second-component deflation replay of
    * [[Similarity.pcaFitK]]: w1 = grid(C·v8) and the Rayleigh λ1 =
    * grid(Σ grid(w1)·v8) (two-stage — never a triple-decimal product),
    * u1 = grid(λ1·v8), the deflated matrix cov2 = grid(C − u1·v8ᵀ) as
    * EXACT decimal subtraction, then `iters` more unrolled power
    * iterations (b0..b`iters`) with the identical re-grid sequence, plus
    * λ2 over cov2 and the trace Σ diag(C) (scale-9 decimal sum — exact
    * cast). Exposes v`iters` (component 0), b`iters` (component 1),
    * lam1/lam2/tr. */
  private def pcaMultiPrefix(iters: Int): String = {
    val head =
      s"""${pcaPrefix(iters)},
        w1 AS MATERIALIZED (SELECT c.i AS j,
                 CAST(ROUND(SUM(CAST(c.cv AS DECIMAL(13,9)) * CAST(v$iters.v AS DECIMAL(13,9))), 9) AS DOUBLE) AS w
               FROM cov c JOIN v$iters ON v$iters.j = c.j GROUP BY c.i),
        lam1 AS MATERIALIZED (SELECT CAST(ROUND(SUM(CAST(w1.w AS DECIMAL(13,9)) * CAST(v$iters.v AS DECIMAL(13,9))), 9) AS DOUBLE) AS lam
               FROM w1 JOIN v$iters ON v$iters.j = w1.j),
        u1 AS MATERIALIZED (SELECT v$iters.j,
                 CAST(ROUND(CAST((SELECT lam FROM lam1) AS DECIMAL(13,9)) * CAST(v$iters.v AS DECIMAL(13,9)), 9) AS DOUBLE) AS u
               FROM v$iters),
        cov2 AS MATERIALIZED (SELECT c.i, c.j,
                 CAST(ROUND(CAST(c.cv AS DECIMAL(13,9)) - CAST(u1.u AS DECIMAL(13,9)) * CAST(v$iters.v AS DECIMAL(13,9)), 9) AS DOUBLE) AS cv
               FROM cov c JOIN u1 ON u1.j = c.i JOIN v$iters ON v$iters.j = c.j),
        b0 AS MATERIALIZED (SELECT j, CAST(0.125 AS DOUBLE) AS v FROM (SELECT unnest(range(1, 65)) AS j) jj)"""
    val its = (1 to iters).map { t =>
      s"""rb$t AS MATERIALIZED (SELECT c.i AS j,
                CAST(ROUND(SUM(CAST(c.cv AS DECIMAL(13,9)) * CAST(b${t - 1}.v AS DECIMAL(13,9))), 9) AS DOUBLE) AS raw
              FROM cov2 c JOIN b${t - 1} ON b${t - 1}.j = c.j GROUP BY c.i),
        nb$t AS MATERIALIZED (SELECT sqrt(CAST(ROUND(SUM(CAST(raw AS DECIMAL(13,9)) * CAST(raw AS DECIMAL(13,9))), 9) AS DOUBLE)) AS nrm FROM rb$t),
        b$t AS MATERIALIZED (SELECT j, ROUND(raw / nrm, 9) AS v FROM rb$t, nb$t)"""
    }.mkString(",\n")
    val tail =
      s"""w2 AS MATERIALIZED (SELECT c.i AS j,
                 CAST(ROUND(SUM(CAST(c.cv AS DECIMAL(13,9)) * CAST(b$iters.v AS DECIMAL(13,9))), 9) AS DOUBLE) AS w
               FROM cov2 c JOIN b$iters ON b$iters.j = c.j GROUP BY c.i),
        lam2 AS MATERIALIZED (SELECT CAST(ROUND(SUM(CAST(w2.w AS DECIMAL(13,9)) * CAST(b$iters.v AS DECIMAL(13,9))), 9) AS DOUBLE) AS lam
               FROM w2 JOIN b$iters ON b$iters.j = w2.j),
        tr AS MATERIALIZED (SELECT CAST(SUM(CAST(cv AS DECIMAL(13,9))) AS DOUBLE) AS trace FROM cov WHERE i = j)"""
    s"$head,\n$its,\n$tail"
  }

  /** DuckDB replay of [[Similarity.pqTrain]] + [[Similarity.pqCodes]]:
    * per subspace s, raw (UNNORMALIZED) slices, lowest-id seeding,
    * `iters` unrolled Lloyd's rounds with DECIMAL(38,18)-exact means and
    * (dist2 ASC, cluster ASC) assignment — the kmeansCellsPrefix shape
    * minus the unit normalization — ending in s{s}code (vec_id, code).
    * Exposes rv (vec_id, x raw doubles) and codes (vec_id, sub, code). */
  private def pqPrefix(m: Int, dsub: Int, k: Int, iters: Int): String = {
    val head =
      """WITH rv AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)"""
    s"$head,\n${pqSubspaceChains(m, dsub, k, iters)}"
  }

  /** The m per-subspace Lloyd's chains + code table of [[pqPrefix]],
    * factored so they can train over ANY source CTE named `rv`
    * (vec_id, x DOUBLE[]) — raw embeddings for ann_pq_*, coarse-cell
    * RESIDUALS for ann_ivfpq. */
  private def pqSubspaceChains(m: Int, dsub: Int, k: Int, iters: Int): String = {
    val subs = (0 until m).map { s =>
      val lo = s * dsub + 1
      val d2 =
        s"list_reduce(list_transform(range(1, ${dsub + 1}), i -> (sv.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) * (sv.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)])), (a, b) -> a + b)"
      val base =
        s"""s${s}v AS MATERIALIZED (SELECT vec_id,
                 list_transform(range($lo, ${lo + dsub}), i -> x[CAST(i AS INTEGER)]) AS v FROM rv),
           s${s}c0 AS MATERIALIZED (SELECT cluster, cv FROM (
                 SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv FROM s${s}v) WHERE cluster < $k)"""
      val rounds = (1 to iters).map { it =>
        val p = it - 1
        s"""s${s}a$it AS MATERIALIZED (SELECT vec_id, cluster, v FROM (
                 SELECT sv.vec_id, c.cluster, sv.v,
                        ROW_NUMBER() OVER (PARTITION BY sv.vec_id ORDER BY $d2 ASC, c.cluster ASC) AS rk
                 FROM s${s}v sv CROSS JOIN s${s}c$p c) WHERE rk = 1),
           s${s}m$it AS MATERIALIZED (SELECT cluster, list(mn ORDER BY pos) AS cv FROM (
                 SELECT cluster, pos, CAST(SUM(CAST(val AS DECIMAL(38, 18))) AS DOUBLE) / COUNT(*) AS mn
                 FROM (SELECT cluster, unnest(range(1, ${dsub + 1})) - 1 AS pos, unnest(v) AS val FROM s${s}a$it)
                 GROUP BY cluster, pos) GROUP BY cluster),
           s${s}c$it AS MATERIALIZED (SELECT c.cluster, COALESCE(m.cv, c.cv) AS cv
                 FROM s${s}c$p c LEFT JOIN s${s}m$it m ON c.cluster = m.cluster)"""
      }.mkString(",\n")
      val code =
        s"""s${s}code AS MATERIALIZED (SELECT vec_id, cluster AS code FROM (
                 SELECT sv.vec_id, c.cluster,
                        ROW_NUMBER() OVER (PARTITION BY sv.vec_id ORDER BY $d2 ASC, c.cluster ASC) AS rk
                 FROM s${s}v sv CROSS JOIN s${s}c$iters c) WHERE rk = 1)"""
      s"$base,\n$rounds,\n$code"
    }.mkString(",\n")
    val codes =
      s"""codes AS MATERIALIZED (${(0 until m)
          .map(s => s"SELECT vec_id, $s AS sub, CAST(code AS INTEGER) AS code FROM s${s}code")
          .mkString(" UNION ALL ")})"""
    s"$subs,\n$codes"
  }

  /** DuckDB oracle for ann_ivfpq: [[kmeansCellsPrefix]] replays the
    * coarse quantizer (nv unit vectors, c`ci` centroids, af assignments),
    * `rv` becomes the RESIDUAL table nv.v − c(cell) feeding
    * [[pqSubspaceChains]] (so the PQ model trains on residuals exactly
    * like the operator), then the serve: per-query nprobe probes, a
    * per-(query, cell) residual LUT against the final sub-space
    * codebooks, fixed-sub-order ADC fold over each probed cell's codes,
    * rerank·k shortlist, and the proven raw-double cosine rerank. */
  private def ivfPqOracle(
      nlist: Int, coarseIters: Int, m: Int, dsub: Int, pqK: Int, pqIters: Int,
      nQ: Int, nprobe: Int, k: Int, rerank: Int): String = {
    val d2 =
      "list_reduce(list_transform(range(1, 65), i -> (nv.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) * (nv.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)])), (a, b) -> a + b)"
    val luts = (0 until m).map { s =>
      val lo = s * dsub
      s"""SELECT r.query_id, r.cell, $s AS sub, CAST(c.cluster AS INTEGER) AS code,
             list_reduce(list_transform(range(1, ${dsub + 1}),
               i -> (r.qr[CAST($lo + i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) * (r.qr[CAST($lo + i AS INTEGER)] - c.cv[CAST(i AS INTEGER)])),
               (a, b) -> a + b) AS pd
         FROM qres r CROSS JOIN s${s}c$pqIters c"""
    }.mkString(" UNION ALL ")
    s"""${kmeansCellsPrefix(nlist, coarseIters)},
       rv AS MATERIALIZED (SELECT nv.vec_id,
            list_transform(range(1, 65), i -> nv.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) AS x
            FROM nv JOIN af ON af.vec_id = nv.vec_id JOIN c$coarseIters c ON c.cluster = af.cluster),
       ${pqSubspaceChains(m, dsub, pqK, pqIters)},
       qprobe AS MATERIALIZED (SELECT vec_id AS query_id, cluster AS cell FROM (
            SELECT nv.vec_id, c.cluster,
                   ROW_NUMBER() OVER (PARTITION BY nv.vec_id ORDER BY $d2 ASC, c.cluster ASC) AS rk
            FROM nv CROSS JOIN c$coarseIters c WHERE nv.vec_id < $nQ) WHERE rk <= $nprobe),
       qres AS MATERIALIZED (SELECT q.query_id, q.cell,
            list_transform(range(1, 65), i -> nv.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) AS qr
            FROM qprobe q JOIN nv ON nv.vec_id = q.query_id JOIN c$coarseIters c ON c.cluster = q.cell),
       lutq AS MATERIALIZED ($luts),
       cellcodes AS MATERIALIZED (SELECT codes.vec_id, af.cluster AS cell, codes.sub, codes.code
            FROM codes JOIN af ON af.vec_id = codes.vec_id),
       approx AS MATERIALIZED (SELECT l.query_id, cc.vec_id AS neighbor_id,
              list_reduce(list(l.pd ORDER BY l.sub), (a, b) -> a + b) AS ad
            FROM cellcodes cc JOIN lutq l ON l.cell = cc.cell AND l.sub = cc.sub AND l.code = cc.code
            WHERE cc.vec_id <> l.query_id GROUP BY 1, 2),
       short AS (SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ad ASC, neighbor_id ASC) AS srk
            FROM approx) WHERE srk <= ${k * rerank}),
       scx AS (SELECT s.query_id, s.neighbor_id,
              round(list_cosine_similarity(q.x, n.x), 9) AS sim9,
              round(list_cosine_similarity(q.x, n.x), 6) AS sim
            FROM short s JOIN v0 q ON q.vec_id = s.query_id JOIN v0 n ON n.vec_id = s.neighbor_id)
       SELECT query_id, neighbor_id, sim, rn FROM (
         SELECT query_id, neighbor_id, sim,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim9 DESC, neighbor_id) AS rn
         FROM scx) WHERE rn <= $k"""
  }

  /** ADC tail over [[pqPrefix]]'s rv/codes + the final per-subspace
    * centroid CTEs: per-query m×k LUT of exact subspace distances, code
    * rows scored by the FIXED sub-order fold, rerank·k shortlist, exact
    * full-dim L2 rerank. */
  private def pqAdcTail(m: Int, dsub: Int, iters: Int, nQ: Int, k: Int, rerank: Int): String = {
    val luts = (0 until m).map { s =>
      val lo = s * dsub
      s"""SELECT q.vec_id AS query_id, $s AS sub, CAST(c.cluster AS INTEGER) AS code,
             list_reduce(list_transform(range(1, ${dsub + 1}),
               i -> (q.x[CAST($lo + i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) * (q.x[CAST($lo + i AS INTEGER)] - c.cv[CAST(i AS INTEGER)])),
               (a, b) -> a + b) AS pd
         FROM rv q CROSS JOIN s${s}c$iters c WHERE q.vec_id < $nQ"""
    }.mkString(" UNION ALL ")
    s"""lut AS MATERIALIZED ($luts),
       approx AS MATERIALIZED (
         SELECT l.query_id, c.vec_id AS neighbor_id,
                list_reduce(list(l.pd ORDER BY l.sub), (a, b) -> a + b) AS ad
         FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
         WHERE c.vec_id <> l.query_id
         GROUP BY l.query_id, c.vec_id),
       short AS (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ad ASC, neighbor_id ASC) AS srk
                FROM approx) WHERE srk <= ${k * rerank}),
       ex AS (SELECT s.query_id, s.neighbor_id,
                     list_reduce(list_transform(range(1, ${m * dsub + 1}),
                       i -> (q.x[CAST(i AS INTEGER)] - n.x[CAST(i AS INTEGER)]) * (q.x[CAST(i AS INTEGER)] - n.x[CAST(i AS INTEGER)])),
                       (a, b) -> a + b) AS d2raw
              FROM short s JOIN rv q ON q.vec_id = s.query_id JOIN rv n ON n.vec_id = s.neighbor_id)
       SELECT query_id, neighbor_id, round(d2raw, 6) AS d2, rn FROM (
         SELECT query_id, neighbor_id, d2raw,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2raw ASC, neighbor_id ASC) AS rn
         FROM ex) WHERE rn <= $k"""
  }

  /** DuckDB oracle for cluster_kmeans: final-model assignments. */
  private def kmeansAssignOracle(k: Int, iters: Int): String =
    s"${kmeansCellsPrefix(k, iters)}\nSELECT vec_id, cluster FROM af"

  /** DuckDB oracle for dedup_semantic: the [[kmeansCellsPrefix]] cells,
    * then the PROVEN dedup_embedding_cosine round6 cosine (raw unnormalized
    * doubles, zero-norm rows dropped) restricted to same-cell pairs. */
  private def semanticDedupOracle(k: Int, iters: Int): String =
    s"""${kmeansCellsPrefix(k, iters)},
       pr AS MATERIALIZED (SELECT vec_id, x FROM nrm WHERE nr > 0)
       SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              round(list_cosine_similarity(a.x, b.x), 6) AS sim,
              ca.cluster AS cluster
       FROM pr a JOIN pr b ON a.vec_id < b.vec_id
       JOIN af ca ON ca.vec_id = a.vec_id
       JOIN af cb ON cb.vec_id = b.vec_id AND cb.cluster = ca.cluster
       WHERE round(list_cosine_similarity(a.x, b.x), 6) >= 0.4"""

  /** DuckDB oracle for ann_ivf_kmeans: [[kmeansCellsPrefix]] replays the
    * deterministic quantizer (c`iters` = final centroids over unit
    * vectors); multi-assignment and query probes are the same
    * (dist2 ASC, cluster ASC) ranking cut at `assign`/`nprobe`; candidates
    * dedupe per (query, neighbor) exactly like the operator; scoring is
    * the PROVEN raw-double cosine of ann_brute_topk. */
  /** Multi-assignment + query-probe CTEs against the centroid CTE named
    * `centroidCte`: rank<=assign cells per corpus vector, rank<=nprobe per
    * query (vec_id < nQueries). Shared by the kmeans- and sampled-trainer
    * IVF oracles — identical because [[Similarity.nearestCells]]' bounded
    * selection is exactly the (dist2 ASC, cluster ASC) ranking. */
  private def ivfAssignProbes(centroidCte: String, assign: Int, nprobe: Int, nQueries: Int): String = {
    val d2 =
      "list_reduce(list_transform(range(1, 65), i -> (nv.v[i] - c.cv[i]) * (nv.v[i] - c.cv[i])), (a, b) -> a + b)"
    s"""amulti AS MATERIALIZED (SELECT vec_id, cluster AS cell FROM (
           SELECT nv.vec_id, c.cluster,
                  ROW_NUMBER() OVER (PARTITION BY nv.vec_id ORDER BY $d2 ASC, c.cluster ASC) AS rk
           FROM nv CROSS JOIN $centroidCte c) WHERE rk <= $assign),
       qprobe AS MATERIALIZED (SELECT vec_id AS query_id, cluster AS cell FROM (
           SELECT nv.vec_id, c.cluster,
                  ROW_NUMBER() OVER (PARTITION BY nv.vec_id ORDER BY $d2 ASC, c.cluster ASC) AS rk
           FROM nv CROSS JOIN $centroidCte c WHERE nv.vec_id < $nQueries) WHERE rk <= $nprobe)"""
  }

  /** Exact-cosine IVF serve tail over amulti/qprobe/v0: candidate dedup,
    * the proven round-9/round-6 cosine, bounded rank cut. */
  private def ivfExactTail(k: Int, candExtra: String = ""): String =
    s"""cand AS (SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
                FROM qprobe q JOIN amulti a ON a.cell = q.cell AND a.vec_id <> q.query_id$candExtra),
       sc AS (SELECT c2.query_id, c2.neighbor_id,
                     round(list_cosine_similarity(qa.x, nb.x), 9) AS sim9,
                     round(list_cosine_similarity(qa.x, nb.x), 6) AS sim
              FROM cand c2 JOIN v0 qa ON qa.vec_id = c2.query_id
                           JOIN v0 nb ON nb.vec_id = c2.neighbor_id),
       rr AS (SELECT query_id, neighbor_id, sim,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim9 DESC, neighbor_id) AS rn
              FROM sc)
       SELECT query_id, neighbor_id, sim, rn FROM rr WHERE rn <= $k"""

  /** Int8-quantized IVF serve tail (see ann_ivf_int8_kmeans): unit-vector
    * symmetric quantization with Java's floor(x+0.5) rounding, integer-dot
    * shortlist at rerank·k, exact cosine rerank. */
  private def ivfQ8Tail(k: Int, rerank: Int): String =
    s"""q8 AS MATERIALIZED (SELECT vec_id, scale,
                 list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS q
             FROM (SELECT vec_id, v,
                     CASE WHEN list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0
                          THEN list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0
                          ELSE 1.0 END AS scale
                   FROM nv)),
       simq AS (SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id,
                       (qq.scale * cq.scale) *
                       list_reduce(list_transform(range(1, 65), i -> qq.q[i] * cq.q[i]), (x, y) -> x + y) AS simq
                FROM qprobe q JOIN amulti a ON a.cell = q.cell AND a.vec_id <> q.query_id
                JOIN q8 qq ON qq.vec_id = q.query_id
                JOIN q8 cq ON cq.vec_id = a.vec_id),
       short AS (SELECT query_id, neighbor_id FROM (
                   SELECT query_id, neighbor_id,
                          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY simq DESC, neighbor_id) AS rk
                   FROM simq) WHERE rk <= ${rerank * k}),
       sc AS (SELECT s.query_id, s.neighbor_id,
                     round(list_cosine_similarity(qa.x, nb.x), 9) AS sim9,
                     round(list_cosine_similarity(qa.x, nb.x), 6) AS sim
              FROM short s JOIN v0 qa ON qa.vec_id = s.query_id
                           JOIN v0 nb ON nb.vec_id = s.neighbor_id),
       rr AS (SELECT query_id, neighbor_id, sim,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim9 DESC, neighbor_id) AS rn
              FROM sc)
       SELECT query_id, neighbor_id, sim, rn FROM rr WHERE rn <= $k"""

  /** WITH-chain replaying [[Similarity.trainCoarseQuantizer]] — the
    * SAMPLED driver trainer, now engine-replayable because the sample
    * order is mix64(vec_id) (signed) with an x[1] tiebreak:
    *  - `samp`: rank over (mix64 signed, x[1]), cut at sampleN — the
    *    TakeOrdered the trainer collects;
    *  - `snv`: unit-normalized sample; `sc0`: first min(nlist, n) sample
    *    points in sample order;
    *  - per round: first-wins strict-< argmin ≡ (dist2 ASC, cluster ASC)
    *    row_number; per-cell per-dim sums fold the assigned samples' DOUBLE
    *    coordinates IN SAMPLE ORDER — the trainer's sequential foreach —
    *    via list(val ORDER BY ord) left folds (no decimal trick here: the
    *    driver sums doubles, so the oracle replays the exact add sequence);
    *  - empty cells keep their previous centroid.
    * Also emits v0 (raw doubles) and nv (normalized corpus) for the serve
    * tails. */
  private def ivfSampledPrefix(nlist: Int, sampleN: Int, iters: Int): String = {
    val mulmod1 = sqlMulMod64("a", "13787848793156543929")
    val mulmod2 = sqlMulMod64("a", "10723151780598845931")
    val d2s =
      "list_reduce(list_transform(range(1, 65), i -> (s.v[i] - c.cv[i]) * (s.v[i] - c.cv[i])), (a, b) -> a + b)"
    val head =
      s"""WITH v0 AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         nrm AS MATERIALIZED (SELECT vec_id, x, sqrt(list_reduce(list_transform(x, t -> t * t), (a, b) -> a + b)) AS nr FROM v0),
         nv AS MATERIALIZED (SELECT vec_id, CASE WHEN nr > 0 THEN list_transform(x, t -> t / nr) ELSE x END AS v FROM nrm),
         mh0 AS (SELECT vec_id, x, CAST(vec_id AS UBIGINT) AS a FROM v0),
         mh1 AS (SELECT vec_id, x, xor(a, a >> 30) AS a FROM mh0),
         mh2 AS (SELECT vec_id, x, $mulmod1 AS a FROM mh1),
         mh3 AS (SELECT vec_id, x, xor(a, a >> 27) AS a FROM mh2),
         mh4 AS (SELECT vec_id, x, $mulmod2 AS a FROM mh3),
         mh AS (SELECT vec_id, x,
                  CAST(CASE WHEN xor(a, a >> 31) >= 9223372036854775808::UBIGINT
                            THEN xor(a, a >> 31)::HUGEINT - 18446744073709551616::HUGEINT
                            ELSE xor(a, a >> 31)::HUGEINT END AS BIGINT) AS h
                FROM mh4),
         samp AS MATERIALIZED (SELECT ord, x FROM (
             SELECT ROW_NUMBER() OVER (ORDER BY h, x[1]) AS ord, x FROM mh) WHERE ord <= $sampleN),
         snv AS MATERIALIZED (SELECT ord,
             CASE WHEN nr > 0 THEN list_transform(x, t -> t / nr) ELSE x END AS v
           FROM (SELECT ord, x, sqrt(list_reduce(list_transform(x, t -> t * t), (a, b) -> a + b)) AS nr FROM samp)),
         sc0 AS MATERIALIZED (SELECT ord - 1 AS cluster, v AS cv FROM snv WHERE ord <= $nlist)"""
    val rounds = (1 to iters)
      .map { it =>
        val p = it - 1
        s"""sa$it AS MATERIALIZED (SELECT ord, v, cluster FROM (
              SELECT s.ord, s.v, c.cluster,
                     ROW_NUMBER() OVER (PARTITION BY s.ord ORDER BY $d2s ASC, c.cluster ASC) AS rk
              FROM snv s CROSS JOIN sc$p c) WHERE rk = 1),
            sm$it AS MATERIALIZED (SELECT cluster, list(m ORDER BY pos) AS cv FROM (
              SELECT cluster, pos,
                     list_reduce(list(val ORDER BY ord), (a, b) -> a + b) / COUNT(*) AS m
              FROM (SELECT cluster, ord, unnest(range(1, 65)) - 1 AS pos, unnest(v) AS val FROM sa$it)
              GROUP BY cluster, pos) GROUP BY cluster),
            sc$it AS MATERIALIZED (SELECT sc$p.cluster AS cluster, COALESCE(sm$it.cv, sc$p.cv) AS cv
              FROM sc$p LEFT JOIN sm$it ON sc$p.cluster = sm$it.cluster)"""
      }
      .mkString(",\n")
    s"$head,\n$rounds"
  }

  private def ivfKmeansOracle(nlist: Int, iters: Int, assign: Int, nprobe: Int, k: Int): String =
    s"""${kmeansCellsPrefix(nlist, iters)},
       ${ivfAssignProbes(s"c$iters", assign, nprobe, nQueries = 8)},
       ${ivfExactTail(k)}"""

  /** DuckDB oracle for ann_ivf_appended — the incremental-index lifecycle:
    * the model trains on the SUBSET `trainWhere` selects (the base build),
    * assignment/probe/serve run over ALL vectors (base + appended
    * generations, frozen centroids) — exactly what AnnIndex.append does.
    * `deletedWhere` (a predicate over vec_id) replays AnnIndex tombstones:
    * matching vectors stay OUT of the candidate set — they still shaped
    * the trained model and the cell geometry (tombstoning is a read-path
    * exclusion, not a rebuild), which is exactly what the operator does. */
  private def ivfKmeansSubsetOracle(
      nlist: Int,
      iters: Int,
      assign: Int,
      nprobe: Int,
      k: Int,
      trainWhere: String = "",
      deletedWhere: String = ""): String = {
    val extra = if (deletedWhere.isEmpty) "" else s" AND NOT (${deletedWhere.replace("vec_id", "a.vec_id")})"
    s"""${kmeansCellsPrefix(nlist, iters, trainWhere = trainWhere)},
       ${ivfAssignProbes(s"c$iters", assign, nprobe, nQueries = 8)},
       ${ivfExactTail(k, candExtra = extra)}"""
  }

  /** DuckDB oracle for ann_ivf_topk — the SAMPLED-trainer IVF, replayed
    * end to end: [[ivfSampledPrefix]] centroids, then the same
    * assignment/probe/serve chain as the kmeans variant. */
  private def ivfSampledOracle(
      nlist: Int,
      sampleN: Int,
      iters: Int,
      assign: Int,
      nprobe: Int,
      k: Int): String =
    s"""${ivfSampledPrefix(nlist, sampleN, iters)},
       ${ivfAssignProbes(s"sc$iters", assign, nprobe, nQueries = 8)},
       ${ivfExactTail(k)}"""

  /** DuckDB oracle for ann_ivf_int8 — sampled trainer + quantized serve. */
  private def ivfQ8SampledOracle(
      nlist: Int,
      sampleN: Int,
      iters: Int,
      assign: Int,
      nprobe: Int,
      k: Int,
      rerank: Int): String =
    s"""${ivfSampledPrefix(nlist, sampleN, iters)},
       ${ivfAssignProbes(s"sc$iters", assign, nprobe, nQueries = 8)},
       ${ivfQ8Tail(k, rerank)}"""

  /** DuckDB oracle for ann_ivf_int8_kmeans: the kmeans model, then the
    * int8 serve tail (symmetric unit-vector quantization with Java's
    * floor(x+0.5) rounding — NOT SQL round's half-away-from-zero —
    * integer-dot shortlist at rerank·k, exact cosine rerank). */
  private def ivfQ8KmeansOracle(
      nlist: Int,
      iters: Int,
      assign: Int,
      nprobe: Int,
      k: Int,
      rerank: Int): String =
    s"""${kmeansCellsPrefix(nlist, iters)},
       ${ivfAssignProbes(s"c$iters", assign, nprobe, nQueries = 8)},
       ${ivfQ8Tail(k, rerank)}"""

  /** (a*b) mod 2^64 in DuckDB HUGEINT via 32-bit split — a direct 64×64
    * product overflows INT128. `a` must be a UBIGINT-typed SQL expression;
    * `b` a decimal literal of the unsigned 64-bit constant. */
  private def sqlMulMod64(a: String, b: String): String =
    s"CAST((( ($a & 4294967295)::HUGEINT * $b::HUGEINT" +
      s" + ((($a >> 32)::HUGEINT * $b::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT" +
      s") % 18446744073709551616::HUGEINT) AS UBIGINT)"

  /** DuckDB oracle for ann_lsh_topk: the LSH pipeline is approximate versus
    * brute force but fully DETERMINISTIC — plane signs are
    * splitmix64(t<<40 | p<<20 | d) ([[graft.functions.HyperplaneSig]]),
    * replayed here with the same HUGEINT mulmod machinery as dedup_simhash;
    * per-plane sums fold v[d]·(±1.0) in ascending-d order (exact ±, same
    * add sequence as the expression's loop), buckets bit-pack strict s>0
    * votes, the hamming-≤radius probe ball is a bit_count filter, and the
    * candidate set ranks by the proven round-9/round-6 cosine. */
  private def lshOracle(bits: Int, tables: Int, radius: Int, k: Int, nQueries: Int): String = {
    val ballSize = 1 << bits
    s"""WITH grid AS (
         SELECT t.t, p.p, d.d
         FROM (SELECT unnest(range(0, $tables)) AS t) t,
              (SELECT unnest(range(0, $bits)) AS p) p,
              (SELECT unnest(range(0, 64)) AS d) d),
       z0 AS (SELECT t, p, d,
                CAST(((t::HUGEINT * 1099511627776::HUGEINT + p::HUGEINT * 1048576::HUGEINT
                       + d::HUGEINT + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT) AS UBIGINT) AS a
              FROM grid),
       m1a AS (SELECT t, p, d, xor(a, a >> 30) AS a FROM z0),
       m1  AS (SELECT t, p, d, ${sqlMulMod64("a", "13787848793156543929")} AS a FROM m1a),
       m2a AS (SELECT t, p, d, xor(a, a >> 27) AS a FROM m1),
       m2  AS (SELECT t, p, d, ${sqlMulMod64("a", "10723151780598845931")} AS a FROM m2a),
       signs AS (SELECT t, p, d,
                   CASE WHEN (xor(a, a >> 31) & 1) = 0 THEN 1.0 ELSE -1.0 END AS sgn
                 FROM m2),
       vs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       -- pre-unnest the vector so the (vec x plane) join rows carry ONE
       -- double, not the whole 64-double array: at 2000 vectors the join
       -- is ~12M rows, and carrying the array through it was a multi-GB
       -- peak that tripped commit-limited boxes at sf0.1
       vsd AS (SELECT vec_id, unnest(range(1, 65)) - 1 AS d, unnest(x) AS xv FROM vs),
       psum AS (SELECT v.vec_id, s.t, s.p,
                  list_reduce(list(v.xv * s.sgn ORDER BY s.d), (a, b) -> a + b) AS s
                FROM vsd v JOIN signs s ON s.d = v.d GROUP BY v.vec_id, s.t, s.p),
       buckets AS (SELECT vec_id, t AS tbl,
                     CAST(coalesce(sum(CASE WHEN s > 0 THEN (1::UBIGINT << p)::HUGEINT END), 0) AS BIGINT) AS bucket
                   FROM psum GROUP BY 1, 2),
       masks AS (SELECT m FROM (SELECT unnest(range(0, $ballSize)) AS m) WHERE bit_count(m) <= $radius),
       qprobe AS (SELECT b.vec_id AS query_id, b.tbl, xor(b.bucket, m.m) AS bucket
                  FROM buckets b, masks m WHERE b.vec_id < $nQueries),
       cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
                FROM qprobe q JOIN buckets c
                  ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id <> q.query_id),
       sc AS (SELECT c2.query_id, c2.neighbor_id,
                     round(list_cosine_similarity(qa.x, nb.x), 9) AS sim9,
                     round(list_cosine_similarity(qa.x, nb.x), 6) AS sim
              FROM cand c2 JOIN vs qa ON qa.vec_id = c2.query_id
                           JOIN vs nb ON nb.vec_id = c2.neighbor_id),
       rr AS (SELECT query_id, neighbor_id, sim,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim9 DESC, neighbor_id) AS rn
              FROM sc)
       SELECT query_id, neighbor_id, sim, rn FROM rr WHERE rn <= $k"""
  }

  /** DuckDB oracle for ann_brute_topk (and the audit's ground truth): the
    * exact cosine top-k. */
  private def bruteOracle(k: Int, nQueries: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < $nQueries),
       c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
       s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
             FROM q JOIN c ON query_id <> neighbor_id),
       r AS (SELECT query_id, neighbor_id, round(sim, 6) AS sim,
                    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round(sim, 9) DESC, neighbor_id) AS rn
             FROM s)
       SELECT query_id, neighbor_id, sim, rn FROM r WHERE rn <= $k"""

  /** DuckDB oracle for ann_binary_quant: sign-bit packing as Σ bit<<j per
    * 64-bit word (integer-identical to the engine's Horner fold), hamming
    * candidates via xor + bit_count with the (ham asc, id asc) total-order
    * cut, exact-cosine rerank of the survivors — the bruteOracle ranking
    * discipline on the candidate subset. */
  private def bqOracle(dim: Int, k: Int, nQueries: Int, candidates: Int): String = {
    val nWords = (dim + 63) / 64
    def word(w: Int): String = {
      val lo = w * 64
      val hi = math.min(lo + 63, dim - 1)
      // bit 63 is the long's sign bit — neither engine shifts 1<<63 under
      // checked arithmetic, so its term is the MinValue literal (the exact
      // split binaryQuantize makes); the HUGEINT sum then fits BIGINT
      s"""(SELECT CAST(SUM(CASE WHEN v[CAST(j AS INT) + 1] <= 0 THEN 0
                               WHEN j - $lo = 63 THEN -9223372036854775808::HUGEINT
                               ELSE (CAST(1 AS BIGINT) << CAST(j - $lo AS INT))::HUGEINT END)
                  AS BIGINT)
           FROM range($lo, ${hi + 1}) t$w(j))"""
    }
    val hamSum = (0 until nWords).map(w => s"bit_count(xor(b.bq$w, q.qb$w))").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       b AS (SELECT vec_id, ${(0 until nWords).map(w => s"${word(w)} AS bq$w").mkString(", ")} FROM e),
       q AS (SELECT vec_id AS query_id, ${(0 until nWords).map(w => s"bq$w AS qb$w").mkString(", ")}
             FROM b WHERE vec_id < $nQueries),
       h AS (SELECT q.query_id, b.vec_id AS neighbor_id, $hamSum AS ham
             FROM b JOIN q ON b.vec_id <> q.query_id),
       cand AS (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ham, neighbor_id) AS rc
                FROM h) WHERE rc <= $candidates),
       s AS (SELECT c.query_id, c.neighbor_id, list_cosine_similarity(qe.v, ne.v) AS sim
             FROM cand c JOIN e qe ON qe.vec_id = c.query_id JOIN e ne ON ne.vec_id = c.neighbor_id),
       r AS (SELECT query_id, neighbor_id, round(sim, 6) AS sim,
                    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round(sim, 9) DESC, neighbor_id) AS rn
             FROM s)
       SELECT query_id, neighbor_id, sim, rn FROM r WHERE rn <= $k"""
  }

  /** DuckDB oracle for ann_matryoshka_recall: each truncation is the
    * brute-force oracle on sliced vectors; overlap vs the full-dim truth
    * is exact integer counting. */
  private def matryoshkaOracle(k: Int, nQueries: Int, dims: Seq[Int]): String = {
    def trunc(d: Int) =
      s"""SELECT $d AS dims, query_id, neighbor_id FROM (
         WITH q AS (SELECT vec_id AS query_id, CAST(embedding[1:$d] AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < $nQueries),
         c AS (SELECT vec_id AS neighbor_id, CAST(embedding[1:$d] AS DOUBLE[]) AS cv FROM embeddings),
         s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
               FROM q JOIN c ON query_id <> neighbor_id),
         r AS (SELECT query_id, neighbor_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round(sim, 9) DESC, neighbor_id) AS rn
               FROM s)
         SELECT query_id, neighbor_id FROM r WHERE rn <= $k) t"""
    s"""WITH truth AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${bruteOracle(k, nQueries)}) t),
       tr AS (${dims.map(trunc).mkString(" UNION ALL ")})
       SELECT tr.dims, tr.query_id,
              CAST(SUM(CASE WHEN truth.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
              round(CAST(SUM(CASE WHEN truth.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / $k.0, 6) AS recall
       FROM tr LEFT JOIN truth ON truth.query_id = tr.query_id AND truth.neighbor_id = tr.neighbor_id
       GROUP BY 1, 2"""
  }

  /** DuckDB oracle for ann_recall_audit: every method in the audit is now
    * deterministic (mix64-ordered sampled trainer, derandomized LSH), so
    * the audit itself replays — each method's FULL oracle runs as a
    * derived-table subquery (its WITH chain is scoped, so names reuse
    * freely), and the overlap counts against the brute-force truth are
    * plain joins. */
  private def recallAuditOracle(
      k: Int,
      nQueries: Int,
      nlist: Int,
      sampleN: Int,
      iters: Int,
      assign: Int,
      nprobe: Int,
      rerank: Int,
      bits: Int,
      tables: Int,
      radius: Int): String =
    s"""WITH truth AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${bruteOracle(k, nQueries)}) t),
       ivf_t AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${ivfSampledOracle(nlist, sampleN, iters, assign, nprobe, k)}) t),
       i8_t AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${ivfQ8SampledOracle(nlist, sampleN, iters, assign, nprobe, k, rerank)}) t),
       lsh_t AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${lshOracle(bits, tables, radius, k, nQueries)}) t),
       tn AS (SELECT count(*) AS n_true FROM truth),
       h AS (
         SELECT 'ivf' AS method, (SELECT count(*) FROM ivf_t JOIN truth USING (query_id, neighbor_id)) AS n_hits
         UNION ALL
         SELECT 'ivf_int8', (SELECT count(*) FROM i8_t JOIN truth USING (query_id, neighbor_id))
         UNION ALL
         SELECT 'lsh', (SELECT count(*) FROM lsh_t JOIN truth USING (query_id, neighbor_id)))
       SELECT h.method, tn.n_true, h.n_hits,
              round(CAST(h.n_hits AS DOUBLE) / tn.n_true, 6) AS recall
       FROM h, tn"""

  /** DuckDB oracle for ann_auto_probe_lsh: one MATERIALIZED lsh arm per
    * Hamming radius 0..maxRadius, recall per rung, the engine's early-stop
    * rule in SQL — with NO guaranteed-success rung, so when no radius
    * meets the target every rung is emitted unchosen (the honest
    * "re-index" answer [[Similarity.autoProbeLsh]] returns). */
  private def autoProbeLshOracle(
      k: Int,
      nQueries: Int,
      bits: Int,
      tables: Int,
      maxRadius: Int,
      target: Double): String = {
    val ladder = 0 to maxRadius
    val arms = ladder
      .map(r => s"pr$r AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${lshOracle(bits, tables, r, k, nQueries)}) t)")
      .mkString(",\n")
    val rungs = ladder
      .map(r => s"SELECT $r AS radius, (SELECT count(*) FROM pr$r JOIN truth USING (query_id, neighbor_id)) AS n_hits")
      .mkString("\nUNION ALL\n")
    s"""WITH truth AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${bruteOracle(k, nQueries)}) t),
       $arms,
       tn AS (SELECT count(*) AS n_true FROM truth),
       r AS ($rungs),
       a AS (SELECT r.radius, tn.n_true, r.n_hits,
                    round(CAST(r.n_hits AS DOUBLE) / tn.n_true, 6) AS recall
             FROM r, tn),
       w AS (SELECT a.*,
                    COALESCE((SELECT MAX(CASE WHEN a2.recall >= $target THEN 1 ELSE 0 END)
                              FROM a a2 WHERE a2.radius < a.radius), 0) AS earlier
             FROM a)
       SELECT radius, n_true, n_hits, recall, (recall >= $target) AS chosen
       FROM w WHERE earlier = 0"""
  }

  /** DuckDB oracle for ann_auto_probe: one MATERIALIZED ivf arm per
    * doubling-ladder rung (each the full sampled-kmeans replay at that
    * nprobe), recall per rung, then the engine's early-stop rule in SQL —
    * a rung is in the walk iff NO smaller rung already met the target,
    * and the stopping rung is `chosen`. Replays [[Similarity.autoProbe]]
    * decision-for-decision. */
  private def autoProbeOracle(
      k: Int,
      nQueries: Int,
      nlist: Int,
      sampleN: Int,
      iters: Int,
      assign: Int,
      target: Double): String = {
    val ladder = (Iterator.iterate(1)(_ * 2).takeWhile(_ < nlist).toSeq :+ nlist).distinct
    val arms = ladder
      .map(p => s"p$p AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${ivfSampledOracle(nlist, sampleN, iters, assign, p, k)}) t)")
      .mkString(",\n")
    val rungs = ladder
      .map(p => s"SELECT $p AS nprobe, (SELECT count(*) FROM p$p JOIN truth USING (query_id, neighbor_id)) AS n_hits")
      .mkString("\nUNION ALL\n")
    s"""WITH truth AS MATERIALIZED (SELECT query_id, neighbor_id FROM (${bruteOracle(k, nQueries)}) t),
       $arms,
       tn AS (SELECT count(*) AS n_true FROM truth),
       r AS ($rungs),
       a AS (SELECT r.nprobe, tn.n_true, r.n_hits,
                    round(CAST(r.n_hits AS DOUBLE) / tn.n_true, 6) AS recall
             FROM r, tn),
       w AS (SELECT a.*,
                    COALESCE((SELECT MAX(CASE WHEN a2.recall >= $target THEN 1 ELSE 0 END)
                              FROM a a2 WHERE a2.nprobe < a.nprobe), 0) AS earlier
             FROM a)
       SELECT nprobe, n_true, n_hits, recall, (recall >= $target) AS chosen
       FROM w WHERE earlier = 0"""
  }

  /** DuckDB oracle for embed_project: one UNION ALL arm per output dim,
    * each replaying randomProject's fold bit-for-bit — the ±1 signs come
    * from the same splitmix64 stream ([[Similarity.projectionSigns]],
    * baked in as +/− on the CAST-to-double elements: a·(+1.0)=a and
    * a·(−1.0)=−a are IEEE-exact, and SQL's left-associative +/− chain is
    * the same add sequence as the Spark aggregate()'s left fold), scaled
    * by the same 1/√outDim double and quantized with round(·, 6). */
  private def embedProjectOracle: String = {
    val inDim  = 64
    val outDim = 16
    val invSqrt = 1.0 / math.sqrt(outDim.toDouble)
    Similarity
      .projectionSigns(inDim, outDim)
      .zipWithIndex
      .map { case (row, j) =>
        val fold = row.zipWithIndex
          .map { case (s, i) =>
            s"${if (s < 0) "-" else "+"} CAST(embedding[${i + 1}] AS DOUBLE)"
          }
          .mkString(" ")
        s"SELECT vec_id, CAST($j AS INTEGER) AS pos, " +
          s"round((CAST(0.0 AS DOUBLE) $fold) * CAST($invSqrt AS DOUBLE), 6) AS value FROM embeddings"
      }
      .mkString("\nUNION ALL\n")
  }

  private val splitFractions = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)

  /** DuckDB oracle for split_leakage_safe: the dedup_clusters recursive-CTE
    * connected components (same 0.8-jaccard pair set), singletons anchored
    * to their own doc_id, then the EXACT hex boundary literals from
    * [[Corpus.splitBoundaries]] in a CASE over md5(cluster_id). */
  private def leakageSafeSplitOracle: String = {
    val bounds = Corpus.splitBoundaries(splitFractions)
    val cases = bounds
      .map { case (name, b) =>
        s"WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 13) < '$b' THEN '$name'"
      }
      .mkString(" ")
    s"""
      WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks FROM documents),
      s AS (SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
        FROM t WHERE len(toks) >= 3)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
      p0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
             FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
      p AS (SELECT a_id, b_id FROM p0 JOIN sz sa ON sa.doc_id = p0.a_id JOIN sz sb ON sb.doc_id = p0.b_id
            WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
      e AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
      reach(id, lab) AS (
        SELECT src, src FROM e
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id),
      c AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
      lab AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id)
      SELECT doc_id, cluster_id,
             CASE $cases ELSE '${splitFractions.last._1}' END AS split
      FROM lab
    """
  }

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------- exact dedup
    Q(
      "dedup_exact",
      Some("""
        SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        FROM documents GROUP BY md5(text)
      """)) { (spark, dir) =>
      Dedup.exact(Tables(spark, dir).documents, "doc_id", "text")
    },

    // Token-set dedup: md5 of the sorted distinct-token set — the
    // order/repetition-insensitive exact tier (shuffled boilerplate, word-
    // repeat spam) at groupBy cost, no pairwise join. Spark's array_sort
    // on ASCII tokens ≡ DuckDB list_sort (binary order).
    Q(
      "dedup_bag_exact",
      Some("""
        SELECT md5(array_to_string(list_sort(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))), ' ')) AS fp,
               MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        FROM documents GROUP BY 1
      """)) { (spark, dir) =>
      Dedup.bagExact(Tables(spark, dir).documents, "doc_id", "text")
    },

    // ------------------------------------------------ corpus snapshot diff
    // Corpus.snapshotDiff: the change feed between two corpus versions.
    // v2 is derived deterministically in-query (every 17th doc removed,
    // every 13th survivor edited, every 29th re-added under a shifted id)
    // and the diff must scale with the CHANGE, not the corpus: unchanged
    // rows never leave the join. Oracle replays with direct text compare
    // (the operator compares 128-bit digests — same verdicts).
    Q(
      "corpus_snapshot_diff",
      Some("""
        WITH v1 AS (SELECT doc_id, text FROM documents),
        v2 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS text
          FROM v1 WHERE doc_id % 17 <> 0
          UNION ALL
          SELECT doc_id + 1000000, text FROM v1 WHERE doc_id % 29 = 0),
        j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.text AS t1, b.text AS t2
              FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        SELECT doc_id,
               CASE WHEN t1 IS NULL THEN 'added'
                    WHEN t2 IS NULL THEN 'removed'
                    WHEN t1 <> t2 THEN 'changed' END AS status
        FROM j WHERE t1 IS NULL OR t2 IS NULL OR t1 <> t2
      """)) { (spark, dir) =>
      val v1 = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
      val kept = v1
        .filter(pmod(col("doc_id"), lit(17)) =!= 0)
        .withColumn(
          "text",
          when(pmod(col("doc_id"), lit(13)) === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")))
      val added = v1
        .filter(pmod(col("doc_id"), lit(29)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Corpus.snapshotDiff(v1, kept.unionByName(added), "doc_id", "text")
    },

    // ------------------------------------- line-level boilerplate removal
    // Corpus.lineDedup (C4/RefinedWeb line pass). The corpus has no
    // newlines, so the query PLANTS the chrome deterministically: a cookie
    // banner + copyright footer on every document (corpus-wide DF → always
    // removed) and a per-source nav line (DF = docs-per-source — removed
    // exactly when the source clears minDf, which the oracle replays).
    // The content line survives unless the text itself is a ≥minDf exact
    // duplicate. Output hashes the reassembled document byte-for-byte.
    Q(
      "dedup_lines",
      Some("""
        WITH m AS (
          SELECT doc_id,
                 'ACCEPT COOKIES TO CONTINUE' || chr(10) || text || chr(10) ||
                 'nav: ' || source || chr(10) || '(c) example.com all rights reserved' AS t
          FROM documents),
        e AS (
          SELECT doc_id,
                 unnest(range(1, len(string_split(t, chr(10))) + 1)) AS pos,
                 unnest(string_split(t, chr(10))) AS line
          FROM m),
        ne AS (SELECT * FROM e WHERE length(trim(line)) > 0),
        ldf AS (SELECT line, COUNT(DISTINCT doc_id) AS line_df FROM ne GROUP BY line),
        keep AS (SELECT ne.doc_id, ne.pos, ne.line
                 FROM ne JOIN ldf USING (line) WHERE ldf.line_df < 10),
        r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t
              FROM keep GROUP BY doc_id)
        SELECT doc_id, length(t) AS n_clean, md5(t) AS fp FROM r
      """)) { (spark, dir) =>
      val messy = Tables(spark, dir).documents.select(
        col("doc_id"),
        concat(
          lit("ACCEPT COOKIES TO CONTINUE\n"),
          col("text"),
          lit("\nnav: "),
          col("source"),
          lit("\n(c) example.com all rights reserved")).as("text"))
      Corpus
        .lineDedup(messy, "doc_id", "text", minDf = 10)
        .select(col("doc_id"), length(col("text")).as("n_clean"), md5(col("text")).as("fp"))
    },

    // ----------------------------------------- exact n-gram Jaccard dedup
    // Inverted shingle-index join — the exact-semantics path (uncapped DF).
    Q(
      "dedup_ngram_jaccard",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        s AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t WHERE len(toks) >= 3)),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
        p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
              FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT a_id, b_id, CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jacc
        FROM p JOIN sz sa ON sa.doc_id = p.a_id JOIN sz sb ON sb.doc_id = p.b_id
        WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8
      """)) { (spark, dir) =>
      Dedup.jaccardPairs(Tables(spark, dir).documents, "doc_id", "text", threshold = 0.8)
    },

    // Prefix-filtered EXACT Jaccard join (AllPairs/PPJoin): same exact
    // output contract as dedup_ngram_jaccard — the oracle is the identical
    // brute computation — but candidate generation indexes only each doc's
    // (n − ⌈t·n⌉ + 1)-prefix of RAREST shingles, so the plan stays exact at
    // corpus scale without the maxShingleDF exactness trade-off. DedupSpec
    // pins prefix ≡ full-index results and the candidate-count reduction.
    Q(
      "dedup_prefix_jaccard",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        s AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t WHERE len(toks) >= 3)),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
        p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
              FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT a_id, b_id, CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jacc
        FROM p JOIN sz sa ON sa.doc_id = p.a_id JOIN sz sb ON sb.doc_id = p.b_id
        WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8
      """)) { (spark, dir) =>
      Dedup.prefixJaccardPairs(Tables(spark, dir).documents, "doc_id", "text", threshold = 0.8)
    },

    // Sorted-neighborhood ER blocking (Hernández-Stolfo): sort by name
    // within first-char hash blocks, pair a 3-wide window, verify with
    // Levenshtein ≤ 5 — the typo-level linkage pass token-set dedup
    // dilutes. No global window anywhere (block-partitioned row_number);
    // both engines implement the identical unit-cost edit distance.
    Q(
      "dedup_sorted_neighborhood",
      Some("""
        WITH s AS (SELECT p_partkey AS id, p_name AS key, substr(p_name, 1, 1) AS block,
                          row_number() OVER (PARTITION BY substr(p_name, 1, 1) ORDER BY p_name, p_partkey) AS rn
                   FROM part)
        SELECT x.id AS a_id, y.id AS b_id, CAST(levenshtein(x.key, y.key) AS INTEGER) AS dist
        FROM s x JOIN s y ON x.block = y.block AND y.rn > x.rn AND y.rn <= x.rn + 3
        WHERE levenshtein(x.key, y.key) <= 5
      """)) { (spark, dir) =>
      Dedup.sortedNeighborPairs(
        Tables(spark, dir).part, "p_partkey", "p_name", window = 3, maxDist = 5, blockLen = 1)
    },

    // --------------------------------- Fellegi-Sunter probabilistic ER
    // The 1969 probabilistic linkage layer over (brand, size)-blocked
    // part pairs: per-field ln(m/u) / ln((1-m)/(1-u)) weights on the
    // 1e-12 grid, exact decimal score sum, three-way match / possible /
    // nonmatch decision at decimal thresholds ±2. Scores AND decisions
    // replay bit-for-bit (the NB-scorer decimal discipline on linkage).
    Q(
      "er_fellegi_sunter",
      Some("""
        WITH p AS (SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
                          a.p_type = b.p_type AS agree_type,
                          a.p_retailprice = b.p_retailprice AS agree_price,
                          string_split(a.p_name, ' ')[1] = string_split(b.p_name, ' ')[1] AS agree_tok
                   FROM part a JOIN part b
                     ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey),
        s AS (SELECT a_id, b_id, agree_type, agree_price, agree_tok,
                     (CASE WHEN agree_type THEN CAST(round(ln(0.95/0.05), 12) AS DECIMAL(20,12))
                           ELSE CAST(round(ln((1-0.95)/(1-0.05)), 12) AS DECIMAL(20,12)) END
                    + CASE WHEN agree_price THEN CAST(round(ln(0.9/0.02), 12) AS DECIMAL(20,12))
                           ELSE CAST(round(ln((1-0.9)/(1-0.02)), 12) AS DECIMAL(20,12)) END
                    + CASE WHEN agree_tok THEN CAST(round(ln(0.85/0.01), 12) AS DECIMAL(20,12))
                           ELSE CAST(round(ln((1-0.85)/(1-0.01)), 12) AS DECIMAL(20,12)) END) AS score
              FROM p)
        SELECT a_id, b_id, agree_type, agree_price, agree_tok,
               CAST(score AS DOUBLE) AS score,
               CASE WHEN score >= CAST(2.0 AS DECIMAL(20,12)) THEN 'match'
                    WHEN score <= CAST(-2.0 AS DECIMAL(20,12)) THEN 'nonmatch'
                    ELSE 'possible' END AS decision
        FROM s
      """)) { (spark, dir) =>
      val p = Tables(spark, dir).part
      def side(pfx: String) = p.select(
        col("p_partkey").as(s"${pfx}_key"),
        col("p_brand").as(s"${pfx}_brand"),
        col("p_size").as(s"${pfx}_size"),
        col("p_type").as(s"${pfx}_type"),
        col("p_retailprice").as(s"${pfx}_price"),
        split(col("p_name"), " ").getItem(0).as(s"${pfx}_tok"))
      val pairs = side("a")
        .join(
          side("b"),
          col("a_brand") === col("b_brand") && col("a_size") === col("b_size") &&
            col("a_key") < col("b_key"))
        .select(
          col("a_key").as("a_id"),
          col("b_key").as("b_id"),
          (col("a_type") === col("b_type")).as("agree_type"),
          (col("a_price") === col("b_price")).as("agree_price"),
          (col("a_tok") === col("b_tok")).as("agree_tok"))
      Dedup.fellegiSunterScores(
        pairs,
        Seq(("agree_type", 0.95, 0.05), ("agree_price", 0.9, 0.02), ("agree_tok", 0.85, 0.01)),
        upper = 2.0,
        lower = -2.0)
    },

    // -------------------------------------------------- containment dedup
    // Asymmetric |A∩B|/|A|: the subset/quote detector symmetric jaccard
    // structurally misses (a short doc fully quoted inside a long one has
    // jacc ≈ |A|/|B| but containment 1.0). Directional rows; unordered
    // pair counts computed once, both directions derive from the same row.
    Q(
      "dedup_containment",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        s AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t WHERE len(toks) >= 3)),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
        p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
              FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        d AS (
          SELECT a_id AS inner_id, b_id AS outer_id, CAST(shared AS DOUBLE) / sa.n AS containment
          FROM p JOIN sz sa ON sa.doc_id = p.a_id
          UNION ALL
          SELECT b_id, a_id, CAST(shared AS DOUBLE) / sb.n
          FROM p JOIN sz sb ON sb.doc_id = p.b_id)
        SELECT inner_id, outer_id, containment FROM d WHERE containment >= 0.9
      """)) { (spark, dir) =>
      Dedup.containmentPairs(Tables(spark, dir).documents, "doc_id", "text", threshold = 0.9)
    },

    // ------------------------------------------------- MinHash + LSH dedup
    // Same output contract as dedup_ngram_jaccard (the oracle is the exact
    // computation): LSH proposes, exact jaccard verifies. With k=128 b=32
    // r=4, a true-0.8 pair is missed w.p. ~5e-8 — the scale path at oracle
    // fidelity.
    Q(
      "dedup_minhash_lsh",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        s AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t WHERE len(toks) >= 3)),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
        p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
              FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT a_id, b_id, CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jacc
        FROM p JOIN sz sa ON sa.doc_id = p.a_id JOIN sz sb ON sb.doc_id = p.b_id
        WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8
      """)) { (spark, dir) =>
      Dedup.minhashDupPairs(Tables(spark, dir).documents, "doc_id", "text", threshold = 0.8)
    },

    // --------------------------------------------- keep-first dedup flags
    // The streaming-ingestion DECISION table: each doc that near-dups an
    // EARLIER (smaller-id) doc, with its earliest partner and the exact
    // verified jaccard — what a live gate rejects at the door. Batch twin
    // of streaming.DocStreams.nearDupPairStream (StreamingSpec pins the
    // stream to this output); the oracle is the exact pair computation +
    // keep-first window, the dedup_minhash_lsh discipline.
    Q(
      "dedup_neardup_flags",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        s AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t WHERE len(toks) >= 3)),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
        p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
              FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        pj AS (SELECT a_id, b_id, CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jacc
               FROM p JOIN sz sa ON sa.doc_id = p.a_id JOIN sz sb ON sb.doc_id = p.b_id
               WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8)
        SELECT b_id AS doc_id, a_id AS anchor_id, jacc FROM (
          SELECT a_id, b_id, jacc, ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY a_id) AS rn FROM pj)
        WHERE rn = 1
      """)) { (spark, dir) =>
      Dedup.nearDupFlags(Tables(spark, dir).documents, "doc_id", "text", threshold = 0.8)
    },

    // ------------------------------------------------ incremental dedup
    // New batch (odd doc_ids) deduped against a stored index of the old
    // corpus (even doc_ids) — the daily-ingestion shape. Oracle: the full
    // exact-jaccard pair set restricted to pairs touching a new doc.
    Q(
      "dedup_incremental",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        s AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t WHERE len(toks) >= 3)),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
        p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
              FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT a_id, b_id, CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jacc
        FROM p JOIN sz sa ON sa.doc_id = p.a_id JOIN sz sb ON sb.doc_id = p.b_id
        WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8
          AND (a_id % 2 = 1 OR b_id % 2 = 1)
      """)) { (spark, dir) =>
      // both halves sliced from ONE stored index (the same cached scan the
      // rest of the dedup family shares) — the pure stored-index path
      val index = Dedup.shingleHashRows(Tables(spark, dir).documents, "doc_id", "text").cache()
      Dedup.incrementalJaccardPairsFromIndexes(
        index.filter(col("doc_id") % 2 === 1),
        index.filter(col("doc_id") % 2 === 0),
        threshold = 0.8)
    },

    // ------------------------------------------------ duplicate clusters
    // Connected components over the >=0.8-jaccard near-dup graph: each doc
    // mapped to its cluster's minimum doc_id. Oracle: recursive CTE
    // reachability (UNION-dedup terminates on cycles).
    Q(
      "dedup_clusters",
      Some("""
        WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        s AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t WHERE len(toks) >= 3)),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
        p0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
               FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        p AS (SELECT a_id, b_id FROM p0 JOIN sz sa ON sa.doc_id = p0.a_id JOIN sz sb ON sb.doc_id = p0.b_id
              WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
        e AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
        reach(id, lab) AS (
          SELECT src, src FROM e
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id)
        SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
      """)) { (spark, dir) =>
      Dedup.duplicateClusters(
        Dedup.jaccardPairs(Tables(spark, dir).documents, "doc_id", "text", threshold = 0.8))
    },

    // ------------------------------------------- canonical doc selection
    // Survivor selection per duplicate cluster: keep each cluster's longest
    // document (ties → smallest doc_id); singletons survive as their own
    // cluster. One row per document — the deduplicated corpus is
    // doc_id = keep_id. Oracle: the dedup_clusters recursive CTE extended
    // with a COALESCE for singletons and a FIRST_VALUE window.
    Q(
      "dedup_canonical",
      Some("""
        WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        s AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t WHERE len(toks) >= 3)),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
        p0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
               FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        p AS (SELECT a_id, b_id FROM p0 JOIN sz sa ON sa.doc_id = p0.a_id JOIN sz sb ON sb.doc_id = p0.b_id
              WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
        e AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
        reach(id, lab) AS (
          SELECT src, src FROM e
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id),
        c AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
        lab AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id, LENGTH(d.text) AS len
                FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id)
        SELECT doc_id, cluster_id,
               FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id ORDER BY len DESC, doc_id) AS keep_id
        FROM lab
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      Dedup.canonicalDocs(
        docs,
        "doc_id",
        "text",
        Dedup.duplicateClusters(Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8)))
    },

    // ------------------------------------- leakage-safe train/val/test
    // Fold assignment per near-dup CLUSTER (never per document): a
    // near-duplicate of a training doc in the eval fold is benchmark
    // contamination. Split = md5(cluster_id) against precomputed hex
    // thresholds (Corpus.splitBoundaries literals, embedded in the oracle
    // verbatim), so the compare is pure string/integer — the oracle is the
    // dedup_clusters recursive CTE + a CASE chain.
    Q("split_leakage_safe", Some(leakageSafeSplitOracle)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      Corpus.leakageSafeSplit(
        docs,
        "doc_id",
        Dedup.duplicateClusters(Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8)),
        splitFractions)
    },

    // ------------------------------------ reproducible training shards
    // The terminal write-side step: deterministic global shuffle into 8
    // equal hash-range shards + a portable within-shard order key (full
    // md5 hex) — same shard contents and order on any engine/run, no RNG
    // state. Zero-shuffle narrow projection (PlanSpec); a writer adds one
    // repartition(shard) + sortWithinPartitions(order_key), never a
    // global sort.
    Q(
      "corpus_shards",
      Some("""
        WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hex FROM documents)
        SELECT doc_id,
               CASE WHEN substr(hex, 1, 4) < '2000' THEN 0
                    WHEN substr(hex, 1, 4) < '4000' THEN 1
                    WHEN substr(hex, 1, 4) < '6000' THEN 2
                    WHEN substr(hex, 1, 4) < '8000' THEN 3
                    WHEN substr(hex, 1, 4) < 'a000' THEN 4
                    WHEN substr(hex, 1, 4) < 'c000' THEN 5
                    WHEN substr(hex, 1, 4) < 'e000' THEN 6
                    ELSE 7 END AS shard,
               hex AS order_key
        FROM h
      """)) { (spark, dir) =>
      Corpus.shardAssignment(Tables(spark, dir).documents, "doc_id", shards = 8)
    },

    // ----------------------------------------- repeated n-gram spans
    // Span-granular exact dedup (Lee et al. 2022): 8-grams appearing in >=2
    // distinct documents mark duplicated spans to cut or down-weight. The
    // oracle keeps gram TEXT as the group key; Corpus.ngramSpans(hashGrams=
    // true) is the scale path (8-byte xxhash64 shuffle keys) and CorpusSpec
    // proves the two agree.
    Q(
      "dedup_ngram_spans",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' '))) AS gram
              FROM t WHERE len(toks) >= 8)
        SELECT gram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
        FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
      """)) { (spark, dir) =>
      Corpus.ngramSpans(Tables(spark, dir).documents, "doc_id", "text", n = 8, minDocs = 2)
    },

    // ---------------------------------------- duplicated-span cutting
    // The action dedup_ngram_spans reports: tokens covered by any 8-gram
    // seen in >=2 documents are cut, survivors re-join in order (Lee et
    // al. 2022 span dedup). The oracle replays positions with gram TEXT;
    // the engine shuffles 8-byte gram hashes (CorpusSpec pins hash==text).
    Q(
      "dedup_cut_spans",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        t1 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 1),
        g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6), i -> {'gpos': i, 'gram': array_to_string(toks[i:i+7], ' ')})) AS u
               FROM t1 WHERE len(toks) >= 8),
        g AS (SELECT doc_id, u.gpos AS gpos, u.gram AS gram FROM g0),
        flagged AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
        cov0 AS (SELECT doc_id, unnest(range(gpos, gpos + 8)) AS pos FROM g JOIN flagged USING (gram)),
        cov AS (SELECT DISTINCT doc_id, pos FROM cov0),
        tok AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1), i -> {'pos': i, 'token': toks[i]})) AS u FROM t1),
        tk AS (SELECT doc_id, u.pos AS pos, u.token AS token FROM tok)
        SELECT tk.doc_id,
               COALESCE(array_to_string(list(tk.token ORDER BY tk.pos) FILTER (WHERE cov.pos IS NULL), ' '), '') AS clean_text,
               CAST(COUNT(cov.pos) AS BIGINT) AS n_removed
        FROM tk LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.pos = tk.pos
        GROUP BY tk.doc_id
      """)) { (spark, dir) =>
      Corpus.cutSpans(Tables(spark, dir).documents, "doc_id", "text", n = 8, minDocs = 2)
    },

    // ------------------------------------- exact-substring span extents
    // Suffix-array-style ExactSubstr (Lee et al. 2022 §4.1): maximal
    // merged extents of every >=8-token substring occurring MORE THAN
    // ONCE in the corpus, total-occurrence multiplicity (within-doc
    // repeats flagged too — what the distinct-doc span family misses).
    // Identity: repeated >=L extents == union of repeated L-gram windows,
    // so two linear aggregations replace the suffix array; the oracle
    // replays positions with gram TEXT while the engine shuffles hashes.
    Q(
      "dedup_exact_substr",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        pos AS (SELECT doc_id, CAST(i AS BIGINT) AS p, array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+7], ' ') AS g
                FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 8 + 2)) AS i) u
                WHERE len(toks) >= 8),
        rep AS (SELECT g FROM (SELECT g, COUNT(*) AS c FROM pos GROUP BY g) WHERE c >= 2),
        f AS (SELECT doc_id, p FROM pos JOIN rep USING (g)),
        m AS (SELECT doc_id, p,
                     MAX(p + 7) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
              FROM f),
        i AS (SELECT doc_id, p,
                     SUM(CASE WHEN prev_end IS NULL OR p > prev_end + 1 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS island
              FROM m)
        SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start, CAST(MAX(p) + 7 AS BIGINT) AS span_end
        FROM i GROUP BY doc_id, island
      """)) { (spark, dir) =>
      Corpus.exactSubstrSpans(Tables(spark, dir).documents, "doc_id", "text", minLen = 8)
    },

    // ---------------------------------------- mixture resampling
    // Deterministic data-mixing: src0 down to 0.35x, src1 up to 2.4x, src2
    // dropped, src3 at 1.75x, everything else passes through. Thresholds
    // are literal hex prefixes (0.35 -> floor(0.35*65536) = 0x5999), so the
    // oracle replays the exact same keep/copy decisions.
    Q(
      "corpus_resample",
      Some("""
        WITH r AS (
          SELECT doc_id, source,
                 CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 2 WHEN 'src2' THEN 0 WHEN 'src3' THEN 1 ELSE 1 END AS base,
                 CASE source WHEN 'src0' THEN '5999' WHEN 'src1' THEN '6666' WHEN 'src2' THEN '0000' WHEN 'src3' THEN 'c000' ELSE '0000' END AS th,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
          FROM documents),
        k AS (SELECT doc_id, source, base + CASE WHEN h < th THEN 1 ELSE 0 END AS copies
              FROM r WHERE base + CASE WHEN h < th THEN 1 ELSE 0 END > 0)
        SELECT doc_id, source, CAST(unnest(range(copies)) AS BIGINT) AS copy_idx FROM k
      """)) { (spark, dir) =>
      Corpus.resampleMixture(
        Tables(spark, dir).documents,
        "doc_id",
        "source",
        rates = Map("src0" -> 0.35, "src1" -> 2.4, "src2" -> 0.0, "src3" -> 1.75))
    },

    // ------------------------------------ DSIR importance log-weights
    // Xie et al. NeurIPS'23: every document scored by Σ_b c_b·Δ_b over
    // hashed unigram+bigram buckets, Δ_b the add-1-smoothed log ratio of
    // an English-target distribution (lang='en' docs) to the raw corpus.
    // The oracle replays the portable roll_hash∘mix64 featurization (same
    // HUGEINT machinery as dedup_simhash), the per-bucket ln ratio on the
    // 1e-12 DECIMAL grid, and the exact decimal per-doc sum — so the
    // double column hash-matches despite being built from ln().
    // ASCII-corpus assumption (same as dedup_winnow): the replay hashes
    // per-character ord() code points while RollHash hashes UTF-8 BYTES —
    // identical only while the corpus is ASCII (true for the generated
    // testdata; a non-ASCII vintage would need ord() swapped for an
    // encode()-byte replay, an oracle-fidelity issue, not an engine bug).
    Q(
      "corpus_dsir_weights",
      Some("""
        WITH toksd AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0) AS ts
          FROM documents),
        grams AS (
          SELECT doc_id, lang, unnest(ts) AS gram FROM toksd
          UNION ALL
          SELECT doc_id, lang, ts[i] || ' ' || ts[i + 1] AS gram
          FROM toksd, LATERAL (SELECT unnest(range(1, len(ts))) AS i) u),
        dt AS (SELECT DISTINCT gram FROM grams),
        pows AS (
          WITH RECURSIVE p(j, v) AS (
            SELECT 0, 1::HUGEINT
            UNION ALL
            SELECT j + 1, (v * 1000003::HUGEINT) % 18446744073709551616::HUGEINT
            FROM p WHERE j < (SELECT max(length(gram)) FROM dt))
          SELECT * FROM p),
        chars AS (
          SELECT gram, length(gram) - i AS rev, ord(substr(gram, i, 1))::HUGEINT AS b
          FROM dt, LATERAL (SELECT unnest(range(1, length(gram) + 1)) AS i) u),
        roll AS (
          SELECT c.gram, CAST(sum(c.b * p.v) % 18446744073709551616::HUGEINT AS UBIGINT) AS r
          FROM chars c JOIN pows p ON p.j = c.rev GROUP BY c.gram),
        mix1a AS (SELECT gram, xor(r, r >> 30) AS a FROM roll),
        mix1  AS (SELECT gram, CAST((( (a & 4294967295)::HUGEINT * 13787848793156543929::HUGEINT
                     + (((a >> 32)::HUGEINT * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
                   ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z1 FROM mix1a),
        mix2a AS (SELECT gram, xor(z1, z1 >> 27) AS a FROM mix1),
        mix2  AS (SELECT gram, CAST((( (a & 4294967295)::HUGEINT * 10723151780598845931::HUGEINT
                     + (((a >> 32)::HUGEINT * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
                   ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z2 FROM mix2a),
        bmap AS (SELECT gram, CAST(xor(z2, z2 >> 31) & 65535 AS BIGINT) AS bucket FROM mix2),
        occ AS (SELECT g.doc_id, g.lang, b.bucket FROM grams g JOIN bmap b USING (gram)),
        rc AS (SELECT bucket, count(*) AS rcnt FROM occ GROUP BY 1),
        tc AS (SELECT bucket, count(*) AS tcnt FROM occ WHERE lang = 'en' GROUP BY 1),
        tot AS (SELECT (SELECT count(*) FROM occ WHERE lang = 'en') AS t_tot,
                       (SELECT count(*) FROM occ) AS r_tot),
        delta AS (
          SELECT r.bucket,
                 CAST(round(ln(coalesce(t.tcnt, 0) + 1.0) - ln(tot.t_tot + 65536.0)
                          - ln(r.rcnt + 1.0) + ln(tot.r_tot + 65536.0), 12) AS DECIMAL(30,12)) AS delta
          FROM rc r LEFT JOIN tc t USING (bucket), tot),
        perdoc AS (SELECT doc_id, bucket, count(*) AS cnt FROM occ GROUP BY 1, 2)
        SELECT p.doc_id, CAST(sum(p.cnt) AS BIGINT) AS n_feats,
               CAST(round(sum(p.cnt * d2.delta), 6) AS DOUBLE) AS log_w
        FROM perdoc p JOIN delta d2 USING (bucket)
        GROUP BY 1
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      Corpus.dsirLogWeights(docs, docs.filter(col("lang") === "en"), "doc_id", "text")
    },

    // --------------------------------------- temperature mixture (τ = 2)
    // Rates derived from the data (rate_i = n_i^{1/τ}/Σ·N/n_i), then the
    // same md5-threshold resample as corpus_resample. The oracle replays
    // the rate derivation with the identical double op sequence (ordered
    // list_reduce for Σ, left-assoc rate chain) and the same 16-bit
    // threshold quantization — pow's last-ulp freedom cannot flip a
    // 16-bit bucket except within ~2^-40 of a boundary.
    Q(
      "corpus_temperature",
      Some("""
        WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        tot AS (SELECT SUM(n) AS nn FROM c),
        q AS (SELECT source, n, power(CAST(n AS DOUBLE), CAST(1.0 AS DOUBLE) / 2.0) AS qv FROM c),
        z AS (SELECT list_reduce(list(qv ORDER BY source), (a, b) -> a + b) AS zz FROM q),
        r AS (SELECT source, qv / (SELECT zz FROM z) * (SELECT nn FROM tot) / n AS rate FROM q),
        t AS (SELECT source,
                     CAST(floor(rate) AS BIGINT) AS base,
                     printf('%04x', CAST(floor((rate - floor(rate)) * 65536) AS BIGINT)) AS th
              FROM r),
        s AS (SELECT d.doc_id, d.source, t.base, t.th,
                     substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS h
              FROM documents d JOIN t USING (source)),
        k AS (SELECT doc_id, source, base + CASE WHEN h < th THEN 1 ELSE 0 END AS copies
              FROM s WHERE base + CASE WHEN h < th THEN 1 ELSE 0 END > 0)
        SELECT doc_id, source, CAST(unnest(range(copies)) AS BIGINT) AS copy_idx FROM k
      """)) { (spark, dir) =>
      Corpus.temperatureMixture(Tables(spark, dir).documents, "doc_id", "source", tau = 2.0)
    },

    // ---------------------------------------- eval-set decontamination
    // Benchmark contamination check (GPT-3 App. C shape): distinct n-grams
    // shared between each training doc and a held-out eval slice (doc_id %
    // 100 == 0 stands in for the benchmark corpus). Eval grams broadcast —
    // never a corpus-sized shuffle. n=4 here because the synthetic corpus
    // draws uniformly from a tiny vocabulary, so longer grams are unique
    // w.h.p. and the overlap set would be empty; real pipelines run the
    // same operator at n=8..13.
    Q(
      "decontam_overlap",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        g AS (SELECT DISTINCT doc_id, gram FROM (
              SELECT doc_id, unnest(list_transform(range(1, len(toks) - 2), i -> array_to_string(toks[i:i+3], ' '))) AS gram
              FROM t WHERE len(toks) >= 4)),
        ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 100 = 0),
        tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 100 <> 0)
        SELECT tr.doc_id, COUNT(*) AS n_shared_grams
        FROM tr JOIN ev ON tr.gram = ev.gram
        GROUP BY tr.doc_id
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      Corpus.evalOverlap(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", n = 4)
    },

    // ---------------------------------------- data-constrained epoch plan
    // Muennighoff et al. 2023 planning read: per source — unique token
    // supply, the budget's share-weighted desired allocation, the 4-epoch
    // repeat cap, and the served level. ALL allocation arithmetic is
    // integer DIV (no float ever decides a token); shares derive from the
    // source name so the row replays at any SF. High-share small sources
    // hit the cap (capped=true, shortfall>0), low-share ones don't — both
    // branches live at the gate SF.
    Q(
      "corpus_epoch_plan",
      Some("""
        WITH ps AS (SELECT source, COUNT(*) AS n_docs,
                           CAST(SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens
                    FROM documents GROUP BY 1),
        sh AS (SELECT source, CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS BIGINT) AS share
               FROM (SELECT DISTINCT source FROM documents)),
        tot AS (SELECT CAST(SUM(share) AS BIGINT) AS share_sum FROM sh),
        j AS (SELECT ps.source, n_docs, n_tokens, COALESCE(sh.share, 0) AS share
              FROM ps LEFT JOIN sh USING (source)),
        a AS (SELECT *,
                     CAST((100000 * share) // (SELECT share_sum FROM tot) AS BIGINT) AS desired_tokens,
                     CAST((n_tokens * 4) // 1 AS BIGINT) AS cap_tokens
              FROM j)
        SELECT source, n_docs, n_tokens, share, desired_tokens, cap_tokens,
               least(desired_tokens, cap_tokens) AS served_tokens,
               round(CASE WHEN n_tokens > 0
                          THEN CAST(least(desired_tokens, cap_tokens) AS DOUBLE) / n_tokens
                          ELSE 0.0 END, 6) AS epochs,
               desired_tokens > cap_tokens AS capped,
               desired_tokens - least(desired_tokens, cap_tokens) AS budget_shortfall
        FROM a
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      val shares = docs
        .select(col("source")).distinct()
        .select(
          col("source"),
          (substring(col("source"), 4, 10).cast("int") % 4 + 1).cast("long").as("share"))
      Corpus.epochPlan(docs, "source", "text", tokenBudget = 100000L, shares = shares,
        maxEpochsNum = 4L, maxEpochsDen = 1L)
    },

    // -------------------------------------------- sequence packing spans
    // The full SPAN MAP upgrade over pack_sequences (which assigns each
    // doc only its first window): per source shard, docs concatenate in
    // doc_id order and split into 512-token sequences; a doc crossing a
    // boundary emits one span row per overlapped sequence with the
    // intra-doc token range — what a tokenize-and-pack writer consumes.
    // ALL integer arithmetic (running window offsets, DIV splits) — exact
    // compare. The shard is the parallelism unit, like production packers.
    Q(
      "corpus_pack_spans",
      Some("""
        WITH base AS (
          SELECT source AS shard, doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
          FROM documents),
        nz AS (SELECT * FROM base WHERE n_tok > 0),
        off AS (SELECT shard, doc_id, n_tok,
                       CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
                FROM nz),
        x AS (SELECT shard, doc_id, n_tok, start_off,
                     unnest(range(start_off // 512, (start_off + n_tok - 1) // 512 + 1)) AS seq_id
              FROM off)
        SELECT shard, seq_id, doc_id,
               GREATEST(start_off, seq_id * 512) - start_off AS doc_tok_start,
               LEAST(start_off + n_tok, (seq_id + 1) * 512) - start_off AS doc_tok_end,
               GREATEST(start_off, seq_id * 512) - seq_id * 512 AS seq_tok_start
        FROM x
      """)) { (spark, dir) =>
      Corpus.packSpans(Tables(spark, dir).documents, "doc_id", "text",
        seqLen = 512, shardCol = "source")
    },

    // ---------------------------------------------- packing efficiency
    // The number a pipeline watches when choosing shard granularity: per
    // shard, token supply, sequence count, and the padding the final
    // partial sequence carries (pure training-time waste). Integer counts,
    // one rounded fraction.
    Q(
      "corpus_pack_stats",
      Some("""
        WITH base AS (
          SELECT source AS shard,
                 CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
          FROM documents),
        nz AS (SELECT * FROM base WHERE n_tok > 0),
        agg AS (SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
                FROM nz GROUP BY 1)
        SELECT shard, n_docs, n_tokens,
               CAST((n_tokens + 511) // 512 AS BIGINT) AS n_seqs,
               CAST(((n_tokens + 511) // 512) * 512 - n_tokens AS BIGINT) AS pad_tokens,
               round(CAST(((n_tokens + 511) // 512) * 512 - n_tokens AS DOUBLE) /
                     CAST(((n_tokens + 511) // 512) * 512 AS DOUBLE), 6) AS pad_frac
        FROM agg
      """)) { (spark, dir) =>
      Corpus.packStats(Tables(spark, dir).documents, "text", seqLen = 512, shardCol = "source")
    },

    // ------------------------------ decontamination, beyond-broadcast path
    // Same contamination report as decontam_overlap, computed through the
    // Bloom-prefilter + shuffle-verify plan (the shape for eval sets too
    // big to broadcast as a join relation). Bloom FPs are removed by the
    // exact verify join, so the oracle is the SAME exact SQL — the scale
    // path is hash-checked, not just rows-counted.
    Q(
      "decontam_bloom",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        g AS (SELECT DISTINCT doc_id, gram FROM (
              SELECT doc_id, unnest(list_transform(range(1, len(toks) - 2), i -> array_to_string(toks[i:i+3], ' '))) AS gram
              FROM t WHERE len(toks) >= 4)),
        ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 100 = 0),
        tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 100 <> 0)
        SELECT tr.doc_id, COUNT(*) AS n_shared_grams
        FROM tr JOIN ev ON tr.gram = ev.gram
        GROUP BY tr.doc_id
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      Corpus.evalOverlapBloom(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", n = 4)
    },

    // -------------------------------------------- sequence packing
    // Concat-and-chunk packing into 256-token context windows, per source
    // shard in doc_id order — pure integer window arithmetic, so the oracle
    // replays it exactly with a SQL running sum.
    Q(
      "pack_sequences",
      Some("""
        WITH b AS (
          SELECT doc_id, source AS shard,
                 len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
          FROM documents),
        w AS (
          SELECT doc_id, shard, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start
          FROM b WHERE n_tokens > 0)
        SELECT doc_id, shard, n_tokens, start // 256 AS pack_id, start % 256 AS pack_offset
        FROM w
      """)) { (spark, dir) =>
      Corpus.packSequences(Tables(spark, dir).documents, "doc_id", "text", capacity = 256, shardCol = "source")
    },

    // ------------------------------------------ context-window chunking
    // The complement of pack_sequences: split LONG documents into
    // fixed-token windows (16 tokens, 4 overlap → stride 12) for a
    // bounded-sequence trainer / RAG index. Purely narrow arithmetic —
    // exact integer chunk counts, so fully oracle-checkable.
    Q(
      "chunk_documents",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        t1 AS (SELECT doc_id, toks, len(toks) AS len FROM t WHERE len(toks) > 0),
        n AS (SELECT doc_id, toks, len,
                     CASE WHEN len <= 16 THEN 1 ELSE (len - 16 + 11) // 12 + 1 END AS n_chunks
              FROM t1),
        c AS (SELECT doc_id, toks, len, unnest(range(0, n_chunks)) AS chunk_id FROM n)
        SELECT doc_id, chunk_id,
               array_to_string(toks[chunk_id * 12 + 1 : chunk_id * 12 + 16], ' ') AS chunk_text,
               LEAST(len - chunk_id * 12, 16) AS n_tokens
        FROM c
      """)) { (spark, dir) =>
      Corpus.chunkDocuments(Tables(spark, dir).documents, "doc_id", "text", chunkSize = 16, overlap = 4)
    },

    // ------------------------------------- bigram LM fluency score (CCNet)
    // Self-scored add-0.5 smoothed bigram log-probability per document —
    // the perplexity-style quality gate, as a pure count LM. Exact-integer
    // counts; ln matched in shape; per-doc sum folded in POSITION order on
    // both engines; mean emitted at round(·, 6).
    Q(
      "lm_bigram_score",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        t2 AS (SELECT doc_id, toks, len(toks) AS len FROM t WHERE len(toks) >= 2),
        big0 AS (SELECT doc_id, unnest(list_transform(range(1, len), i -> {'pos': i, 'w1': toks[i], 'w2': toks[i + 1]})) AS u FROM t2),
        b AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM big0),
        uni AS (SELECT word, COUNT(*) AS c1 FROM (SELECT unnest(toks) AS word FROM t) GROUP BY 1),
        bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
        v AS (SELECT COUNT(*) AS vsz FROM uni),
        lp AS (SELECT b.doc_id, b.pos,
                      ln((CAST(COALESCE(c2, 0) AS DOUBLE) + 0.5) / (CAST(COALESCE(c1, 0) AS DOUBLE) + 0.5 * CAST(vsz AS DOUBLE))) AS logp
               FROM b
               LEFT JOIN bic USING (w1, w2)
               LEFT JOIN uni ON uni.word = b.w1
               CROSS JOIN v),
        agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                       list_reduce(list(logp ORDER BY pos), (a, b) -> a + b) AS s
                FROM lp GROUP BY doc_id)
        SELECT doc_id, n_bigrams, ROUND(s / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob FROM agg
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      LanguageModel.bigramScore(docs, docs, "doc_id", "text")
    },

    // ------------------------------ interpolated Kneser-Ney bigram LM
    // The production count-LM smoothing (KenLM / the CCNet filter LMs)
    // beside the add-k baseline: discounted bigram mass redistributed by
    // CONTINUATION counts (how many contexts a word completes), not raw
    // frequency. All counts from one bigram aggregation; D = 0.75 exact
    // binary; fixed-order double probability, grid-12 ln, exact decimal
    // per-doc sums, one division under round(., 6).
    Q(
      "lm_kneser_ney",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        t2 AS (SELECT doc_id, toks, len(toks) AS len FROM t WHERE len(toks) >= 2),
        big0 AS (SELECT doc_id, unnest(list_transform(range(1, len), i -> {'pos': i, 'w1': toks[i], 'w2': toks[i + 1]})) AS u FROM t2),
        b AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM big0),
        bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1, COUNT(*) AS n1f FROM bic GROUP BY 1),
        cont AS (SELECT w2, COUNT(*) AS n1b FROM bic GROUP BY 1),
        v AS (SELECT COUNT(*) AS nall FROM bic),
        lp AS (SELECT b.doc_id, b.pos,
                      round(ln(greatest(
                        CASE WHEN COALESCE(c1, 0) > 0
                             THEN (greatest(CAST(COALESCE(c2, 0) AS DOUBLE) - 0.75, 0.0)
                                   + 0.75 * CAST(n1f AS DOUBLE)
                                     * (CAST(COALESCE(n1b, 0) AS DOUBLE) / CAST(nall AS DOUBLE)))
                                  / CAST(c1 AS DOUBLE)
                             ELSE CAST(COALESCE(n1b, 0) AS DOUBLE) / CAST(nall AS DOUBLE) END,
                        1e-12)), 12) AS logp
               FROM b
               LEFT JOIN bic USING (w1, w2)
               LEFT JOIN ctx USING (w1)
               LEFT JOIN cont USING (w2)
               CROSS JOIN v),
        agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                       round(SUM(CAST(logp AS DECIMAL(20,12))), 9) AS s
                FROM lp GROUP BY doc_id)
        SELECT doc_id, n_bigrams,
               ROUND(CAST(s AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob
        FROM agg
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      LanguageModel.kneserNeyScore(docs, docs, "doc_id", "text")
    },

    // ------------------------------------- Good-Turing re-estimation
    // The estimator behind Katz backoff: adjusted count r* =
    // (r+1)*N_{r+1}/N_r over the counts-of-counts table (Good 1953).
    // Two aggregations collapse the corpus to one row per distinct
    // frequency; r* is one fixed-order double formula from exact
    // integers, NULL at count-of-count gaps (reported, not smoothed).
    Q(
      "lm_good_turing",
      Some("""
        WITH tk AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
                    FROM documents),
        c AS (SELECT w, COUNT(*) AS c FROM tk GROUP BY 1),
        nr AS (SELECT c AS r, COUNT(*) AS n_r FROM c GROUP BY 1)
        SELECT a.r, a.n_r,
               round(((a.r + 1) * CAST(b.n_r AS DOUBLE)) / CAST(a.n_r AS DOUBLE), 6) AS r_star
        FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
        ORDER BY a.r
      """)) { (spark, dir) =>
      LanguageModel.goodTuring(Tables(spark, dir).documents, "text")
    },

    // --------------------------- CCNet head/middle/tail LM partitioning
    // The signature CCNet move (Wenzek et al. 2020): tercile-cut the
    // corpus by in-corpus LM fluency — head kept for training, tail
    // dropped/down-weighted. Boundaries are exact interpolated
    // percentiles rounded to 1e-4 before any comparison (the
    // quantile_bucketize discipline), scores ride the proven
    // lm_bigram_score chain, so per-doc bucket labels hash-match.
    Q(
      "corpus_ccnet_buckets",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        t2 AS (SELECT doc_id, toks, len(toks) AS len FROM t WHERE len(toks) >= 2),
        big0 AS (SELECT doc_id, unnest(list_transform(range(1, len), i -> {'pos': i, 'w1': toks[i], 'w2': toks[i + 1]})) AS u FROM t2),
        b AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM big0),
        uni AS (SELECT word, COUNT(*) AS c1 FROM (SELECT unnest(toks) AS word FROM t) GROUP BY 1),
        bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
        v AS (SELECT COUNT(*) AS vsz FROM uni),
        lp AS (SELECT b.doc_id, b.pos,
                      ln((CAST(COALESCE(c2, 0) AS DOUBLE) + 0.5) / (CAST(COALESCE(c1, 0) AS DOUBLE) + 0.5 * CAST(vsz AS DOUBLE))) AS logp
               FROM b
               LEFT JOIN bic USING (w1, w2)
               LEFT JOIN uni ON uni.word = b.w1
               CROSS JOIN v),
        agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                       list_reduce(list(logp ORDER BY pos), (a, b) -> a + b) AS s
                FROM lp GROUP BY doc_id),
        sc AS (SELECT doc_id, ROUND(s / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob FROM agg),
        bounds AS (SELECT round(quantile_cont(avg_logprob, CAST(1.0 AS DOUBLE) / 3.0), 4) AS b0,
                          round(quantile_cont(avg_logprob, CAST(2.0 AS DOUBLE) / 3.0), 4) AS b1
                   FROM sc)
        SELECT doc_id, avg_logprob,
               CASE WHEN avg_logprob <= b0 THEN 'tail'
                    WHEN avg_logprob <= b1 THEN 'middle'
                    ELSE 'head' END AS bucket
        FROM sc, bounds
      """)) { (spark, dir) =>
      LanguageModel.perplexityBuckets(Tables(spark, dir).documents, "doc_id", "text")
    },

    // --------------------------------------- composed quality gate (v2)
    // The CCNet-shaped keep/drop decision joining the round's three
    // signals: char entropy (gibberish floor), bigram-LM fluency, and
    // Gopher token repetition. Thresholds end in a 7th-decimal 5
    // (4.0000005, -3.4500005, 0.6000005) so they can NEVER equal a
    // round(·,6)-quantized score — comparisons are ulp-safe across
    // engines by construction.
    Q(
      "pipeline_quality_gate",
      Some("""
        WITH pos AS (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents),
        cnt AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch, COUNT(*) AS c FROM pos GROUP BY 1, 2),
        eagg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
                        list_reduce(list(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)) ORDER BY ch), (a, b) -> a + b) AS s
                 FROM cnt GROUP BY doc_id),
        ent AS (SELECT doc_id, ROUND(log2(CAST(n_chars AS DOUBLE)) - s / CAST(n_chars AS DOUBLE), 6) AS entropy_bits FROM eagg),
        t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        t2 AS (SELECT doc_id, toks, len(toks) AS len FROM t WHERE len(toks) >= 2),
        big0 AS (SELECT doc_id, unnest(list_transform(range(1, len), i -> {'pos': i, 'w1': toks[i], 'w2': toks[i + 1]})) AS u FROM t2),
        b AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM big0),
        uni AS (SELECT word, COUNT(*) AS c1 FROM (SELECT unnest(toks) AS word FROM t) GROUP BY 1),
        bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
        v AS (SELECT COUNT(*) AS vsz FROM uni),
        lp AS (SELECT b.doc_id, b.pos,
                      ln((CAST(COALESCE(c2, 0) AS DOUBLE) + 0.5) / (CAST(COALESCE(c1, 0) AS DOUBLE) + 0.5 * CAST(vsz AS DOUBLE))) AS logp
               FROM b LEFT JOIN bic USING (w1, w2) LEFT JOIN uni ON uni.word = b.w1 CROSS JOIN v),
        lm AS (SELECT doc_id, ROUND(list_reduce(list(logp ORDER BY pos), (a, b) -> a + b) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_logprob
               FROM lp GROUP BY doc_id),
        rep AS (SELECT doc_id, 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_token_frac
                FROM t WHERE len(toks) > 0)
        SELECT ent.doc_id, entropy_bits, avg_logprob, dup_token_frac,
               (entropy_bits > 4.0000005 AND avg_logprob > -3.4500005 AND dup_token_frac < 0.6000005) AS keep
        FROM ent JOIN lm ON lm.doc_id = ent.doc_id JOIN rep ON rep.doc_id = ent.doc_id
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      val ent  = Corpus.charEntropy(docs, "doc_id", "text").select(col("doc_id"), col("entropy_bits"))
      val lm   = LanguageModel.bigramScore(docs, docs, "doc_id", "text").select(col("doc_id"), col("avg_logprob"))
      val rep  = Corpus.repetitionSignals(docs, "doc_id", "text").select(col("doc_id"), col("dup_token_frac"))
      ent
        .join(lm, "doc_id")
        .join(rep, "doc_id")
        .select(
          col("doc_id"),
          col("entropy_bits"),
          col("avg_logprob"),
          col("dup_token_frac"),
          (col("entropy_bits") > 4.0000005 && col("avg_logprob") > -3.4500005 && col("dup_token_frac") < 0.6000005)
            .as("keep"))
    },

    // ---------------------------------------------- per-source quota cap
    // RefinedWeb-style domain balancing: keep at most 15 docs per source,
    // chosen by portable md5 rank (uniform reproducible sample, not
    // ingestion order). Engine side runs the bounded-heap TopKPerGroup
    // physical operator; the oracle replays the rank as a window.
    Q(
      "quota_per_source",
      Some("""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
          FROM documents)
        WHERE rn <= 15
      """)) { (spark, dir) =>
      Corpus.quotaPerSource(Tables(spark, dir).documents, "doc_id", "source", quota = 15)
    },

    // ---------------------------------------------- keyword extraction
    // Top-5 terms per document by tf with (global df asc, token asc)
    // tiebreaks — integer-deterministic ranking, no float tf·idf score to
    // drift across engines. Bounded-heap TopKPerGroup on the engine side.
    Q(
      "keywords_topk",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        r AS (SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                     row_number() OVER (PARTITION BY tf.doc_id
                                        ORDER BY tf.tf DESC, dfreq.df ASC, tf.token ASC) AS rn
              FROM tf JOIN dfreq ON dfreq.token = tf.token)
        SELECT doc_id, token, tf, df FROM r WHERE rn <= 5
      """)) { (spark, dir) =>
      Corpus.keywordsTopK(Tables(spark, dir).documents, "doc_id", "text", k = 5)
    },

    // ------------------------------------------- k-means corpus clustering
    // Distributed Lloyd's over the embeddings (SemDeDup-style cluster-then-
    // prune shape). Deterministic end to end (lowest-id seed, decimal-exact
    // centroid sums, tie-to-lower-index, tol = 0 so both engines run the
    // SAME fixed iteration count) — oracled by unrolling the 10 Lloyd
    // rounds as MATERIALIZED CTEs, the graph_pagerank discipline. The
    // output is pure INTEGER assignments, so the only cross-engine FP
    // freedom — the ≤2-ulp decimal→double centroid conversion — would
    // have to flip an argmin between two distances within ~1e-15 to show,
    // which the spec-pinned single-node equivalence additionally guards.
    Q("cluster_kmeans", Some(kmeansAssignOracle(k = 10, iters = 10))) { (spark, dir) =>
      val r = Similarity.kmeans(Tables(spark, dir).embeddings, k = 10, maxIter = 10, tol = 0.0)
      r.assignments.select(col("vec_id"), col("cluster"))
    },

    // Simplified-silhouette cluster-quality audit over the SAME k-means
    // (Similarity.kmeansSilhouette): per-cluster mean of
    // (b − a)/max(a, b) with a/b the own/nearest-other centroid distances
    // — O(n·k), the only silhouette that scales. The oracle composes the
    // proven unrolled-Lloyd prefix: distances reuse its (v−c)² fold, each
    // s snaps to the 1e-9 grid, means are exact decimal sums.
    Q(
      "cluster_silhouette",
      Some(s"""${kmeansCellsPrefix(10, 10)},
        dist AS (SELECT nv.vec_id, c.cluster,
                        list_reduce(list_transform(range(1, 65), i -> (nv.v[i] - c.cv[i]) * (nv.v[i] - c.cv[i])), (a, b) -> a + b) AS d2
                 FROM nv CROSS JOIN c10 c),
        ab AS (SELECT d.vec_id, MAX(af.cluster) AS own,
                      MAX(CASE WHEN d.cluster = af.cluster THEN d.d2 END) AS a2,
                      MIN(CASE WHEN d.cluster <> af.cluster THEN d.d2 END) AS b2
               FROM dist d JOIN af ON af.vec_id = d.vec_id GROUP BY d.vec_id),
        sil AS (SELECT own AS cluster,
                       CAST(round(CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0 THEN 0.0
                            ELSE (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)) END, 9) AS DECIMAL(12,9)) AS s9
                FROM ab)
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors,
               round(CAST(SUM(s9) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
        FROM sil GROUP BY cluster""")) { (spark, dir) =>
      Similarity.kmeansSilhouette(Tables(spark, dir).embeddings, k = 10, maxIter = 10, tol = 0.0)
    },

    // --------------------------------------------- semantic dedup (SemDeDup)
    // Cluster-then-prune: the exact cosine pair search confined to k-means
    // cells — every emitted pair is exact-verified, recall bounded by cell
    // co-location (pinned ≥0.9 on the planted near-dups in the spec).
    // Oracle: the same unrolled-Lloyd's cells (5 rounds, tol = 0), then
    // the proven dedup_embedding_cosine round6 cosine restricted to
    // same-cell pairs. Threshold matches dedup_embedding_cosine (this
    // corpus's cosines top out ~0.5).
    Q("dedup_semantic", Some(semanticDedupOracle(k = 10, iters = 5))) { (spark, dir) =>
      Similarity.semanticDupPairs(
        Tables(spark, dir).embeddings, threshold = 0.4, k = 10, maxIter = 5, tol = 0.0)
    },

    // --------------------------------------------------------- SimHash
    // 64-bit signatures + hamming<=8 pairs via 16-bit chunk banding.
    // Fully DuckDB-oracled since the token hash became the portable
    // roll_hash∘mix64 pair: the oracle replays the polynomial hash
    // (recursive B^j powers mod 2^64), the splitmix64 finalizer (wrapping
    // 64x64 multiplies done in INT128 via 32-bit-split mulmod — a direct
    // HUGEINT product overflows), the per-bit ±tf votes, the signature
    // bit-pack, and the same 4-chunk pigeonhole join + popcount filter the
    // operator plans. Candidates are banding-dependent by design (maxDist
    // 8 > the 4-chunk guarantee of 3), so the oracle replays the BANDING,
    // not just exact hamming — both surfaces emit identical pair sets.
    // ASCII-corpus assumption (same as dedup_winnow/corpus_dsir_weights):
    // ord() replays RollHash's UTF-8-byte polynomial only on ASCII text —
    // true for the generated testdata; a non-ASCII vintage flips the
    // oracle (fidelity issue), not the operator.
    // The maxBucketDF=1000 hot-bucket cap (degenerate-band guard, see
    // Dedup.simhashDupPairs) is replayed too, as the NOT EXISTS anti-join
    // on over-occupied (chunk_no, chunk) keys — inert on this corpus
    // (5000 docs over 4·2^16 buckets) but part of the planned contract.
    Q(
      "dedup_simhash",
      Some("""
        WITH occ AS (
          SELECT doc_id, tok, count(*) AS cnt
          FROM (SELECT doc_id,
                       unnest(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0)) AS tok
                FROM documents)
          GROUP BY doc_id, tok),
        dt AS (SELECT DISTINCT tok FROM occ),
        pows AS (
          WITH RECURSIVE p(j, v) AS (
            SELECT 0, 1::HUGEINT
            UNION ALL
            SELECT j + 1, (v * 1000003::HUGEINT) % 18446744073709551616::HUGEINT
            FROM p WHERE j < (SELECT max(length(tok)) FROM dt))
          SELECT * FROM p),
        chars AS (
          SELECT tok, length(tok) - i AS rev, ord(substr(tok, i, 1))::HUGEINT AS b
          FROM dt, LATERAL (SELECT unnest(range(1, length(tok) + 1)) AS i) u),
        roll AS (
          SELECT c.tok, CAST(sum(c.b * p.v) % 18446744073709551616::HUGEINT AS UBIGINT) AS r
          FROM chars c JOIN pows p ON p.j = c.rev GROUP BY c.tok),
        mix1a AS (SELECT tok, xor(r, r >> 30) AS a FROM roll),
        mix1  AS (SELECT tok, CAST((( (a & 4294967295)::HUGEINT * 13787848793156543929::HUGEINT
                     + (((a >> 32)::HUGEINT * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
                   ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z1 FROM mix1a),
        mix2a AS (SELECT tok, xor(z1, z1 >> 27) AS a FROM mix1),
        mix2  AS (SELECT tok, CAST((( (a & 4294967295)::HUGEINT * 10723151780598845931::HUGEINT
                     + (((a >> 32)::HUGEINT * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
                   ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z2 FROM mix2a),
        mixed AS (SELECT tok, xor(z2, z2 >> 31) AS h FROM mix2),
        votes AS (
          SELECT o.doc_id, j.j,
                 sum(CASE WHEN (m.h >> j.j) & 1 = 1 THEN o.cnt ELSE -o.cnt END) AS c
          FROM occ o JOIN mixed m ON m.tok = o.tok,
               LATERAL (SELECT unnest(range(0, 64)) AS j) j
          GROUP BY o.doc_id, j.j),
        sig AS (
          SELECT doc_id, CAST(coalesce(sum(CASE WHEN c > 0 THEN (1::UBIGINT << j)::HUGEINT END), 0) AS UBIGINT) AS usig
          FROM votes GROUP BY doc_id),
        sigs AS (
          SELECT doc_id, usig,
                 CAST(CASE WHEN usig >= 9223372036854775808::UBIGINT
                           THEN usig::HUGEINT - 18446744073709551616::HUGEINT
                           ELSE usig::HUGEINT END AS BIGINT) AS s
          FROM sig),
        chunks AS (
          SELECT doc_id, s, c.c AS chunk_no, CAST((usig >> (c.c * 16)) & 65535 AS INTEGER) AS chunk
          FROM sigs, LATERAL (SELECT unnest(range(0, 4)) AS c) c),
        hot AS (
          SELECT chunk_no, chunk FROM chunks GROUP BY 1, 2 HAVING count(*) > 1000),
        idx AS (
          SELECT c.* FROM chunks c WHERE NOT EXISTS
            (SELECT 1 FROM hot h WHERE h.chunk_no = c.chunk_no AND h.chunk = c.chunk)),
        cand AS (
          SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id, x.s AS sa, y.s AS sb
          FROM idx x JOIN idx y
            ON x.chunk_no = y.chunk_no AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
        SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS dist
        FROM cand WHERE bit_count(xor(sa, sb)) <= 8
      """)) { (spark, dir) =>
      Dedup.simhashDupPairs(
        Tables(spark, dir).documents, "doc_id", "text", maxDist = 8, maxBucketDF = 1000)
    },

    // Wide-key SimHash banding (Manku et al. 2007): 6 blocks × C(6,3)=20
    // triple-keyed tables with ~2^32 buckets each — the production regime
    // where all 4·2^16 chunk buckets legitimately flood. EXACT for d ≤ 3
    // (pigeonhole guarantees a triple-collision), so the oracle replays
    // signatures and brute-forces hamming ≤ 3 — a banding-INDEPENDENT
    // contract, stronger than the banding-dependent maxDist=8 row above.
    Q(
      "dedup_simhash_wide",
      Some("""
        WITH occ AS (
          SELECT doc_id, tok, count(*) AS cnt
          FROM (SELECT doc_id,
                       unnest(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0)) AS tok
                FROM documents)
          GROUP BY doc_id, tok),
        dt AS (SELECT DISTINCT tok FROM occ),
        pows AS (
          WITH RECURSIVE p(j, v) AS (
            SELECT 0, 1::HUGEINT
            UNION ALL
            SELECT j + 1, (v * 1000003::HUGEINT) % 18446744073709551616::HUGEINT
            FROM p WHERE j < (SELECT max(length(tok)) FROM dt))
          SELECT * FROM p),
        chars AS (
          SELECT tok, length(tok) - i AS rev, ord(substr(tok, i, 1))::HUGEINT AS b
          FROM dt, LATERAL (SELECT unnest(range(1, length(tok) + 1)) AS i) u),
        roll AS (
          SELECT c.tok, CAST(sum(c.b * p.v) % 18446744073709551616::HUGEINT AS UBIGINT) AS r
          FROM chars c JOIN pows p ON p.j = c.rev GROUP BY c.tok),
        mix1a AS (SELECT tok, xor(r, r >> 30) AS a FROM roll),
        mix1  AS (SELECT tok, CAST((( (a & 4294967295)::HUGEINT * 13787848793156543929::HUGEINT
                     + (((a >> 32)::HUGEINT * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
                   ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z1 FROM mix1a),
        mix2a AS (SELECT tok, xor(z1, z1 >> 27) AS a FROM mix1),
        mix2  AS (SELECT tok, CAST((( (a & 4294967295)::HUGEINT * 10723151780598845931::HUGEINT
                     + (((a >> 32)::HUGEINT * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
                   ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z2 FROM mix2a),
        mixed AS (SELECT tok, xor(z2, z2 >> 31) AS h FROM mix2),
        votes AS (
          SELECT o.doc_id, j.j,
                 sum(CASE WHEN (m.h >> j.j) & 1 = 1 THEN o.cnt ELSE -o.cnt END) AS c
          FROM occ o JOIN mixed m ON m.tok = o.tok,
               LATERAL (SELECT unnest(range(0, 64)) AS j) j
          GROUP BY o.doc_id, j.j),
        sig AS (
          SELECT doc_id, CAST(coalesce(sum(CASE WHEN c > 0 THEN (1::UBIGINT << j)::HUGEINT END), 0) AS UBIGINT) AS usig
          FROM votes GROUP BY doc_id),
        sigs AS (
          SELECT doc_id,
                 CAST(CASE WHEN usig >= 9223372036854775808::UBIGINT
                           THEN usig::HUGEINT - 18446744073709551616::HUGEINT
                           ELSE usig::HUGEINT END AS BIGINT) AS s
          FROM sig)
        SELECT x.doc_id AS a_id, y.doc_id AS b_id,
               CAST(bit_count(xor(x.s, y.s)) AS INTEGER) AS dist
        FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.s, y.s)) <= 3
      """)) { (spark, dir) =>
      Dedup.simhashDupPairsWide(Tables(spark, dir).documents, "doc_id", "text", maxDist = 3)
    },

    // ------------------------------------------------------- winnowing
    // MOSS-style positional fingerprints (custom rolling-hash expression).
    // Fully DuckDB-oracled: the rolling hash is a PORTABLE wrapping-64-bit
    // polynomial (base 1000003 over UTF-8 bytes == ASCII codepoints on this
    // corpus), so the oracle replays it positionally — each k-gram hash as
    // Σ ord·B^j in HUGEINT reduced mod 2^64 back to signed BIGINT (the
    // B^j constants are precomputed mod 2^64: B^7 doesn't fit 64 bits),
    // each w-window's rightmost minimum via (fp ASC, p DESC) row_number,
    // then the same DF-cap anti-join and shared-count join as the operator.
    // k=8, w=16, maxFpDF=100 mirror winnowDupPairs' defaults.
    Q(
      "dedup_winnow",
      Some("""
        WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents WHERE length(text) >= 8),
        pos AS (SELECT doc_id, text, len - 7 AS m, unnest(range(0, len - 7)) AS p FROM d),
        hraw AS (SELECT doc_id, m, p,
                   (  ord(substr(text, p+1, 1))::HUGEINT * 12924618581234127435::HUGEINT
                    + ord(substr(text, p+2, 1))::HUGEINT * 10923514805226455897::HUGEINT
                    + ord(substr(text, p+3, 1))::HUGEINT * 14453212906556403763::HUGEINT
                    + ord(substr(text, p+4, 1))::HUGEINT * 14003818205314896721::HUGEINT
                    + ord(substr(text, p+5, 1))::HUGEINT * 1000009000027000027::HUGEINT
                    + ord(substr(text, p+6, 1))::HUGEINT * 1000006000009::HUGEINT
                    + ord(substr(text, p+7, 1))::HUGEINT * 1000003::HUGEINT
                    + ord(substr(text, p+8, 1))::HUGEINT
                   ) % 18446744073709551616::HUGEINT AS r
                 FROM pos),
        h AS (SELECT doc_id, m, p,
                CAST(CASE WHEN r >= 9223372036854775808::HUGEINT
                          THEN r - 18446744073709551616::HUGEINT ELSE r END AS BIGINT) AS fp
              FROM hraw),
        wins AS (SELECT doc_id, m, unnest(range(0, greatest(m - 16, 0) + 1)) AS win
                 FROM (SELECT DISTINCT doc_id, m FROM h)),
        cand AS (SELECT w.doc_id, w.win, h.fp,
                        ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.win
                                           ORDER BY h.fp ASC, h.p DESC) AS rn
                 FROM wins w JOIN h ON h.doc_id = w.doc_id
                                   AND h.p >= w.win AND h.p < least(w.win + 16, w.m)),
        fps AS (SELECT DISTINCT doc_id, fp FROM cand WHERE rn = 1),
        idx AS (SELECT * FROM fps WHERE fp NOT IN
                  (SELECT fp FROM fps GROUP BY fp HAVING count(*) > 100))
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared_fps
        FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 10
      """)) { (spark, dir) =>
      Dedup.winnowDupPairs(Tables(spark, dir).documents, "doc_id", "text", minShared = 10)
    },

    // ---------------------------------------- embedding cosine near-dup
    Q(
      "dedup_embedding_cosine",
      Some("""
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
      """)) { (spark, dir) =>
      Similarity.cosineDupPairs(Tables(spark, dir).embeddings, threshold = 0.4)
    },

    // --------------------------------- embedding dedup, incremental batch
    // New vectors (odd ids) deduped against a stored index (even ids) —
    // new×all pairs, never old×old (the ingestion shape, mirroring
    // dedup_incremental). Oracle: the full exact pair set restricted to
    // pairs touching a new vector.
    Q(
      "dedup_embedding_incr",
      Some("""
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
          AND (a.vec_id % 2 = 1 OR b.vec_id % 2 = 1)
      """)) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.cosineDupPairsIncremental(
        emb.filter(col("vec_id") % 2 === 1),
        emb.filter(col("vec_id") % 2 === 0),
        threshold = 0.4)
    },

    // ------------------------------------------------ ANN: exact top-k
    Q("ann_brute_topk", Some(bruteOracle(k = 10, nQueries = 8))) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 8), k = 10)
    },

    // ------------------------------------------- ANN: binary quantization
    // Sign-bit packing (1 bit/dim, 32x smaller than float32) + hamming
    // candidate generation + exact-cosine rerank — the zero-training first
    // ANN tier (nothing fitted, nothing to drift). Fully deterministic,
    // so the oracle replays the SAME candidate cut and the row set
    // hash-matches; emitted sims are TRUE cosines (approximation lives
    // only in candidate survival — SimilaritySpec pins recall vs brute).
    Q("ann_binary_quant", Some(bqOracle(dim = 64, k = 10, nQueries = 8, candidates = 150))) {
      (spark, dir) =>
        val emb = Tables(spark, dir).embeddings
        Similarity.bqTopK(emb, emb.filter(col("vec_id") < 8), dim = 64, k = 10, candidates = 150)
    },

    // ------------------------------------------------ ANN: LSH bucketed
    // Approximate versus brute force (recall < 1, spec pins >= 0.9 at
    // these ProfileAnn-tuned settings) but fully DETERMINISTIC — the
    // derandomized splitmix64 plane signs replay in SQL, so the oracle
    // recomputes the SAME approximate answer and the row set
    // hash-matches. Multi-probe radius 2 buys the recall of many extra
    // tables while the corpus index stays 1 bucket/table/vector.
    Q(
      "ann_lsh_topk",
      Some(lshOracle(bits = 8, tables = 12, radius = 2, k = 10, nQueries = 8))) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 10, bits = 8, tables = 12, probeHamming = 2)
    },

    // ------------------------------------------------- kNN classification
    // Majority label of the 10 exact nearest neighbors, smallest-label tie
    // break — retrieve-then-vote over the labeled embedding corpus.
    Q(
      "knn_label_vote",
      Some("""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 32),
        c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv, label FROM embeddings),
        s AS (SELECT query_id, vec_id, label, list_cosine_similarity(qv, cv) AS sim
              FROM q JOIN c ON query_id <> vec_id),
        r AS (SELECT query_id, label,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round(sim, 9) DESC, vec_id) AS rn
              FROM s),
        v AS (SELECT query_id, label, COUNT(*) AS votes FROM r WHERE rn <= 10 GROUP BY 1, 2),
        p AS (SELECT query_id, label, votes,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rk
              FROM v)
        SELECT query_id, label AS pred_label, votes FROM p WHERE rk = 1
      """)) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.knnClassify(emb, emb.filter(col("vec_id") < 32), k = 10)
    },

    // ------------------------------------------- hard-negative mining
    // Contrastive-training data: for each query vector, the 10 most-similar
    // corpus vectors with a DIFFERENT label, capped below the near-dup
    // band (caller passes the plain 0.4; the operator applies the
    // 7th-decimal FP guard internally, so the effective cut is 0.4000005 —
    // what the oracle replays) so likely-mislabeled positives are
    // excluded. Same broadcast+bounded-heap shape as ann_brute_topk.
    Q(
      "ann_hard_negatives",
      Some("""
        WITH q AS (SELECT vec_id AS query_id, label AS q_label, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 16),
        c AS (SELECT vec_id AS neighbor_id, label AS neg_label, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        s AS (SELECT query_id, neighbor_id, neg_label, list_cosine_similarity(qv, cv) AS sim
              FROM q JOIN c ON query_id <> neighbor_id AND q_label <> neg_label),
        r AS (SELECT query_id, neighbor_id, neg_label, round(sim, 6) AS sim,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round(sim, 9) DESC, neighbor_id) AS rn
              FROM s WHERE round(sim, 6) < 0.4000005)
        SELECT query_id, neighbor_id, neg_label, sim, rn FROM r WHERE rn <= 10
      """)) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 16), k = 10, maxSim = 0.4)
    },

    // --------------------------------------------- ANN: IVF (k-means cells)
    // Approximate versus brute force (spec pins recall >= 0.9 at these
    // ProfileAnn-tuned settings; cells are COSINE cells — the quantizer
    // runs on unit vectors) but DETERMINISTIC since the sampled trainer's
    // draw order became mix64(vec_id): the oracle replays the sample cut,
    // every driver-side double add of Lloyd's in sample order, and the
    // same serve chain — so even the sampled-trainer variant hash-matches.
    Q(
      "ann_ivf_topk",
      Some(ivfSampledOracle(nlist = 16, sampleN = 4096, iters = 10, assign = 3, nprobe = 8, k = 10))) {
      (spark, dir) =>
        val emb = Tables(spark, dir).embeddings
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), k = 10, nlist = 16, nprobe = 8, assign = 3)
    },

    // ---------------------------- ANN: IVF over the DETERMINISTIC quantizer
    // Same assign->serve pipeline, but the coarse quantizer is the
    // decimal-exact distributed k-means instead of the sampled driver
    // trainer — the reproducible-index-build variant (an audit can replay
    // the EXACT index any engine built; at 100 TB trainer cost is per
    // index build, amortized over every query batch served from it). That
    // determinism buys a full DuckDB oracle: kmeansCellsPrefix replays the
    // model, rank<=assign replays multi-assignment, rank<=nprobe the query
    // probes, and the proven round-6/round-9 cosine ranks the candidates.
    Q("ann_ivf_kmeans", Some(ivfKmeansOracle(nlist = 16, iters = 5, assign = 3, nprobe = 8, k = 10))) {
      (spark, dir) =>
        val emb   = Tables(spark, dir).embeddings
        val model = Similarity.kmeans(emb, k = 16, maxIter = 5, tol = 0.0).centroids
        Similarity.ivfSearch(
          Similarity.ivfAssign(emb, model, assign = 3),
          emb.filter(col("vec_id") < 8),
          model,
          k = 10,
          nprobe = 8)
    },

    // --------------------- ANN: the PERSISTED index, partition-pruned
    // ann_ivf_kmeans' storage twin — same deterministic trainer, same
    // search math, same oracle — but the index lives in the catalog:
    // assignments hive-partitioned BY CELL, centroids as a model table,
    // queries served by a PARTITION-PRUNED scan of only the probed cells
    // (AnnIndexSpec pins PartitionFilters + the pruned file set). The
    // hash-identity with the in-memory row is the claim that persisting
    // and reloading the index changes NOTHING but the I/O shape.
    Q(
      "ann_ivf_persisted",
      Some(ivfKmeansOracle(nlist = 16, iters = 5, assign = 3, nprobe = 8, k = 10))) { (spark, dir) =>
      val emb  = Tables(spark, dir).embeddings
      val root = java.nio.file.Files.createTempDirectory("graft-ann-idx").toString
      val cat  = new graft.sources.Catalog(spark, root)
      graft.operators.AnnIndex.build(cat, "emb_ivf", emb, nlist = 16, iters = 5, assign = 3)
      graft.operators.AnnIndex.search(cat, "emb_ivf", emb.filter(col("vec_id") < 8), k = 10, nprobe = 8)
    },

    // ------------------ ANN: incremental index (frozen-model append)
    // The maintenance half of the persisted index: build on the even-id
    // half (the model trains on THAT slice only), append the odd-id half
    // as a new generation assigned with the FROZEN centroids, serve across
    // both generations. The oracle replays exactly this lifecycle — train
    // on the subset, assign everything — so a retrain-on-append, a lost
    // generation, or a multiplicity mismatch all hash-mismatch. Probes
    // stay partition-pruned per generation (AnnIndexSpec).
    Q(
      "ann_ivf_appended",
      Some(ivfKmeansSubsetOracle(
        nlist = 16, iters = 5, assign = 3, nprobe = 8, k = 10,
        trainWhere = "WHERE vec_id % 2 = 0"))) { (spark, dir) =>
      val emb  = Tables(spark, dir).embeddings
      val root = java.nio.file.Files.createTempDirectory("graft-ann-inc").toString
      val cat  = new graft.sources.Catalog(spark, root)
      graft.operators.AnnIndex
        .build(cat, "emb_inc", emb.filter(col("vec_id") % 2 === 0), nlist = 16, iters = 5, assign = 3)
      graft.operators.AnnIndex.append(cat, "emb_inc", emb.filter(col("vec_id") % 2 === 1))
      graft.operators.AnnIndex.search(cat, "emb_inc", emb.filter(col("vec_id") < 8), k = 10, nprobe = 8)
    },

    // --------------------------- ANN: tombstoned deletes (index hygiene)
    // The deletion half of the index lifecycle: after a corpus deleteWhere
    // the index must NOT keep serving the removed vectors. deleteVectors
    // tombstones them (<name>.__anntomb__); every read path anti-joins the
    // tombstone set AFTER partition pruning, so probe I/O is unchanged and
    // the model/cell geometry stays frozen — which is exactly what the
    // oracle replays: full-corpus training, candidate set minus the
    // deleted ids. A lost tombstone, an eager re-train, or an anti-join
    // on the wrong side would all hash-mismatch.
    Q(
      "ann_ivf_deleted",
      Some(ivfKmeansSubsetOracle(
        nlist = 16, iters = 5, assign = 3, nprobe = 8, k = 10,
        deletedWhere = "vec_id % 7 = 3"))) { (spark, dir) =>
      val emb  = Tables(spark, dir).embeddings
      val root = java.nio.file.Files.createTempDirectory("graft-ann-del").toString
      val cat  = new graft.sources.Catalog(spark, root)
      graft.operators.AnnIndex.build(cat, "emb_del", emb, nlist = 16, iters = 5, assign = 3)
      graft.operators.AnnIndex
        .deleteVectors(cat, "emb_del", emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
      graft.operators.AnnIndex.search(cat, "emb_del", emb.filter(col("vec_id") < 8), k = 10, nprobe = 8)
    },

    // ------------------------------ ANN: metadata-FILTERED search
    // The "top-k among rows matching a predicate" query every production
    // vector store serves — and the pre/post-filtering trap: filtering
    // AFTER the top-k cut silently under-returns for selective
    // predicates. searchFiltered semi-joins the allowlist into the
    // candidate set BEFORE ranking (and AFTER partition pruning, so probe
    // I/O is unchanged); the oracle restricts its candidate set with the
    // same predicate, so a post-filter implementation (missing neighbors)
    // or a pre-prune one (changed probes) would both hash-mismatch.
    Q(
      "ann_ivf_filtered",
      Some(ivfKmeansSubsetOracle(
        nlist = 16, iters = 5, assign = 3, nprobe = 8, k = 10,
        deletedWhere = "vec_id % 5 = 2"))) { (spark, dir) =>
      val emb  = Tables(spark, dir).embeddings
      val root = java.nio.file.Files.createTempDirectory("graft-ann-filt").toString
      val cat  = new graft.sources.Catalog(spark, root)
      graft.operators.AnnIndex.build(cat, "emb_f", emb, nlist = 16, iters = 5, assign = 3)
      graft.operators.AnnIndex.searchFiltered(
        cat, "emb_f", emb.filter(col("vec_id") < 8), k = 10, nprobe = 8,
        allowed = Some(emb.filter(col("vec_id") % 5 =!= 2).select(col("vec_id"))))
    },

    // ------------- ANN ⨯ storage lifecycle: the full composed maintenance
    // Every maintenance verb the index and its base table support, in one
    // row: build on the even half (train freezes there), append the odd
    // half as a generation, tombstone a slice, then COMPACT the corpus
    // table underneath (compactSmallFiles rewrites the base table's files
    // — the index serves from its own cell-partitioned copies, so file
    // churn in the corpus must change nothing). The oracle replays
    // subset-train + frozen-model assignment + tombstone exclusion; the
    // compaction's invisibility IS the assertion.
    Q(
      "ann_lifecycle_e2e",
      Some(ivfKmeansSubsetOracle(
        nlist = 16, iters = 5, assign = 3, nprobe = 8, k = 10,
        trainWhere = "WHERE vec_id % 2 = 0",
        deletedWhere = "vec_id % 7 = 3"))) { (spark, dir) =>
      val emb  = Tables(spark, dir).embeddings
      val root = java.nio.file.Files.createTempDirectory("graft-ann-e2e").toString
      val cat  = new graft.sources.Catalog(spark, root)
      // base table lives in the catalog, deliberately fragmented so the
      // compaction below has real work to do
      cat.putTable("corpus_e", emb.repartition(16))
      val base = cat.readTable("corpus_e")
      graft.operators.AnnIndex
        .build(cat, "emb_e2e", base.filter(col("vec_id") % 2 === 0), nlist = 16, iters = 5, assign = 3)
      graft.operators.AnnIndex.append(cat, "emb_e2e", base.filter(col("vec_id") % 2 === 1))
      graft.operators.AnnIndex
        .deleteVectors(cat, "emb_e2e", base.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
      cat.compactSmallFiles("corpus_e", smallBytes = 64L << 20, targetBytes = 64L << 20)
      graft.operators.AnnIndex
        .search(cat, "emb_e2e", emb.filter(col("vec_id") < 8), k = 10, nprobe = 8)
    },

    // ----------------- ANN: GENERATION compaction (index-side OPTIMIZE)
    // After many frozen-model appends the index is base + N generation
    // directory trees, and every probe pays a listing per generation;
    // compactGenerations folds them into one cell-partitioned base
    // WITHOUT retraining (same frozen geometry — cells don't move) and
    // drops the generation tables. The oracle is the SAME subset-train +
    // tombstone replay as the uncompacted lifecycle: compaction's
    // invisibility to search results IS the assertion, now for the
    // index's own files rather than the corpus table's. Two appends make
    // the fold non-trivial; the tombstone proves deletes survive it.
    Q(
      "ann_gen_compact",
      Some(ivfKmeansSubsetOracle(
        nlist = 16, iters = 5, assign = 3, nprobe = 8, k = 10,
        trainWhere = "WHERE vec_id % 2 = 0",
        deletedWhere = "vec_id % 7 = 3"))) { (spark, dir) =>
      val emb  = Tables(spark, dir).embeddings
      val root = java.nio.file.Files.createTempDirectory("graft-ann-gc").toString
      val cat  = new graft.sources.Catalog(spark, root)
      graft.operators.AnnIndex
        .build(cat, "emb_gc", emb.filter(col("vec_id") % 2 === 0), nlist = 16, iters = 5, assign = 3)
      graft.operators.AnnIndex.append(cat, "emb_gc", emb.filter(col("vec_id") % 4 === 1))
      graft.operators.AnnIndex.append(cat, "emb_gc", emb.filter(col("vec_id") % 4 === 3))
      graft.operators.AnnIndex
        .deleteVectors(cat, "emb_gc", emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
      val folded = graft.operators.AnnIndex.compactGenerations(cat, "emb_gc")
      require(folded == 2, s"expected to fold 2 generations, folded $folded")
      graft.operators.AnnIndex
        .search(cat, "emb_gc", emb.filter(col("vec_id") < 8), k = 10, nprobe = 8)
    },

    // ------------------- ANN: int8 IVF over the DETERMINISTIC quantizer
    // ann_ivf_kmeans' int8 sibling: same decimal-exact k-means model, but
    // served from the quantized resident index (d+16 bytes/vector) with
    // the integer-dot shortlist and exact rerank. Hash-checked end to end
    // — quantization, int8 scoring and rerank all replay in SQL.
    Q(
      "ann_ivf_int8_kmeans",
      Some(ivfQ8KmeansOracle(nlist = 16, iters = 5, assign = 3, nprobe = 8, k = 10, rerank = 4))) {
      (spark, dir) =>
        val emb   = Tables(spark, dir).embeddings
        val model = Similarity.kmeans(emb, k = 16, maxIter = 5, tol = 0.0).centroids
        Similarity.ivfServeQ8(
          model,
          emb,
          emb.filter(col("vec_id") < 8),
          k = 10,
          nprobe = 8,
          assign = 3,
          rerank = 4)
    },

    // ------------------------------------- ANN: int8-quantized IVF + rerank
    // The memory/IO variant: the resident index is (id, cell, scale, int8
    // bytes) — d+16 bytes/vector instead of 8d — scored with a codegen'd
    // integer dot, exact-reranked on a rerank*k shortlist. Deterministic
    // like ann_ivf_topk (mix64 sample order), so the sampled trainer +
    // quantized serve replay fully in the oracle; spec still pins
    // recall >= 0.9 and the quantization error bound.
    Q(
      "ann_ivf_int8",
      Some(
        ivfQ8SampledOracle(nlist = 16, sampleN = 4096, iters = 10, assign = 3, nprobe = 8, k = 10, rerank = 4))) {
      (spark, dir) =>
        val emb = Tables(spark, dir).embeddings
        Similarity.ivfTopKQ8(emb, emb.filter(col("vec_id") < 8), k = 10, nlist = 16, nprobe = 8, assign = 3, rerank = 4)
    },

    // ------------------------------------------ ANN: product quantization
    // The 64×-compression index: 8 subspace codebooks (k=16 each) trained
    // by the decimal-exact RAW-coordinate k-means (normalize=false —
    // quantizing a normalized slice would distort every distance the code
    // stands in for), each vector reduced to 8 4-bit codes. The code
    // table IS the query output — training AND encoding replay in SQL
    // (8 unrolled sub-space Lloyd's chains), so the model is verified,
    // not just its row count.
    Q(
      "ann_pq_codes",
      Some(s"${pqPrefix(m = 8, dsub = 8, k = 16, iters = 3)}\nSELECT vec_id, sub, code FROM codes")) {
      (spark, dir) =>
        val emb = Tables(spark, dir).embeddings
        val model = Similarity.pqTrain(emb, m = 8, k = 16, iters = 3)
        Similarity.pqCodes(emb, model)
    },

    // ----------------------------------------------- ANN: PQ ADC search
    // Asymmetric-distance top-k over the compact code table: per-query
    // 8×16 LUT of exact subspace distances (broadcast), codes scored by a
    // FIXED sub-order fold, rerank·k shortlist (rerank=10: random isotropic vectors are
    // PQ's quantization-error worst case, so the shortlist carries the
    // recall — spec-pinned ≥ 0.8 vs brute L2), exact full-dim rerank
    // — only shortlist rows ever touch full-precision vectors again. The
    // whole pipeline (training → codes → LUT → fold → rerank) hash-checks
    // end to end; SimilaritySpec additionally pins recall ≥ 0.9 vs brute.
    Q(
      "ann_pq_adc",
      Some(s"""${pqPrefix(m = 8, dsub = 8, k = 16, iters = 3)},
        ${pqAdcTail(m = 8, dsub = 8, iters = 3, nQ = 8, k = 10, rerank = 10)}""")) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      val model = Similarity.pqTrain(emb, m = 8, k = 16, iters = 3)
      Similarity.pqSearch(emb, emb.filter(col("vec_id") < 8), model, k = 10, rerank = 10)
    },

    // ------------------------------------------------- ANN: IVF-PQ
    // The canonical billion-vector composition (Jégou §IV): coarse
    // spherical k-means cells + product quantization of the RESIDUALS
    // u − c(cell) — residuals center near 0, so 4-bit codes quantize them
    // far tighter than raw coordinates. Serve: nprobe cell probes,
    // per-(query, cell) residual LUTs, fixed-order ADC fold, exact cosine
    // rerank. The ENTIRE composition — coarse training, residuals, PQ
    // training on them, codes, probes, LUTs, shortlist, rerank — replays
    // in SQL and hash-matches.
    Q(
      "ann_ivfpq",
      Some(ivfPqOracle(
        nlist = 16, coarseIters = 5, m = 8, dsub = 8, pqK = 16, pqIters = 3,
        nQ = 8, nprobe = 8, k = 10, rerank = 10))) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.ivfPq(
        emb, emb.filter(col("vec_id") < 8),
        nlist = 16, coarseIters = 5, m = 8, pqK = 16, pqIters = 3,
        nprobe = 8, k = 10, rerank = 10)
    },

    // --------------------------------------- ANN recall, driver-auditable
    // The recall numbers the three approximate rows above are trusted for,
    // surfaced AS a gate artifact: per-method overlap against bruteTopK at
    // exactly the gate settings. Every method is deterministic (mix64
    // sample order, derandomized LSH planes), so the audit itself carries
    // a full oracle — each method's replay runs as a scoped subquery and
    // the overlap counts hash-match. SimilaritySpec still pins
    // recall >= 0.9 per method and audit ≡ independent overlap.
    Q(
      "ann_recall_audit",
      Some(recallAuditOracle(
        k = 10, nQueries = 8, nlist = 16, sampleN = 4096, iters = 10,
        assign = 3, nprobe = 8, rerank = 4, bits = 8, tables = 12, radius = 2))) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.recallAudit(
        emb, emb.filter(col("vec_id") < 8), k = 10,
        nlist = 16, nprobe = 8, assign = 3, rerank = 4,
        bits = 8, tables = 12, probeHamming = 2)
    },

    // ------------------------------------------- ANN auto-probe (closed loop)
    // The ACTION on the recall audit — the audit→action discipline the skew
    // family set (measure, then let the measurement pick the plan): walk
    // nprobe up the 1,2,4,…,nlist doubling ladder and stop at the first
    // rung whose IVF recall-vs-brute meets the 0.9 target. Emits the walk
    // trace (one audit row per probed rung, `chosen` on the stopper); the
    // oracle recomputes every rung's recall in SQL and applies the same
    // early-stop rule, so even the DATA-DEPENDENT walk length hashes. At
    // 100 TB this turns "what nprobe do I deploy?" from a human guess into
    // a measured, replayable decision on a query sample.
    Q(
      "ann_auto_probe",
      Some(autoProbeOracle(
        k = 10, nQueries = 8, nlist = 16, sampleN = 4096, iters = 10,
        assign = 3, target = 0.9))) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.autoProbe(
        emb, emb.filter(col("vec_id") < 8), k = 10, recallTarget = 0.9,
        nlist = 16, assign = 3)._2
    },

    // ------------------------------------- LSH auto-probe (closed loop)
    // The same audit->action walk over LSH's cost dial — the multi-probe
    // Hamming radius. Unlike IVF there is no probe-everything rung, so an
    // unreachable target honestly ends UNCHOSEN ("re-index with more
    // tables/bits") instead of silently serving best-effort. The oracle
    // recomputes every rung's recall and replays the stop rule, covering
    // both the early-stop and the exhausted-ladder shape.
    Q(
      "ann_auto_probe_lsh",
      Some(autoProbeLshOracle(
        k = 10, nQueries = 8, bits = 8, tables = 12, maxRadius = 2, target = 0.9))) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.autoProbeLsh(
        emb, emb.filter(col("vec_id") < 8), k = 10, recallTarget = 0.9,
        bits = 8, tables = 12, maxRadius = 2)._2
    },

    // ----------------------------------------------- DBSCAN clustering
    // Density clustering composed from verified primitives: ε-graph =
    // the exact round-6 cosine pair set at 0.4, cores have ≥ 3
    // neighbors, clusters = CC of the core-core subgraph (recursive
    // reach replay), borders attach to the SMALLEST core-neighbor label
    // (determinizing DBSCAN's order-dependent border rule), rest noise.
    Q(
      "cluster_dbscan",
      Some("""
        WITH RECURSIVE p AS MATERIALIZED (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.4),
        u AS (SELECT a_id AS id, b_id AS nb FROM p UNION ALL SELECT b_id, a_id FROM p),
        deg AS (SELECT id, COUNT(*) AS nn FROM u GROUP BY 1),
        core AS (SELECT id FROM deg WHERE nn >= 3),
        ce AS (SELECT p.a_id, p.b_id FROM p JOIN core ca ON ca.id = p.a_id JOIN core cb ON cb.id = p.b_id),
        e AS (SELECT a_id AS src, b_id AS dst FROM ce UNION SELECT b_id, a_id FROM ce),
        reach(id, lab) AS (
          SELECT src, src FROM e
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id),
        cc AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
        corelab AS (SELECT core.id, COALESCE(cc.cluster_id, core.id) AS cluster_id
                    FROM core LEFT JOIN cc ON cc.id = core.id),
        border AS (SELECT u.id, MIN(cl.cluster_id) AS cluster_id
                   FROM u JOIN corelab cl ON cl.id = u.nb
                   WHERE u.id NOT IN (SELECT id FROM core) GROUP BY u.id)
        SELECT v.vec_id,
               CASE WHEN cl.cluster_id IS NOT NULL THEN 'core'
                    WHEN b.cluster_id IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               COALESCE(cl.cluster_id, b.cluster_id) AS cluster_id
        FROM embeddings v
        LEFT JOIN corelab cl ON cl.id = v.vec_id
        LEFT JOIN border b ON b.id = v.vec_id
      """)) { (spark, dir) =>
      Similarity.dbscan(Tables(spark, dir).embeddings, simThreshold = 0.4, minPts = 3)
    },

    // --------------------------------------- Matryoshka truncation audit
    // Recall@10 of prefix-dim cosine (d = 8/16/32) against the full
    // 64-dim truth (Kusupati et al. 2022) — the measurement behind
    // serving truncated embeddings. Same exact cosine + (round-9, id)
    // ranking as the brute oracle; overlaps are exact integers.
    Q(
      "ann_matryoshka_recall",
      Some(matryoshkaOracle(k = 10, nQueries = 8, dims = Seq(8, 16, 32)))) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.matryoshkaRecall(
        emb, emb.filter(col("vec_id") < 8), k = 10, dims = Seq(8, 16, 32))
    },

    // --------------------------------------------- IR ranking metrics
    // Retrieval eval over the exact top-10, graded by embedding labels
    // (relevant ⇔ same label): hits@10, MRR, binary-gain NDCG@10 with the
    // ln-discount (base cancels in the ratio), per query. DCG and the
    // ideal both fold in FIXED rank order; ln ulp freedom sits under
    // round(·, 6). The index-quality artifact next to ann_recall_audit:
    // recall says "found the true neighbors", this says "the neighbors
    // are the right CLASS, early".
    Q(
      "ann_ranking_metrics",
      Some(s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
              FROM q JOIN c ON query_id <> neighbor_id),
        r AS (SELECT query_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round(sim, 9) DESC, neighbor_id) AS rn
              FROM s),
        lc AS (SELECT label, COUNT(*) AS cnt FROM embeddings GROUP BY label),
        ql AS (SELECT e.vec_id AS query_id, e.label AS qlabel, lc.cnt - 1 AS n_relevant
               FROM embeddings e JOIN lc ON lc.label = e.label WHERE e.vec_id < 8),
        g AS (SELECT r.query_id, ql.n_relevant, r.rn,
                     CASE WHEN ne.label = ql.qlabel THEN 1 ELSE 0 END AS rel
              FROM r JOIN embeddings ne ON ne.vec_id = r.neighbor_id
                     JOIN ql ON ql.query_id = r.query_id
              WHERE r.rn <= 10),
        pq AS (SELECT query_id, n_relevant,
                      CAST(SUM(rel) AS BIGINT) AS hits_at_k,
                      MIN(CASE WHEN rel = 1 THEN rn END) AS first_rel,
                      list_reduce(list(CAST(rel AS DOUBLE) / ln(CAST(rn AS DOUBLE) + 1.0) ORDER BY rn),
                                  (a, b) -> a + b) AS dcg
               FROM g GROUP BY query_id, n_relevant)
        SELECT query_id, CAST(n_relevant AS BIGINT) AS n_relevant, hits_at_k,
               CASE WHEN first_rel IS NOT NULL THEN round(1.0 / CAST(first_rel AS DOUBLE), 6) ELSE 0.0 END AS rr,
               CASE WHEN n_relevant > 0
                    THEN round(dcg / list_reduce(
                           list_transform(range(1, least(n_relevant, 10) + 1),
                             i -> 1.0 / ln(CAST(i AS DOUBLE) + 1.0)),
                           (a, b) -> a + b), 6)
                    ELSE 0.0 END AS ndcg
        FROM pq""")) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      Similarity.rankingMetrics(emb, emb.filter(col("vec_id") < 8), k = 10)
    },

    // ------------------------------------ JL random projection (64 → 16)
    // Deterministic ±1 sign-matrix projection (Achlioptas) as a zero-
    // shuffle narrow map — the shrink-before-index step for ANN at scale.
    // Gate shape: posexplode to scalar (vec_id, pos, value) rows (array
    // columns are unhashable in the harness dump) with round(·, 6). The
    // oracle regenerates the SAME sign matrix from the seed as SQL
    // literals (Similarity.projectionSigns) and replays the projection's
    // exact left-fold add order, so the hash compare is value-for-value;
    // SimilaritySpec additionally pins determinism, expectation-preserved
    // norms, and loud dimension-mismatch failure on the array-valued API.
    Q("embed_project", Some(embedProjectOracle)) { (spark, dir) =>
      Similarity
        .randomProject(Tables(spark, dir).embeddings, "vec_id", "embedding", inDim = 64, outDim = 16)
        .select(col("vec_id"), posexplode(col("projected")).as(Seq("pos", "value")))
        .select(col("vec_id"), col("pos"), round(col("value"), 6).as("value"))
    },

    // ------------------------------------------------------- PCA (power it.)
    // Top principal component over the decimal-exact covariance (the
    // kmeans determinism discipline applied to PCA): inputs on the 1e-9
    // grid, Σ cᵢc_j exact decimal (order-free), d² model collected, and
    // each of the 8 power iterations re-grids raw/norm/v so the oracle
    // unrolls them as CTEs and the LOADINGS THEMSELVES hash-match.
    Q(
      "embed_pca_component",
      Some(s"${pcaPrefix(8)}\nSELECT CAST(j - 1 AS INTEGER) AS dim, v AS loading FROM v8")) { (spark, dir) =>
      Similarity.pcaTopComponent(Tables(spark, dir).embeddings, "vec_id", "embedding", iters = 8)
    },

    // Per-vector projection onto that component: a zero-shuffle serving
    // pass with the model as plan literals; score = exact-decimal
    // Σ grid(c_j·v_j) — the dimensionality-reduction feature downstream
    // clustering consumes, oracled end to end THROUGH the training.
    Q(
      "embed_pca_project",
      Some(s"""${pcaPrefix(8)},
        va AS (SELECT list(v ORDER BY j) AS varr FROM v8)
        SELECT cx.vec_id,
               CAST(ROUND(list_reduce(
                      list_transform(range(1, 65),
                        j -> CAST(cx.c[j] AS DECIMAL(13,9)) * CAST(va.varr[j] AS DECIMAL(13,9))),
                      (a, b) -> a + b), 9) AS DOUBLE) AS score
        FROM cx, va""")) { (spark, dir) =>
      Similarity.pcaProject(Tables(spark, dir).embeddings, "vec_id", "embedding", iters = 8)
    },

    // Multi-component PCA (power iteration + Hotelling deflation): the
    // top-2 loadings, both hash-matched — component 1 comes from 8 more
    // unrolled iterations over the EXACT-decimal deflated matrix
    // C − grid(λ1·v1)·v1ᵀ, closing the single-component limitation the
    // round-10 advice recorded. Data cost identical to embed_pca_component
    // (same two covariance scans); deflation is driver-side over the d²
    // model.
    Q(
      "embed_pca_multi",
      Some(s"""${pcaMultiPrefix(8)}
        SELECT 0 AS component, CAST(j - 1 AS INTEGER) AS dim, v AS loading FROM v8
        UNION ALL
        SELECT 1 AS component, CAST(j - 1 AS INTEGER) AS dim, v AS loading FROM b8""")) { (spark, dir) =>
      Similarity.pcaComponents(Tables(spark, dir).embeddings, "vec_id", "embedding", iters = 8, nComponents = 2)
    },

    // The spectrum read-out for the same model: Rayleigh eigenvalues
    // λ_c = v_cᵀ C_c v_c (grid-exact two-stage contraction) and
    // explained-variance ratios against the exact-decimal trace — the
    // how-many-output-dims curve an embedding pipeline reads before fixing
    // its projection width.
    Q(
      "embed_pca_variance",
      Some(s"""${pcaMultiPrefix(8)}
        SELECT 0 AS component, lam1.lam AS eigenvalue,
               ROUND(lam1.lam / tr.trace, 9) AS explained_ratio FROM lam1, tr
        UNION ALL
        SELECT 1 AS component, lam2.lam AS eigenvalue,
               ROUND(lam2.lam / tr.trace, 9) AS explained_ratio FROM lam2, tr""")) { (spark, dir) =>
      Similarity.pcaExplainedVariance(Tables(spark, dir).embeddings, "vec_id", "embedding", iters = 8, nComponents = 2)
    },

    // ------------------------------------------------------- data quality
    // Single-scan constraint profile over lineitem: every rule is a
    // conditional aggregate in ONE pass (violation counts + rates).
    Q(
      "quality_profile_lineitem",
      Some("""
        WITH w AS (
          SELECT COUNT(*) AS n,
                 CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r1,
                 CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
                 CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS r3,
                 CAST(SUM(CASE WHEN NOT regexp_matches(l_returnflag, '^[ANR]$') THEN 1 ELSE 0 END) AS BIGINT) AS r4
          FROM lineitem)
        SELECT 'l_quantity_not_null' AS rule, r1 AS n_violations, n AS n_rows, CAST(r1 AS DOUBLE)/n AS violation_rate FROM w
        UNION ALL SELECT 'l_quantity_in_range', r2, n, CAST(r2 AS DOUBLE)/n FROM w
        UNION ALL SELECT 'l_extendedprice_positive', r3, n, CAST(r3 AS DOUBLE)/n FROM w
        UNION ALL SELECT 'l_returnflag_matches', r4, n, CAST(r4 AS DOUBLE)/n FROM w
      """)) { (spark, dir) =>
      DataQuality.profile(
        Tables(spark, dir).lineitem,
        Seq(
          DataQuality.notNull("l_quantity"),
          DataQuality.inRange("l_quantity", 1, 50),
          DataQuality.positive("l_extendedprice"),
          DataQuality.matches("l_returnflag", "^[ANR]$")))
    },

    // ------------------------------------- referential-integrity audit
    // FK orphan counts across the schema's join paths — the silent-join-
    // loss check (an orphaned FK means inner joins downstream drop rows).
    // One broadcast left_anti per relation; all-integer.
    Q(
      "quality_referential_integrity",
      Some("""
        SELECT 'lineitem->orders' AS relation,
               (SELECT COUNT(*) FROM lineitem) AS n_child_rows,
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        UNION ALL
        SELECT 'lineitem->part',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'orders->customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'customer->nation',
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        UNION ALL
        SELECT 'supplier->nation',
               (SELECT COUNT(*) FROM supplier),
               (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      DataQuality.referentialIntegrity(Seq(
        ("lineitem->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey"),
        ("lineitem->part", t.lineitem, "l_partkey", t.part, "p_partkey"),
        ("orders->customer", t.orders, "o_custkey", t.customer, "c_custkey"),
        ("customer->nation", t.customer, "c_nationkey", t.nation, "n_nationkey"),
        ("supplier->nation", t.supplier, "s_nationkey", t.nation, "n_nationkey")))
    },

    // --------------------------------------------- PK uniqueness audit
    // Declared-key uniqueness per table: rows, distinct keys, and rows
    // carrying a duplicated key (what a double-ingest doubles). One
    // aggregation per table; all-integer.
    Q(
      "quality_uniqueness",
      Some("""
        SELECT 'orders' AS table_name, COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_distinct_keys,
               CAST(COUNT(*) - (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) = 1)) AS BIGINT) AS n_dup_rows
        FROM orders
        UNION ALL
        SELECT 'lineitem', COUNT(*), COUNT(DISTINCT l_orderkey * 10 + l_linenumber),
               CAST(COUNT(*) - (SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) = 1)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'customer', COUNT(*), COUNT(DISTINCT c_custkey),
               CAST(COUNT(*) - (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) = 1)) AS BIGINT)
        FROM customer
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      DataQuality.uniquenessAudit(Seq(
        ("orders", t.orders, Seq("o_orderkey")),
        ("lineitem", t.lineitem, Seq("l_orderkey", "l_linenumber")),
        ("customer", t.customer, Seq("c_custkey"))))
    },

    // ------------------------------------------------ join-skew audit
    // Hot-key diagnosis for the shuffle planner (DataQuality.joinKeySkew):
    // the skew_factor column is the straggler multiplier if this column
    // keys a join — the number that decides salting vs AQE skew-join
    // BEFORE the 100 TB shuffle runs, not after it stalls. Exact counts,
    // deterministic (cnt desc, key asc) top-k cut, two rounded divisions.
    Q(
      "quality_skew_audit",
      Some("""
        WITH g AS (SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
        t AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_cnt FROM g)
        SELECT key, cnt,
               round(CAST(cnt AS DOUBLE) / n_rows, 6) AS share,
               n_keys, n_rows,
               round(CAST(max_cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_factor
        FROM g, t
        ORDER BY cnt DESC, key ASC
        LIMIT 10
      """)) { (spark, dir) =>
      DataQuality.joinKeySkew(Tables(spark, dir).lineitem, "l_suppkey", topK = 10)
    },

    // ------------------------------------------ audit-driven salted agg
    // The skew loop CLOSED: quality_skew_audit diagnoses, Skew.autoSaltedAgg
    // acts. The key here is a hot-key projection (suppkeys >= 5 collapse to
    // one "default supplier" bucket carrying ~96% of rows, skew factor
    // ~4.8), so the measured factor crosses the threshold and the
    // aggregation runs the two-phase (key, salt) -> key plan — with results
    // EXACTLY equal to the plain GROUP BY the oracle runs (associative
    // integer sums; PlanSpec pins the plan shapes, this row pins values).
    Q(
      "agg_salted_hotkey",
      Some("""
        SELECT least(l_suppkey, 5) AS k,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY 1
      """)) { (spark, dir) =>
      import graft.operators.Skew
      val base = Tables(spark, dir).lineitem
        .select(least(col("l_suppkey"), lit(5)).as("k"), col("l_quantity").cast("long").as("q"))
      Skew.autoSaltedAgg(
        base,
        Seq("k"),
        partial = Seq(count(lit(1)).as("n"), sum(col("q")).as("sum_qty")),
        merge   = Seq(sum(col("n")).as("n"), sum(col("sum_qty")).as("sum_qty")),
        skewThreshold = 4.0)
    },

    // ------------------------- salted agg from PUBLISHED catalog stats
    // The same hot-key aggregation, but the skew decision reads ANALYZE's
    // heavy-hitter stat (max_freq·ndv/n_rows, published alongside the
    // min/max zone stats) instead of running a measurement pass — at
    // 100 TB the decision costs a metadata read. Results must equal the
    // plain GROUP BY, as always.
    Q(
      "agg_salted_from_stats",
      Some("""
        SELECT least(l_suppkey, 5) AS k,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY 1
      """)) { (spark, dir) =>
      import graft.operators.Skew
      val root = java.nio.file.Files.createTempDirectory("graft-salt-stats").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("hot_lineitem", Tables(spark, dir).lineitem
        .select(least(col("l_suppkey"), lit(5)).as("k"), col("l_quantity").cast("long").as("q")))
      cat.analyzeTable("hot_lineitem", frequencyColumns = Seq("k"))
      val published = cat.skewFactorFor("hot_lineitem", "k")
      require(published.isDefined, "ANALYZE must publish the heavy-hitter stat")
      Skew.autoSaltedAgg(
        cat.readTable("hot_lineitem"),
        Seq("k"),
        partial = Seq(count(lit(1)).as("n"), sum(col("q")).as("sum_qty")),
        merge   = Seq(sum(col("n")).as("n"), sum(col("sum_qty")).as("sum_qty")),
        skewThreshold = 4.0,
        knownSkewFactor = published)
    },

    // --------------------------------------------- ER blocking audit
    // Blocking-quality metrics (DataQuality.blockingAudit) for a
    // nation × segment blocking of customer: reduction ratio vs the
    // full n² cross product plus the hot-block table — the go/no-go read
    // BEFORE the pair scorer runs (the er_* family's quadratic stage is
    // only affordable because a key like this scores >0.99 here).
    Q(
      "er_blocking_audit",
      Some("""
        WITH b AS (SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS block_key,
                          COUNT(*) AS block_size
                   FROM customer GROUP BY 1),
        bp AS (SELECT block_key, block_size,
                      CAST(block_size * (block_size - 1) // 2 AS BIGINT) AS block_pairs
               FROM b),
        t AS (SELECT CAST(SUM(block_size) AS BIGINT) AS n_records,
                     COUNT(*) AS n_blocks,
                     CAST(SUM(block_pairs) AS BIGINT) AS candidate_pairs
              FROM bp),
        t2 AS (SELECT *, CAST(n_records * (n_records - 1) // 2 AS BIGINT) AS full_pairs FROM t)
        SELECT block_key, block_size, block_pairs, n_records, n_blocks,
               candidate_pairs, full_pairs,
               round(1.0 - CAST(candidate_pairs AS DOUBLE) / CAST(full_pairs AS DOUBLE), 6) AS reduction_ratio
        FROM bp, t2
        ORDER BY block_pairs DESC, block_key
        LIMIT 10
      """)) { (spark, dir) =>
      DataQuality.blockingAudit(
        Tables(spark, dir).customer,
        expr("concat(CAST(c_nationkey AS STRING), '|', c_mktsegment)"),
        topK = 10)
    },

    // -------------------------------------------- Benford first-digit
    // Leading-digit law over order totals (money cast to DECIMAL first so
    // both engines string-format identically — no double-format skew):
    // observed counts vs p(d) = log10(1+1/d) with per-digit chi-square
    // contributions. The digit is the first SIGNIFICANT digit (first
    // [1-9] char of the rendering — correct for sub-unit values too, and
    // rendering-independent). Synthetic uniform prices FAIL the law
    // loudly — the monitor reads the chi2 column; real data trends to 0.
    Q(
      "quality_benford",
      Some("""
        WITH v AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders WHERE o_totalprice > 0),
        d AS (SELECT CAST(regexp_extract(CAST(v AS VARCHAR), '[1-9]') AS INTEGER) AS digit FROM v),
        g AS (SELECT digit, COUNT(*) AS n_observed FROM d WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
        t AS (SELECT CAST(SUM(n_observed) AS BIGINT) AS n_total FROM g)
        SELECT digit, n_observed,
               round((ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)), 6) AS expected_p,
               round((CAST(n_observed AS DOUBLE) - CAST(n_total AS DOUBLE) * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
                     * (CAST(n_observed AS DOUBLE) - CAST(n_total AS DOUBLE) * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
                     / (CAST(n_total AS DOUBLE) * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))), 6) AS chi2_term
        FROM g, t
      """)) { (spark, dir) =>
      DataQuality.benfordAudit(
        Tables(spark, dir).orders.select(money(col("o_totalprice")).as("v")), "v")
    },

    // ------------------------------------------- quantile bucketization
    // Feature discretization (DataQuality.quantileBucketize): exact
    // quartile cut points rounded to 4dp (the boundary is rounded, never
    // the data — so the v <= b predicate is engine-deterministic; the
    // unrounded-percentile parity itself is proven by agg_percentiles),
    // then a literal CASE assigns bins on a second scan.
    Q(
      "quantile_bucketize_price",
      Some("""
        WITH b AS (SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS b0,
                          round(quantile_cont(l_extendedprice, 0.5), 4) AS b1,
                          round(quantile_cont(l_extendedprice, 0.75), 4) AS b2
                   FROM lineitem)
        SELECT CASE WHEN l_extendedprice <= b0 THEN 0
                    WHEN l_extendedprice <= b1 THEN 1
                    WHEN l_extendedprice <= b2 THEN 2
                    ELSE 3 END AS bin,
               COUNT(*) AS n_rows
        FROM lineitem, b
        GROUP BY 1
      """)) { (spark, dir) =>
      DataQuality.quantileBucketize(
        Tables(spark, dir).lineitem,
        "l_extendedprice",
        probabilities = Seq(0.25, 0.5, 0.75))
    },

    // --------------------------------------------- MAD robust outliers
    // DataQuality.madOutliers: |v − median| / (1.4826·MAD) > 3, the
    // robust z-score immune to its own outliers. Median and MAD are exact
    // interpolated percentiles rounded to 1e-6 BEFORE any arithmetic, the
    // deviation is an exact double subtraction, and the score is rounded
    // to the same grid before the threshold compare — DuckDB's
    // quantile_cont uses the same lower+(upper−lower)·frac interpolation,
    // so flags are engine-deterministic. Constants forced ::DOUBLE (the
    // DuckDB decimal-literal trap).
    Q(
      "events_mad_outliers",
      Some("""
        WITH med AS (SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
                     FROM events GROUP BY 1),
        dev AS (SELECT e.event_type, e.event_id, e.value, ABS(e.value - m.med) AS dev
                FROM events e JOIN med m USING (event_type)),
        mad AS (SELECT event_type, ROUND(quantile_cont(dev, 0.5), 6) AS mad
                FROM dev GROUP BY 1)
        SELECT d.event_type, d.event_id, d.value,
               ROUND(d.dev / (1.4826::DOUBLE * mad.mad), 6) AS score
        FROM dev d JOIN mad ON mad.event_type = d.event_type
        WHERE mad.mad > 0::DOUBLE
          AND ROUND(d.dev / (1.4826::DOUBLE * mad.mad), 6) > 3.0::DOUBLE
      """)) { (spark, dir) =>
      DataQuality.madOutliers(
        Tables(spark, dir).events, "event_type", "event_id", "value", k = 3.0)
    },

    // ------------------------------------------------- distribution drift
    // PSI over the events value feature, first half-month (reference) vs
    // second (current): bins from REFERENCE deciles (exact percentiles
    // rounded to 1e-4 before any compare — the quantileBucketize
    // discipline), per-bin (p_cur−p_ref)·ln(p_cur/p_ref) contributions
    // with the standard 1e-6 empty-bin clamp, rounded to 6 to absorb ln's
    // cross-engine last-ulp freedom. Σ psi_term is the headline PSI.
    Q(
      "quality_drift_psi",
      Some("""
        WITH ref AS (SELECT value AS v FROM events WHERE ts < TIMESTAMP '2024-01-15' AND value IS NOT NULL),
        cur AS (SELECT value AS v FROM events WHERE ts >= TIMESTAMP '2024-01-15' AND value IS NOT NULL),
        b AS (SELECT round(quantile_cont(v, 0.1), 4) AS b0, round(quantile_cont(v, 0.2), 4) AS b1,
                     round(quantile_cont(v, 0.3), 4) AS b2, round(quantile_cont(v, 0.4), 4) AS b3,
                     round(quantile_cont(v, 0.5), 4) AS b4, round(quantile_cont(v, 0.6), 4) AS b5,
                     round(quantile_cont(v, 0.7), 4) AS b6, round(quantile_cont(v, 0.8), 4) AS b7,
                     round(quantile_cont(v, 0.9), 4) AS b8
              FROM ref),
        rbin AS (SELECT CASE WHEN v <= b0 THEN 0 WHEN v <= b1 THEN 1 WHEN v <= b2 THEN 2
                             WHEN v <= b3 THEN 3 WHEN v <= b4 THEN 4 WHEN v <= b5 THEN 5
                             WHEN v <= b6 THEN 6 WHEN v <= b7 THEN 7 WHEN v <= b8 THEN 8
                             ELSE 9 END AS bin FROM ref, b),
        cbin AS (SELECT CASE WHEN v <= b0 THEN 0 WHEN v <= b1 THEN 1 WHEN v <= b2 THEN 2
                             WHEN v <= b3 THEN 3 WHEN v <= b4 THEN 4 WHEN v <= b5 THEN 5
                             WHEN v <= b6 THEN 6 WHEN v <= b7 THEN 7 WHEN v <= b8 THEN 8
                             ELSE 9 END AS bin FROM cur, b),
        rc AS (SELECT bin, COUNT(*) AS nr FROM rbin GROUP BY 1),
        cc AS (SELECT bin, COUNT(*) AS nc FROM cbin GROUP BY 1),
        grid AS (SELECT CAST(unnest(range(0, 10)) AS INTEGER) AS bin),
        counts AS (SELECT g.bin, COALESCE(rc.nr, 0) AS n_ref, COALESCE(cc.nc, 0) AS n_cur
                   FROM grid g LEFT JOIN rc ON rc.bin = g.bin LEFT JOIN cc ON cc.bin = g.bin),
        t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM counts)
        SELECT bin, n_ref, n_cur,
               ROUND((GREATEST(n_cur::DOUBLE / tc, 1e-6) - GREATEST(n_ref::DOUBLE / tr, 1e-6))
                     * ln(GREATEST(n_cur::DOUBLE / tc, 1e-6) / GREATEST(n_ref::DOUBLE / tr, 1e-6)),
                     6) AS psi_term
        FROM counts, t
      """)) { (spark, dir) =>
      val ev = Tables(spark, dir).events
      val cut = to_timestamp(lit("2024-01-15 00:00:00"))
      DataQuality.psiDrift(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut), "value", bins = 10)
    },

    // Chi-square homogeneity over the categorical event-type mix, same
    // half-month split: per-category (o−e)²/e contributions against the
    // pooled-proportion expectation (the sum is the χ² statistic with k−1
    // d.o.f. — kept OUT of the query so no cross-category double-sum
    // order dependence enters the contract).
    Q(
      "quality_drift_chi2",
      Some("""
        WITH r AS (SELECT event_type, COUNT(*) AS nr FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1),
        c AS (SELECT event_type, COUNT(*) AS nc FROM events WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY 1),
        g AS (SELECT COALESCE(r.event_type, c.event_type) AS event_type,
                     COALESCE(nr, 0) AS n_ref, COALESCE(nc, 0) AS n_cur
              FROM r FULL OUTER JOIN c ON r.event_type = c.event_type),
        t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM g)
        SELECT event_type, n_ref, n_cur,
               ROUND((n_ref - (n_ref + n_cur)::DOUBLE / (tr + tc) * tr)
                     * (n_ref - (n_ref + n_cur)::DOUBLE / (tr + tc) * tr)
                     / ((n_ref + n_cur)::DOUBLE / (tr + tc) * tr)
                     + (n_cur - (n_ref + n_cur)::DOUBLE / (tr + tc) * tc)
                     * (n_cur - (n_ref + n_cur)::DOUBLE / (tr + tc) * tc)
                     / ((n_ref + n_cur)::DOUBLE / (tr + tc) * tc),
                     6) AS chi2_term
        FROM g, t
      """)) { (spark, dir) =>
      val ev = Tables(spark, dir).events
      val cut = to_timestamp(lit("2024-01-15 00:00:00"))
      DataQuality.chiSquareDrift(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut), "event_type")
    },

    // ------------------------------------------------- multimodal columns
    // Opaque binary + typed metadata: the documents' text bytes stand in for
    // a media payload (the container has no image/audio libs — the DECODE
    // step is stubbed in graft.operators.Multimodal; the Spark-side
    // plumbing here — binary column, byte lengths, content hashes, byte
    // slicing — is real and oracle-checked).
    Q(
      "multimodal_meta",
      Some("""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_hash,
               lower(hex(encode(substring(text, 1, 8)))) AS head_hex
        FROM documents
      """)) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(
          col("doc_id"),
          length(col("text").cast("binary")).as("n_bytes"),
          md5(col("text").cast("binary")).as("content_hash"),
          lower(hex(substring(col("text").cast("binary"), 1, 8))).as("head_hex"))
    },

    // Decode/feature-extract through the partition-batched codec path. The
    // stub codec's metadata is a deterministic function of the byte length,
    // so the ORACLE can recompute it — the mapPartitions plumbing itself is
    // what's under test. (The float features column is spec-checked.)
    Q(
      "multimodal_features",
      Some("""
        SELECT doc_id AS media_id,
               64 + octet_length(encode(text)) % 192 AS width,
               64 + (octet_length(encode(text)) // 7) % 192 AS height,
               1 AS n_frames
        FROM documents
      """)) { (spark, dir) =>
      val media = Multimodal.ingest(
        Tables(spark, dir).documents
          .select(col("doc_id"), lit("image").as("kind"), col("text").cast("binary").as("payload")),
        "doc_id", "kind", "payload")
      Multimodal
        .decodeFeatures(media, () => new Multimodal.FakeCodec(8))
        .toDF()
        .select(
          col("mediaId").as("media_id"),
          col("width").cast("int").as("width"),
          col("height").cast("int").as("height"),
          col("nFrames").cast("int").as("n_frames"))
    },

    // Uniform frame sampling: k evenly-spaced byte slices, hex-compared
    // against DuckDB's arithmetic (1.0 can neither slice nor md5 BLOBs, so
    // the oracle slices the hex string: byte b lives at hex chars 2b+1..).
    Q(
      "multimodal_frames",
      Some("""
        WITH m AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS payload_hex,
                          octet_length(encode(text)) AS n FROM documents)
        SELECT media_id, CAST(i AS INT) AS frame_idx,
               substring(payload_hex, 2 * (CAST(floor(i * greatest(n - 16, 0) / 3) AS INT)) + 1, 32) AS frame_hex
        FROM m, range(0, 4) t(i)
      """)) { (spark, dir) =>
      val media = Multimodal.ingest(
        Tables(spark, dir).documents
          .select(col("doc_id"), lit("image").as("kind"), col("text").cast("binary").as("payload")),
        "doc_id", "kind", "payload")
      Multimodal
        .sampleFrames(media, k = 4, frameBytes = 16)
        .select(col("media_id"), col("frame_idx"), lower(hex(col("frame"))).as("frame_hex"))
    },

    // dHash perceptual fingerprint (Krawetz difference hash): 9×8 integer
    // nearest-neighbor resize, 64 horizontal-gradient bits packed into a
    // signed long — the image near-dup key (gradient signs survive
    // re-encode/brightness shifts that break exact byte hashes); feeds
    // the SAME hamming/banding machinery as Dedup.simhash downstream.
    // The oracle replays the resize index arithmetic and packs bits via a
    // recursive-doubling HUGEINT power table (no 1<<63 BIGINT overflow),
    // then converts to the signed-long two's complement Spark holds.
    Q(
      "multimodal_dhash",
      Some("""
        WITH m AS (SELECT doc_id AS media_id, text AS body, octet_length(encode(text)) AS nb,
                          greatest(octet_length(encode(text)), 1) AS n FROM documents),
        g AS (SELECT *, greatest(CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT), 1) AS sw FROM m),
        hh AS (SELECT *, (n + sw - 1) // sw AS sh FROM g),
        px AS (SELECT media_id, y, x, ((y * sh) // 8) * sw + ((x * sw) // 9) AS idx, body, nb
               FROM hh, range(0, 8) ty(y), range(0, 9) tx(x)),
        pv AS (SELECT media_id, y, x,
                      CASE WHEN idx < nb THEN ord(substring(body, CAST(idx + 1 AS INT), 1)) ELSE 0 END AS p
               FROM px),
        bits AS (SELECT a.media_id, a.y, a.x, CASE WHEN a.p < b.p THEN 1 ELSE 0 END AS bit
                 FROM pv a JOIN pv b ON b.media_id = a.media_id AND b.y = a.y AND b.x = a.x + 1
                 WHERE a.x < 8),
        pow2 AS (WITH RECURSIVE q(k, v) AS (
                   SELECT 0, 1::HUGEINT UNION ALL SELECT k + 1, v * 2 FROM q WHERE k < 63)
                 SELECT * FROM q),
        s AS (SELECT b.media_id, SUM(CASE WHEN b.bit = 1 THEN p2.v ELSE 0::HUGEINT END) AS hs
              FROM bits b JOIN pow2 p2 ON p2.k = b.y * 8 + b.x GROUP BY b.media_id)
        SELECT media_id,
               CAST(CASE WHEN hs >= 9223372036854775808::HUGEINT
                         THEN hs - 18446744073709551616::HUGEINT ELSE hs END AS BIGINT) AS dhash
        FROM s
      """)) { (spark, dir) =>
      val media = Multimodal.ingest(
        Tables(spark, dir).documents
          .select(col("doc_id"), lit("image").as("kind"), col("text").cast("binary").as("payload")),
        "doc_id", "kind", "payload")
      Multimodal.dhash(media)
    },

    // Walsh-Hadamard perceptual hash (the pHash idea with the DCT swapped
    // for the ±1-basis WHT so every coefficient stays an EXACT integer —
    // no cross-engine trig): 15 low-index AC coefficients of the 8×8
    // resample, thresholded at their median (the 8th order statistic,
    // well-defined under ties), packed into 15 bits. Brightness shifts
    // move only the DC term, so the hash ignores them by construction.
    // Oracle: the proven resize/pixel replay, a 15-row (u,v) frame with
    // bit_count-parity signs, a row_number 8th-smallest median, and a
    // power-of-two bit pack.
    Q(
      "multimodal_wht_hash",
      Some("""
        WITH m AS (SELECT doc_id AS media_id, text AS body, octet_length(encode(text)) AS nb,
                          greatest(octet_length(encode(text)), 1) AS n FROM documents),
        g AS (SELECT *, greatest(CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT), 1) AS sw FROM m),
        hh AS (SELECT *, (n + sw - 1) // sw AS sh FROM g),
        px AS (SELECT media_id, y, x, ((y * sh) // 8) * sw + ((x * sw) // 8) AS idx, body, nb
               FROM hh, range(0, 8) ty(y), range(0, 8) tx(x)),
        pv AS (SELECT media_id, y, x,
                      CASE WHEN idx < nb THEN ord(substring(body, CAST(idx + 1 AS INT), 1)) ELSE 0 END AS p
               FROM px),
        uv AS (SELECT u, v, u * 4 + v - 1 AS k FROM range(0, 4) tu(u), range(0, 4) tv(v)
               WHERE NOT (u = 0 AND v = 0)),
        co AS (SELECT media_id, k,
                      CAST(SUM(CASE WHEN (bit_count(CAST(u & x AS BIGINT)) + bit_count(CAST(v & y AS BIGINT))) % 2 = 0
                               THEN p ELSE -p END) AS BIGINT) AS c
               FROM pv, uv GROUP BY 1, 2),
        med AS (SELECT media_id, c AS ac_median
                FROM (SELECT media_id, c, row_number() OVER (PARTITION BY media_id ORDER BY c) AS rn FROM co)
                WHERE rn = 8)
        SELECT co.media_id,
               CAST(SUM(CASE WHEN c > ac_median THEN CAST(1 AS BIGINT) << k ELSE 0 END) AS BIGINT) AS wht_hash,
               MIN(ac_median) AS ac_median
        FROM co JOIN med ON med.media_id = co.media_id
        GROUP BY 1
      """)) { (spark, dir) =>
      val media = Multimodal.ingest(
        Tables(spark, dir).documents
          .select(col("doc_id"), lit("image").as("kind"), col("text").cast("binary").as("payload")),
        "doc_id", "kind", "payload")
      Multimodal.whtHash(media)
    },

    // Nearest-neighbor resize to a fixed 16x16 grid. The stub "decode"
    // treats the payload as a row-major ~square gray image (sw=floor(sqrt n),
    // sh=ceil(n/sw)) and the resize picks payload[(y*sh/16)*sw + (x*sw/16)]
    // — all integer arithmetic, so the ORACLE replays it in DuckDB by
    // slicing the hex encoding of the payload (byte b = hex chars 2b+1..2b+2)
    // and string_agg-ing the 256 sampled bytes in (y, x) order.
    Q(
      "multimodal_resize",
      Some("""
        WITH m AS (
          SELECT doc_id AS media_id,
                 lower(hex(encode(text))) AS ph,
                 octet_length(encode(text)) AS nb,
                 greatest(octet_length(encode(text)), 1) AS n
          FROM documents),
        g AS (
          SELECT media_id, ph, nb, n,
                 greatest(CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT), 1) AS sw
          FROM m),
        h AS (SELECT *, (n + sw - 1) // sw AS sh FROM g),
        px AS (
          SELECT media_id, y, x,
                 ((y * sh) // 16) * sw + ((x * sw) // 16) AS idx, ph, nb
          FROM h, range(0, 16) ty(y), range(0, 16) tx(x))
        SELECT media_id,
               16 AS width, 16 AS height,
               string_agg(
                 CASE WHEN idx < nb THEN substring(ph, CAST(2 * idx + 1 AS INT), 2) ELSE '00' END,
                 '' ORDER BY y, x) AS pixels_hex
        FROM px
        GROUP BY media_id
      """)) { (spark, dir) =>
      val media = Multimodal.ingest(
        Tables(spark, dir).documents
          .select(col("doc_id"), lit("image").as("kind"), col("text").cast("binary").as("payload")),
        "doc_id", "kind", "payload")
      Multimodal
        .resizeNearest(media, tw = 16, th = 16)
        .toDF()
        .select(
          col("mediaId").as("media_id"),
          col("width").cast("int").as("width"),
          col("height").cast("int").as("height"),
          lower(hex(col("pixels"))).as("pixels_hex"))
    },

    // REAL decode through the codec path: each document's bytes are framed
    // as a binary PGM (P5 header + 16×16 raster) and PpmCodec — an actual
    // pure-JVM netpbm decoder, not the stub — parses the header and
    // extracts band-mean features from the decoded pixels. The oracle
    // replays the raster construction and the integer band sums in SQL
    // (text is ASCII, so chars == bytes; means are /32 = exact dyadic
    // doubles, so the float compare is exact, no rounding discipline
    // needed). Proves the Codec interface with real pixel data end to end.
    Q(
      "multimodal_decode_ppm",
      Some("""
        WITH m AS (SELECT doc_id AS media_id, rpad(substring(text, 1, 256), 256, ' ') AS body FROM documents),
        px AS (SELECT media_id, i, ord(substring(body, CAST(i + 1 AS INT), 1)) AS p
               FROM m, range(0, 256) t(i)),
        s AS (SELECT media_id, CAST(i // 32 AS INT) AS band, SUM(p) AS bsum FROM px GROUP BY 1, 2)
        SELECT media_id, 16 AS width, 16 AS height, band,
               CAST(CAST(bsum AS DOUBLE) / 32.0 AS REAL) AS mean_px
        FROM s
      """)) { (spark, dir) =>
      val media = Tables(spark, dir).documents.select(
        col("doc_id").cast("long").as("media_id"),
        lit("image").as("kind"),
        concat(lit("P5\n16 16\n255\n"), rpad(substring(col("text"), 1, 256), 256, " "))
          .cast("binary")
          .as("payload"))
      Multimodal
        .decodeFeatures(media, () => new Multimodal.PpmCodec(bands = 8))
        .toDF()
        .select(
          col("mediaId").as("media_id"),
          col("width").cast("int").as("width"),
          col("height").cast("int").as("height"),
          posexplode(col("features")).as(Seq("band", "mean_px")))
    },

    // REAL compressed-format decode through the JDK's own PNG codec: each
    // row ENCODES a synthetic RGB test card with ImageIO.write (a genuine
    // zlib-compressed PNG, executor-side) and ImageIoCodec decodes it back
    // through javax.imageio. The pixel channels are pure integer functions
    // of (x, y, id), so the oracle computes the expected dims + band means
    // from the FORMULA — any decode defect (channel order, row order,
    // color conversion, banding arithmetic) breaks the comparison. Means
    // are exact-integer sums / count on both sides → float compare exact.
    Q(
      "multimodal_decode_png",
      Some("""
        WITH d AS (SELECT CAST(doc_id AS INT) AS id FROM documents WHERE doc_id < 64),
        dims AS (SELECT id, 16 + id % 16 AS w, 12 + id % 8 AS h FROM d),
        samp AS (SELECT id, w, h, w * h * 3 AS n, unnest(range(0, w * h * 3)) AS k FROM dims),
        px AS (SELECT id, w, h, k,
                      CAST((8 * k + 7) // n AS INT) AS band,
                      CASE CAST(k % 3 AS INT)
                        WHEN 0 THEN (CAST(k // 3 AS INT) % w * 7  + CAST(k // 3 AS INT) // w * 13 + id) % 256
                        WHEN 1 THEN (CAST(k // 3 AS INT) % w * 11 + CAST(k // 3 AS INT) // w * 3  + 2 * id) % 256
                        ELSE        (CAST(k // 3 AS INT) % w * 5  + CAST(k // 3 AS INT) // w * 17 + 3 * id) % 256
                      END AS p
               FROM samp),
        s AS (SELECT id, w, h, band, SUM(p) AS bsum, COUNT(*) AS cnt FROM px GROUP BY 1, 2, 3, 4)
        SELECT id AS media_id, w AS width, h AS height, band,
               CAST(CAST(bsum AS DOUBLE) / cnt AS REAL) AS mean_px
        FROM s
      """)) { (spark, dir) =>
      import spark.implicits._
      val media = Tables(spark, dir).documents
        .filter(col("doc_id") < 64) // filter BEFORE the int cast: id-offset
        .select(col("doc_id").cast("int").as("id")) // scale copies overflow INT
        .as[Int]
        .mapPartitions { it =>
          it.map { id =>
            (id.toLong, "image", Multimodal.syntheticImage(id, 16 + id % 16, 12 + id % 8, "png"))
          }
        }
        .toDF("media_id", "kind", "payload")
      Multimodal
        .decodeFeatures(
          Multimodal.ingest(media, "media_id", "kind", "payload"),
          () => new Multimodal.ImageIoCodec(bands = 8))
        .toDF()
        .select(
          col("mediaId").as("media_id"),
          col("width").cast("int").as("width"),
          col("height").cast("int").as("height"),
          posexplode(col("features")).as(Seq("band", "mean_px")))
    },

    // REAL audio decode through the JDK's own RIFF/WAVE parser: each row
    // ENCODES a deterministic PCM clip with AudioSystem.write (a genuine
    // WAV container, executor-side) and WavCodec parses it back through
    // javax.sound.sampled. Sample values are a pure integer function of
    // (frame, channel, id) — mono and stereo alternate by id — so the
    // oracle computes expected rate/channels/frames + band means from the
    // FORMULA; any decode defect (endianness, header skip, channel
    // interleave, banding) breaks the comparison. Integer sums / count on
    // both sides → float compare exact.
    Q(
      "multimodal_decode_wav",
      Some("""
        WITH d AS (SELECT CAST(doc_id AS INT) AS id FROM documents WHERE doc_id < 64),
        dims AS (SELECT id, 400 + (id % 5) * 160 AS nf, 1 + id % 2 AS ch FROM d),
        samp AS (SELECT id, nf, ch, nf * ch AS n, unnest(range(0, nf * ch)) AS k FROM dims),
        px AS (SELECT id, nf, ch, n, k,
                      CAST((8 * k + 7) // n AS INT) AS band,
                      (CAST(k // ch AS INT) * (13 + id) + CAST(k % ch AS INT) * 7919) % 4093 - 2046 AS p
               FROM samp),
        s AS (SELECT id, nf, ch, band, SUM(p) AS bsum, COUNT(*) AS cnt FROM px GROUP BY 1, 2, 3, 4)
        SELECT id AS media_id, 8000 AS sample_rate, ch AS channels, nf AS n_frames, band,
               CAST(CAST(bsum AS DOUBLE) / cnt AS REAL) AS mean_amp
        FROM s
      """)) { (spark, dir) =>
      import spark.implicits._
      val media = Tables(spark, dir).documents
        .filter(col("doc_id") < 64) // filter BEFORE the int cast: id-offset
        .select(col("doc_id").cast("int").as("id")) // scale copies overflow INT
        .as[Int]
        .mapPartitions { it =>
          it.map { id =>
            (
              id.toLong,
              "audio",
              Multimodal.syntheticWav(id, 8000, 400 + (id % 5) * 160, 1 + id % 2))
          }
        }
        .toDF("media_id", "kind", "payload")
      Multimodal
        .decodeFeatures(
          Multimodal.ingest(media, "media_id", "kind", "payload"),
          () => new Multimodal.WavCodec(bands = 8))
        .toDF()
        .select(
          col("mediaId").as("media_id"),
          col("width").cast("int").as("sample_rate"), // decoded rate, not replanted

          col("height").cast("int").as("channels"),
          col("nFrames").cast("int").as("n_frames"),
          posexplode(col("features")).as(Seq("band", "mean_amp")))
    },

    // Audio perceptual fingerprint (Haitsma-Kalker energy-delta signs —
    // the WAV sibling of multimodal_dhash): real RIFF encode + decode on
    // the executor, 65 segment energies as exact integer Σ|channel-summed
    // PCM|, 64 delta-sign bits packed into a signed long. Volume scaling
    // preserves every bit (spec pins it); the oracle replays energies and
    // bits from the sample FORMULA with the dhash HUGEINT bit-pack.
    Q(
      "multimodal_audio_fingerprint",
      Some("""
        WITH d AS (SELECT CAST(doc_id AS INT) AS id FROM documents WHERE doc_id < 64),
        dims AS (SELECT id, 400 + (id % 5) * 160 AS nf, 1 + id % 2 AS ch FROM d),
        segs AS (SELECT id, nf, ch, CAST(s AS INT) AS s,
                        (s * nf) // 65 AS f0, ((s + 1) * nf) // 65 AS f1
                 FROM dims, range(0, 65) t(s)),
        fr AS (SELECT id, ch, s, unnest(range(f0, f1)) AS f FROM segs),
        chx AS (SELECT id, s, f, unnest(range(0, ch)) AS c FROM fr),
        mono AS (SELECT id, s, f, SUM((f * (13 + id) + c * 7919) % 4093 - 2046) AS m
                 FROM chx GROUP BY 1, 2, 3),
        en AS (SELECT sg.id, sg.s, COALESCE(SUM(abs(mono.m)), 0) AS e
               FROM segs sg LEFT JOIN mono ON mono.id = sg.id AND mono.s = sg.s
               GROUP BY 1, 2),
        bits AS (SELECT a.id, a.s, CASE WHEN a.e < b.e THEN 1 ELSE 0 END AS bit
                 FROM en a JOIN en b ON b.id = a.id AND b.s = a.s + 1 WHERE a.s < 64),
        pow2 AS (WITH RECURSIVE q(k, v) AS (
                   SELECT 0, 1::HUGEINT UNION ALL SELECT k + 1, v * 2 FROM q WHERE k < 63)
                 SELECT * FROM q),
        hs AS (SELECT b.id, SUM(CASE WHEN b.bit = 1 THEN p2.v ELSE 0::HUGEINT END) AS h
               FROM bits b JOIN pow2 p2 ON p2.k = b.s GROUP BY b.id)
        SELECT CAST(id AS BIGINT) AS media_id,
               CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                         THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS afp
        FROM hs
      """)) { (spark, dir) =>
      import spark.implicits._
      val media = Tables(spark, dir).documents
        .filter(col("doc_id") < 64) // filter BEFORE the int cast: id-offset
        .select(col("doc_id").cast("int").as("id")) // scale copies overflow INT
        .as[Int]
        .mapPartitions { it =>
          it.map { id =>
            (
              id.toLong,
              "audio",
              Multimodal.syntheticWav(id, 8000, 400 + (id % 5) * 160, 1 + id % 2))
          }
        }
        .toDF("media_id", "kind", "payload")
      Multimodal.audioFingerprint(Multimodal.ingest(media, "media_id", "kind", "payload"))
    },

    // The EXTERNAL-decoder pipe, gate-checked: FfmpegCodec's entire
    // subprocess machinery (writer thread + concurrent drain, round-robin
    // s16le fold, watchdog, exit surface) runs against a PLANTED decoder
    // honoring the same CLI contract — it echoes stdin, so the payload IS
    // the decoded PCM stream and the oracle computes every band mean from
    // the text bytes (s16le pairs: lo + 256*hi, ASCII so never negative;
    // round-robin band k % 4; a dangling odd byte is ignored, floor(n/2)
    // samples — the codec's carry never flushes). Where a real ffmpeg
    // exists the gated MultimodalSpec integration test covers the real
    // binary; this row makes the PIPE itself part of the correctness gate
    // in every environment.
    Q(
      "multimodal_decode_ffmpeg",
      Some("""
        WITH d AS (SELECT CAST(doc_id AS INT) AS id, text FROM documents WHERE doc_id < 64),
        n AS (SELECT id, text, CAST(length(text) // 2 AS BIGINT) AS ns FROM d),
        samp AS (SELECT id, ns, text, unnest(range(0, ns)) AS k FROM n),
        px AS (SELECT id, ns, CAST(k % 4 AS INT) AS band,
                      ascii(substr(text, CAST(2 * k + 1 AS INT), 1)) +
                      256 * ascii(substr(text, CAST(2 * k + 2 AS INT), 1)) AS p
               FROM samp),
        s AS (SELECT id, ns, band, SUM(p) AS bsum, COUNT(*) AS cnt FROM px GROUP BY 1, 2, 3)
        SELECT CAST(id AS BIGINT) AS media_id, ns AS n_samples, band,
               CAST(CAST(bsum AS DOUBLE) / cnt AS REAL) AS mean_amp
        FROM s
      """)) { (spark, dir) =>
      // the planted decoder: -version probe + echo (args ignored). In local
      // mode executors share the driver FS; on a real cluster this path is
      // the preinstalled ffmpeg binary — the same deployment assumption the
      // real codec carries.
      val fdir = java.nio.file.Files.createTempDirectory("graft_fakeffmpeg_gate_")
      val bin  = fdir.resolve("fake-ffmpeg")
      java.nio.file.Files.write(
        bin,
        "#!/bin/sh\nif [ \"$1\" = \"-version\" ]; then exit 0; fi\ncat\n".getBytes("US-ASCII"))
      bin.toFile.setExecutable(true)
      val binPath = bin.toString
      val media = Tables(spark, dir).documents
        .filter(col("doc_id") < 64) // filter BEFORE use: id-offset scale copies
        .select(
          col("doc_id").cast("long").as("media_id"),
          lit("audio").as("kind"),
          col("text").cast("binary").as("payload"))
      Multimodal
        .decodeFeatures(
          Multimodal.ingest(media, "media_id", "kind", "payload"),
          () => new Multimodal.FfmpegCodec(bands = 4, ffmpegBin = binPath))
        .toDF()
        .select(
          col("mediaId").as("media_id"),
          col("nFrames").cast("long").as("n_samples"),
          posexplode(col("features")).as(Seq("band", "mean_amp")))
    },

    // REAL MP3 frame-header walk: each row synthesizes an MPEG-1 Layer
    // III stream by pure byte formula (fixed 128 kbps @ 44.1 kHz, frame
    // length 417, mono/stereo by id parity) and Mp3Codec parses it back —
    // validating every sync word, computing each frame length from the
    // header bitrate, skipping nothing. The oracle replays the metadata
    // (rate/channels, duration as mpeg_frames*1152 sample frames) and the
    // band means directly from the byte formula: header bytes are the
    // four constants, payload bytes (j*(7+id)+f*131)%251; any walk defect
    // (sync, length arithmetic, mode decode, banding) breaks the hash.
    Q(
      "multimodal_decode_mp3",
      Some("""
        WITH d AS (SELECT CAST(doc_id AS INT) AS id FROM documents WHERE doc_id < 64),
        dims AS (SELECT id, 20 + id % 11 AS nf FROM d),
        pos AS (SELECT id, nf, nf * 417 AS n, unnest(range(0, nf * 417)) AS p FROM dims),
        bytes AS (SELECT id, nf, n, p,
                         CAST((8 * p + 7) // n AS INT) AS band,
                         CAST(p // 417 AS INT) AS f,
                         CAST(p % 417 AS INT) AS j
                  FROM pos),
        v AS (SELECT id, nf, band,
                     CASE
                       WHEN j = 0 THEN 255
                       WHEN j = 1 THEN 251
                       WHEN j = 2 THEN 144
                       WHEN j = 3 THEN CASE WHEN id % 2 = 0 THEN 192 ELSE 0 END
                       ELSE (j * (7 + id) + f * 131) % 251
                     END AS b
              FROM bytes),
        s AS (SELECT id, nf, band, SUM(b) AS bsum, COUNT(*) AS cnt FROM v GROUP BY 1, 2, 3)
        SELECT id AS media_id, 44100 AS sample_rate, 1 + id % 2 AS channels,
               nf * 1152 AS n_frames, band,
               CAST(CAST(bsum AS DOUBLE) / cnt AS REAL) AS mean_byte
        FROM s
      """)) { (spark, dir) =>
      import spark.implicits._
      val media = Tables(spark, dir).documents
        .filter(col("doc_id") < 64) // filter BEFORE the int cast: id-offset
        .select(col("doc_id").cast("int").as("id")) // scale copies overflow INT
        .as[Int]
        .mapPartitions { it =>
          it.map(id => (id.toLong, "audio", Multimodal.syntheticMp3(id, 20 + id % 11)))
        }
        .toDF("media_id", "kind", "payload")
      Multimodal
        .decodeFeatures(
          Multimodal.ingest(media, "media_id", "kind", "payload"),
          () => new Multimodal.Mp3Codec(bands = 8))
        .toDF()
        .select(
          col("mediaId").as("media_id"),
          col("width").cast("int").as("sample_rate"),
          col("height").cast("int").as("channels"),
          col("nFrames").cast("int").as("n_frames"),
          posexplode(col("features")).as(Seq("band", "mean_byte")))
    },

    // REAL MP4 box walk: each row synthesizes a well-formed ISO BMFF tree
    // (ftyp + moov(mvhd + video trak(tkhd+mdia(mdhd+hdlr+minf(stbl(stts)))))
    // + mdat) whose every metadata field and mdat byte is a pure integer
    // function of id, and Mp4Codec walks the boxes back — validating
    // nesting and sizes, reading dims from tkhd's 16.16 fixed point,
    // frame count from the stts sample-count sum, features from mdat band
    // means. The oracle recomputes all of it from the formulas; any walk
    // defect (size arithmetic, nesting, fixed point, stts, banding)
    // breaks the hash.
    Q(
      "multimodal_decode_mp4",
      Some("""
        WITH d AS (SELECT CAST(doc_id AS INT) AS id FROM documents WHERE doc_id < 64),
        dims AS (SELECT id, 2000 + (id % 5) * 400 AS nb FROM d),
        pos AS (SELECT id, nb, unnest(range(0, nb)) AS p FROM dims),
        v AS (SELECT id, nb, CAST((8 * p + 7) // nb AS INT) AS band,
                     (p * (11 + id)) % 241 AS b
              FROM pos),
        s AS (SELECT id, nb, band, SUM(b) AS bsum, COUNT(*) AS cnt FROM v GROUP BY 1, 2, 3)
        SELECT id AS media_id, 160 + (id % 4) * 80 AS width, 120 + (id % 3) * 60 AS height,
               24 + (id % 7) * 24 AS n_frames, band,
               CAST(CAST(bsum AS DOUBLE) / cnt AS REAL) AS mean_byte
        FROM s
      """)) { (spark, dir) =>
      import spark.implicits._
      val media = Tables(spark, dir).documents
        .filter(col("doc_id") < 64) // filter BEFORE the int cast: id-offset
        .select(col("doc_id").cast("int").as("id")) // scale copies overflow INT
        .as[Int]
        .mapPartitions { it =>
          it.map { id =>
            (
              id.toLong,
              "video",
              Multimodal.syntheticMp4(
                id,
                nFrames = 24 + (id % 7) * 24,
                w = 160 + (id % 4) * 80,
                h = 120 + (id % 3) * 60,
                mdatBytes = 2000 + (id % 5) * 400))
          }
        }
        .toDF("media_id", "kind", "payload")
      Multimodal
        .decodeFeatures(
          Multimodal.ingest(media, "media_id", "kind", "payload"),
          () => new Multimodal.Mp4Codec(bands = 8))
        .toDF()
        .select(
          col("mediaId").as("media_id"),
          col("width").cast("int").as("width"),
          col("height").cast("int").as("height"),
          col("nFrames").cast("int").as("n_frames"),
          posexplode(col("features")).as(Seq("band", "mean_byte")))
    }
  )
}
