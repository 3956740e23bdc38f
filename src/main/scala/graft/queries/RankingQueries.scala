package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.sources.Tables

/** Ranked retrieval + fuzzy matching over the corpus (operators/Retrieval).
  *
  * Float determinism: BM25's one libm call (ln) can differ in the last ulp
  * across engines, so contributions are summed in a FIXED (ascending-term)
  * fold order on both sides and the emitted score is round(·, 6); every
  * other arithmetic step is an IEEE-exact op in matched evaluation order
  * (the oracle spells k1+1 as `1.2 + 1.0` so DuckDB constant-folds to the
  * bit-identical double Scala's `lit(k1 + 1.0)` produces). */
object RankingQueries {

  val all: Seq[Q] = Seq(
    // ------------------------------------------------ BM25 ranked top-k
    // Okapi BM25 (k1=1.2, b=0.75) over the documents table for a fixed
    // 4-term query; top 25 by score, ties by doc_id. The oracle replays
    // the exact fold order (list_reduce over term-sorted contributions).
    Q(
      "bm25_topk",
      Some("""
        WITH tok AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        tokd AS (SELECT doc_id, len(toks) AS len, unnest(toks) AS token FROM tok),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf, MIN(len) AS len FROM tokd
               WHERE token IN ('agg','join','scan','shuffle') GROUP BY 1, 2),
        stats AS (SELECT COUNT(*) AS n_docs,
                         CAST(SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS tot_len
                  FROM documents),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        contrib AS (
          SELECT tf.doc_id, tf.token,
                 ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                   * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
                      (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(len AS DOUBLE) / (CAST(tot_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS contrib
          FROM tf, df, stats WHERE tf.token = df.token),
        perdoc AS (SELECT doc_id, COUNT(*) AS n_terms,
                          list_reduce(list(contrib ORDER BY token), (a, b) -> a + b) AS raw
                   FROM contrib GROUP BY doc_id)
        SELECT doc_id, n_terms, ROUND(raw, 6) AS score
        FROM perdoc ORDER BY raw DESC, doc_id LIMIT 25
      """)) { (spark, dir) =>
      Retrieval.bm25TopK(
        Tables(spark, dir).documents,
        "doc_id",
        "text",
        terms = Seq("agg", "join", "scan", "shuffle"),
        k = 25)
    },

    // --------------------------------- query likelihood (Dirichlet)
    // The language-modeling ranker beside BM25 (Zhai-Lafferty): per
    // candidate doc, Σ_t ln((tf + μ·P(t|C))/(|d| + μ)) over ALL query
    // terms — zero-tf terms contribute the smoothing mass via a
    // candidate × term frame. Each ln snaps to the 1e-12 grid; the
    // per-doc sum is exact decimal, ranked before the final round.
    Q(
      "retrieval_query_likelihood",
      Some("""
        WITH tok AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        tokd AS (SELECT doc_id, len(toks) AS len, unnest(toks) AS token FROM tok),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf, MIN(len) AS len FROM tokd
               WHERE token IN ('agg','join','scan','shuffle') GROUP BY 1, 2),
        stats AS (SELECT CAST(SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS tot_len
                  FROM documents),
        cf AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
        cand AS (SELECT doc_id, CAST(MAX(len) AS BIGINT) AS len FROM tf GROUP BY 1),
        q AS (SELECT unnest(['agg','join','scan','shuffle']) AS token),
        fr AS (SELECT cand.doc_id, cand.len, q.token, cf.cf, stats.tot_len, tf.tf
               FROM cand CROSS JOIN q JOIN cf ON cf.token = q.token CROSS JOIN stats
               LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.token = q.token),
        c AS (SELECT doc_id,
                     CAST(round(ln((CAST(COALESCE(tf, 0) AS DOUBLE)
                                    + 100.0 * (CAST(cf AS DOUBLE) / CAST(tot_len AS DOUBLE)))
                                   / (CAST(len AS DOUBLE) + 100.0)), 12) AS DECIMAL(20,12)) AS c
              FROM fr),
        pd AS (SELECT doc_id, SUM(c) AS raw FROM c GROUP BY 1)
        SELECT doc_id, CAST(round(raw, 6) AS DOUBLE) AS score
        FROM pd ORDER BY raw DESC, doc_id LIMIT 25
      """)) { (spark, dir) =>
      Retrieval.queryLikelihoodTopK(
        Tables(spark, dir).documents,
        "doc_id",
        "text",
        terms = Seq("agg", "join", "scan", "shuffle"),
        k = 25,
        mu = 100.0)
    },

    // --------------------------------------- reciprocal-rank fusion
    // Hybrid retrieval: the BM25 top-50 for the 4-term query fused with a
    // keyword-tf top-50 for 'spark' via RRF (c=60). Ranks are assigned on
    // the ROUNDED bm25 scores (ties by doc_id) so both engines rank
    // identical inputs; each 1/(60+rank) contribution is IEEE-exact and
    // the per-doc fold runs in fixed list order on both sides.
    Q(
      "retrieval_rrf_fusion",
      Some("""
        WITH tok AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        tokd AS (SELECT doc_id, len(toks) AS len, unnest(toks) AS token FROM tok),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf, MIN(len) AS len FROM tokd
               WHERE token IN ('agg','join','scan','shuffle') GROUP BY 1, 2),
        stats AS (SELECT COUNT(*) AS n_docs,
                         CAST(SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS tot_len
                  FROM documents),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        contrib AS (
          SELECT tf.doc_id, tf.token,
                 ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                   * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
                      (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(len AS DOUBLE) / (CAST(tot_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS contrib
          FROM tf, df, stats WHERE tf.token = df.token),
        perdoc AS (SELECT doc_id, list_reduce(list(contrib ORDER BY token), (a, b) -> a + b) AS raw
                   FROM contrib GROUP BY doc_id),
        bm AS (SELECT doc_id, ROUND(raw, 6) AS score FROM perdoc ORDER BY raw DESC, doc_id LIMIT 50),
        ra AS (SELECT doc_id, 0 AS lst, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bm),
        tfq AS (SELECT doc_id,
                       len(list_filter(string_split_regex(text, '\s+'), x -> x = 'spark')) AS tfs
                FROM documents),
        b0 AS (SELECT doc_id, tfs FROM tfq WHERE tfs > 0 ORDER BY tfs DESC, doc_id LIMIT 50),
        rb AS (SELECT doc_id, 1 AS lst, row_number() OVER (ORDER BY tfs DESC, doc_id) AS rnk FROM b0),
        u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb),
        f AS (SELECT doc_id, COUNT(*) AS n_lists,
                     list_reduce(list(1.0 / (60.0 + CAST(rnk AS DOUBLE)) ORDER BY lst), (a, b) -> a + b) AS raw
              FROM u GROUP BY doc_id)
        SELECT doc_id, n_lists, ROUND(raw, 6) AS rrf_score
        FROM f ORDER BY raw DESC, doc_id LIMIT 20
      """)) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(spark, dir).documents
      val bm = Retrieval.bm25TopK(
        docs, "doc_id", "text", terms = Seq("agg", "join", "scan", "shuffle"), k = 50)
      val ra = bm.select(
        col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).as("rank"))
      val tfs = size(filter(split(col("text"), "\\s+"), x => x === lit("spark")))
      val b0 = docs
        .select(col("doc_id"), tfs.as("tfs"))
        .filter(col("tfs") > 0)
        .orderBy(col("tfs").desc, col("doc_id").asc)
        .limit(50)
      val rb = b0.select(
        col("doc_id"),
        row_number().over(Window.orderBy(col("tfs").desc, col("doc_id").asc)).as("rank"))
      Retrieval.rrfFuse(Seq(ra, rb), "doc_id", "rank", k = 20)
    },

    // --------------------------------------- edit-distance fuzzy join
    // All pairs of distinct part-name words within levenshtein <= 2.
    // Engine: FastSS deletion-neighborhood blocking + exact verify (never
    // vocab x vocab); oracle: the brute-force quadratic (vocab is tiny at
    // oracle scale, so the O(V^2) replay is the point — it proves the
    // blocked join loses nothing).
    Q(
      "fuzzy_join_words",
      Some("""
        WITH w AS (SELECT DISTINCT word FROM
                     (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
                   WHERE word <> '')
        SELECT a.word AS w1, b.word AS w2, CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist
        FROM w a, w b
        WHERE a.word < b.word AND levenshtein(a.word, b.word) <= 2
      """)) { (spark, dir) =>
      val words = Tables(spark, dir).part
        .select(explode(split(col("p_name"), " ")).as("word"))
        .filter(col("word") =!= "")
      Retrieval.fuzzyWordPairs(words, "word", maxDist = 2)
    },

    // ------------------------------- Jaro-Winkler similarity scoring
    // The record-linkage agreement scorer (graft.functions.JaroWinkler, a
    // native codegen'd expression) over a combined name vocabulary —
    // semantics pinned bit-for-bit to the oracle engine's implementation
    // (verified on 80k adversarial pairs): greedy windowed matching,
    // half-transpositions, prefix boost above 0.7 only. The pair grid is
    // vocabulary-sized; at scale, blocking feeds the scorer (the
    // fellegi-sunter stance).
    Q(
      "er_jaro_winkler",
      Some("""
        WITH w AS (SELECT DISTINCT word FROM (
                     SELECT unnest(string_split(p_name, ' ')) AS word FROM part
                     UNION ALL SELECT unnest(string_split(p_type, ' ')) FROM part
                     UNION ALL SELECT n_name FROM nation
                     UNION ALL SELECT r_name FROM region
                     UNION ALL SELECT c_mktsegment FROM customer
                   ) WHERE word <> '')
        SELECT a.word AS w1, b.word AS w2,
               round(jaro_winkler_similarity(a.word, b.word), 6) AS jw
        FROM w a, w b
        WHERE a.word < b.word AND round(jaro_winkler_similarity(a.word, b.word), 6) >= 0.8
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val words = t.part.select(explode(split(col("p_name"), " ")).as("word"))
        .unionAll(t.part.select(explode(split(col("p_type"), " ")).as("word")))
        .unionAll(t.nation.select(col("n_name").as("word")))
        .unionAll(t.region.select(col("r_name").as("word")))
        .unionAll(t.customer.select(col("c_mktsegment").as("word")))
        .filter(col("word") =!= "")
        .distinct()
      words.select(col("word").as("w1"))
        .crossJoin(broadcast(words.select(col("word").as("w2"))))
        .filter(col("w1") < col("w2"))
        .select(
          col("w1"), col("w2"),
          round(
            graft.functions.JaroWinklerFunctions.jaro_winkler(col("w1"), col("w2")), 6).as("jw"))
        .filter(col("jw") >= 0.8)
    },

    // ----------------------------------- MMR diversified top-k selection
    // Maximal Marginal Relevance (Similarity.mmrSelect): relevance scoring
    // and the pool cut + pairwise sims run distributed; the k greedy picks
    // fold over the collected pool (model-bounded, the reranker-serving
    // shape). Every compared quantity sits on the 1e-9 grid with vec_id
    // tie-breaks, so the oracle replays the WHOLE selection trajectory as
    // unrolled argmax CTEs.
    Q(
      "retrieval_mmr_topk",
      Some(mmrSql(queryId = 0L, poolSize = 20, k = 8))) { (spark, dir) =>
      graft.operators.Similarity.mmrSelect(
        Tables(spark, dir).embeddings, queryId = 0L, poolSize = 20, k = 8, lambda = 0.75)
    },

    // --------------------------- Soundex blocking + Jaro-Winkler scoring
    // The classic linkage pipeline end to end: phonetic BLOCKING (American
    // Soundex — Spark's codegen'd builtin) shrinks the candidate grid to
    // same-block pairs, then the native Jaro-Winkler expression scores
    // each candidate — blocking is exactly the scale lever the JW scaladoc
    // points at. The oracle rebuilds Soundex RELATIONALLY (census rules:
    // first letter + consonant codes, vowels reset the repeat-suppression
    // state, H/W transparent via last_value IGNORE NULLS, pad/cut to 3
    // digits) — validated against the census textbook fixtures — and
    // scores with its own bit-parity JW.
    Q(
      "er_soundex_blocks",
      Some("""
        WITH words AS (SELECT DISTINCT word FROM (
                     SELECT unnest(string_split(p_name, ' ')) AS word FROM part
                     UNION ALL SELECT unnest(string_split(p_type, ' ')) FROM part
                     UNION ALL SELECT n_name FROM nation
                     UNION ALL SELECT r_name FROM region
                     UNION ALL SELECT c_mktsegment FROM customer
                   ) WHERE word <> ''),
        up AS (SELECT word, upper(regexp_replace(word, '[^A-Za-z]', '', 'g')) AS s FROM words),
        lettered AS (SELECT word, s FROM up WHERE length(s) > 0),
        pos AS (SELECT word, s, unnest(range(1, length(s) + 1)) AS i FROM lettered),
        cod AS (SELECT word, i,
                       CASE WHEN instr('BFPV', substr(s, CAST(i AS INTEGER), 1)) > 0 THEN 1
                            WHEN instr('CGJKQSXZ', substr(s, CAST(i AS INTEGER), 1)) > 0 THEN 2
                            WHEN instr('DT', substr(s, CAST(i AS INTEGER), 1)) > 0 THEN 3
                            WHEN substr(s, CAST(i AS INTEGER), 1) = 'L' THEN 4
                            WHEN instr('MN', substr(s, CAST(i AS INTEGER), 1)) > 0 THEN 5
                            WHEN substr(s, CAST(i AS INTEGER), 1) = 'R' THEN 6
                            WHEN instr('HW', substr(s, CAST(i AS INTEGER), 1)) > 0 THEN NULL
                            ELSE 0 END AS c
                FROM pos),
        eff AS (SELECT word, i, c,
                       last_value(c IGNORE NULLS) OVER (PARTITION BY word ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p
                FROM cod),
        dig AS (SELECT word, string_agg(CAST(c AS VARCHAR), '' ORDER BY i) AS d
                FROM eff WHERE i > 1 AND c >= 1 AND (p IS NULL OR p != c) GROUP BY word),
        sx AS (SELECT l.word, substr(l.s, 1, 1) || substr(COALESCE(dig.d, '') || '000', 1, 3) AS block
               FROM lettered l LEFT JOIN dig ON dig.word = l.word)
        SELECT a.word AS w1, b.word AS w2, a.block,
               round(jaro_winkler_similarity(a.word, b.word), 6) AS jw
        FROM sx a JOIN sx b ON a.block = b.block AND a.word < b.word
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val words = t.part.select(explode(split(col("p_name"), " ")).as("word"))
        .unionAll(t.part.select(explode(split(col("p_type"), " ")).as("word")))
        .unionAll(t.nation.select(col("n_name").as("word")))
        .unionAll(t.region.select(col("r_name").as("word")))
        .unionAll(t.customer.select(col("c_mktsegment").as("word")))
        .filter(col("word") =!= "")
        .distinct()
      val sx = words
        .select(col("word"), upper(regexp_replace(col("word"), "[^A-Za-z]", "")).as("s"))
        .filter(length(col("s")) > 0)
        .select(col("word"), soundex(col("s")).as("block"))
      sx.select(col("word").as("w1"), col("block"))
        .join(sx.select(col("word").as("w2"), col("block")), Seq("block"))
        .filter(col("w1") < col("w2"))
        .select(
          col("w1"), col("w2"), col("block"),
          round(
            graft.functions.JaroWinklerFunctions.jaro_winkler(col("w1"), col("w2")), 6).as("jw"))
    },

    // --------------------------------- tf-idf posting-list cosine pairs
    // Similar-document pairs WITHOUT embeddings: ln-idf-weighted term
    // vectors, one term-keyed posting self-join (Bayardo all-pairs shape),
    // terms with df > min(0.5·N, 2000) dropped — the IDF stop-word cut
    // composed with an ABSOLUTE pair-budget cap (a global fraction alone
    // under-caps shard-locally-common terms; measured quadratic on
    // decorrelated ×4 copies, SCALE.md). Norms/dots are unordered
    // SUMs inside the proven round(·, 6) envelope; tf/df/N all exact ints.
    Q(
      "tfidf_cosine_pairs",
      Some("""
        WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        nd AS (SELECT COUNT(*) AS n FROM documents),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        kept AS (SELECT tf.doc_id, tf.token, tf.tf, df.df FROM tf JOIN df ON tf.token = df.token
                 WHERE df.df <= LEAST(CAST(floor(0.5 * (SELECT n FROM nd)) AS BIGINT), 2000)),
        p AS (SELECT doc_id, token,
                     CAST(tf AS DOUBLE) * ln(CAST((SELECT n FROM nd) AS DOUBLE) / CAST(df AS DOUBLE)) AS w
              FROM kept),
        nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM p GROUP BY doc_id),
        d AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS n_shared, SUM(x.w * y.w) AS dp
              FROM p x JOIN p y ON x.token = y.token AND x.doc_id < y.doc_id GROUP BY 1, 2)
        SELECT a_id, b_id, n_shared, round(dp / (na.nrm * nb.nrm), 6) AS sim
        FROM d JOIN nrm na ON na.doc_id = d.a_id JOIN nrm nb ON nb.doc_id = d.b_id
        WHERE round(dp / (na.nrm * nb.nrm), 6) >= 0.1
      """)) { (spark, dir) =>
      Retrieval.tfidfCosinePairs(
        Tables(spark, dir).documents, "doc_id", "text", maxDfRatio = 0.5, minSim = 0.1, maxDfAbs = 2000L)
    }
  )

  /** DuckDB replay of [[graft.operators.Similarity.mmrSelect]]: pool and
    * pairwise sims on the proven round-9 cosine, then the greedy
    * trajectory UNROLLED — one argmax CTE per pick, each scoring
    * round(λ·rel9 − (1−λ)·maxsim-to-selected, 9) with the vec_id
    * tie-break, MATERIALIZED so DuckDB never re-inlines a step. */
  private def mmrSql(queryId: Long, poolSize: Int, k: Int): String = {
    val steps = (2 to k).map { j =>
      val prev = s"selu${j - 1}"
      s"""sel$j AS MATERIALIZED (
         |  SELECT p.vec_id, p.rel9,
         |         round(0.75 * p.rel9 - 0.25 * (SELECT MAX(s.sim9) FROM sim s
         |                JOIN $prev u ON s.a = p.vec_id AND s.b = u.vec_id), 9) AS score9,
         |         $j AS rank
         |  FROM pool p WHERE p.vec_id NOT IN (SELECT vec_id FROM $prev)
         |  ORDER BY score9 DESC, p.vec_id ASC LIMIT 1),
         |selu$j AS (SELECT vec_id FROM $prev UNION ALL SELECT vec_id FROM sel$j)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k).map(j => s"SELECT rank, vec_id, rel9, score9 FROM sel$j").mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $queryId),
       c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id <> $queryId),
       rel AS MATERIALIZED (SELECT vec_id, round(list_cosine_similarity(q.qv, c.cv), 9) AS rel9 FROM c, q),
       pool AS MATERIALIZED (SELECT vec_id, rel9 FROM rel ORDER BY rel9 DESC, vec_id ASC LIMIT $poolSize),
       pc AS MATERIALIZED (SELECT p.vec_id, c.cv FROM pool p JOIN c ON c.vec_id = p.vec_id),
       sim AS MATERIALIZED (SELECT x.vec_id AS a, y.vec_id AS b,
                                   round(list_cosine_similarity(x.cv, y.cv), 9) AS sim9
                            FROM pc x JOIN pc y ON x.vec_id <> y.vec_id),
       sel1 AS MATERIALIZED (SELECT vec_id, rel9, round(0.75 * rel9, 9) AS score9, 1 AS rank
                             FROM pool ORDER BY round(0.75 * rel9, 9) DESC, vec_id ASC LIMIT 1),
       selu1 AS (SELECT vec_id FROM sel1),
       $steps
       $unionAll
       ORDER BY rank"""
  }
}
