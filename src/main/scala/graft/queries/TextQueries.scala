package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Corpus, MapleJuice}
import graft.sources.Tables

/** Reference-parity text queries + the text-analysis operators a training-data
  * pipeline needs.
  *
  * Reference query library (SURVEY.md §2c): word count
  * (src/reduce_exe_word_count.go:21-34), key/value inversion
  * (src/reverse_map.go:25-42), distributed grep (claimed at README.md:17).
  * Those are implemented here both natively (declarative, codegen'd) and —
  * for word count — through the MapleJuice API itself, so the reference's own
  * dataflow path is oracle-checked end to end.
  */
object TextQueries {

  /** Tokenizer shared by every text op: split on runs of whitespace, drop
    * empties. Mirrors the reference's strings.Fields contract
    * (src/node.go:929-931). DuckDB equivalent:
    * list_filter(string_split_regex(text, '\s+'), x -> x <> ''). */
  private def tokens = filter(split(col("text"), "\\s+"), t => length(t) > 0)

  /** DuckDB oracle for quality_classifier_train: [[graft.operators.Corpus
    * .trainQualityClassifier]]'s full-batch GD unrolled (the kmeans oracle
    * discipline applied to logistic regression). Per iteration: margins in
    * plain double arithmetic over the decimal-cast features with the SAME
    * left-assoc fold, σ(m)−y rounded onto the 1e-9 grid into DECIMAL(12,9)
    * so the five gradient sums are exact decimals, then the identical
    * w − lr·(CAST(g AS DOUBLE)/n) update chain. */
  private def trainQualityOracle(iters: Int, lr: Double): String = {
    val rounds = (1 to iters)
      .map { i =>
        val p = i - 1
        s"""e$i AS (SELECT CAST(round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
                w.b + w.w1 * fd.x1d + w.w2 * fd.x2d + w.w3 * fd.x3d + w.w4 * fd.x4d
              ))) - fd.y, 9) AS DECIMAL(12,9)) AS e, fd.x1, fd.x2, fd.x3, fd.x4
            FROM fd, w$p w),
           g$i AS (SELECT sum(e) AS g0, sum(e * x1) AS g1, sum(e * x2) AS g2,
                          sum(e * x3) AS g3, sum(e * x4) AS g4 FROM e$i),
           w$i AS (SELECT w.b  - $lr * (CAST(g.g0 AS DOUBLE) / nn.n) AS b,
                          w.w1 - $lr * (CAST(g.g1 AS DOUBLE) / nn.n) AS w1,
                          w.w2 - $lr * (CAST(g.g2 AS DOUBLE) / nn.n) AS w2,
                          w.w3 - $lr * (CAST(g.g3 AS DOUBLE) / nn.n) AS w3,
                          w.w4 - $lr * (CAST(g.g4 AS DOUBLE) / nn.n) AS w4
                   FROM w$p w, g$i g, nn)"""
      }
      .mkString(",\n")
    s"""WITH f AS (SELECT CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
           CAST(round(CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE)
                      / GREATEST(LENGTH(text), 1), 9) AS DECIMAL(13,9)) AS x1,
           CAST(round(CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                      / GREATEST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')), 1), 9) AS DECIMAL(13,9)) AS x2,
           CAST(round(CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE)
                      / GREATEST(LENGTH(text), 1), 9) AS DECIMAL(13,9)) AS x3,
           CAST(round(ln(CAST(1.0 AS DOUBLE) + LENGTH(text)), 9) AS DECIMAL(13,9)) AS x4
         FROM documents),
       fd AS (SELECT y, x1, x2, x3, x4,
                CAST(x1 AS DOUBLE) AS x1d, CAST(x2 AS DOUBLE) AS x2d,
                CAST(x3 AS DOUBLE) AS x3d, CAST(x4 AS DOUBLE) AS x4d
              FROM f),
       nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM fd),
       w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS w1,
                     CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,
                     CAST(0.0 AS DOUBLE) AS w4),
       $rounds
       SELECT 'bias' AS feature, round(b, 6) AS weight FROM w$iters
       UNION ALL SELECT 'tokens_per_char', round(w1, 6) FROM w$iters
       UNION ALL SELECT 'stopword_ratio', round(w2, 6) FROM w$iters
       UNION ALL SELECT 'punct_ratio', round(w3, 6) FROM w$iters
       UNION ALL SELECT 'log_len', round(w4, 6) FROM w$iters"""
  }

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------- word count
    // Native path: explode + partial-aggregated count. At 100 TB this is
    // scan → flatMap → map-side combine → tiny shuffle; no per-word state
    // beyond the agg hashmap.
    Q(
      "wc_wordcount",
      Some("""
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
      """)) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(explode(tokens).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
    },

    // MapleJuice-API path: the same query through maple(flatMap) → shuffle →
    // juice(whole-group reduce), i.e. the reference's exact execution shape
    // (SURVEY.md §3b+3c). Deliberately NOT partial-aggregated — the juice
    // contract is an opaque whole-group function, like the reference's exe.
    Q(
      "mj_wordcount",
      Some("""
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
      """)) { (spark, dir) =>
      import spark.implicits._
      val lines = Tables(spark, dir).documents.select(col("text")).as[String]
      // numMaples > 0: the corpus is a single small file = one input split;
      // the reference's num_maples knob maps to an explicit repartition
      MapleJuice
        .run(lines, numMaples = spark.sparkContext.defaultParallelism)(
          line => line.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, "1")))(
          // reference word-count reduce = count of non-empty value lines
          // (src/reduce_exe_word_count.go:21-34), order-insensitive.
          (_, values) => values.count(_.nonEmpty).toString)
        .select(col("key").as("word"), col("value").cast("long").as("cnt"))
    },

    // Exe-UDF path: the reference's actual execution mode — an external
    // mapper process on stdin/stdout (RDD.pipe) and a `reducer <keyfile>`
    // process per group — in the oracle gate. awk tokenizes ("word 1"
    // lines, src/reverse_map.go shape); awk END{print NR} counts the value
    // file's lines (src/reduce_exe_word_count.go:21-34 semantics).
    Q(
      "mj_wordcount_exe",
      Some("""
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
      """)) { (spark, dir) =>
      import spark.implicits._
      val lines = Tables(spark, dir).documents.select(col("text")).as[String]
      // one mapper process per task — numTasks spreads the single-file scan
      val pairs = MapleJuice.mapleExe(
        lines,
        Seq("awk", "{for(i=1;i<=NF;i++) print $i\" 1\"}"),
        numTasks = spark.sparkContext.defaultParallelism)
      MapleJuice
        .juiceExe(pairs, Seq("awk", "END{print NR}"))
        .toDF("word", "cnt_str")
        .select(col("word"), col("cnt_str").cast("long").as("cnt"))
    },

    // ------------------------------------------------- key/value invert
    // The reference's reverse_map exe: read `a b` pairs, emit `b a`
    // (src/reverse_map.go:25-42). Pure projection — narrow, no shuffle.
    Q(
      "rev_kv_invert",
      Some("""
        SELECT CAST(o_custkey AS VARCHAR) AS key, CAST(o_orderkey AS VARCHAR) AS value
        FROM orders
      """)) { (spark, dir) =>
      Tables(spark, dir).orders
        .select(
          col("o_custkey").cast("string").as("key"),
          col("o_orderkey").cast("string").as("value"))
    },

    // Full reverse-web-link-graph shape: invert then group (the reference
    // composes reverse_map with a juice). Emitted as distinct (word → doc)
    // postings rather than an array column so the oracle hash is stable.
    Q(
      "inverted_index",
      Some("""
        SELECT DISTINCT word, doc_id
        FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        WHERE word <> ''
      """)) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(col("doc_id"), explode(tokens).as("word"))
        .select(col("word"), col("doc_id"))
        .distinct()
    },

    // ---------------------------------------------------- distributed grep
    // README.md:17 claims grep; no implementation survives in the reference
    // (SURVEY.md §2b). Here: predicate-pushdown-friendly rlike scan.
    Q(
      "grep_documents",
      Some("""
        SELECT doc_id, text FROM documents
        WHERE regexp_matches(text, 'join .* shuffle|window agg')
      """)) { (spark, dir) =>
      Tables(spark, dir).documents
        .filter(col("text").rlike("join .* shuffle|window agg"))
        .select(col("doc_id"), col("text"))
    },

    // -------------------------------------------- grep with file pruning
    // The 100-TB grep: a per-file token-Bloom index (analyzeGrepIndex —
    // zone maps for text) lets the scan skip every file that can't contain
    // all of the pattern's required tokens; the regex verifies survivors,
    // so the result is EXACTLY the full-scan grep's (oracle = plain regex
    // over all rows; GrepIndexSpec pins the file-skipping itself on a
    // planted fixture). Blooms have no false negatives — a matching file
    // always scans.
    // The \b anchors make the required-token claim hold by CONSTRUCTION,
    // not by fixture vocabulary: a \b-delimited run has non-word neighbors
    // (⊂ non-[a-z0-9]), so every regex match provably contains 'window'
    // and 'agg' as maximal tokenizer runs — an unanchored 'window agg'
    // would also match "rewindow aggregates", whose maximal tokens the
    // Bloom never indexed, and the prune would drop a true match.
    Q(
      "grep_pruned_documents",
      Some("""
        SELECT doc_id, text FROM documents
        WHERE regexp_matches(text, '\bwindow agg\b')
      """)) { (spark, dir) =>
      val root = java.nio.file.Files.createTempDirectory("graft-grep-idx").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable(
        "docs_g",
        Tables(spark, dir).documents.select(col("doc_id"), col("text")).repartition(8, col("doc_id")))
      cat.analyzeGrepIndex("docs_g", "text")
      cat.grepPruned("docs_g", "text", "\\bwindow agg\\b", Seq("window", "agg"))
        .select(col("doc_id"), col("text"))
    },

    // -------------------------------------------------- per-key line count
    // The reference's juice-side "count lines of the group" as a native agg.
    Q(
      "kv_event_counts",
      Some("""
        SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
      """)) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    },

    // ===================== text analysis (training-data pipeline ops) ====

    // Token / char statistics per document. BPE-ish token proxy: word pieces
    // of <= 4 chars via a sliding regex — counts only, exact integers.
    Q(
      "text_stats",
      Some("""
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
               len(regexp_extract_all(text, '[a-z]{1,4}')) AS n_bpeish
        FROM documents
      """)) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          size(tokens).as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0))).as("n_bpeish"))
    },

    // Quality scoring: ratios from exact integer counts (IEEE division of
    // exact ints is deterministic across engines).
    Q(
      "text_quality",
      Some("""
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS DOUBLE)
                 / GREATEST(LENGTH(text), 1) AS tokens_per_char,
               CAST(len(list_filter(string_split_regex(text, '\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                 / GREATEST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 1) AS stopword_ratio,
               CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE)
                 / GREATEST(LENGTH(text), 1) AS punct_ratio,
               LENGTH(text) >= 100 AND LENGTH(text) <= 20000 AS len_ok
        FROM documents
      """)) { (spark, dir) =>
      val toks      = tokens
      val stopwords = array(Seq("the", "a", "and", "of", "to").map(lit): _*)
      Tables(spark, dir).documents
        .select(
          col("doc_id"),
          (size(toks).cast("double") / greatest(length(col("text")), lit(1))).as("tokens_per_char"),
          (size(filter(toks, t => array_contains(stopwords, t))).cast("double") /
            greatest(size(toks), lit(1))).as("stopword_ratio"),
          (size(regexp_extract_all(col("text"), lit("[^a-z0-9\\s]"), lit(0))).cast("double") /
            greatest(length(col("text")), lit(1))).as("punct_ratio"),
          (length(col("text")) >= 100 && length(col("text")) <= 20000).as("len_ok"))
    },

    // Gopher quality rules (Rae et al. 2021 App. A; Corpus.gopherRules):
    // the published heuristic battery — word-count bounds, mean word
    // length, symbol/bullet/ellipsis ratios, alpha-word share, stopword
    // probe. Every rule is a RATIONAL threshold on integer counts, so each
    // flag is an integer cross-multiplication: no division, no doubles,
    // bit-exact in any engine. minWords = 5 at gate scale (the synthetic
    // docs are short; production keeps Gopher's 50).
    Q(
      "corpus_gopher_rules",
      Some("""
        WITH f AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words,
                 string_split(text, chr(10)) AS lines,
                 LENGTH(text) - LENGTH(replace(text, '#', '')) AS n_hash,
                 len(regexp_extract_all(text, '\.\.\.')) AS n_dots
          FROM documents),
        g AS (
          SELECT doc_id,
                 len(words) AS n_words,
                 COALESCE(list_sum(list_transform(words, x -> LENGTH(x))), 0) AS word_chars,
                 len(lines) AS n_lines,
                 len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS n_bullet,
                 len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS n_ellipsis,
                 len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
                 CAST(list_contains(words, 'the') AS INT) + CAST(list_contains(words, 'be') AS INT)
                   + CAST(list_contains(words, 'to') AS INT) + CAST(list_contains(words, 'of') AS INT)
                   + CAST(list_contains(words, 'and') AS INT) + CAST(list_contains(words, 'that') AS INT)
                   + CAST(list_contains(words, 'have') AS INT) + CAST(list_contains(words, 'with') AS INT) AS n_stop,
                 n_hash, n_dots
          FROM f)
        SELECT doc_id, n_words, n_lines,
               n_words BETWEEN 5 AND 100000 AS wc_ok,
               word_chars >= 3 * n_words AND word_chars <= 10 * n_words AS mwl_ok,
               (n_hash + n_dots) * 10 <= n_words AS symbol_ok,
               n_bullet * 10 <= n_lines AS bullet_ok,
               n_ellipsis * 10 <= 3 * n_lines AS ellipsis_ok,
               n_alpha * 5 >= 4 * n_words AS alpha_ok,
               n_stop >= 2 AS stop_ok,
               (n_words BETWEEN 5 AND 100000) AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
                 AND (n_hash + n_dots) * 10 <= n_words AND n_bullet * 10 <= n_lines
                 AND n_ellipsis * 10 <= 3 * n_lines AND n_alpha * 5 >= 4 * n_words
                 AND n_stop >= 2 AS gopher_pass
        FROM g
      """)) { (spark, dir) =>
      graft.operators.Corpus.gopherRules(
        Tables(spark, dir).documents, "doc_id", "text", minWords = 5)
    },

    // Flesch readability (Corpus.readability): reading-ease + FK grade
    // from integer word/sentence/vowel-group counts — the audience-level
    // stratification signal. Both formulas run in a FIXED double op order
    // from exact ints (every step correctly rounded, identical
    // cross-engine), then round(·, 6); the heuristic counts themselves
    // are bit-exact.
    Q(
      "text_readability",
      Some("""
        WITH f AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words,
                 len(list_filter(string_split_regex(text, '[.!?]+'),
                                 s -> regexp_matches(s, '[A-Za-z0-9]'))) AS raw_sents
          FROM documents),
        g AS (
          SELECT doc_id,
                 len(words) AS n_words,
                 GREATEST(raw_sents, 1) AS n_sentences,
                 CAST(COALESCE(list_sum(list_transform(words,
                   w -> GREATEST(len(regexp_extract_all(w, '[aeiouyAEIOUY]+')), 1))), 0) AS BIGINT) AS n_syllables
          FROM f)
        SELECT doc_id, n_words, n_sentences, n_syllables,
               CASE WHEN n_words > 0 THEN round(
                 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6) END AS flesch_ease,
               CASE WHEN n_words > 0 THEN round(
                 0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59, 6) END AS fk_grade
        FROM g
      """)) { (spark, dir) =>
      graft.operators.Corpus.readability(Tables(spark, dir).documents, "doc_id", "text")
    },

    // RAKE keyphrases (Corpus.rakeKeyphrases): multi-word phrases =
    // content-token runs between stopword/punctuation delimiters; word
    // score deg/freq on the 1e-9 grid, phrase score = exact decimal sum
    // over the DISTINCT phrase's words, ranked by the exact decimal
    // before the final round. Top 50 corpus-wide.
    Q(
      "text_rake_keyphrases",
      Some("""
        WITH d0 AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l FROM documents),
        toks AS (SELECT doc_id, unnest(range(1, len(l) + 1)) AS pos, unnest(l) AS token FROM d0),
        t2 AS (SELECT doc_id, pos, token,
                      (list_contains(['a','an','and','as','at','be','by','for','from','in','is','it','of','on','or','that','the','to','was','with'], token)
                       OR NOT regexp_matches(token, '[a-z0-9]')) AS is_delim
               FROM toks),
        t3 AS (SELECT doc_id, pos, token, is_delim,
                      SUM(CASE WHEN is_delim THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
               FROM t2),
        ph AS (SELECT doc_id, phrase_id, string_agg(token, ' ' ORDER BY pos) AS phrase, COUNT(*) AS len
               FROM t3 WHERE NOT is_delim GROUP BY 1, 2),
        occ AS (SELECT phrase, len, unnest(string_split(phrase, ' ')) AS word FROM ph),
        ws AS (SELECT word,
                      CAST(round(CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS DECIMAL(20,9)) AS wscore
               FROM occ GROUP BY 1),
        ps AS (SELECT phrase, CAST(SUM(wscore) AS DECIMAL(20,9)) AS raw
               FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS word
                     FROM (SELECT DISTINCT phrase FROM ph)) pw
               JOIN ws USING (word) GROUP BY 1),
        pc AS (SELECT phrase, COUNT(*) AS n_occurrences, CAST(MIN(len) AS BIGINT) AS n_words
               FROM ph GROUP BY 1)
        SELECT pc.phrase, pc.n_words, pc.n_occurrences, CAST(round(ps.raw, 6) AS DOUBLE) AS score
        FROM pc JOIN ps USING (phrase)
        ORDER BY ps.raw DESC, pc.phrase LIMIT 50
      """)) { (spark, dir) =>
      graft.operators.Corpus.rakeKeyphrases(Tables(spark, dir).documents, "doc_id", "text", k = 50)
    },

    // Isotonic probability calibration (Corpus.isotonicFit): PAV via the
    // MINIMAX characterization — iso(i) = max_{j≤i} min_{k≥i} avg(j..k)
    // over prefix-sum interval means on the observed-bin table; interval
    // means snap to the 1e-12 grid so the minimax is exact decimal
    // MIN/MAX, provably the PAV solution, bit-replayable with no
    // sequential pooling loop. Score: a deterministic [0,1) hash of
    // doc length; label: lang = 'en'.
    Q(
      "quality_isotonic_calibrate",
      Some("""
        WITH sc AS (SELECT round(CAST(n_chars % 1000 AS DOUBLE) / 1000.0, 6) AS score,
                           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                    FROM documents),
        b AS (SELECT CAST(LEAST(FLOOR(CAST(round(score, 6) AS DECIMAL(9,6)) * 20), 19) AS BIGINT) AS bin,
                     COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS s
              FROM sc GROUP BY 1),
        c AS (SELECT bin, n, s, row_number() OVER (ORDER BY bin) AS rn,
                     CAST(SUM(n) OVER w AS BIGINT) AS cn, CAST(SUM(s) OVER w AS BIGINT) AS cs
              FROM b WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        p AS (SELECT j.rn AS jr, k.rn AS kr,
                     CAST(round(CAST(k.cs - j.cs + j.s AS DOUBLE)
                                / CAST(k.cn - j.cn + j.n AS DOUBLE), 12) AS DECIMAL(20,12)) AS a
              FROM c j JOIN c k ON k.rn >= j.rn),
        mi AS (SELECT i.rn AS rn, p.jr, MIN(p.a) AS mn
               FROM c i JOIN p ON p.jr <= i.rn AND p.kr >= i.rn GROUP BY 1, 2),
        iso AS (SELECT rn, MAX(mn) AS iso12 FROM mi GROUP BY 1)
        SELECT c.bin, c.n, c.s AS pos,
               round(CAST(c.s AS DOUBLE) / CAST(c.n AS DOUBLE), 6) AS rate,
               CAST(round(iso.iso12, 6) AS DOUBLE) AS iso
        FROM c JOIN iso ON iso.rn = c.rn
      """)) { (spark, dir) =>
      val scored = Tables(spark, dir).documents
        .select(
          round((col("n_chars") % 1000).cast("double") / lit(1000.0), 6).as("score"),
          (col("lang") === "en").cast("int").as("y"))
      graft.operators.Corpus.isotonicFit(scored, "score", "y", bins = 20)
    },

    // Linear quality-classifier inference (operators/Corpus): σ(b + w·f)
    // over the four deterministic features, weights as literals — the
    // fastText-shaped filtering pass at serving time. Oracle replays the
    // exact literal chain; the ratio features are exact int/int divisions,
    // and ln/exp ulp drift is absorbed by round(·, 6).
    Q(
      "quality_classifier_score",
      Some("""
        SELECT doc_id,
               round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
                 -1.5
                 + 8.0 * (CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS DOUBLE)
                          / GREATEST(LENGTH(text), 1))
                 + 3.0 * (CAST(len(list_filter(string_split_regex(text, '\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                          / GREATEST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 1))
                 + (-4.0) * (CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE)
                          / GREATEST(LENGTH(text), 1))
                 + 0.25 * ln(CAST(1.0 AS DOUBLE) + LENGTH(text))
               ))), 6) AS quality_score
        FROM documents
      """)) { (spark, dir) =>
      graft.operators.Corpus.linearQualityScore(
        Tables(spark, dir).documents,
        "doc_id",
        "text",
        wTokensPerChar = 8.0,
        wStopwordRatio = 3.0,
        wPunctRatio = -4.0,
        wLogLen = 0.25,
        bias = -1.5)
    },

    // Unicode script composition (operators/Corpus.scriptProfile): the
    // dominant-script routing signal a multilingual crawl applies before
    // per-language models — and a spam signal when scripts mix. Literal
    // code-point ranges work identically in Java regex and RE2; every
    // ratio is an exact int/int IEEE division, so no rounding is needed.
    Q(
      "text_script_profile",
      Some("""
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS latin_ratio,
               CAST(len(regexp_extract_all(text, '[一-鿿぀-ヿ가-힯]')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS cjk_ratio,
               CAST(len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS cyrillic_ratio,
               CAST(len(regexp_extract_all(text, '[؀-ۿ]')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS arabic_ratio,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS digit_ratio,
               CAST(len(regexp_extract_all(text, '\s')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS space_ratio
        FROM documents
      """)) { (spark, dir) =>
      graft.operators.Corpus.scriptProfile(Tables(spark, dir).documents, "doc_id", "text")
    },

    // Known-key watermark detection (Corpus.watermarkDetect; Kirchenbauer
    // et al. 2023 detector side): per-doc green-pair fraction under the
    // md5-keyed green test and its one-proportion z-score vs gamma=0.25 —
    // the filter-synthetic-text gate. Human text scores z near 0 (this
    // corpus does, by construction); CorpusSpec plants a greedily
    // green-chasing generation and pins z in the tens. Row-local, zero
    // shuffle; md5 hex-threshold compare replays exactly in any engine.
    Q(
      "text_watermark_detect",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk FROM documents),
        g AS (SELECT doc_id,
                     GREATEST(len(tk) - 1, 0) AS n_scored,
                     CASE WHEN len(tk) >= 2 THEN len(list_filter(
                       list_transform(range(2, len(tk) + 1), i -> substr(md5(tk[i - 1] || chr(31) || tk[i]), 1, 16)),
                       h -> h < '4000000000000000')) ELSE 0 END AS n_green
              FROM t)
        SELECT doc_id,
               CAST(n_scored AS BIGINT) AS n_scored,
               CAST(n_green AS BIGINT) AS n_green,
               CASE WHEN n_scored > 0 THEN round(CAST(n_green AS DOUBLE) / n_scored, 6) END AS green_frac,
               CASE WHEN n_scored > 0 THEN round((CAST(n_green AS DOUBLE) - 0.25 * n_scored)
                    / sqrt(CAST(n_scored AS DOUBLE) * 0.25 * 0.75), 6) END AS z_score,
               CASE WHEN n_scored > 0 THEN round((CAST(n_green AS DOUBLE) - 0.25 * n_scored)
                    / sqrt(CAST(n_scored AS DOUBLE) * 0.25 * 0.75), 6) > 4.0 ELSE FALSE END AS is_flagged
        FROM g
      """)) { (spark, dir) =>
      Corpus.watermarkDetect(Tables(spark, dir).documents, "doc_id", "text", gamma = 0.25, zAlert = 4.0)
    },

    // Encoding-rot / mojibake audit: the ingest-side signal that catches
    // double-encoded UTF-8 (the Ã/Â continuation signature), U+FFFD
    // replacement chars a lossy transcode left behind, and stray C0
    // control bytes — each an exact char count by length-difference under
    // a global regexp strip, so the hash replays exactly (counts, no
    // floats). Row-local projection, zero shuffle, codegen'd; the same
    // shape at 100 TB. Java regex and RE2 both take \x{hh} classes;
    // DuckDB's regexp_replace needs the explicit 'g' flag to match
    // Spark's always-global semantics.
    Q(
      "text_encoding_audit",
      Some("""
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS BIGINT) AS n_non_ascii,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '\x{FFFD}', '', 'g')) AS BIGINT) AS n_replacement,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS BIGINT) AS n_control,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\x{C2}\x{C3}]', '', 'g')) AS BIGINT) AS n_mojibake,
               (LENGTH(text) - LENGTH(regexp_replace(text, '\x{FFFD}', '', 'g'))
                + LENGTH(text) - LENGTH(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'))
                + LENGTH(text) - LENGTH(regexp_replace(text, '[\x{C2}\x{C3}]', '', 'g'))) > 0 AS is_suspect
        FROM documents
      """)) { (spark, dir) =>
      def stripped(pat: String) =
        (length(col("text")) - length(regexp_replace(col("text"), pat, ""))).cast("long")
      val nRep  = stripped("\\x{FFFD}")
      val nCtl  = stripped("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")
      val nMoji = stripped("[\\x{C2}\\x{C3}]")
      Tables(spark, dir).documents.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        stripped("[^\\x00-\\x7F]").as("n_non_ascii"),
        nRep.as("n_replacement"),
        nCtl.as("n_control"),
        nMoji.as("n_mojibake"),
        (nRep + nCtl + nMoji > 0).as("is_suspect"))
    },

    // Linear quality-classifier TRAINING (operators/Corpus): full-batch
    // logistic GD over the same four features, weak labels = lang='en'
    // (the fastText-filter recipe: teach surface statistics to separate
    // the target language, then serve with linearQualityScore). 8
    // unrolled iterations, gradients on the 1e-9 decimal grid — the
    // oracle replays every margin, sigmoid, gradient sum and weight
    // update, so the learned WEIGHTS hash-match cross-engine.
    Q(
      "quality_classifier_train",
      Some(trainQualityOracle(iters = 8, lr = 0.5))) { (spark, dir) =>
      graft.operators.Corpus.trainQualityClassifier(
        Tables(spark, dir).documents,
        "doc_id",
        "text",
        label = col("lang") === "en",
        iters = 8,
        lr = 0.5)
    },

    // Cross-source calibration of the classifier scores (operators/Corpus
    // calibrateScores): within-source percent_rank, computed over the
    // bounded (source, rounded-score) aggregate instead of a whole-corpus
    // window (PARTITION BY source would sort corpus-sized slices on
    // single tasks at 100 TB). The oracle is the NAIVE window form —
    // semantics must agree exactly, including tie groups sharing a rank.
    Q(
      "quality_score_calibrate",
      Some("""
        WITH s AS (
          SELECT doc_id, source,
                 round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
                   -1.5
                   + 8.0 * (CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS DOUBLE)
                            / GREATEST(LENGTH(text), 1))
                   + 3.0 * (CAST(len(list_filter(string_split_regex(text, '\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                            / GREATEST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 1))
                   + (-4.0) * (CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE)
                            / GREATEST(LENGTH(text), 1))
                   + 0.25 * ln(CAST(1.0 AS DOUBLE) + LENGTH(text))
                 ))), 6) AS quality_score
          FROM documents)
        SELECT doc_id, source, quality_score,
               round(percent_rank() OVER (PARTITION BY source ORDER BY quality_score), 6) AS calib_rank
        FROM s
      """)) { (spark, dir) =>
      val scored = graft.operators.Corpus.linearQualityScore(
        Tables(spark, dir).documents,
        "doc_id",
        "text",
        wTokensPerChar = 8.0,
        wStopwordRatio = 3.0,
        wPunctRatio = -4.0,
        wLogLen = 0.25,
        bias = -1.5,
        keep = Seq("source"))
      graft.operators.Corpus
        .calibrateScores(scored, "source", "quality_score")
        .select(col("doc_id"), col("source"), col("quality_score"), col("calib_rank"))
    },

    // Quality-mass truncation (operators/Corpus qualityMassCut): per source,
    // keep the best docs until HALF the source's total quality mass is
    // covered — the mass-budget counterpart to the count-budget quota cap.
    // All mass arithmetic in DECIMAL(10,6) (exact, order-free), tie groups
    // indivisible; the oracle is the naive RANGE-window form over per-doc
    // scores (peer-inclusive cum minus peer-group mass = strictly-better
    // mass), which must agree exactly with the bounded-aggregate plan.
    Q(
      "corpus_quality_cut",
      Some("""
        WITH s AS (
          SELECT doc_id, source,
                 round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
                   -1.5
                   + 8.0 * (CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS DOUBLE)
                            / GREATEST(LENGTH(text), 1))
                   + 3.0 * (CAST(len(list_filter(string_split_regex(text, '\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                            / GREATEST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 1))
                   + (-4.0) * (CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE)
                            / GREATEST(LENGTH(text), 1))
                   + 0.25 * ln(CAST(1.0 AS DOUBLE) + LENGTH(text))
                 ))), 6) AS quality_score
          FROM documents),
        m AS (
          SELECT doc_id, source, quality_score,
                 SUM(CAST(quality_score AS DECIMAL(10,6))) OVER
                   (PARTITION BY source ORDER BY quality_score DESC
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl,
                 SUM(CAST(quality_score AS DECIMAL(10,6))) OVER
                   (PARTITION BY source, quality_score) AS grp_mass,
                 SUM(CAST(quality_score AS DECIMAL(10,6))) OVER
                   (PARTITION BY source) AS total
          FROM s)
        SELECT doc_id, source, quality_score
        FROM m WHERE (cum_incl - grp_mass) < total * 0.5
      """)) { (spark, dir) =>
      val scored = graft.operators.Corpus.linearQualityScore(
        Tables(spark, dir).documents,
        "doc_id",
        "text",
        wTokensPerChar = 8.0,
        wStopwordRatio = 3.0,
        wPunctRatio = -4.0,
        wLogLen = 0.25,
        bias = -1.5,
        keep = Seq("source"))
      graft.operators.Corpus
        .qualityMassCut(scored, "source", "quality_score", p = BigDecimal("0.5"))
        .select(col("doc_id"), col("source"), col("quality_score"))
    },

    // ------------------------------ weighted sampling without replacement
    // Efraimidis–Spirakis A-Res, derandomized (Corpus.weightedSample):
    // k=100 docs drawn proportional to the linear quality score — the
    // biased subsample the uniform md5-rank machinery can't express.
    // priority = round(ln(u)/w, 9) on the exact dyadic u from the
    // splitmix64(doc_id ^ seed) finalizer; the oracle replays the full
    // draw (mulmod chain, dyadic u, ln, grid snap, top-k cut).
    Q(
      "corpus_weighted_sample",
      Some {
        def mulmod(a: String, c: String): String =
          s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
             | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
             | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
        s"""
        WITH s AS (
          SELECT doc_id,
                 round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
                   -1.5
                   + 8.0 * (CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE)
                            / GREATEST(LENGTH(text), 1))
                   + 3.0 * (CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                            / GREATEST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')), 1))
                   + (-4.0) * (CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE)
                            / GREATEST(LENGTH(text), 1))
                   + 0.25 * ln(CAST(1.0 AS DOUBLE) + LENGTH(text))
                 ))), 6) AS w
          FROM documents),
        g AS (SELECT doc_id, w, xor(CAST(doc_id AS UBIGINT), 20260815::UBIGINT) AS x FROM s),
        a1 AS (SELECT doc_id, w, xor(x, x >> 30) AS a FROM g),
        a2 AS (SELECT doc_id, w, ${mulmod("a", "13787848793156543929")} AS z FROM a1),
        a3 AS (SELECT doc_id, w, xor(z, z >> 27) AS a FROM a2),
        a4 AS (SELECT doc_id, w, ${mulmod("a", "10723151780598845931")} AS z FROM a3),
        hx AS (SELECT doc_id, w, xor(z, z >> 31) AS h FROM a4),
        uu AS (SELECT doc_id, w, CAST((h >> 11) + 1 AS DOUBLE) / 9007199254740992.0 AS u FROM hx),
        pr AS (SELECT doc_id, w, round(ln(u) / w, 9) AS priority FROM uu),
        r AS (SELECT doc_id, w AS weight, priority,
                     ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rn
              FROM pr)
        SELECT doc_id, weight, priority, rn FROM r WHERE rn <= 100
      """
      }) { (spark, dir) =>
      val scored = Corpus.linearQualityScore(
        Tables(spark, dir).documents, "doc_id", "text",
        wTokensPerChar = 8.0, wStopwordRatio = 3.0, wPunctRatio = -4.0,
        wLogLen = 0.25, bias = -1.5)
      Corpus.weightedSample(scored, "doc_id", col("quality_score"), k = 100, seed = 20260815L)
    },

    // ---------------------- stratified weighted sampling (k per source)
    // Same ES draw, bounded heap PER STRATUM: the 5 best quality-weighted
    // docs per source — the biased sibling of quotaPerSource's uniform
    // per-source cut. The oracle partitions the identical priorities by
    // source.
    Q(
      "corpus_weighted_sample_stratified",
      Some {
        def mulmod(a: String, c: String): String =
          s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
             | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
             | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
        s"""
        WITH s AS (
          SELECT doc_id, source,
                 round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
                   -1.5
                   + 8.0 * (CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE)
                            / GREATEST(LENGTH(text), 1))
                   + 3.0 * (CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                            / GREATEST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')), 1))
                   + (-4.0) * (CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE)
                            / GREATEST(LENGTH(text), 1))
                   + 0.25 * ln(CAST(1.0 AS DOUBLE) + LENGTH(text))
                 ))), 6) AS w
          FROM documents),
        g AS (SELECT doc_id, source, w, xor(CAST(doc_id AS UBIGINT), 20260815::UBIGINT) AS x FROM s),
        a1 AS (SELECT doc_id, source, w, xor(x, x >> 30) AS a FROM g),
        a2 AS (SELECT doc_id, source, w, ${mulmod("a", "13787848793156543929")} AS z FROM a1),
        a3 AS (SELECT doc_id, source, w, xor(z, z >> 27) AS a FROM a2),
        a4 AS (SELECT doc_id, source, w, ${mulmod("a", "10723151780598845931")} AS z FROM a3),
        hx AS (SELECT doc_id, source, w, xor(z, z >> 31) AS h FROM a4),
        uu AS (SELECT doc_id, source, w, CAST((h >> 11) + 1 AS DOUBLE) / 9007199254740992.0 AS u FROM hx),
        pr AS (SELECT doc_id, source, w, round(ln(u) / w, 9) AS priority FROM uu),
        r AS (SELECT source, doc_id, w AS weight, priority,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority DESC, doc_id) AS rn
              FROM pr)
        SELECT source, doc_id, weight, priority, rn FROM r WHERE rn <= 5
      """
      }) { (spark, dir) =>
      val scored = Corpus.linearQualityScore(
        Tables(spark, dir).documents, "doc_id", "text",
        wTokensPerChar = 8.0, wStopwordRatio = 3.0, wPunctRatio = -4.0,
        wLogLen = 0.25, bias = -1.5, keep = Seq("source"))
      Corpus.weightedSample(scored, "doc_id", col("quality_score"), k = 5, seed = 20260815L,
        strata = Seq("source"))
    },

    // Language ID: deterministic stopword-dictionary scoring with a fixed
    // tie order. (The corpus vocabulary is language-independent, so most rows
    // score 'en' or 'und' — the operator contract is the mechanism, which at
    // scale swaps in real per-language dictionaries broadcast to executors.)
    Q(
      "text_langid",
      Some("""
        WITH scored AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(text, '\s+'), x -> list_contains(['the','a','and','of'], x))) AS s_en,
                 len(list_filter(string_split_regex(text, '\s+'), x -> list_contains(['der','die','und','das'], x))) AS s_de,
                 len(list_filter(string_split_regex(text, '\s+'), x -> list_contains(['le','la','et','les'], x))) AS s_fr,
                 len(list_filter(string_split_regex(text, '\s+'), x -> list_contains(['el','los','las','es'], x))) AS s_es
          FROM documents)
        SELECT doc_id,
               CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
                    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM scored
      """)) { (spark, dir) =>
      val toks               = tokens
      def dict(ws: String*)  = array(ws.map(lit): _*)
      def score(d: org.apache.spark.sql.Column) = size(filter(toks, t => array_contains(d, t)))
      Tables(spark, dir).documents
        .select(
          col("doc_id"),
          score(dict("the", "a", "and", "of")).as("s_en"),
          score(dict("der", "die", "und", "das")).as("s_de"),
          score(dict("le", "la", "et", "les")).as("s_fr"),
          score(dict("el", "los", "las", "es")).as("s_es"))
        .select(
          col("doc_id"),
          when(col("s_en") === 0 && col("s_de") === 0 && col("s_fr") === 0 && col("s_es") === 0, "und")
            .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
            .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
            .when(col("s_fr") >= col("s_es"), "fr")
            .otherwise("es")
            .as("lang_pred"))
    },

    // Bigram frequencies: n-gram analysis over the token stream (per-doc
    // duplicates kept — frequency, not document frequency).
    Q(
      "text_bigrams",
      Some("""
        SELECT bg, COUNT(*) AS cnt
        FROM (
          SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
          FROM (SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents)
          WHERE len(toks) >= 2)
        GROUP BY bg
      """)) { (spark, dir) =>
      val toks = tokens
      Tables(spark, dir).documents
        // small-file corpus = one input partition; spread the explode
        .transform(graft.operators.Corpus.spreadSmallInput(_, col("doc_id")))
        .filter(size(tokens) >= 2)
        .select(
          explode(
            transform(
              sequence(lit(0), size(toks) - 2),
              i => concat_ws(" ", slice(toks, i + 1, lit(2))))).as("bg"))
        .groupBy(col("bg"))
        .agg(count(lit(1)).as("cnt"))
    },

    // Mixture statistics per (source, lang): the curation report behind
    // training-data mixing — document counts, token budget, and exact-dup
    // rate per slice, one scan + one fingerprint groupBy.
    Q(
      "corpus_mixture",
      Some("""
        WITH d AS (
          SELECT source, lang,
                 len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_toks,
                 md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM documents)
        SELECT source, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
               COUNT(*) - COUNT(DISTINCT fp) AS n_exact_dups
        FROM d GROUP BY source, lang
      """)) { (spark, dir) =>
      val toks = tokens
      Tables(spark, dir).documents
        .select(
          col("source"),
          col("lang"),
          size(toks).as("n_toks"),
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"))
    },

    // Document fingerprint: md5 over whitespace-normalized lowercased text —
    // identical digests in Spark and DuckDB, usable as an exact-dedup key.
    Q(
      "text_fingerprint",
      Some("""
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM documents
      """)) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(
          col("doc_id"),
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
    },

    // Canonical normalization (Corpus.normalizeText): NFC + invisible-char
    // removal + control/space folding + collapse. The corpus is ASCII, so
    // the query PLANTS the mess deterministically — a decomposed A+combining
    // acute (NFC composes it), a zero-width space, a BEL control, double
    // no-break spaces — and both engines must land on identical cleaned
    // bytes (md5) and length. Spark side is one codegen'd projection
    // (NfcNormalize expression — no UDF); DuckDB replays via nfc_normalize.
    Q(
      "text_normalize",
      Some("""
        WITH m AS (
          SELECT doc_id,
                 'A' || chr(769) || chr(8203) || chr(7) || text || chr(160) || chr(160) || ' end' AS messy
          FROM documents),
        n AS (SELECT doc_id, nfc_normalize(messy) AS s FROM m),
        i AS (SELECT doc_id, regexp_replace(s, '[' || chr(8203) || chr(8204) || chr(8205) || chr(8288) || chr(65279) || chr(173) || ']', '', 'g') AS s FROM n),
        c AS (SELECT doc_id, regexp_replace(s, '[\p{Cc}\p{Zs}]', ' ', 'g') AS s FROM i),
        f AS (SELECT doc_id, trim(regexp_replace(s, ' +', ' ', 'g')) AS s FROM c)
        SELECT doc_id, length(s) AS n_clean, md5(s) AS fp FROM f
      """)) { (spark, dir) =>
      val messy = concat(
        lit("A\u0301\u200B\u0007"),
        col("text"),
        lit("\u00A0\u00A0 end"))
      val clean = Corpus.normalizeText(messy)
      Tables(spark, dir).documents
        .select(col("doc_id"), length(clean).as("n_clean"), md5(clean).as("fp"))
    },

    // Compression-ratio quality signal (Corpus.deflateRatio): zlib-deflate
    // at fixed level 6 raw, deflated/raw bytes — planted-fixture oracle
    // below (text_compression_ratio); data-sized SQL-replayable proxy in
    // text_kgram_economy.
    // Heaps-law vocabulary growth: V(N) at 10 document checkpoints in
    // doc-id order — the duplication/encoding-rot curve. Exact integers;
    // the oracle replays first-occurrence docs + the doc-level cumulative
    // window.
    Q(
      "corpus_vocab_growth",
      Some("""
        WITH tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
                    FROM documents),
        pd AS (SELECT doc_id, COUNT(*) AS n_toks FROM tk GROUP BY 1),
        fo AS (SELECT token, MIN(doc_id) AS doc_id FROM tk GROUP BY 1),
        np AS (SELECT doc_id, COUNT(*) AS n_new FROM fo GROUP BY 1),
        cum AS (SELECT row_number() OVER (ORDER BY pd.doc_id) AS docs_seen,
                       SUM(pd.n_toks) OVER (ORDER BY pd.doc_id ROWS UNBOUNDED PRECEDING) AS tokens_seen,
                       SUM(COALESCE(np.n_new, 0)) OVER (ORDER BY pd.doc_id ROWS UNBOUNDED PRECEDING) AS vocab_size
                FROM pd LEFT JOIN np ON np.doc_id = pd.doc_id),
        n AS (SELECT COUNT(*) AS nd FROM documents)
        SELECT docs_seen, CAST(tokens_seen AS BIGINT) AS tokens_seen, CAST(vocab_size AS BIGINT) AS vocab_size
        FROM cum, n
        WHERE docs_seen IN (SELECT (i * nd) // 10 FROM (SELECT unnest(range(1, 11)) AS i), n WHERE (i * nd) // 10 >= 1)
      """)) { (spark, dir) =>
      Corpus.vocabGrowth(Tables(spark, dir).documents, "doc_id", "text", points = 10)
    },

    // Compression-ratio gate: zlib-deflate is not expressible in any SQL
    // oracle, so the gate row pins PLANTED payloads whose exact deflate
    // byte counts were precomputed with an independent zlib (python 3,
    // zlib 1.2.13 — byte-identical to the JDK's bundled zlib at level 6
    // raw across the whole fixture; see CorpusSpec). The payloads span the
    // behaviors that make the signal a quality filter: natural prose in
    // the middle, spam/run/boilerplate compressing to almost nothing,
    // hex noise stuck near its 4-bits-per-char floor, multibyte UTF-8
    // counted in bytes not chars, and the empty-input ratio=1.0 contract.
    // Data-sized compressibility over `documents` stays gated via the
    // SQL-replayable k-gram economy proxy (text_kgram_economy) and the
    // CorpusSpec property pins (rep4 separation, determinism).
    Q(
      "text_compression_ratio",
      Some("""
        SELECT pid, n_raw, n_deflate, ratio FROM (VALUES
          ('p1_hello',   CAST(11   AS BIGINT), CAST(13  AS BIGINT), CAST(1.181818 AS DOUBLE)),
          ('p2_prose',   CAST(160  AS BIGINT), CAST(123 AS BIGINT), CAST(0.76875  AS DOUBLE)),
          ('p3_spam',    CAST(1000 AS BIGINT), CAST(15  AS BIGINT), CAST(0.015    AS DOUBLE)),
          ('p4_run',     CAST(1000 AS BIGINT), CAST(11  AS BIGINT), CAST(0.011    AS DOUBLE)),
          ('p5_hex',     CAST(256  AS BIGINT), CAST(152 AS BIGINT), CAST(0.59375  AS DOUBLE)),
          ('p6_unicode', CAST(620  AS BIGINT), CAST(42  AS BIGINT), CAST(0.067742 AS DOUBLE)),
          ('p7_empty',   CAST(0    AS BIGINT), CAST(2   AS BIGINT), CAST(1.0      AS DOUBLE)),
          ('p8_json',    CAST(750  AS BIGINT), CAST(24  AS BIGINT), CAST(0.032    AS DOUBLE))
        ) AS t(pid, n_raw, n_deflate, ratio)
      """)) { (spark, dir) =>
      import spark.implicits._
      val hexNoise = // md5("g0") || md5("g1") || ... || md5("g7"): looks random, ~0.59 floor
        "8ac829e3bb8338d74cfb45ebe834d8e10120a4f9196a5f9eb9f523f31f914da7" +
          "e1c80488853d86ab9d6decfe30d8930f8a9fd7dfda802921fdc4079f9a528ce8" +
          "b0b5c8f28ad7834e70a958a8882fa59a37c965a8d6d7bec292c7b11ff315d9ea" +
          "4a4314ef967aad20a9e7c423bc16e39c727bb92f57c3951d11695a52c92c2b0c"
      val planted = Seq(
        ("p1_hello", "hello world"),
        (
          "p2_prose",
          "The quick brown fox jumps over the lazy dog. Pack my box with five dozen " +
            "liquor jugs. How vexingly quick daft zebras jump! Sphinx of black quartz, judge my vow."),
        ("p3_spam", "spam " * 200),
        ("p4_run", "a" * 1000),
        ("p5_hex", hexNoise),
        // "héllo wörld ünïcode ™✓ " — escapes keep the payload
        // identical regardless of the compiler's platform charset.
        ("p6_unicode", "h\u00e9llo w\u00f6rld \u00fcn\u00efcode \u2122\u2713 " * 20),
        ("p7_empty", ""),
        ("p8_json", "{\"k\":\"v\",\"n\":1}" * 50)
      ).toDF("pid", "payload")
      planted.select(
        col("pid"),
        octet_length(col("payload")).cast("long").as("n_raw"),
        Corpus.deflateBytes(col("payload")).as("n_deflate"),
        round(Corpus.deflateRatio(col("payload")), 6).as("ratio"))
    },

    // Data-sized compressibility proxy that IS SQL-replayable: character
    // 4-gram token economy (distinct/total — the dictionary-coder intuition
    // behind LZ: repeated substrings mean fewer distinct grams per emitted
    // gram). Exact integers plus one IEEE division, so the hash is
    // bit-stable across engines. Docs shorter than 4 chars define
    // economy=1.0 (nothing to compress). Row-local projection, zero
    // shuffle — the same scaling shape as the deflate signal it proxies.
    Q(
      "text_kgram_economy",
      Some("""
        SELECT doc_id,
               CAST(len(g) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
               CASE WHEN len(g) > 0
                    THEN CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
                    ELSE CAST(1.0 AS DOUBLE) END AS economy
        FROM (SELECT doc_id,
                     CASE WHEN length(text) >= 4
                          THEN list_transform(range(1, length(text) - 2), i -> substr(text, i, 4))
                          ELSE CAST([] AS VARCHAR[]) END AS g
              FROM documents)
      """)) { (spark, dir) =>
      val grams = expr(
        """CASE WHEN char_length(text) >= 4
                THEN transform(sequence(1, char_length(text) - 3), i -> substring(text, i, 4))
                ELSE CAST(array() AS ARRAY<STRING>) END""")
      Tables(spark, dir).documents
        .withColumn("g", grams)
        .select(
          col("doc_id"),
          size(col("g")).cast("long").as("n_grams"),
          size(array_distinct(col("g"))).cast("long").as("n_distinct"),
          when(size(col("g")) > 0, size(array_distinct(col("g"))).cast("double") / size(col("g")))
            .otherwise(lit(1.0))
            .as("economy"))
    },

    // Gopher-style repetition signals (Rae et al. 2021 App. A): duplicate
    // token/bigram fractions plus the most-frequent-token share — the
    // filters that cut boilerplate/spam before training. Ratios are IEEE
    // divisions of exact integer counts — bit-identical across engines.
    Q(
      "text_repetition",
      Some("""
        WITH b AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
          FROM documents),
        r AS (
          SELECT doc_id,
                 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_token_frac,
                 CASE WHEN len(toks) >= 2
                      THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) / (len(toks) - 1)
                      ELSE 0.0 END AS dup_bigram_frac
          FROM b WHERE len(toks) > 0),
        tc AS (
          SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_token_frac FROM (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM b) GROUP BY 1, 2)
          GROUP BY doc_id)
        SELECT r.doc_id, dup_token_frac, dup_bigram_frac, top_token_frac
        FROM r JOIN tc ON tc.doc_id = r.doc_id
      """)) { (spark, dir) =>
      Corpus.repetitionSignals(Tables(spark, dir).documents, "doc_id", "text")
    },

    // Tokenizer-training vocabulary: top-20 tokens by corpus frequency with
    // a deterministic tie-break (count desc, token asc) so both engines rank
    // identically. K=20 < the synthetic corpus's distinct-token count, so
    // the cut is exercised and oov_rate below is non-trivial.
    Q(
      "vocab_topk",
      Some("""
        WITH tok AS (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
          FROM documents),
        c AS (SELECT token, COUNT(*) AS n_occurrences FROM tok GROUP BY token)
        SELECT token, n_occurrences, rank FROM (
          SELECT token, n_occurrences,
                 ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS rank
          FROM c)
        WHERE rank <= 20
      """)) { (spark, dir) =>
      Corpus.vocabulary(Tables(spark, dir).documents, "doc_id", "text", topK = 20)
    },

    // Per-document out-of-vocabulary rate against that top-20 vocabulary —
    // vocab side broadcast, corpus side one keyed shuffle.
    Q(
      "oov_rate",
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
          FROM documents),
        c AS (SELECT token, COUNT(*) AS n_occurrences FROM tok GROUP BY token),
        v AS (SELECT token FROM (
                SELECT token, ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS rank FROM c)
              WHERE rank <= 20)
        SELECT tok.doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_frac
        FROM tok LEFT JOIN v ON tok.token = v.token
        GROUP BY tok.doc_id
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      Corpus.oovRate(docs, "doc_id", "text", Corpus.vocabulary(docs, "doc_id", "text", topK = 20))
    },

    // PII / identifier scrubbing: rule-list regex redaction with audit
    // counts, over a ticket-shaped text synthesized from real customer
    // columns (the corpus has no digits — customer names/balances do).
    // Redacting the numeric token also erases any cross-engine float-
    // formatting difference BEFORE the hash compare; the counts prove the
    // patterns fired. RE2-compatible patterns only (see Corpus.scrub).
    Q(
      "pii_scrub",
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 c_name || ' balance ' || CAST(c_acctbal AS VARCHAR) || ' segment ' || c_mktsegment AS ticket
          FROM customer)
        SELECT c_custkey,
               regexp_replace(regexp_replace(ticket, 'Customer#[0-9]+', '[ID]', 'g'), '-?[0-9]+\.[0-9]+', '[NUM]', 'g') AS scrubbed,
               len(regexp_extract_all(ticket, 'Customer#[0-9]+')) AS n_ids,
               len(regexp_extract_all(ticket, '-?[0-9]+\.[0-9]+')) AS n_nums
        FROM t
      """)) { (spark, dir) =>
      val ticket = concat(
        col("c_name"), lit(" balance "), col("c_acctbal").cast("string"),
        lit(" segment "), col("c_mktsegment"))
      Tables(spark, dir).customer
        .select(col("c_custkey"), ticket.as("ticket"))
        .select(
          col("c_custkey"),
          Corpus
            .scrub(col("ticket"), Seq("Customer#[0-9]+" -> "[ID]", "-?[0-9]+\\.[0-9]+" -> "[NUM]"))
            .as("scrubbed"),
          Corpus.matchCount(col("ticket"), "Customer#[0-9]+").as("n_ids"),
          Corpus.matchCount(col("ticket"), "-?[0-9]+\\.[0-9]+").as("n_nums"))
    },

    // Character-level Shannon entropy — the gibberish/boilerplate quality
    // signal (CCNet-style gates threshold on it). Both engines fold
    // c·log2(c) in ascending char order (never an unordered SUM of
    // doubles) and emit round(·, 6); counts are exact ints. Zero-length
    // docs emit nothing on either side.
    Q(
      "text_entropy",
      Some("""
        WITH pos AS (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents),
        cnt AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch, COUNT(*) AS c FROM pos GROUP BY 1, 2),
        agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars, COUNT(*) AS distinct_chars,
                       list_reduce(list(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)) ORDER BY ch), (a, b) -> a + b) AS s
                FROM cnt GROUP BY doc_id)
        SELECT doc_id, n_chars, distinct_chars,
               ROUND(log2(CAST(n_chars AS DOUBLE)) - s / CAST(n_chars AS DOUBLE), 6) AS entropy_bits
        FROM agg
      """)) { (spark, dir) =>
      Corpus.charEntropy(Tables(spark, dir).documents, "doc_id", "text")
    },

    // Real BPE subword tokenization (operators/Bpe): the distributed
    // trainer (pair counting on executors, one-row argmax per merge, native
    // left-fold merge application) with an 8-merge budget, then the
    // broadcast-ranks encode with per-partition word memoization. The
    // oracle replays TRAINING ITSELF as 8 unrolled merge rounds (weighted
    // pair counts → count-desc/pair-asc argmax → gaps-and-islands
    // left-to-right non-overlapping merge application) and ENCODING as 8
    // unrolled lowest-rank-first steps (word+EOW ≤ 9 symbols at every SF,
    // so 8 single-merge steps reach the fixpoint) — the wordpiece_encode
    // discipline, now covering the merge-learning loop too. BpeSpec pins
    // trainDistributed ≡ driver train merge-for-merge.
    Q("bpe_token_count", Some(bpeSql(8, 8))) { (spark, dir) =>
      val docs  = Tables(spark, dir).documents
      val model = Bpe.trainDistributed(docs, "text", numMerges = 8)
      Bpe.tokenCounts(docs, "doc_id", "text", model)
    },

    // Tokenizer fertility by language — the multilingual tokenizer-health
    // audit (a vocab trained on the wrong mix shows fertility blowing up
    // on the under-served language; chars-per-token is the compression
    // twin). Pure rollup of the SAME distributed BPE train+encode the
    // token-count gate replays, grouped by lang: exact integer sums, two
    // rounded divisions. Adds nothing data-sized beyond bpe_token_count.
    Q("bpe_fertility_by_lang", Some(bpeFertilitySql(8, 8))) { (spark, dir) =>
      val docs   = Tables(spark, dir).documents
      val model  = Bpe.trainDistributed(docs, "text", numMerges = 8)
      val counts = Bpe.tokenCounts(docs, "doc_id", "text", model)
      docs
        .select(col("doc_id"), col("lang"), length(col("text")).cast("long").as("nc"))
        .join(counts, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(col("n_words"), lit(0L))).as("n_words"),
          sum(coalesce(col("n_bpe_tokens"), lit(0L))).as("n_bpe_tokens"),
          sum(col("nc")).as("n_chars"),
          round(
            sum(coalesce(col("n_bpe_tokens"), lit(0L))).cast("double") /
              sum(coalesce(col("n_words"), lit(0L))), 6).as("fertility"),
          round(
            sum(col("nc")).cast("double") /
              sum(coalesce(col("n_bpe_tokens"), lit(0L))), 6).as("chars_per_token"))
    },

    // ------------------------------------- end-to-end curation pipeline
    // The composed run a real user executes FIRST: plant chrome + unicode
    // mess → lineDedup (boilerplate lines out) → normalizeText (NFC,
    // invisible strip, control/space fold) → cutSpans (8-grams in >=2 docs
    // cut, Lee et al. 2022) → decontam vs the held-out doc_id%100 slice
    // (any shared 4-gram quarantines the doc) → linear quality gate
    // (score >= 0.5; fully-cut empty docs score 0.18 and drop here) →
    // distributed BPE trained ON THE SURVIVING corpus, per-doc token
    // counts. Every stage is an individually hash-proven oracle; this row
    // pins the COMPOSITION — column contracts, fan-out checkpoints, plan
    // depth — as one query. encSteps=9 because the planted 'Á' prefix
    // glues one extra char onto the first content token (max word 9 chars
    // at every SF, probed).
    Q(
      "corpus_e2e_pipeline",
      Some {
        val pipeline = """
        m AS (
          SELECT doc_id, source,
                 'ACCEPT COOKIES TO CONTINUE' || chr(10) || 'A' || chr(769) || chr(8203) || text || chr(10) ||
                 'nav: ' || source || chr(10) || '(c) example.com all rights reserved' AS t
          FROM documents),
        e AS (
          SELECT doc_id, unnest(range(1, len(string_split(t, chr(10))) + 1)) AS pos,
                 unnest(string_split(t, chr(10))) AS line
          FROM m),
        ne AS (SELECT * FROM e WHERE length(trim(line)) > 0),
        ldf AS (SELECT line, COUNT(DISTINCT doc_id) AS line_df FROM ne GROUP BY line),
        keepl AS (SELECT ne.doc_id, ne.pos, ne.line FROM ne JOIN ldf USING (line) WHERE ldf.line_df < 10),
        r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t FROM keepl GROUP BY doc_id),
        nn AS (SELECT doc_id, nfc_normalize(t) AS s FROM r),
        ii AS (SELECT doc_id, regexp_replace(s, '[' || chr(8203) || chr(8204) || chr(8205) || chr(8288) || chr(65279) || chr(173) || ']', '', 'g') AS s FROM nn),
        cc AS (SELECT doc_id, regexp_replace(s, '[\p{Cc}\p{Zs}]', ' ', 'g') AS s FROM ii),
        norm AS (SELECT doc_id, trim(regexp_replace(s, ' +', ' ', 'g')) AS s FROM cc),
        tt AS (SELECT doc_id, list_filter(string_split_regex(s, '\s+'), x -> x <> '') AS toks FROM norm),
        t1 AS (SELECT doc_id, toks FROM tt WHERE len(toks) >= 1),
        g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6), i -> {'gpos': i, 'gram': array_to_string(toks[i:i+7], ' ')})) AS u
               FROM t1 WHERE len(toks) >= 8),
        g AS (SELECT doc_id, u.gpos AS gpos, u.gram AS gram FROM g0),
        flagged AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
        cov0 AS (SELECT doc_id, unnest(range(gpos, gpos + 8)) AS pos FROM g JOIN flagged USING (gram)),
        cov AS (SELECT DISTINCT doc_id, pos FROM cov0),
        tok AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1), i -> {'pos': i, 'token': toks[i]})) AS u FROM t1),
        tk AS (SELECT doc_id, u.pos AS pos, u.token AS token FROM tok),
        cut AS (SELECT tk.doc_id,
                COALESCE(array_to_string(list(tk.token ORDER BY tk.pos) FILTER (WHERE cov.pos IS NULL), ' '), '') AS s
                FROM tk LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.pos = tk.pos
                GROUP BY tk.doc_id),
        evt AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents WHERE doc_id % 100 = 0),
        evg AS (SELECT DISTINCT gram FROM (
                SELECT unnest(list_transform(range(1, len(toks) - 2), i -> array_to_string(toks[i:i+3], ' '))) AS gram
                FROM evt WHERE len(toks) >= 4)),
        trt AS (SELECT doc_id, s FROM cut WHERE doc_id % 100 <> 0),
        trg AS (SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id, unnest(list_transform(range(1, len(list_filter(string_split_regex(s, '\s+'), x -> x <> '')) - 2),
                                      i -> array_to_string(list_filter(string_split_regex(s, '\s+'), x -> x <> '')[i:i+3], ' '))) AS gram
                FROM trt WHERE len(list_filter(string_split_regex(s, '\s+'), x -> x <> '')) >= 4)),
        ov AS (SELECT trg.doc_id, COUNT(*) AS n_shared FROM trg JOIN evg USING (gram) GROUP BY 1),
        surv AS (SELECT trt.doc_id, trt.s FROM trt LEFT JOIN ov ON ov.doc_id = trt.doc_id WHERE ov.doc_id IS NULL),
        scored AS (
          SELECT doc_id, s,
                 round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
                   -1.5
                   + 8.0 * (CAST(len(list_filter(string_split_regex(s, '\s+'), x -> x <> '')) AS DOUBLE) / GREATEST(LENGTH(s), 1))
                   + 3.0 * (CAST(len(list_filter(string_split_regex(s, '\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                            / GREATEST(len(list_filter(string_split_regex(s, '\s+'), x -> x <> '')), 1))
                   + (-4.0) * (CAST(len(regexp_extract_all(s, '[^a-z0-9\s]')) AS DOUBLE) / GREATEST(LENGTH(s), 1))
                   + 0.25 * ln(CAST(1.0 AS DOUBLE) + LENGTH(s))
                 ))), 6) AS quality_score
          FROM surv),
        final AS (SELECT doc_id, s, quality_score FROM scored WHERE quality_score >= 0.5),
        final2 AS (SELECT doc_id, s AS text FROM final),
        """
        "WITH " + pipeline + bpeCtes(8, 9, "final2") + """
        SELECT f.doc_id,
               CAST(length(f.s) AS BIGINT) AS n_chars,
               f.quality_score,
               COALESCE(agg.n_words, 0) AS n_words,
               COALESCE(agg.n_bpe_tokens, 0) AS n_bpe_tokens
        FROM final f LEFT JOIN agg ON agg.doc_id = f.doc_id
        """
      }) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      val messy = docs.select(
        col("doc_id"),
        concat(
          lit("ACCEPT COOKIES TO CONTINUE\n"),
          lit("A\u0301\u200B"), col("text"),
          lit("\nnav: "), col("source"),
          lit("\n(c) example.com all rights reserved")).as("text"))
      val lined = Corpus.lineDedup(messy, "doc_id", "text", minDf = 10)
      val norm  = lined.select(col("doc_id"), Corpus.normalizeText(col("text")).as("text"))
      // cut fans out three ways (decontam grams, scoring, BPE) — checkpoint
      // once so the whole upstream chain runs once, not per consumer
      val cut = Corpus.cutSpans(norm, "doc_id", "text", n = 8, minDocs = 2)
        .select(col("doc_id"), col("clean_text").as("text"))
        .localCheckpoint(true)
      val train        = cut.filter(col("doc_id") % 100 =!= 0)
      val evalDocs     = docs.filter(col("doc_id") % 100 === 0)
      val contaminated = Corpus.evalOverlap(train, evalDocs, "doc_id", "text", n = 4)
      val surv         = train.join(contaminated, Seq("doc_id"), "left_anti")
      val scored = Corpus.linearQualityScore(
        surv, "doc_id", "text",
        wTokensPerChar = 8.0, wStopwordRatio = 3.0, wPunctRatio = -4.0,
        wLogLen = 0.25, bias = -1.5, keep = Seq("text"))
      val fin = scored.filter(col("quality_score") >= 0.5).localCheckpoint(true)
      val model  = Bpe.trainDistributed(fin, "text", numMerges = 8)
      val counts = Bpe.tokenCounts(fin, "doc_id", "text", model)
      fin
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"), col("quality_score"))
        .join(counts, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("n_chars"), col("quality_score"),
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
    },

    // ------------------------------------------- HTML → text extraction
    // The WET-style main-content extraction step every web-scraped corpus
    // runs before any quality/dedup pass: drop style/script blocks, strip
    // tags, decode entities, collapse whitespace. The markup is planted
    // in-query (deterministic scaffold around each doc) so the extraction
    // chain is exercised against known boilerplate and the oracle replays
    // the identical chain. Every step is a codegen'd string expression on
    // a narrow projection — zero exchanges, scan-parallel at 100 TB. The
    // regex dialect subset used ('<[^>]*>', non-greedy (?s) block strip)
    // means the same thing in Java regex and RE2.
    Q(
      "text_html_extract",
      Some("""
        WITH raw AS (
          SELECT doc_id,
                 '<html><head><title>Doc</title><style>p { color: red; }</style></head><body><p class="main">'
                 || text || '</p><div id="nav">&lt;nav&gt; &amp; footer</div></body></html>' AS page
          FROM documents),
        stripped AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(page, '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                                '<[^>]*>', ' ', 'g') AS s
          FROM raw)
        SELECT doc_id,
               trim(regexp_replace(
                 replace(replace(replace(replace(replace(s,
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                 '[ \t\n\r]+', ' ', 'g')) AS clean,
               length(trim(regexp_replace(
                 replace(replace(replace(replace(replace(s,
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                 '[ \t\n\r]+', ' ', 'g'))) AS n_chars_clean
        FROM stripped
      """)) { (spark, dir) =>
      val page = concat(
        lit("<html><head><title>Doc</title><style>p { color: red; }</style></head><body><p class=\"main\">"),
        col("text"),
        lit("</p><div id=\"nav\">&lt;nav&gt; &amp; footer</div></body></html>"))
      val stripped = regexp_replace(
        regexp_replace(page, "(?s)<style[^>]*>.*?</style>", " "),
        "<[^>]*>", " ")
      val decoded = regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(stripped, "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&amp;", "&")
      val clean = trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
      Tables(spark, dir).documents
        .select(col("doc_id"), clean.as("clean"), length(clean).as("n_chars_clean"))
    },

    // ------------------------------------------------ PMI collocations
    // Phrase mining: adjacent-bigram pointwise mutual information
    // (Church & Hanks 1990) with a min-count cut — counts exact ints, one
    // ln over a matched-order ratio chain, round(·, 6).
    Q(
      "text_pmi_collocations",
      Some("""
        WITH tok AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        uni AS (SELECT word, COUNT(*) AS c1 FROM (SELECT unnest(toks) AS word FROM tok) GROUP BY word),
        ut AS (SELECT CAST(SUM(c1) AS BIGINT) AS u FROM uni),
        bi AS (SELECT w1, w2, COUNT(*) AS n_xy FROM (
                 SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                        unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS w2
                 FROM tok WHERE len(toks) >= 2)
               GROUP BY w1, w2 HAVING COUNT(*) >= 5),
        bt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM (
                 SELECT len(toks) - 1 AS cnt FROM tok WHERE len(toks) >= 2))
        SELECT bi.w1, bi.w2, bi.n_xy,
               round(ln((CAST(bi.n_xy AS DOUBLE) * CAST(ut.u AS DOUBLE) * CAST(ut.u AS DOUBLE)) /
                        (CAST(bt.t AS DOUBLE) * CAST(ux.c1 AS DOUBLE) * CAST(uy.c1 AS DOUBLE))), 6) AS pmi
        FROM bi JOIN uni ux ON ux.word = bi.w1 JOIN uni uy ON uy.word = bi.w2, ut, bt
      """)) { (spark, dir) =>
      graft.operators.LanguageModel.pmiCollocations(
        Tables(spark, dir).documents, "doc_id", "text", minCount = 5L)
    },

    // ----------------------------------- Naive Bayes language classifier
    // The LEARNED sibling of text_langid's heuristic scorer: multinomial
    // NB trained in-engine on (lang → token counts), served as one
    // broadcast-model scoring pass. Decimal-exact scores (each ln rounded
    // to 1e-12 then DECIMAL — the lm_bigram discipline), so the argmax
    // can never flip on float summation order.
    Q(
      "nb_lang_classify",
      Some(nbScoresSql + """
        SELECT doc_id, cls AS predicted, CAST(ROUND(s, 9) AS DOUBLE) AS score
        FROM (SELECT doc_id, cls, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, cls) AS rk FROM sc)
        WHERE rk = 1
      """)) { (spark, dir) =>
      val d = Tables(spark, dir).documents
      graft.operators.LanguageModel.naiveBayesClassify(d, d, "doc_id", "text", "lang")
    },

    // The held-in confusion matrix for the same model — the eval artifact
    // a curation pipeline reads before trusting the classifier's routing:
    // (actual, predicted, n_docs), all-integer.
    Q(
      "nb_lang_confusion",
      Some(nbScoresSql + """,
        pred AS (SELECT doc_id, cls AS predicted
                 FROM (SELECT doc_id, cls, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, cls) AS rk FROM sc)
                 WHERE rk = 1)
        SELECT d.lang AS actual, p.predicted, COUNT(*) AS n_docs
        FROM pred p JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY d.lang, p.predicted
      """)) { (spark, dir) =>
      val d = Tables(spark, dir).documents
      graft.operators.LanguageModel
        .naiveBayesClassify(d, d, "doc_id", "text", "lang")
        .join(d.select(col("doc_id"), col("lang").as("actual")), Seq("doc_id"))
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // --------------------------------------------- C4 blocklist filter
    // Raffel et al. 2020-style bad-word filtering as a ratio gate: a
    // zero-shuffle narrow projection flagging each doc's blocked-token
    // count against a literal word set; keep = blocked_ratio <= 0.05 with
    // the ratio rounded to the 1e-9 grid before the compare, so the gate
    // is engine-exact.
    Q(
      "corpus_blocklist_filter",
      Some("""
        WITH tok AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks, t -> list_contains(['drop', 'null', 'slow'], t))) AS BIGINT) AS n_blocked,
               round(CASE WHEN len(toks) > 0
                          THEN CAST(len(list_filter(toks, t -> list_contains(['drop', 'null', 'slow'], t))) AS DOUBLE)
                               / CAST(len(toks) AS DOUBLE)
                          ELSE 0.0 END, 9) AS blocked_ratio,
               round(CASE WHEN len(toks) > 0
                          THEN CAST(len(list_filter(toks, t -> list_contains(['drop', 'null', 'slow'], t))) AS DOUBLE)
                               / CAST(len(toks) AS DOUBLE)
                          ELSE 0.0 END, 9) <= 0.05 AS keep
        FROM tok
      """)) { (spark, dir) =>
      graft.operators.Corpus.blocklistFilter(
        Tables(spark, dir).documents, "doc_id", "text",
        blocklist = Seq("drop", "null", "slow"), maxRatio = 0.05)
    },

    // ------------------------------------------------ feature hashing
    // Vocabulary-free fixed-dim bag-of-words (the hashing trick,
    // Weinberger ICML'09): bucket = portable_hash64(token) & 31, ±1 sign
    // from hash bit 40 so collisions cancel in expectation. Stateless —
    // any engine/batch featurizes identically, which the oracle proves by
    // replaying the roll∘mix64 chain in HUGEINT arithmetic (the DSIR
    // discipline). All-integer output.
    Q(
      "text_hashed_features",
      Some("""
        WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok FROM documents),
        dt AS (SELECT DISTINCT tok AS gram FROM tok),
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
        hmap AS (SELECT gram, xor(z2, z2 >> 31) AS h FROM mix2),
        bmap AS (SELECT gram, CAST(h & 31 AS BIGINT) AS bucket,
                        CASE WHEN (h >> 40) & 1 = 1 THEN 1 ELSE -1 END AS sign FROM hmap)
        SELECT t.doc_id, b.bucket, CAST(SUM(b.sign) AS BIGINT) AS value
        FROM tok t JOIN bmap b ON b.gram = t.tok GROUP BY 1, 2
      """)) { (spark, dir) =>
      graft.operators.Corpus.hashedFeatures(Tables(spark, dir).documents, "doc_id", "text", dim = 32)
    },

    // ------------------------------------------------- Zipf-law fit
    // OLS of ln(freq) on ln(rank) over the word-frequency table — corpus
    // health in one number (natural language ≈ −1; template floods
    // flatten it). ln values land on the 1e-12 decimal grid before the
    // moments (exact sums), moments round to scale 9 before the double
    // closed form, round(·, 6) — the trend_nation_revenue discipline on
    // log-log data.
    Q(
      "text_zipf_fit",
      Some("""
        WITH wc AS (SELECT word, COUNT(*) AS freq FROM (
               SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS word FROM documents)
             GROUP BY word),
        rk AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, word ASC) AS rank FROM wc),
        xy AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 12) AS DECIMAL(16,12)) AS x,
                      CAST(round(ln(CAST(freq AS DOUBLE)), 12) AS DECIMAL(16,12)) AS y
               FROM rk),
        m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx, SUM(y) AS sy, SUM(x * y) AS sxy FROM xy),
        d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                     CAST(ROUND(sx, 9) AS DOUBLE) AS sxd, CAST(ROUND(sxx, 9) AS DOUBLE) AS sxxd,
                     CAST(ROUND(sy, 9) AS DOUBLE) AS syd, CAST(ROUND(sxy, 9) AS DOUBLE) AS sxyd
              FROM m)
        SELECT n AS n_words,
               round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
               round((syd - round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) * sxd) / nd, 6) AS intercept
        FROM d
      """)) { (spark, dir) =>
      graft.operators.Corpus.zipfFit(Tables(spark, dir).documents, "doc_id", "text")
    },

    // ------------------------------------------- WordPiece vocabulary
    // In-engine subword tokenizer training (the greedy sibling of BPE):
    // weighted substring frequencies over the DISTINCT-WORD table, all
    // single chars force-included (no UNK possible), top multi-char
    // budget by (freq DESC, piece ASC). All-integer — exact compare.
    Q(
      "wordpiece_vocab",
      Some(s"""${wordpieceSql(96, 4, 12)}
        SELECT piece, freq, rank FROM ranked""")) { (spark, dir) =>
      graft.operators.Wordpiece.trainVocabFrame(
        Tables(spark, dir).documents, "doc_id", "text", vocabSize = 96, maxPieceLen = 4)
    },

    // ------------------------------------------- WordPiece piece usage
    // Greedy longest-match-first segmentation (the production WordPiece
    // inference contract, Song et al. 2021) of every distinct word,
    // usage-weighted by corpus word counts — the oracle replays the
    // greedy walk as unrolled per-position steps, so the SEGMENTATION
    // ITSELF is verified, not just counts of something.
    Q(
      "wordpiece_encode",
      Some(s"""${wordpieceSql(96, 4, 12)},
        allp AS (${(1 to 12).map(k => s"SELECT piece, n FROM pk$k").mkString(" UNION ALL ")})
        SELECT piece, CAST(SUM(n) AS BIGINT) AS n_uses FROM allp GROUP BY piece""")) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      val model = graft.operators.Wordpiece.train(docs, "doc_id", "text", vocabSize = 96, maxPieceLen = 4)
      graft.operators.Wordpiece.encodeStats(docs, "doc_id", "text", model)
    },

    // ------------------------------------------ WordPiece token counts
    // Per-document subword cost under the trained vocab: n_pieces joins
    // the per-word greedy segmentation sizes back onto the token stream —
    // the "how many tokens will this doc cost" budgeting signal.
    Q(
      "wordpiece_token_counts",
      Some(s"""${wordpieceSql(96, 4, 12)},
        wp AS (SELECT word, COUNT(*) AS npw FROM (
                 ${(1 to 12).map(k => s"SELECT word, piece FROM pk$k").mkString(" UNION ALL ")})
               GROUP BY word),
        docw AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word FROM documents),
        agg AS (SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(npw) AS BIGINT) AS n_pieces
                FROM docw JOIN wp USING (word) GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(agg.n_words, 0) AS n_words,
               COALESCE(agg.n_pieces, 0) AS n_pieces
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id""")) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      val model = graft.operators.Wordpiece.train(docs, "doc_id", "text", vocabSize = 96, maxPieceLen = 4)
      graft.operators.Wordpiece.tokenCounts(docs, "doc_id", "text", model)
    },

    // ------------------------------------------ ROUGE-n pair metrics
    // Generation/summarization eval (Lin 2004) doubling as the
    // candidate-vs-reference leakage check: clipped n-gram bag overlap
    // with P/R/F1 per (pair, n). Pairs are each even doc against the next
    // odd doc (a deterministic corpus self-pairing); every float is one
    // division away from replayed exact integer counts, round(·, 6).
    Q(
      "eval_rouge_pairs",
      Some(rougeOracle(maxN = 2))) { (spark, dir) =>
      val d = Tables(spark, dir).documents
      val pairs = d
        .filter(col("doc_id") % 2 === 0)
        .select(expr("CAST(doc_id DIV 2 AS BIGINT)").as("pair_id"), col("text").as("cand"))
        .join(
          d.filter(col("doc_id") % 2 === 1)
            .select(expr("CAST((doc_id - 1) DIV 2 AS BIGINT)").as("pair_id"), col("text").as("ref")),
          "pair_id")
      graft.operators.Retrieval.rougeNgram(pairs, "pair_id", "cand", "ref", maxN = 2)
    },

    // -------------------------------------- Unigram-LM piece usage
    // The SentencePiece-style third tokenizer (Kudo 2018): Viterbi
    // max-likelihood segmentation under grid-12 unigram log-probs over
    // the shared substring vocabulary — the oracle unrolls the DP
    // forward table AND the backtrack walk, so the max-likelihood
    // SEGMENTATION itself is verified (where wordpiece_encode verifies
    // the greedy walk, this verifies the argmax one).
    Q(
      "unigram_encode",
      Some(s"""${unigramSql(96, 4)}
        SELECT piece, CAST(SUM(n) AS BIGINT) AS n_uses FROM allb GROUP BY piece""")) { (spark, dir) =>
      val docs  = Tables(spark, dir).documents
      val model = graft.operators.Unigram.train(docs, "doc_id", "text", vocabSize = 96, maxPieceLen = 4)
      graft.operators.Unigram.encodeStats(docs, "doc_id", "text", model)
    },

    // ----------------------------------- Unigram-LM token counts
    // Per-document subword cost under Viterbi segmentation — the token
    // budgeting signal at max-likelihood splits (UnigramSpec pins that
    // every Viterbi segmentation scores >= the greedy one's likelihood
    // under the same model — the DP's optimality, checked in-data).
    Q(
      "unigram_token_counts",
      Some(s"""${unigramSql(96, 4)},
        wpn AS (SELECT word, COUNT(*) AS npw FROM allb GROUP BY word),
        docw AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word FROM documents),
        agg AS (SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(npw) AS BIGINT) AS n_pieces
                FROM docw JOIN wpn USING (word) GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words, COALESCE(agg.n_pieces, 0) AS n_pieces
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id""")) { (spark, dir) =>
      val docs  = Tables(spark, dir).documents
      val model = graft.operators.Unigram.train(docs, "doc_id", "text", vocabSize = 96, maxPieceLen = 4)
      graft.operators.Unigram.tokenCounts(docs, "doc_id", "text", model)
    }
  )

  /** Shared WordPiece prefix: distinct-word counts, weighted substring
    * frequencies (≤ maxPieceLen), the coverage-guaranteed vocab (all
    * single chars + top multi-char budget), and the greedy longest-match
    * segmentation unrolled as 12 per-position steps (word length ≤ 8 at
    * every SF; each step emits ≤ 1 piece per word) — the SQL replay of
    * [[graft.operators.Wordpiece]] train + encode. Exposes wc (word, n),
    * ranked (piece, freq, rank) and pk1..pk12 (word, n, pos, piece). */
  private def wordpieceSql(vocabSize: Int, maxPieceLen: Int, steps: Int): String = {
    val head = s"""
    WITH wc AS MATERIALIZED (SELECT word, COUNT(*) AS n FROM (
           SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word FROM documents)
         GROUP BY word),
    pos1 AS (SELECT word, n, unnest(range(1, len(word) + 1)) AS i FROM wc),
    pos2 AS (SELECT word, n, i, unnest(range(1, least($maxPieceLen, len(word) - i + 1) + 1)) AS l FROM pos1),
    freqs AS MATERIALIZED (SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece,
                  CAST(SUM(n) AS BIGINT) AS freq
           FROM pos2 GROUP BY 1),
    nch AS (SELECT COUNT(*) AS c FROM freqs WHERE len(piece) = 1),
    multi AS (SELECT piece, freq FROM (
           SELECT piece, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, piece) AS rk
           FROM freqs WHERE len(piece) >= 2)
         WHERE rk <= $vocabSize - (SELECT c FROM nch)),
    vocab AS MATERIALIZED (SELECT piece, freq FROM freqs WHERE len(piece) = 1 UNION ALL SELECT piece, freq FROM multi),
    ranked AS MATERIALIZED (SELECT piece, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, piece) AS rank FROM vocab),
    st0 AS (SELECT word, n, 1 AS pos FROM wc)"""
    val its = (1 to steps).map { k =>
      val p = k - 1
      s"""pk$k AS MATERIALIZED (SELECT word, n, pos, piece FROM (
              SELECT s.word, s.n, s.pos, v.piece,
                     ROW_NUMBER() OVER (PARTITION BY s.word ORDER BY len(v.piece) DESC) AS rk
              FROM st$p s JOIN vocab v ON v.piece = substr(s.word, s.pos, len(v.piece))
              WHERE s.pos <= len(s.word)) WHERE rk = 1),
        st$k AS (SELECT word, n, pos + len(piece) AS pos FROM pk$k)"""
    }.mkString(",\n")
    s"$head,\n$its"
  }

  /** ROUGE oracle: clipped n-gram bag overlap per (pair, n) with every
    * float one division from exact integers — the long-form replay of
    * [[graft.operators.Retrieval.rougeNgram]] over the even/odd doc
    * self-pairing. */
  private def rougeOracle(maxN: Int): String = {
    def gramSide(side: String, n: Int): String =
      s"""SELECT pair_id, unnest(list_transform(range(1, len($side) - $n + 2),
             i -> array_to_string($side[CAST(i AS INT):CAST(i AS INT)+$n-1], ' '))) AS g
             FROM p WHERE len($side) >= $n"""
    val parts = (1 to maxN).map { n =>
      val pexp = s"CAST(COALESCE(cl.clip,0) AS DOUBLE) / CAST(t.cand_grams AS DOUBLE)"
      val rexp = s"CAST(COALESCE(cl.clip,0) AS DOUBLE) / CAST(t.ref_grams AS DOUBLE)"
      s"""
      SELECT t.pair_id, $n AS n, t.cand_grams, t.ref_grams, COALESCE(cl.clip, 0) AS clip,
             ROUND(CASE WHEN t.cand_grams > 0 THEN $pexp ELSE 0.0 END, 6) AS rouge_p,
             ROUND(CASE WHEN t.ref_grams > 0 THEN $rexp ELSE 0.0 END, 6) AS rouge_r,
             ROUND(CASE WHEN t.cand_grams > 0 AND t.ref_grams > 0 AND ($pexp + $rexp) > 0
                        THEN 2.0 * ($pexp) * ($rexp) / ($pexp + $rexp)
                        ELSE 0.0 END, 6) AS rouge_f
      FROM (SELECT pair_id, CAST(greatest(len(ct) - $n + 1, 0) AS BIGINT) AS cand_grams,
                   CAST(greatest(len(rt) - $n + 1, 0) AS BIGINT) AS ref_grams FROM p) t
      LEFT JOIN (
        SELECT cn.pair_id, CAST(SUM(least(cn.c, rn.c)) AS BIGINT) AS clip
        FROM (SELECT pair_id, g, COUNT(*) AS c FROM (${gramSide("ct", n)}) GROUP BY 1, 2) cn
        JOIN (SELECT pair_id, g, COUNT(*) AS c FROM (${gramSide("rt", n)}) GROUP BY 1, 2) rn
          ON cn.pair_id = rn.pair_id AND cn.g = rn.g
        GROUP BY cn.pair_id) cl ON cl.pair_id = t.pair_id"""
    }.mkString(" UNION ALL ")
    s"""
    WITH c AS (SELECT doc_id // 2 AS pair_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ct FROM documents WHERE doc_id % 2 = 0),
    r AS (SELECT (doc_id - 1) // 2 AS pair_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS rt FROM documents WHERE doc_id % 2 = 1),
    p AS MATERIALIZED (SELECT c.pair_id, c.ct, r.rt FROM c JOIN r USING (pair_id))
    $parts"""
  }

  /** Unigram-LM oracle: replay [[graft.operators.Unigram]] train + Viterbi
    * entirely in SQL. The seed vocabulary replays
    * [[graft.operators.Wordpiece.trainVocabFrame]] (same CTEs as
    * [[wordpieceSql]]); log probabilities live on the 1e-12 decimal grid
    * (round(ln(freq),12) − round(ln(Σfreq),12) as DECIMAL(20,12) — the NB
    * scorer's cross-libm contract); the Viterbi DP unrolls as 8 forward
    * steps (one best (score, predecessor) row per (word, position), ties
    * to the smallest predecessor = longest final piece — score DESC, pos
    * ASC row_number) and 8 backtrack joins, so the SEGMENTATION ITSELF is
    * verified. Words are ≤ 8 chars at every SF, so positions stop at 9.
    * Exposes wc, vocab, lpv, dacc9 and allb (word, n, piece). */
  private def unigramSql(vocabSize: Int, maxPieceLen: Int): String = {
    val head = s"""
    WITH wc AS MATERIALIZED (SELECT word, COUNT(*) AS n FROM (
           SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word FROM documents)
         GROUP BY word),
    pos1 AS (SELECT word, n, unnest(range(1, len(word) + 1)) AS i FROM wc),
    pos2 AS (SELECT word, n, i, unnest(range(1, least($maxPieceLen, len(word) - i + 1) + 1)) AS l FROM pos1),
    freqs AS MATERIALIZED (SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece,
                  CAST(SUM(n) AS BIGINT) AS freq
           FROM pos2 GROUP BY 1),
    nch AS (SELECT COUNT(*) AS c FROM freqs WHERE len(piece) = 1),
    multi AS (SELECT piece, freq FROM (
           SELECT piece, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, piece) AS rk
           FROM freqs WHERE len(piece) >= 2)
         WHERE rk <= $vocabSize - (SELECT c FROM nch)),
    vocab AS MATERIALIZED (SELECT piece, freq FROM freqs WHERE len(piece) = 1 UNION ALL SELECT piece, freq FROM multi),
    lpv AS MATERIALIZED (SELECT piece,
             CAST(round(ln(CAST(freq AS DOUBLE)), 12) AS DECIMAL(20,12))
           - CAST(round(ln(CAST((SELECT SUM(freq) FROM vocab) AS DOUBLE)), 12) AS DECIMAL(20,12)) AS lp
         FROM vocab),
    dacc1 AS (SELECT word, n, 1 AS pos, CAST(0 AS DECIMAL(38,12)) AS score, 0 AS prev, CAST(NULL AS VARCHAR) AS piece FROM wc)"""
    val fwd = (2 to 9).map { j =>
      val p = j - 1
      s"""d$j AS MATERIALIZED (SELECT word, n, pos, score, prev, piece FROM (
            SELECT d.word, d.n, $j AS pos, CAST(d.score + v.lp AS DECIMAL(38,12)) AS score, d.pos AS prev, v.piece,
                   ROW_NUMBER() OVER (PARTITION BY d.word ORDER BY d.score + v.lp DESC, d.pos ASC) AS rk
            FROM dacc$p d
            JOIN lpv v ON len(v.piece) = $j - d.pos
                      AND v.piece = substr(d.word, CAST(d.pos AS INT), $j - d.pos)
            WHERE d.pos >= $j - $maxPieceLen AND d.pos < $j AND len(d.word) >= $j - 1
          ) WHERE rk = 1),
        dacc$j AS MATERIALIZED (SELECT * FROM dacc$p UNION ALL SELECT * FROM d$j)"""
    }.mkString(",\n")
    val back = (2 to 9).map { s =>
      val p = s - 1
      s"""b$s AS MATERIALIZED (SELECT d.word, d.n, d.piece, d.prev
             FROM dacc9 d JOIN b$p ON d.word = b$p.word AND d.pos = b$p.prev
             WHERE b$p.prev > 1)"""
    }.mkString(",\n")
    val union = (1 to 9).map(s => s"SELECT word, n, piece FROM b$s").mkString(" UNION ALL ")
    s"""$head,
    $fwd,
    fin AS MATERIALIZED (SELECT word, n, pos, prev, piece FROM dacc9 WHERE pos = len(word) + 1),
    b1 AS MATERIALIZED (SELECT word, n, piece, prev FROM fin),
    $back,
    allb AS ($union)"""
  }

  /** BPE oracle: replay [[graft.operators.Bpe.trainDistributed]] +
    * [[graft.operators.Bpe.tokenCounts]] entirely in SQL.
    *
    * Training unrolls `merges` rounds over the (word, count, syms) state:
    * each round computes count-weighted adjacent-pair frequencies, takes the
    * (cnt DESC, pa ASC, pb ASC) argmax — binary string order, identical to
    * Spark's on this ASCII + chr(1) alphabet — and applies the merge
    * left-to-right non-overlapping via gaps-and-islands (candidate runs are
    * consecutive only when pa = pb; odd positions within a run are merged,
    * the exact semantics of the engine's left-fold). A round whose best pair
    * occurs < 2 times merges nothing, so early stop degrades to no-op rounds
    * exactly like the trainer's stop rule.
    *
    * Encoding unrolls `encSteps` single-merge steps per distinct word:
    * find the lowest-rank applicable merge (ties to the leftmost position —
    * the engine's encodeWord scan), splice it in, repeat. word + EOW is at
    * most 9 symbols at every SF, so 8 steps reach the fixpoint. Token count
    * = final symbols excluding a still-standalone chr(1) sentinel. */
  private def bpeCoreSql(merges: Int, encSteps: Int, finalSelect: String): String =
    s"""
    WITH ${bpeCtes(merges, encSteps, "documents")}
    $finalSelect"""

  /** The BPE train+encode replay as a bare CTE list (no WITH, no final
    * select) over an arbitrary (doc_id, text) relation `src` — so composed
    * oracles (corpus_e2e_pipeline) can train the tokenizer on a
    * pipeline-transformed corpus instead of raw `documents`. */
  private def bpeCtes(merges: Int, encSteps: Int, src: String): String = {
    def trainRound(r: Int): String = {
      val p = r - 1
      s"""pc$r AS (SELECT syms[CAST(j AS INT)] AS pa, syms[CAST(j AS INT)+1] AS pb, CAST(SUM(n) AS BIGINT) AS cnt
              FROM st$p, LATERAL (SELECT unnest(range(1, len(syms))) AS j) u$r GROUP BY 1, 2),
        bm$r AS (SELECT pa, pb, cnt FROM pc$r ORDER BY cnt DESC, pa ASC, pb ASC LIMIT 1),
        ap$r AS (SELECT s.word, s.n, CAST(j AS INT) AS j, s.syms[CAST(j AS INT)] AS sym, s.syms[CAST(j AS INT)+1] AS nxt,
                        COALESCE(s.syms[CAST(j AS INT)] = b.pa AND s.syms[CAST(j AS INT)+1] = b.pb AND b.cnt >= 2, FALSE) AS cand
                 FROM st$p s LEFT JOIN bm$r b ON TRUE, LATERAL (SELECT unnest(range(1, len(s.syms)+1)) AS j) v$r),
        ch$r AS (SELECT word, j FROM (
                   SELECT word, j, ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY j) AS k
                   FROM (SELECT word, j, j - ROW_NUMBER() OVER (PARTITION BY word ORDER BY j) AS grp
                         FROM ap$r WHERE cand))
                 WHERE k % 2 = 1),
        st$r AS MATERIALIZED (SELECT word, n, list(CASE WHEN sel THEN sym || nxt ELSE sym END ORDER BY j) AS syms
                 FROM (SELECT a.word, a.n, a.j, a.sym, a.nxt, (c.j IS NOT NULL) AS sel, (c2.j IS NOT NULL) AS skip
                       FROM ap$r a
                       LEFT JOIN ch$r c ON c.word = a.word AND c.j = a.j
                       LEFT JOIN ch$r c2 ON c2.word = a.word AND c2.j = a.j - 1)
                 WHERE NOT skip GROUP BY word, n),
        mg$r AS (SELECT ${r - 1} AS rank, pa, pb FROM bm$r WHERE cnt >= 2)"""
    }
    def encStep(t: Int): String = {
      val p = t - 1
      s"""cd$t AS (SELECT e.word, CAST(j AS INT) AS j, m.rank
              FROM e$p e, LATERAL (SELECT unnest(range(1, len(e.syms))) AS j) w$t
              JOIN mt m ON m.pa = e.syms[CAST(j AS INT)] AND m.pb = e.syms[CAST(j AS INT)+1]),
        bd$t AS (SELECT word, j FROM (SELECT word, j, ROW_NUMBER() OVER (PARTITION BY word ORDER BY rank ASC, j ASC) AS rk FROM cd$t) WHERE rk = 1),
        e$t AS MATERIALIZED (SELECT e.word,
                        CASE WHEN b.j IS NULL THEN e.syms
                             ELSE e.syms[1:b.j-1] || [e.syms[b.j] || e.syms[b.j+1]] || e.syms[b.j+2:]
                        END AS syms
                 FROM e$p e LEFT JOIN bd$t b USING (word))"""
    }
    s"""wc AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
           SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word FROM $src)
         GROUP BY word),
    st0 AS MATERIALIZED (SELECT word, n, list_transform(range(1, length(word) + 1), i -> substr(word, CAST(i AS INT), 1)) || [chr(1)] AS syms FROM wc),
    ${(1 to merges).map(trainRound).mkString(",\n")},
    mt AS MATERIALIZED (${(1 to merges).map(r => s"SELECT rank, pa, pb FROM mg$r").mkString(" UNION ALL ")}),
    e0 AS (SELECT word, syms FROM st0),
    ${(1 to encSteps).map(encStep).mkString(",\n")},
    npw AS (SELECT word, CAST(len(list_filter(syms, s -> s <> chr(1))) AS BIGINT) AS npw FROM e$encSteps),
    docw AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word FROM $src),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, CAST(SUM(npw) AS BIGINT) AS n_bpe_tokens
            FROM docw JOIN npw USING (word) GROUP BY doc_id)"""
  }

  private def bpeSql(merges: Int, encSteps: Int): String =
    bpeCoreSql(
      merges,
      encSteps,
      """SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words, COALESCE(agg.n_bpe_tokens, 0) AS n_bpe_tokens
         FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id""")

  /** Tokenizer-health rollup on top of the same BPE replay: fertility
    * (subword tokens per whitespace word — the multilingual-tokenizer
    * health number) and chars-per-token per language. */
  private def bpeFertilitySql(merges: Int, encSteps: Int): String =
    bpeCoreSql(
      merges,
      encSteps,
      """SELECT d.lang,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(COALESCE(agg.n_words, 0)) AS BIGINT) AS n_words,
                CAST(SUM(COALESCE(agg.n_bpe_tokens, 0)) AS BIGINT) AS n_bpe_tokens,
                CAST(SUM(length(d.text)) AS BIGINT) AS n_chars,
                round(CAST(SUM(COALESCE(agg.n_bpe_tokens, 0)) AS DOUBLE) / SUM(COALESCE(agg.n_words, 0)), 6) AS fertility,
                round(CAST(SUM(length(d.text)) AS DOUBLE) / SUM(COALESCE(agg.n_bpe_tokens, 0)), 6) AS chars_per_token
         FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
         GROUP BY d.lang""")

  /** Shared NB prefix: token counts per lang, add-1-smoothed DECIMAL(20,12)
    * log-likelihood cells over the vocab × class grid, priors, and the
    * exact-decimal per-(doc, class) score CTE `sc` — the SQL replay of
    * [[graft.operators.LanguageModel.naiveBayesClassify]]. */
  private[queries] def nbScoresSql: String = """
    WITH tokt AS (SELECT lang AS cls, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token FROM documents),
    cls AS (SELECT lang AS cls, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n FROM documents),
    pri AS (SELECT cls, CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST((SELECT n FROM nd) AS DOUBLE)), 12) AS DECIMAL(20,12)) AS prior FROM cls),
    cnt AS (SELECT cls, token, COUNT(*) AS cnt FROM tokt GROUP BY 1, 2),
    tot AS (SELECT cls, COUNT(*) AS tot FROM tokt GROUP BY 1),
    voc AS (SELECT DISTINCT token FROM cnt),
    vs AS (SELECT COUNT(*) AS v FROM voc),
    logp AS (SELECT c.cls, v.token,
               CAST(round(ln((CAST(COALESCE(cnt.cnt, 0) AS DOUBLE) + 1.0)
                             / (CAST(tot.tot AS DOUBLE) + CAST((SELECT v FROM vs) AS DOUBLE))), 12) AS DECIMAL(20,12)) AS logp
             FROM voc v CROSS JOIN cls c
             LEFT JOIN cnt ON cnt.cls = c.cls AND cnt.token = v.token
             JOIN tot ON tot.cls = c.cls),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token FROM documents)
           GROUP BY 1, 2),
    sc AS (SELECT tf.doc_id, l.cls, p.prior + SUM(CAST(tf.tf AS DECIMAL(6,0)) * l.logp) AS s
           FROM tf JOIN logp l ON l.token = tf.token JOIN pri p ON p.cls = l.cls
           GROUP BY tf.doc_id, l.cls, p.prior)
  """
}
