package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked retrieval and approximate string matching over a tokenized corpus
  * — the lookup side of the training-data pipeline (find documents for an
  * audit query; reconcile near-identical vocabulary variants).
  *
  * No reference counterpart (SURVEY.md §2e extension family): the reference
  * stops at the boolean inverted index (reverse_map juice,
  * src/node.go:929-960); BM25 is the standard scoring layer on top of it
  * (Robertson & Zaragoza 2009), and FastSS deletion-neighborhood blocking
  * (Bocek et al. 2007) is the standard way to make an edit-distance join
  * sub-quadratic.
  *
  * Scale design (100 TB):
  *  - [[bm25TopK]] is one corpus pass: tf is a (doc, term)-keyed map-side
  *    partial aggregate over ONLY rows matching a query term (the filter
  *    rides the scan), df/avgdl are tiny aggregates of the already-reduced
  *    tf rows, and the final top-k is a TakeOrderedAndProject (per-partition
  *    bounded heap + driver merge of k rows) — never a global sort;
  *  - the query term list is a literal in the plan (queries are words, not
  *    tables), so scoring never joins against a second corpus-scale input;
  *  - [[fuzzyWordPairs]] explodes each distinct word into O(L·maxDist)
  *    deletion signatures and shuffles ONLY (signature, word) pairs; the
  *    quadratic step runs per signature bucket (bucket size tracks
  *    signature collisions, not vocabulary size) and every candidate is
  *    exact-verified with codegen'd `levenshtein` — the same
  *    band-then-verify discipline as Dedup's MinHash/LSH path.
  */
object Retrieval {

  /** Whitespace tokenizer (strings.Fields contract, shared with Corpus). */
  private def toks(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Okapi BM25 top-k: score every document against a bag of query terms,
    * return the k best as (doc_id, n_terms, score).
    *
    * score(d) = Σ_t ln(1 + (N − df_t + ½)/(df_t + ½)) ·
    *            tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avgdl))
    *
    * Determinism contract (oracle hash-compares doubles): every arithmetic
    * step is an IEEE-exact op on exact integers (mul/div/add are correctly
    * rounded, so both engines agree bit-for-bit given the same operation
    * order); the per-doc sum folds term contributions in ASCENDING TERM
    * ORDER via a left fold, never an unordered SQL SUM; the one libm call
    * (ln) can differ in the last ulp across engines, so the emitted score
    * is round(·, 6). Ranking ties break by doc_id. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, "k must be positive")
    val qTerms = terms.distinct.sorted

    // one tokenize pass feeds both doc length and term frequencies. A
    // well-split corpus is NOT reshuffled up front (Corpus.spreadSmallInput
    // — only a tiny under-split input pays one doc-keyed spread so the
    // tokenize parallelizes); past the query-term filter, only
    // (doc_id, token, len) survivor rows reach the tf exchange
    // (map-side partial-aggregated) — non-query terms never shuffle
    val tokd = Corpus
      .spreadSmallInput(docs, col(idCol))
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("len"), explode(col("toks")).as("token"))
    val tf = tokd
      .filter(col("token").isin(qTerms: _*)) // rides the scan; non-query terms never shuffle
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), first(col("len")).as("len"))

    // corpus stats: N and avgdl over ALL docs (len 0 docs count toward both)
    val stats = docs
      .select(size(toks(col(textCol))).as("len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("tot_len"))
    // df per query term from the reduced tf rows (one row per doc×term)
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))

    // contribution per (doc, term): exact-int inputs, fixed operation order
    val scored = tf
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("tot_len").cast("double") / col("n_docs").cast("double"))
      .withColumn(
        "idf",
        log(
          lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5))))
      .withColumn(
        "contrib",
        col("idf") * ((col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / col("avgdl"))))))

    // per-doc fold in ascending term order — the sum is order-fixed so both
    // engines add the same doubles in the same sequence
    val perDoc = scored
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_terms"),
        aggregate(
          array_sort(collect_list(struct(col("token"), col("contrib")))),
          lit(0.0),
          (acc, x) => acc + x.getField("contrib")).as("raw"))

    perDoc
      .orderBy(col("raw").desc, col("doc_id").asc) // TakeOrderedAndProject with .limit
      .limit(k)
      .select(col("doc_id"), col("n_terms"), round(col("raw"), 6).as("score"))
  }

  /** Query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty
    * 2001) — the language-modeling alternative to [[bm25TopK]]'s
    * probabilistic IDF: score(q,d) = Σ_t ln((tf_td + μ·P(t|C)) /
    * (|d| + μ)), P(t|C) the collection unigram model. Zero-tf query terms
    * still contribute (the smoothing mass), so candidates are docs
    * matching ≥ 1 term and each candidate scores against ALL query terms
    * via a candidate × term frame with a left tf attach.
    *
    * Exactness: tf, doc length, collection frequencies, and |C| are exact
    * integers; each term's ln(...) runs in fixed double order and snaps
    * to the 1e-12 grid, so the per-doc sum is an exact decimal — rank by
    * it BEFORE the final round(·, 6) (the adamicAdar cut discipline).
    * Scale shape = bm25TopK: non-query terms never shuffle, stats are
    * 1-row broadcasts, the frame is candidate-sized × |q|. */
  def queryLikelihoodTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      mu: Double = 100.0): DataFrame = {
    require(terms.nonEmpty, "queryLikelihoodTopK needs at least one query term")
    require(k > 0 && mu > 0.0, "k and mu must be positive")
    val dec12  = org.apache.spark.sql.types.DecimalType(20, 12)
    val qTerms = terms.distinct.sorted
    val spark  = docs.sparkSession
    import spark.implicits._

    val tokd = Corpus
      .spreadSmallInput(docs, col(idCol))
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("len"), explode(col("toks")).as("token"))
    val tf = tokd
      .filter(col("token").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), first(col("len")).as("len"))
      .localCheckpoint(true)
    val stats = docs
      .select(size(toks(col(textCol))).as("len"))
      .agg(sum(col("len")).as("tot_len"))
    // collection frequency per query term: every occurrence lives in a
    // candidate doc, so the tf rows already carry all of them
    val cf = tf.groupBy(col("token")).agg(sum(col("tf")).as("cf"))
    val cand = tf.groupBy(col("doc_id")).agg(max(col("len")).as("len"))
    val frame = cand
      .crossJoin(broadcast(qTerms.toDF("token")))
      .join(broadcast(cf), Seq("token"))
      .crossJoin(broadcast(stats))
      .join(tf.select(col("doc_id"), col("token"), col("tf")), Seq("doc_id", "token"), "left")
    val p = col("cf").cast("double") / col("tot_len").cast("double")
    val contrib = round(
      log(
        (coalesce(col("tf"), lit(0L)).cast("double") + lit(mu) * p) /
          (col("len").cast("double") + lit(mu))),
      12).cast(dec12)
    val perDoc = frame
      .select(col("doc_id"), contrib.as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("raw"))
    perDoc
      .orderBy(col("raw").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), round(col("raw"), 6).cast("double").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): fuse any number of
    * top-k rankings — BM25, ANN, keyword tf, whatever produced them — into
    * one list by score(d) = Σ_lists 1/(c + rank_d). The hybrid-retrieval
    * workhorse: rank-based, so wildly different score scales fuse without
    * calibration.
    *
    * Inputs are (idCol, rankCol) frames with 1-based ranks. Determinism
    * contract (the oracle hash-compares doubles): each contribution
    * 1/(c+rank) is one IEEE-exact division of exact integers, and the
    * per-doc sum folds in FIXED list order — never an unordered SUM;
    * output score rounds to the usual 1e-6 grid, final ties break by id.
    * Scale shape: the inputs are already bounded top-k lists, so this is
    * a union of small frames, one id-keyed aggregation, and a bounded
    * TakeOrderedAndProject cut — nothing corpus-sized moves. */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0 && c >= 0, "k must be positive, c non-negative")
    val tagged = rankings.zipWithIndex
      .map { case (r, i) =>
        r.select(col(idCol), lit(i).as("__list"), col(rankCol).cast("long").as("__rank"))
      }
      .reduce(_ unionByName _)
      // Enforce, not assume, the "each input is a distinct-id top-k list"
      // contract: a duplicate (id, rank) row in one list would silently
      // inflate both n_lists and the fused score. Keep the best (minimum)
      // rank per (id, list); the inputs are bounded top-k lists, so this
      // extra aggregation moves k·lists rows, nothing corpus-sized.
      .groupBy(col(idCol), col("__list"))
      .agg(min(col("__rank")).as("__rank"))
    tagged
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lists"),
        aggregate(
          array_sort(collect_list(struct(col("__list"), col("__rank")))),
          lit(0.0),
          (acc, x) =>
            acc + lit(1.0) / (lit(c.toDouble) + x.getField("__rank").cast("double"))).as("raw"))
      .orderBy(col("raw").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("n_lists"), round(col("raw"), 6).as("rrf_score"))
  }

  /** All 0- to maxDist-deletion variants of a word, distinct. maxDist is
    * bounded tiny (1–2) so the blow-up is O(L^maxDist) per word. */
  private[graft] def deletionVariants(w: String, maxDist: Int): Seq[String] = {
    var frontier = Set(w)
    var all      = Set(w)
    var d        = 0
    while (d < maxDist) {
      frontier = frontier.flatMap(v => v.indices.map(i => v.substring(0, i) + v.substring(i + 1)))
      all ++= frontier
      d += 1
    }
    all.toSeq
  }

  /** Edit-distance join over the DISTINCT words of a column: all pairs
    * (w1 < w2) with levenshtein(w1, w2) <= maxDist.
    *
    * FastSS blocking: two words within edit distance d share at least one
    * common d-deletion variant, so candidate generation is a self-join on
    * the exploded signature set, then exact `levenshtein` verification —
    * never vocabulary × vocabulary. Output: (w1, w2, dist). */
  def fuzzyWordPairs(df: DataFrame, wordCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist must be 1 or 2 (got $maxDist): signatures grow O(L^d)")
    val spark = df.sparkSession
    import spark.implicits._

    val words = df.select(col(wordCol).as("word")).distinct()
    val sigs = words
      .as[String]
      .flatMap(w => deletionVariants(w, maxDist).map(s => (s, w)))
      .toDF("sig", "word")
    sigs
      .as("a")
      .join(sigs.as("b"), col("a.sig") === col("b.sig") && col("a.word") < col("b.word"))
      .select(col("a.word").as("w1"), col("b.word").as("w2"))
      .distinct() // pairs can share several signatures
      .withColumn("dist", levenshtein(col("w1"), col("w2")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /** All-pairs document cosine similarity over ln-idf-weighted term
    * vectors via POSTING-LIST self-join — the sparse-vector sibling of
    * [[Similarity]]'s dense embedding cosine, and the classic "similar
    * documents without embeddings" primitive (Bayardo et al. WWW'07
    * all-pairs frame).
    *
    * Pipeline: tokenize → tf per (doc, term) → drop terms with
    * df > maxDfRatio·N (an IDF-motivated stop-word cut that is ALSO the
    * scale guard: pair fan-out is Σ_t df_t², so one everywhere-term makes
    * the join quadratic in the corpus — the same hot-key physics as
    * Dedup's LSH bucket cap, here with the df threshold doing double duty
    * as semantics) → w = tf·ln(N/df) → one term-keyed equi-self-join
    * (never a cross product; pair dot products partial-aggregate
    * map-side) → normalize by per-doc L2 norms over the kept vocab →
    * keep pairs with sim ≥ minSim.
    *
    * Float contract: tf/df/N are exact integers; w is two IEEE-exact ops
    * around one libm ln; dot products and norms are unordered SUMs (ulp
    * order drift ~1e-15) — absorbed by the emitted round(·, 6), the
    * proven pagerank/cosine envelope. Returns (a_id, b_id, n_shared, sim). */
  def tfidfCosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDfRatio: Double = 0.5,
      minSim: Double = 0.1,
      maxDfAbs: Long = 2000L): DataFrame = {
    require(maxDfRatio > 0.0 && maxDfRatio <= 1.0, s"maxDfRatio in (0,1], got $maxDfRatio")
    require(maxDfAbs >= 1, s"maxDfAbs must be positive, got $maxDfAbs")
    val n = docs.count()
    require(n >= 2, "need at least 2 documents")

    val tf = Corpus
      .spreadSmallInput(docs, col(idCol))
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // df over distinct (doc, token) rows; the cap is the integer
    // min(floor(maxDfRatio·N), maxDfAbs) so both engines compare against
    // the same exact threshold — no float boundary in the filter.
    // maxDfAbs exists because the RATIO alone is not a scale guard: in a
    // grown corpus of near-disjoint sub-corpora (sharded crawls, per-day
    // drops) a term common within one shard sits far under any global
    // fraction while its posting list still fans out df² pairs — measured
    // as alpha ≈ 2.1 on ×4 decorrelated copies before this cap (SCALE.md),
    // alpha ≈ 1 after. Same physics as Dedup's LSH maxBucketDF: the pair
    // budget per term is maxDfAbs², an absolute bound no corpus growth
    // can inflate.
    val maxDf = math.min((maxDfRatio * n).toLong, maxDfAbs)
    val kept = tf
      .join(
        broadcast(
          tf.groupBy(col("token")).agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)),
        "token")
    val posting = kept.select(
      col("doc_id"),
      col("token"),
      (col("tf").cast("double") * log(lit(n.toDouble) / col("df").cast("double"))).as("w"))
    val norms = posting
      .groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = posting.as("x")
      .join(posting.as("y"), col("x.token") === col("y.token") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"), sum(col("x.w") * col("y.w")).as("dp"))
    dots
      .join(norms.select(col("doc_id").as("a_id"), col("nrm").as("na")), "a_id")
      .join(norms.select(col("doc_id").as("b_id"), col("nrm").as("nb")), "b_id")
      .select(
        col("a_id"),
        col("b_id"),
        col("n_shared"),
        round(col("dp") / (col("na") * col("nb")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** ROUGE-n overlap metrics (Lin 2004) over paired texts — the standard
    * summarization/generation eval, and in a data pipeline the
    * candidate-vs-reference leakage check (a generated doc scoring near
    * 1.0 against a source is a copy): for n = 1..maxN, the CLIPPED n-gram
    * bag overlap clip = Σ_g min(count_cand(g), count_ref(g)), precision
    * clip/|cand grams|, recall clip/|ref grams|, F1 = 2PR/(P+R) (0 when
    * degenerate), round(·, 6). Long form: one row per (pair, n) with the
    * exact integer counts alongside — so every float is one division away
    * from replayed integers.
    *
    * Scale shape: a pure NARROW projection — both gram bags live in the
    * pair's own row, so the clipped overlap is row-local array arithmetic
    * (Σ over the candidate's distinct grams of min(count-in-cand,
    * count-in-ref), via nested higher-order functions): zero exchanges,
    * scan-parallel at any corpus size, no cross-pair stage anywhere. */
  /** Sliding n-grams over an already-tokenized ARRAY ATTRIBUTE. The
    * tokenization must live in its own projection (an attribute, not an
    * inline split) — otherwise the transform lambda re-evaluates
    * split+filter once PER GRAM POSITION, turning an O(len) projection
    * into O(len²) (measured 2× on eval_bleu_pairs before the split). */
  private def gramsFromToks(t: org.apache.spark.sql.Column, n: Int) =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  def rougeNgram(
      pairs: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String,
      maxN: Int = 2): DataFrame = {
    require(maxN >= 1, s"maxN must be positive, got $maxN")
    // tokenize ONCE into attributes; CollapseProject keeps the boundary
    // because the arrays are non-cheap and multiply referenced
    val toksed = pairs.select(
      col(idCol).as("pair_id"),
      toks(col(candCol)).as("ctoks"),
      toks(col(refCol)).as("rtoks"))
    (1 to maxN).map { n =>
      val base = toksed.select(
        col("pair_id"),
        gramsFromToks(col("ctoks"), n).as("cg"),
        gramsFromToks(col("rtoks"), n).as("rg"))
      val clipCol = aggregate(
        array_distinct(col("cg")),
        lit(0L),
        (acc, g) =>
          acc + least(
            size(filter(col("cg"), x => x === g)),
            size(filter(col("rg"), x => x === g))).cast("long"))
      val p = col("clip").cast("double") / col("cand_grams").cast("double")
      val r = col("clip").cast("double") / col("ref_grams").cast("double")
      base
        .select(
          col("pair_id"),
          lit(n).as("n"),
          size(col("cg")).cast("long").as("cand_grams"),
          size(col("rg")).cast("long").as("ref_grams"),
          clipCol.as("clip"))
        .select(
          col("pair_id"),
          col("n"),
          col("cand_grams"),
          col("ref_grams"),
          col("clip"),
          round(when(col("cand_grams") > 0, p).otherwise(lit(0.0)), 6).as("rouge_p"),
          round(when(col("ref_grams") > 0, r).otherwise(lit(0.0)), 6).as("rouge_r"),
          round(
            when(col("cand_grams") > 0 && col("ref_grams") > 0 && (p + r) > 0,
              lit(2.0) * p * r / (p + r))
              .otherwise(lit(0.0)),
            6).as("rouge_f"))
    }.reduce(_ unionByName _)
  }

  /** Sentence-BLEU up to bigrams (Papineni et al. 2002) over paired texts —
    * the precision-side generation eval beside [[rougeNgram]]'s recall side
    * (and the same candidate-vs-reference leakage screen read the other
    * way): BLEU₂ = BP · √(p₁·p₂) with pₙ the CLIPPED n-gram precision and
    * the brevity penalty BP = min(1, e^{1−r/c}). The geometric mean is
    * written as √(p₁p₂) — sqrt is IEEE-exact, so no ln/exp chain for the
    * mean; the one exp in BP runs on an exact integer ratio and rounds at
    * 6. Emits the exact integer counts (clip₁, clip₂, c_len, r_len) beside
    * the floats so every division is replayable.
    *
    * Scale shape: identical to [[rougeNgram]] — both gram bags are
    * row-local arrays, zero exchanges, scan-parallel at any corpus size. */
  def bleuPairs(
      pairs: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String): DataFrame = {
    def clip(cg: org.apache.spark.sql.Column, rg: org.apache.spark.sql.Column) =
      aggregate(
        array_distinct(cg),
        lit(0L),
        (acc, g) =>
          acc + least(
            size(filter(cg, x => x === g)),
            size(filter(rg, x => x === g))).cast("long"))
    val toksed = pairs.select(
      col(idCol).as("pair_id"),
      toks(col(candCol)).as("ctoks"),
      toks(col(refCol)).as("rtoks"))
    val base = toksed.select(
      col("pair_id"),
      gramsFromToks(col("ctoks"), 1).as("c1"),
      gramsFromToks(col("rtoks"), 1).as("r1"),
      gramsFromToks(col("ctoks"), 2).as("c2"),
      gramsFromToks(col("rtoks"), 2).as("r2"))
    val withCounts = base.select(
      col("pair_id"),
      size(col("c1")).cast("long").as("c_len"),
      size(col("r1")).cast("long").as("r_len"),
      size(col("c2")).cast("long").as("c2_len"),
      clip(col("c1"), col("r1")).as("clip1"),
      clip(col("c2"), col("r2")).as("clip2"))
    val p1 = col("clip1").cast("double") / col("c_len").cast("double")
    val p2 = col("clip2").cast("double") / col("c2_len").cast("double")
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len").cast("double") / col("c_len").cast("double")))
    withCounts.select(
      col("pair_id"),
      col("c_len"),
      col("r_len"),
      col("clip1"),
      col("clip2"),
      round(when(col("c_len") > 0, p1).otherwise(lit(0.0)), 6).as("p1"),
      round(when(col("c2_len") > 0, p2).otherwise(lit(0.0)), 6).as("p2"),
      round(
        when(col("c_len") > 0 && col("c2_len") > 0 && col("clip1") > 0 && col("clip2") > 0,
          bp * sqrt(p1 * p2)).otherwise(lit(0.0)),
        6).as("bleu2"))
  }
}
