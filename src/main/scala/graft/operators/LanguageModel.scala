package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring — the perplexity-style quality
  * signal CCNet-class pipelines filter on (Wenzek et al. 2020 rank documents
  * by LM score; a count LM over a reference corpus is the engine-native
  * version of that gate, no external model artifact needed).
  *
  * Model: add-k smoothed bigram conditional
  *   p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V)
  * with c(·) counts from the TRAIN corpus and V its distinct-word count.
  * A document's score is its mean bigram log-probability (higher = more
  * fluent under the reference corpus).
  *
  * Determinism contract (oracle hash-compares doubles): every input to the
  * per-bigram log is an exact integer; the one libm call (ln) matches in
  * shape on both engines; the per-document Σ folds log-probs in POSITION
  * ORDER via a left fold (never an unordered SQL SUM of doubles); the
  * emitted mean is round(·, 6).
  *
  * Scale design (100 TB): two map-side-combined count passes over the train
  * corpus (unigrams, bigrams) whose outputs are vocabulary-sized, not
  * corpus-sized; scoring joins the document bigram stream against those
  * count tables on hashed keys — keyed shuffles all the way down, no
  * driver-side state, no broadcast of a web-scale vocabulary. */
object LanguageModel {

  private def toks(c: Column): Column = filter(split(c, "\\s+"), t => length(t) > 0)

  /** Positioned bigram stream: (doc_id, pos, w1, w2), pos 1-based. Documents
    * with fewer than two tokens emit nothing. */
  private def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    df.select(col(idCol).as("doc_id"), t.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => struct(
              i.as("pos"),
              element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.pos"), col("b.w1"), col("b.w2"))
  }

  /** Score `score` documents under a bigram LM trained on `train`:
    * (doc_id, n_bigrams, avg_logprob). Pass the same DataFrame twice for
    * self-scoring (the in-corpus fluency ranking). */
  def bigramScore(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val trainToks = train.select(explode(toks(col(textCol))).as("word"))
    val uni       = trainToks.groupBy("word").agg(count(lit(1)).as("c1"))
    val bi = bigrams(train, idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val vocab = uni.agg(count(lit(1)).as("vsz"))

    val scored = bigrams(score, idCol, textCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.withColumnRenamed("word", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn(
        "logp",
        log(
          (coalesce(col("c2"), lit(0L)).cast("double") + lit(k)) /
            (coalesce(col("c1"), lit(0L)).cast("double") + lit(k) * col("vsz").cast("double"))))

    scored
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        aggregate(
          array_sort(collect_list(struct(col("pos"), col("logp")))),
          lit(0.0),
          (acc, x) => acc + x.getField("logp")).as("s"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        round(col("s") / col("n_bigrams").cast("double"), 6).as("avg_logprob"))
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing every production count-LM — KenLM, the CCNet filter LMs —
    * actually ships): P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁·) +
    * D·N₁₊(w₁·)/c(w₁·) · P_cont(w₂), with the continuation probability
    * P_cont(w₂) = N₁₊(·w₂)/N₁₊(··) — "how many contexts does w₂ complete"
    * rather than raw frequency, the fix for the San-Francisco problem
    * that add-k smoothing (bigramScore) gets wrong. All counts derive
    * from ONE bigram aggregation (context totals, distinct continuations
    * and distinct contexts roll up from it); D = 0.75 is exact binary.
    *
    * Determinism: every probability is a fixed-order double formula from
    * exact integer counts; ln snaps to the 1e-12 grid, per-doc sums are
    * exact decimals (order-free), the mean is one division under
    * round(·, 6) after a round-to-1e-9 cast (the decimal→double
    * discipline). Out-of-train input degrades loudly-but-finitely:
    * unseen contexts back off to P_cont alone, and a fully-unseen pair
    * floors at 1e-12 before ln (self-scoring — the gate shape — never
    * hits either branch).
    *
    * Scale: counts are vocabulary/bigram-type-sized aggregations with
    * map-side combine; the scoring pass joins the scored bigram stream
    * against them (broadcast-sized for real vocabularies). */
  def kneserNeyScore(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val bi = bigrams(train, idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val ctx   = bi.groupBy(col("w1")).agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val cont  = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = bi.agg(count(lit(1)).as("nall"))
    val pc = coalesce(col("n1b"), lit(0L)).cast("double") / col("nall").cast("double")
    val p = when(
      coalesce(col("c1"), lit(0L)) > 0,
      (greatest(coalesce(col("c2"), lit(0L)).cast("double") - lit(discount), lit(0.0))
        + lit(discount) * col("n1f").cast("double") * pc) / col("c1").cast("double"))
      .otherwise(pc)
    bigrams(score, idCol, textCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .withColumn("logp", round(log(greatest(p, lit(1e-12))), 12).cast(dec12))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(sum(col("logp")), 9).as("s"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        round(col("s").cast("double") / col("n_bigrams").cast("double"), 6).as("avg_logprob"))
  }

  /** Witten–Bell interpolated bigram score (Witten & Bell 1991) — the
    * fourth count-LM smoothing beside add-k, Kneser–Ney and Good–Turing,
    * and the one with the cleanest intuition: the probability of a NOVEL
    * continuation after context w1 is estimated by how often w1 has
    * produced novel continuations so far (its distinct-continuation count
    * n1f), giving λ(w1) = c1/(c1+n1f) and p = (c2 + n1f·p_uni(w2)) /
    * (c1 + n1f); unseen contexts back off to the unigram. Same shape and
    * float discipline as [[kneserNeyScore]]: exact counts from one bigram
    * aggregation, fixed-order double p, grid-12 ln, exact decimal per-doc
    * sums, one division under round(·, 6). */
  def wittenBellScore(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val bi = bigrams(train, idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val ctx = bi.groupBy(col("w1")).agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val uni = train
      .select(explode(toks(col(textCol))).as("w2"))
      .groupBy(col("w2"))
      .agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum(col("cu")).as("ntok"))
    val pu = coalesce(col("cu"), lit(0L)).cast("double") / col("ntok").cast("double")
    val p = when(
      coalesce(col("c1"), lit(0L)) > 0,
      (coalesce(col("c2"), lit(0L)).cast("double") + col("n1f").cast("double") * pu) /
        (col("c1").cast("double") + col("n1f").cast("double")))
      .otherwise(pu)
    bigrams(score, idCol, textCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("logp", round(log(greatest(p, lit(1e-12))), 12).cast(dec12))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(sum(col("logp")), 9).as("s"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        round(col("s").cast("double") / col("n_bigrams").cast("double"), 6).as("avg_logprob"))
  }

  /** Good-Turing frequency re-estimation (Good 1953) — the third count-LM
    * smoothing beside add-k (bigramScore) and Kneser-Ney: the adjusted
    * count for words seen r times is r* = (r+1)·N_{r+1}/N_r over the
    * count-of-counts table, the estimator behind Katz backoff and the
    * classic "unseen mass = N₁/N" rule. Two aggregations — token counts,
    * then counts-of-counts — collapse the corpus to a model-sized table
    * (one row per distinct frequency); r* is ONE fixed-order double
    * formula from exact integers under round(·, 6), NULL where N_{r+1}=0
    * (the raw estimator's gaps are the caller's smoothing decision — we
    * report, not interpolate). Output: (r, n_r, r_star) ascending. */
  def goodTuring(df: DataFrame, textCol: String): DataFrame = {
    val counts = df
      .select(explode(toks(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("c"))
    val nr = counts.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
    val next = nr.select(col("r").as("r1"), col("n_r").as("n_r1"))
    nr
      .join(broadcast(next), col("r1") === col("r") + 1, "left")
      .select(
        col("r"),
        col("n_r"),
        round(
          ((col("r") + 1) * col("n_r1").cast("double")) / col("n_r").cast("double"),
          6).as("r_star"))
      .orderBy(col("r"))
  }

  /** CCNet-style head/middle/tail corpus partitioning (Wenzek et al. 2020
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): score every document under the in-corpus bigram LM, then cut
    * the score distribution at its terciles — "head" = most fluent
    * (highest avg log-prob, i.e. lowest perplexity; the slice CCNet keeps
    * for LM training), "tail" = least fluent (dropped or down-weighted),
    * "middle" between. Output: (doc_id, avg_logprob, bucket).
    *
    * Determinism: avg_logprob arrives on the round-6 grid from
    * [[bigramScore]]; the two boundaries are exact interpolated
    * percentiles rounded HALF_UP to 1e-4 driver-side (the
    * quantileBucketize discipline — interpolation's last-ulp freedom is
    * absorbed before any `<=` comparison), so bucket assignment is
    * engine-exact.
    *
    * Scale: the scored frame is localCheckpointed once (doc-count-sized —
    * one row per document) and feeds both the percentile pass and the
    * assignment, so the LM never trains twice; the percentile buffers one
    * DOUBLE per document, and at extreme document counts the boundary
    * pass (its only consumer) can swap to approx_percentile without
    * touching the assignment. */
  def perplexityBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val scored = bigramScore(docs, docs, idCol, textCol).localCheckpoint(true)
    val row = Corpus
      .spreadSmallInput(scored.select(col("avg_logprob")), col("avg_logprob"))
      .agg(percentile(col("avg_logprob"), lit(Array(1.0 / 3, 2.0 / 3))).as("bs"))
      .head()
    // percentile over ZERO rows (empty corpus, or every doc under 2
    // tokens) yields a null array — return the empty scored frame with
    // the bucket column instead of NPEing on getSeq
    if (row.isNullAt(0))
      return scored.select(col("doc_id"), col("avg_logprob"), lit("middle").as("bucket")).limit(0)
    val bounds = row.getSeq[Double](0).map(b =>
      java.math.BigDecimal.valueOf(b).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue)
    scored.select(
      col("doc_id"),
      col("avg_logprob"),
      when(col("avg_logprob") <= lit(bounds(0)), "tail")
        .when(col("avg_logprob") <= lit(bounds(1)), "middle")
        .otherwise("head")
        .as("bucket"))
  }

  /** PMI collocations (Church & Hanks 1990): adjacent-bigram pointwise
    * mutual information over the corpus token stream —
    * pmi(x,y) = ln( (c_xy/T) · (U/c_x) · (U/c_y) ) with c_xy the bigram
    * count (T total bigrams), c_x unigram counts (U total tokens). The
    * phrase-mining primitive ("new york"-style units worth fusing before
    * tokenizer training); `minCount` drops the unstable low-count tail,
    * which is ALSO the output bound (≤ T/minCount rows).
    *
    * Scale shape: two count tables (bigram- and vocab-sized, map-side
    * combined) and one broadcast join of the tiny unigram side into the
    * bigram frame — nothing pairs beyond observed bigrams. Float contract:
    * counts are exact ints; one ln over one IEEE-exact ratio chain in
    * matched evaluation order; emitted pmi rounds to 6. Returns
    * (w1, w2, n_xy, pmi). */
  def pmiCollocations(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val uni = Corpus
      .spreadSmallInput(docs, col(idCol))
      .select(explode(toks(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("c1"))
    val uniTot = uni.agg(sum(col("c1")).cast("long").as("u"))
    val bi = bigrams(Corpus.spreadSmallInput(docs, col(idCol)), idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    val biTot = bigrams(docs, idCol, textCol).agg(count(lit(1)).as("t"))
    bi
      .join(broadcast(uni.select(col("word").as("w1"), col("c1").as("cx"))), Seq("w1"))
      .join(broadcast(uni.select(col("word").as("w2"), col("c1").as("cy"))), Seq("w2"))
      .crossJoin(broadcast(uniTot))
      .crossJoin(broadcast(biTot))
      .select(
        col("w1"),
        col("w2"),
        col("n_xy"),
        round(
          log(
            (col("n_xy").cast("double") * col("u").cast("double") * col("u").cast("double")) /
              (col("t").cast("double") * col("cx").cast("double") * col("cy").cast("double"))),
          6).as("pmi"))
  }

  /** Multinomial Naive Bayes text classifier, trained AND served in-engine
    * (the learned sibling of the heuristic `text_langid` scorer — fastText
    * -style supervised lang/domain ID is exactly this shape, a linear
    * bag-of-words model): add-1-smoothed class-conditional token
    * log-probs + log priors, argmax per document.
    *
    * score(d, c) = ln(n_c/N) + Σ_t tf(d,t) · ln((cnt(c,t)+1)/(tot_c+V))
    *
    * Determinism (the lm_bigram discipline, hardened for argmax): each ln
    * is rounded HALF_UP to 1e-12 and cast to DECIMAL(20,12) BEFORE any
    * aggregation, tf multiplies as DECIMAL(6,0) (exact — product scale
    * stays 12, precision ≤ 27, no silent DecimalPrecision re-scale), so
    * per-(doc, class) scores are EXACT decimal sums in any engine at any
    * parallelism — the argmax (score DESC, class ASC) can never flip on
    * float order, which a plain double SUM could near a tie. Emitted
    * score decimal-rounds to scale 9 before the double cast (the DuckDB
    * scale-18 cast hazard recorded on [[Similarity.pcaFit]]).
    *
    * Scale shape: the model is (V·C + C) rows — token-vocab-sized count
    * tables (the [[bigramScore]] judgment), broadcast-joined into one
    * scoring pass over (doc, token, tf) rows crossed with C classes; one
    * doc-keyed aggregation, one bounded per-doc rank cut. Returns
    * (doc_id, predicted, score). */
  def naiveBayesClassify(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val decTf = org.apache.spark.sql.types.DecimalType(6, 0)

    val classes = train
      .groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    val nDocs = train.count()
    require(nDocs > 0, "naiveBayesClassify needs training documents")
    val priors = classes.select(
      col("cls"),
      round(log(col("n_docs").cast("double") / lit(nDocs.toDouble)), 12).cast(dec12).as("prior"))

    val trainTok = Corpus
      .spreadSmallInput(train, col(idCol))
      .select(col(labelCol).as("cls"), explode(toks(col(textCol))).as("token"))
    val cnt  = trainTok.groupBy(col("cls"), col("token")).agg(count(lit(1)).as("cnt"))
    val tot  = trainTok.groupBy(col("cls")).agg(count(lit(1)).as("tot"))
    val vsz  = cnt.select(col("token")).distinct().count()

    // class-conditional log-likelihood for EVERY (class, vocab token) cell
    // — including zero counts, which smooth to ln(1/(tot_c+V)); the model
    // is V·C rows, built by a vocab × classes cross of two tiny frames
    val vocab = cnt.select(col("token")).distinct()
    val logp = vocab
      .crossJoin(classes.select(col("cls")))
      .join(cnt, Seq("cls", "token"), "left")
      .join(tot, Seq("cls"))
      .select(
        col("cls"),
        col("token"),
        round(
          log(
            (coalesce(col("cnt"), lit(0L)).cast("double") + lit(1.0)) /
              (col("tot").cast("double") + lit(vsz.toDouble))),
          12).cast(dec12).as("logp"))

    val tf = Corpus
      .spreadSmallInput(score, col(idCol))
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // tokens unseen in training carry no vocabulary cell — standard NB
    // serve-time behavior is to ignore them (inner join drops them)
    val scores = tf
      .join(broadcast(logp), Seq("token"))
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("tf").cast(decTf) * col("logp")).as("ll"))
      .join(broadcast(priors), Seq("cls"))
      .select(col("doc_id"), col("cls"), (col("prior") + col("ll")).as("s"))
    import org.apache.spark.sql.expressions.Window
    scores
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("s").desc, col("cls").asc)))
      .filter(col("rk") === 1)
      .select(
        col("doc_id"),
        col("cls").as("predicted"),
        round(col("s"), 9).cast("double").as("score"))
  }
}
