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
}
