package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * No reference counterpart (SURVEY.md §2e) — these are the north-star
  * extensions (BASELINE.json). Every variant is designed for the 100 TB
  * shape:
  *
  *  - exact dedup: hash-groupBy — partial agg, one shuffle of (hash, id).
  *  - n-gram Jaccard: inverted shingle index self-join — never O(n²); the
  *    join fan-out is bounded by shingle document frequency (cap very
  *    frequent shingles with `maxShingleDF` at real scale).
  *  - MinHash + LSH banding: constant-size signature per doc (an
  *    Aggregator computes all K hashes in one pass over shingles — no K×
  *    row blowup), band-bucket self-join for candidates, exact verification
  *    on the candidates only. This is the scale path: cost ~ O(n·K + candidates).
  *  - SimHash: 64-bit signature via declarative per-bit sums (map-side
  *    partial agg), hamming-ball candidate search via 16-bit chunk banding.
  */
object Dedup {

  /** Cache hygiene for operators that share one scan across several plan
    * sides: materialize the RESULT with an eager local checkpoint (one job;
    * result blocks stored like a cached DF, lineage truncated, cleaned by
    * the ContextCleaner when the returned frame is dropped), then release
    * the temp caches — a long-lived session accumulates at most the live
    * results, never the scan-sharing intermediates. On a multi-executor
    * cluster prefer reliable checkpointing for multi-hour jobs (local
    * checkpoint blocks die with their executor). */
  private def materializeThenRelease(result: DataFrame, temps: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    temps.foreach(_.unpersist(false))
    out
  }

  /** Tokenize: split on whitespace runs, drop empties (same contract as
    * TextQueries — strings.Fields parity, src/node.go:929-931). */
  def tokensCol(text: Column): Column = filter(split(text, "\\s+"), t => length(t) > 0)

  /** w-token shingles of a token array, as strings ("a b c"). Callers ensure
    * size(tokens) >= w; indices 0..size-w each start one shingle. */
  def shinglesCol(tokens: Column, w: Int = 3): Column =
    transform(sequence(lit(0), size(tokens) - w), i => concat_ws(" ", slice(tokens, i + 1, lit(w))))

  /** (doc_id, shingle) rows, distinct per document — the inverted-index
    * input. Dedup happens INSIDE the row via array_distinct before the
    * explode: a narrow map-only stage, versus a full (doc_id, shingle)
    * distinct() which would shuffle every shingle string. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame = {
    val toks = tokensCol(col(textCol))
    // a small-file corpus scans as few partitions; spread the CPU-heavy
    // shingle generation across the cluster before exploding (no-op on a
    // well-split corpus — Corpus.spreadSmallInput)
    Corpus.spreadSmallInput(docs, col(idCol))
      .filter(size(tokensCol(col(textCol))) >= w)
      .select(col(idCol).as("doc_id"), explode(array_distinct(shinglesCol(toks, w))).as("shingle"))
  }

  /** (doc_id, h) rows — the HASHED shingle index: token w-grams hashed to
    * longs inside the transform lambda, never materialized as strings (the
    * "a b c" concat + per-shingle string allocation was ~half the scan
    * cost). Same distinct-within-row discipline as [[shingleRows]]; all
    * pair semantics downstream are hash-set equalities either way. */
  def shingleHashRows(docs: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame =
    Corpus.spreadSmallInput(docs, col(idCol))
      .filter(size(tokensCol(col(textCol))) >= w)
      .select(
        col(idCol).as("doc_id"),
        explode(array_distinct(shingleHashArrayCol(col(textCol), w))).as("h"))

  /** The hashed-shingle ARRAY column behind [[shingleHashRows]] — exposed
    * (pre-explode, pre-distinct) so stateless stream projections can
    * compute per-document shingle sets with bit-identical hash arithmetic
    * to the batch index (graft.streaming.DocStreams rides on it). */
  def shingleHashArrayCol(text: Column, w: Int = 3): Column = {
    val toks = tokensCol(text)
    transform(
      sequence(lit(0), size(toks) - w),
      i => xxhash64((0 until w).map(j => element_at(toks, i + j + 1)): _*))
  }

  /** Driver/executor-side MinHash signature of one document's shingle-hash
    * set — the EXACT per-element arithmetic of [[MinHashAgg]] (same
    * [[hashFamily]], same wrapping-long h = a·x + b, same element-wise
    * min), packaged for per-row use where no grouping is available (the
    * streaming near-dup tier computes one signature per arriving doc).
    * Equality with the batch aggregator is by construction: min over the
    * same multiset of the same hashes, in any order. */
  private[graft] def minhashSigOf(shingles: Array[Long], k: Int): Array[Long] = {
    val (fa, fb) = hashFamily(k)
    val buf = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < shingles.length) {
      val x = shingles(j)
      var i = 0
      while (i < k) { val h = fa(i) * x + fb(i); if (h < buf(i)) buf(i) = h; i += 1 }
      j += 1
    }
    buf
  }

  /** Exact dedup: group identical (normalized) texts, keep the smallest id.
    * At scale: group on the 128-bit digest, not the text itself, so the
    * shuffle carries 16 bytes per row instead of the document. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Token-SET dedup: documents with the same sorted distinct-token set
    * group together — the cheap order/repetition-insensitive exact tier
    * between byte-exact [[exact]] (misses any reordering) and
    * [[jaccardPairs]] (pays a pairwise join). Catches shuffled boilerplate
    * and word-repetition spam in ONE groupBy: the fingerprint is
    * md5(space-joined sorted distinct tokens), a pure narrow projection
    * before a hash-keyed count — the same zero-pairwise-cost shape as
    * exact dedup, at set semantics. */
  def bagExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(
        md5(concat_ws(" ", array_sort(array_distinct(tokensCol(col(textCol)))))).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * pairs sharing >=1 shingle, shared-count from the index join, set sizes
    * joined in, jaccard = shared / (|A| + |B| - shared).
    *
    * `maxShingleDF`: drop shingles appearing in more than this many docs
    * before pairing (0 = keep all). Near-dup pairs share many RARE shingles,
    * so a DF cap preserves recall while bounding the self-join fan-out —
    * at 100 TB this is the difference between a join and an explosion. The
    * oracle-checked query runs uncapped (exact semantics).
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      w: Int = 3,
      maxShingleDF: Int = 0): DataFrame = {
    // the shingle scan feeds the index twice (self-join) plus the size agg —
    // materialize it once instead of re-exploding the corpus three times.
    // (At 100 TB the index is written to storage and reused, same idea.)
    // Hashed end to end: the self-join shuffle carries 8 bytes/key and
    // compares longs (collision odds ~ n²/2⁶⁴ — the same contract the
    // MinHash verification path accepts), and no shingle string is ever
    // allocated.
    val rows = shingleHashRows(docs, idCol, textCol, w).cache()
    // broadcast the HOT shingles being dropped (tiny: only boilerplate
    // exceeds the cap) and anti-join — the keep-set is O(distinct shingles)
    // and could never broadcast at corpus scale
    val index = if (maxShingleDF > 0) {
      val hot =
        rows.groupBy(col("h")).agg(count(lit(1)).as("df")).filter(col("df") > maxShingleDF).select("h")
      rows.join(broadcast(hot), Seq("h"), "left_anti")
    } else rows
    val sizes = rows.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))

    val a = index.select(col("doc_id").as("a_id"), col("h"))
    val b = index.select(col("doc_id").as("b_id"), col("h"))
    val shared = a
      .join(b, Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"))

    materializeThenRelease(
      shared
        .join(sizes.select(col("doc_id").as("a_id"), col("n_shingles").as("na")), Seq("a_id"))
        .join(sizes.select(col("doc_id").as("b_id"), col("n_shingles").as("nb")), Seq("b_id"))
        .withColumn("jacc", col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
        .filter(col("jacc") >= threshold)
        .select(col("a_id"), col("b_id"), col("jacc")),
      rows)
  }

  /** Exact Jaccard join via prefix filtering (AllPairs, Bayardo et al.
    * WWW'07; positional filter from PPJoin, Xiao et al. WWW'08): the same
    * exact output as [[jaccardPairs]] but with candidate generation that
    * survives corpus scale WITHOUT sacrificing exactness.
    *
    * [[jaccardPairs]] joins the FULL inverted index against itself — the
    * fan-out of a shingle shared by d docs is d², so common shingles
    * explode and the `maxShingleDF` cap trades exactness for survival.
    * Prefix filtering keeps exactness: order each doc's shingles by
    * (global document frequency asc, hash asc) and index only the first
    * n − ⌈t·n⌉ + 1 of them. Any pair with J ≥ t MUST share a prefix
    * shingle (if A's prefix misses B entirely, overlap ≤ ⌈t·nₐ⌉ − 1, but
    * J ≥ t forces overlap ≥ t·nₐ — pigeonhole), so no true pair is lost —
    * and prefixes hold each doc's RAREST shingles, so the d² blow-up never
    * sees the hot keys that forced the cap. Candidates are then pruned by
    * the length filter (t·max(nₐ,n_b) ≤ min(nₐ,n_b)) and the positional
    * upper bound (overlap ≤ 1 + min(nₐ−pₐ, n_b−p_b) must reach
    * ⌈t(nₐ+n_b)/(1+t)⌉), and exact shared counts verify survivors.
    *
    * The per-doc ordering is a doc-partitioned window (no global sort; the
    * frequency table is vocab-sized). ⌈t·n⌉ is computed as ceil(t·n − 1e−6):
    * the epsilon absorbs FP noise on rational thresholds and errs toward a
    * LONGER prefix — more candidates, never a missed pair. */
  def prefixJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      w: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1]: $threshold")
    val rows = shingleHashRows(docs, idCol, textCol, w).cache()
    val freq = rows.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val sizes = rows.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    def ceilT(n: Column): Column = ceil(n * lit(threshold) - lit(1e-6))

    val ordered = rows
      .join(freq, Seq("h"))
      .withColumn(
        "p",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .join(sizes, Seq("doc_id"))
    val prefix = ordered.filter(col("p") <= col("n") - ceilT(col("n")) + 1)

    // candidate pairs: shared prefix shingle, length filter, positional bound
    val a = prefix.select(col("doc_id").as("a_id"), col("h"), col("p").as("pa"), col("n").as("na"))
    val b = prefix.select(col("doc_id").as("b_id"), col("h"), col("p").as("pb"), col("n").as("nb"))
    val minOverlap = ceil((col("na") + col("nb")) * lit(threshold / (1.0 + threshold)) - lit(1e-6))
    val cand = a
      .join(b, Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("nb") >= ceilT(col("na")) && col("na") >= ceilT(col("nb")))
      .groupBy(col("a_id"), col("b_id"))
      .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >= minOverlap)
      .select(col("a_id"), col("b_id"), col("na"), col("nb"))

    // exact verification: shared counts computed ONLY for surviving pairs
    val shared = cand
      .join(rows.select(col("doc_id").as("a_id"), col("h")), Seq("a_id"))
      .join(rows.select(col("doc_id").as("b_id"), col("h")), Seq("b_id", "h"))
      .groupBy(col("a_id"), col("b_id"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))

    materializeThenRelease(
      shared
        .withColumn("jacc", col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
        .filter(col("jacc") >= threshold)
        .select(col("a_id"), col("b_id"), col("jacc")),
      rows)
  }

  /** Candidate-pair count of the prefix-filtered plan vs the full inverted
    * index — the spec pins that prefix filtering generates strictly fewer
    * candidates while [[prefixJaccardPairs]] ≡ [[jaccardPairs]] exactly. */
  private[graft] def prefixCandidateCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      w: Int = 3): (Long, Long) = {
    val rows  = shingleHashRows(docs, idCol, textCol, w).cache()
    val freq  = rows.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val sizes = rows.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val ordered = rows
      .join(freq, Seq("h"))
      .withColumn(
        "p",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .join(sizes, Seq("doc_id"))
    val prefix = ordered.filter(col("p") <= col("n") - ceil(col("n") * lit(threshold) - lit(1e-6)) + 1)
    def pairCount(idx: DataFrame): Long = idx
      .select(col("doc_id").as("a_id"), col("h"))
      .join(idx.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
      .count()
    val res = (pairCount(prefix), pairCount(rows))
    rows.unpersist()
    res
  }

  /** Asymmetric containment near-dup pairs: containment(inner ⊂ outer) =
    * |S_inner ∩ S_outer| / |S_inner| ≥ threshold — the subset/quote
    * detector symmetric Jaccard structurally misses (a 200-token doc fully
    * quoted inside a 10 000-token doc has jaccard ≈ 0.02 but containment
    * = 1.0; RealNews/CC curation drops exactly these). Directional output:
    * (inner_id, outer_id, containment), up to two rows per unordered pair.
    *
    * Same inverted hashed-shingle index, DF-cap discipline, and one-pass
    * shared-count join as [[jaccardPairs]] — the unordered pair counts are
    * computed ONCE and both directions derive from the same row, so the
    * asymmetric variant costs one extra narrow union, not a second join. */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      w: Int = 3,
      maxShingleDF: Int = 0): DataFrame = {
    val rows = shingleHashRows(docs, idCol, textCol, w).cache()
    val index = if (maxShingleDF > 0) {
      val hot =
        rows.groupBy(col("h")).agg(count(lit(1)).as("df")).filter(col("df") > maxShingleDF).select("h")
      rows.join(broadcast(hot), Seq("h"), "left_anti")
    } else rows
    val sizes = rows.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val shared = index.select(col("doc_id").as("a_id"), col("h"))
      .join(index.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"))
    val withSizes = shared
      .join(sizes.select(col("doc_id").as("a_id"), col("n_shingles").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n_shingles").as("nb")), Seq("b_id"))
    val directional = withSizes
      .select(
        col("a_id").as("inner_id"),
        col("b_id").as("outer_id"),
        (col("shared").cast("double") / col("na")).as("containment"))
      .unionAll(withSizes.select(
        col("b_id").as("inner_id"),
        col("a_id").as("outer_id"),
        (col("shared").cast("double") / col("nb")).as("containment")))
    materializeThenRelease(directional.filter(col("containment") >= threshold), rows)
  }

  /** Sorted-neighborhood entity-resolution pairs (Hernández & Stolfo 1995):
    * records sorted by a blocking key, candidates = pairs within `window`
    * positions, verified by Levenshtein ≤ `maxDist` — the classic
    * record-linkage blocking scheme for TYPO-level duplicates that token-
    * set methods (Jaccard/MinHash) dilute and LSH may miss (a one-char
    * edit barely moves a sorted position but can flip many shingles).
    *
    * Distributed form: the sort window runs WITHIN hash-blocks (first
    * `blockLen` chars of the key), so no global single-partition window
    * exists anywhere in the plan; pairs straddling a block boundary are
    * traded away exactly like the classic multi-pass scheme trades
    * sort-boundary misses (run again with a different key to recover —
    * standard SN practice, Herzog et al. 2007 ch. 12). Cost: one
    * block-keyed shuffle, w·n candidate rows, edit distance only on
    * candidates. */
  def sortedNeighborPairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int = 3,
      maxDist: Int = 5,
      blockLen: Int = 1): DataFrame = {
    require(window >= 1 && maxDist >= 0 && blockLen >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("block"))
      .orderBy(col("key"), col("id"))
    val ranked = df
      .select(col(idCol).as("id"), col(keyCol).as("key"))
      .withColumn("block", substring(col("key"), 1, blockLen))
      .withColumn("rn", row_number().over(w))
      // rank bucket of width `window`: a window partner sits in the same
      // bucket or the next one, so the join can carry (block, bucket) as
      // EQUALITY keys — without it Spark hash-joins on `block` alone and
      // the per-block cross product is quadratic (measured 34 s at sf0.1;
      // bucketed: linear in w·n)
      .withColumn("bucket", floor(col("rn") / window))
    val probes = ranked.withColumn("jb", explode(array(col("bucket"), col("bucket") + 1)))
    probes.as("x")
      .join(
        ranked.as("y"),
        col("x.block") === col("y.block") && col("x.jb") === col("y.bucket") &&
          col("y.rn") > col("x.rn") && col("y.rn") <= col("x.rn") + window)
      .select(
        col("x.id").as("a_id"),
        col("y.id").as("b_id"),
        levenshtein(col("x.key"), col("y.key")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Incremental near-dup detection: Jaccard pairs between a NEW batch and
    * an existing corpus (old ∪ new), never re-pairing old×old — the daily-
    * ingestion shape. `oldIndex` is a persisted (doc_id, h) hashed-shingle
    * index ([[shingleHashRows]] output written once per batch); cost is
    * O(new·index-hit) instead of a full-corpus recompute.
    *
    * Output contract matches [[jaccardPairs]] (canonical a_id < b_id rows,
    * jacc >= threshold) restricted to pairs with >=1 new document. */
  def incrementalJaccardPairs(
      newDocs: DataFrame,
      oldIndex: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      w: Int = 3): DataFrame = {
    val newRows = shingleHashRows(newDocs, idCol, textCol, w).cache()
    materializeThenRelease(
      incrementalJaccardPairsFromIndexes(newRows, oldIndex, threshold),
      newRows)
  }

  /** Same contract with BOTH sides as prepared (doc_id, h) indexes — the
    * pure stored-index path (e.g. partitions of one persisted corpus
    * index), no document scan at all. */
  def incrementalJaccardPairsFromIndexes(
      newRows: DataFrame,
      oldIndex: DataFrame,
      threshold: Double): DataFrame = {
    val all = oldIndex
      .select(col("doc_id"), col("h"))
      .withColumn("is_new", lit(false))
      .union(newRows.select(col("doc_id"), col("h")).withColumn("is_new", lit(true)))
    val sizes = all.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))

    val a = newRows.select(col("doc_id").as("x_id"), col("h"))
    val b = all.select(col("doc_id").as("y_id"), col("h"), col("is_new"))
    // count each unordered pair ONCE: new-new pairs only from the x<y side;
    // new-old pairs only ever appear with the old doc on the y side
    val shared = a
      .join(b, Seq("h"))
      .filter(col("x_id") < col("y_id") || (!col("is_new") && col("x_id") =!= col("y_id")))
      .select(least(col("x_id"), col("y_id")).as("a_id"), greatest(col("x_id"), col("y_id")).as("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"))

    shared
      .join(sizes.select(col("doc_id").as("a_id"), col("n_shingles").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n_shingles").as("nb")), Seq("b_id"))
      .withColumn("jacc", col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  // ------------------------------------------------------------ MinHash/LSH

  /** Deterministic 2-universal hash family over a 64-bit base hash:
    * h_i(x) = a_i * x + b_i (wrapping Long arithmetic — deterministic and
    * uniform enough for MinHash). Coefficients from a fixed splitmix64
    * stream, identical on every executor and every run. */
  private[operators] def hashFamily(k: Int): (Array[Long], Array[Long]) = {
    def splitmix(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.tabulate(k)(i => splitmix(2L * i) | 1L) // odd => bijective mod 2^64
    val b = Array.tabulate(k)(i => splitmix(2L * i + 1))
    (a, b)
  }

  /** Aggregator: element-wise-min MinHash signature of a group of shingle
    * hashes. One pass, K mins per row, fixed K*8-byte buffer — no row
    * blowup, partial-aggregates map-side like any Aggregator. */
  final class MinHashAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    private val (fa, fb) = hashFamily(k)
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < k) { val h = fa(i) * x + fb(i); if (h < buf(i)) buf(i) = h; i += 1 }
      buf
    }
    override def merge(p: Array[Long], q: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (q(i) < p(i)) p(i) = q(i); i += 1 }
      p
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** (doc_id, sig: Array[Long] of length k) MinHash signatures. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String, k: Int = 128, w: Int = 3): DataFrame =
    minhashSignaturesFromRows(shingleHashRows(docs, idCol, textCol, w), k)

  /** Signature computation from a prepared (doc_id, h) hashed-shingle index
    * — lets callers share one shingle scan across signatures and
    * verification. The Aggregator runs as a udaf over the ORIGINAL id
    * column (any type groups correctly — a lossy cast-to-long would
    * silently collapse non-numeric ids into one NULL group). */
  def minhashSignaturesFromRows(shingles: DataFrame, k: Int): DataFrame = {
    val mh = udaf(new MinHashAgg(k), Encoders.scalaLong)
    shingles.groupBy(col("doc_id")).agg(mh(col("h")).as("sig"))
  }

  /** LSH banding: candidate pairs whose signatures collide in >=1 of
    * `bands` bands (rows-per-band = k/bands). P(candidate | j) =
    * 1-(1-j^r)^b — with k=128, b=32, r=4 a true-jaccard-0.8 pair is missed
    * with probability ~5e-8. */
  def lshCandidates(sigs: DataFrame, k: Int = 128, bands: Int = 32, maxBucketDF: Int = 0): DataFrame = {
    val (banded, joined) = lshCandidatePlan(sigs, k, bands, maxBucketDF)
    materializeThenRelease(joined, banded)
  }

  /** The un-materialized [[lshCandidates]] plan, as (cached banded
    * projection, candidate join) — exposed so tests can execute the LIVE
    * band-bucket self-join and inspect its final adaptive plan (the
    * materialized wrapper localCheckpoints, hiding the join behind a
    * checkpoint scan). Callers must unpersist `banded` after consuming
    * the join.
    *
    * Hot-bucket discipline (an identical-doc flood lands ALL its rows on
    * one (band, bucket) key — SkewAndBucketSpec's fixture): the blowup is
    * OUTPUT-side — m docs in a bucket emit m²/2 candidate rows from one
    * join key, which input-size-based AQE skew splitting cannot see (and
    * at toy scale cannot even detect: identical rows compress to almost
    * nothing in the map output sizes it inspects). Defenses, layered the
    * way published pipelines run them:
    *  1. exact-dedup FIRST ([[exactDedup]]) — byte-identical floods never
    *     reach near-dup LSH;
    *  2. `maxBucketDF` > 0 drops buckets shared by more than that many
    *     docs (the [[jaccardPairs]] maxShingleDF judgment applied to
    *     bands): a bucket hot beyond plausibility is boilerplate, and a
    *     TRUE near-dup pair inside a dropped bucket still surfaces via
    *     its other `bands − 1` chances to collide;
    *  3. input-size skew that remains (big-but-legitimate buckets at
    *     production scale, where map sizes are honest) is AQE
    *     skew-splittable — the join is a plain shuffled equi-join. */
  def lshCandidatePlan(
      sigs: DataFrame,
      k: Int = 128,
      bands: Int = 32,
      maxBucketDF: Int = 0): (DataFrame, DataFrame) = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    // cached: both sides of the bucket self-join read this projection
    val banded = sigs
      .select(
        col("doc_id"),
        posexplode(array((0 until bands).map(b => slice(col("sig"), b * r + 1, r)): _*)))
      .select(
        col("doc_id"),
        col("pos").as("band"),
        // xxhash64 hashes complex types natively — no string round-trip
        xxhash64(col("pos"), col("col")).as("bucket"))
      .cache()
    // the cap removes the HOT buckets — broadcast THAT set (tiny by
    // construction: only floods exceed it) and anti-join, never the
    // unbounded keep-set of ordinary buckets
    val index = if (maxBucketDF > 0) {
      val hot = banded
        .groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > maxBucketDF)
        .select("band", "bucket")
      banded.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    } else banded
    val joined = index
      .as("x")
      .join(index.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    (banded, joined)
  }

  /** MinHash+LSH near-dup pairs, exactly verified: LSH proposes candidates,
    * then the true jaccard (over shingle-hash sets) confirms — output is
    * (a_id, b_id, jacc) with jacc >= threshold, i.e. the same contract as
    * [[jaccardPairs]] but at signature cost instead of index-join cost. */
  def minhashDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 128,
      bands: Int = 32,
      w: Int = 3): DataFrame = {
    // ONE shingle scan feeds both the signatures and the verification sets
    val rows       = shingleHashRows(docs, idCol, textCol, w).cache()
    val sigs       = minhashSignaturesFromRows(rows, k)
    val candidates = lshCandidates(sigs, k, bands)
    val sets = rows
      .groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("hs"))
    materializeThenRelease(
      candidates
        .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha")), Seq("a_id"))
        .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb")), Seq("b_id"))
        .withColumn("shared", size(array_intersect(col("ha"), col("hb"))))
        .withColumn("jacc", col("shared").cast("double") / (size(col("ha")) + size(col("hb")) - col("shared")))
        .filter(col("jacc") >= threshold)
        .select(col("a_id"), col("b_id"), col("jacc")),
      rows)
  }

  /** Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969)
    * — the PROBABILISTIC layer over blocked candidate pairs that the
    * deterministic ER tiers (exact digests, sorted-neighborhood windows,
    * jaccard thresholds) don't give: each comparison field carries an
    * agreement weight ln(m/u) and a disagreement weight ln((1−m)/(1−u))
    * (m = P(agree | same entity), u = P(agree | different)); a pair's
    * score is the sum over fields and the classic three-way decision
    * cuts at the two thresholds — match / possible (clerical review) /
    * nonmatch.
    *
    * Determinism/replay: the weights are the ln values on the 1e-12
    * decimal grid (the NB-scorer discipline), the score an EXACT decimal
    * sum of literals selected by the boolean agreement columns, and the
    * thresholds decimal compares — so scores and decisions replay in an
    * external engine bit for bit. Scale shape: a pure narrow projection
    * over the caller's (already blocked) pair table — the quadratic risk
    * lives in blocking, which the caller controls with the same
    * block-key judgment as [[sortedNeighborPairs]]. */
  def fellegiSunterScores(
      pairs: DataFrame,
      fields: Seq[(String, Double, Double)],
      upper: Double,
      lower: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    fields.foreach { case (n, m, u) =>
      require(0.0 < u && u < m && m < 1.0, s"field $n: need 0 < u < m < 1, got m=$m u=$u")
    }
    require(lower < upper, s"thresholds must satisfy lower < upper, got $lower >= $upper")
    def grid12(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x).setScale(12, java.math.RoundingMode.HALF_UP)
    val score = fields
      .map { case (name, m, u) =>
        when(col(name), lit(grid12(math.log(m / u))))
          .otherwise(lit(grid12(math.log((1 - m) / (1 - u)))))
      }
      .reduce(_ + _)
    val upD = lit(java.math.BigDecimal.valueOf(upper))
    val loD = lit(java.math.BigDecimal.valueOf(lower))
    pairs
      .withColumn("__score", score)
      .select(
        (pairs.columns.map(col) :+
          col("__score").cast("double").as("score") :+
          when(col("__score") >= upD, lit("match"))
            .when(col("__score") <= loD, lit("nonmatch"))
            .otherwise(lit("possible"))
            .as("decision")): _*)
  }

  /** Keep-first near-dup DECISIONS: every document that near-duplicates an
    * EARLIER (smaller-id) document, with its earliest such partner and the
    * exact verified jaccard against it — (doc_id, anchor_id, jacc). This
    * is the batch twin of the streaming near-dup tier
    * (graft.streaming.DocStreams.nearDupPairStream): a stream that flags
    * each arriving doc against already-seen anchors converges to exactly
    * this table when ids arrive in order, so the two are pinned equal
    * (StreamingSpec) and the batch row is the replayable gate. Same
    * propose/verify contract as [[minhashDupPairs]] — the oracle is the
    * exact-jaccard computation; LSH changes the plan, not the answer. */
  def nearDupFlags(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 128,
      bands: Int = 32,
      w: Int = 3): DataFrame = {
    val pairs = minhashDupPairs(docs, idCol, textCol, threshold, k, bands, w)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b_id"))
      .orderBy(col("a_id"))
    pairs
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("b_id").as("doc_id"), col("a_id").as("anchor_id"), col("jacc"))
  }

  // ------------------------------------------------------------- winnowing

  /** Positional near-dup pairs via winnowing fingerprints (Schleimer et al.,
    * MOSS): docs sharing >= `minShared` winnowed k-gram hashes. Guarantee:
    * any common substring of length >= k+w-1 bytes produces a shared
    * fingerprint — catches copied PASSAGES that set-based Jaccard dilutes
    * away in long documents. Same inverted-index join shape as
    * [[jaccardPairs]]: fingerprints per doc are O(len/w), the self-join is
    * bounded by fingerprint document frequency. */
  def winnowDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Int,
      k: Int = 8,
      w: Int = 16,
      maxFpDF: Int = 100): DataFrame = {
    val fps = Corpus.spreadSmallInput(docs, col(idCol))
      .select(
        col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.winnow_fingerprints(col(textCol), k, w)).as("fp"))
      .cache()
    // boilerplate fingerprints (shared across > maxFpDF docs) say nothing
    // about pairwise duplication but dominate the self-join fan-out — the
    // same DF-cap judgment as jaccardPairs' maxShingleDF (0 = keep all)
    val index = if (maxFpDF > 0) {
      val hot =
        fps.groupBy(col("fp")).agg(count(lit(1)).as("df")).filter(col("df") > maxFpDF).select("fp")
      fps.join(broadcast(hot), Seq("fp"), "left_anti")
    } else fps
    val a = index.select(col("doc_id").as("a_id"), col("fp"))
    val b = index.select(col("doc_id").as("b_id"), col("fp"))
    materializeThenRelease(
      a.join(b, Seq("fp"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= minShared),
      fps)
  }

  // ----------------------------------------------------- duplicate clusters

  /** Connected components over near-dup pairs: every document gets the
    * minimum doc_id reachable through the duplicate graph — the canonical
    * representative of its duplicate cluster.
    *
    * Two execution paths, chosen by edge count:
    *  - The duplicate-pair graph is orders of magnitude smaller than the
    *    corpus (it only contains documents WITH a near-dup). Below
    *    `localThreshold` edges it is collected once and solved with
    *    union-find on the driver — O(E α), one job. This is the same
    *    bounded-collect judgment call as a broadcast join, with the bound
    *    explicit.
    *  - Above the threshold: iterative distributed min-label propagation
    *    (label(v) = min over v ∪ neighbors), two shuffles per round,
    *    rounds = graph diameter, convergence-checked. The
    *    large-star/small-star alternation is the upgrade path for extreme
    *    diameters.
    */
  def duplicateClusters(
      pairs: DataFrame,
      maxIter: Int = 50,
      localThreshold: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    val edgePairs = pairs.select(col("a_id").cast("long"), col("b_id").cast("long")).cache()

    // one job decides the path AND fetches the edges: limit(T+1) either
    // returns every edge (<=T: solve locally) or proves there are more
    val sample = edgePairs.limit(localThreshold.toInt + 1).collect()
    if (sample.length <= localThreshold) {
      // driver union-find over the (small) duplicate graph
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      sample.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        else { parent.getOrElseUpdate(a, ra); parent.getOrElseUpdate(b, rb) }
      }
      val members = parent.keySet ++ parent.values
      val rows    = members.toSeq.map(id => (id, find(id)))
      edgePairs.unpersist(false)
      import spark.implicits._
      rows.toDF("doc_id", "cluster_id")
    } else {
      val (labels, _) =
        starComponents(edgePairs.select(col("a_id").as("a"), col("b_id").as("b")), maxIter, checkpointDir)
      edgePairs.unpersist(false)
      labels
    }
  }

  /** Canonical-document (survivor) selection per duplicate cluster — the
    * action [[duplicateClusters]]'s labels drive: of each cluster keep the
    * longest document (most content), ties broken toward the smallest id.
    * Documents outside every cluster are their own singleton cluster and
    * survive trivially. Output: one row per INPUT document —
    * (doc_id, cluster_id, keep_id); the deduplicated corpus is
    * `filter(doc_id === keep_id)`, kept fully declarative here so callers
    * can also audit what was dropped and why.
    *
    * Scale shape: one left join docs⋈labels (labels are pair-graph-sized,
    * usually broadcast-able; Catalyst picks), then a window partitioned by
    * cluster_id. Cluster partitions are near-dup groups — bounded small by
    * construction (a cluster spanning a meaningful fraction of a 100 TB
    * corpus means the dedup threshold, not this operator, is wrong) — and
    * singletons are one-row partitions, so the window never concentrates
    * data. */
  def canonicalDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      clusters: DataFrame): DataFrame = {
    val labels = clusters.select(col("doc_id").as("_cd_id"), col("cluster_id").as("_cd_cluster"))
    val labeled = docs
      .select(col(idCol).cast("long").as("doc_id"), length(col(textCol)).as("_cd_len"))
      .join(labels, col("doc_id") === col("_cd_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("_cd_cluster"), col("doc_id")).as("cluster_id"),
        col("_cd_len"))
    val w = Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("_cd_len").desc, col("doc_id"))
    labeled
      .withColumn("keep_id", first(col("doc_id")).over(w))
      .select(col("doc_id"), col("cluster_id"), col("keep_id"))
  }

  /** Distributed connected components via large-star / small-star
    * alternation (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): each round contracts every node toward its neighborhood
    * minimum, halving component "height" — O(log n) rounds on ANY graph
    * shape, where plain min-label propagation needs O(diameter) rounds
    * (a 10⁶-long chain of near-dup shards would take 10⁶ shuffles).
    *
    *  - large-star: per node u, connect every LARGER neighbor to
    *    m = min(Γ(u) ∪ u).
    *  - small-star: per node u (edges directed larger→smaller), connect
    *    every smaller neighbor and u itself to m = min(Γ⁻(u) ∪ u).
    *
    * Each round is materialized EAGERLY (checkpoint) and the previous
    * round's blocks are released only afterwards — no recompute-through-
    * unpersisted-lineage chains, and (crucially for an iterative algorithm)
    * the logical plan stays CONSTANT depth: each round's plan references
    * the previous edge set twice, so building lazily on a cache would grow
    * the plan tree ~4× per round — exponential analysis cost by round ~10.
    *
    * Checkpoint mode: by default `localCheckpoint` — fastest, but a lost
    * executor loses blocks → job restart. Pass `checkpointDir` for RELIABLE
    * checkpoints (HDFS/object-store) on multi-hour cluster runs: each
    * round's edge set is written to durable storage, so executor loss
    * replays only the current round. Convergence = the canonical edge set
    * reaches its fix-point (every component a star rooted at its minimum),
    * detected by an order-insensitive (count, xor-of-hash) signature — a
    * false fix-point needs a 64-bit hash-xor collision at equal counts
    * (~2⁻⁶⁴, vanishing at any corpus). If `maxIter` rounds pass without
    * the signature converging, the star-labeling would silently emit
    * INCONSISTENT cluster ids — so this THROWS instead (O(log n) bound:
    * any graph that needs >50 rounds indicates a bug, not a big input).
    *
    * Returns (labels: doc_id → cluster_id = component min, rounds run).
    */
  private[graft] def starComponents(
      pairs: DataFrame,
      maxIter: Int = 50,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val st = IterState(pairs, checkpointDir)
    def materialize(df: DataFrame): DataFrame = st.mat(df)
    def release(df: DataFrame): Unit = st.release(df)

    def canon(df: DataFrame): DataFrame =
      df.select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()

    // order-insensitive set signature (count + XOR of per-edge hashes —
    // XOR never overflows under ANSI mode and the edge set is distinct, so
    // multiplicity cancellation cannot occur); cheap: runs over the
    // already-materialized checkpoint blocks
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(lo, hi))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val m = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u")) // m <= u < v: emitted edge is canonical
        .select(col("m").as("a"), col("v").as("b"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("hi").agg(min(col("lo")).as("m"))
      e.join(m, "hi")
        .select(col("m").as("a"), col("lo").as("b")) // smaller neighbors → m
        .union(m.select(col("m").as("a"), col("hi").as("b"))) // u itself → m
    }

    var edges  = materialize(canon(pairs))
    var sig    = signature(edges)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next    = materialize(canon(smallStar(canon(largeStar(edges)))))
      val nextSig = signature(next)
      release(edges) // only now is the old round droppable
      edges = next
      converged = nextSig == sig
      sig = nextSig
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"starComponents did not reach its fix-point within $maxIter rounds " +
          s"(edge-set signature still changing: $sig). Emitting labels from a " +
          "non-star edge set would produce inconsistent cluster ids; raise " +
          "maxIter only if the O(log n) bound genuinely needs it.")
    // fix-point shape: each component is a star (root=min, leaves=rest)
    val leafLabels = edges
      .groupBy(col("hi").as("doc_id"))
      .agg(min(col("lo")).as("cluster_id"))
    val rootLabels = edges
      .select(col("lo").as("doc_id"))
      .distinct()
      .join(leafLabels.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    val out = materialize(leafLabels.unionByName(rootLabels))
    release(edges)
    (out, rounds)
  }

  // --------------------------------------------------------------- SimHash

  /** Aggregator: 64 SimHash bit-counters updated in one tight loop per
    * token hash — one typed agg column instead of 64 conditional sums (the
    * declarative form planned 64 agg expressions; this buffer partial-
    * aggregates identically but evaluates ~10× less plan machinery). */
  final class SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(buf: Array[Int], h: Long): Array[Int] = {
      var j = 0
      while (j < 64) { if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1; j += 1 }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { a(j) += b(j); j += 1 }
      a
    }
    override def finish(buf: Array[Int]): Long = {
      var sig = 0L
      var j   = 0
      while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** 64-bit SimHash per document: per-bit weighted sums of token hashes via
    * [[SimHashAgg]] (map-side partial agg, O(1) state per doc). Groups on
    * the ORIGINAL id column — any id type keys correctly.
    *
    * The token hash is the PORTABLE roll_hash∘mix64 pair, not xxhash64: a
    * SimHash signature is part of the operator's persisted contract (stored
    * next to the corpus, compared across ingestion batches), so it must be
    * recomputable by any engine — and the DuckDB oracle replays it bit for
    * bit (HUGEINT mod-2^64 arithmetic), making the whole near-dup query
    * hash-checkable instead of rows-only. Codegen cost is on par with
    * xxhash64 (both are a few multiplies/shifts per token). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = udaf(new SimHashAgg(), Encoders.scalaLong)
    // term frequency weighting is implicit: summing ±1 per OCCURRENCE equals
    // the per-(doc,token)-count weighted sum, one shuffle cheaper
    Corpus.spreadSmallInput(docs, col(idCol))
      .select(col(idCol).as("doc_id"), explode(tokensCol(col(textCol))).as("tok"))
      .select(col("doc_id"), graft.functions.TextFunctions.portable_hash64(col("tok")).as("h"))
      .groupBy(col("doc_id"))
      .agg(sh(col("h")).as("simhash"))
  }

  /** SimHash near-dup candidate pairs with hamming distance <= maxDist,
    * found by 16-bit chunk banding (pigeonhole: distance <=3 pairs collide
    * in >=1 of 4 chunks), then exact popcount verification.
    *
    * The chunk self-join is quadratic in bucket occupancy, same shape as
    * [[lshCandidatePlan]]'s band join — and with only 2^16 buckets per
    * chunk position, a degenerate corpus (boilerplate-heavy or near-empty
    * docs whose chunks collapse to the same value, classically 0x0000)
    * floods one bucket. `maxBucketDF > 0` drops (pos, chunk) buckets
    * shared by more than that many docs, the same hot-set-broadcast-as-
    * LeftAnti discipline as lshCandidates: only the hot keys travel (tiny
    * by construction), never the keep-set, and a true near-dup pair in a
    * dropped bucket still has its other 3 chunks to collide on. At corpus
    * scale where EVERY bucket legitimately exceeds any cap (n >> 4·2^16),
    * 16-bit banding itself is the wrong tool — widen the chunks (Manku
    * et al. 2007 use permuted tables with ~2^30-bucket prefixes); the cap
    * defends the mid-scale regime where only degenerate buckets are hot.
    *
    * The cached chunk projection also makes the expensive tokenize +
    * [[SimHashAgg]] chain run ONCE instead of once per join side. */
  def simhashDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucketDF: Int = 0): DataFrame = {
    // cache the SIGNATURES, not the 4×-exploded chunks: one (id, long) row
    // per doc is the smallest artifact that lets the expensive tokenize +
    // SimHashAgg chain run once across the hot-bucket agg and both join
    // sides; the chunk projection is a free posexplode on top
    val sigs = simhash(docs, idCol, textCol).cache()
    val (_, result) = simhashDupPairPlan(sigs, maxDist, maxBucketDF)
    materializeThenRelease(result, sigs)
  }

  /** Wide-key SimHash banding (Manku et al. WWW'07, "Detecting
    * near-duplicates for web crawling"): the PRODUCTION-scale answer to the
    * 16-bit chunk ceiling documented on [[simhashDupPairs]]. The 64-bit
    * signature splits into 6 blocks (11,11,11,11,10,10 bits); a pair within
    * hamming distance 3 differs in ≤3 blocks, so for at least one of the
    * C(6,3)=20 block-triples both signatures agree on all three blocks —
    * band on each triple's concatenated ~32-bit key and every true pair is
    * GUARANTEED to collide somewhere (exact recall, no LSH miss
    * probability), then exact popcount verifies. 2^30–2^33 buckets per
    * table means no bucket is legitimately hot until ~10^10 docs — the
    * regime where 4·2^16 chunk buckets all flood and any DF cap starts
    * dropping true pairs. Cost: 20 index rows/doc vs 4 — the classic
    * space-for-exactness trade the paper makes (they store 20 permuted
    * tables for the same reason).
    *
    * Because the output is exactly {pairs : hamming ≤ maxDist}, the oracle
    * is the signature replay + brute hamming join — banding-independent,
    * a stronger contract than the banding-dependent maxDist=8 query. */
  def simhashDupPairsWide(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3, s"6-block triple banding guarantees recall only for maxDist <= 3: $maxDist")
    val sigs = simhash(docs, idCol, textCol).cache()
    materializeThenRelease(simhashWidePlan(sigs, maxDist), sigs)
  }

  /** The un-materialized [[simhashDupPairsWide]] plan over prepared
    * signatures (callers own `sigs` persistence). */
  def simhashWidePlan(sigs: DataFrame, maxDist: Int = 3): DataFrame = {
    val widths  = Array(11, 11, 11, 11, 10, 10)
    val offsets = widths.scanLeft(0)(_ + _) // bit offset of each block
    def block(i: Int): Column =
      shiftrightunsigned(col("simhash"), offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1))
    val keys = for {
      i <- 0 until 6; j <- (i + 1) until 6; l <- (j + 1) until 6
    } yield shiftleft(block(i), 24).bitwiseOR(shiftleft(block(j), 12)).bitwiseOR(block(l))
    val bands = sigs.select(col("doc_id"), col("simhash"), posexplode(array(keys: _*)))
    bands
      .as("x")
      .join(bands.as("y"), Seq("pos", "col"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("a_id"),
        col("y.doc_id").as("b_id"),
        col("x.simhash").as("sa"),
        col("y.simhash").as("sb"))
      .distinct()
      .withColumn("dist", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** The un-materialized [[simhashDupPairs]] plan over prepared signatures,
    * as (chunk projection, pair result) — same contract as
    * [[lshCandidatePlan]]: tests execute the LIVE banding self-join and
    * inspect its final adaptive plan. Callers own `sigs` persistence
    * (cache before, unpersist after the result is consumed). */
  def simhashDupPairPlan(
      sigs: DataFrame,
      maxDist: Int = 3,
      maxBucketDF: Int = 0): (DataFrame, DataFrame) = {
    val chunks = sigs.select(
      col("doc_id"),
      col("simhash"),
      posexplode(array((0 until 4).map(c => shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))): _*)))
    val index = if (maxBucketDF > 0) {
      val hot = chunks
        .groupBy(col("pos"), col("col"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > maxBucketDF)
        .select("pos", "col")
      chunks.join(broadcast(hot), Seq("pos", "col"), "left_anti")
    } else chunks
    val cand = index
      .as("x")
      .join(index.as("y"), Seq("pos", "col"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("a_id"),
        col("y.doc_id").as("b_id"),
        col("x.simhash").as("sa"),
        col("y.simhash").as("sb"))
      .distinct()
    val result = cand
      .withColumn("dist", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
    (chunks, result)
  }

  /** Content-defined chunking dedup (the backup/storage-dedup classic —
    * Muthitacharoen et al. 2001 LBFS — applied to corpus text): cut each
    * document where the rolling fingerprint of a w-char window satisfies a
    * 1-in-2^bits boundary test, so chunk boundaries move WITH the content
    * (an insertion shifts only the chunk it lands in, where fixed-size
    * blocks would shift every downstream block — the property that makes
    * chunk-hash dedup robust to edits). Fingerprint = first hex byte of
    * md5(window) ∈ {00,20,…,e0} (byte % 32 = 0 → expected chunk 32 chars);
    * md5 hex is engine-identical, and the IN-list test replays anywhere.
    * Returns one row per DUPLICATED chunk (n_docs, n_occurrences, len) —
    * the cross-document shared-content mass a storage layer would
    * single-instance.
    *
    * Scale shape: boundary scan and chunk split are row-local array
    * arithmetic over an attribute token of the doc (zero exchanges); the
    * only shuffle is the final chunk-hash group-by, whose key space is
    * content-bounded. Window hashing is O(len) md5s per doc — the
    * linear-scan cost every CDC system pays. */
  def cdcChunkDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8,
      minChunkOccurrences: Long = 2): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val boundaryBytes = Seq("00", "20", "40", "60", "80", "a0", "c0", "e0")
    val base = docs.select(col(idCol).as("doc"), col(textCol).as("txt"))
    // cut positions: i in [2, len-window+1] where the window fingerprint
    // hits the boundary mask; 1 and len+1 frame the first/last chunk
    val withCuts = base.select(
      col("doc"),
      col("txt"),
      concat(
        array(lit(1)),
        when(length(col("txt")) >= window + 1,
          filter(
            sequence(lit(2), length(col("txt")) - window + 1),
            i => substring(md5(col("txt").substr(i, lit(window))), 1, 2).isin(boundaryBytes: _*)))
          .otherwise(array().cast("array<int>")),
        array(length(col("txt")) + 1)).as("cuts"))
    val chunks = withCuts.select(
      col("doc"),
      explode(
        transform(
          sequence(lit(0), size(col("cuts")) - 2),
          j => col("txt").substr(
            element_at(col("cuts"), j + 1),
            element_at(col("cuts"), j + 2) - element_at(col("cuts"), j + 1))))
        .as("chunk"))
      .filter(length(col("chunk")) > 0)
    chunks
      .groupBy(md5(col("chunk")).as("chunk_hash"), length(col("chunk")).as("chunk_len"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc")).as("n_docs"))
      .filter(col("n_occurrences") >= minChunkOccurrences)
  }
}
