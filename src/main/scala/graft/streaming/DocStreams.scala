package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Structured Streaming over DOCUMENT streams — the live tier of the corpus
  * curation family. Batch near-dup (operators/Dedup) answers "which docs in
  * this corpus duplicate each other"; the streaming tier answers "does this
  * ARRIVING doc duplicate anything already ingested" without re-running the
  * batch job per arrival — the ingestion-gate shape of a production
  * LLM-data pipeline (near-dups rejected at the door, the batch pass kept
  * for backfill/audit).
  *
  * Stateless corpus gates (blocklist, quality, language-id) are
  * stream-transparent by construction — the SAME operator call runs on a
  * readStream frame (StreamingSpec's blocklist pin). This file holds the
  * operators that genuinely need STATE.
  */
object DocStreams {

  /** One verified near-dup hit: the unordered pair (a_id < b_id), the band
    * whose bucket proposed it, and the EXACT jaccard over shingle-hash
    * sets — the same value the batch verify join computes. The same pair
    * may surface from several bands (each band's bucket state is
    * independent); consumers treat hits idempotently (DISTINCT on
    * (a_id, b_id), as the spec does). */
  final case class NearDupHit(band: Int, a_id: Long, b_id: Long, jacc: Double)

  /** Per-(band, bucket) state: the member docs' ids and their SORTED
    * distinct shingle-hash arrays, capped at `maxPerBucket` entries. */
  final case class BucketState(ids: Array[Long], shingles: Array[Array[Long]])

  /** Streaming MinHash+LSH near-dup detection with bounded per-key state:
    * each arriving document is signed ([[Dedup.minhashSigOf]] — the batch
    * aggregator's exact arithmetic), banded, and probed against the
    * per-(band, bucket) state of previously-seen docs; every proposal is
    * verified with the EXACT jaccard over stored shingle-hash sets before
    * it is emitted. Output = verified [[NearDupHit]]s (Update mode).
    *
    * Stream ≡ batch (StreamingSpec pins it): with no bucket overflow, the
    * distinct (a_id, b_id, jacc) hit set after consuming the stream equals
    * batch [[Dedup.minhashDupPairs]] over the same rows — the state fold
    * compares every arriving doc against every stored bucket member in
    * both directions, so the hit set is a pure function of the DOC SET,
    * not of arrival or batch order. (Bucket identity here is the signature
    * band slice itself; the batch plan's xxhash64 of the slice is an
    * injective-modulo-2⁻⁶⁴ rename of the same key, and any
    * collision-proposed extra pair on the batch side is removed by the
    * shared exact-jaccard verify unless it is a true near-dup pair — which
    * LSH proposes with miss probability ~5e-8 at the k=128/b=32 defaults.)
    *
    * Scale/state discipline: state per bucket is ≤ `maxPerBucket` member
    * docs (ids + shingle-hash sets — the price of EXACT verification at
    * the door; a fingerprint-only tier would be smaller but could not
    * match the batch contract). A bucket beyond the cap stops admitting
    * members (arrival order decides — the [[Dedup.lshCandidatePlan]]
    * maxBucketDF judgment applied live): a flood of identical boilerplate
    * lands its first `maxPerBucket` copies and every later copy is still
    * FLAGGED against them, it just stops growing the state. Run
    * [[graft.operators.Dedup.exact]]-style byte-dedup upstream to keep
    * floods out entirely, exactly as the batch pipeline orders its tiers.
    */
  def nearDupPairStream(
      docs: DataFrame,
      threshold: Double,
      k: Int = 128,
      bands: Int = 32,
      w: Int = 3,
      maxPerBucket: Int = 64): Dataset[NearDupHit] = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    require(maxPerBucket >= 2, s"maxPerBucket must be >= 2, got $maxPerBucket")
    val spark = docs.sparkSession
    import spark.implicits._

    // stateless narrow projection, bit-identical to the batch index: same
    // tokenizer, same xxhash64 shingle hashes, same distinct-within-doc
    val prepped = docs
      .filter(size(Dedup.tokensCol(col("text"))) >= w)
      .select(
        col("doc_id").cast("long").as("doc_id"),
        array_distinct(Dedup.shingleHashArrayCol(col("text"), w)).as("sh"))
      .as[(Long, Array[Long])]

    // one signature per doc (no grouping needed — the doc row carries its
    // whole text), then one row per band keyed by the slice itself
    val banded = prepped.flatMap { case (id, sh) =>
      val sorted = sh.sorted // sorted once: exact intersections by merge below
      val sig    = Dedup.minhashSigOf(sh, k)
      (0 until bands).iterator.map { b =>
        (b, sig.slice(b * r, (b + 1) * r).toSeq, id, sorted)
      }
    }

    banded
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: (Int, Seq[Long]),
         rows: Iterator[(Int, Seq[Long], Long, Array[Long])],
         state: GroupState[BucketState]) => {
          var ids = state.getOption.map(_.ids).getOrElse(Array.emptyLongArray)
          var shs = state.getOption.map(_.shingles).getOrElse(Array.empty[Array[Long]])
          val out = Seq.newBuilder[NearDupHit]
          // id-sorted fold inside the batch: with ordered arrival the state
          // admits the smallest ids first, matching the batch keep-first view
          rows.toVector.sortBy(_._3).foreach { case (band, _, id, sh) =>
            if (!ids.contains(id)) { // replay/duplicate-delivery guard
              var i = 0
              while (i < shs.length) {
                val shared = sortedIntersectCount(sh, shs(i))
                // the batch verify join's exact arithmetic: int sizes, one
                // double division — bit-identical on the same sets
                val jacc = shared.toDouble / (sh.length + shs(i).length - shared)
                if (jacc >= threshold)
                  out += NearDupHit(band, math.min(id, ids(i)), math.max(id, ids(i)), jacc)
                i += 1
              }
              if (ids.length < maxPerBucket) { ids = ids :+ id; shs = shs :+ sh }
            }
          }
          state.update(BucketState(ids, shs))
          out.result().iterator
        })
  }

  final case class ContamHit(doc_id: Long, n_shared_grams: Long)

  /** Streaming decontamination gate — the live counterpart of
    * [[graft.operators.Corpus.evalOverlapBloom]] (one oracle-checked batch
    * operator serves as its replay spec): eval-set n-grams are hashed and
    * Bloom-built ONCE offline; each ARRIVING training document's distinct
    * gram hashes run through the codegen'd
    * [[graft.functions.BloomMightContain]] prefilter (the filter rides the
    * plan, 512 KiB at the 2²² default, broadcast-cheap at any eval size),
    * survivors are exact-verified by a stream-static semi-join against the
    * true eval gram set (Bloom FPs cost bytes, never correctness), and the
    * per-doc shared-gram count folds in a stateless
    * flatMapGroupsWithState (append mode — a doc's grams live inside its
    * micro-batch, so nothing survives between batches). Emits only
    * CONTAMINATED docs, exactly like the batch report; the ingest pipeline
    * drops or quarantines on sight instead of discovering the leak in the
    * nightly batch audit. StreamingSpec pins stream ≡ batch. */
  def decontamStream(
      docs: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      numBits: Int = 1 << 22,
      numHashes: Int = 4): Dataset[ContamHit] = {
    import graft.functions.Bloom
    import graft.operators.Corpus
    val spark = docs.sparkSession
    import spark.implicits._
    // static side, built once at plan time (the offline index contract)
    val evalGrams = Corpus
      .tokenNgramHashes(eval_, idCol, textCol, n, distinctInRow = true)
      .select(col("gram_h"))
      .distinct()
    val bloom = Bloom.build(evalGrams, "gram_h", numBits, numHashes)
    Corpus
      .tokenNgramHashes(docs, idCol, textCol, n, distinctInRow = true)
      .filter(Bloom.mightContain(bloom, numHashes)(col("gram_h")))
      .join(evalGrams, Seq("gram_h"), "left_semi") // stream-static exact verify
      .select(col("doc_id"))
      .as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, rows: Iterator[Long], _: GroupState[Int]) =>
          Iterator(ContamHit(id, rows.size.toLong)))
  }

  /** One arriving weighted document: `stratum` is the sampling group key
    * (callers concatenate multi-column strata; a constant = global
    * sampling), matching the batch operator's `strata` columns. */
  final case class WeightedDoc(stratum: String, doc_id: Long, weight: Double)

  /** One row of a stratum's refreshed sample snapshot: the batch output
    * columns plus `n_seen`, the stratum's total docs consumed so far (the
    * convergence marker StreamingSpec keys the final snapshot on). */
  final case class SampleEntry(
      stratum: String, doc_id: Long, weight: Double, priority: Double, rn: Int, n_seen: Long)

  /** Per-stratum A-Res reservoir: the current top-k entries (parallel
    * arrays — tuples don't round-trip Spark state encoders as cleanly)
    * plus the consumed-row count. O(k) per stratum, never data-sized. */
  final case class SampleState(
      ids: Array[Long], weights: Array[Double], priorities: Array[Double], nSeen: Long)

  /** Streaming weighted sampling without replacement — the live twin of
    * [[graft.operators.Corpus.weightedSample]] (Efraimidis & Spirakis
    * 2006). A-Res is streaming-NATIVE: the paper's algorithm IS a running
    * k-heap of the highest-priority rows, so the state here is exactly
    * that reservoir per stratum and arrival/batch order cannot matter —
    * priorities are a pure function of (doc_id, seed, weight).
    *
    * Arithmetic parity with the batch operator, move for move: the same
    * splitmix64 finalizer ([[graft.functions.Mix64]].mix, the scalar twin
    * of the codegen'd expression) over doc_id ⊕ seed, the same exact
    * dyadic u = ((h >>> 11) + 1)/2⁵³, ln via Math.log (what Spark's `log`
    * evaluates), ONE double division by the weight, and the HALF_UP snap
    * to 1e-9 through BigDecimal.valueOf — Spark's own Round semantics.
    * Selection order (priority desc, doc_id asc) compares through
    * java.lang.Double.compare, the comparator Spark's sort uses, so the
    * final snapshot equals the batch rows BIT FOR BIT (StreamingSpec pins
    * equality under multi-batch, shuffled-arrival ingestion).
    *
    * Non-positive weights fail loudly (the batch raise_error guard,
    * surfaced here as the task failure of the stateful map). Update mode:
    * each micro-batch re-emits every touched stratum's refreshed top-k;
    * the converged snapshot is the rows carrying the stratum's final
    * n_seen. */
  def weightedSampleStream(
      docs: Dataset[WeightedDoc],
      k: Int,
      seed: Long): Dataset[SampleEntry] = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (stratum: String, rows: Iterator[WeightedDoc], state: GroupState[SampleState]) => {
          var entries: Vector[(Double, Long, Double)] = state.getOption
            .map(s => s.priorities.indices.map(i => (s.priorities(i), s.ids(i), s.weights(i))).toVector)
            .getOrElse(Vector.empty)
          var nSeen = state.getOption.map(_.nSeen).getOrElse(0L)
          rows.foreach { d =>
            if (d.weight <= 0.0)
              throw new IllegalArgumentException(
                s"weightedSampleStream: non-positive weight for doc ${d.doc_id}")
            val h = graft.functions.Mix64.mix(d.doc_id ^ seed)
            val u = ((h >>> 11) + 1).toDouble / 9007199254740992.0
            val p = java.math.BigDecimal
              .valueOf(math.log(u) / d.weight)
              .setScale(9, java.math.RoundingMode.HALF_UP)
              .doubleValue()
            entries :+= ((p, d.doc_id, d.weight))
            nSeen += 1
          }
          val top = entries
            .sorted(new Ordering[(Double, Long, Double)] {
              def compare(x: (Double, Long, Double), y: (Double, Long, Double)): Int = {
                val c = java.lang.Double.compare(y._1, x._1) // priority DESC
                if (c != 0) c else java.lang.Long.compare(x._2, y._2) // doc_id ASC
              }
            })
            .take(k)
          state.update(SampleState(
            top.map(_._2).toArray, top.map(_._3).toArray, top.map(_._1).toArray, nSeen))
          top.iterator.zipWithIndex.map { case ((p, id, w), i) =>
            SampleEntry(stratum, id, w, p, i + 1, nSeen)
          }
        })
  }

  /** One arriving document for the streaming packer. */
  final case class PackDoc(shard: String, doc_id: Long, text: String)

  /** One emitted packing span — identical shape to
    * [[graft.operators.Corpus.packSpans]]' output rows. */
  final case class PackSpan(
      shard: String, seq_id: Long, doc_id: Long,
      doc_tok_start: Long, doc_tok_end: Long, seq_tok_start: Long)

  /** Per-shard packer state: the next free token offset and the last
    * doc_id consumed (the ordered-arrival guard). O(1) per shard — the
    * smallest state of any operator in this file. */
  final case class PackState(nextOffset: Long, lastDocId: Long)

  /** Streaming sequence packer — the live twin of
    * [[graft.operators.Corpus.packSpans]]: docs arrive per shard, the
    * packer keeps ONLY the next free token offset, and every arriving doc
    * emits its final span rows immediately (Append mode — a span never
    * changes once emitted, because packing is a pure running offset).
    *
    * ORDERED-ARRIVAL contract (the [[EventStreams]] as-of discipline):
    * within a shard, docs must arrive in doc_id order across batches
    * (batches are sorted internally; a batch whose smallest doc_id is ≤
    * the last consumed one fails LOUDLY — silently packing out of order
    * would produce offsets batch equivalence can't explain). Under that
    * contract the emitted span set equals the batch operator bit for bit
    * (StreamingSpec pins it): token counts replay the batch `toks`
    * whitespace rule, and every offset/DIV is the same integer
    * arithmetic. Empty docs are consumed (they advance lastDocId) but
    * emit nothing and occupy no tokens, exactly like batch. */
  def packSpansStream(docs: Dataset[PackDoc], seqLen: Int): Dataset[PackSpan] = {
    require(seqLen >= 1, s"seqLen must be positive, got $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val L = seqLen.toLong
    docs
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: String, rows: Iterator[PackDoc], state: GroupState[PackState]) => {
          var off  = state.getOption.map(_.nextOffset).getOrElse(0L)
          var last = state.getOption.map(_.lastDocId).getOrElse(Long.MinValue)
          val out  = scala.collection.mutable.ArrayBuffer.empty[PackSpan]
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            if (d.doc_id <= last)
              throw new IllegalStateException(
                s"packSpansStream: out-of-order arrival in shard $shard — doc ${d.doc_id} after $last")
            last = d.doc_id
            val nTok = d.text.split("\\s+").count(_.nonEmpty).toLong // the batch toks rule
            if (nTok > 0) {
              var s = off / L
              val lastSeq = (off + nTok - 1) / L
              while (s <= lastSeq) {
                val lo = math.max(off, s * L)
                val hi = math.min(off + nTok, (s + 1) * L)
                out += PackSpan(shard, s, d.doc_id, lo - off, hi - off, lo - s * L)
                s += 1
              }
              off += nTok
            }
          }
          state.update(PackState(off, last))
          out.iterator
        })
  }

  /** Exact |A ∩ B| of two SORTED distinct long arrays by linear merge. */
  private[streaming] def sortedIntersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }
}
