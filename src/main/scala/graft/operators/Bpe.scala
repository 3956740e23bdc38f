package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed corpus → word-frequency pass,
  * deterministic driver-side merge training over the bounded vocabulary,
  * and distributed encoding with the trained merge table broadcast.
  *
  * No reference counterpart (SURVEY.md §2e extension family) — this is the
  * subword tokenizer every LLM data pipeline ends in (Sennrich et al. 2016).
  *
  * Scale design (100 TB): training NEVER iterates over the corpus. One
  * corpus pass reduces to (word, count) — a map-side-combined aggregate
  * whose output is bounded by the VOCABULARY, not the token stream (the
  * same shape HF tokenizers / SentencePiece train from). The driver trains
  * on the top `maxVocabWords` words (deterministic count-desc/word-asc
  * cap) with incremental pair-count maintenance — each merge touches only
  * the words containing the merged pair. Encoding broadcasts the rank
  * table (numMerges entries, KBs) and memoizes per distinct word within
  * each partition, so hot words are encoded once per partition, not once
  * per occurrence.
  */
object Bpe {

  /** End-of-word sentinel appended as a separate symbol so merges cannot
    * cross word boundaries and "low" ≠ the prefix of "lower" (standard BPE
    * practice). A control char no corpus token contains. */
  private[graft] val Eow = ""

  /** Trained model: merge pairs in rank order (rank 0 = first, most
    * frequent merge). */
  final case class Model(merges: Seq[(String, String)]) {
    /** pair → rank lookup for the encoder. */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  private def toks(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Distributed (word, count) table — the only corpus-scale step. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(toks(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))

  /** Train `numMerges` BPE merges. Deterministic: the vocabulary cap takes
    * the top words by (count desc, word asc); each round merges the pair
    * with the highest count, ties broken lexicographically; training stops
    * early when no pair occurs twice.
    *
    * Driver-heap bound (measured, synthetic 3–12-char words, 50 merges):
    * the collected vocab array is small (~120 MB at 2^20 words) but the
    * trainer's per-character symbol buffers + pair indexes PEAK ~2.8 GB
    * at 2^20 words and ~0.9 GB at the 2^18 default — size driver memory
    * (or lower the cap) accordingly. The cap is a head-of-Zipf cut: count
    * mass concentrates in the top words, so merges learned at 2^18 match
    * the uncapped ranks on natural-language corpora long past the gate
    * scales; raise it only with driver heap to spare. */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocabWords: Int = 1 << 18): Model = {
    require(numMerges > 0, "numMerges must be positive")
    val vocab: Array[(String, Long)] = wordCounts(docs, textCol)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(vocab, numMerges)
  }

  /** Distributed BPE trainer: pair counting stays ON THE EXECUTORS, so the
    * vocabulary is never collected and [[train]]'s `maxVocabWords` driver
    * cap (and its ~GB symbol-buffer heap) disappears — the trainer that
    * still works when the vocabulary itself outgrows one machine.
    *
    * State is the vocab-sized (count, syms) table. Each merge round plans:
    * adjacent pairs via zip_with over two array slices (codegen'd, no UDF),
    * a map-side-combined weighted count, a ONE-ROW argmax collect
    * (count desc, pair asc — the driver trainer's exact tie-break), and a
    * codegen-friendly native left-fold (`aggregate` over the symbol array,
    * no Scala UDF) applying the merge left-to-right non-overlapping.
    * Lineage is cut every `checkpointEvery` rounds so 100+ merges keep a
    * bounded plan. Cost: numMerges vocab-sized aggregations — at corpus
    * scale the vocabulary is orders of magnitude smaller than the token
    * stream, and the corpus itself is read exactly once ([[wordCounts]]).
    *
    * Merge-for-merge IDENTICAL to [[train]] with an uncapped vocabulary
    * (BpeSpec pins the sequence): same left-to-right re-check merge
    * application, same stop-when-no-pair-repeats rule. Tie-break parity
    * holds on ASCII symbols (Spark compares UTF-8 bytes, the driver UTF-16
    * chars — equal orders on ASCII, same caveat as the dedup oracles). */
  def trainDistributed(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      checkpointEvery: Int = 8,
      checkpointDir: Option[String] = None): Model = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    val st = IterState(docs, checkpointDir)
    var state = st.mat(
      wordCounts(docs, textCol)
        .select(
          col("n"),
          concat(
            expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
            array(lit(Eow))).as("syms")))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round  = 0
    var done   = false
    while (round < numMerges && !done) {
      val best = state
        .select(
          col("n"),
          explode(expr(
            "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1), (x, y) -> struct(x AS pa, y AS pb))")).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pa").asc, col("pb").asc)
        .limit(1)
        .collect()
      if (best.isEmpty || best.head.getLong(2) < 2L) done = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        // Native left-fold merge (no Scala UDF, no ser/de): push each symbol
        // unless the accumulator ends in `a` and the symbol is `b`, in which
        // case replace the tail with the merged symbol. A merged tail is
        // a+b != a (b nonempty), so a fresh merge is never itself re-merged —
        // exactly the left-to-right non-overlapping scan of [[applyMerge]]
        // (BpeSpec pins the parity). `get` past the end yields NULL and the
        // NULL condition falls through to `otherwise`, so the empty
        // accumulator is ANSI-safe.
        state = state.withColumn(
          "syms",
          aggregate(
            col("syms"),
            array().cast("array<string>"),
            (acc, s) =>
              when(
                get(acc, size(acc) - lit(1)) === lit(a) && s === lit(b),
                concat(slice(acc, lit(1), size(acc) - lit(1)), array(lit(a + b))))
                .otherwise(concat(acc, array(s)))))
        round += 1
        if (round % checkpointEvery == 0) state = st.mat(state)
      }
    }
    val _ = spark // session kept in scope for clarity; plans hang off `docs`
    Model(merges.toSeq)
  }

  /** One merge applied the way the driver trainer does it: scan left to
    * right, merge in place, re-check the merged symbol against the next —
    * the exact loop from [[trainFromCounts]]. */
  private[graft] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val buf = mutable.ArrayBuffer(syms: _*)
    var j = 0
    while (j < buf.length - 1) {
      if (buf(j) == a && buf(j + 1) == b) { buf(j) = a + b; buf.remove(j + 1) }
      else j += 1
    }
    buf.toSeq
  }

  /** Driver-side trainer over a bounded (word, count) vocabulary with
    * incremental pair-count maintenance: pair→count and pair→word-ids are
    * kept in sync so each merge rescans ONLY the words containing the
    * merged pair — the standard efficient trainer, O(occurrences touched)
    * per merge rather than O(vocabulary) per merge. */
  private[graft] def trainFromCounts(vocab: Array[(String, Long)], numMerges: Int): Model = {
    val words  = vocab.map { case (w, _) => mutable.ArrayBuffer(w.map(_.toString): _*) :+ Eow }
    val counts = vocab.map(_._2)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val w = words(i)
      var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * counts(i)
        if (c == 0L) pairCount.remove(p) else pairCount.update(p, c)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
      // stale pairWords entries are tolerated: the merge loop re-checks
      // each candidate word for the pair before touching it
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round  = 0
    while (round < numMerges && pairCount.nonEmpty) {
      // deterministic argmax: highest count, then lexicographically SMALLEST pair
      val bestPair = pairCount.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, e @ (p, c)) =>
          acc match {
            case Some((ap, ac)) if ac > c || (ac == c && orderPair(ap, p) <= 0) => acc
            case _                                                             => Some(e)
          }
      }.get
      if (bestPair._2 < 2) round = numMerges // no repeated pair left — stop
      else {
        val (a, b) = bestPair._1
        merges += ((a, b))
        val touched = pairWords.getOrElse((a, b), mutable.Set.empty).toArray
        touched.foreach { i =>
          val w = words(i)
          if (containsPair(w, a, b)) {
            addWord(i, -1L) // retract old pair counts for this word
            var j = 0
            while (j < w.length - 1) {
              if (w(j) == a && w(j + 1) == b) { w(j) = a + b; w.remove(j + 1) }
              else j += 1
            }
            addWord(i, 1L) // re-add with the merged symbol
          }
        }
        round += 1
      }
    }
    Model(merges.toSeq)
  }

  private def orderPair(x: (String, String), y: (String, String)): Int = {
    val c = x._1.compareTo(y._1)
    if (c != 0) c else x._2.compareTo(y._2)
  }

  private def containsPair(w: mutable.ArrayBuffer[String], a: String, b: String): Boolean = {
    var j = 0
    while (j < w.length - 1) {
      if (w(j) == a && w(j + 1) == b) return true
      j += 1
    }
    false
  }

  /** Encode one word: repeatedly apply the LOWEST-RANK applicable merge
    * (the standard BPE encode loop — guarantees encode ∘ train is
    * consistent with the training merge order). */
  private[graft] def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = (word.map(_.toString) :+ Eow).toVector
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx  = -1
      var j        = 0
      while (j < syms.length - 1) {
        ranks.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) done = true
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++ syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Per-document BPE token count (the "how many tokens will this cost"
    * pipeline signal) plus the whitespace token count for comparison.
    * The merge table is broadcast; each partition memoizes distinct words
    * so repeated words encode once per partition. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val spark  = docs.sparkSession
    val ranksB = spark.sparkContext.broadcast(model.ranks)
    val enc = udf { (words: Seq[String]) =>
      val memo = mutable.HashMap.empty[String, Int]
      var total = 0L
      words.foreach { w =>
        // a still-standalone end-of-word sentinel is not a token the model
        // would emit — count only real symbols (merged symbols absorb it)
        total += memo.getOrElseUpdate(w, encodeWord(w, ranksB.value).count(_ != Eow))
      }
      total
    }
    docs.select(
      col(idCol).as("doc_id"),
      size(toks(col(textCol))).cast("long").as("n_words"),
      enc(toks(col(textCol))).as("n_bpe_tokens"))
  }
}
