package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-style subword tokenizer, trained AND served in-engine — the
  * greedy-inference sibling of [[Bpe]] (Wu et al. 2016 "Google's Neural
  * Machine Translation System" §3.2; Song et al. 2021 "Fast WordPiece
  * Tokenization" for the longest-match-first serving contract): a
  * frequency-selected substring vocabulary, then deterministic
  * longest-match-first segmentation.
  *
  * No reference counterpart (SURVEY.md §2e) — LLM-pipeline extension.
  *
  * Two deliberate simplifications vs the full likelihood trainer, both
  * documented as the contract (determinism + oracle-replayability is the
  * point, the same judgment [[Bpe]] makes):
  *  - vocabulary selection is by weighted substring FREQUENCY (count ×
  *    occurrence positions), not the wordpiece likelihood objective —
  *    ties break piece-ASC, single characters are force-included so
  *    every word segments without an UNK;
  *  - serving is pure greedy longest-match-first (the production
  *    WordPiece inference algorithm), which needs no DP and replays as
  *    unrolled SQL steps.
  *
  * Scale shape: training aggregates over the DISTINCT-WORD table (the
  * [[Bpe.train]] bound — corpus-sized text collapses to a vocab-sized
  * count table first, map-side combined), substring explode is ≤
  * maxPieceLen·|word| pieces per distinct word; the selected vocabulary
  * is a bounded top-k (TakeOrderedAndProject) collected driver-side like
  * the BPE merge table and broadcast for the encode pass, which memoizes
  * per-partition distinct words.
  */
object Wordpiece {

  private def toks(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Trained model: selected pieces with their weighted frequencies, in
    * rank order (freq DESC, piece ASC). */
  final case class Model(pieces: Seq[(String, Long)], maxPieceLen: Int) {
    val pieceSet: Set[String] = pieces.map(_._1).toSet
  }

  /** Distinct words with corpus occurrence counts — the vocab-sized
    * training table every pass aggregates to first. */
  private def wordCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Corpus
      .spreadSmallInput(docs, col(idCol))
      .select(explode(toks(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** All substrings (length ≤ maxPieceLen) of every distinct word, with
    * weighted frequency Σ word_count per occurrence position. */
  private def substringFreqs(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(
        col("n"),
        explode(
          flatten(
            transform(
              sequence(lit(1), length(col("word"))),
              i =>
                transform(
                  sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i + lit(1))),
                  l => substring(col("word"), i, l))))).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("n")).as("freq"))

  /** Train the vocabulary frame: (piece, freq, rank) — ALL single
    * characters (coverage guarantee: no UNK possible) plus the
    * top-(vocabSize − #chars) multi-char substrings by (freq DESC,
    * piece ASC), ranked over the combined set. */
  def trainVocabFrame(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be positive, got $maxPieceLen")
    val words = wordCounts(docs, idCol, textCol)
    val freqs = substringFreqs(words, maxPieceLen).localCheckpoint(true)
    val chars = freqs.filter(length(col("piece")) === 1)
    val nChars = chars.count()
    val multiBudget = math.max(0L, vocabSize.toLong - nChars)
    val multi = freqs
      .filter(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece").asc)
      .limit(multiBudget.toInt)
    import org.apache.spark.sql.expressions.Window
    chars
      .unionByName(multi)
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("freq").desc, col("piece").asc)))
  }

  /** Collect the trained vocabulary to a driver-held broadcastable model
    * (bounded: ≤ vocabSize + alphabet rows — the BPE merge-table
    * judgment). */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4): Model = {
    val rows = trainVocabFrame(docs, idCol, textCol, vocabSize, maxPieceLen)
      .orderBy(col("rank"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    Model(rows.toSeq, maxPieceLen)
  }

  /** The reserved out-of-vocabulary token. Training vocabularies are built
    * from corpus substrings, so this bracketed form can never collide with
    * a learned piece of the plain-text alphabet. */
  val Unk = "[UNK]"

  /** Greedy longest-match-first segmentation — the WordPiece inference
    * contract: at each position take the LONGEST vocab piece that
    * prefixes the remainder. Training force-includes every corpus
    * character, so over the training alphabet single chars always match;
    * a serve-time word containing a character NEVER seen in training
    * segments to the single [[Unk]] token for the whole word (the
    * production BERT/WordPiece contract — not a silent pass-through of an
    * untrained symbol). Pure, deterministic, and replayed by the oracle as
    * unrolled per-position steps (the gate corpus serves its own training
    * alphabet, so the UNK branch is spec-covered, never oracle-reachable). */
  private[graft] def encodeWord(word: String, pieces: Set[String], maxPieceLen: Int): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < word.length) {
      var l = math.min(maxPieceLen, word.length - p)
      while (l > 1 && !pieces.contains(word.substring(p, p + l))) l -= 1
      if (l == 1 && !pieces.contains(word.substring(p, p + 1))) return Seq(Unk)
      out += word.substring(p, p + l)
      p += l
    }
    out.toSeq
  }

  /** Corpus piece-usage statistics after greedy encoding: (piece, n_uses)
    * with n_uses = Σ over distinct words (word count × uses in that
    * word's segmentation). The model is broadcast; encoding runs once per
    * DISTINCT word (vocab-sized), never per document. */
  def encodeStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val piecesB = spark.sparkContext.broadcast((model.pieceSet, model.maxPieceLen))
    val words = wordCounts(docs, idCol, textCol)
    words
      .as[(String, Long)]
      .flatMap { case (w, n) =>
        val (ps, ml) = piecesB.value
        encodeWord(w, ps, ml).map(piece => (piece, n))
      }
      .toDF("piece", "n")
      .groupBy(col("piece"))
      .agg(sum(col("n")).as("n_uses"))
  }

  /** Per-document subword cost: (doc_id, n_words, n_pieces) — the "how
    * many tokens will this doc cost under the trained vocab" signal, with
    * per-partition distinct-word memoization like [[Bpe.tokenCounts]]. */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    val piecesB = spark.sparkContext.broadcast((model.pieceSet, model.maxPieceLen))
    val enc = udf { (words: Seq[String]) =>
      val (ps, ml) = piecesB.value
      val memo = mutable.HashMap.empty[String, Int]
      var total = 0L
      words.foreach(w => total += memo.getOrElseUpdate(w, encodeWord(w, ps, ml).length))
      total
    }
    docs
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("ws"))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        enc(col("ws")).as("n_pieces"))
  }
}
