package graft.operators

import java.math.{BigDecimal => JBig, RoundingMode}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram model): a piece vocabulary with unigram
  * probabilities, served by VITERBI segmentation — the max-likelihood
  * split arg max_seg Σ log p(piece) — rather than [[Wordpiece]]'s greedy
  * longest-match or [[Bpe]]'s merge replay. The three together complete
  * the production tokenizer-family triad.
  *
  * No reference counterpart (SURVEY.md §2e) — LLM-pipeline extension.
  *
  * Deliberate simplifications, documented as the contract (the
  * determinism + oracle-replayability judgment [[Bpe]]/[[Wordpiece]]
  * make):
  *  - the seed vocabulary and its counts are [[Wordpiece.trainVocabFrame]]
  *    (all single chars force-included + top multi-char substrings by
  *    weighted frequency) — not ESA-seeded like full SentencePiece;
  *  - probabilities are count ratios p = c(piece)/Σc, refined by optional
  *    HARD-EM rounds ([[refine]]: Viterbi-segment the distinct-word
  *    table, recount usage, renormalize — deterministic, no soft
  *    forward-backward), instead of full EM + pruning;
  *  - log-likelihoods live on the 1e-12 decimal grid exactly like the
  *    Naive Bayes scorer (round(ln(c),12) − round(ln(T),12) as
  *    DECIMAL-style exact decimals, summed exactly), so DP score
  *    comparisons are EXACT decimal compares — no float-accumulation
  *    nondeterminism, and the whole Viterbi DP replays as unrolled SQL
  *    (the gate oracle walks the same table).
  *
  * Tie-breaks (total order, both engines): among equal DP scores at a
  * position, the SMALLEST predecessor position wins (= the longest final
  * piece). A serve-time word containing a character never seen in
  * training segments to one [[Unk]] token (the [[Wordpiece.encodeWord]]
  * contract).
  *
  * Scale shape: training aggregates over the DISTINCT-WORD table
  * (corpus-sized text collapses to vocab-sized counts first); the model
  * is a bounded (piece, count) table collected driver-side and broadcast;
  * refine rounds are one distributed segment+recount pass each over the
  * vocab-sized word table; encode memoizes per-partition distinct words.
  */
object Unigram {

  /** Reserved OOV token (same form as [[Wordpiece.Unk]] — bracketed, so it
    * cannot collide with corpus-substring pieces). */
  val Unk = "[UNK]"

  /** Trained model: (piece, count) in rank order plus the grid-12 log
    * probabilities derived from them. */
  final case class Model(pieces: Seq[(String, Long)], maxPieceLen: Int) {
    val total: Long = pieces.map(_._2).sum
    /** logp(piece) = round12(ln c) − round12(ln T): exact decimals on the
      * 1e-12 grid, the NB-scorer discipline. */
    lazy val logp: Map[String, JBig] = {
      val lnT = round12(math.log(total.toDouble))
      pieces.map { case (p, c) => p -> round12(math.log(c.toDouble)).subtract(lnT) }.toMap
    }
  }

  private def round12(x: Double): JBig =
    JBig.valueOf(x).setScale(12, RoundingMode.HALF_UP)

  /** Seed model from the shared substring-frequency vocabulary. */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4): Model = {
    val rows = Wordpiece
      .trainVocabFrame(docs, idCol, textCol, vocabSize, maxPieceLen)
      .orderBy(col("rank"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    Model(rows.toSeq, maxPieceLen)
  }

  /** Viterbi segmentation of one word under grid-12 log probabilities:
    * dp(j) = best score covering the first j chars, transitions take any
    * vocab piece of length ≤ maxPieceLen ending at j; equal scores keep
    * the smallest predecessor (longest final piece). Returns the piece
    * sequence, or Seq([[Unk]]) when no full cover exists (some character
    * unseen in training). */
  private[graft] def viterbiWord(
      word: String,
      logp: Map[String, JBig],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    val dp   = new Array[JBig](n + 1)
    val prev = new Array[Int](n + 1)
    dp(0) = JBig.ZERO
    var j = 1
    while (j <= n) {
      var best: JBig = null
      var bi = -1
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (dp(i) != null) {
          logp.get(word.substring(i, j)) match {
            case Some(lp) =>
              val s = dp(i).add(lp)
              // strict >: the FIRST (smallest-i) maximum wins — the SQL
              // replay's (score DESC, pos ASC) row_number tie-break
              if (best == null || s.compareTo(best) > 0) { best = s; bi = i }
            case None => ()
          }
        }
        i += 1
      }
      dp(j) = best
      prev(j) = bi
      j += 1
    }
    if (dp(n) == null) Seq(Unk)
    else {
      val out = mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) { out += word.substring(prev(p), p); p = prev(p) }
      out.reverseIterator.toSeq
    }
  }

  /** Distinct words with counts (the shared vocab-sized training table). */
  private def wordCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Corpus
      .spreadSmallInput(docs, col(idCol))
      .select(explode(filter(split(col(textCol), "\\s+"), t => length(t) > 0)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Hard-EM refinement: `rounds` iterations of (Viterbi-segment every
    * distinct word under the current model, recount weighted piece usage,
    * renormalize). Pieces with zero usage drop out (self-pruning — the
    * Kudo prune step's discrete analogue); single characters are retained
    * with their seed counts so coverage never degrades. Each round is one
    * distributed flatMap + aggregate over the VOCAB-SIZED word table with
    * the model broadcast — deterministic (UnigramSpec pins it) and
    * corpus-scale-free after the initial count pass. */
  def refine(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      rounds: Int = 1): Model = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // the word table never leaves the cluster: each round Viterbi-segments
    // it in a flatMap with the CURRENT model broadcast, aggregates usage
    // map-side, and collects only the vocab-bounded (piece, usage) result
    val words = wordCounts(docs, idCol, textCol).as[(String, Long)].cache()
    var cur = model
    var r = 0
    while (r < rounds) {
      val mB = spark.sparkContext.broadcast((cur.logp, cur.maxPieceLen))
      val usage = words
        .flatMap { case (w, n) =>
          val (lp, ml) = mB.value
          viterbiWord(w, lp, ml).collect { case p if p != Unk => (p, n) }
        }
        .toDF("piece", "n")
        .groupBy(col("piece"))
        .agg(sum(col("n")).as("u"))
        .as[(String, Long)]
        .collect()
        .toMap
      val chars = cur.pieces.filter(_._1.length == 1)
      val kept = cur.pieces.collect {
        case (p, _) if p.length > 1 && usage.contains(p) => p -> usage(p)
      }
      val next = (chars.map { case (p, c) => p -> math.max(usage.getOrElse(p, 0L), c) } ++ kept)
        .sortBy { case (p, c) => (-c, p) }
      cur = Model(next, cur.maxPieceLen)
      r += 1
    }
    words.unpersist(false)
    cur
  }

  /** Corpus piece-usage statistics under Viterbi segmentation:
    * (piece, n_uses), usage-weighted by word counts — the
    * [[Wordpiece.encodeStats]] contract at max-likelihood splits. */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mB = spark.sparkContext.broadcast((model.logp, model.maxPieceLen))
    wordCounts(docs, idCol, textCol)
      .as[(String, Long)]
      .flatMap { case (w, n) =>
        val (lp, ml) = mB.value
        viterbiWord(w, lp, ml).map(p => (p, n))
      }
      .toDF("piece", "n")
      .groupBy(col("piece"))
      .agg(sum(col("n")).as("n_uses"))
  }

  /** Per-document subword cost: (doc_id, n_words, n_pieces) with
    * per-partition distinct-word memoization ([[Bpe.tokenCounts]]'s
    * shape). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val spark = docs.sparkSession
    val mB = spark.sparkContext.broadcast((model.logp, model.maxPieceLen))
    val toksC = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val enc = udf { (ws: Seq[String]) =>
      val (lp, ml) = mB.value
      val memo = mutable.HashMap.empty[String, Int]
      var total = 0L
      ws.foreach(w => total += memo.getOrElseUpdate(w, viterbiWord(w, lp, ml).length))
      total
    }
    docs.select(
      col(idCol).as("doc_id"),
      size(toksC).cast("long").as("n_words"),
      enc(toksC).as("n_pieces"))
  }
}
