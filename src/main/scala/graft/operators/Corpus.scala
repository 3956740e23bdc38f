package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingestion and tokenization: repeated-span detection, eval-set
  * decontamination, PII scrubbing, and repetition/quality signals.
  *
  * No reference counterpart (SURVEY.md §2e extension family) — these are the
  * operations published pipeline papers describe (Lee et al. 2022
  * "Deduplicating Training Data Makes Language Models Better" for span-level
  * dedup; Rae et al. 2021 "Scaling Language Models" App. A for the Gopher
  * repetition filters; benchmark decontamination as in GPT-3 App. C), each
  * re-expressed as a declarative Spark plan.
  *
  * Scale design (100 TB):
  *  - every operator is scan → narrow transform → ONE keyed shuffle; no
  *    driver-side collection anywhere;
  *  - n-gram streams explode to ~L rows per document but stay map-side
  *    partial-aggregated, so the shuffle carries (gram, partial count), not
  *    raw occurrences;
  *  - [[ngramSpans]] can shuffle 8-byte `xxhash64(gram)` keys instead of
  *    gram text (`hashGrams = true`): at corpus scale the gram strings
  *    dominate shuffle volume, and a 64-bit key keeps the group-by exact up
  *    to hash collisions (~2⁻⁶⁴ per pair — vanishing even at 10¹² grams
  *    relative to per-pair cost, and collisions only ever MERGE two span
  *    groups, never drop one);
  *  - [[evalOverlap]] broadcasts the eval-side gram set — held-out
  *    benchmarks are small by construction (MBs, not TBs), so the
  *    contamination check is a broadcast semi-join against every training
  *    shard, never a corpus×corpus shuffle.
  */
object Corpus {

  /** Whitespace tokenizer shared with TextQueries (strings.Fields contract,
    * reference src/node.go:929-931). */
  private def toks(c: Column): Column = filter(split(c, "\\s+"), t => length(t) > 0)

  /** Spread a SMALL input before CPU-heavy per-row work (tokenize/explode):
    * if the source PLANS as fewer scan partitions than half the cluster's
    * cores (tiny local files packed into a handful of splits — parallelism
    * is then irreversibly capped at the split count), ONE key-hashed
    * shuffle of the still-small input buys full parallelism for everything
    * downstream. An input that already arrives well-split — the 100 TB
    * case, thousands of files/row groups — passes through UNTOUCHED: the
    * full corpus never reshuffles just to tokenize.
    *
    * The gate reads the PLANNED partition count (`rdd.getNumPartitions`),
    * not `inputFiles.length`: split parallelism is per row-group /
    * `maxPartitionBytes`, so one 100 GB file is ~800 splits (must pass
    * untouched, and does), while 64 KB-sized files pack into a couple of
    * splits (must spread, and do). Non-file sources (views, in-memory
    * relations) are judged by their actual partitioning instead of always
    * reshuffling. Public: any CPU-or-memory-heavy aggregation over an
    * under-split source (exact percentiles building per-partition value
    * buffers, say) benefits the same way.
    *
    * The probe itself is guarded, because `df.rdd` FINALIZES the physical
    * plan — under AQE that eagerly executes any upstream shuffle stages at
    * plan-build time (work then thrown away), and it throws outright on a
    * streaming frame. So the count is read ONLY when the analyzed plan is a
    * leaf or a narrow projection/filter over one (a scan, where the probe is
    * free and the split-count question is meaningful). Anything else —
    * streaming, or a frame with joins/aggregates/exchanges upstream —
    * passes through untouched: its parallelism is already set by the
    * upstream shuffle (`spark.sql.shuffle.partitions`), so a spread would
    * be a pure extra full shuffle, not a fix. */
  def spreadSmallInput(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def narrowOverScan(p: LogicalPlan): Boolean = p match {
      case n: Project       => narrowOverScan(n.child)
      case n: Filter        => narrowOverScan(n.child)
      case n: SubqueryAlias => narrowOverScan(n.child)
      case n: View          => narrowOverScan(n.child)
      case n                => n.children.isEmpty
    }
    if (df.isStreaming || !narrowOverScan(df.queryExecution.analyzed)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= math.max(p / 2, 1)) df else df.repartition(p, key)
    }
  }

  /** Per-document stream of word n-grams (space-joined token windows),
    * one row per OCCURRENCE: (id, gram). Documents shorter than n tokens
    * emit nothing. A small-file corpus scans as few partitions — spread the
    * CPU-heavy gram generation across the cluster before exploding (same
    * discipline as Dedup.shingleRows). */
  def tokenNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val t = toks(col(textCol))
    spreadSmallInput(df, col(idCol))
      .filter(size(t) >= n)
      .select(
        col(idCol).as("doc_id"),
        explode(
          transform(
            sequence(lit(0), size(t) - n),
            i => concat_ws(" ", slice(t, i + 1, lit(n))))).as("gram"))
  }

  /** (doc_id, gram_h) rows: token n-grams hashed to 64 bits INSIDE the
    * transform lambda — gram strings are never materialized (the concat +
    * per-gram allocation is ~half the scan cost; same finding as
    * Dedup.shingleHashRows). `distinctInRow` dedups within the document via
    * array_distinct BEFORE the explode: a narrow map-only operation that
    * replaces a full (doc, gram) distinct() shuffle downstream. */
  def tokenNgramHashes(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      distinctInRow: Boolean = false): DataFrame = {
    val t = toks(col(textCol))
    val grams = transform(
      sequence(lit(0), size(t) - n),
      i => xxhash64((0 until n).map(j => element_at(t, i + j + 1)): _*))
    val arr = if (distinctInRow) array_distinct(grams) else grams
    spreadSmallInput(df, col(idCol))
      .filter(size(t) >= n)
      .select(col(idCol).as("doc_id"), explode(arr).as("gram_h"))
  }

  /** Repeated n-gram spans across the corpus — the span-granular exact-dedup
    * primitive (a gram appearing in ≥ `minDocs` distinct documents marks a
    * duplicated span to cut or down-weight). Output: (gram, n_docs,
    * n_occurrences).
    *
    * `hashGrams = true` replaces the gram text with its xxhash64 in the
    * shuffle key AND output (`gram_hash`) — the scale path; the default
    * keeps the text so results are oracle-comparable. */
  def ngramSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Long = 2L,
      hashGrams: Boolean = false): DataFrame = {
    val keyed =
      if (hashGrams)
        tokenNgramHashes(df, idCol, textCol, n)
          .select(col("gram_h").as("gram_hash"), col("doc_id"))
      else tokenNgrams(df, idCol, textCol, n)
    val key = if (hashGrams) "gram_hash" else "gram"
    // two-level aggregate instead of count(DISTINCT doc_id): an Expand-based
    // distinct would double the shuffled rows WITH their gram-string keys;
    // here level 1 collapses per-(gram, doc) occurrences map-side, so the
    // second shuffle carries one row per (gram, doc) and the distinct-doc
    // count becomes a plain count
    keyed
      .groupBy(col(key), col("doc_id"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("occ")).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Suffix-array-style EXACT substring dedup (Lee et al. 2022 §4.1,
    * ExactSubstr): the maximal extents of every substring of ≥ `minLen`
    * tokens that occurs more than once in the corpus — counting TOTAL
    * occurrences, so a passage repeated within one document is flagged
    * exactly like one repeated across documents (the capability
    * [[ngramSpans]]'s distinct-doc counting and [[cutSpans]]'s cut-text
    * output don't cover). Output: (doc_id, span_start, span_end) — merged,
    * non-overlapping, 1-based inclusive token intervals.
    *
    * Why no suffix array: a token position is covered by a repeated
    * substring of length ≥ L iff some L-gram window containing it occurs
    * ≥ 2 times — every maximal repeated substring of length M ≥ L is
    * tiled by its M−L+1 start windows, each itself a repeated L-gram, and
    * conversely every repeated L-gram IS a repeated substring. So
    * (repeated-window starts) ∪-expanded to [p, p+L−1] and merged equals
    * the union of maximal repeated-substring extents — the suffix array's
    * answer for the ≥L regime, from two linear aggregations.
    *
    * Scale shape (the reason this beats a distributed suffix array at
    * 100 TB): grams travel as xxhash64 (collision ⇒ at worst one falsely
    * merged span, ~2⁻⁶⁴ per gram pair — [[cutSpans]]'s argument); the
    * multiplicity count is a map-side-combined aggregate on the gram key;
    * flagging is a semi-join back on the same key — ONE row per position,
    * never a pair per occurrence², so a boilerplate flood (hot gram in
    * every doc) costs linear output by construction (SkewAndBucketSpec
    * floods it); the interval merge is a per-doc window — gaps-and-
    * islands over at most one row per token. */
  def exactSubstrSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 8): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    import org.apache.spark.sql.expressions.Window
    val t = toks(col(textCol))
    val base = spreadSmallInput(df, col(idCol))
      .select(col(idCol).as("doc_id"), t.as("toks"))
      .filter(size(col("toks")) >= minLen)
    val gramRows = base
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), size(col("toks")) - minLen),
            i => xxhash64((0 until minLen).map(j => element_at(col("toks"), i + j + 1)): _*))))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("g"))
    val rep = gramRows
      .groupBy(col("g"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("g"))
    val flagged = gramRows.join(rep, Seq("g"), "left_semi").select(col("doc_id"), col("p"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    flagged
      .withColumn(
        "prev_end",
        max(col("p") + lit(minLen - 1)).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "brk",
        when(col("prev_end").isNull || col("p") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        min(col("p")).cast("long").as("span_start"),
        (max(col("p")) + lit(minLen - 1)).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** The ACTION [[ngramSpans]]'s report drives (Lee et al. 2022 §4): cut
    * every corpus-wide duplicated span out of the text. A token is cut when
    * ANY n-gram occurrence covering it appears in ≥ `minDocs` distinct
    * documents; the survivors re-join in order. Output per document (≥1
    * token): (doc_id, clean_text, n_removed) — clean_text may be empty if
    * the whole document was duplicated spans, and documents unchanged come
    * through with n_removed = 0 (callers filter as policy dictates).
    *
    * Scale shape: grams travel as xxhash64 (never strings — same collision
    * argument as [[ngramSpans]] hashGrams, and a collision only ever CUTS a
    * false span, bounded by ~2⁻⁶⁴ per gram pair); the flagged-gram set is
    * the ngramSpans aggregate, joined back as a semi-join; covered
    * positions explode ×n only for FLAGGED occurrences; reassembly is one
    * doc_id-keyed aggregate. No driver-side state at any step. */
  def cutSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Long = 2L): DataFrame = {
    val t = toks(col(textCol))
    val base = spreadSmallInput(df, col(idCol))
      .select(col(idCol).as("doc_id"), t.as("toks"))
      .filter(size(col("toks")) > 0)
    // (doc_id, 1-based token position, token)
    val tokRows = base
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("token"))
    // (doc_id, 1-based gram start, gram hash) — hash computed in-row
    val gramRows = base
      .filter(size(col("toks")) >= n)
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), size(col("toks")) - n),
            i => xxhash64((0 until n).map(j => element_at(col("toks"), i + j + 1)): _*))))
      .select(col("doc_id"), (col("pos") + 1).as("gpos"), col("col").as("gram_h"))
    val flagged = ngramSpans(df, idCol, textCol, n, minDocs, hashGrams = true)
      .select(col("gram_hash").as("gram_h"))
    val covered = gramRows
      .join(flagged, Seq("gram_h"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("gpos"), col("gpos") + (n - 1))).as("pos"))
      .distinct()
    // left join + conditional aggregate (NOT an anti join): a fully-covered
    // document must still emit its (empty) row. collect_list drops nulls,
    // so the kept tokens are exactly the uncovered positions.
    tokRows
      .join(covered.withColumn("cut", lit(1)), Seq("doc_id", "pos"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("cut").isNull, struct(col("pos"), col("token"))))),
            s => s("token")),
          " ").as("clean_text"),
        sum(when(col("cut").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Benchmark decontamination: for each training document, how many
    * DISTINCT n-grams it shares with the held-out eval corpus. Output:
    * (doc_id, n_shared_grams), only documents with ≥1 shared gram — the
    * rows a pipeline quarantines or strips.
    *
    * The eval gram set is broadcast (eval suites are small by construction);
    * the training side is one NARROW pass + broadcast semi-join — no
    * corpus-sized shuffle at all. Grams travel as 64-bit hashes (never
    * strings) and the per-doc distinct happens in-row via array_distinct
    * before the explode, so the train side needs no distinct() exchange:
    * scan → explode → broadcast semi-join → doc_id-partial count. A false
    * shared gram takes an in-document or train×eval 64-bit collision —
    * ~2⁻⁶⁴ per pair, vanishing at any corpus. */
  def evalOverlap(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val trainGrams = tokenNgramHashes(train, idCol, textCol, n, distinctInRow = true)
    val evalGrams = tokenNgramHashes(eval_, idCol, textCol, n, distinctInRow = true)
      .select(col("gram_h"))
      .distinct()
    trainGrams
      .join(broadcast(evalGrams), Seq("gram_h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** [[evalOverlap]] for eval sets BEYOND the broadcast budget — the same
    * exact output through a Bloom-prefilter + shuffle-verify plan.
    *
    * [[evalOverlap]] broadcasts the eval gram set as a join hash relation:
    * right until the eval side stops fitting an executor (a few hundred MB
    * of 8-byte grams). Past that, this variant keeps the memory bounded and
    * the plan shuffle-light in two steps: (1) a fixed-size Bloom filter of
    * the eval grams (numBits/8 bytes — 512 KiB at the default 2²² bits,
    * still broadcast-cheap at ANY eval size) prefilters the corpus gram
    * stream down to true hits + the FP sliver; (2) an exact semi-join
    * verifies the survivors, running as a SHUFFLE hash join — affordable
    * because only the prefiltered sliver shuffles, never the corpus gram
    * stream. Bloom FPs cost shuffle bytes, never correctness: the verify
    * join removes them, so the output is bit-identical to [[evalOverlap]]
    * (one oracle serves both).
    *
    * False-negative risk: none — build and probe run the same multiply-
    * shift arithmetic on the same JVM semantics (see graft.functions.Bloom).
    * Size the filter at ~10 bits/gram for ~1% FP (numHashes=4 optimal ≈
    * m/n·ln2 ≈ 7; 4 keeps probe cost low at <2% FP). */
  def evalOverlapBloom(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      numBits: Int = 1 << 22,
      numHashes: Int = 4): DataFrame = {
    import graft.functions.Bloom
    val evalGrams = tokenNgramHashes(eval_, idCol, textCol, n, distinctInRow = true)
      .select(col("gram_h"))
      .distinct()
    val bloom = Bloom.build(evalGrams, "gram_h", numBits, numHashes)
    tokenNgramHashes(train, idCol, textCol, n, distinctInRow = true)
      .filter(Bloom.mightContain(bloom, numHashes)(col("gram_h")))
      // exact verify on the sliver — hinted to the shuffle join shape this
      // variant exists for (Catalyst would otherwise broadcast a small eval
      // side and hide the plan under test; PlanSpec pins no-broadcast)
      .join(evalGrams.hint("shuffle_hash"), Seq("gram_h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Decontaminated training corpus: drop every training document sharing
    * ≥ `minShared` distinct n-grams with the eval corpus (the action
    * [[evalOverlap]]'s report drives). Anti-join on the flagged id set —
    * the corpus passes through untouched except for the dropped rows. */
  def dropContaminated(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minShared: Long = 1L): DataFrame = {
    val flagged = evalOverlap(train, eval_, idCol, textCol, n)
      .filter(col("n_shared_grams") >= minShared)
      .select(col("doc_id").as(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Known-key WATERMARK DETECTION (Kirchenbauer et al. 2023, the
    * detector side): a green-list watermarker biases each generated token
    * toward the "green" γ-fraction of the vocabulary selected by a keyed
    * hash of the preceding context; the detector recomputes the green
    * test for every adjacent token pair and flags documents whose green
    * fraction is a z-score above the γ baseline. In a training-data
    * pipeline this is the filter-synthetic-text gate: honestly human text
    * scores z ≈ 0 by construction, watermarked model output scores z in
    * the tens.
    *
    * The keyed hash here is md5 over `prev ∥ US ∥ cur` (md5 hashes the
    * UTF-8 bytes identically in every engine, so the green test — first
    * 16 hex chars, compared lexicographically against the ⌊γ·2⁶⁴⌋ hex
    * threshold — replays exactly; fixed-width lowercase hex order IS
    * unsigned numeric order, the md5-threshold idiom the deterministic
    * samplers already bank on). Detection is row-local: token split,
    * pair hashes, one count — zero shuffle, scan-parallel at any scale.
    * z = (g − γn)/√(nγ(1−γ)) in one fixed double order, round(·,6);
    * docs with <2 tokens emit NULL z, never a divide-by-zero. */
  def watermarkDetect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      gamma: Double = 0.25,
      zAlert: Double = 4.0): DataFrame = {
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1), got $gamma")
    val thresholdHex = f"${(BigDecimal(gamma) * BigDecimal(BigInt(2).pow(64))).toBigInt}%016x"
    val toks = expr(s"filter(split($textCol, '\\\\s+'), x -> x <> '')")
    // CASE guard: Spark's sequence(2, n) runs DESCENDING for n < 2 — a
    // 1-token doc would probe element_at(tk, 0) without it
    val greens = expr(
      s"""CASE WHEN size(tk) >= 2 THEN size(filter(
         |  transform(sequence(2, size(tk)), i ->
         |    substring(md5(concat(element_at(tk, i - 1), chr(31), element_at(tk, i))), 1, 16)),
         |  h -> h < '$thresholdHex')) ELSE 0 END""".stripMargin)
    val n = col("n_scored").cast("double")
    val z = (col("n_green").cast("double") - lit(gamma) * col("n_scored")) /
      sqrt(n * lit(gamma) * lit(1.0 - gamma))
    df.select(col(idCol).as("doc_id"), toks.as("tk"))
      .select(
        col("doc_id"),
        (size(col("tk")) - 1).cast("long").as("n_scored"),
        greens.cast("long").as("n_green"))
      .select(
        col("doc_id"),
        greatest(col("n_scored"), lit(0L)).as("n_scored"),
        when(col("n_scored") > 0, col("n_green")).otherwise(lit(0L)).as("n_green"))
      .select(
        col("doc_id"),
        col("n_scored"),
        col("n_green"),
        when(col("n_scored") > 0,
          round(col("n_green").cast("double") / col("n_scored"), 6)).as("green_frac"),
        when(col("n_scored") > 0, round(z, 6)).as("z_score"),
        when(col("n_scored") > 0, round(z, 6) > zAlert).otherwise(lit(false)).as("is_flagged"))
  }

  /** Fold a rule list (regex → replacement) over a text column — the PII /
    * boilerplate scrub primitive. Patterns must stay in the RE2-compatible
    * subset (no lookaround) so the same rules run on any engine. */
  def scrub(c: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(c) { case (acc, (re, repl)) => regexp_replace(acc, lit(re), lit(repl)) }

  /** Count of matches of `re` in `c` — audit counterpart to [[scrub]]. */
  def matchCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Canonical text normalization — the first pass of every corpus-cleaning
    * pipeline, one narrow codegen'd projection (no shuffle, no UDF):
    *  1. Unicode NFC (codegen'd [[graft.functions.NfcNormalize]]; no-alloc
    *     on already-normalized input) so byte-level dedup keys and n-grams
    *     agree across differently-encoded copies of the same text;
    *  2. zero-width/invisible characters removed (ZWSP/ZWNJ/ZWJ/word-joiner/
    *     BOM/soft-hyphen — the classic dedup-evading payload);
    *  3. every control (Cc) and Unicode space-separator (Zs) folded to a
    *     plain space — regex classes stay in the RE2 ∩ Java subset, so the
    *     same rules run on any engine (Java \s and RE2 \s disagree on VT;
    *     \p{Cc} sidesteps that);
    *  4. runs of spaces collapsed, ends trimmed. */
  def normalizeText(c: Column): Column = {
    val nfc     = graft.functions.TextFunctions.nfc_normalize(c)
    val visible = regexp_replace(nfc, "[\u200B\u200C\u200D\u2060\uFEFF\u00AD]", "")
    val spaced  = regexp_replace(visible, "[\\p{Cc}\\p{Zs}]", " ")
    trim(regexp_replace(spaced, " +", " "))
  }

  /** Compression-ratio quality signal (the Gopher/RefinedWeb filter the
    * ratio heuristics can't replace): zlib-deflate the UTF-8 text at a
    * FIXED configuration (level 6, raw stream — no header/checksum
    * variance) and report deflated/raw bytes. Machine-generated spam and
    * template boilerplate compress far below natural prose, and the signal
    * is robust to the token-level tricks that fool word-ratio filters.
    * A UDF is unavoidable (no zlib in Catalyst, none in any SQL oracle —
    * hence rows-only gating with a property-pinned spec), but the op stays
    * a narrow zero-shuffle projection; empty text defines ratio = 1.0.
    * Deterministic for a fixed zlib implementation (the JDK's), which is
    * what reproducible corpus recipes pin anyway. */
  private lazy val deflateRatioUdf =
    udf { (s: String) =>
      if (s == null) None
      else {
        val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (raw.isEmpty) Some(1.0)
        else {
          val d = new java.util.zip.Deflater(6, true)
          try {
            d.setInput(raw)
            d.finish()
            val buf   = new Array[Byte](8192)
            var total = 0L
            while (!d.finished()) total += d.deflate(buf)
            Some(total.toDouble / raw.length)
          } finally d.end()
        }
      }
    }

  /** Deflated-bytes / raw-bytes of a text column — see [[deflateRatioUdf]]. */
  def deflateRatio(c: Column): Column = deflateRatioUdf(c)

  /** Raw deflate output size in bytes (same fixed configuration as
    * [[deflateRatioUdf]]: level 6, raw stream). Unlike the ratio, empty
    * input is NOT special-cased — the deflater still emits its final empty
    * block (2 bytes), so the count is exactly what `Deflater(6, nowrap)`
    * produces for every input. This is the pinnable integer the planted-
    * payload oracle checks against an independent zlib (python 1.2.13
    * agrees byte-for-byte on the whole fixture). */
  private lazy val deflateBytesUdf =
    udf { (s: String) =>
      if (s == null) None
      else {
        val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d   = new java.util.zip.Deflater(6, true)
        try {
          d.setInput(raw)
          d.finish()
          val buf   = new Array[Byte](8192)
          var total = 0L
          while (!d.finished()) total += d.deflate(buf)
          Some(total)
        } finally d.end()
      }
    }

  /** Deflate-output byte count of a text column — see [[deflateBytesUdf]]. */
  def deflateBytes(c: Column): Column = deflateBytesUdf(c)

  /** C4/RefinedWeb-style line-level boilerplate removal: a line that occurs
    * in `minDf` or more DISTINCT documents is navigation/cookie-banner/
    * footer chrome, not content — remove it from every document it appears
    * in (C4 §2.2 "three-sentence span seen more than once" is the span
    * variant, [[dedupNgramSpans]]; this is the line-level pass RefinedWeb
    * runs first). Blank lines are dropped. A document whose every line is
    * boilerplate disappears from the output entirely.
    *
    * Scale shape (the 100 TB pass):
    *  1. one narrow posexplode into (doc, pos, line) rows — no shuffle
    *     (spread-gated for under-split local inputs);
    *  2. line document-frequency on the 64-bit line hash — ONE exchange,
    *     partial-aggregated map-side;
    *  3. the HOT set (lines at/over `minDf`) is tiny by construction —
    *     boilerplate is by definition few distinct strings — so it
    *     broadcasts as a LeftAnti; the keep-set never ships anywhere
    *     (same discipline as [[graft.operators.Dedup.lshCandidates]]'
    *     bucket cap);
    *  4. reassembly groups by document — the second and last exchange —
    *     folding surviving lines in position order (array_sort on the
    *     (pos, line) struct: exact, order-fixed, oracle-replayable).
    *
    * Hash-vs-text note: DF is computed on `xxhash64(line)`; a 64-bit
    * collision between a hot and a cold line would mis-drop the cold one
    * (probability ~n²/2⁶⁴ — negligible; the DuckDB oracle groups on the
    * line text itself and hash-matches, witnessing no collision at test
    * scale). */
  def lineDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int,
      hotBroadcastCap: Long = 4L * 1000 * 1000): DataFrame = {
    val (hotCached, out) = lineDedupPlan(df, idCol, textCol, minDf, hotBroadcastCap)
    // NOTE the plan construction above is EAGER (the broadcast-vs-shuffle
    // gate counts the hot set); the localCheckpoint materializes the
    // result so the cached hot set can be released here instead of living
    // for the session (same shape as dsirLogWeights).
    val materialized = out.localCheckpoint(true)
    hotCached.unpersist(false)
    materialized
  }

  /** The un-materialized [[lineDedup]] plan, as (cached hot-line set,
    * result) — exposed so tests can assert the broadcast-vs-shuffled
    * anti-join gating on the LIVE plan (the public wrapper checkpoints,
    * hiding it). Callers must unpersist the hot set after consuming. */
  private[graft] def lineDedupPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int,
      hotBroadcastCap: Long): (DataFrame, DataFrame) = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = spreadSmallInput(df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(length(trim(col("line"))) > 0)
      .select(col(idCol), col("pos"), col("line"), xxhash64(col("line")).as("h"))
    val hot = lines
      .groupBy("h")
      .agg(countDistinct(col(idCol)).as("line_df"))
      .filter(col("line_df") >= minDf)
      .select("h")
    // The hot-set size is DATA-dependent: genuine boilerplate is few
    // distinct strings, but a template-heavy corpus (every doc a near-copy)
    // can push the at/over-minDf set toward line scale, and an unconditional
    // broadcast hint would then OOM the driver. Count it once (persisted, so
    // the anti-join reuses the same rows instead of re-aggregating) and
    // broadcast only under `hotBroadcastCap` 8-byte keys; past the cap fall
    // back to a shuffled left_anti on the 64-bit hash — a corpus-scale
    // exchange, but the only correct shape once the build side isn't tiny.
    val hotCached = hot.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept =
      if (hotCached.count() <= hotBroadcastCap) lines.join(broadcast(hotCached), Seq("h"), "left_anti")
      else lines.join(hotCached, Seq("h"), "left_anti")
    val out = kept
      .groupBy(col(idCol))
      .agg(
        concat_ws(
          "\n",
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as(textCol))
    (hotCached, out)
  }

  /** Snapshot diff between two versions of a corpus: the change feed a
    * continuously-refreshed training set needs before re-running the
    * expensive downstream passes (dedup/decontam/tokenize touch only
    * `added`/`changed` docs; `removed` ids tombstone out of the index).
    * One full outer join on the id — the single shuffle — comparing a
    * 128-bit content digest, never the text twice: (id, status) with
    * status ∈ added | removed | changed (unchanged rows are dropped —
    * at 100 TB the diff output must scale with the CHANGE, not the
    * corpus). */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // sha2-256, not md5: the corpus is untrusted web text, and md5
    // collisions are practically constructible — a crafted edit could
    // collide with the old digest and be reported "unchanged", skipping
    // dedup/decontam on it. The hash is per-row and off the hot path, so
    // the cryptographic margin is free relative to the full-outer join.
    val o = oldDf.select(col(idCol), sha2(col(textCol).cast("binary"), 256).as("__old_fp"))
    val n = newDf.select(col(idCol), sha2(col(textCol).cast("binary"), 256).as("__new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("__old_fp").isNull, "added")
          .when(col("__new_fp").isNull, "removed")
          .when(col("__old_fp") =!= col("__new_fp"), "changed")
          .as("status"))
      .filter(col("status").isNotNull)
  }

  /** Concat-and-chunk sequence packing: assign every document the training
    * context window ("pack") its FIRST token lands in, under the scheme that
    * concatenates a shard's documents in `idCol` order and slices the token
    * stream into `capacity`-token windows. Output per surviving document:
    * (doc_id, shard, n_tokens, pack_id, pack_offset) — integers only, so any
    * engine replaying the same order computes the same packing. Zero-token
    * documents are dropped (they occupy no tokens).
    *
    * Packing is per-`shardCol` because that is how pipelines run it: the
    * mixing weights are per source/shard, and packing inside a shard keeps
    * windows homogeneous. Each shard is one window partition — an
    * independent range-sorted prefix sum, so shards pack in parallel and no
    * shard ever sees another's rows. At 100 TB a single giant source should
    * be pre-split into bounded sub-shards (any deterministic function of the
    * id: `pmod(hash(id), k)` as an extra shard key) — the operator takes any
    * shard expression, so that is a caller-side choice, not a new code path. */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Int,
      shardCol: String): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        col(idCol).as("doc_id"),
        col(shardCol).as("shard"),
        size(toks(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("doc_id"),
        col("shard"),
        col("n_tokens"),
        (col("start") / capacity).cast("long").as("pack_id"),
        (col("start") % capacity).as("pack_offset"))
  }

  /** Fixed-window document chunking with overlap — the context-window
    * splitter that feeds long documents to a bounded-sequence trainer (or a
    * RAG indexer): chunk i covers tokens [i·stride, i·stride + chunkSize)
    * with stride = chunkSize − overlap; the last chunk may be short; a
    * document no longer than chunkSize is one chunk. Complements
    * [[packSequences]] (which bins SHORT documents up to a budget; this
    * splits LONG ones down to it).
    *
    * Scale shape: purely narrow — tokenize, compute the chunk count
    * arithmetically, explode one row per chunk. Zero shuffles, zero driver
    * state; parallelism is whatever the scan provides. Chunk counts are
    * exact integer arithmetic so the output is engine-portable
    * (oracle-checked). */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize, s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val nChunks = when(col("len") <= chunkSize, lit(1L))
      .otherwise(floor((col("len") - chunkSize + (stride - 1)).cast("double") / stride).cast("long") + 1L)
    df.select(col(idCol).as("doc_id"), toks(col(textCol)).as("toks"))
      .withColumn("len", size(col("toks")).cast("long"))
      .filter(col("len") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1L)))
      .select(
        col("doc_id"),
        col("chunk_id"),
        concat_ws(" ", slice(col("toks"), (col("chunk_id") * stride + 1L).cast("int"), lit(chunkSize)))
          .as("chunk_text"),
        least(col("len") - col("chunk_id") * stride, lit(chunkSize.toLong)).as("n_tokens"))
  }

  /** Top-`topK` vocabulary by corpus frequency, deterministically ranked
    * (count desc, then token asc — ties never reorder across engines).
    * Output: (token, n_occurrences, rank), rank 1-based.
    *
    * The explode is map-side partial-aggregated, so the shuffle carries
    * (token, partial count) — one row per distinct token per partition, not
    * per occurrence. The top-K cut is a `TakeOrderedAndProject` (bounded
    * per-partition heaps — the distinct-token table is vocabulary-sized,
    * millions of rows at web scale, and NEVER funnels through one
    * partition); only the topK survivors, already bounded by the caller's
    * K, pass through the final rank window. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame = {
    val counts = df
      .select(explode(toks(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
    counts
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)
      .withColumn(
        "rank",
        row_number()
          .over(Window.orderBy(col("n_occurrences").desc, col("token")))
          .cast("long"))
  }

  /** Heaps-law vocabulary-growth curve: V(N) — distinct tokens seen after
    * the first N tokens of the corpus in doc-id order — sampled at
    * `points` evenly-spaced document checkpoints. The curve's shape is the
    * classic corpus-health diagnostic: natural text grows V ≈ K·N^β with
    * β ≈ 0.5 (Heaps 1978); a flattening curve means duplication/boiler-
    * plate, a too-steep one encoding rot or ID-like junk tokens.
    *
    * Distributed shape: token first-occurrence docs and per-doc lengths
    * are corpus-wide aggregations (map-side combined); the doc-level
    * cumulative table (one row per DOCUMENT — a count that grows with the
    * corpus) runs through [[PrefixSum.withRunning]]'s two-phase
    * range-partitioned prefix sum, never a single-partition global
    * window. Exact integers end to end. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String, points: Int = 10): DataFrame = {
    require(points >= 1, "points must be >= 1")
    val tokRows = df.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
    val perDoc = tokRows.groupBy(col("doc_id")).agg(count(lit(1)).as("n_toks"))
    val newPerDoc = tokRows
      .groupBy(col("token"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_new"))
    val cum = PrefixSum
      .withRunning(
        perDoc
          .join(newPerDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_toks"), coalesce(col("n_new"), lit(0L)).as("n_new")),
        order = Seq(col("doc_id")),
        running = Seq("tokens_seen" -> col("n_toks"), "vocab_size" -> col("n_new")),
        rowNumberAs = Some("docs_seen"))
      .select(col("docs_seen"), col("tokens_seen"), col("vocab_size"))
    val nDocs = df.count()
    val marks = (1 to points).map(i => Math.floorDiv(i * nDocs, points.toLong)).distinct.filter(_ >= 1)
    cum.filter(col("docs_seen").isin(marks: _*))
  }

  /** Per-document out-of-vocabulary rate against `vocab` (any DataFrame with
    * a `token` column, e.g. [[vocabulary]]'s output): (doc_id, n_tokens,
    * oov_frac) where oov_frac is the fraction of token OCCURRENCES outside
    * the vocabulary — the signal that routes a document to the right
    * tokenizer or flags encoding rot.
    *
    * The vocabulary is broadcast (top-K vocabularies are bounded by
    * construction), so the corpus side is scan → explode → broadcast left
    * join → doc-keyed count — map-side partial aggregation, no corpus-sized
    * distinct, one keyed shuffle. */
  def oovRate(df: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame = {
    val v = broadcast(vocab.select(col("token")).distinct().withColumn("in_vocab", lit(1)))
    df.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .join(v, Seq("token"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(when(col("in_vocab").isNull, 1).otherwise(0)).cast("double") / count(lit(1)))
          .as("oov_frac"))
  }

  /** Deterministic mixture rebalancing: resample each source to a target
    * rate — the "data mixing" step every pretraining pipeline runs (e.g.
    * down-weight raw web crawl, up-weight books/code; cf. the mixture
    * tables in GPT-3 §2.2 and Gopher App. A). A rate r gives every
    * document ⌊r⌋ copies plus one more with probability frac(r), decided
    * by a hash of the document id — so the SAME documents are kept on
    * every run, on any engine, at any parallelism (reproducible data
    * recipes; no RNG state).
    *
    * The fractional keep-test compares a fixed-width md5 hex prefix of the
    * id against a PRECOMPUTED hex threshold (16-bit resolution), so the
    * whole operator is literals + md5 — portable to any engine verbatim,
    * which is what makes the oracle a hash-check rather than a
    * distribution test. Output: (doc_id, source, copy_idx) with copy_idx
    * 0..copies-1 — upsampled docs appear multiple times, dropped docs not
    * at all.
    *
    * Scale shape: a narrow projection + filter + bounded explode (≤⌈max
    * rate⌉ rows per input row) — zero shuffles, pushdown-friendly. */
  def resampleMixture(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0), "rates must be >= 0")
    def base(r: Double): Long  = math.floor(r).toLong
    def thresh(r: Double): String = f"${math.floor((r - math.floor(r)) * 65536).toInt}%04x"
    // deterministic plan: fold sources in sorted order into one CASE chain
    val sorted = rates.toSeq.sortBy(_._1)
    val baseCol = sorted.foldLeft(lit(base(defaultRate))) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(base(r))).otherwise(acc)
    }
    val threshCol = sorted.foldLeft(lit(thresh(defaultRate))) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(thresh(r))).otherwise(acc)
    }
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    df.select(
        col(idCol).as("doc_id"),
        col(sourceCol).as("source"),
        (baseCol + when(h < threshCol, 1L).otherwise(0L)).as("copies"))
      .filter(col("copies") > 0)
      .select(
        col("doc_id"),
        col("source"),
        explode(sequence(lit(0L), col("copies") - 1)).as("copy_idx"))
  }

  /** Linear quality-classifier INFERENCE (the fastText/CCNet filtering
    * shape: LLaMA filters CommonCrawl with a linear classifier over cheap
    * text features; CCNet with an LM + linear head): score = σ(b + w·f)
    * over four deterministic features — tokens-per-char, stopword ratio,
    * punctuation ratio, log(1+len). Training happens OFFLINE; this is the
    * serving pass a 100 TB filter actually runs, so weights arrive as
    * parameters and the whole operator is a narrow zero-shuffle projection
    * (codegen'd builtins, no UDF) that rides the scan.
    *
    * Determinism contract: the ratio features are exact int/int double
    * divisions; w·f folds in FIXED feature order as a literal chain (never
    * an unordered SUM); the two libm calls (ln, exp) can differ in the
    * last ulp across engines, so the emitted score is round(·, 6).
    * Output: (doc_id, quality_score ∈ (0,1)). */
  /** The four deterministic surface-quality features shared by
    * [[linearQualityScore]] (serving) and [[trainQualityClassifier]]
    * (training): tokens/char, stopword ratio, punctuation ratio — exact
    * IEEE divisions of exact integer counts — and ln(1+len). */
  private def qualityFeatures(textCol: String): (Column, Column, Column, Column) = {
    val toksC     = toks(col(textCol))
    val stopwords = array(Seq("the", "a", "and", "of", "to").map(lit): _*)
    val len       = length(col(textCol))
    val nt        = size(toksC)
    val f1 = nt.cast("double") / greatest(len, lit(1))
    val f2 = size(filter(toksC, t => array_contains(stopwords, t))).cast("double") /
      greatest(nt, lit(1))
    val f3 = size(regexp_extract_all(col(textCol), lit("[^a-z0-9\\s]"), lit(0))).cast("double") /
      greatest(len, lit(1))
    val f4 = log(lit(1.0) + len.cast("double"))
    (f1, f2, f3, f4)
  }

  def linearQualityScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      wTokensPerChar: Double,
      wStopwordRatio: Double,
      wPunctRatio: Double,
      wLogLen: Double,
      bias: Double,
      keep: Seq[String] = Nil): DataFrame = {
    val (f1, f2, f3, f4) = qualityFeatures(textCol)
    val z = lit(bias) +
      lit(wTokensPerChar) * f1 +
      lit(wStopwordRatio) * f2 +
      lit(wPunctRatio) * f3 +
      lit(wLogLen) * f4
    docs.select(
      col(idCol).as("doc_id") +:
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality_score") +:
        keep.map(col): _*)
  }

  /** Train the linear quality classifier IN the engine: full-batch gradient
    * descent on logistic loss over the [[qualityFeatures]] (plus bias),
    * labels supplied by the caller (e.g. "is this the target language" —
    * the fastText-quality-filter recipe trained from weak labels). Returns
    * the 5-row (feature, weight) model — [[linearQualityScore]] serves it.
    *
    * Deterministic/oracle contract (kmeans' unrolled-iteration discipline
    * applied to GD):
    *  - features are rounded to the 1e-9 grid and held as DECIMAL(13,9) —
    *    exact int-division doubles land identically in both engines, and
    *    ln(1+len)'s last-ulp freedom cannot cross a 1e-9 boundary except
    *    with ~1e-7 probability per doc;
    *  - per-iteration margins are plain double arithmetic over the
    *    decimal-cast-to-double features in a FIXED fold order; the error
    *    term σ(m)−y is rounded to 1e-9 and becomes DECIMAL(12,9), so the
    *    gradient Σ err·x is EXACT decimal arithmetic — order-free at any
    *    parallelism (the grid, not the sum, absorbs exp()'s ulp);
    *  - the weight update w −= lr·(g/n) is the same double op sequence
    *    either engine replays.
    *
    * Scale shape: one cached scan of the featurized corpus; each iteration
    * is ONE aggregation shuffling 5 decimal partial sums per task — the
    * driver only ever holds the 5-weight model (bounded-model contract,
    * like [[graft.operators.Similarity.kmeans]]).
    *
    * NULL labels are coalesced to 0.0 (negative class) BEFORE the gradient:
    * without the coalesce a null y nulls its err term — dropped from the
    * gradient sums yet still counted in n — silently diverging from any
    * CASE-based oracle that maps the null row to class 0. Callers wanting
    * null rows EXCLUDED should filter before calling. */
  def trainQualityClassifier(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      iters: Int = 8,
      lr: Double = 0.5): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val (f1, f2, f3, f4) = qualityFeatures(textCol)
    val dec9             = org.apache.spark.sql.types.DecimalType(13, 9)
    val feats = docs
      .select(
        coalesce(label.cast("double"), lit(0.0)).as("y"),
        round(f1, 9).cast(dec9).as("x1"),
        round(f2, 9).cast(dec9).as("x2"),
        round(f3, 9).cast(dec9).as("x3"),
        round(f4, 9).cast(dec9).as("x4"))
      .select(
        col("y"),
        col("x1"),
        col("x2"),
        col("x3"),
        col("x4"),
        col("x1").cast("double").as("x1d"),
        col("x2").cast("double").as("x2d"),
        col("x3").cast("double").as("x3d"),
        col("x4").cast("double").as("x4d"))
      .persist()
    val n = feats.count().toDouble
    require(n > 0, "trainQualityClassifier needs at least one document")
    val w = Array(0.0, 0.0, 0.0, 0.0, 0.0) // bias, x1..x4
    try {
      var it = 0
      while (it < iters) {
        val margin = lit(w(0)) + lit(w(1)) * col("x1d") + lit(w(2)) * col("x2d") +
          lit(w(3)) * col("x3d") + lit(w(4)) * col("x4d")
        val err = round(lit(1.0) / (lit(1.0) + exp(-margin)) - col("y"), 9)
          .cast(org.apache.spark.sql.types.DecimalType(12, 9))
        val g = feats
          .select(
            err.as("e"),
            col("x1"),
            col("x2"),
            col("x3"),
            col("x4"))
          .agg(
            sum(col("e")).as("g0"),
            sum(col("e") * col("x1")).as("g1"),
            sum(col("e") * col("x2")).as("g2"),
            sum(col("e") * col("x3")).as("g3"),
            sum(col("e") * col("x4")).as("g4"))
          .head()
        var j = 0
        while (j < 5) {
          w(j) = w(j) - lr * (g.getDecimal(j).doubleValue / n)
          j += 1
        }
        it += 1
      }
    } finally feats.unpersist()
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(
      ("bias", BigDecimal(w(0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("tokens_per_char", BigDecimal(w(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("stopword_ratio", BigDecimal(w(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("punct_ratio", BigDecimal(w(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("log_len", BigDecimal(w(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("feature", "weight")
  }

  /** Quality-mass truncation: per `groupCol` stratum, keep the highest-
    * scoring docs until `p` of the stratum's total score mass is covered —
    * the mass-budget counterpart to the count-budget quota cap (keeping
    * "the best half of the quality" retains more docs from uniformly-good
    * sources and aggressively cuts long junk tails, which a fixed top-N
    * cannot express).
    *
    * Determinism: scores arrive round(·,6) in [0,1]; all mass arithmetic
    * runs in DECIMAL(10,6) sums — exact, order-independent — so the cut
    * predicate (mass of strictly-better score groups < p · total) is
    * engine-exact. Tie groups are indivisible (equal-score docs are equal
    * candidates): the straddling group is kept whole, never split by id.
    * Same bounded-aggregate discipline as [[calibrateScores]]: the window
    * walks the (group, score) aggregate (≤ ~1e6 rows per stratum at any
    * corpus size — one row per distinct rounded score), docs join back on
    * (group, score). */
  def qualityMassCut(
      scored: DataFrame,
      groupCol: String,
      scoreCol: String,
      p: BigDecimal): DataFrame = {
    // p as a DECIMAL literal, not a double: total * p must stay inside
    // exact decimal arithmetic or the cut predicate re-enters FP land
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    val mass = sum(col(scoreCol).cast(org.apache.spark.sql.types.DecimalType(10, 6))).as("__mass")
    val grp  = scored.groupBy(col(groupCol), col(scoreCol)).agg(mass)
    // one row per (group, score) -> a ROWS exclusive-preceding frame over
    // score DESC is exactly "mass of strictly better score groups"
    val before = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col(groupCol))
    val kept = grp
      .select(
        col(groupCol),
        col(scoreCol),
        (coalesce(sum(col("__mass")).over(before), lit(0).cast(org.apache.spark.sql.types.DecimalType(10, 6)))
          < sum(col("__mass")).over(whole) * lit(p.underlying)).as("__keep"))
      .filter(col("__keep"))
      .drop("__keep")
    scored.join(kept, Seq(groupCol, scoreCol))
  }

  /** Cross-source score calibration: percent_rank of `scoreCol` within each
    * `groupCol` stratum — the step that makes classifier scores comparable
    * across sources before mixture tuning thresholds on them (a 0.8 from a
    * clean source and a 0.8 from a noisy one are different animals; their
    * within-source quantiles are not).
    *
    * NOT a window over the corpus: `PARTITION BY source` has only as many
    * partitions as sources, so the naive percent_rank sorts whole-corpus
    * slices on single tasks. Instead the rank arithmetic runs over the
    * (group, score) AGGREGATE — scores arrive rounded to 6 decimals in
    * [0,1], so that relation is bounded at ~1e6 rows per source REGARDLESS
    * of corpus size — and docs join back on (group, score) to pick up their
    * tie-group's rank. Ranks below = cumulative count minus own count; all
    * integers until the final (n_below / (total-1)) division, so the value
    * is engine-exact; ties share a rank exactly like SQL percent_rank.
    * Single-row groups emit 0.0 (the SQL convention). */
  def calibrateScores(scored: DataFrame, groupCol: String, scoreCol: String): DataFrame = {
    val cnt = scored.groupBy(col(groupCol), col(scoreCol)).agg(count(lit(1)).as("__n"))
    val cum = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(groupCol))
    val ranked = cnt.select(
      col(groupCol),
      col(scoreCol),
      (sum(col("__n")).over(cum) - col("__n")).as("__below"),
      sum(col("__n")).over(all).as("__total"))
    val calib = ranked.select(
      col(groupCol),
      col(scoreCol),
      round(
        when(col("__total") === 1, lit(0.0))
          .otherwise(col("__below").cast("double") / (col("__total") - lit(1)).cast("double")),
        6).as("calib_rank"))
    scored.join(calib, Seq(groupCol, scoreCol))
  }

  /** Upper hex boundaries for [[leakageSafeSplit]]'s hash buckets: one
    * 13-hex-digit string per split EXCEPT the last (which catches the
    * remainder) — floor(cumulative_fraction · 16¹³) rendered in hex, so a
    * first-13-hex-of-md5 value compares against them as a plain string.
    * Public so an external checker (the SQL oracle) embeds the exact same
    * literals instead of re-deriving the float arithmetic. */
  def splitBoundaries(fractions: Seq[(String, Double)]): Seq[(String, String)] = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 > 0.0), "split fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.init.zip(cum.init).map { case ((name, _), c) =>
      name -> f"${math.floor(c * math.pow(16.0, 13)).toLong}%013x"
    }
  }

  /** Leakage-safe train/validation/test assignment: the fold is decided
    * per NEAR-DUP CLUSTER, never per document — a near-duplicate of a
    * training document in the eval fold is exactly the contamination that
    * inflates benchmark numbers (the reason GPT-3 App. C / PaLM dedup
    * their eval sets against training data), and an independent per-doc
    * split puts SOME member of almost every large cluster in every fold.
    *
    * `clusters` is [[Dedup.duplicateClusters]] output (doc_id, cluster_id)
    * over whichever pair generator fits the scale (exact jaccard,
    * MinHash+LSH, embedding cosine); documents absent from it are
    * singletons and anchor their own cluster. The fold is then a pure
    * function of md5(cluster_id) against precomputed hex thresholds
    * ([[splitBoundaries]] — same derandomized-hash discipline as
    * [[resampleMixture]]): reproducible on any engine at any parallelism,
    * and stable under corpus growth (new singletons never move existing
    * clusters between folds).
    *
    * Scale shape: one doc-keyed left join against the (much smaller)
    * cluster map, then a narrow md5 + CASE projection — no extra
    * shuffles beyond the join. Output: (doc_id, cluster_id, split). */
  def leakageSafeSplit(
      docs: DataFrame,
      idCol: String,
      clusters: DataFrame,
      fractions: Seq[(String, Double)]): DataFrame = {
    val bounds = splitBoundaries(fractions)
    val labeled = docs
      .select(col(idCol).as("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val h = substring(md5(col("cluster_id").cast("string")), 1, 13)
    val splitCol = bounds.reverse.foldLeft(lit(fractions.last._1)) {
      case (acc, (name, b)) => when(h < lit(b), lit(name)).otherwise(acc)
    }
    labeled.select(col("doc_id"), col("cluster_id"), splitCol.as("split"))
  }

  /** Reproducible corpus sharding — the terminal write-side step of a
    * training pipeline (tokenize → pack → SHUFFLE → shard): every document
    * gets (shard, order_key) where `shard` is an equal-width md5 hash
    * range over the 16-bit prefix grid (the [[resampleMixture]]
    * quantization, so boundaries are exact hex literals any engine
    * replays) and `order_key` is the full md5 hex of the id — a
    * deterministic global shuffle: same shard contents and same
    * within-shard order on any engine, any parallelism, any run, with no
    * RNG state to checkpoint.
    *
    * The assignment itself is a ZERO-shuffle narrow projection
    * (plan-asserted). Writers then `repartition($"shard")
    * .sortWithinPartitions($"order_key")` — ONE exchange and a
    * per-partition sort, never a global order-by — which at 100 TB is the
    * only affordable shape for "write N shuffled training shards". */
  def shardAssignment(df: DataFrame, idCol: String, shards: Int): DataFrame =
    withShardColumns(df, idCol, shards)
      .select(col(idCol).as("doc_id"), col("shard"), col("order_key"))

  /** [[shardAssignment]]'s column form: appends (shard, order_key) to the
    * FULL row — the shape a shard writer consumes without a join back
    * ([[graft.sources.Sinks.writeTrainingShards]]). */
  def withShardColumns(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 65536, s"shards must be in [1, 65536], got $shards")
    val hex = md5(col(idCol).cast("string"))
    val h   = substring(hex, 1, 4)
    // boundary i = floor(65536·i/shards), as 4-hex literals
    val bounds = (1 until shards).map(i => f"${i * 65536L / shards}%04x")
    val shardCol = bounds.zipWithIndex.reverse.foldLeft(lit(shards - 1): Column) {
      case (acc, (b, i)) => when(h < lit(b), lit(i)).otherwise(acc)
    }
    df.withColumn("shard", shardCol).withColumn("order_key", hex)
  }

  /** Temperature-flattened source mixture (the multilingual/multi-source
    * LM recipe — mT5/XLM-R sample source i ∝ p_i^{1/τ}: τ=1 keeps natural
    * proportions, τ→∞ approaches uniform — the knob that keeps a dominant
    * crawl from drowning rare sources without hand-tuning per-source
    * rates). Rates are DERIVED FROM THE DATA: one bounded groupBy-count
    * (collect is #sources rows), rate_i = (n_i^{1/τ} / Σ_j n_j^{1/τ}) ·
    * N / n_i — expected output size stays N — then the whole thing lowers
    * onto [[resampleMixture]]'s derandomized md5-threshold machinery, so
    * the kept/duplicated document set is reproducible on any engine.
    *
    * Determinism contract: the Σ over sources folds in ASCENDING SOURCE
    * ORDER (an external checker replays it with an ordered list_reduce);
    * the one libm call (pow) can differ in the last ulp across engines,
    * but rates pass through resampleMixture's 16-bit threshold
    * quantization, so a flip needs the fractional rate within ~2⁻⁴⁰ of a
    * bucket boundary — negligible, and the oracle hash-check would catch
    * it loudly rather than silently. */
  def temperatureMixture(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tau: Double): DataFrame = {
    require(tau >= 1.0, s"tau must be >= 1 (1 = natural proportions), got $tau")
    val counts = df
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(counts.nonEmpty, "temperatureMixture needs a non-empty corpus")
    val nn = counts.map(_._2).sum
    // tau == 1 is the identity mixture BY CONTRACT: computing it through
    // pow/fold would give rate = ((n/Σn)·Σn)/n = 0.999… for some count
    // distributions and silently drop ~1/65536 of a source — special-case
    // to exactly 1.0 (the oracle mirrors this).
    val rates =
      if (tau == 1.0) counts.map { case (s, _) => s -> 1.0 }.toMap
      else {
        val q = counts.map { case (s, n) => (s, math.pow(n.toDouble, 1.0 / tau)) }
        val z = q.foldLeft(0.0)(_ + _._2)
        q.zip(counts).map { case ((s, qv), (_, n)) =>
          s -> (qv / z * nn.toDouble / n.toDouble)
        }.toMap
      }
    resampleMixture(df, idCol, sourceCol, rates)
  }

  /** Per-source quota cap: keep at most `quota` documents per source — the
    * domain-balancing step web-scale pipelines run so one giant crawl host
    * can't dominate the mixture (RefinedWeb §3.1 caps URLs per domain;
    * C4 and Gopher apply the same per-host discipline). Which documents
    * survive is decided by ranking on a portable hash of the id
    * (md5, doc_id tiebreak), so the kept set is a uniform, reproducible
    * sample of each source — same rows on every run, any engine, any
    * parallelism — rather than an ingestion-order artifact.
    *
    * Executed with the bounded-heap [[TopK.perGroup]] physical operator:
    * each map task keeps a `quota`-row heap per source it sees, so the
    * shuffle carries ≤ quota·sources rows per partition — NOT the window
    * equivalent (full shuffle of every row + per-partition sort), which at
    * 100 TB would move the whole corpus to rank it. Output: (doc_id,
    * source) of the survivors. */
  def quotaPerSource(df: DataFrame, idCol: String, sourceCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val ranked = df.select(
      col(idCol).as("doc_id"),
      col(sourceCol).as("source"),
      md5(col(idCol).cast("string")).as("rank_h"))
    TopK
      .perGroup(ranked, Seq("source"), Seq("rank_h" -> true, "doc_id" -> true), quota)
      .select(col("doc_id"), col("source"))
  }

  /** Per-document top-k keyword extraction: the highest-frequency tokens of
    * each document, with the global document frequency carried alongside —
    * the distinctive-terms signal tagging/routing/quality pipelines compute
    * per shard. Ranking is fully integer-deterministic (tf desc, then
    * global df asc — rarer wins a tie as the more distinctive term — then
    * token asc), so the result is engine-portable and hash-checkable; no
    * floating-point tf·idf score whose last ulp differs across engines.
    *
    * Scale shape — ONE corpus pass: tf is a (doc, token)-keyed aggregate
    * (map-side partial, riding the up-front doc_id repartition with no
    * exchange of its own); df is a token-keyed AGGREGATE of the ALREADY-
    * reduced tf rows (one row per (doc, token), so the group count IS the
    * document frequency) joined back — never a token-partitioned window,
    * which would funnel every occurrence row of a stopword ("the") into
    * ONE partition at corpus scale; the aggregate partial-combines
    * map-side and the join-back is AQE-skew-splittable. The final ranking
    * runs on bounded [[TopK.perGroup]] heaps, never a rank-window sort of
    * the tf table. */
  def keywordsTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val tok = spreadSmallInput(docs, col(idCol))
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val withDf = tf.join(tf.groupBy("token").agg(count(lit(1)).as("df")), "token")
    TopK
      .perGroup(withDf, Seq("doc_id"), Seq("tf" -> false, "df" -> true, "token" -> true), k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"))
  }

  /** DSIR importance log-weights (Xie et al., NeurIPS'23 "Data Selection for
    * Language Models via Importance Resampling"): score every raw document
    * by how much more likely its hashed n-gram features are under a TARGET
    * distribution than under the raw corpus's own —
    * log ŵ(x) = Σ_b c_b(x)·Δ_b, Δ_b = ln p̂_t(b) − ln p̂_r(b),
    * p̂(b) = (count_b + λ)/(total + λ·B): add-λ smoothed multinomials over
    * B hash buckets. Downstream selection resamples by weight; emitting the
    * per-doc log-weight keeps the operator composable (top-k cut, Gumbel
    * resample, [[quotaPerSource]]-style mixing).
    *
    * Features follow the paper: unigrams + bigrams of the whitespace token
    * stream, hashed into `buckets` buckets via the engine-portable
    * [[graft.functions.TextFunctions.portable_hash64]] + pmod, so a SQL
    * oracle replays the featurization bit for bit.
    *
    * Determinism contract (the oracle hash-compares doubles): each Δ_b is
    * rounded to the 1e-12 grid and cast DECIMAL(30,12), so the per-doc
    * Σ c_b·Δ_b is EXACT decimal arithmetic — order-free, no float fold —
    * and only the final emit rounds to 1e-6 DOUBLE. A last-ulp ln()
    * disagreement between engines perturbs one Δ_b by at most 1e-12, which
    * cannot move the 1e-6-rounded sum off its grid point unless the true
    * value sits within ~1e-10 of a rounding boundary — the absorb-the-ulp
    * judgment of [[charEntropy]], made sturdier by the intermediate grid.
    *
    * Scale shape (100 TB): the feature stream explodes to ~2·tokens rows
    * but partial-aggregates map-side into (doc, bucket) counts; the bucket
    * tables are bounded by B (default 2^16 rows) REGARDLESS of corpus
    * size, so the Δ table always broadcasts; one doc-keyed aggregation
    * emits the weights. The target corpus is eval-sized by construction;
    * the raw corpus pays one scan (cached feature stream feeds both the
    * bucket histogram and the per-doc counts) plus one bounded shuffle. */
  def dsirLogWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1 << 16,
      lambda: Double = 1.0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import graft.functions.TextFunctions.portable_hash64

    def feats(df: DataFrame): DataFrame =
      spreadSmallInput(df.select(col(idCol), col(textCol)), col(idCol))
        .select(col(idCol).as("doc_id"), toks(col(textCol)).as("ts"))
        .select(
          col("doc_id"),
          explode(
            concat(
              col("ts"),
              expr(
                "transform(slice(ts, 1, greatest(size(ts) - 1, 0)), (t, i) -> concat(t, ' ', ts[i + 1]))")))
            .as("gram"))
        .select(col("doc_id"), pmod(portable_hash64(col("gram")), lit(buckets.toLong)).as("bucket"))

    val rawFeats = feats(raw).cache() // feeds the histogram AND the per-doc counts
    val tCounts  = feats(target).groupBy("bucket").agg(count(lit(1)).as("tc"))
    val rCounts  = rawFeats.groupBy("bucket").agg(count(lit(1)).as("rc"))
    val tTot     = tCounts.agg(sum(col("tc")).as("t_tot"))
    val rTot     = rCounts.agg(sum(col("rc")).as("r_tot"))
    val lamB     = lambda * buckets
    // buckets no raw document touches can't contribute to any weight, so a
    // LEFT join from the raw histogram is complete (target-only buckets drop)
    val delta = rCounts
      .join(tCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(
        col("bucket"),
        round(
          log(coalesce(col("tc"), lit(0L)) + lambda) - log(coalesce(col("t_tot"), lit(0L)) + lamB)
            - log(col("rc") + lambda) + log(col("r_tot") + lamB),
          // DECIMAL(20,12), not (30,12): Spark's product type is
          // decimal(p1+p2+1, s1+s2) capped at precision 38 WITH SCALE LOSS
          // (allowPrecisionLoss) — a (30,12)·bigint product silently
          // re-rounds every term at scale 6 and the per-doc sum walks
          // ~1e-6 off the oracle. (20,12)·(10,0) = (31,12): exact.
          12).cast(org.apache.spark.sql.types.DecimalType(20, 12)).as("delta"))
    val out = rawFeats
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(delta), Seq("bucket"))
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_feats"),
        sum(col("cnt").cast(org.apache.spark.sql.types.DecimalType(10, 0)) * col("delta")).as("dsum"))
      .select(col("doc_id"), col("n_feats"), round(col("dsum"), 6).cast("double").as("log_w"))
    val materialized = out.localCheckpoint(true)
    rawFeats.unpersist(false)
    materialized
  }

  /** Unicode script composition per document: the cheap companion signal
    * to n-gram language ID — a multilingual crawl routes documents by
    * dominant script BEFORE the per-language models run (CCNet buckets by
    * language; script mixing inside one document is itself a spam signal:
    * Latin text stuffed with CJK SEO keywords, Cyrillic homoglyph
    * spoofing). One codegen'd projection, zero shuffles: per-script char
    * counts from regexp_extract_all over explicit code-point ranges, each
    * emitted as count/len — an exact IEEE division of exact integers, so
    * the doubles hash-match cross-engine without rounding. Empty documents
    * are emitted with zero ratios (len guard), not dropped — routing needs
    * a verdict for every doc. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val len = length(col(textCol))
    def ratio(re: String) =
      size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast("double") /
        greatest(len, lit(1)).cast("double")
    df.select(
      col(idCol).as("doc_id"),
      len.cast("long").as("n_chars"),
      ratio("[A-Za-zÀ-ɏ]").as("latin_ratio"),
      ratio("[一-鿿぀-ヿ가-힯]").as("cjk_ratio"),
      ratio("[Ѐ-ӿ]").as("cyrillic_ratio"),
      ratio("[؀-ۿ]").as("arabic_ratio"),
      ratio("[0-9]").as("digit_ratio"),
      ratio("\\s").as("space_ratio"))
  }

  /** Character-level Shannon entropy per document, in bits — the classic
    * gibberish/boilerplate quality signal (low entropy ⇒ repeated filler,
    * near-log2(alphabet) ⇒ random noise; CCNet-style quality gates threshold
    * on it). Emits (doc_id, n_chars, distinct_chars, entropy_bits).
    *
    * Determinism contract (oracle hash-compares doubles): entropy is
    * computed as log2(L) − (Σ c·log2 c)/L over per-char counts, with the
    * Σ folded in ASCENDING CHAR ORDER via a left fold — never an unordered
    * SQL SUM of doubles — and the result emitted as round(·, 6) to absorb
    * last-ulp libm (log2) differences across engines. Zero-length documents
    * emit nothing (no distribution to measure).
    *
    * Scale shape: explode to one row per character but map-side partial
    * aggregate on (doc_id, char) — the shuffle carries per-doc alphabet
    * histograms (≤ alphabet-size rows per doc), never raw characters; a
    * well-split corpus is NOT reshuffled up front ([[spreadSmallInput]] —
    * only a tiny under-split input pays one doc-keyed spread so the
    * explode parallelizes); the per-doc fold then touches ≤ alphabet-size
    * entries. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = spreadSmallInput(df, col(idCol))
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        aggregate(
          array_sort(collect_list(struct(col("ch"), col("c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("c").cast("double") * log2(x.getField("c").cast("double")))
          .as("s"))
      .select(
        col("doc_id"),
        col("n_chars"),
        col("distinct_chars"),
        round(
          log2(col("n_chars").cast("double")) - col("s") / col("n_chars").cast("double"),
          6).as("entropy_bits"))
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021 App. A):
    * duplicate-token fraction, duplicate-bigram fraction, and the fraction
    * of the document owned by its single most frequent token. Documents
    * with zero tokens are dropped (no signal to compute).
    *
    * One narrow pass computes the distinct-ratio columns from the token
    * array in place; the top-token column is explode → two-level aggregate
    * (partial map-side combine on (doc, token)) joined back — both sides
    * shuffle only (doc_id)-keyed rows. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    // one doc_id repartition up front: spreads the small-file scan AND
    // satisfies every downstream clustering ((doc_id, tok) and (doc_id)
    // groupings, the ratios⋈top join) — zero further exchanges
    val base = spreadSmallInput(df, col(idCol))
      .select(col(idCol).as("doc_id"), t.as("toks"))
      .filter(size(col("toks")) > 0)
    val bgs = transform(
      sequence(lit(0), size(col("toks")) - 2),
      i => concat_ws(" ", slice(col("toks"), i + 1, lit(2))))
    val ratios = base.select(
      col("doc_id"),
      (lit(1.0) - size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
        .as("dup_token_frac"),
      when(
        size(col("toks")) >= 2,
        lit(1.0) - size(array_distinct(bgs)).cast("double") / (size(col("toks")) - 1))
        .otherwise(lit(0.0))
        .as("dup_bigram_frac"))
    val top = base
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("top_token_frac"))
    ratios.join(top, Seq("doc_id"))
  }

  /** Feature hashing (the "hashing trick", Weinberger et al. ICML'09):
    * fixed-dimension sparse bag-of-words features with NO vocabulary
    * table — token t lands in bucket portable_hash64(t) & (dim−1) with a
    * ±1 sign from hash bit 40, so collisions cancel in expectation
    * (the unbiasedness trick) and the featurizer is stateless: any
    * executor, any batch, any engine produces the same vector, which is
    * what makes it THE featurizer for streaming/distributed training
    * (vowpal-wabbit style). `dim` must be a power of two.
    *
    * Scale shape: a zero-vocabulary narrow explode + one (doc, bucket)
    * map-side-combined aggregation; the portable roll∘mix64 hash replays
    * in SQL (the DSIR discipline), so the hashed features themselves are
    * oracle-checkable. Returns (doc_id, bucket, value). */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 2 && (dim & (dim - 1)) == 0, s"dim must be a power of two >= 2, got $dim")
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val h = graft.functions.TextFunctions.portable_hash64(col("tok"))
    spreadSmallInput(docs, col(idCol))
      .select(col(idCol).as("doc_id"), explode(toks).as("tok"))
      .select(
        col("doc_id"),
        (h.bitwiseAND(lit((dim - 1).toLong))).as("bucket"),
        when(shiftrightunsigned(h, 40).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L))
          .as("sign"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sign")).as("value"))
  }

  /** Zipf-law fit over the corpus word-frequency distribution: OLS of
    * ln(freq) on ln(rank) — a healthy natural-language corpus sits near
    * slope −1 (Zipf 1949), so the slope is a one-number corpus-health
    * monitor (template/boilerplate floods flatten it, key-value spam
    * steepens it) complementing the Heaps-law vocabulary curve. Returns
    * one row (n_words, slope, intercept).
    *
    * Determinism (the trend_nation_revenue discipline on log-log data):
    * ranks are exact ints (freq DESC, word ASC); each ln lands on the
    * 1e-12 grid as DECIMAL(16,12) BEFORE any aggregation, so the four
    * moments are exact decimal sums at any parallelism; each moment
    * decimal-rounds to scale 9 before its double cast (the DuckDB
    * scale-18 hazard), and the closed form runs in matched double order,
    * round(·, 6). Scale: one vocab-sized count table + one bounded
    * aggregation — the ranking window runs over the vocab, not the
    * corpus. */
  def zipfFit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(16, 12)
    val toks  = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val freqs = spreadSmallInput(docs, col(idCol))
      .select(explode(toks).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
    import org.apache.spark.sql.expressions.Window
    val ranked = freqs
      .withColumn("rank", row_number().over(Window.orderBy(col("freq").desc, col("word").asc)))
      .select(
        round(log(col("rank").cast("double")), 12).cast(dec12).as("x"),
        round(log(col("freq").cast("double")), 12).cast(dec12).as("y"))
    val m = ranked
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(
        col("n"),
        col("n").cast("double").as("nd"),
        round(col("sx"), 9).cast("double").as("sxd"),
        round(col("sxx"), 9).cast("double").as("sxxd"),
        round(col("sy"), 9).cast("double").as("syd"),
        round(col("sxy"), 9).cast("double").as("sxyd"))
    m.select(
      col("n").as("n_words"),
      round(
        (col("nd") * col("sxyd") - col("sxd") * col("syd")) /
          (col("nd") * col("sxxd") - col("sxd") * col("sxd")),
        6).as("slope"),
      round(
        (col("syd") -
          round(
            (col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd")),
            6) * col("sxd")) / col("nd"),
        6).as("intercept"))
  }

  /** C4-style blocklist filtering (Raffel et al. 2020 dropped any page
    * containing a "List of Dirty, Naughty…" word; refined pipelines use a
    * RATIO threshold instead so a single quoted profanity doesn't nuke an
    * encyclopedia article): per-document blocked-token counts against a
    * literal word set, keep = blocked_ratio ≤ maxRatio.
    *
    * Scale shape: the blocklist compiles into the plan as an
    * `array_intersect`-free codegen'd filter over the token array — a
    * ZERO-SHUFFLE narrow projection (the text_quality discipline); real
    * blocklists are a few thousand words, well inside literal-set size.
    * The ratio is one exact-int division rounded to the 1e-9 grid before
    * the ≤ compare, so keep/drop is engine-exact. Returns
    * (doc_id, n_tokens, n_blocked, blocked_ratio, keep). */
  def blocklistFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blocklist: Seq[String],
      maxRatio: Double): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    require(maxRatio >= 0.0 && maxRatio <= 1.0, s"maxRatio in [0,1], got $maxRatio")
    val blocked = blocklist.distinct.toSet
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), t => t.isin(blocked.toSeq.sorted: _*))).as("n_blocked"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_blocked").cast("long").as("n_blocked"),
        round(
          when(col("n_tokens") > 0, col("n_blocked").cast("double") / col("n_tokens").cast("double"))
            .otherwise(lit(0.0)),
          9).as("blocked_ratio"))
      .select(
        col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_blocked"),
        col("blocked_ratio"),
        (col("blocked_ratio") <= lit(maxRatio)).as("keep"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010) — the dictionary-free
    * multi-word complement to [[keywordsTopK]]'s single-token ranking:
    * phrases are maximal content-token runs between stopword/punctuation
    * delimiters; each word scores deg/freq (deg = Σ phrase length over
    * its occurrences — words living in long phrases score up), a phrase
    * scores the sum of its words' scores, and the corpus's distinct
    * phrases rank by score.
    *
    * Exactness: freq/deg are exact integer counts, each word score
    * snaps deg/freq to the 1e-9 grid, phrase scores are exact decimal
    * sums folded over the phrase's words, and ranking uses the exact
    * decimal (score desc, phrase asc) BEFORE the final round(·, 6).
    * Scale: tokenization and phrase assembly are per-doc window work
    * (partition-parallel on doc_id); word stats and the phrase join are
    * vocabulary-sized aggregations. Returns top-`k`
    * (phrase, n_words, n_occurrences, score). */
  def rakeKeyphrases(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      stopwords: Seq[String] = Seq(
        "the", "a", "an", "and", "of", "to", "in", "is", "was", "for",
        "with", "on", "as", "by", "at", "be", "that", "it", "from", "or")): DataFrame = {
    require(k > 0, "k must be positive")
    val dec9 = org.apache.spark.sql.types.DecimalType(20, 9)
    val stop = array(stopwords.distinct.sorted.map(lit): _*)
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(filter(split(col(textCol), "\\s+"), t => length(t) > 0)))
      .select(col("doc_id"), col("pos"),
        col("col").as("token"),
        (array_contains(stop, col("col")) || !col("col").rlike("[a-z0-9]")).as("is_delim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val phrases = toks
      .withColumn("phrase_id", sum(col("is_delim").cast("int")).over(w))
      .filter(!col("is_delim"))
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("token")))), x => x.getField("token")),
          " ").as("phrase"),
        count(lit(1)).as("len"))
      .localCheckpoint(true)
    val occur = phrases
      .select(col("phrase"), col("len"), explode(split(col("phrase"), " ")).as("word"))
    val wordStats = occur
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .select(col("word"),
        round(col("deg").cast("double") / col("freq").cast("double"), 9).cast(dec9).as("wscore"))
    // score each DISTINCT phrase once (freq/deg already count every
    // occurrence); within-phrase repeats keep their multiplicity
    val phraseScores = phrases
      .select(col("phrase")).distinct()
      .select(col("phrase"), explode(split(col("phrase"), " ")).as("word"))
      .join(wordStats, Seq("word"))
      .groupBy(col("phrase"))
      .agg(sum(col("wscore")).as("raw"))
    phrases
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), first(col("len")).as("n_words"))
      .join(phraseScores, Seq("phrase"))
      .orderBy(col("raw").desc, col("phrase"))
      .limit(k)
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        round(col("raw"), 6).cast("double").as("score"))
  }

  /** Isotonic (monotone) calibration of a [0,1] score against a binary
    * label — the PAV fit (Zadrozny & Elkan 2002) every serving stack runs
    * so "0.8 means 80%", complementing [[calibrateScores]]' cross-source
    * percentile alignment with a probability calibration. Scores snap to
    * the 1e-6 grid and bucket into `bins` equal-width bins (decimal
    * multiply + floor — exact, no float boundary); the fitted value uses
    * the MINIMAX characterization of isotonic regression,
    * iso(i) = max_{j≤i} min_{k≥i} avg(y over bins j..k), which needs no
    * sequential pooling loop: interval means come from prefix sums over
    * the OBSERVED-bin table, snap to the 1e-12 grid, and the minimax is
    * exact decimal MIN/MAX — bit-replayable and provably the PAV
    * solution.
    *
    * Scale: one data-sized aggregation; everything after runs on ≤ bins
    * rows (the O(B³) minimax frame is ~20k tiny rows at B = 50 — the
    * reason scores bin before fitting). Output per observed bin:
    * (bin, n, pos, rate, iso) with iso monotone non-decreasing. */
  def isotonicFit(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins in [2,1000], got $bins")
    val dec6  = org.apache.spark.sql.types.DecimalType(9, 6)
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val b = df
      .select(
        least(
          floor(round(col(scoreCol).cast("double"), 6).cast(dec6) * bins).cast("long"),
          lit(bins - 1).cast("long")).as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    val wCum = wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val c = b
      .select(
        col("bin"), col("n"), col("s"),
        row_number().over(wOrd).as("rn"),
        sum(col("n")).over(wCum).as("cn"),
        sum(col("s")).over(wCum).as("cs"))
      .localCheckpoint(true)
    // avg(j..k) = (cs_k − cs_j + s_j) / (cn_k − cn_j + n_j), grid-12
    val pairs = c.as("j")
      .join(c.as("k"), col("k.rn") >= col("j.rn"))
      .select(
        col("j.rn").as("jr"),
        col("k.rn").as("kr"),
        round(
          (col("k.cs") - col("j.cs") + col("j.s")).cast("double") /
            (col("k.cn") - col("j.cn") + col("j.n")).cast("double"),
          12).cast(dec12).as("a"))
    val iso = c.as("i")
      .join(pairs, col("jr") <= col("i.rn") && col("kr") >= col("i.rn"))
      .groupBy(col("i.rn").as("rn"), col("jr"))
      .agg(min(col("a")).as("mn"))
      .groupBy(col("rn"))
      .agg(max(col("mn")).as("iso12"))
    c.join(iso, Seq("rn"))
      .select(
        col("bin"),
        col("n"),
        col("s").as("pos"),
        round(col("s").cast("double") / col("n").cast("double"), 6).as("rate"),
        round(col("iso12"), 6).cast("double").as("iso"))
  }

  /** Flesch readability scores (Flesch 1948 / Kincaid 1975) — the
    * classic audience-level signal used to bucket corpora by reading
    * difficulty (textbook-vs-forum stratification, child-content
    * screens). Counts are deterministic heuristics: words = whitespace
    * tokens, sentences = [.!?]+ segments containing an alphanumeric
    * (floor 1 so fragments score), syllables = max(1, vowel-group runs
    * [aeiouyAEIOUY]+) per word — the standard dictionary-free
    * approximation.
    *
    * Exactness: all three counts are integers; the two score formulas
    * (reading ease 206.835 − 1.015·w/s − 84.6·syl/w; grade
    * 0.39·w/s + 11.8·syl/w − 15.59) run in double with a FIXED operation
    * order from exact-integer inputs — every step correctly rounded and
    * identical cross-engine — then round(·, 6). Empty docs emit NULL
    * scores. Row-local, one narrow projection. */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t     = col(textCol)
    val words = filter(split(t, "\\s+"), w => length(w) > 0)
    val sents = filter(split(t, "[.!?]+"), s => s.rlike("[A-Za-z0-9]"))
    docs
      .select(
        col(idCol).as("doc_id"),
        size(words).cast("long").as("n_words"),
        greatest(size(sents), lit(1)).cast("long").as("n_sentences"),
        aggregate(
          transform(words, w =>
            greatest(size(regexp_extract_all(w, lit("[aeiouyAEIOUY]+"), lit(0))), lit(1))
              .cast("long")),
          lit(0L), (a, x) => a + x).as("n_syllables"))
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_sentences"),
        col("n_syllables"),
        round(
          when(col("n_words") > 0,
            lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
              - lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double"))),
          6).as("flesch_ease"),
        round(
          when(col("n_words") > 0,
            lit(0.39) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
              + lit(11.8) * (col("n_syllables").cast("double") / col("n_words").cast("double"))
              - lit(15.59)),
          6).as("fk_grade"))
  }

  /** The Gopher document-quality rules (Rae et al. 2021, App. A) — the
    * published heuristic battery most large-corpus pipelines start from,
    * complementing [[linearQualityScore]]'s learned score with fixed,
    * auditable gates: word count in [minWords, maxWords]; mean word length
    * in [3, 10]; symbol-to-word ratio ('#' chars + '...' runs) ≤ 1/10;
    * ≤ 1/10 of lines bullet-led; ≤ 3/10 of lines ellipsis-terminated;
    * ≥ 4/5 of words containing an alphabetic character; ≥ 2 distinct hits
    * from the 8-stopword probe list (the "is this prose at all" check).
    *
    * Exactness: every rule is a RATIONAL threshold on integer counts, so
    * each flag is an integer cross-multiplication (word_chars ≥ 3·n_words,
    * 10·n_bullet ≤ n_lines, 5·n_alpha ≥ 4·n_words, …) — no division, no
    * doubles, nothing to round; the row replays bit-for-bit in any engine.
    * One narrow projection, row-local, trivially partition-parallel.
    * Output: (doc_id, n_words, n_lines, wc_ok, mwl_ok, symbol_ok,
    * bullet_ok, ellipsis_ok, alpha_ok, stop_ok, gopher_pass). */
  def gopherRules(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords, s"bad word bounds [$minWords, $maxWords]")
    val t     = col(textCol)
    val words = filter(split(t, "\\s+"), w => length(w) > 0)
    val lines = split(t, "\n")
    docs
      .select(
        col(idCol).as("doc_id"),
        size(words).cast("long").as("n_words"),
        aggregate(transform(words, w => length(w).cast("long")), lit(0L), (a, x) => a + x)
          .as("word_chars"),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines, l => l.rlike("^[-*•]"))).cast("long").as("n_bullet"),
        size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("long").as("n_ellipsis"),
        size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
        Seq("the", "be", "to", "of", "and", "that", "have", "with")
          .map(s => array_contains(words, s).cast("int"))
          .reduce(_ + _).cast("long").as("n_stop"),
        (length(t) - length(regexp_replace(t, "#", ""))).cast("long").as("n_hash"),
        size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0))).cast("long").as("n_dots"))
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_lines"),
        col("n_words").between(minWords, maxWords).as("wc_ok"),
        (col("word_chars") >= col("n_words") * 3 &&
          col("word_chars") <= col("n_words") * 10).as("mwl_ok"),
        ((col("n_hash") + col("n_dots")) * 10 <= col("n_words")).as("symbol_ok"),
        (col("n_bullet") * 10 <= col("n_lines")).as("bullet_ok"),
        (col("n_ellipsis") * 10 <= col("n_lines") * 3).as("ellipsis_ok"),
        (col("n_alpha") * 5 >= col("n_words") * 4).as("alpha_ok"),
        (col("n_stop") >= 2).as("stop_ok"))
      .withColumn(
        "gopher_pass",
        col("wc_ok") && col("mwl_ok") && col("symbol_ok") && col("bullet_ok") &&
          col("ellipsis_ok") && col("alpha_ok") && col("stop_ok"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * A-Res) — "give me k documents drawn proportional to quality", the
    * per-document biased subsample the uniform md5-rank machinery
    * (quotaPerSource/resample) cannot express: each row draws the exact
    * dyadic u = (splitmix64(id ⊕ seed) >> 11 + 1)/2⁵³ ∈ (0, 1] and keys on
    * priority = ln(u)/w — the monotone log of the paper's u^(1/w), so the
    * k LARGEST priorities are exactly the paper's sample and heavier rows
    * win proportionally more often. DERANDOMIZED like every sampler here
    * (randomizedResponse/bootstrap discipline): re-running, re-partitioning
    * or re-ingesting the corpus reproduces the same sample bit-for-bit,
    * and the oracle replays the whole draw.
    *
    * Exactness: the splitmix finalizer is the codegen'd Mix64 expression;
    * u is an exact dyadic; priority rounds to the 1e-9 grid (ln's last-ulp
    * cross-engine freedom absorbed) with doc-id tiebreak — a total order.
    * Weights must be POSITIVE (in-plan raise_error otherwise — a zero
    * weight silently never sampling is the bug this surfaces) and should
    * sit on a decimal grid (e.g. the round-6 quality score).
    *
    * Scale shape: ONE narrow scan; selection is the bounded-heap
    * TopKPerGroup top-k — global, or PER STRATUM when `strata` names
    * grouping columns (k best-weighted docs per source: the biased
    * sibling of quotaPerSource's uniform per-source cut) — O(k·groups)
    * memory per partition, k rows shuffled per (group, partition), never
    * a corpus sort. Output (strata..., doc_id, weight, priority, rn ≤ k
    * per group). */
  def weightedSample(
      docs: DataFrame,
      idCol: String,
      weightCol: Column,
      k: Int,
      seed: Long,
      strata: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val W = org.apache.spark.sql.expressions.Window
    val base = docs.select(
      strata.map(col) ++ Seq(col(idCol).cast("long").as("doc_id"), weightCol.cast("double").as("weight")): _*)
    val h = graft.functions.TextFunctions.mix64(col("doc_id").bitwiseXOR(lit(seed)))
    val u = (shiftrightunsigned(h, 11) + 1).cast("double") / lit(9007199254740992.0)
    val wGuard = when(col("weight") > 0.0, col("weight"))
      .otherwise(raise_error(concat(
        lit("weightedSample: non-positive weight for doc "), col("doc_id").cast("string"))))
    val scored = base.select(
      strata.map(col) ++ Seq(
        col("doc_id"),
        col("weight"),
        round(log(u) / wGuard, 9).as("priority")): _*)
    val top = TopK.perGroup(
      scored,
      groupCols = strata,
      orderCols = Seq("priority" -> false, "doc_id" -> true),
      k = k)
    val w =
      if (strata.isEmpty) W.orderBy(col("priority").desc, col("doc_id"))
      else W.partitionBy(strata.map(col): _*).orderBy(col("priority").desc, col("doc_id"))
    top.withColumn("rn", row_number().over(w))
  }

  /** Data-constrained epoch plan (Muennighoff et al. 2023 "Scaling
    * Data-Constrained Language Models" — the planning read a pipeline runs
    * BEFORE training when the token budget exceeds the unique data): given
    * a total token budget, integer mixture SHARES per source, and a repeat
    * cap expressed as the rational maxEpochsNum/maxEpochsDen (repeating
    * data beyond ~4 epochs returns rapidly decaying value — the paper's
    * headline), emit per source the unique token supply, the budget's
    * desired allocation, the repeat-capped serving level, and the epochs
    * actually run.
    *
    * ALL allocation arithmetic is integer-exact: desired = budget·share
    * DIV Σshares, cap = tokens·num DIV den, served = min(desired, cap) —
    * no float ever decides a token (both engines replay bit-for-bit);
    * only the reported `epochs` ratio is a double, under round(·, 6).
    * Sources missing from `shares` get share 0 (reported, served 0) —
    * the honest "you forgot a source" signal, never a silent drop.
    *
    * Overflow posture: budget·share and tokens·num are LONG×LONG products
    * — at real budgets (10¹³ tokens) times real shares they exceed 2⁶³,
    * so both products route through DECIMAL(19,0)×DECIMAL(19,0) →
    * DECIMAL(38,0) (always representable: each factor < 10¹⁹) before the
    * integral DIV brings them back under the divisor; the quotients fit a
    * long because desired ≤ budget (share ≤ Σshares once shares are
    * validated positive) and cap ≤ tokens·num/den with den ≥ 1 enforced
    * against num at the rational guard. A shares row that is NULL or
    * ≤ 0, or an EMPTY shares frame (Σshares would be NULL and every
    * allocation would come back NULL), fails loudly in-plan via
    * raise_error — the weightedSample weight-guard discipline.
    *
    * Scale shape: ONE map-side-combined per-source token count over the
    * corpus; everything after runs on the source-count-sized frame joined
    * against the (small, broadcast) shares frame. Output one row per
    * source present in the corpus. */
  def epochPlan(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      tokenBudget: Long,
      shares: DataFrame,
      maxEpochsNum: Long = 4L,
      maxEpochsDen: Long = 1L): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    require(maxEpochsNum > 0 && maxEpochsDen > 0,
      s"maxEpochs must be a positive rational, got $maxEpochsNum/$maxEpochsDen")
    val perSource = docs
      .select(col(sourceCol).cast("string").as("source"), size(toks(col(textCol))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    // in-plan share validation: a NULL/non-positive share poisons the
    // integer allocation silently (or flips desired negative) — refuse it
    // at the projection, before any allocation arithmetic runs
    val sh = shares.select(
      col("source").cast("string").as("source"),
      when(col("share").isNull || col("share").cast("long") <= 0L,
        raise_error(concat(lit("epochPlan: share must be a positive long, got "),
          coalesce(col("share").cast("string"), lit("NULL")), lit(" for source "),
          coalesce(col("source").cast("string"), lit("NULL")))))
        .otherwise(col("share").cast("long")).as("share"))
    // an empty shares frame sums to NULL → every allocation would come
    // back NULL; fail loudly instead
    val tot = sh.agg(
      when(sum(col("share")).isNull, raise_error(lit("epochPlan: shares frame is empty")))
        .otherwise(sum(col("share"))).as("share_sum"))
    val joined = perSource
      .join(sh, Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("share"), lit(0L)).as("share"),
        col("share_sum"))
    // SQL DIV: genuine 64-bit integer division — a double `/` would round
    // past 2^53 and silently misallocate tokens at real budgets. The
    // products run in DECIMAL (see scaladoc): LONG×LONG wraps silently in
    // non-ANSI mode at real budgets, DECIMAL(19,0)² → DECIMAL(38,0) never
    // can.
    val desired = expr(
      s"CAST((CAST($tokenBudget AS DECIMAL(19,0)) * CAST(share AS DECIMAL(19,0))) DIV share_sum AS BIGINT)")
    val cap = expr(
      s"CAST((CAST(n_tokens AS DECIMAL(19,0)) * CAST($maxEpochsNum AS DECIMAL(19,0))) DIV $maxEpochsDen AS BIGINT)")
    joined.select(
      col("source"),
      col("n_docs"),
      col("n_tokens"),
      col("share"),
      desired.as("desired_tokens"),
      cap.as("cap_tokens"),
      least(desired, cap).as("served_tokens"),
      round(
        when(col("n_tokens") > 0, least(desired, cap).cast("double") / col("n_tokens").cast("double"))
          .otherwise(0.0),
        6).as("epochs"),
      (desired > cap).as("capped"),
      (desired - least(desired, cap)).as("budget_shortfall"))
  }

  /** Full SPAN MAP of GPT-style sequence packing (Brown et al. 2020 §2.3
    * — concatenate each shard in doc_id order, split every `seqLen`
    * tokens): where [[packSequences]] assigns each doc only the window
    * its FIRST token lands in, this emits one row PER SEQUENCE a doc
    * overlaps, carrying the intra-doc token span and the landing offset —
    * the exact slice map a tokenize-and-pack writer consumes (a
    * boundary-crossing doc contributes its tail to the next sequence, and
    * only the span map says which tokens go where).
    *
    * Output (shard, seq_id, doc_id, doc_tok_start, doc_tok_end, seq_tok_start):
    * token positions are 0-based, end exclusive, seq_id scoped per shard.
    * ALL arithmetic is integer-exact (offsets via a running window sum,
    * splits via DIV — a double `/` would misplace tokens past 2^53);
    * empty docs are skipped (they occupy no positions).
    *
    * Scale shape: one shuffle partitioned by shard; the running offset is
    * a per-shard ordered window, so the SHARD is the parallelism unit —
    * exactly how production packers operate (per input shard, not global:
    * a global order would serialize the cumsum; [[packSequences]]'
    * sub-shard note applies verbatim). The output adds one row per
    * boundary crossing (≤ total_tokens/seqLen extra rows corpus-wide). */
  def packSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int,
      shardCol: String): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive, got $seqLen")
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val base = docs
      .select(
        col(shardCol).cast("string").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        size(toks(col(textCol))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
    val off = base.withColumn("start_off", coalesce(sum(col("n_tok")).over(W), lit(0L)))
    val L = lit(seqLen.toLong)
    off
      .select(
        col("shard"), col("doc_id"), col("n_tok"), col("start_off"),
        explode(sequence(
          expr(s"start_off DIV $seqLen"),
          expr(s"(start_off + n_tok - 1) DIV $seqLen"))).as("seq_id"))
      .select(
        col("shard"),
        col("seq_id"),
        col("doc_id"),
        (greatest(col("start_off"), col("seq_id") * L) - col("start_off")).as("doc_tok_start"),
        (least(col("start_off") + col("n_tok"), (col("seq_id") + 1) * L) - col("start_off"))
          .as("doc_tok_end"),
        (greatest(col("start_off"), col("seq_id") * L) - col("seq_id") * L).as("seq_tok_start"))
  }

  /** Packing efficiency audit for [[packSequences]]: per shard, the token
    * supply, the sequence count ⌈tokens/L⌉, and the padding the LAST
    * (partial) sequence would carry — the number a pipeline watches when
    * choosing shard granularity (padding is pure waste at training time).
    * Integer-exact counts; only the reported fraction is a double under
    * round(·, 6). One map-side-combined aggregation, shard-sized output. */
  def packStats(
      docs: DataFrame,
      textCol: String,
      seqLen: Int,
      shardCol: String): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive, got $seqLen")
    docs
      .select(col(shardCol).cast("string").as("shard"), size(toks(col(textCol))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(
        col("shard"), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens + ${seqLen - 1}) DIV $seqLen").as("n_seqs"),
        (expr(s"(n_tokens + ${seqLen - 1}) DIV $seqLen") * lit(seqLen.toLong) - col("n_tokens"))
          .as("pad_tokens"),
        round(
          (expr(s"(n_tokens + ${seqLen - 1}) DIV $seqLen") * lit(seqLen.toLong) - col("n_tokens"))
            .cast("double") /
            (expr(s"(n_tokens + ${seqLen - 1}) DIV $seqLen") * lit(seqLen.toLong)).cast("double"),
          6).as("pad_frac"))
  }

  /** Per-term burstiness profile over the corpus (Church & Gale 1995 — the
    * "content words arrive in bursts, function words arrive evenly" signal
    * behind stopword detection, keyword weighting and spam-template
    * spotting): for every term with df ≥ minDf, burstiness = cf/df (mean
    * count per CONTAINING doc) and the variance-to-mean ratio over ALL
    * docs, VMR = (Σc² − cf²/N)/cf — VMR ≈ 1 is Poisson (evenly scattered),
    * VMR ≫ 1 is bursty. Counts are exact integers (docs without the term
    * contribute exactly 0 to every sum, so only containing-doc rows are
    * ever materialized); both ratios are one fixed-order double each under
    * round(·, 6). One (term, doc) aggregation then a term-keyed rollup —
    * vocab-sized output, the df floor is the hot-term/noise cut. */
  def termBurstiness(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long): DataFrame = {
    require(minDf >= 1, s"minDf must be positive, got $minDf")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val perDoc = docs
      .select(col(idCol).as("doc"), explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc"))
      .agg(count(lit(1)).as("c"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // DECIMAL(18,0) per-row → DECIMAL(37,0) products: Σc² stays exact for
    // hot terms where a long sum of squared counts would wrap (olsFit rule)
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val cD = col("c").cast(dec18)
    val perTerm = perDoc
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(cD).cast(dec38).as("cf"),
        sum(cD * cD).cast(dec38).as("s2"))
      .filter(col("df") >= minDf)
    val cfD = col("cf").cast("double")
    val vmr = (col("s2").cast("double") - cfD * cfD / col("n_docs").cast("double")) / cfD
    perTerm
      .crossJoin(broadcast(nDocs))
      .select(
        col("term"),
        col("df"),
        col("cf").cast("long").as("cf"),
        round(cfD / col("df").cast("double"), 6).as("burstiness"),
        round(vmr, 6).as("vmr"))
  }
}
