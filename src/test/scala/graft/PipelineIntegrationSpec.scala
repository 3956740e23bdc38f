package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Corpus, Dedup, LanguageModel}
import graft.sources.Tables

/** End-to-end composition: the full training-data preparation pipeline a
  * user of this engine would actually run — quality gate → exact+near
  * dedup → context chunking → sequence packing → BPE token accounting —
  * wired stage to stage on the real corpus, with the invariants each
  * hand-off must preserve asserted between stages.
  */
class PipelineIntegrationSpec extends SparkSpec {

  test("quality gate → dedup → chunk → pack → BPE composes with invariants intact") {
    val docs  = Tables(spark, SharedSpark.sf0001).documents
    val total = docs.count()

    // 1. quality gate: entropy + LM fluency + repetition
    val ent = Corpus.charEntropy(docs, "doc_id", "text").select(col("doc_id"), col("entropy_bits"))
    val lm  = LanguageModel.bigramScore(docs, docs, "doc_id", "text").select(col("doc_id"), col("avg_logprob"))
    val rep = Corpus.repetitionSignals(docs, "doc_id", "text").select(col("doc_id"), col("dup_token_frac"))
    val gated = docs
      .join(ent, "doc_id").join(lm, "doc_id").join(rep, "doc_id")
      .filter(col("entropy_bits") > 3.8 && col("dup_token_frac") < 0.65)
      .select(col("doc_id"), col("text"))
    val kept = gated.count()
    assert(kept > 0 && kept < total, s"gate must actually separate ($kept of $total kept)")

    // 2. dedup: drop exact dups, then collapse near-dup clusters to canonicals
    val exactKeep = Dedup.exact(gated, "doc_id", "text").select(col("keep_id").as("doc_id"))
    val exactDocs = gated.join(exactKeep, "doc_id")
    val canon = Dedup
      .canonicalDocs(
        exactDocs,
        "doc_id",
        "text",
        Dedup.duplicateClusters(Dedup.jaccardPairs(exactDocs, "doc_id", "text", threshold = 0.8)))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"))
    val deduped = exactDocs.join(canon, "doc_id")
    val nDeduped = deduped.count()
    assert(nDeduped <= kept, "dedup never grows the corpus")
    assert(nDeduped > 0)

    // 3. chunk long documents to a 32-token context with 4-token overlap
    val chunks = Corpus.chunkDocuments(deduped, "doc_id", "text", chunkSize = 32, overlap = 4)
    val chunkStats = chunks.agg(
      countDistinct(col("doc_id")).as("docs"),
      max(col("n_tokens")).as("maxTok"),
      sum(col("n_tokens")).as("totTok")).head()
    val nonEmptyDeduped = deduped.filter(length(trim(col("text"))) > 0).count()
    assert(chunkStats.getLong(0) == nonEmptyDeduped, "every non-empty surviving doc is chunked")
    assert(chunkStats.getLong(1) <= 32, "no chunk exceeds the context budget")
    // overlap re-covers tokens, so chunked token mass >= raw token mass
    val rawTok = deduped
      .select(size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(chunkStats.getLong(2) >= rawTok, "chunking must not lose tokens")

    // 4. pack chunks into 256-token training sequences
    val packed = Corpus.packSequences(
      chunks.withColumnRenamed("chunk_text", "text")
        .withColumn("shard", lit("s0"))
        .withColumn("uid", monotonically_increasing_id()),
      "uid", "text", capacity = 256, shardCol = "shard")
    val packRow = packed.agg(max(col("pack_offset")), count(lit(1))).head()
    assert(packRow.getLong(0) < 256, "no sequence starts past the pack capacity")
    assert(packRow.getLong(1) == chunks.count(), "every chunk lands in exactly one pack slot")

    // 5. BPE accounting over the final corpus (token budget for training)
    val model  = Bpe.train(deduped, "text", numMerges = 50)
    val counts = Bpe.tokenCounts(deduped, "doc_id", "text", model)
    val c = counts.agg(sum(col("n_bpe_tokens")), sum(col("n_words"))).head()
    assert(model.merges.size == 50)
    assert(c.getLong(0) >= c.getLong(1), "BPE emits at least one token per word")
  }
}
