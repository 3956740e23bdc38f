package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.Tables

class TextFunctionsSpec extends SparkSpec {

  private def rollRef(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xff))

  test("roll_hash matches the reference Horner digest (codegen path)") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "the same the same", "ü¢∂ unicode")
    val got = inputs.toDF("s").select(TextFunctions.roll_hash(col("s"))).collect().map(_.getLong(0))
    assert(got.sameElements(inputs.map(rollRef)))
  }

  test("nfc_normalize + normalizeText: compose, strip invisibles, fold controls, collapse") {
    import spark.implicits._
    val decomposed = "e\u0301"                       // e + combining acute
    val composed   = "\u00e9"                        // NFC single codepoint
    val messy      = "a\u200Bbc \u00A0 d\te\r\n " + decomposed
    val out = Seq(messy, "plain text", "", "  already  spaced  ")
      .toDF("t")
      .select(
        TextFunctions.nfc_normalize(col("t")).as("nfc"),
        graft.operators.Corpus.normalizeText(col("t")).as("clean"))
      .collect()
    assert(out(0).getString(0).endsWith(composed))     // NFC composed
    assert(out(0).getString(1) == "abc d e " + composed) // ZWSP removed, controls/nbsp->space, collapsed
    assert(out(1).getString(1) == "plain text")        // ASCII passes untouched
    assert(out(2).getString(1) == "")                  // empty stays empty
    assert(out(3).getString(1) == "already spaced")    // collapse + trim
    // idempotence: normalizing a normalized string is the identity
    val once  = Seq(messy).toDF("t").select(graft.operators.Corpus.normalizeText(col("t")).as("c"))
    val twice = once.select(graft.operators.Corpus.normalizeText(col("c")).as("c2")).collect()
    assert(twice(0).getString(0) == out(0).getString(1))
    // null-safe
    val nulls = Seq[Option[String]](None).toDF("t")
      .select(graft.operators.Corpus.normalizeText(col("t"))).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("winnow fingerprints: deterministic, distinct, and substring-sharing") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps running ahead"
    val docA = base + " with a unique suffix A only here"
    val docB = "prefix B first then " + base
    val rows = Seq((1L, docA), (2L, docB), (3L, "completely different content zzz qqq"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.winnow_fingerprints(col("text"), 8, 16).as("fps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    // distinct within a document
    rows.values.foreach(f => assert(f.distinct.length == f.length))
    // the shared >= k+w-1 substring guarantees >=1 shared fingerprint
    val shared = rows(1L).toSet.intersect(rows(2L).toSet)
    assert(shared.nonEmpty, "docs sharing a long passage must share a fingerprint")
    assert(rows(1L).toSet.intersect(rows(3L).toSet).isEmpty)
  }

  test("winnowDupPairs finds the planted near-dup pairs on the corpus") {
    val docs = Tables(spark, SharedSpark.sf0001).documents
    val winnow = Dedup
      .winnowDupPairs(docs, "doc_id", "text", minShared = 10)
      .select(col("a_id").cast("long"), col("b_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // the exact-jaccard near-dups are the planted ground truth; winnowing
    // (positional, stricter) must recover a substantial fraction of them
    val truth = Dedup
      .jaccardPairs(docs, "doc_id", "text", threshold = 0.8)
      .select(col("a_id").cast("long"), col("b_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(truth.nonEmpty)
    val recall = truth.intersect(winnow).size.toDouble / truth.size
    assert(recall >= 0.8, s"winnow recall $recall over ${truth.size} planted pairs")
  }

  test("soundex builtin matches the census textbook fixtures the oracle replay is validated on") {
    import spark.implicits._
    // the er_soundex_blocks oracle rebuilds Soundex relationally and was
    // validated against exactly these census values — this pins Spark's
    // builtin to the same contract (H/W transparency, vowel reset,
    // first-letter code as initial suppression state, pad/cut to 3)
    val want = Seq(
      "Robert" -> "R163", "Rupert" -> "R163", "Ashcraft" -> "A261", "Ashcroft" -> "A261",
      "Tymczak" -> "T522", "Pfister" -> "P236", "Honeyman" -> "H555", "Washington" -> "W252",
      "Lee" -> "L000", "Gutierrez" -> "G362", "Jackson" -> "J250", "VanDeusen" -> "V532",
      "aaa" -> "A000", "b" -> "B000", "Wu" -> "W000", "Hall" -> "H400")
    val got = want.map(_._1).toDF("w")
      .select(col("w"), soundex(col("w")).as("sx")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    want.foreach { case (w, sx) => assert(got(w) == sx, s"$w: got ${got(w)}, want $sx") }
  }

  test("jaro_winkler: textbook closed forms, boost threshold, empties, codegen == interpreted") {
    import spark.implicits._
    import graft.functions.{JaroWinklerFunctions, JaroWinklerImpl}
    val cases = Seq(
      ("martha", "marhta", 0.961111),   // classic: 3 prefix, 1 transposition
      ("dixon", "dicksonx", 0.813333),
      ("xy", "xz", 0.666667),           // jaro <= 0.7: NO prefix boost
      ("ab", "ba", 0.0),                // window 0: no matches at all
      ("", "", 0.0), ("a", "", 0.0),    // empty contract
      ("same", "same", 1.0))
    val got = cases.toDF("a", "b", "want")
      .select(
        round(JaroWinklerFunctions.jaro_winkler(col("a"), col("b")), 6).as("jw"),
        col("want"), col("a"), col("b"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"${r.getString(2)}/${r.getString(3)}: $r"))
    // the codegen'd column path and the raw static impl agree bit-for-bit
    cases.foreach { case (a, b, _) =>
      val raw = JaroWinklerImpl.compute(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val viaDf = Seq((a, b)).toDF("a", "b")
        .select(JaroWinklerFunctions.jaro_winkler(col("a"), col("b"))).collect().head.getDouble(0)
      assert(raw == viaDf, s"$a/$b: $raw vs $viaDf")
    }
    // nulls propagate, not crash
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinklerFunctions.jaro_winkler(col("a"), col("b"))).collect().head
    assert(n.isNullAt(0))
  }
}
