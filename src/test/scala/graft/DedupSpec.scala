package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {
  private lazy val docs = Tables(spark, SharedSpark.sf0001).documents.cache()

  test("fellegiSunterScores: hand-computed weights, three-way decisions, loud on bad m/u") {
    import spark.implicits._
    def w(m: Double, u: Double) =
      BigDecimal(java.math.BigDecimal.valueOf(math.log(m / u)).setScale(12, java.math.RoundingMode.HALF_UP))
    def wd(m: Double, u: Double) =
      BigDecimal(java.math.BigDecimal.valueOf(math.log((1 - m) / (1 - u))).setScale(12, java.math.RoundingMode.HALF_UP))
    val pairs = Seq(
      (1L, 2L, true, true),   // both agree
      (1L, 3L, true, false),  // split
      (1L, 4L, false, false)  // both disagree
    ).toDF("a_id", "b_id", "f1", "f2")
    val fields = Seq(("f1", 0.9, 0.1), ("f2", 0.8, 0.05))
    val out = Dedup.fellegiSunterScores(pairs, fields, upper = 3.0, lower = -3.0)
      .collect().map(r => (r.getLong(1)) -> ((r.getDouble(4), r.getString(5)))).toMap
    val s22 = (w(0.9, 0.1) + w(0.8, 0.05)).toDouble
    val s23 = (w(0.9, 0.1) + wd(0.8, 0.05)).toDouble
    val s24 = (wd(0.9, 0.1) + wd(0.8, 0.05)).toDouble
    assert(out(2L) == ((s22, "match")), s"got ${out(2L)} want $s22")
    assert(out(3L) == ((s23, "possible")))
    assert(out(4L) == ((s24, "nonmatch")))
    intercept[IllegalArgumentException](
      Dedup.fellegiSunterScores(pairs, Seq(("f1", 0.1, 0.9)), 1.0, -1.0)) // u >= m
    intercept[IllegalArgumentException](
      Dedup.fellegiSunterScores(pairs, fields, upper = -1.0, lower = 1.0))
    intercept[IllegalArgumentException](Dedup.fellegiSunterScores(pairs, Nil, 1.0, -1.0))
  }

  test("exact dedup groups identical texts and keeps min id") {
    import spark.implicits._
    val df  = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds exactly the exact-jaccard pairs at t=0.8 (sf0.001)") {
    val exact = Dedup
      .jaccardPairs(docs, "doc_id", "text", 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Dedup
      .minhashDupPairs(docs, "doc_id", "text", 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact)
  }

  test("jaccard values agree between index-join and candidate-verify paths") {
    val exact = Dedup
      .jaccardPairs(docs, "doc_id", "text", 0.8)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val lsh = Dedup
      .minhashDupPairs(docs, "doc_id", "text", 0.8)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    exact.foreach { case (k, j) => assert(math.abs(lsh(k) - j) < 1e-12) }
  }

  test("maxShingleDF cap preserves the near-dup pairs (scale-path recall)") {
    val uncapped = Dedup
      .jaccardPairs(docs, "doc_id", "text", 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // even an aggressive DF cap keeps rare-shingle-sharing near-dups
    val capped = Dedup
      .jaccardPairs(docs, "doc_id", "text", 0.8, maxShingleDF = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(uncapped.subsetOf(capped.union(uncapped)))
    assert(capped.intersect(uncapped).size >= uncapped.size / 2)
  }

  test("simhash: near-dup docs land within small hamming distance") {
    val nearDups = Dedup
      .jaccardPairs(docs, "doc_id", "text", 0.9)
      .select("a_id", "b_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val sim = Dedup
      .simhashDupPairs(docs, "doc_id", "text", maxDist = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(nearDups.nonEmpty)
    // simhash at 64 bits catches most >=0.9-jaccard pairs within dist 8
    assert(nearDups.intersect(sim).size >= (nearDups.size * 0.6).toInt)
  }

  test("duplicate clusters: driver union-find == distributed star alternation") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8).cache()
    val local = Dedup.duplicateClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = Dedup.duplicateClusters(pairs, localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local.nonEmpty)
    assert(local == dist)
    // every cluster id is the minimum member of its cluster
    val byCluster = local.groupBy(_._2)
    byCluster.foreach { case (cid, members) => assert(members.map(_._1).min == cid) }
  }

  test("star alternation converges in O(log n) rounds on a high-diameter chain") {
    import spark.implicits._
    // worst case for plain min-label propagation: a 256-long chain needs
    // ~256 propagation rounds (diameter); large-star/small-star halves
    // component height per round — logarithmic, the 100 TB contract
    val n     = 256
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.starComponents(chain)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until n.toLong).map(i => (i, 0L)).toSet, "one component rooted at 0")
    assert(rounds <= 14, s"chain of $n must converge logarithmically, took $rounds rounds")
  }

  test("star alternation: 10k-edge path graph converges in ~log2(n) rounds (O(log n) pinned)") {
    import spark.implicits._
    // the O(log n) claim, pinned as a property: a path graph is the maximum-
    // diameter shape per edge count, so rounds <= log2(n) + c here bounds
    // every other 10k-edge graph too
    val n     = 10001L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.starComponents(chain)
    val bound = (math.log(n.toDouble) / math.log(2)).ceil.toInt + 4 // log2(10001)=14
    assert(rounds <= bound, s"path of $n nodes took $rounds rounds (bound $bound)")
    val got = labels.agg(org.apache.spark.sql.functions.count_distinct(col("cluster_id")),
      org.apache.spark.sql.functions.count(lit(1)), org.apache.spark.sql.functions.min("cluster_id")).head()
    assert(got.getLong(0) == 1L && got.getLong(1) == n && got.getLong(2) == 0L,
      "single component, every node labeled, rooted at 0")
  }

  test("reliable-checkpoint mode labels identically to localCheckpoint mode") {
    import spark.implicits._
    val rnd   = new scala.util.Random(13)
    val edges = (1 to 400).map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong)).filter(p => p._1 != p._2)
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck_").toString
    val (localLabels, _)    = Dedup.starComponents(edges.toDF("a", "b"))
    val (reliableLabels, _) = Dedup.starComponents(edges.toDF("a", "b"), checkpointDir = Some(ckDir))
    assert(
      localLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        reliableLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // the reliable mode actually wrote durable round snapshots
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(ckDir)).count() > 0)
  }

  test("starComponents throws (not silently mislabels) when maxIter is too low to converge") {
    import spark.implicits._
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.starComponents(chain, maxIter = 2)
    }
  }

  test("star alternation labels a random multi-component graph like union-find") {
    import spark.implicits._
    val rnd   = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)).filter(p => p._1 != p._2)
    val (labels, _) = Dedup.starComponents(edges.toDF("a", "b"))
    // reference: plain union-find over the same edges
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes    = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val expected = nodes.map { id =>
      // min member of the component = canonical label
      val root = find(id)
      (id, nodes.filter(find(_) == root).min)
    }
    assert(labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("simhash signature is deterministic across evaluations") {
    val s1 = Dedup.simhash(docs, "doc_id", "text").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val s2 = Dedup.simhash(docs, "doc_id", "text").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(s1 == s2)
  }

  test("minhash signatures have the declared shape and determinism") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 32)
    val rows = sigs.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](1).length == 32))
    val again = Dedup.minhashSignatures(docs, "doc_id", "text", k = 32).collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Long](1))).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Long](1))).toMap)
  }

  test("incremental jaccard == full jaccard restricted to new-touching pairs") {
    import org.apache.spark.sql.functions._
    val docs   = graft.sources.Tables(spark, SharedSpark.sf0001).documents
    val oldSet = docs.filter(col("doc_id") % 2 === 0)
    val newSet = docs.filter(col("doc_id") % 2 === 1)
    val oldIdx = Dedup.shingleHashRows(oldSet, "doc_id", "text")

    val incr = Dedup
      .incrementalJaccardPairs(newSet, oldIdx, "doc_id", "text", threshold = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9))
      .toMap
    val full = Dedup
      .jaccardPairs(docs, "doc_id", "text", threshold = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9))
      .toMap
    val expected = full.filter { case ((a, b), _) => a % 2 == 1 || b % 2 == 1 }
    assert(incr == expected)
    assert(expected.nonEmpty)
    // old×old pairs must NOT be recomputed/emitted
    assert(incr.keys.forall { case (a, b) => a % 2 == 1 || b % 2 == 1 })
  }

  test("canonicalDocs keeps each cluster's longest doc (ties -> smallest id), singletons survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),        // cluster {1,2,3}: 3 is longest
      (2L, "a b c d"),
      (3L, "a b c d e f"),
      (4L, "x y"),              // singleton
      (5L, "p q r"),            // cluster {5,6}: equal lengths -> keep 5
      (6L, "p q s")
    ).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)).toDF("doc_id", "cluster_id")
    val got = Dedup
      .canonicalDocs(docs, "doc_id", "text", clusters)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(
      got == Set(
        (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
        (4L, 4L, 4L),
        (5L, 5L, 5L), (6L, 5L, 5L)))
    // the deduplicated corpus = keep_id rows, one survivor per cluster
    val survivors = got.filter { case (id, _, keep) => id == keep }.map(_._1)
    assert(survivors == Set(3L, 4L, 5L))
  }

  test("containmentPairs flags the quoted-subset pair symmetric jaccard misses") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon"          // 5 tokens -> 3 shingles
    val long  = short + " " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, short),                       // fully contained in doc 2
      (2L, long),
      (3L, "zeta eta theta iota kappa")  // unrelated
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // doc 1's 3 shingles all appear in doc 2 -> containment(1 in 2) = 1.0;
    // the reverse direction is tiny; doc 3 pairs with nothing. And the
    // symmetric jaccard at the same threshold finds NOTHING here.
    assert(got == Set((1L, 2L, 1.0)), s"got $got")
    val jacc = graft.operators.Dedup
      .jaccardPairs(docs, "doc_id", "text", threshold = 0.9).count()
    assert(jacc == 0, "jaccard should miss the subset pair — that's the point")
  }

  test("prefix-filtered jaccard join ≡ full inverted-index join, with strictly fewer candidates") {
    val docs = graft.sources.Tables(spark, SharedSpark.sf0001).documents
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (t <- Seq(0.6, 0.8, 0.9)) {
      val full   = norm(graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", threshold = t))
      val prefix = norm(graft.operators.Dedup.prefixJaccardPairs(docs, "doc_id", "text", threshold = t))
      assert(prefix == full, s"t=$t: prefix join must be EXACT (no lost pairs, no extras)")
      assert(full.nonEmpty || t > 0.85, s"t=$t fixture should produce pairs")
    }
    // the scale claim: the prefix index pairs strictly fewer candidates
    // than the full inverted index on the same corpus
    val (candPrefix, candFull) =
      graft.operators.Dedup.prefixCandidateCounts(docs, "doc_id", "text", threshold = 0.8)
    assert(candPrefix < candFull, s"prefix candidates $candPrefix !< full $candFull")
    assert(candPrefix > 0)
  }

  test("wide simhash banding (Manku 20-table) ≡ brute hamming ≤ 3 ≡ uncapped chunk banding") {
    val docs = graft.sources.Tables(spark, SharedSpark.sf0001).documents
    val sigs = graft.operators.Dedup.simhash(docs, "doc_id", "text").cache()
    // banding-independent ground truth: brute-force popcount over all pairs
    val brute = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("dist", bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))))
      .filter(col("dist") <= 3)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val wide = graft.operators.Dedup.simhashDupPairsWide(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(wide == brute, "20-table triple banding must have EXACT recall at d<=3")
    // 4-chunk pigeonhole also guarantees d<=3 when uncapped — all three agree
    val chunk = graft.operators.Dedup.simhashDupPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(chunk == brute)
    sigs.unpersist()
    // planted pair: SimHash is bag-of-tokens (order-invariant), so a
    // permuted doc is at distance 0 and MUST surface through the banding
    import spark.implicits._
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"),
      (3L, "completely unrelated content with other words only")).toDF("doc_id", "text")
    val pp = graft.operators.Dedup.simhashDupPairsWide(planted, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pp.contains((1L, 2L, 0)), s"permuted twin must collide in a triple table: ${pp.mkString(",")}")
  }

  test("sortedNeighborPairs: typo twins pair inside the window, cross-block pairs traded away") {
    import spark.implicits._
    val df = Seq(
      (1L, "acme corp"), (2L, "acme c0rp"),            // adjacent after sort, dist 1
      (3L, "acme corporation"),                        // dist 7 from both: filtered at maxDist 5
      (4L, "zeta llc"), (5L, "zeta lcc"),              // another block, dist 1 (one substitution)
      (6L, "beta inc")                                 // alone in its block
    ).toDF("id", "name")
    val got = Dedup.sortedNeighborPairs(df, "id", "name", window = 2, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 2L, 1)) || got.contains((2L, 1L, 1)), s"typo twin missing: $got")
    assert(got.contains((4L, 5L, 1)) || got.contains((5L, 4L, 1)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "distance-7 neighbor must be filtered")
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L), "cross-block pairing must not happen")
  }

  test("prefix jaccard: identical-doc flood stays exact (every pair is a true dup)") {
    import spark.implicits._
    val flood = ((1 to 40).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta")) :+
      (99L, "totally different words entirely here now")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.prefixJaccardPairs(flood, "doc_id", "text", threshold = 0.8)
    assert(got.count() == 40L * 39 / 2, "all identical-doc pairs must survive — exactness over capping")
    assert(got.filter(col("a_id") === 99L || col("b_id") === 99L).count() == 0)
  }

  test("cdcChunkDups: identical docs share every chunk; a prefix edit shifts only the head") {
    import spark.implicits._
    val rnd  = new scala.util.Random(7)
    val text = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val twins = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val dup = Dedup.cdcChunkDups(twins, "doc_id", "text", window = 8, minChunkOccurrences = 2)
    val rows = dup.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) == 2L && r.getLong(2) == 2L), rows.mkString(";"))
    // total duplicated chunk length = full doc (every chunk is shared)
    assert(rows.map(_.getInt(1).toLong).sum == text.length.toLong, rows.mkString(";"))
    // content-defined robustness: a prefix insertion leaves the tail chunks
    // intact (fixed-size blocks would shift every one of them)
    val shifted = Seq((1L, text), (2L, "ZZZZZZ" + text)).toDF("doc_id", "text")
    val shared = Dedup.cdcChunkDups(shifted, "doc_id", "text", window = 8, minChunkOccurrences = 2)
      .collect()
    assert(shared.nonEmpty, "prefix edit must not destroy all shared chunks")
    assert(shared.forall(_.getLong(3) == 2L), shared.mkString(";"))
    // disjoint docs share nothing
    val disjoint = Seq((1L, "aaaa bbbb cccc"), (2L, "dddd eeee ffff")).toDF("doc_id", "text")
    assert(Dedup.cdcChunkDups(disjoint, "doc_id", "text", 8, 2).count() == 0L)
  }

}
