package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Bloom

/** Runtime-filter join reduction — the semi-join reducer every shuffle join
  * over a big fact table wants at 100 TB.
  *
  * A join like `lineitem ⋈ (orders WHERE <selective>)` shuffles the ENTIRE
  * fact side even when the filtered build side matches 1% of its rows: the
  * filter lives on the other input, so Catalyst can't push it across the
  * join. The classic fix (Bernstein & Chiu 1981's semi-join reduction, the
  * "runtime filter" of every modern warehouse) is to summarize the build
  * side's join keys into a Bloom filter, ship that summary to the probe
  * side, and drop non-matching probe rows AT THE SCAN — before they pay the
  * shuffle. The summary is lossy only toward false positives, and the real
  * join removes those, so the result is exact.
  *
  * Shape here:
  *   1. hash the build side's join keys (`xxhash64`) and fold them into a
  *      Bloom bit array on the executors ([[Bloom.BuildAgg]] — mergeable,
  *      map-side combined, one `numBits/64`-long array per partition);
  *   2. collect ONLY the finished bit array to the driver — model-sized by
  *      construction (`numBits/8` bytes; 1 MiB at the default 2^23 bits),
  *      never data-sized, same discipline as every other model frame in
  *      this repo;
  *   3. prefilter the probe side with the codegen'd
  *      [[graft.functions.BloomMightContain]] BEFORE the join, so the
  *      predicate sits against the probe scan and survivors alone shuffle;
  *   4. run the real join on the sliver, which removes Bloom false
  *      positives.
  *
  * Only `inner` and `left_semi` are accepted: for outer joins the prefilter
  * would delete probe rows that must survive with NULLs, so asking for one
  * is a caller bug and fails loudly rather than degrading silently.
  *
  * Sizing: with k hashes and m bits, FP rate ≈ (1 - e^{-kn/m})^k; the
  * default 2^23 bits / 5 hashes holds ~1e-3 FP to about n = 500k build keys
  * (1 MiB broadcast). Callers with bigger build sides raise `numBits` — the
  * cost is linear in the array, still tiny next to shuffling a fact table.
  *
  * Reference point: the reference engine has no runtime filters — its juice
  * phase always funnels every emitted pair through the master
  * (mapleJuice.go's shuffle) — so this is pure extension surface, the kind
  * of plan a 1000-executor cluster needs.
  */
object RuntimeFilter {

  /** `probe ⋈ build` with a Bloom-over-build-keys prefilter pushed onto the
    * probe side. Exact (FPs removed by the join). See object doc for the
    * plan shape and sizing.
    */
  def bloomReducedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      joinType: String = "inner",
      numBits: Int = 1 << 23,
      numHashes: Int = 5): DataFrame = {
    require(
      joinType == "inner" || joinType == "left_semi",
      s"bloomReducedJoin is sound only for inner/left_semi (a prefiltered outer " +
        s"join would drop rows that must survive with NULLs); got '$joinType'")
    val bits = Bloom.build(
      build.select(xxhash64(col(buildKey)).as("__rf_h")),
      "__rf_h",
      numBits,
      numHashes)
    val reduced = probe.filter(Bloom.mightContain(bits, numHashes)(xxhash64(col(probeKey))))
    if (joinType == "left_semi")
      reduced.join(build, col(probeKey) === col(buildKey), "left_semi")
    else
      reduced.join(build, col(probeKey) === col(buildKey))
  }
}
