package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pin discipline, enforced at test time: every registered gate query must
  * have a best-of-3 baseline pinned in BASELINE_LOCAL.json IN THE SAME
  * COMMIT that adds it — otherwise the 2× regression gate silently never
  * covers it. Bench.main refuses to run with an unpinned set; this spec
  * fails the build earlier, before a 15-minute bench spend. */
class BenchContractSpec extends AnyFunSuite {

  test("every registered query has a BASELINE_LOCAL.json pin") {
    val path = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"), "BASELINE_LOCAL.json")
    assert(java.nio.file.Files.exists(path), s"missing $path")
    val pins = "\"([A-Za-z0-9_]+)\"\\s*:\\s*([0-9.eE+-]+)".r
      .findAllMatchIn(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
      .map(_.group(1))
      .toSet
    val unpinned = SparkEntry.queries.keySet -- pins
    assert(
      unpinned.isEmpty,
      s"queries without a baseline pin (add to BASELINE_LOCAL.json in this commit): ${unpinned.toSeq.sorted}")
  }
}
