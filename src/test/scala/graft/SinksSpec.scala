package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Tables}

class SinksSpec extends SparkSpec {

  test("date-partitioned sink prunes partitions at planning time") {
    val events = Tables(spark, SharedSpark.sf0001).events
    val path   = Files.createTempDirectory("graft_part_").toString + "/events"
    Sinks.writeDatePartitioned(events, "ts", path)

    // layout: one directory per date
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_date=")))

    val pruned = Sinks
      .readPartitioned(spark, path)
      .filter(col("event_date") === "2024-01-01")
    val f = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(f.contains("PartitionFilters"), "partition predicate must prune, not filter rows")
    assert(
      f.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("event_date")),
      s"event_date must appear as a partition filter:\n$f")

    // and the data round-trips
    val expected = events.filter(to_date(col("ts")) === "2024-01-01").count()
    assert(pruned.count() == expected)
    assert(expected > 0)
  }

  test("partitioned write does not spray small files") {
    val events = Tables(spark, SharedSpark.sf0001).events
    val path   = Files.createTempDirectory("graft_part2_").toString + "/events"
    Sinks.writeDatePartitioned(events, "ts", path)
    val filesPerDir = new java.io.File(path)
      .listFiles()
      .filter(_.isDirectory)
      .map(_.listFiles().count(f => f.getName.startsWith("part-")))
    // repartition(by partition col) => a single file per date directory here
    assert(filesPerDir.forall(_ == 1), s"expected 1 file per partition, got ${filesPerDir.toSeq}")
  }
}
