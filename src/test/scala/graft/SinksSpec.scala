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

  test("z-ordered layout gives every file a tight rectangle in both columns") {
    import org.apache.spark.sql.functions._
    val dir  = java.nio.file.Files.createTempDirectory("graft_z_").toString
    val li   = graft.sources.Tables(spark, SharedSpark.sf001).lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    graft.sources.Sinks.writeZOrdered(li, "l_orderkey", "l_partkey", s"$dir/z", files = 16)
    li.repartition(16).write.mode("overwrite").parquet(s"$dir/plain")

    // file-skipping power: fraction of files whose [min,max] misses a
    // narrow (5%-of-domain) range predicate — what parquet stats pruning
    // actually skips. Z-order must skip most files on EITHER column; the
    // unordered baseline can skip (almost) none.
    def skipFraction(path: String, c: String): Double = {
      val Array(lo, hi) = li.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      val qLo = lo + 0.47 * (hi - lo)
      val qHi = lo + 0.52 * (hi - lo)
      val perFile = spark.read
        .parquet(path)
        .groupBy(input_file_name())
        .agg(min(col(c)).cast("double").as("mn"), max(col(c)).cast("double").as("mx"))
        .collect()
      val skipped = perFile.count(r => r.getDouble(2) < qLo || r.getDouble(1) > qHi)
      skipped.toDouble / perFile.length
    }
    // with 16 equi-frequency (unaligned) z-ranges a 5% slab lands in
    // ~0.3-0.45 skip per axis; the fraction grows with file count as spans
    // shrink (at real scale: thousands of files, >90% skipped)
    val zo = (skipFraction(s"$dir/z", "l_orderkey"), skipFraction(s"$dir/z", "l_partkey"))
    val pl = (skipFraction(s"$dir/plain", "l_orderkey"), skipFraction(s"$dir/plain", "l_partkey"))
    assert(zo._1 >= 0.25 && zo._2 >= 0.25, s"z-order must skip files on both axes: $zo")
    assert(pl._1 <= 0.1 && pl._2 <= 0.1, s"baseline should skip ~nothing: $pl")
    // zValue sanity: interleave of (1,0) and (0,1)
    import spark.implicits._
    val z = Seq((1L, 0L), (0L, 1L), (3L, 3L)).toDF("a", "b")
      .select(graft.sources.Sinks.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(z.sameElements(Array(1L, 2L, 15L)))
  }

  test("zValueN interleaves bits round-robin, exactly") {
    import spark.implicits._
    // reference: bit i of column j lands at position n*i + j
    def ref(vals: Seq[Long], bits: Int): Long = {
      val n = vals.size
      (0 until bits).flatMap(i => vals.zipWithIndex.map { case (v, j) => ((v >>> i) & 1L) << (n * i + j) })
        .reduce(_ | _)
    }
    val rows = Seq((5L, 3L, 6L), (0L, 0L, 0L), (7L, 7L, 7L), (1L, 4L, 2L))
    val got = rows.toDF("a", "b", "c")
      .select(Sinks.zValueN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .as[Long].collect().toSeq
    assert(got === rows.map { case (a, b, c) => ref(Seq(a, b, c), 3) })
    intercept[IllegalArgumentException](Sinks.zValueN(Seq(col("a")), 3))
    intercept[IllegalArgumentException](Sinks.zValueN(Seq(col("a"), col("b"), col("c")), 22))
  }

  test("3-D Z layout: a 3-conjunct box read scans fewer files than the unordered layout") {
    val orders = Tables(spark, SharedSpark.sf001).orders
    val cols   = Seq("o_custkey", "o_orderkey", "o_totalprice")
    val conj   = Seq(("o_custkey", "<=", "100"), ("o_orderkey", "<=", "3000"), ("o_totalprice", "<=", "100000"))
    def prunedFiles(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val root = Files.createTempDirectory("graft_z3_").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("t", df)
      cat.analyzeTable("t", fileStats = true)
      val read = cat.readTableWhereAll("t", conj)
      (read.select(input_file_name()).distinct().count(), read.count())
    }
    val (zFiles, zRows) = prunedFiles(Sinks.zOrderedN(orders, cols, files = 8))
    val (uFiles, uRows) = prunedFiles(orders.repartition(8))
    assert(zRows === uRows, "layout must never change results")
    assert(zRows > 0, "fixture must hit the box")
    assert(zFiles < uFiles, s"3-D clustering must out-prune the unordered layout ($zFiles vs $uFiles)")
  }

  test("dynamic partition pruning fires on the date-partitioned layout") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp_").toString
    graft.sources.Sinks.writeDatePartitioned(
      graft.sources.Tables(spark, SharedSpark.sf001).events, "ts", dir)
    val fact = graft.sources.Sinks.readPartitioned(spark, dir)
    // a tiny dim whose FILTER decides which partitions matter — the classic
    // DPP shape: the partition filter is only known at runtime. The dim must
    // be source-backed: a filter over a LocalRelation constant-folds away
    // and DPP's selective-predicate check never sees it.
    Seq(("2024-01-03", "keep"), ("2024-01-11", "keep"), ("2024-01-20", "drop"))
      .toDF("d", "tag")
      .write.mode("overwrite").parquet(s"$dir/__dim")
    val dim = spark.read.parquet(s"$dir/__dim")
    val joined = fact.join(
      dim.filter(col("tag") === "keep").select(to_date(col("d")).as("event_date")),
      Seq("event_date"))
    val f = joined.queryExecution.executedPlan.toString
    assert(f.contains("dynamicpruning"), s"DPP subquery expected in partition filters:\n$f")
    assert(joined.count() > 0)
  }

  test("training shards: one exchange + within-partition sort, per-shard order on disk") {
    import spark.implicits._
    val docs = Tables(spark, SharedSpark.sf0001).documents.select("doc_id", "text")
    val dir  = Files.createTempDirectory("graft_shards_").toString + "/out"
    // plan shape of the write-side frame: exactly ONE exchange (the shard
    // hash repartition) and a NON-global sort — never a total order-by
    val frame = graft.operators.Corpus
      .withShardColumns(docs, "doc_id", 4)
      .repartition(4, col("shard"))
      .sortWithinPartitions(col("shard"), col("order_key"))
    val p = frame.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 1, s"one shard exchange only:\n$p")
    // SortExec prints as `Sort [keys], <global>, 0`
    assert(p.contains("], false, 0"), s"within-partition sort expected:\n$p")
    assert(!p.contains("], true, 0"), s"must never plan a global sort:\n$p")

    Sinks.writeTrainingShards(docs, "doc_id", shards = 4, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    // shard membership is total and disjoint; within each FILE rows are
    // ordered by order_key (what a training loader streams)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    dirs.foreach { d =>
      val files = new java.io.File(s"$dir/$d").listFiles().filter(_.getName.endsWith(".parquet"))
      files.foreach { f =>
        val keys = spark.read.parquet(f.getPath)
          .select(md5(col("doc_id").cast("string")))
          .collect().map(_.getString(0)).toSeq
        assert(keys == keys.sorted, s"rows in ${f.getName} must be order_key-sorted")
      }
    }
    // deterministic: a second write lands identical membership + order
    val dir2 = Files.createTempDirectory("graft_shards2_").toString + "/out"
    Sinks.writeTrainingShards(docs, "doc_id", shards = 4, dir2)
    val a = spark.read.parquet(dir).select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = spark.read.parquet(dir2).select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
  }
}
