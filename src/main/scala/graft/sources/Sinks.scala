package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side layout tools — the storage decisions that decide whether a
  * 100 TB table is queryable.
  *
  * The reference's only sink is "concat reducer outputs into one SDFS file,
  * 4 replicas" (src/juice_helpers.go:318-393). A Spark engine instead owns
  * LAYOUT: partition columns for pruning, bucketing for co-located joins,
  * and file sizing; replication stays with the storage layer.
  */
object Sinks {

  /** Date-partitioned parquet: queries filtering on the partition column
    * prune whole directories at planning time (see SinksSpec — the scan's
    * PartitionFilters, not a data filter). `targetFileRows` bounds small
    * files via a pre-write repartition on the partition key. */
  def writeDatePartitioned(
      df: DataFrame,
      tsCol: String,
      path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .repartition(col("event_date")) // one task group per partition dir — no small-file spray
      .write
      .mode(mode)
      .partitionBy("event_date")
      .parquet(path)

  /** Bucketed + sorted table: subsequent equi-joins/aggs on `key` skip the
    * shuffle entirely (SkewAndBucketSpec proves the plan shape). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Deterministic training shards on disk — the write side of
    * [[graft.operators.Corpus.shardAssignment]]: ONE hash exchange on the
    * shard id, a WITHIN-partition sort on (shard, order_key), one
    * directory per shard. Never a global order-by (at 100 TB a total sort
    * is the unaffordable plan; per-shard order is what training loaders
    * consume anyway) and no small-file spray (each task owns exactly its
    * shard's directory). Re-running over the same input produces
    * byte-identical shard membership and order. */
  def writeTrainingShards(
      df: DataFrame,
      idCol: String,
      shards: Int,
      path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    graft.operators.Corpus
      .withShardColumns(df, idCol, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("order_key"))
      .write
      .mode(mode)
      .partitionBy("shard")
      .parquet(path)

  /** Morton (Z-order) value of two non-negative long columns: the low
    * `bitsPerCol` bits of each, bit-interleaved (a even positions, b odd).
    * Declarative shift/or chain — codegen'd, no UDF. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, bitsPerCol: Int = 16): org.apache.spark.sql.Column =
    (0 until bitsPerCol)
      .flatMap { i =>
        Seq(
          shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce((x, y) => x.bitwiseOR(y))

  /** Morton (Z-order) value of N non-negative long columns, bit-interleaved
    * round-robin (column j contributes bit i at position N·i + j). The
    * 2-column [[zValue]] generalized: real tables cluster on
    * (tenant, date, key)-shaped triples, and a 2-D curve leaves the third
    * axis unclustered. `bitsPerCol · N` must fit a signed long. */
  def zValueN(cols: Seq[org.apache.spark.sql.Column], bitsPerCol: Int): org.apache.spark.sql.Column = {
    val n = cols.size
    require(n >= 2, s"zValueN needs at least 2 columns, got $n")
    require(n * bitsPerCol <= 63, s"$n columns × $bitsPerCol bits = ${n * bitsPerCol} > 63 — shrink bitsPerCol")
    (0 until bitsPerCol)
      .flatMap { i =>
        cols.zipWithIndex.map { case (c, j) =>
          shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), n * i + j)
        }
      }
      .reduce((x, y) => x.bitwiseOR(y))
  }

  /** N-column Z-order clustering — [[zOrdered]] generalized: min-max scale
    * every column onto the shared bit range (bits auto-sized so N columns
    * interleave into one long, capped at 16/column), range-partition +
    * sort by the Morton value. Each output file is then a tight
    * N-dimensional box, so an N-conjunct range predicate read through
    * `Catalog.readTableWhereAll` prunes on EVERY axis (the 2-D story,
    * with the third-plus axes no longer sacrificed). One 2N-scalar agg to
    * the driver. */
  def zOrderedN(df: DataFrame, colNames: Seq[String], files: Int = 8): DataFrame = {
    require(colNames.size >= 2, "zOrderedN needs at least 2 columns")
    val bits = math.min(16, 63 / colNames.size)
    require(bits >= 4, s"${colNames.size} columns leave only $bits bits each — too coarse to cluster")
    val scaleMax = (1L << bits) - 1
    val aggs = colNames.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row  = df.agg(aggs.head, aggs.tail: _*).head()
    // min/max of an empty frame or an all-NULL column are NULL; getDouble
    // on those would throw a bare NPE (or quietly read 0) — refuse with the
    // actual problem named instead
    colNames.zipWithIndex.foreach { case (c, i) =>
      require(
        !row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"zOrderedN: cluster column '$c' has no non-NULL values " +
          "(empty input or all-NULL column) — cannot derive scale factors")
    }
    val scaledCols = colNames.zipWithIndex.map { case (c, i) =>
      val lo = row.getDouble(2 * i)
      val hi = row.getDouble(2 * i + 1)
      (((col(c).cast("double") - lit(lo)) / lit(math.max(hi - lo, 1d))) * lit(scaleMax.toDouble)).cast("long")
    }
    df.withColumn("__z", zValueN(scaledCols, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Z-ordered parquet: range-partition + sort by the Morton value of two
    * filter columns so each output FILE covers a tight rectangle in
    * (colA, colB) space — parquet min/max stats then skip most files for
    * point/range predicates on EITHER column (multi-dimensional clustering,
    * where a plain sort only helps its leading column). SinksSpec measures
    * the per-file range tightening against an unordered write. */
  def writeZOrdered(
      df: DataFrame,
      colA: String,
      colB: String,
      path: String,
      files: Int = 8,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    zOrdered(df, colA, colB, files).write.mode(mode).parquet(path)

  /** The Z-order CLUSTERING transform behind [[writeZOrdered]], exposed so
    * any writer can consume it — in particular
    * [[graft.sources.Catalog.putTable]], whose versioned publish keeps the
    * clustered partitioning: `putTable(name, zOrdered(df, a, b, files))`
    * then `analyzeTable(name, fileStats = true)` gives the zone maps TIGHT
    * per-file rectangles in (colA, colB) space, and `readTableWhere` scans
    * fewer files than any single-column or random layout allows (PlanSpec
    * pins z-ordered < unordered file counts under the same predicate —
    * the layout-to-catalog composition the audits model analytically). */
  def zOrdered(df: DataFrame, colA: String, colB: String, files: Int = 8): DataFrame = {
    // min-max scale both columns onto the full bitsPerCol range first —
    // otherwise the wider-domain column's high bits dominate the curve and
    // the narrow column never clusters (Delta's ZORDER does the same via
    // per-column range ids). One tiny agg (4 scalars to the driver).
    val Array(loA, hiA, loB, hiB) = df
      .agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
           min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .head()
      .toSeq.map(_.asInstanceOf[Double]).toArray
    def scaled(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      (((c.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1d))) * lit(65535d)).cast("long")
    val z = zValue(scaled(col(colA), loA, hiA), scaled(col(colB), loB, hiB))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
