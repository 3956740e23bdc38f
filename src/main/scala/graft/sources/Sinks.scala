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
}
