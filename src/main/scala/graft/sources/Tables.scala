package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver corpus (TESTDATA.md): TPC-H-ish star schema plus
  * `events` (stream-shaped), `documents`, `embeddings`.
  *
  * Columns are pruned and filters pushed down by Catalyst as long as callers
  * keep projections declarative — so these return the raw scan, nothing more.
  *
  * Nano-timestamp note: `events.ts` is parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects. Sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see Engine.tune), the column
  * arrives as a nanos long, and the loader converts it to a microsecond
  * timestamp (integer `div` — no double round-trip, values exceed 2^53).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private val nanoTsCols = Map("events" -> Seq("ts"))

  def table(name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanoTsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == LongType)
        d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else d
    }
  }

  /** Events in [lo, hi) — ISO dates/timestamps, e.g. "2024-01-02".
    *
    * The nanos→timestamp conversion in [[table]] is an expression, so a
    * filter on the CONVERTED column cannot reach the parquet scan. This
    * helper translates the bounds to raw nanos and filters the LONG column
    * before converting — `.explain` shows the range in PushedFilters, which
    * at 100 TB is the difference between reading a day and reading a year
    * (PlanSpec pins it). */
  def eventsBetween(lo: String, hi: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    def ns(s: String): Long = {
      val t = if (s.length == 10) s + "T00:00:00Z" else s.replace(' ', 'T') + "Z"
      val i = java.time.Instant.parse(t)
      i.getEpochSecond * 1000000000L + i.getNano
    }
    if (raw.schema("ts").dataType == LongType)
      raw
        .filter(expr(s"ts >= ${ns(lo)}L AND ts < ${ns(hi)}L"))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else
      raw.filter(expr(s"ts >= TIMESTAMP '$lo' AND ts < TIMESTAMP '$hi'"))
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = table("events")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
