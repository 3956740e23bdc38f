package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference (wentaoy2/MapReduceProject) hand-rolls its runtime: UDP
  * heartbeats, ring topology, master election (src/ProtocolandHandler.go,
  * src/TopologyAndConfig.go). On Spark all of that is the cluster manager's
  * job; the engine's only runtime responsibility is a well-configured
  * SparkSession.
  *
  * Scale notes (100 TB discipline):
  *  - AQE on: runtime partition coalescing + skew-join splitting replaces the
  *    reference's static `share = files/mappers` split (src/master.go:458-516).
  *  - shuffle.partitions defaults to the local core count here; on a real
  *    cluster this is overridden (AQE coalesces down from a high initial
  *    number, so err high there).
  */
object Engine {
  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  /** Shared tuning applied by Verify/Bench on top of driver-imposed configs.
    *
    * Timestamp ingestion is vintage-proof, because the driver corpus has
    * shipped `events.ts` as BOTH parquet TIMESTAMP(NANOS) and naive
    * TIMESTAMP(MICROS) across rounds:
    *  - nanosAsLong: NANOS (which the vectorized reader otherwise rejects)
    *    arrives as a long and Tables converts (see Tables.scala);
    *  - inferTimestampNTZ=false: a naive (isAdjustedToUTC=false) column
    *    reads as plain TIMESTAMP instead of TIMESTAMP_NTZ — with the UTC
    *    session zone the wall-clock values are identical to the oracle's
    *    naive read, and watermarks/unix_millis (TIMESTAMP-only surfaces)
    *    keep working. */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

  def session(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
