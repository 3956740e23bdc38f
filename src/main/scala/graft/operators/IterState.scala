package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared iterative-state checkpointer for every multi-round operator
  * (PageRank/HITS/k-core/BFS/CC/k-truss/SCC/star-components/...).
  *
  * Two modes, selected by the caller's `checkpointDir`:
  *
  *   - `None` (default, local mode / healthy short jobs): eager
  *     `localCheckpoint` — fastest, blocks live on executors and are
  *     explicitly released via [[release]] when a newer round supersedes
  *     them. A lost executor loses its blocks → Spark restarts the JOB,
  *     acceptable when rounds are cheap.
  *   - `Some(dir)` (preemptible / long 100-TB runs): RELIABLE
  *     `df.checkpoint` into `dir` — survives executor loss (hour-6 of a
  *     100-node pagerank resumes instead of restarting). Release is a
  *     no-op: reliable checkpoint files are owned by the checkpoint dir
  *     lifecycle (`spark.cleaner.referenceTracking.cleanCheckpoints`),
  *     not by per-round unpersists.
  *
  * One instance per operator call; construction registers the dir with the
  * SparkContext (idempotent). Every iterative operator threads its own
  * `checkpointDir: Option[String]` parameter into this class so the
  * durability choice is uniform engine-wide (CheckpointModeSpec pins both
  * modes). */
private[graft] final class IterState(checkpointDir: Option[String]) {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Materialize a round's state: reliable when durable, local otherwise.
    *
    * The checkpoint is re-wrapped with CAPPED inherited statistics
    * ([[Bridge.capCheckpointStats]]): Spark carries the origin plan's
    * estimated sizeInBytes across checkpoints, and in a loop that
    * estimate compounds doubly-exponentially (each round's join products
    * become the next round's leaf stat) until the driver spends minutes
    * multiplying megabyte-wide BigInts inside the stats visitor. The cap
    * (1 TiB) is far above every broadcast threshold, so physical plans
    * are unchanged — only the pathological planning cost goes. */
  def mat(df: DataFrame): DataFrame = {
    val cp =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    // HONEST stats beat the old 1 TiB cap on both of its axes: the BigInt
    // avalanche cannot start from small measured longs, and the planner
    // sees node-sized state as broadcastable (no exchange, no sort) while
    // genuinely large state still plans distributed — scale-adaptive by
    // measurement, not by constant. Reliable-checkpoint mode (blocks not
    // in the block manager) falls back to the cap.
    Bridge.withMeasuredStats(cp, IterState.StatsCapBytes)
  }

  /** Drop a superseded round's blocks (local mode only — reliable
    * checkpoint files outlive the lineage by design). */
  def release(df: DataFrame): Unit =
    if (checkpointDir.isEmpty) Bridge.unpersistLocalCheckpoint(df)

  /** Materialize a round's state HASH-PARTITIONED on `keys` at an exact
    * `parts` width, and re-advertise that partitioning on the checkpoint
    * (guide §2.4 — remove shuffles outright).
    *
    * Spark 4's checkpoint returns `UnknownPartitioning`, so without the
    * rewrap every iteration of every iterative operator re-shuffles its
    * state AND its (iteration-invariant!) edge/degree frames on every
    * join. Keying all of an operator's frames with one shared width makes
    * the per-iteration equi-joins co-partitioned — no Exchange, no extra
    * AQE stage-job, and at scale the edge set crosses the network once at
    * setup instead of once per iteration. The declaration cannot lie:
    * the repartition happens HERE, immediately under the checkpoint, and
    * an explicit width is never AQE-coalesced, so the advertised
    * HashPartitioning(keys, parts) is exactly the bytes' layout. */
  def matKeyed(df: DataFrame, parts: Int, keys: String*): DataFrame = {
    import org.apache.spark.sql.functions.col
    val cp = mat(df.repartition(parts, keys.map(col): _*))
    Bridge.withHashPartitioning(cp, keys, parts)
  }
}

private[graft] object IterState {
  /** 1 TiB: still "never broadcast this", never a BigInt avalanche. */
  val StatsCapBytes: Long = 1L << 40

  /** Build a checkpointer for this operator call, registering the reliable
    * dir with the session's SparkContext when one is given. */
  def apply(anchor: DataFrame, checkpointDir: Option[String]): IterState = {
    checkpointDir.foreach(anchor.sparkSession.sparkContext.setCheckpointDir)
    new IterState(checkpointDir)
  }
}
