package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the private[sql] internals a custom operator needs
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils /
  * classic.Dataset.ofRows are the sanctioned internal mappings). Only this
  * object lives inside the spark namespace; all engine code stays in
  * graft.*. */
object Bridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)

  /** Release the materialized blocks behind a localCheckpoint'ed frame
    * (Dataset.unpersist only covers CacheManager entries, not checkpoint
    * RDDs). No-op for any other plan shape. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _                                            => ()
    }

  /** Cap the ORIGIN statistics a checkpointed frame's LogicalRDD inherits.
    *
    * Spark preserves the origin plan's estimated Statistics across
    * Dataset.checkpoint/localCheckpoint (so a checkpointed small dim can
    * still broadcast). For ITERATIVE operators this inheritance compounds:
    * round r's plan multiplies its leaves' sizeInBytes at every join
    * (SizeInBytesOnlyStatsPlanVisitor), round r's checkpoint inherits that
    * product as its own leaf stat, and round r+1 multiplies the products —
    * the estimate grows doubly-exponentially in the round count. By ~10
    * checkpointed rounds the sizeInBytes BigInts are megabytes wide and
    * the DRIVER burns minutes in BigInteger.multiply during planning
    * (observed live: a 4-level Louvain spending 35+ min in Toom-Cook-3
    * inside the stats visitor). Capping each checkpoint's inherited
    * sizeInBytes/rowCount at `capBytes` bounds every later product while
    * keeping the only decision these numbers drive — "too big to
    * broadcast" — intact (the cap is far above every broadcast
    * threshold). Non-LogicalRDD frames pass through untouched. */
  def capCheckpointStats(df: DataFrame, capBytes: Long): DataFrame = {
    val analyzed =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
    analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val cap = BigInt(capBytes)
        val s   = l.stats
        if (s.sizeInBytes <= cap && s.rowCount.forall(_ <= cap)) df
        else {
          val capped = org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = s.sizeInBytes.min(cap),
            rowCount = s.rowCount.map(_.min(cap)),
            attributeStats = s.attributeStats,
            isRuntime = s.isRuntime)
          val fresh = new org.apache.spark.sql.execution.LogicalRDD(
            l.output,
            l.rdd,
            l.outputPartitioning,
            l.outputOrdering,
            l.isStreaming,
            l.stream)(
            df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
            Some(capped),
            None)
          ofRows(df.sparkSession, fresh)
        }
      case _ => df
    }
  }

  /** Replace a checkpointed frame's INHERITED statistics with the MEASURED
    * size of its just-materialized blocks.
    *
    * Two birds: (1) the doubly-exponential BigInt planning tax
    * [[capCheckpointStats]] was built for cannot arise — measured sizes
    * are small honest longs; (2) unlike the 1 TiB cap, which forced every
    * iterative-state join to a sort-merge plan even when the state is a
    * few hundred KB, honest sizes let the planner broadcast node-sized
    * state STATICALLY (no exchange, no sort) while a genuinely large
    * state at production scale reads as genuinely large and plans as a
    * distributed join — the right plan at every scale, from the same
    * code. Only meaningful for eagerly-persisted local checkpoints; when
    * the blocks aren't in the block manager (reliable checkpoint files),
    * falls back to capping the inherited stats at `fallbackCapBytes`. */
  def withMeasuredStats(df: DataFrame, fallbackCapBytes: Long): DataFrame = {
    val analyzed =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
    analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val sc = df.sparkSession.sparkContext
        val measured = sc.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => math.max(i.memSize + i.diskSize, 1L))
        measured match {
          case Some(bytes) =>
            val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
              sizeInBytes = BigInt(bytes))
            val fresh = new org.apache.spark.sql.execution.LogicalRDD(
              l.output,
              l.rdd,
              l.outputPartitioning,
              l.outputOrdering,
              l.isStreaming,
              l.stream)(
              df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
              Some(stats),
              None)
            ofRows(df.sparkSession, fresh)
          case None => capCheckpointStats(df, fallbackCapBytes)
        }
      case _ => df
    }
  }

  /** Re-advertise a hash partitioning on a just-checkpointed frame.
    *
    * Spark 4's Dataset.localCheckpoint/checkpoint returns a LogicalRDD
    * with `UnknownPartitioning` (probed empirically — the constructor has
    * the field, the checkpoint path just never fills it), so EVERY
    * equi-join against checkpointed iterative state re-shuffles both
    * sides even when the state was explicitly hash-partitioned on the
    * join key one line earlier. This rewrap puts the truth back: the
    * caller guarantees the frame's final transformation was
    * `repartition(numPartitions, keys...)` (IterState.matKeyed makes the
    * guarantee structural — it applies the repartition itself), so
    * declaring HashPartitioning(keys, numPartitions) describes the bytes
    * exactly and EnsureRequirements can elide the per-iteration
    * exchanges (optimization guide §2.4). Keys resolve by NAME against
    * the checkpoint's own output attributes. Non-LogicalRDD frames pass
    * through untouched. */
  def withHashPartitioning(df: DataFrame, keys: Seq[String], numPartitions: Int): DataFrame = {
    val analyzed =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
    analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val attrs = keys.map(k =>
          l.output
            .find(_.name == k)
            .getOrElse(sys.error(s"withHashPartitioning: no column '$k' in ${l.output.map(_.name)}")))
        val part = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(attrs, numPartitions)
        val fresh = new org.apache.spark.sql.execution.LogicalRDD(
          l.output,
          l.rdd,
          part,
          l.outputOrdering,
          l.isStreaming,
          l.stream)(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          Some(l.stats),
          None)
        ofRows(df.sparkSession, fresh)
      case _ => df
    }
  }

  /** Install a TaskContext on the current thread — needed by helper threads
    * (e.g. a process-stdin writer) that consume a task's shuffle or cached
    * block iterators: block locks are tracked per TaskContext, and a thread
    * without one can mis-release them (same reason Spark's own PipedRDD sets
    * it in its stdin writer thread). */
  def setTaskContext(ctx: org.apache.spark.TaskContext): Unit =
    org.apache.spark.TaskContext.setTaskContext(ctx)

  /** Idempotently register an extra planner strategy on the session. */
  def addStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.exists(_ eq s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Widest common type for two column types under union coercion (the
    * same widening unionByName itself applies, e.g. decimal precision
    * growth), None when the types are irreconcilable — lets callers
    * validate a union-shaped merge up front instead of surfacing a raw
    * analysis error mid-plan. */
  def widerType(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Option[org.apache.spark.sql.types.DataType] =
    org.apache.spark.sql.catalyst.analysis.TypeCoercion.findWiderTypeForTwo(a, b)

  /** Register a SQL function on an ALREADY-BUILT session (the
    * config-driven path is GraftExtensions at builder time; this covers
    * sessions the caller didn't construct). sessionState is private[sql],
    * hence here. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
      .functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
