package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at scale.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (Engine.tune enables it); these are the explicit tools for the
  * pathological shapes AQE cannot fix — a single key dominating an
  * aggregation, or a broadcast-ineligible dim joined against a skewed fact.
  */
object Skew {

  /** Deterministic per-row salt in [0, n): derived from the whole row hash,
    * so one hot key's rows spread across n sub-keys without RNG state. */
  def saltCol(n: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong)).cast("int")

  /** Two-phase salted aggregation for associative aggregates: phase 1
    * aggregates (key, salt) — spreading a hot key over n partial groups —
    * phase 2 merges the partials per key. `partial` computes the phase-1
    * aggregate, `merge` combines phase-1 results; both must be associative
    * (sum/count/min/max/...).
    *
    * Example: saltedAgg(df, Seq("k"), 16, Seq(sum("v") as "s"), Seq(sum("s") as "s"))
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      salts: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(salts, df.columns.map(col).toSeq))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Skew-safe inner equi-join of a skewed `fact` against a small-but-not-
    * broadcastable `dim`: fact rows get a row-hash salt, dim rows are
    * replicated once per salt, and the join key becomes (key, salt) — a hot
    * fact key now lands on `salts` reducers instead of one.
    *
    * Replication factor on dim is exactly `salts`; pick it ~ (hot-key rows /
    * average-key rows) and keep dim * salts well under the fact size.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(salts, fact.columns.map(col).toSeq))
    val explodedDim = dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedFact
      .join(explodedDim, Seq(key, "__salt"))
      .drop("__salt")
  }
}
