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

  /** The audit statistic [[autoSaltedAgg]] consumes: the joinKeySkew
    * skew factor max_cnt · n_keys / n_rows of `keyCols` over `df` — the
    * straggler multiplier on the slowest shuffle partition if these
    * columns key an aggregation (uniform keys score 1.0). Computed from
    * ONE map-side-combined key-count pass collapsed to a single row (a
    * model-bounded driver scalar: three longs). `sampleFraction` trades
    * exactness for a cheap seeded-sample estimate on 100-TB inputs —
    * max/avg ratios are stable under uniform row sampling at any hot-key
    * share worth salting for. Empty input scores 1.0 (nothing to salt). */
  def skewFactor(
      df: DataFrame,
      keyCols: Seq[String],
      sampleFraction: Option[Double] = None): Double = {
    require(keyCols.nonEmpty, "need at least one key column")
    sampleFraction.foreach(f =>
      require(f > 0.0 && f <= 1.0, s"sampleFraction must be in (0,1], got $f"))
    val base = sampleFraction.map(f => df.sample(withReplacement = false, f, seed = 42L)).getOrElse(df)
    val r = base
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_cnt"))
      .head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 1.0
    else r.getLong(2).toDouble * r.getLong(0) / r.getLong(1)
  }

  /** Audit-driven aggregation — the closed loop from hot-key DIAGNOSIS
    * (the quality_skew_audit statistic) to ACTION: measure (or accept) the
    * key's skew factor, and only when it crosses `skewThreshold` route the
    * aggregation through the two-phase [[saltedAgg]] with
    * n_salts = min(maxSalts, ⌈skew factor⌉) — sized so the hot key's
    * partial groups land near the average partition load; below the
    * threshold the plain single-shuffle groupBy runs untouched (salting a
    * uniform key pays a second exchange for nothing).
    *
    * `partial`/`merge` follow the [[saltedAgg]] associativity contract and
    * must alias their outputs IDENTICALLY (e.g. `sum("v") as "s"` /
    * `sum("s") as "s"`): the plain path applies `partial` directly, so the
    * two routes emit the same schema and — for associative aggregates —
    * the same values (PlanSpec asserts the plan shapes; the gate row pins
    * value equality). Pass `knownSkewFactor` to reuse a precomputed audit
    * (e.g. the published ANALYZE stats or a prior joinKeySkew read) and
    * skip the measurement pass entirely. */
  def autoSaltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      partial: Seq[Column],
      merge: Seq[Column],
      skewThreshold: Double = 4.0,
      maxSalts: Int = 64,
      sampleFraction: Option[Double] = None,
      knownSkewFactor: Option[Double] = None): DataFrame = {
    require(skewThreshold > 1.0, s"skewThreshold must exceed 1.0, got $skewThreshold")
    require(maxSalts >= 2, s"maxSalts must be >= 2, got $maxSalts")
    val factor = knownSkewFactor.getOrElse(skewFactor(df, keyCols, sampleFraction))
    if (factor >= skewThreshold) {
      val salts = math.min(maxSalts.toLong, math.ceil(factor).toLong).toInt
      saltedAgg(df, keyCols, salts, partial, merge)
    } else
      df.groupBy(keyCols.map(col): _*).agg(partial.head, partial.tail: _*)
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

  /** The join-side twin of [[autoSaltedAgg]]: measure (or accept) the FACT
    * side's key skew and only pay [[saltedJoin]]'s dim replication when the
    * key actually crosses `skewThreshold` — n_salts = min(maxSalts,
    * ⌈factor⌉), the same sizing rule. Below the threshold the plain
    * equi-join runs untouched (replicating dim against a uniform key buys
    * nothing and multiplies the build side). Same audit sources as the agg
    * twin: a live [[skewFactor]] pass, a seeded sample of it, or a
    * precomputed value (e.g. `Catalog.skewFactorFor` from published ANALYZE
    * stats — the metadata-read decision). Inner equi-joins only, the
    * [[saltedJoin]] contract; both routes emit identical rows (PlanSpec
    * pins the shapes and the equality). */
  def autoSaltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      skewThreshold: Double = 4.0,
      maxSalts: Int = 64,
      sampleFraction: Option[Double] = None,
      knownSkewFactor: Option[Double] = None): DataFrame = {
    require(skewThreshold > 1.0, s"skewThreshold must exceed 1.0, got $skewThreshold")
    require(maxSalts >= 2, s"maxSalts must be >= 2, got $maxSalts")
    val factor = knownSkewFactor.getOrElse(skewFactor(fact, Seq(key), sampleFraction))
    if (factor >= skewThreshold) {
      val salts = math.min(maxSalts.toLong, math.ceil(factor).toLong).toInt
      saltedJoin(fact, dim, key, salts)
    } else fact.join(dim, Seq(key))
  }
}
