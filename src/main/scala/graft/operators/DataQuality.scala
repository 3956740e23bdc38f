package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the validation pass a training-data
  * pipeline runs before ingestion. Each rule is a predicate evaluated in ONE
  * scan (conditional aggregation, map-side combined): no per-rule jobs, no
  * driver loops, any number of rules at the cost of one pass.
  */
object DataQuality {

  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule             = Rule(s"${c}_not_null", col(c).isNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"${c}_in_range", col(c) < lo || col(c) > hi)
  def matches(c: String, regex: String): Rule =
    Rule(s"${c}_matches", !col(c).rlike(regex))
  def positive(c: String): Rule            = Rule(s"${c}_positive", col(c) <= 0)

  /** One row per rule: (rule, n_violations, n_rows, violation_rate). */
  def profile(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = rules.map(r => sum(when(r.violation, 1L).otherwise(0L)).as(r.name)) :+
      count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (rule, n_violations)
    val entries = rules.map(r => struct(lit(r.name).as("rule"), col(r.name).as("n_violations")))
    wide
      .select(col("__n"), explode(array(entries: _*)).as("e"))
      .select(
        col("e.rule").as("rule"),
        col("e.n_violations").as("n_violations"),
        col("__n").as("n_rows"),
        (col("e.n_violations").cast("double") / col("__n")).as("violation_rate"))
  }

  /** Uniqueness check (needs its own shuffle, unlike row-local rules):
    * key combinations appearing more than once. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
}
