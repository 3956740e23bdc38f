package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with the same
  * key and right.ts <= left.ts (strictly earlier with `strict = true`).
  *
  * No reference counterpart (SURVEY.md §2e — the reference has no joins at
  * all); this is a standard time-series operator the engine adds.
  *
  * Formulation: union both sides with a side marker, then one
  * `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side)`
  * window — a single shuffle+sort per key, NO range cross-join and no
  * per-row backward scan. At 100 TB this is the only shape that survives:
  * cost is the same as any windowed aggregation over the union, and skewed
  * keys are bounded by the window operator's external sort.
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      lookup rows
    * @param keyCols    equality key column names (same names both sides)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param payload    right columns to carry onto left rows (renamed as-is)
    * @param strict     true = right.ts <  left.ts; false = <=
    * @param rightTieBreak right column ordering ties among right rows with
    *                   IDENTICAL (key, ts) — the largest wins. Without it,
    *                   duplicate right timestamps would make the attached
    *                   payload partition-order-dependent.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean = false,
      rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns

    // side marker orders right rows before left rows at equal ts for <=
    // semantics, after them for strict <
    val rightSide = if (strict) lit(2) else lit(0)
    // natural-typed tiebreak (a string cast would order "10" < "9"); left
    // rows take a typed null — tb only disambiguates within right rows,
    // since __side already separates the sides at equal ts
    val tb     = rightTieBreak.map(col).getOrElse(lit(0))
    val tbNull = rightTieBreak
      .map(c => lit(null).cast(right.schema(c).dataType))
      .getOrElse(lit(0))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", tbNull)
      .select(
        (keyCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__tb")) ++
          leftCols.filterNot(keyCols.contains).map(c => col(c).as(s"__l_$c")) ++
          payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", rightSide)
      .withColumn("__tb", tb)
      .select(
        (keyCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__tb")) ++
          leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
          payload.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l
      .unionByName(r)
      .select(
        (keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
          leftCols.filterNot(keyCols.contains).map(c => col(s"__l_$c")) ++
          payload.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w).as(s"__asof_$c")): _*)

    filled
      .filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == leftTs).map(c => col(s"__l_$c").as(c)) ++
          payload.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** Column helper: latest prior value of `value` among rows matching
    * `cond`, per key ordered by ts — the inline as-of for self-joins. */
  def lastPriorWhere(cond: Column, value: Column, key: Column, ts: Column, tieBreak: Column): Column =
    last(when(cond, value), ignoreNulls = true)
      .over(
        Window
          .partitionBy(key)
          .orderBy(ts, tieBreak)
          .rowsBetween(Window.unboundedPreceding, -1))
}
