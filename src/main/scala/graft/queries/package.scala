package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** One engine query: a Spark implementation plus (when SQL-expressible) the
    * equivalent DuckDB oracle SQL the driver hash-compares against. Column
    * names MUST match between the two (the driver sorts columns by name before
    * hashing). */
  final case class Q(
      name: String,
      oracle: Option[String])(
      val run: (SparkSession, String) => DataFrame)

  /** Exact money arithmetic: sums of doubles are order-dependent in the last
    * ulp, so Spark and DuckDB would hash-mismatch. Casting to DECIMAL(18,2)
    * before aggregating makes the arithmetic exact (and identical) in both
    * engines; results are cast back to double at the end. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  def asDouble(c: Column): Column = c.cast("double")
}
