package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine deterministic aggregation helpers.
  *
  * IEEE-754 double summation is order-dependent, and Spark's partial/final
  * aggregation folds rows in a different order than a single-node oracle
  * (DuckDB) does. For money-like columns whose values originate with exactly
  * two decimal digits, we instead sum exactly in fixed-point decimal space and
  * cast the exact result back to double — bit-identical in any engine and in
  * any aggregation order, at any cluster size. This matters doubly at the
  * 100 TB design point where partial-aggregate tree shape is nondeterministic.
  */
object Det {
  /** Exact fixed-point view of a 2-decimal money column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent SUM over a 2-decimal double column, returned as double. */
  def decSum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent AVG (exact decimal sum, then one double division). */
  def decAvg(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** revenue = price * (1 - discount), computed exactly in decimal space.
    * Mirrors `CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))`.
    */
  def revenue(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(discount))

  /** Order-independent SUM of revenue, as double. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(revenue(price, discount)).cast("double")
}
