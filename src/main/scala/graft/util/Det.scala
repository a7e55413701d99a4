package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic aggregation helpers.
  *
  * IEEE-754 double summation is order-dependent, and Spark's partial/final
  * aggregation folds rows in a different order than a single-node oracle
  * (DuckDB) does. For money-like columns whose values originate with exactly
  * two decimal digits, we sum exactly in INTEGER CENTS: `round(x*100)` is
  * exact for 2-decimal doubles, long sums are exact and order-independent at
  * any cluster size, and the final long→double conversion + one division is
  * bit-identical in any engine. (An exact DECIMAL formulation gives the same
  * values, but its products exceed precision 18 and fall off Spark's Long
  * fast path into per-row BigDecimal — measured 1.75× slower on the sf0.1
  * top-k join.)
  *
  * RANGE BOUND: the long sum is exact up to Long.MaxValue ≈ 9.2e18. At
  * TPC-H-like prices (revenue terms ~1e9) that is ~9e9 rows per aggregation
  * GROUP — comfortably past any per-group cardinality here, but a single
  * global sum over an extreme corpus can exceed it. Under Spark 4's
  * default ANSI mode overflow is LOUD (ARITHMETIC_OVERFLOW), never a
  * silent wrap; the escape hatch is summing into DECIMAL(38,0)
  * (`sum(cents(c).cast(DecimalType(38,0)))` — same values, off the Long
  * fast path).
  */
object Det {
  /** Exact integer-cents view of a 2-decimal money column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-independent SUM over a 2-decimal double column, as double. */
  def decSum(c: Column): Column = sum(cents(c)).cast("double") / 100.0

  /** Order-independent AVG (exact cents sum, then double divisions). */
  def decAvg(c: Column): Column = sum(cents(c)).cast("double") / 100.0 / count(c)

  /** revenue = price * (1 - discount) in exact scaled integers (×10⁴). */
  def revenueSum(price: Column, discount: Column): Column =
    sum(cents(price) * (lit(100L) - cents(discount))).cast("double") / 10000.0
}
