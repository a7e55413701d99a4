package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7.4-5: per-user/session groupBys
  * skew on bot/power users at the 100 TB design point). AQE's skew-join
  * splitting covers sort-merge joins; these cover the aggregation side and
  * broadcast-averse skewed joins deterministically.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on (key, salt) so one
    * hot key spreads over `saltBuckets` reducers, then final-aggregate on the
    * key. Use for algebraic aggregates (counts/sums): pass the partial and
    * final expressions. The result's key column is named `keyName` — no
    * internal magic name leaks into the output schema.
    *
    * The salt is `pmod(hash(<distributor>), saltBuckets)` — deterministic,
    * no rand(), so declared queries stay replayable.
    */
  def twoPhaseAgg(
      df: DataFrame,
      key: Column,
      distributor: Column,
      saltBuckets: Int,
      partial: Seq[Column],
      fin: Seq[Column],
      keyName: String = "key"): DataFrame =
    df.withColumn("__salt", pmod(hash(distributor), lit(saltBuckets)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__k"))
      .agg(fin.head, fin.tail: _*)
      .withColumnRenamed("__k", keyName)

  /** Salted join of a skewed left side against a small-ish right side:
    * left rows get a deterministic salt in [0, n); right rows are replicated
    * n× (explode) so the join key (key, salt) spreads each hot key over n
    * tasks. Right side must be replicable (dimension-sized).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltBuckets: Int,
      leftDistributor: Column): DataFrame = {
    val saltedLeft = left
      .withColumn("__salt", pmod(hash(leftDistributor), lit(saltBuckets)))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight,
      saltedLeft(leftKey) === replicatedRight(rightKey) &&
        saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
