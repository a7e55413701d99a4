package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one [@link private[sql]] doorway this library uses: wrapping a
  * custom [[LogicalPlan]] node back into a user-facing DataFrame.
  * `Dataset.ofRows` is how every Spark-internal operator becomes a
  * Dataset; third-party physical operators (this library's
  * [[graft.plans.AsOfJoinExec]]) need the same constructor, and placing
  * this forwarder inside the `org.apache.spark.sql` package tree is the
  * established pattern for reaching it (no reflection, compiler-checked
  * against the installed Spark version).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
