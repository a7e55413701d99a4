package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with ZERO exchanges — the
  * canonical 100 TB pattern for fact⋈fact joins that recur (SURVEY.md §4.2
  * "bucketing for co-located joins"). The BucketingSpec asserts the plan of a
  * bucketed join contains no ShuffleExchange.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKey: String,
      numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, bucketKey)
      .sortBy(bucketKey)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on the bucket key — planner elides both
    * exchanges when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
