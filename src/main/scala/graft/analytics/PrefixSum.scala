package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.util.Det
import graft.util.Ckpt._

/** Distributed GLOBAL prefix sum — the scalable replacement for the
  * single-partition `Window.orderBy(key)` that Spark plans for an ungrouped
  * running total (every row through one task — the classic scale-killer,
  * VERDICT round 1's top finding against IVF).
  *
  * Two-phase form: range-partition by the order key (parallel range
  * exchange — the same machinery as a global sort), run the running sum
  * WITHIN each partition (window partitioned by `spark_partition_id()`,
  * so all partitions work concurrently), then add each partition's
  * exclusive offset — a tiny per-partition total list that is aggregated,
  * cumulated on the driver (num-partitions entries, not rows), and
  * broadcast-joined back. Row values are bound-independent: however the
  * range sampler splits the key space, local + offset = the exact global
  * prefix, so results hash identically run to run.
  */
object PrefixSum {

  /** Adds `running` = sum of `value` over all rows with key ≤ this row's
    * (key unique ⇒ well-defined). `value` must be integral (exactness).
    */
  def globalRunningSum(
      spark: SparkSession,
      df: DataFrame,
      key: Column,
      value: Column): DataFrame = {
    import spark.implicits._
    val n = spark.sparkContext.defaultParallelism
    // NULL values count as 0 (pinned contract): without the coalesce, an
    // all-NULL range slice makes its partition total NULL (getLong NPEs)
    // and leading-NULL rows would get NULL runnings that disagree with the
    // downstream offsets — null-as-zero keeps every row's running defined.
    val keyed = df.withColumn("__key", key)
      .withColumn("__val", coalesce(value, lit(0L)))
      .repartitionByRange(n, $"__key")
      .withColumn("__pid", spark_partition_id())
    // cache: the partition totals pass and the main pass must see the SAME
    // partitioning decision (range bounds are sampled per execution)
    val materialized = keyed.ckptDisk()
    // coalesce: sum() over an all-NULL partition is NULL — without it the
    // getLong below NPEs on any range slice whose values are entirely NULL
    val offsets = materialized.groupBy($"__pid")
      .agg(coalesce(sum($"__val"), lit(0L)).as("__total"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) => (pid, acc + tot) }
      .sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }
      .toSeq
    val offsetDf = spark.createDataFrame(offsets).toDF("__pid", "__offset")
    val w = Window.partitionBy($"__pid").orderBy($"__key")
    materialized
      .withColumn("__local", sum($"__val").over(w))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("running", $"__local" + $"__offset")
      .drop("__key", "__val", "__pid", "__local", "__offset")
  }

  /** q_running_global — corpus-wide running revenue in cents over orders
    * ordered by o_orderkey: the ungrouped cumulative total that naive
    * window SQL funnels through one partition, here via [[globalRunningSum]]
    * (range exchange + parallel local windows + offset add). The oracle IS
    * the naive global window — DuckDB can afford it single-node.
    */
  def runningGlobal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", Det.cents($"o_totalprice").as("price_cents"))
    globalRunningSum(spark, o, $"o_orderkey", $"price_cents")
      .withColumnRenamed("running", "running_cents")
      .orderBy($"o_orderkey")
  }

  val runningGlobalSql: String =
    """SELECT o_orderkey,
      | CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |   OVER (ORDER BY o_orderkey) AS BIGINT) AS running_cents
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_running_global" -> (runningGlobal _))

  val oracles: Map[String, String] = Map(
    "q_running_global" -> runningGlobalSql)
}
