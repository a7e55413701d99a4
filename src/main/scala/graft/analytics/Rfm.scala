package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.util.Ckpt._
import graft.util.Det

/** RFM segmentation — recency / frequency / monetary quintile scoring over
  * the order history, the classic CRM rollup of the reference's warehouse
  * tier (reference: the `configs/sources` YAML specs land exactly this
  * orders feed; the segmentation is the canonical downstream consumer).
  *
  * The interesting part at scale is the RANK: a quintile needs each
  * customer's global rank per metric, and the naive `ntile(5) OVER
  * (ORDER BY metric)` is a single-partition window — the scale-killer
  * [[PrefixSum]] §doc documents. Here each rank comes from
  * [[PrefixSum.globalRunningSum]] (range exchange + parallel local windows
  * + per-partition offset add) with value ≡ 1: running count of rows with
  * key ≤ mine = the exact 1-based global rank, no single-task stage.
  * Scores use explicit integer arithmetic — `1 + ((rank-1)*5) div n` —
  * instead of ntile(), whose extra-row placement rule would have to be
  * replicated bit-for-bit; this formula is its own spec, identical in both
  * engines.
  *
  * Ordering is ascending for every metric (ties broken by custkey), so
  * score 5 = most-recently-inactive / highest frequency / highest spend
  * quintile boundary convention is documented rather than hidden in an
  * engine's ntile implementation.
  */
object Rfm {

  /** x_rfm — (r_score, f_score, m_score) segment sizes + total spend. */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_custkey", Det.cents($"o_totalprice").as("cents"),
        datediff(to_date($"o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
    val pc = o.groupBy($"o_custkey")
      .agg(count(lit(1)).as("f"), sum($"cents").as("m_cents"),
        max($"day").as("last_day"))
    val mx = pc.agg(max($"last_day").as("maxd"))
    // One DISK_ONLY materialization of the customer aggregate: it feeds
    // the 3-pass rank chain AND the n_cust count, and without the pin each
    // consumer re-derives the orders scan + aggregate (round-7 driver
    // bench: 5.2 s for a query whose work is customer-bounded).
    val base = pc.crossJoin(broadcast(mx))
      .select($"o_custkey", $"f", $"m_cents",
        ($"maxd" - $"last_day").as("r_days"))
      .ckptDisk()
    // three global ranks, each a parallel two-phase prefix count
    val withR = PrefixSum.globalRunningSum(spark, base,
        struct($"r_days", $"o_custkey"), lit(1L))
      .withColumnRenamed("running", "rr")
    val withF = PrefixSum.globalRunningSum(spark, withR,
        struct($"f", $"o_custkey"), lit(1L))
      .withColumnRenamed("running", "fr")
    val withM = PrefixSum.globalRunningSum(spark, withF,
        struct($"m_cents", $"o_custkey"), lit(1L))
      .withColumnRenamed("running", "mr")
    val n = base.agg(count(lit(1)).as("n_cust"))
    withM.crossJoin(broadcast(n))
      .select(
        expr("1 + ((rr - 1) * 5) div n_cust").as("r_score"),
        expr("1 + ((fr - 1) * 5) div n_cust").as("f_score"),
        expr("1 + ((mr - 1) * 5) div n_cust").as("m_score"),
        $"m_cents")
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum($"m_cents").as("m_cents_total"))
      .orderBy($"r_score", $"f_score", $"m_score")
  }

  val rfmSql: String =
    """WITH pc AS (
      | SELECT o_custkey, count(*) AS f,
      |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m_cents,
      |  max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_day
      | FROM orders GROUP BY 1),
      |mx AS (SELECT max(last_day) AS maxd FROM pc),
      |base AS (
      | SELECT o_custkey, f, CAST(m_cents AS BIGINT) AS m_cents,
      |  mx.maxd - last_day AS r_days
      | FROM pc, mx),
      |n AS (SELECT count(*) AS n_cust FROM base),
      |rk AS (
      | SELECT m_cents,
      |  row_number() OVER (ORDER BY r_days, o_custkey) AS rr,
      |  row_number() OVER (ORDER BY f, o_custkey) AS fr,
      |  row_number() OVER (ORDER BY m_cents, o_custkey) AS mr
      | FROM base)
      |SELECT 1 + ((rr - 1) * 5) // n.n_cust AS r_score,
      | 1 + ((fr - 1) * 5) // n.n_cust AS f_score,
      | 1 + ((mr - 1) * 5) // n.n_cust AS m_score,
      | count(*) AS n_customers, CAST(sum(m_cents) AS BIGINT) AS m_cents_total
      |FROM rk, n
      |GROUP BY 1, 2, 3
      |ORDER BY r_score, f_score, m_score""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_rfm" -> (rfm _))

  val oracles: Map[String, String] = Map(
    "x_rfm" -> rfmSql)
}
