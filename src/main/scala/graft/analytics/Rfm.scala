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
  * [[PrefixSum]] §doc documents. Scores use explicit integer arithmetic —
  * `1 + ((rank-1)*5) div n` — instead of ntile(), whose extra-row
  * placement rule would have to be replicated bit-for-bit; this formula
  * is its own spec, identical in both engines.
  *
  * Round 14: the rank itself is GONE from the distributed plan. A score
  * only reads which side of four boundary ranks a customer falls, and the
  * key (metric, custkey) is unique, so the twelve boundary KEYS (4 per
  * metric) determine every score: score = 1 + #boundaries strictly below
  * the customer's key. They are order statistics, found by the
  * [[Sketch.selectQuantile]] selection shape (one fused 3-metric
  * histogram, a driver walk, one in-bucket residual-rank job), after
  * which scoring is MAP-ONLY over the customer frame. The previous form
  * chained three [[PrefixSum.globalRunningSum]] passes — three range
  * exchanges and three checkpoint pins of the whole frame to read ranks
  * that were immediately collapsed to quintile ids.
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
    rfmScoresOver(base)
  }

  /** Quintile scoring over any (o_custkey, f, m_cents, r_days) frame whose
    * key column is unique. Boundary rank of quintile i: score > i ⟺
    * (rank-1)·5 ≥ i·n ⟺ rank > ⌈i·n/5⌉ =: Bᵢ, so with Tᵢ = the unique
    * (metric, custkey) key at rank Bᵢ, score = 1 + #{i : key > Tᵢ}.
    */
  def rfmScoresOver(base: DataFrame): DataFrame = {
    import base.sparkSession.implicits._
    val mcols = Seq("r_days", "f", "m_cents")
    // one pass: per-metric min/max + n (the histogram bucketing inputs)
    val st = base.agg(
      min($"r_days"), max($"r_days"), min($"f"), max($"f"),
      min($"m_cents"), max($"m_cents"), count(lit(1))).head()
    val n = st.getLong(6)
    if (n == 0L)
      // empty frame: min/max are NULL, so the histogram bucketing has no
      // inputs; return the declared-schema empty frame the pre-selection
      // rank form produced (grouped aggregate over an empty input)
      return base.select(lit(1L).as("r_score"), lit(1L).as("f_score"),
        lit(1L).as("m_score"), lit(0L).as("n_customers"),
        lit(0L).as("m_cents_total")).where(lit(false))
    val mets = mcols.zipWithIndex.map { case (c, i) =>
      (c, st.getLong(2 * i), st.getLong(2 * i + 1))
    }
    def bexpr(c: String, mn: Long, mx: Long) =
      expr(s"($c - (${mn}L)) * ${Sketch.SelBuckets} div ${mx - mn + 1}L")
    // one fused job: all three metrics' SelBuckets-bounded histograms
    val hist = base.select(explode(array(mets.zipWithIndex.map {
        case ((c, mn, mx), i) =>
          struct(lit(i).as("m"), bexpr(c, mn, mx).as("b"))
      }: _*)).as("mb"))
      .groupBy($"mb.m".as("m"), $"mb.b".as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val targets = (1 to 4).map(i => (i.toLong * n + 4) / 5) // Bᵢ = ⌈i·n/5⌉
    // walk each metric's histogram: (metric, bucket, residual in-bucket rank)
    val picks = mets.indices.flatMap { mi =>
      val h = hist.filter(_._1 == mi).map(t => (t._2, t._3)).sortBy(_._1)
      targets.zipWithIndex.map { case (k, ti) =>
        var cum = 0L; var b = 0L; var res = 0L
        h.foreach { case (bk, cnt) =>
          if (cum < k && k <= cum + cnt) { b = bk; res = k - cum }
          cum += cnt
        }
        (mi, ti, b, res)
      }
    }
    // one in-bucket job: residual ranks inside the ≤12 picked buckets give
    // the boundary keys (value, custkey); collect is 12-row bounded
    val pickDf = broadcast(picks.toDF("m", "ti", "b", "res"))
    val wanted = picks.map { case (m, _, b, _) => (m, b) }.distinct.toSet
    val exploded = base.select($"o_custkey", explode(array(mets.zipWithIndex.map {
        case ((c, mn, mx), i) =>
          struct(lit(i).as("m"), bexpr(c, mn, mx).as("b"), col(c).as("v"))
      }: _*)).as("x"))
      .select($"x.m", $"x.b", $"x.v", $"o_custkey")
      .filter(wanted.map { case (m, b) => $"m" === m && $"b" === b }
        .reduce(_ || _))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy($"m", $"b").orderBy($"v", $"o_custkey")
    val bounds = exploded
      .withColumn("rn", row_number().over(wRank))
      .join(pickDf, Seq("m", "b"))
      .filter($"rn" === $"res")
      .select($"m", $"ti", $"v", $"o_custkey".as("ck"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // map-only scoring: 1 + #boundary keys strictly below this row's key
    def score(mi: Int, c: String) = (0 until 4)
      .foldLeft(lit(1L)) { case (acc, ti0) =>
        val (tv, tc) = bounds((mi, ti0))
        acc + when(col(c) > tv || (col(c) === tv && $"o_custkey" > tc), 1L)
          .otherwise(0L)
      }
    base.select(
        score(0, "r_days").as("r_score"),
        score(1, "f").as("f_score"),
        score(2, "m_cents").as("m_score"),
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
