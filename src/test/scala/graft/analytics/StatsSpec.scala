package graft.analytics

import java.security.MessageDigest

import graft.SparkSpec
import graft.io.Tables

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_trend_fit matches a driver-side OLS on the daily series") {
    val orders = Tables.orders(spark, dir)
      .selectExpr("datediff(to_date(o_orderdate), date'1970-01-01') as d",
        "cast(round(o_totalprice * 100) as long) as cents")
      .as[(Int, Long)].collect()
    val daily = orders.groupBy(_._1).map { case (d, xs) =>
      (d.toLong, xs.map(_._2).sum / 100)
    }.toSeq
    val d0 = daily.map(_._1).min
    val pts = daily.map { case (d, y) => (d - d0, y) }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val got = Stats.trendFit(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].head()
    assert(got == ((n, sx, sy, sxy, sxx, num, den, num.toDouble / den.toDouble)))
  }

  test("x_poisson_bootstrap: replicate means bracket the true mean tightly") {
    val rows = Stats.poissonBootstrap(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == Stats.Replicates)
    val cents = Tables.orders(spark, dir)
      .selectExpr("cast(round(o_totalprice * 100) as long)").as[Long].collect()
    val trueMean = cents.sum / cents.length
    // each replicate resamples ~n rows; means scatter around the truth
    val means = rows.map(_._3)
    assert(means.min <= trueMean && trueMean <= means.max)
    // Poisson(1) weights: effective counts within 3 sigma of n
    val nRows = cents.length.toLong
    val slack = 4 * math.sqrt(nRows.toDouble).toLong
    assert(rows.forall(r => math.abs(r._2 - nRows) <= slack))
  }

  test("bootstrap weights follow the pinned Poisson table driver-side") {
    val rows = Stats.poissonBootstrap(spark, dir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val cents = Tables.orders(spark, dir)
      .selectExpr("o_orderkey", "cast(round(o_totalprice * 100) as long)")
      .as[(Long, Long)].collect()
    def weight(key: Long, b: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"$key:$b".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.take(15), 16) % (1L << 20)
      val k = Stats.PoissonCdf20.indexWhere(u < _)
      if (k < 0) 6L else k.toLong
    }
    (1L to 3L).foreach { b =>
      val ws = cents.map { case (k, c) => (weight(k, b), c) }
      val nEff = ws.map(_._1).sum
      val wsum = ws.map(w => w._1 * w._2).sum
      assert(rows(b) == ((nEff, wsum / nEff)))
    }
  }
}
