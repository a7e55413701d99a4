package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def dailyDollars(dir: String): Map[Long, Long] =
    Tables.orders(spark, dir)
      .select(
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date($"o_orderdate"),
          org.apache.spark.sql.functions.lit("1970-01-01").cast("date")).cast("long"),
        org.apache.spark.sql.functions.round($"o_totalprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(v => v.map(_._2).sum / 100).toMap

  test("x_ewma matches a driver-side kernel recomputation exactly") {
    val dir = "/root/testdata/sf0.001"
    val daily = dailyDollars(dir)
    val rows = Series.ewma(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("d")).toSeq == daily.keys.toSeq.sorted)
    rows.foreach { r =>
      val t = r.getAs[Long]("d")
      val terms = (0 until Series.K).flatMap { k =>
        daily.get(t - k).map(y => (y * (1L << (Series.K - 1 - k)), 1L << (Series.K - 1 - k)))
      }
      val num = terms.map(_._1).sum
      val den = terms.map(_._2).sum
      assert(r.getAs[Long]("ewma_num") == num, s"num at day $t")
      assert(r.getAs[Long]("ewma_den") == den, s"den at day $t")
      assert(r.getAs[Double]("ewma") == num.toDouble / den.toDouble)
      assert(r.getAs[Long]("y") == daily(t))
    }
  }

  test("ewma denominator renormalizes on the warm-up edge (first day = bare 2^19)") {
    val dir = "/root/testdata/sf0.001"
    val rows = Series.ewma(spark, dir).collect()
    val first = rows.minBy(_.getAs[Long]("d"))
    // The first observed day has no history: its only kernel term is its own
    // weight 2^(K-1) — the gap-renormalization contract, not a zero-decay.
    assert(first.getAs[Long]("ewma_den") == (1L << (Series.K - 1)))
    assert(first.getAs[Double]("ewma") == first.getAs[Long]("y").toDouble)
  }

  test("x_cusum_shift matches the driver-side argmax and conserves totals") {
    val dir = "/root/testdata/sf0.001"
    val counts = Tables.orders(spark, dir)
      .select(org.apache.spark.sql.functions.datediff(
        org.apache.spark.sql.functions.to_date($"o_orderdate"),
        org.apache.spark.sql.functions.lit("1970-01-01").cast("date")).cast("long"))
      .as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val days = counts.keys.toSeq.sorted
    val n = days.length.toLong
    val sy = counts.values.sum
    var s = 0L
    val cusum = days.map { d => s += counts(d) * n - sy; (d, s) }
    // S over the full span telescopes to zero — the scaled-CUSUM identity.
    assert(cusum.last._2 == 0L)
    val (dStar, sStar) = cusum.maxBy { case (d, v) => (math.abs(v), -d) }
    val row = Series.cusumShift(spark, dir).collect().head
    assert(row.getAs[Long]("d_star") == dStar)
    assert(row.getAs[Long]("s_scaled") == sStar)
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("before_num") + row.getAs[Long]("after_num") == sy)
    assert(row.getAs[Long]("before_den") + row.getAs[Long]("after_den") == n)
  }
}
