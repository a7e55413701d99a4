package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def medianInterp(xs: Array[Double]): Double = {
    val s = xs.sorted
    val pos = (s.length - 1) * 0.5
    val lo = pos.toInt
    if (lo + 1 < s.length) s(lo) + (s(lo + 1) - s(lo)) * (pos - lo) else s(lo)
  }

  test("x_anomaly_mad matches a driver-side exact recomputation") {
    val vals = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = vals.map { case (t, xs) =>
      val med = medianInterp(xs)
      val devs = xs.map(v => math.abs(v - med))
      val mad = medianInterp(devs)
      (t, xs.length.toLong, med, mad, devs.count(_ > 3.0 * mad).toLong)
    }.toSet
    val got = Anomaly.anomalyMad(spark, dir)
      .as[(String, Long, Double, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("anomaly counts are a strict minority per type") {
    val rows = Anomaly.anomalyMad(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    // MAD flags at most half the rows by construction (median splits them)
    assert(rows.forall(r => r._5 * 2 <= r._2))
  }
}
