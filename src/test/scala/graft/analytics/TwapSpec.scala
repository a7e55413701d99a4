package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class TwapSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_twap matches a driver-side step-function recomputation") {
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .selectExpr("event_id", "user_id",
        "cast(round(value * 100) as long) as cents",
        "unix_micros(cast(ts as timestamp)) as tus")
      .as[(Long, Long, Long, Long)].collect()
    val expected = e.groupBy(_._2).flatMap { case (uid, es) =>
      val s = es.sortBy(x => (x._4, x._1))
      val ivs = s.zip(s.tail).map { case (a, b) => (a._3, (b._4 - a._4) / 1000000L) }
      val dur = ivs.map(_._2).sum
      if (ivs.isEmpty || dur <= 0) None
      else Some((uid, ivs.length.toLong, dur, ivs.map(i => i._1 * i._2).sum / dur))
    }.toSet
    val got = Twap.twap(spark, dir).as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("twap lies within the per-user value envelope") {
    val rows = Twap.twap(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long)].collect()
    val bounds = Tables.events(spark, "/root/testdata/sf0.01")
      .filter($"value".isNotNull)
      .selectExpr("user_id", "cast(round(value * 100) as long) as c")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (u, xs) => u -> (xs.map(_._2).min, xs.map(_._2).max) }
    // floor-div can undershoot the min by at most 1
    assert(rows.forall(r => r._4 >= bounds(r._1)._1 - 1 && r._4 <= bounds(r._1)._2))
  }
}
