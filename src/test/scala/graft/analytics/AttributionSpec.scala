package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_attribution matches a driver-side last-touch recomputation") {
    val e = Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as tus")
      .as[(Long, Long, String, Long)].collect()
    val conv = e.filter(_._3 == Attribution.ConversionType)
    val byUser = e.filter(r => Attribution.TouchTypes.contains(r._3))
      .groupBy(_._2).view.mapValues(_.toSeq).toMap
    val credits = conv.map { case (cid, uid, _, ct) =>
      val cands = byUser.getOrElse(uid, Seq.empty)
        .filter(t => t._4 < ct && t._4 >= ct - Attribution.WindowMicros)
      if (cands.isEmpty) ("(none)", 0L)
      else {
        val best = cands.maxBy(t => (t._4, t._1))
        (best._3, ct - best._4)
      }
    }
    val expected = credits.groupBy(_._1).map { case (t, xs) =>
      val n = xs.length.toLong
      val avg = if (t == "(none)") None else Some(xs.map(_._2).sum / n)
      (t, n, avg)
    }.toSet
    val got = Attribution.attribution(spark, dir)
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got == expected)
  }

  test("conversion credit is total: attributed + (none) = all conversions") {
    val rows = Attribution.attribution(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Option[Long])].collect()
    val nConv = Tables.events(spark, "/root/testdata/sf0.01")
      .filter($"event_type" === Attribution.ConversionType).count()
    assert(rows.map(_._2).sum == nConv)
    assert(rows.exists(r => r._1 != "(none)" && r._2 > 0)) // non-vacuous
  }
}
