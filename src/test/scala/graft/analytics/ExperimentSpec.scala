package graft.analytics

import java.security.MessageDigest

import graft.SparkSpec
import graft.io.Tables

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def arm(uid: Long): String = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$uid:ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(15), 16) % 2 == 0) "control" else "treatment"
  }

  test("x_abtest matches a driver-side split and both arms are populated") {
    val users = Tables.events(spark, dir)
      .selectExpr("user_id", "event_type",
        "cast(round(value * 100) as long) as cents")
      .as[(Long, String, Option[Long])].collect()
      .groupBy(_._1).map { case (u, es) =>
        val purchases = es.filter(_._2 == "purchase")
        (arm(u), if (purchases.nonEmpty) 1L else 0L,
          purchases.flatMap(_._3).sum)
      }.toSeq
    val expected = users.groupBy(_._1).map { case (a, xs) =>
      val n = xs.length.toLong
      val conv = xs.map(_._2).sum
      val rev = xs.map(_._3).sum
      (a, n, conv, conv * 1000000 / n, rev / n)
    }.toSet
    val got = Experiment.abtest(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.map(_._1) == Set("control", "treatment"))
  }

  test("x_weighted_median matches the driver-side crossing rule and differs from naive") {
    val li = Tables.lineitem(spark, dir)
      .selectExpr("cast(round(l_extendedprice * 100) as long) as p",
        "cast(l_quantity as long) as w", "l_orderkey", "l_linenumber")
      .as[(Long, Long, Long, Long)].collect()
    val sorted = li.sortBy(r => (r._1, r._3, r._4))
    val total = li.map(_._2).sum
    var cum = 0L
    val crossing = sorted.find { r => cum += r._2; cum * 2 >= total }.get._1
    val got = Experiment.weightedMedian(spark, dir).as[(Long, Long)].head()
    assert(got == ((crossing, total)))
    // weighting must matter on this fixture: the unweighted median differs
    val prices = sorted.map(_._1)
    val unweighted = prices(prices.length / 2)
    assert(crossing != unweighted)
  }
}
