package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class CardEstSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_join_card_est: 'actual' equals the materialized join count") {
    val rows = Tables.orders(spark, dir).select($"o_custkey")
      .join(Tables.events(spark, dir).select($"user_id"),
        $"o_custkey" === $"user_id").count()
    val got = CardEst.joinCardEst(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("orders_events_cust")._6 == rows)
    // self-join truth: sum of squared per-day counts
    val daily = Tables.orders(spark, dir)
      .selectExpr("cast(o_orderdate as date) as d").as[java.sql.Date]
      .collect().groupBy(identity).map(_._2.size.toLong)
    assert(got("orders_self_day")._6 == daily.map(c => c * c).sum)
  }

  test("the estimator formula and error are self-consistent") {
    val rows = CardEst.joinCardEst(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val est = r._2 * r._3 / math.max(r._4, r._5)
      assert(r._7 == est)
      assert(r._8 == math.abs(r._6 - est) * 1000000L / r._6)
    }
    // the skewed/partial-overlap join must show a non-trivial error —
    // that non-uniformity is the reason the audit exists
    assert(rows.map(_._8).max > 0L)
  }
}
