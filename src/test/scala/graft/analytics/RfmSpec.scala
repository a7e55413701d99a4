package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables
import graft.util.Det

class RfmSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_rfm: segment sizes cover every customer exactly once, scores in 1..5") {
    val seg = Rfm.rfm(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val nCust = Tables.orders(spark, dir)
      .select($"o_custkey").distinct().count()
    assert(seg.map(_._4).sum == nCust)
    assert(seg.forall(r => Seq(r._1, r._2, r._3).forall(s => s >= 1 && s <= 5)))
  }

  test("x_rfm: per-metric quintiles are balanced to the rank formula") {
    // recompute the monetary quintile driver-side from the exact rank
    val m = Tables.orders(spark, dir)
      .groupBy($"o_custkey").agg(sum(Det.cents($"o_totalprice")).as("m_cents"))
      .as[(Long, Long)].collect()
      .sortBy { case (ck, mc) => (mc, ck) }
    val n = m.length
    val expected = m.zipWithIndex
      .groupBy { case (_, idx) => 1 + idx.toLong * 5 / n } // rank-1 == idx
      .map { case (s, xs) => s -> xs.length.toLong }
    val got = Rfm.rfm(spark, dir)
      .groupBy($"m_score").agg(sum($"n_customers").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("x_rfm: monetary totals per segment add up to the corpus total") {
    val seg = Rfm.rfm(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val total = Tables.orders(spark, dir)
      .agg(sum(Det.cents($"o_totalprice"))).as[Long].head()
    assert(seg.map(_._5).sum == total)
  }
}
