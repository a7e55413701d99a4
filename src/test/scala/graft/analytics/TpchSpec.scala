package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class TpchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_tpch_q18 equals an independent window formulation") {
    val out = Tpch.tpchQ18(spark, dir)
      .select($"o_orderkey", $"total_qty").as[(Long, Long)].collect().toList
    // independent route: join first, aggregate once, filter + sort after
    val expected = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_totalprice", $"o_orderdate")
      .agg(sum($"l_quantity".cast("long")).as("tq"))
      .filter($"tq" > Tpch.Q18MinQty)
      .orderBy($"o_totalprice".desc, to_date($"o_orderdate"), $"o_orderkey")
      .limit(100)
      .select($"o_orderkey", $"tq").as[(Long, Long)].collect().toList
    assert(out == expected)
    assert(out.forall(_._2 > Tpch.Q18MinQty))
  }

  test("q_tpch_q14 promo share is a valid ratio and months are complete") {
    val rows = Tpch.tpchQ14(spark, dir)
      .select($"ym", $"promo_share").as[(String, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ym, share) =>
      assert(share >= 0.0 && share <= 1.0, s"$ym: $share")
    }
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("q_tpch_q3 emits at most 10 orders in descending revenue order") {
    val rev = Tpch.tpchQ3(spark, dir)
      .select($"revenue_ucents").as[Long].collect().toList
    assert(rev.length <= 10 && rev == rev.sorted.reverse)
  }
}
