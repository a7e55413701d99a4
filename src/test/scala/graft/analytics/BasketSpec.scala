package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class BasketSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_basket_pairs matches a naive self-join recomputation") {
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairCount = byOrder.values.toSeq
      .flatMap(ps => ps.toSeq.sorted.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= Basket.MinSupport)
    val itemCount = li.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nOrders = byOrder.size.toLong
    val expected = pairCount.toSeq.map { case ((a, b), np) =>
      (a, b, np, np * 1000000L / itemCount(a),
        np * nOrders * 1000000L / (itemCount(a) * itemCount(b)))
    }.sortBy { case (a, b, np, _, _) => (-np, a, b) }.take(Basket.TopPairs).toSet
    val got = Basket.basketPairs(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("pairs are canonical (a < b) and support-bounded") {
    val rows = Basket.basketPairs(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= Basket.TopPairs)
    assert(rows.forall(r => r._1 < r._2))
    assert(rows.forall(_._3 >= Basket.MinSupport))
    // confidence can never exceed 10⁶ ppm
    assert(rows.forall(_._4 <= 1000000L))
  }
}
