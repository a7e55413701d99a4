package graft.analytics

import graft.SparkSpec
import graft.io.Tables
import graft.util.Det

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("x_benford matches a driver-side first-digit recomputation") {
    val dir = "/root/testdata/sf0.001"
    val cents = Tables.orders(spark, dir)
      .select(Det.cents($"o_totalprice").as("c")).as[Long].collect()
      .filter(_ > 0)
    val counts = cents.groupBy(_.toString.head.asDigit.toLong)
      .view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val exp = Benford.ExpectedPermille.map { case (d, p) => d.toLong -> p }.toMap
    val expected = counts.map { case (d, n) =>
      val pm = n * 1000 / total
      (d, n, pm, exp(d), math.abs(pm - exp(d)))
    }.toSet
    val got = Benford.benford(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("digit coverage is total and permilles sum to ~1000") {
    val rows = Benford.benford(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    val pmSum = rows.map(_._3).sum
    assert(pmSum >= 1000 - 9 && pmSum <= 1000) // floor-div slack only
  }
}
