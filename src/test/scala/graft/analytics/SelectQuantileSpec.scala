package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class SelectQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def check(dir: String): Unit = {
    val cents = Tables.orders(spark, dir)
      .select(org.apache.spark.sql.functions.round($"o_totalprice" * 100).cast("long"))
      .as[Long].collect().sorted
    val n = cents.length.toLong
    val k = (n + 1) / 2
    val row = Sketch.selectQuantile(spark, dir).collect().head
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("k") == k)
    // The whole point: three bounded passes land on the EXACT kth order
    // statistic of the full multiset.
    assert(row.getAs[Long]("median_cents") == cents(k.toInt - 1))
    // And the sorted fraction is bucket-sized, not corpus-sized.
    assert(row.getAs[Long]("bucket_rows") < n / 10)
  }

  test("x_select_quantile is the exact lower median at sf0.001") {
    check("/root/testdata/sf0.001")
  }

  test("x_select_quantile is the exact lower median at sf0.01") {
    check("/root/testdata/sf0.01")
  }
}
