package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class GroupMedianSpec extends SparkSpec {
  import spark.implicits._

  test("x_group_median is the exact per-group lower median at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val byGrp = Tables.orders(spark, dir)
      .select($"o_orderpriority",
        org.apache.spark.sql.functions.round($"o_totalprice" * 100).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = Sketch.groupMedian(spark, dir).collect()
    assert(rows.map(_.getAs[String]("grp")).toSet == byGrp.keySet)
    rows.foreach { r =>
      val g = r.getAs[String]("grp")
      val sorted = byGrp(g)
      val n = sorted.length.toLong
      val k = (n + 1) / 2
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("k") == k)
      assert(r.getAs[Long]("median_cents") == sorted(k.toInt - 1), s"group $g")
      // Selection property: the in-bucket sort touched a small fraction.
      assert(r.getAs[Long]("bucket_rows") < n / 10)
    }
  }
}
