package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class BitmapSpec extends SparkSpec {
  import spark.implicits._

  test("x_bitmap_overlap popcounts equal exact distinct-set arithmetic") {
    val dir = "/root/testdata/sf0.001"
    val members = Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_custkey").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val segs = members.keys.toSeq.sorted
    val expected = (for {
      i <- segs.indices; j <- (i + 1) until segs.length
      a = segs(i); b = segs(j)
      ov = (members(a) intersect members(b)).size.toLong
      na = members(a).size.toLong; nb = members(b).size.toLong
    } yield (a, b, na, nb, ov, ov * 1000 / (na + nb - ov))).toSet
    val got = Bitmap.bitmapOverlap(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("overlaps are non-vacuous and bounded by segment sizes at sf0.01") {
    val rows = Bitmap.bitmapOverlap(spark, "/root/testdata/sf0.01")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.length == 10) // C(5,2) priority pairs
    rows.foreach { case (_, _, na, nb, ov, jac) =>
      assert(ov > 0 && ov <= math.min(na, nb))
      assert(jac >= 0 && jac <= 1000)
    }
  }
}
