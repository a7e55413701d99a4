package graft.dq

import graft.SparkSpec
import graft.io.Tables

class ErasureScopeSpec extends SparkSpec {
  import spark.implicits._

  test("dq_erasure_scope matches a driver-side cohort walk") {
    val dir = "/root/testdata/sf0.001"
    def md5p2(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 2)
    val forgotten = Tables.customer(spark, dir)
      .select($"c_custkey").as[Long].collect()
      .filter(c => md5p2(c.toString) == "00").toSet
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect()
    val hitOrders = orders.filter(o => forgotten(o._2))
    val hitKeys = hitOrders.map(_._1).toSet
    val liRows = Tables.lineitem(spark, dir)
      .select($"l_orderkey").as[Long].collect().count(hitKeys)
    val row = DataQuality.erasureScopeQuery(spark, dir).collect().head
    assert(row.getAs[Long]("n_forgotten") == forgotten.size.toLong)
    assert(row.getAs[Long]("custs_with_orders") ==
      hitOrders.map(_._2).distinct.length.toLong)
    assert(row.getAs[Long]("orders_rows") == hitOrders.length.toLong)
    assert(row.getAs[Long]("lineitem_rows") == liRows.toLong)
  }

  test("the deletion cohort is non-empty and referenced at sf0.01") {
    val row = DataQuality.erasureScopeQuery(spark, "/root/testdata/sf0.01")
      .collect().head
    assert(row.getAs[Long]("n_forgotten") > 0)
    assert(row.getAs[Long]("orders_rows") > 0)
    assert(row.getAs[Long]("lineitem_rows") > 0)
  }
}
