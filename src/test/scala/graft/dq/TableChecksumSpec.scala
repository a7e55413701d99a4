package graft.dq

import java.security.MessageDigest

import graft.SparkSpec
import graft.io.Tables

class TableChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def fp(parts: Seq[String]): Long = {
    val h = MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 15), 16)
  }

  test("dq_table_checksum matches a driver-side XOR-fold recomputation") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        org.apache.spark.sql.functions.round($"o_totalprice" * 100).cast("long"),
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date($"o_orderdate"),
          org.apache.spark.sql.functions.lit("1970-01-01").cast("date")).cast("long"),
        $"o_orderpriority")
      .as[(Long, Long, String, Long, Long, String)].collect()
    val expected = rows.groupBy(_._5).view.mapValues { g =>
      (g.length.toLong,
        g.map(r => fp(Seq(r._1.toString, r._2.toString, r._3, r._4.toString, r._6)))
          .foldLeft(0L)(_ ^ _))
    }.toMap
    val got = DataQuality.tableChecksumQuery(spark, dir).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("checksum"))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("a single-row difference flips exactly that day's checksum") {
    val dir = "/root/testdata/sf0.001"
    val base = DataQuality.tableChecksumQuery(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("checksum")).toMap
    // Simulate the replica diverging by one row: recompute the fold with one
    // fingerprint removed (XOR's self-inverse makes removal a re-XOR).
    val day = base.keys.min
    val oneRow = Tables.orders(spark, dir)
      .filter(org.apache.spark.sql.functions.datediff(
        org.apache.spark.sql.functions.to_date($"o_orderdate"),
        org.apache.spark.sql.functions.lit("1970-01-01").cast("date")).cast("long") === day)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        org.apache.spark.sql.functions.round($"o_totalprice" * 100).cast("long"),
        $"o_orderpriority")
      .as[(Long, Long, String, Long, String)].head()
    val removed = base(day) ^ fp(Seq(oneRow._1.toString, oneRow._2.toString,
      oneRow._3, oneRow._4.toString, oneRow._5))
    assert(removed != base(day))
  }
}
