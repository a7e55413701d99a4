package graft.dq

import graft.SparkSpec
import graft.io.Tables

class FdViolationSpec extends SparkSpec {
  import spark.implicits._

  test("dq_fd_violation matches a driver-side recomputation of both audits") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val expectedLi = (
      li.size.toLong,
      li.values.count(_ > 1).toLong,
      li.values.max,
      li.values.count(_ > 1).toLong * 1000000L / li.size)
    val rows = DataQuality.fdViolationQuery(spark, dir).collect()
    val liRow = rows.find(_.getAs[String]("fd") == "lineitem.l_partkey->l_suppkey").get
    assert((liRow.getAs[Long]("n_lhs"), liRow.getAs[Long]("n_violating"),
      liRow.getAs[Long]("max_fanout"), liRow.getAs[Long]("violation_ppm")) == expectedLi)
    val naRow = rows.find(_.getAs[String]("fd") == "nation.n_name->n_regionkey").get
    // The holding FD: every nation name maps to exactly one region.
    assert(naRow.getAs[Long]("n_violating") == 0L)
    assert(naRow.getAs[Long]("violation_ppm") == 0L)
    assert(naRow.getAs[Long]("max_fanout") == 1L)
  }

  test("the violated FD is non-vacuous at the gated SF") {
    val row = DataQuality.fdViolationQuery(spark, "/root/testdata/sf0.01")
      .collect().find(_.getAs[String]("fd").startsWith("lineitem")).get
    assert(row.getAs[Long]("n_violating") > 0L)
    assert(row.getAs[Long]("violation_ppm") > 0L)
  }
}
