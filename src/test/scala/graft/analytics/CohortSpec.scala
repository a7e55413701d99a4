package graft.analytics

import graft.SparkSpec

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_cohort_retention: every cohort has its offset-0 base at permille 1000") {
    val rows = Cohort.cohortRetention(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val cohorts = rows.map(_._1).distinct
    val base = rows.filter(_._2 == 0L)
    assert(base.map(_._1).toSet == cohorts.toSet) // offset 0 present per cohort
    assert(base.forall(_._4 == 1000L))            // self-retention = 1000‰
  }

  test("x_cohort_retention matches a driver-side recomputation") {
    val rows = Cohort.cohortRetention(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val uw = graft.io.Tables.events(spark, dir)
      .selectExpr("user_id", s"unix_micros(cast(ts as timestamp)) div ${Cohort.WeekMicros}L as wk")
      .as[(Long, Long)].collect().toSet
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val act = uw.toSeq.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, v) => k -> v.size.toLong }
    val expected = act.map { case ((cw, off), n) =>
      (cw, off, n, n * 1000 / act((cw, 0L)))
    }.toSet
    assert(rows == expected)
  }

  test("retained users never exceed the cohort base") {
    val rows = Cohort.cohortRetention(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long)].collect()
    val n0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    assert(rows.forall(r => r._3 <= n0(r._1)))
  }
}
