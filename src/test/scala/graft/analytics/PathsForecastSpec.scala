package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class PathsForecastSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_session_paths matches a driver-side session walk") {
    val e = Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as tus")
      .as[(Long, Long, String, Long)].collect()
    val paths = e.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(x => (x._4, x._1))
      // gap sessionization
      val sessions = s.foldLeft(List.empty[List[(Long, Long, String, Long)]]) {
        case (acc, ev) if acc.nonEmpty &&
          ev._4 - acc.head.head._4 <= Sessions.GapMicros =>
          (ev :: acc.head) :: acc.tail
        case (acc, ev) => List(ev) :: acc
      }.map(_.reverse)
      sessions.map(_.take(Paths.PathSteps).map(_._3).mkString(">"))
    }
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(Paths.TopPaths).toSet
    val got = Paths.sessionPaths(spark, dir).as[(String, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("x_forecast_naive matches a driver-side backtest") {
    val wk = Tables.events(spark, dir)
      .selectExpr("event_type",
        s"unix_micros(cast(ts as timestamp)) div ${Cohort.WeekMicros}L as wk")
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = wk.keys.toSeq.flatMap { case (t, w) =>
      wk.get((t, w - 1)).map(prev => (t, math.abs(wk((t, w)) - prev)))
    }.groupBy(_._1).map { case (t, errs) =>
      val n = errs.length.toLong
      val s = errs.map(_._2).sum
      (t, n, s, s * 1000 / n)
    }.toSet
    val got = Forecast.forecastNaive(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
