package graft.analytics

import graft.SparkSpec
import graft.io.Tables

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private case class Row7(user: Long, run: Long, tpe: String, from: Long,
    to: Option[Long], n: Long, current: Boolean)

  private def history(): Array[(Long, Long, String, Long, Option[Long], Long, Boolean)] =
    Scd.scd2Build(spark, dir)
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)].collect()

  test("x_scd2_build tiles each user's timeline with half-open intervals") {
    val rows = history().groupBy(_._1)
    rows.foreach { case (_, hs) =>
      val sorted = hs.sortBy(_._2)
      // runs are numbered 1..n and consecutive intervals chain exactly
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4)) // valid_to == next valid_from
          assert(a._3 != b._3)        // a run BOUNDARY means the type changed
        case _ =>
      }
      assert(sorted.init.forall(!_._7) && sorted.last._7) // exactly one current
      assert(sorted.last._5.isEmpty)
    }
  }

  test("x_scd2_build conserves events and matches a driver-side rebuild") {
    val rows = history()
    val events = Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as tus")
      .as[(Long, Long, String, Long)].collect()
    assert(rows.map(_._6).sum == events.length.toLong)
    // rebuild run structure per user
    val expected = events.groupBy(_._2).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._4, e._1))
      val runs = sorted.foldLeft(List.empty[List[(Long, Long, String, Long)]]) {
        case (acc, e) if acc.nonEmpty && acc.head.head._3 == e._3 =>
          (e :: acc.head) :: acc.tail
        case (acc, e) => List(e) :: acc
      }.reverse.map(_.reverse)
      runs.zipWithIndex.map { case (r, i) =>
        (uid, (i + 1).toLong, r.head._3, r.map(_._4).min, r.length.toLong)
      }
    }.toSet
    assert(rows.map(r => (r._1, r._2, r._3, r._4, r._6)).toSet == expected)
  }

  test("x_pit_join resolves each purchase to the state 1µs before it") {
    val out = Scd.pitJoin(spark, dir)
      .as[(String, Long, Long)].collect().toList
    // total credit: every purchase lands in exactly one prior-state bucket
    val nPurch = Tables.events(spark, dir)
      .filter($"event_type" === "purchase").count()
    assert(out.map(_._2).sum == nPurch)
    assert(out.map(_._1).distinct.size == out.size) // one row per state
    // driver-side PIT replay against the same history
    val hist = history()
    val purchases = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) - 1 as t")
      .as[(Long, Long)].collect()
    val expected = purchases.map { case (uid, t) =>
      hist.filter(h => h._1 == uid && h._4 <= t && h._5.forall(t < _))
        .map(_._3).headOption.getOrElse("(none)")
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.map(r => r._1 -> r._2).toMap == expected)
    // a purchase opening its own run must NOT resolve to itself: every
    // (none) row is a user's literal first event
    val firstEvents = hist.filter(_._2 == 1L).map(h => (h._1, h._4)).toSet
    val nones = purchases.filter { case (uid, t) =>
      !hist.exists(h => h._1 == uid && h._4 <= t && h._5.forall(t < _))
    }
    nones.foreach { case (uid, t) => assert(firstEvents.contains((uid, t + 1))) }
  }
}
