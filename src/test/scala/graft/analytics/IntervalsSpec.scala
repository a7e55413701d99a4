package graft.analytics

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def cohortIntervals(): Seq[(Long, LocalDate, Long, Long)] =
    graft.io.Tables.events(spark, dir)
      .filter(pmod($"user_id", lit(Intervals.CohortMod)) === 0)
      .select($"user_id", to_date($"ts"),
        unix_micros($"ts".cast("timestamp")))
      .as[(Long, java.sql.Date, Long)].collect().toSeq
      .groupBy(t => (t._1, t._2.toLocalDate))
      .map { case ((u, d), es) =>
        (u, d, es.map(_._3).min, es.map(_._3).max)
      }.toSeq.filter(t => t._3 < t._4)

  test("x_interval_join equals the brute-force quadratic overlap join") {
    val iv = cohortIntervals()
    val pairs = for {
      a <- iv; b <- iv
      if a._2 == b._2 && a._1 < b._1 && a._3 < b._4 && b._3 < a._4
    } yield ((a._1, b._1),
      (math.min(a._4, b._4) - math.max(a._3, b._3)) / 1000000L)
    val expected = pairs.groupBy(_._1).toSeq
      .map { case ((lo, hi), os) => (lo, hi, os.size.toLong, os.map(_._2).sum) }
      .sortBy { case (lo, hi, _, ov) => (-ov, lo, hi) }
      .take(Intervals.TopPairs)
    val got = Intervals.intervalJoin(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("the bucket decomposition is load-bearing on the fixture") {
    val iv = cohortIntervals()
    // some interval spans more than one hour bucket (explode needed) ...
    assert(iv.exists(t => t._4 / Intervals.HourMicros != t._3 / Intervals.HourMicros))
    // ... and some overlapping pair starts in different hour buckets, so
    // the exactly-once attribution filter rejects real duplicate buckets.
    val crossBucket = for {
      a <- iv; b <- iv
      if a._2 == b._2 && a._1 < b._1 && a._3 < b._4 && b._3 < a._4
      if a._3 / Intervals.HourMicros != b._3 / Intervals.HourMicros
    } yield 1
    assert(crossBucket.nonEmpty)
  }
}
