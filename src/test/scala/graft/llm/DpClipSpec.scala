package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DpClipSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("max_user_contrib respects the K*C sensitivity ceiling on every day") {
    val rows = Privacy.dpClip(spark, dir)
      .select($"max_user_contrib", $"n_events_kept", $"n_events_raw",
        $"sum_bounded_cents", $"sum_raw_cents")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ceiling = Privacy.DpMaxPerDay * Privacy.DpClipCents
    assert(rows.forall(_._1 <= ceiling))
    assert(rows.forall(r => r._2 <= r._3))
    assert(rows.forall(r => r._4 <= math.max(r._5, ceiling * r._3)))
  }

  test("both bounds fire on the fixture: cap and clip are load-bearing") {
    val ev = graft.io.Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").cast("string"),
        round($"value" * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    // some user-day exceeds the per-day cap ...
    val maxPerDay = ev.groupBy(t => (t._1, t._2)).values.map(_.size).max
    assert(maxPerDay > Privacy.DpMaxPerDay,
      s"fixture max events/user-day $maxPerDay never exceeds the cap")
    // ... and some event value exceeds the clip
    assert(ev.exists(_._3 > Privacy.DpClipCents))
    // so the bounded totals are STRICTLY below raw somewhere
    val got = Privacy.dpClip(spark, dir)
      .agg(sum($"n_events_kept"), sum($"n_events_raw"),
        sum($"sum_bounded_cents"), sum($"sum_raw_cents"))
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 < got._2)
    assert(got._3 < got._4)
  }

  test("per-day bounded sum equals an independent driver recompute") {
    // Independent model: md5-order the events per user-day, keep first K,
    // clip, sum per day.
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ev = graft.io.Tables.events(spark, dir)
      .select($"event_id", $"user_id", to_date($"ts").cast("string"),
        round($"value" * 100).cast("long"))
      .as[(Long, Long, String, Long)].collect()
    val bounded = ev.groupBy(t => (t._2, t._3)).toSeq.flatMap { case ((_, d), es) =>
      es.sortBy(e => (h(s"${e._1}:dp"), e._1)).take(Privacy.DpMaxPerDay)
        .map(e => d -> math.max(0L, math.min(e._4, Privacy.DpClipCents)))
    }
    val expected = bounded.groupBy(_._1).map { case (d, vs) =>
      d -> vs.map(_._2).sum
    }
    val got = Privacy.dpClip(spark, dir)
      .select($"day".cast("string"), $"sum_bounded_cents")
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }
}
