package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches the most recent right row at or before each left ts") {
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100.0),
      (1L, t("2024-01-01 10:05:00"), 101.0),
      (1L, t("2024-01-01 10:30:00"), 105.0),
      (2L, t("2024-01-01 10:10:00"), 50.0)
    ).toDF("key", "ts", "price")
    val trades = Seq(
      (1L, t("2024-01-01 10:07:00"), "T1"),
      (1L, t("2024-01-01 10:30:00"), "T2"), // equal ts: <= matches
      (2L, t("2024-01-01 10:00:00"), "T3"), // before any quote: null
      (3L, t("2024-01-01 10:00:00"), "T4")  // unseen key: null
    ).toDF("key", "ts", "trade_id")

    val got = AsOf.asofJoin(trades, quotes, "key", "ts", Seq("price"))
      .select($"trade_id", $"asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(got == Map(
      "T1" -> Some(101.0),
      "T2" -> Some(105.0),
      "T3" -> None,
      "T4" -> None))
  }

  test("asofJoin keeps every left row exactly once") {
    val right = Seq((1L, t("2024-01-01 00:00:00"), 1.0)).toDF("key", "ts", "v")
    val left = Seq(
      (1L, t("2024-01-01 01:00:00"), "a"),
      (1L, t("2024-01-01 02:00:00"), "b"),
      (1L, t("2024-01-01 03:00:00"), "c")
    ).toDF("key", "ts", "tag")
    val out = AsOf.asofJoin(left, right, "key", "ts", Seq("v"))
    assert(out.count() == 3)
    assert(out.select($"asof_v").as[Double].collect().toSeq == Seq(1.0, 1.0, 1.0))
  }

  test("nearestView picks the closer of backward and forward matches") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val out = AsOf.nearestView(spark, dir)
      .select($"purchase_id", $"nearest_view_ts", $"dist_seconds").collect()
    assert(out.nonEmpty)
    // brute-force recheck on a sample: nearest = min |view_ts - purchase_ts|
    val e = graft.io.Tables.events(spark, dir)
    val views = e.filter($"event_type" === "view")
      .select($"user_id", unix_micros($"ts").as("vus"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("pus"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).take(200)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    purchases.foreach { case (pid, uid, pus) =>
      val vs = views.getOrElse(uid, Vector.empty[Long])
      val row = byId(pid)
      if (vs.isEmpty) assert(row.isNullAt(1), s"purchase $pid expected null")
      else {
        val best = vs.minBy(v => (math.abs(v - pus), v))
        val got = row.getTimestamp(1).getTime // ms
        val bestDist = math.abs(best - pus) / 1000000L
        assert(row.getLong(2) == bestDist, s"purchase $pid dist")
        assert(math.abs(got - best / 1000L) <= 1, s"purchase $pid ts")
      }
    }
  }
}
