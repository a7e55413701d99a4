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
}
