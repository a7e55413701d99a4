package graft.analytics

import graft.SparkSpec

/** x_winsorize's round-14 domain-aggregate rewrite must reproduce the
  * original per-row rank formulation exactly. The model below IS that
  * original rule: row_number over (c, id), fences at ranks
  * floor((n*5+99)/100) / floor((n*95+99)/100), clamp + fence-hit counts.
  */
class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  private def model(
      rows: Seq[(String, Long)]): Seq[(String, Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length.toLong
      val lo = sorted(((n * 5 + 99) / 100).toInt - 1)
      val hi = sorted(((n * 95 + 99) / 100).toInt - 1)
      (g, n, lo, hi,
        sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong,
        sorted.map(c => math.min(math.max(c, lo), hi)).sum)
    }

  private def got(
      rows: Seq[(String, Long)]): Seq[(String, Long, Long, Long, Long, Long, Long)] =
    Warehouse.winsorizeOver(rows.toDF("event_type", "c"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("domain-aggregate fences match the rank model on tie and tiny-group shapes") {
    val shapes: Seq[(String, Seq[(String, Long)])] = Seq(
      "single row" -> Seq(("a", 5L)),
      "two rows" -> Seq(("a", 5L), ("a", 9L)),
      "all equal" -> Seq.fill(40)(("a", 7L)),
      "tie block at the low fence" ->
        (Seq.fill(10)(("a", 1L)) ++ Seq.tabulate(90)(i => ("a", (i + 10).toLong))),
      "tie block at the high fence" ->
        (Seq.tabulate(90)(i => ("a", i.toLong)) ++ Seq.fill(10)(("a", 200L))),
      "tiny groups under the 5% granularity" ->
        Seq.tabulate(19)(i => ("a", i.toLong)),
      "several groups, different sizes" ->
        (Seq.tabulate(100)(i => ("a", (i % 13).toLong)) ++
          Seq.tabulate(7)(i => ("b", (100 - i).toLong)) ++
          Seq(("c", 0L))))
    shapes.foreach { case (label, rows) =>
      assert(got(rows) == model(rows), s"shape: $label")
    }
  }

  test("domain-aggregate winsorize is partitioning-invariant on a mixed frame") {
    val rows = Seq.tabulate(2000)(i =>
      (s"t${i % 5}", ((i * 131) % 401).toLong))
    val expected = model(rows)
    Seq(1, 4, 32).foreach { p =>
      val df = rows.toDF("event_type", "c").repartition(p)
      assert(Warehouse.winsorizeOver(df)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
        == expected, s"partitions: $p")
    }
  }
}
