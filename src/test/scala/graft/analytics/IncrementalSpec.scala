package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec

/** The incremental-refresh fold must equal the direct aggregate on inputs
  * that exercise every merge law separately: counts ADD across slices
  * (not count-of-counts), sums add including negatives, min comes from an
  * EARLY slice while max comes from a LATE one for the same user, and a
  * user absent from intermediate slices survives the fold unchanged.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(uid: Long, t: String, v: Double) =
    (uid, Timestamp.valueOf(t), v)

  test("month-delta fold equals the direct aggregate under cross-slice mins, gaps, and negatives") {
    val events = Seq(
      // user 1: present in all three months; min_day in month 1, max in month 3
      ev(1L, "2024-01-05 10:00:00", 10.25),
      ev(1L, "2024-02-10 10:00:00", -3.75),
      ev(1L, "2024-03-20 10:00:00", 1.00),
      // user 2: only the FIRST month — state must ride untouched through
      // two merges it takes no part in
      ev(2L, "2024-01-07 09:00:00", 5.50),
      ev(2L, "2024-01-08 09:00:00", 4.50),
      // user 3: only the LAST month — enters the fold late
      ev(3L, "2024-03-01 00:00:00", 7.00))
      .toDF("user_id", "ts", "value")

    val got = Incremental.incrAggOver(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    def day(d: String): Long = java.time.LocalDate.parse(d).toEpochDay
    assert(got == Seq(
      (1L, 3L, 750L, day("2024-01-05"), day("2024-03-20")),
      (2L, 2L, 1000L, day("2024-01-07"), day("2024-01-08")),
      (3L, 1L, 700L, day("2024-03-01"), day("2024-03-01"))))

    // and the fold is slice-count invariant: same result directly
    val direct = events
      .selectExpr("user_id",
        "cast(round(value * 100) as long) AS cents",
        "cast(datediff(to_date(ts), date '1970-01-01') as long) AS day")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum($"cents").as("sum_cents"),
        org.apache.spark.sql.functions.min($"day").as("min_day"),
        org.apache.spark.sql.functions.max($"day").as("max_day"))
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == direct)
  }

  test("fold equals direct aggregate on generated histories (random users, months, signed 2-decimal values)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic manual sampling — the scalatest↔scalacheck bridge is
    // not in the offline cache (same pattern as graft.PropertySpec)
    def samples[A](gen: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(97L + i)))
    val eventGen: Gen[List[(Long, Int, Int, Long)]] = Gen.listOfN(60,
      for {
        uid <- Gen.chooseNum(1L, 8L)           // few users → heavy overlap
        month <- Gen.chooseNum(0, 11)          // spread across 12 slices
        dayOfM <- Gen.chooseNum(1, 28)
        centsV <- Gen.chooseNum(-99999L, 99999L) // signed 2-decimal values
      } yield (uid, month, dayOfM, centsV))
    samples(eventGen, 5).foreach { rows =>
      val events = rows.map { case (uid, m, d, cents) =>
        (uid, Timestamp.valueOf(f"2024-${m + 1}%02d-$d%02d 12:00:00"),
          cents / 100.0)
      }.toDF("user_id", "ts", "value")
      val folded = Incremental.incrAggOver(events)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val direct = rows
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (uid, rs) =>
          val days = rs.map { case (_, m, d, _) =>
            java.time.LocalDate.of(2024, m + 1, d).toEpochDay }
          (uid, rs.size.toLong, rs.map(_._4).sum, days.min, days.max)
        }
      assert(folded == direct)
    }
  }

  test("NULL timestamps fold as their own slice instead of being dropped") {
    val events = Seq(
      ev(1L, "2024-01-05 10:00:00", 10.00),
      (1L, null.asInstanceOf[Timestamp], 2.50),   // null ts, known user
      (9L, null.asInstanceOf[Timestamp], 7.00))   // user with ONLY null ts
      .toDF("user_id", "ts", "value")
    val got = Incremental.incrAggOver(events)
      .selectExpr("user_id", "n_events", "sum_cents", "min_day", "max_day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    val d = java.time.LocalDate.parse("2024-01-05").toEpochDay
    // the oracle's count(*) counts NULL-ts rows; sum/min/max skip NULLs
    assert(got == Seq(
      (1L, 2L, 1250L, Some(d), Some(d)),
      (9L, 1L, 700L, None, None)))
  }

  test("the per-round state merge plans with zero shuffle exchanges") {
    // The co-partitioned full-outer merge is load-bearing: the
    // checkpointed state carries hash(user_id) across the lineage cut
    // (Bridge.repairCheckpointLayout) and the delta lands on the same key
    // from its own aggregate, so the ONLY exchange per round is the delta
    // aggregate's. A lost layout still executes, just re-shuffling the
    // state every round — the silent class this pin exists for. The final
    // fold's plan contains the last round's merge join + the last delta
    // aggregate (everything earlier is behind checkpoints): exactly ONE
    // exchange, no exchange between the join and either input's
    // materialized side.
    val events = Seq(
      ev(1L, "2024-01-05 10:00:00", 1.0),
      ev(2L, "2024-02-05 10:00:00", 2.0),
      ev(1L, "2024-03-05 10:00:00", 3.0))
      .toDF("user_id", "ts", "value")
    val df = Incremental.incrAggOver(events)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1,
      s"state merge re-introduced an exchange ($exchanges in plan):\n$plan")
  }

  test("empty history yields an empty summary with the declared schema, not a throw") {
    val none = Seq.empty[(Long, Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    val out = Incremental.incrAggOver(none)
    assert(out.columns.toSeq ==
      Seq("user_id", "n_events", "sum_cents", "min_day", "max_day"))
    assert(out.count() == 0)
  }
}
