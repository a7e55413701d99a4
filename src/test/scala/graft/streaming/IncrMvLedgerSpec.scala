package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins `x_mv_fold`'s declared-plan claim: the one-pass composite
  * (user, batch) aggregate IS the union of per-batch [[IncrMv.deltaAgg]]
  * partials — frame-level equality, not just summary equality — and the
  * fold over either ledger lands on the identical summary. The oracle
  * hash gate proves fold ≡ one-shot; THIS spec proves the declared plan
  * didn't quietly stop being the ledger shape it claims to face.
  */
class IncrMvLedgerSpec extends SparkSpec {
  import spark.implicits._

  // Week-boundary cases on purpose: 2024-01-07 is a Sunday and 2024-01-08
  // a Monday (trunc('week') is Monday-based), plus a NULL ts batch, a
  // duplicate payload, and a user spanning every batch.
  private val rows = Seq(
    (1L, 10.00, Option("2024-01-05 10:00:00")),
    (1L, 1.25, Option("2024-01-07 23:59:59")), // same ISO week as above
    (1L, 2.50, Option("2024-01-08 00:00:00")), // next week, 1 tick later
    (2L, 3.25, Option("2024-01-20 00:30:00")),
    (2L, 3.25, Option("2024-01-20 00:30:00")), // duplicate payload
    (3L, 7.75, Option.empty[String]), // NULL ts: counts, no day, own batch
    (4L, 0.01, Option("2024-02-29 12:00:00")))

  private def events =
    rows.toDF("user_id", "value", "ts_s")
      .select($"user_id", $"value", $"ts_s".cast("timestamp").as("ts"))

  test("composite (user, batch) aggregate == union of per-batch deltaAgg partials") {
    val ev = events
    val withBatch = ev.withColumn("batch", trunc(to_date($"ts"), "week"))
    val batches = withBatch.select($"batch").distinct()
      .as[Option[java.sql.Date]].collect()
    assert(batches.length >= 4, s"fixture must span several batches: ${batches.toSeq}")
    // the literal ledger: one deltaAgg per batch slice, unioned
    val literal = batches.map { b =>
      IncrMv.deltaAgg(withBatch.filter($"batch" <=> lit(b.orNull)).drop("batch"))
        .withColumn("batch", lit(b.orNull).cast("date"))
    }.reduce(_ unionByName _)
    // the declared one-pass plan's ledger (mvFoldOver's internal shape)
    val composite = ev.select(
        $"user_id",
        graft.util.Det.cents($"value").as("cents"),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        trunc(to_date($"ts"), "week").as("batch"))
      .groupBy($"user_id", $"batch")
      .agg(count(lit(1)).as("n_events"),
        sum($"cents").as("sum_cents"),
        min($"day").as("min_day"),
        max($"day").as("max_day"))
      .select(literal.columns.map(col).toSeq: _*)
    assert(composite.exceptAll(literal).isEmpty
      && literal.exceptAll(composite).isEmpty,
      "one-pass composite ledger must equal the per-batch deltaAgg union")
  }

  test("mvFoldOver == the one-shot aggregate (the oracle claim, spec-local)") {
    val direct = events.select(
        $"user_id",
        graft.util.Det.cents($"value").as("cents"),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"cents").as("sum_cents"),
        min($"day").as("min_day"),
        max($"day").as("max_day"))
      .orderBy($"user_id")
    val folded = IncrMv.mvFoldOver(events)
    assert(folded.collect().toSeq == direct.collect().toSeq)
    // NULL-ts user folds with a counted event and NULL day bounds
    val u3 = folded.filter($"user_id" === 3L).collect().head
    assert(u3.getLong(1) == 1L && u3.isNullAt(3) && u3.isNullAt(4))
  }
}
