package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Incremental
import graft.io.Jdbc

/** Stream/batch parity for the incremental-MV composition: events streamed
  * through uneven micro-batches into the foreachBatch → idempotent-JDBC
  * partials ledger must fold to the IDENTICAL per-user summary as the
  * batch month-fold (itself hash-gated against the one-shot aggregate) —
  * including after a micro-batch is redelivered under its original
  * batchId, the failure mode Structured Streaming actually exhibits.
  */
class IncrMvParitySpec extends SparkSpec {
  import spark.implicits._

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val u = "jdbc:derby:memory:incrmv;create=true"
  private val Table = "mv_ledger"

  // (user_id, value, ts-string | null): multi-month span, a user crossing
  // every batch boundary, a NULL timestamp, and a duplicate event payload
  private val rows = Seq(
    (1L, 10.00, Option("2024-01-05 10:00:00")),
    (2L, 3.25, Option("2024-01-20 00:30:00")),
    (1L, 2.50, Option("2024-02-01 09:00:00")),
    (3L, 7.75, Option.empty[String]), // NULL ts: counts, no day
    (2L, 3.25, Option("2024-01-20 00:30:00")), // exact duplicate payload
    (1L, 99.99, Option("2024-03-15 23:59:59")),
    (4L, 0.01, Option("2024-02-29 12:00:00")))

  private def toEvents(rs: Seq[(Long, Double, Option[String])]) =
    rs.toDF("user_id", "value", "ts_s")
      .select($"user_id", $"value", $"ts_s".cast("timestamp").as("ts"))

  test("streamed ledger folds to the batch summary under uneven batches and replay") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Option[String])]
    val events = input.toDF().toDF("user_id", "value", "ts_s")
      .select($"user_id", $"value", $"ts_s".cast("timestamp").as("ts"))
    val q = events.writeStream
      .foreachBatch(IncrMv.foldBatch(u, Table, "app", "", DerbyDriver) _)
      .start()
    try {
      // deliberately uneven: 1 row / 4 rows / 2 rows
      input.addData(rows.take(1): _*); q.processAllAvailable()
      input.addData(rows.slice(1, 5): _*); q.processAllAvailable()
      input.addData(rows.drop(5): _*); q.processAllAvailable()
    } finally q.stop()

    def ledger() = Jdbc.readPartitioned(spark, u, Table,
      user = "app", password = "",
      partitionColumn = "user_id", lowerBound = 1L, upperBound = 5L,
      numPartitions = 2, driver = DerbyDriver)
    def summary() = IncrMv.summaryFromLedger(
        ledger().drop("batch_id"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq

    val want = Incremental.incrAggOver(toEvents(rows))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    val streamed = summary()
    assert(streamed == want)

    // ledger is (user, batch)-grained partials, not raw events: the
    // 4-row batch 1 holds at most one row per user it touched
    val perBatchUsers = ledger()
      .select($"batch_id", $"user_id").as[(Long, Long)].collect().toSeq
    assert(perBatchUsers.distinct == perBatchUsers)

    // REPLAY: redeliver batch 1's exact payload under its original
    // batchId (the post-crash re-run). The keyed delete must make the
    // fold converge to the same summary, not double-count.
    IncrMv.foldBatch(u, Table, "app", "", DerbyDriver)(
      toEvents(rows.slice(1, 5)), 1L)
    assert(summary() == want)

    // and the summary equals the direct one-shot aggregate too (the
    // parity chain: streamed fold ≡ batch fold ≡ recompute-all)
    val day = datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
      .cast("long")
    val direct = toEvents(rows)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(graft.util.Det.cents($"value")).as("sum_cents"),
        min(day).as("min_day"),
        max(day).as("max_day"))
      .orderBy($"user_id")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(streamed == direct)

    // ---- COMPACTION: fold batches 0 and 1 into the base, keep batch 2 ----
    def fold() = IncrMv.foldBatch(u, Table, "app", "", DerbyDriver) _
    IncrMv.compactLedger(u, Table, "app", "", DerbyDriver, watermark = 2L)
    assert(IncrMv.ledgerWatermark(u, Table, "app", "", DerbyDriver) == 2L)
    assert(summary() == want, "fold(base + recent) must equal the one-shot")
    // ledger is now bounded: base rows (users of batches 0-1) + batch 2's
    val ids = ledger().select($"batch_id").distinct()
      .as[Long].collect().toSet
    assert(ids == Set(-2L, 2L), s"ledger batch ids after compaction: $ids")

    // pre-watermark redelivery: batch 1's payload again under id 1 — the
    // guard must make it a no-op (its content lives in the base)
    fold()(toEvents(rows.slice(1, 5)), 1L)
    assert(summary() == want, "pre-watermark replay must be a no-op")
    assert(ledger().filter($"batch_id" === 1L).count() == 0L)

    // post-watermark redelivery: batch 2 under its original id converges
    // through the ordinary keyed delete-then-append
    fold()(toEvents(rows.drop(5)), 2L)
    assert(summary() == want, "post-watermark replay must converge")

    // idempotent re-compaction at the same watermark: nothing changes
    IncrMv.compactLedger(u, Table, "app", "", DerbyDriver, watermark = 2L)
    assert(summary() == want)

    // advancing the watermark folds the old base + batch 2 into a new base
    IncrMv.compactLedger(u, Table, "app", "", DerbyDriver, watermark = 3L)
    assert(summary() == want)
    val idsAfter = ledger().select($"batch_id").distinct()
      .as[Long].collect().toSet
    assert(idsAfter == Set(-3L), s"fully compacted ledger ids: $idsAfter")
    assert(ledger().count() == 4L, "one base partial per user")

    // crash-retry after a FULL compaction: the ledger now holds ONLY the
    // base (no live batch ids), and a re-run at the same watermark must
    // converge as a no-op — the live-maximum bound must not trip over
    // max(batch_id) being negative (code-review round-10 finding)
    IncrMv.compactLedger(u, Table, "app", "", DerbyDriver, watermark = 3L)
    assert(summary() == want, "retry after full compaction must converge")
    assert(ledger().count() == 4L)

    // a watermark BELOW the current one must be rejected — folding the
    // base into a lower-stamped row would rewind the foldBatch guard and
    // double-count redeliveries of batches the base already holds
    intercept[IllegalArgumentException] {
      IncrMv.compactLedger(u, Table, "app", "", DerbyDriver, watermark = 2L)
    }

    // a watermark past anything the stream delivered must be rejected —
    // it would suppress future batches via the foldBatch guard
    intercept[IllegalArgumentException] {
      IncrMv.compactLedger(u, Table, "app", "", DerbyDriver, watermark = 9L)
    }
  }
}
