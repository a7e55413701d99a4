package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Jdbc
import graft.util.Det

/** Streaming materialized-view refresh — the production composition of
  * round 8's two pieces: [[graft.analytics.Incremental]]'s month-delta
  * fold discipline (each refresh merges a delta's PARTIAL aggregate into
  * the summary; counts/sums add, mins/maxes compare) re-expressed as a
  * `foreachBatch` sink through [[Jdbc.writeBatchIdempotent]] (each
  * micro-batch's write converges under replay).
  *
  * The replay-safety design point: a summary row is read-modify-write
  * state, so merging a redelivered micro-batch INTO it twice would
  * double-count — the idempotent-append contract alone cannot protect an
  * in-place merge. Instead each micro-batch appends its per-user PARTIAL
  * aggregate to a (user, batch)-keyed LEDGER table via the batch_id-keyed
  * delete-then-append, which IS append-shaped and therefore exactly-once
  * in row terms; the summary is the commutative-monoid fold over the
  * ledger. Replay of batch k deletes and rewrites exactly batch k's
  * partials; the fold is insensitive to both the replay and the batching.
  *
  * Scale shape: the ledger holds one row per (user, batch) — the delta
  * aggregate's output, orders of magnitude smaller than the event stream
  * — and the fold is one hash aggregate over it, prunable by batch_id
  * watermark if the summary is itself maintained incrementally. CDC in,
  * idempotent partials out, provable parity with the one-shot aggregate:
  * the MV-refresh shape a warehouse runs (reference analogue: the daily
  * KPIs Postgres sink, kafka_stream.pyc @ 62-91, upgraded from
  * at-least-once appends to exactly-once-in-row-terms maintenance).
  */
object IncrMv {

  /** One micro-batch's per-user PARTIAL aggregate (the monoid elements:
    * count, cents sum, day min/max) — the same projection discipline as
    * [[graft.analytics.Incremental.incrAggOver]], so NULL/unparseable ts
    * rows count into `n_events` with NULL day falling out of min/max on
    * both the partial and the fold.
    */
  def deltaAgg(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(
        $"user_id",
        Det.cents($"value").as("cents"),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"cents").as("sum_cents"),
        min($"day").as("min_day"),
        max($"day").as("max_day"))
  }

  /** The `foreachBatch` handler: aggregate the micro-batch's delta and
    * land it on the JDBC ledger exactly-once-in-row-terms. Pass directly:
    * `events.writeStream.foreachBatch(IncrMv.foldBatch(url, tbl, u, p, d) _)`.
    */
  def foldBatch(
      url: String,
      table: String,
      user: String,
      password: String,
      driver: String)(batch: DataFrame, batchId: Long): Unit =
    Jdbc.writeBatchIdempotent(deltaAgg(batch), batchId, url, table,
      user = user, password = password, driver = driver)

  /** The summary view: the monoid fold over the partials ledger — lands on
    * the identical per-user summary as the one-shot aggregate over all
    * events (the parity [[graft.analytics.Incremental]] hash-gates for the
    * batch fold, here proven for the streamed one under uneven batching
    * and replay by IncrMvParitySpec).
    */
  def summaryFromLedger(ledger: DataFrame): DataFrame = {
    val spark = ledger.sparkSession
    import spark.implicits._
    ledger.groupBy($"user_id")
      .agg(sum($"n_events").as("n_events"),
        sum($"sum_cents").as("sum_cents"),
        min($"min_day").as("min_day"),
        max($"max_day").as("max_day"))
      .orderBy($"user_id")
  }
}
