package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.util.Det

/** Structured-Streaming operators — the streaming face of the session
  * analytics family (SURVEY.md §2.2 streaming row). The reference's
  * "streaming" is a throttled batch producer plus a batch Spark job
  * (kafka_stream.pyc @ 58-95); watermarks, event-time windows and session
  * windows are NEW capability, declared as such (never parity).
  *
  * Scale notes: session_window state is partitioned by (user_id); the
  * watermark bounds state size — without it a 100 TB stream accumulates
  * unbounded session state. foreachBatch sinks write ds-partitioned parquet
  * so downstream batch queries partition-prune.
  */
object Streaming {

  /** JSON value stream (e.g. Kafka `value`) → typed columns (from_json). */
  def parseJson(raw: DataFrame, schema: StructType, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol), schema).as("r")).select("r.*")

  /** Event-time tumbling-window counts per event type with late-data bound. */
  def tumblingCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n_events"))

  /** Gap-based sessionization, streaming form: built-in session_window
    * (Spark ≥3.2) — the stateful analogue of Sessions.sessionized.
    */
  def sessionStats(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.decSum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserSessionState(
      nEvents: Long, totalCents: Long, lastTsMs: Long, nSessions: Long)
  final case class SessionSummary(
      user_id: Long, n_sessions: Long, n_events: Long, total_value: Double)

  /** Custom per-key state beyond what session_window expresses:
    * flatMapGroupsWithState tracking lifetime session count + totals per
    * user, emitting a summary whenever a session closes (gap exceeded) and
    * expiring idle users via processing-time timeout so state stays bounded —
    * the `KeyValueGroupedDataset` stateful path (SURVEY.md §2.2 streaming).
    */
  def userSessionTracker(
      events: Dataset[UserEvent],
      gapMs: Long = 30L * 60 * 1000,
      idleTimeoutMs: Long = 60L * 60 * 1000): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    // idleTimeoutMs <= 0 disables expiry (deterministic tests); production
    // keeps it on so state for dormant users is flushed and dropped.
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessionState, SessionSummary](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserSessionState]) =>
          if (state.hasTimedOut) {
            // idle user: flush the final summary and drop the state
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.nSessions, s.nEvents, s.totalCents / 100.0))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            var s = state.getOption.getOrElse(UserSessionState(0L, 0L, Long.MinValue, 0L))
            val out = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              val newSession = s.lastTsMs == Long.MinValue || e.ts.getTime - s.lastTsMs > gapMs
              if (newSession && s.nSessions > 0)
                out += SessionSummary(userId, s.nSessions, s.nEvents, s.totalCents / 100.0)
              s = UserSessionState(
                s.nEvents + 1,
                s.totalCents + math.round(e.value * 100),
                // a LATE event (earlier than the watermark-high already seen
                // in a previous batch) folds into the session but must not
                // REWIND the clock — a rewound lastTs would make the next
                // on-time event look gap-separated and split a phantom
                // session.
                math.max(s.lastTsMs, e.ts.getTime),
                s.nSessions + (if (newSession) 1 else 0))
            }
            state.update(s)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  final case class TokenEvent(ts: java.sql.Timestamp, token: String)
  final case class MgState(counts: Map[String, Long])
  final case class TrendingSnapshot(shard: Int, tokens: Seq[String])

  /** Streaming trending-term candidates — the streaming face of the batch
    * [[graft.functions.MisraGries]] sketch: each shard keeps a k-counter
    * Misra–Gries summary of ITS tokens in group state and emits its current
    * candidate set every trigger.
    *
    * Sharding by a hash OF THE TOKEN preserves the MG guarantee globally:
    * a token's whole mass lands in exactly one shard, so a token with
    * global count > N/(k+1) is also above its own shard's N_shard/(k+1)
    * (N_shard ≤ N) and MUST hold a counter there — hash sharding never
    * splits a heavy hitter across sketches. State is ≤ k counters per
    * shard FOREVER (no watermark needed — the sketch, not retention,
    * bounds it); the exact rescan that turns candidates into exact counts
    * is the batch x_heavy_hitters pattern applied to the stored stream.
    */
  def trendingCandidates(
      tokens: Dataset[TokenEvent],
      k: Int = 32,
      nShards: Int = 8): Dataset[TrendingSnapshot] = {
    import tokens.sparkSession.implicits._
    tokens.groupByKey(e => math.floorMod(e.token.hashCode, nShards))
      .mapGroupsWithState[MgState, TrendingSnapshot](GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[TokenEvent], state: GroupState[MgState]) =>
          var m = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
          rows.foreach { e =>
            m.get(e.token) match {
              case Some(c) => m += (e.token -> (c + 1L))
              case None if m.size < k => m += (e.token -> 1L)
              case None =>
                // decrement-all eviction; immutable ops are fine at k ≤ ~1e3
                m = m.flatMap { case (t, c) =>
                  if (c == 1L) None else Some(t -> (c - 1L))
                }
            }
          }
          state.update(MgState(m))
          TrendingSnapshot(shard, m.keys.toSeq.sorted)
      }
  }

  /** Streaming exact dedup — the ingestion-time companion of Dedup.dedupExact
    * for a training-data firehose: drop records whose dedup key was already
    * seen, with state bounded by the watermark (dropDuplicatesWithinWatermark
    * expires keys once the watermark passes, so 100 TB of stream history
    * never accumulates in state — the unbounded-state trap of a bare
    * dropDuplicates). Key defaults to the md5 of the payload column.
    */
  def dedupStream(
      events: DataFrame,
      payloadCol: String = "text",
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame = {
    // NULL payloads bypass dedup entirely: md5(NULL) is NULL and
    // dropDuplicates treats null keys as EQUAL, so without the split every
    // null-payload record after the first would be silently dropped even
    // though the events are distinct.
    val withKey = events.withColumn("dedup_key", md5(col(payloadCol)))
    val deduped = withKey.filter(col("dedup_key").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("dedup_key")
    deduped.union(withKey.filter(col("dedup_key").isNull))
      .drop("dedup_key")
  }

  /** Stream-static dimension enrichment: each micro-batch left-joins the
    * (small, broadcast) static dimension — no streaming state at all, the
    * standard lookup-enrichment shape. The dimension is re-resolved per
    * batch, so a file-backed dim picks up slowly-changing updates without
    * restarting the query.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream inner join with state cleanup: impressions joined to
    * their clicks within `maxDelay`. BOTH sides are watermarked and the join
    * condition bounds click_ts to [imp_ts, imp_ts + maxDelay] — together
    * these let Spark expire buffered rows once the watermark passes the
    * bound, so join state stays finite on an unbounded stream (an
    * unconstrained stream-stream join buffers both sides forever).
    */
  def clickAttribution(
      impressions: DataFrame,
      clicks: DataFrame,
      maxDelay: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", watermark)
    val clk = clicks.withWatermark("click_ts", watermark)
    imp.join(clk, expr(
      s"""imp_id = click_imp_id
         |AND click_ts >= imp_ts
         |AND click_ts <= imp_ts + interval $maxDelay""".stripMargin))
      .drop("click_imp_id")
  }

  final case class AttEvent(
    event_id: Long, user_id: Long, event_type: String, tus: Long)
  final case class LastTouchState(tid: Long, ttype: String, tt: Long)
  /** Per-conversion credit; `touch_type = "(none)"`, `delay_us = -1` when
    * no touch fell inside the window.
    */
  final case class Credit(cid: Long, touch_type: String, delay_us: Long)

  /** Streaming LAST-TOUCH attribution — the stateful-stream face of
    * [[graft.analytics.Attribution]]: per-user state is just the latest
    * touch seen so far (one tiny record per user, bounded state — unlike
    * the stream-stream [[clickAttribution]] which buffers a window of
    * BOTH sides), and each conversion is credited the moment it arrives.
    * Within a micro-batch, events sort by (tus, event_id) — the same
    * total order the batch query ranks by; ACROSS batches, correctness
    * relies on event-time-ordered arrival (the spec feeds time-split
    * batches; production fronts this with a watermark-sorted stage).
    * StreamingSpec proves per-conversion parity with the hash-gated batch
    * query on fixture events, including the credit-is-total (none) rows.
    */
  def lastTouchTracker(
      events: Dataset[AttEvent],
      windowMicros: Long,
      touchTypes: Set[String],
      convType: String): Dataset[Credit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastTouchState, Credit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[AttEvent], state: GroupState[LastTouchState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tus, e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[Credit]
          sorted.foreach { e =>
            if (e.event_type == convType) {
              out += (last match {
                case Some(t) if t.tt < e.tus && t.tt >= e.tus - windowMicros =>
                  Credit(e.event_id, t.ttype, e.tus - t.tt)
                case _ => Credit(e.event_id, "(none)", -1L)
              })
            }
            if (touchTypes.contains(e.event_type) &&
                last.forall(t => e.tus > t.tt || (e.tus == t.tt && e.event_id > t.tid)))
              last = Some(LastTouchState(e.event_id, e.event_type, e.tus))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  final case class CdcEvent(
    event_id: Long, user_id: Long, event_type: String, tus: Long, value: Double)
  final case class LatestState(
    event_id: Long, tus: Long, event_type: String, value: Double)
  final case class LatestRow(
    user_id: Long, event_id: Long, tus: Long, event_type: String, value: Double)

  /** Streaming CDC keep-latest — the stateful-stream face of the batch
    * `q_latest_event` snapshot (and the type-1 upsert [[graft.analytics
    * .Upsert]] maintains from files): per-user state is the single newest
    * row by the SAME total order the batch query ranks by
    * (ts DESC, event_id DESC), and a micro-batch emits a group's row ONLY
    * when its state actually advanced — a batch whose rows were all stale
    * produces no output for that group, so a downstream CDC sink never
    * re-upserts a no-op. The point of the state discipline is OUT-OF-ORDER
    * safety: a late-arriving STALE row (older (tus, event_id) than the
    * state) must not displace the newer one — which is exactly what a
    * blind "last write wins" foreachBatch upsert gets wrong, and what
    * CdcParitySpec feeds (event_id-parity-split batches, so every batch
    * carries rows older than the other batch's state). State is one tiny
    * record per user — bounded, RocksDB-friendly.
    */
  def keepLatestTracker(events: Dataset[CdcEvent]): Dataset[LatestRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestState, LatestRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[CdcEvent], state: GroupState[LatestState]) =>
          val prev = state.getOption
          var cur = prev
          rows.foreach { e =>
            if (cur.forall(s =>
                e.tus > s.tus || (e.tus == s.tus && e.event_id > s.event_id)))
              cur = Some(LatestState(e.event_id, e.tus, e.event_type, e.value))
          }
          // Emit ONLY when state advanced: a batch whose rows were all
          // stale must not re-emit the unchanged row — a downstream CDC
          // sink would re-upsert a no-op (and at scale, every late
          // straggler batch would re-touch every key it mentions).
          if (cur != prev) {
            val s = cur.get
            state.update(s)
            Iterator.single(LatestRow(uid, s.event_id, s.tus, s.event_type, s.value))
          } else Iterator.empty
      }
  }

  /** batch_id-partitioned parquet sink via foreachBatch, idempotent under
    * replay: after a failure Structured Streaming re-runs the last batch with
    * the SAME batchId, and the dynamic-overwrite write replaces exactly that
    * batch's partition instead of appending duplicates — the standard
    * exactly-once-to-parquet recipe for foreachBatch sinks. Downstream batch
    * readers partition-prune on batch_id.
    */
  def parquetSink(
      stats: DataFrame,
      outRoot: String,
      checkpoint: String,
      triggerMs: Long = 1000L): DataStreamWriter[org.apache.spark.sql.Row] =
    stats.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, outRoot)
      }

  /** File-source streaming read over a drop directory (the production
    * landing-zone pattern: upstream lands files, the stream discovers and
    * processes each exactly once, tracked in the checkpoint's file log).
    * Schema is REQUIRED — inference would re-scan the directory and race
    * new arrivals.
    */
  def readJsonDir(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Drain everything currently available from a stream into the
    * batch_id-partitioned parquet sink, then stop — `Trigger.AvailableNow`
    * is the batch-drain mode a scheduled incremental job runs: each
    * invocation processes exactly the files not yet recorded in the
    * checkpoint, so repeated runs are incremental and a re-run with no new
    * input writes nothing.
    */
  def drainToSink(stream: DataFrame, outRoot: String, checkpoint: String): Unit = {
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, outRoot)
      }
      .start()
    q.awaitTermination()
  }

  /** RocksDB state store provider class — the large-state path. The default
    * HDFS-backed provider keeps every key in executor HEAP; a 100 TB
    * stream's dedup/session state OOMs it, while RocksDB spills state to
    * local disk with an in-memory working set. Set BEFORE starting the
    * query (the provider is pinned per query at start).
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def useRocksDbState(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)

  /** Sink read-back with `batch_id` restored to LONG: partition-directory
    * type inference reconstructs numeric partition values as INT, which
    * would break readers (or unions with pre-partitioning data) that expect
    * the original LongType column.
    */
  def readSink(spark: org.apache.spark.sql.SparkSession, outRoot: String): DataFrame =
    spark.read.parquet(outRoot)
      .withColumn("batch_id", col("batch_id").cast("long"))

  /** The per-batch write: replaces exactly this batch's partition (dynamic
    * overwrite), so re-running a batchId is a no-op in row terms — pinned by
    * StreamingSpec's replay test. NOTE `batch_id` becomes a partition
    * directory; read back through [[readSink]] to get it as LONG again.
    */
  private[streaming] def writeBatch(batch: DataFrame, batchId: Long, outRoot: String): Unit =
    graft.io.Writers.writeParquet(
      batch.withColumn("batch_id", lit(batchId)), outRoot, Seq("batch_id"))
}
