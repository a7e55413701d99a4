package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.io.Tables

/** Stream/batch parity for CDC keep-latest: the flatMapGroupsWithState
  * tracker fed the fixture events in event_id-PARITY-split batches (so
  * each batch carries rows OLDER than state the other batch already
  * installed — the out-of-order arrival a real CDC stream produces)
  * converges on exactly the batch q_latest_event snapshot.
  */
class CdcParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming keep-latest equals the batch q_latest_event snapshot under out-of-order batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as tus", "value")
      .as[Streaming.CdcEvent].collect()

    val input = MemoryStream[Streaming.CdcEvent]
    val latest = Streaming.keepLatestTracker(input.toDS())
    val q = latest.writeStream.outputMode("update").format("memory")
      .queryName("cdc_parity").start()
    val (evenIds, oddIds) = events.partition(_.event_id % 2 == 0)
    try {
      input.addData(evenIds.toSeq)
      q.processAllAvailable()
      // the odd batch contains rows older than much of the installed
      // state — the stale ones must all be rejected
      input.addData(oddIds.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // Snapshot = each user's LAST emitted row (update-mode memory sink
    // appends each batch's updates; max (tus, event_id) per user is the
    // final state because emissions are monotone in that order).
    val streamed = spark.table("cdc_parity").as[Streaming.LatestRow]
      .collect().groupBy(_.user_id).view
      .mapValues(_.maxBy(r => (r.tus, r.event_id))).toMap

    val batch = graft.analytics.Sessions.latestEvent(spark, dir)
      .selectExpr("user_id", "event_id",
        "unix_micros(cast(ts as timestamp)) as tus", "event_type", "value")
      .as[Streaming.LatestRow].collect()
      .map(r => r.user_id -> r).toMap

    assert(streamed == batch)
    // out-of-order rejection was actually exercised: some user's final
    // snapshot comes from the FIRST (even) batch even though the second
    // batch also carried rows for that user.
    val oddUsers = oddIds.map(_.user_id).toSet
    assert(batch.values.exists(r => r.event_id % 2 == 0 && oddUsers.contains(r.user_id)))
    // no-op suppression: a user whose entire second batch was stale must
    // have exactly ONE emitted row (the pre-round-8 tracker re-emitted
    // unchanged state for every batch that merely touched the group —
    // a real CDC sink would re-upsert no-op rows on every straggler).
    val emitted = spark.table("cdc_parity").as[Streaming.LatestRow].collect()
    val staleSecondBatch = batch.collect {
      case (u, r) if r.event_id % 2 == 0 && oddUsers.contains(u) => u
    }
    assert(staleSecondBatch.nonEmpty)
    staleSecondBatch.foreach { u =>
      assert(emitted.count(_.user_id == u) == 1,
        s"user $u re-emitted despite an all-stale batch")
    }
  }
}
