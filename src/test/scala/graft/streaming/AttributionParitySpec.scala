package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.analytics.Attribution
import graft.io.Tables

/** Stream/batch parity for last-touch attribution: the stateful
  * flatMapGroupsWithState tracker fed the fixture events (in two
  * time-ordered micro-batches, so per-user state must CARRY between
  * triggers) credits every conversion identically to the hash-gated
  * batch query — including the (none) rows that make credit total.
  */
class AttributionParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming last-touch tracker equals the batch x_attribution per conversion") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as tus")
      .as[Streaming.AttEvent].collect().sortBy(e => e.tus)

    // batch truth: per-conversion credit, with unattributed as ("(none)", -1)
    val byUser = events.filter(e => Attribution.TouchTypes.contains(e.event_type))
      .groupBy(_.user_id).view.mapValues(_.toSeq).toMap
    val batchCredits = events
      .filter(_.event_type == Attribution.ConversionType)
      .map { c =>
        val cands = byUser.getOrElse(c.user_id, Seq.empty)
          .filter(t => t.tus < c.tus && t.tus >= c.tus - Attribution.WindowMicros)
        if (cands.isEmpty) Streaming.Credit(c.event_id, "(none)", -1L)
        else {
          val best = cands.maxBy(t => (t.tus, t.event_id))
          Streaming.Credit(c.event_id, best.event_type, c.tus - best.tus)
        }
      }.toSet
    // ... and the aggregated batch QUERY agrees with this per-conversion view
    val batchAgg = Attribution.attribution(spark, dir)
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> r._2).toMap // touch_type -> n_conv
    val perConvAgg = batchCredits.groupBy(_.touch_type).view.mapValues(_.size.toLong).toMap
    assert(batchAgg.filter(_._2 > 0) == perConvAgg.filter(_._2 > 0))

    val input = MemoryStream[Streaming.AttEvent]
    val credits = Streaming.lastTouchTracker(input.toDS(),
      Attribution.WindowMicros, Attribution.TouchTypes.toSet,
      Attribution.ConversionType)
    val q = credits.writeStream.outputMode("append").format("memory")
      .queryName("att_parity").start()
    try {
      val (earlier, later) = events.partition(_.tus < events(events.length / 2).tus)
      input.addData(earlier.toSeq)
      q.processAllAvailable()
      input.addData(later.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("att_parity").as[Streaming.Credit].collect().toSet
    assert(streamed == batchCredits)
    assert(streamed.exists(_.touch_type != "(none)"))
  }
}
