package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Hll

/** Stream/batch parity for the HLL sketch: the register table is a plain
  * `groupBy(j).agg(max(rho))` — an incrementally-maintainable streaming
  * aggregate, so the SAME projection ([[Hll.jRho]]) run as a Complete-mode
  * streaming query over micro-batched keys must land on bit-identical
  * registers (and therefore a bit-identical estimate) to the batch build.
  * This is the distinct-count-over-a-stream story at 100 TB: fixed-size
  * state (≤ 256 rows) regardless of how many keys flow through.
  */
class HllStreamParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming max-per-register over micro-batches equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val keys = (1L to 5000L).map(k => s"user-$k")
    val input = MemoryStream[String]
    val regs = input.toDF().select(md5($"value").as("h"))
      .select(Hll.jRho("h"): _*)
      .groupBy($"j").agg(max($"rho").as("r"))
    val q = regs.writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream_regs").start()
    try {
      // Three uneven micro-batches, duplicates included in the last one —
      // the sketch must be insensitive to batching and replays.
      input.addData(keys.take(1200): _*); q.processAllAvailable()
      input.addData(keys.slice(1200, 3700): _*); q.processAllAvailable()
      input.addData(keys.drop(3700) ++ keys.take(500): _*); q.processAllAvailable()
      val streamed = spark.table("hll_stream_regs")
        .as[(Long, Long)].collect().toMap
      val batch = keys.toDF("value").select(md5($"value").as("h"))
        .select(Hll.jRho("h"): _*)
        .groupBy($"j").agg(max($"rho").as("r"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch)
      assert(batch.size > 200) // 5000 keys should populate most of 256 registers
    } finally q.stop()
  }
}
