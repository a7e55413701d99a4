package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Exactly-once contract for [[LshDedup.decisionsSink]], the decision
  * stream's output path: the sink must (a) carry the SAME attribution the
  * in-memory rollup computes, and (b) converge — not accumulate — when a
  * micro-batch is replayed under its original batchId, which is precisely
  * what Structured Streaming does after a failure. (b) needs both halves
  * of the design: dynamic partition overwrite replaces the partition, and
  * the tracker's in-batch (tsMs, doc_id) ordering makes the replayed
  * payload row-identical, so the overwrite is a true no-op rather than a
  * different-but-plausible answer.
  */
class LshDedupSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "doc_id LONG, ts TIMESTAMP, text STRING")

  private def doc(id: Long, t: String, text: String): String =
    s"""{"doc_id":$id,"ts":"$t","text":"$text"}"""

  private val textA = "spark table row scan hash window agg sort merge batch"
  private val textB = "spark table row scan hash window agg sort merge value"
  private val textC = "slow fast line key part value the a of and in batch"

  test("decisions sink survives batch replay as a row-level no-op and keeps attribution") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("lsh_sink")
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val input = MemoryStream[String]
    val decisions = LshDedup.lshDedupStream(
      Streaming.parseJson(input.toDF(), schema), watermark = "10 minutes")
    val q = LshDedup.decisionsSink(decisions, out, ckpt).start()
    try {
      input.addData(doc(1, "2024-01-01 10:00:00", textA),
        doc(3, "2024-01-01 10:00:30", textC))
      q.processAllAvailable()
      input.addData(doc(2, "2024-01-01 10:01:00", textB))
      q.processAllAvailable()
    } finally q.stop()

    def sinkRows(): Set[(Long, Long, Int, String, Long, Boolean)] =
      Streaming.readSink(spark, out)
        .select($"batch_id", $"doc_id", $"band", $"bh", $"claimant", $"is_new")
        .as[(Long, Long, Int, String, Long, Boolean)].collect().toSet

    val beforeReplay = sinkRows()
    assert(beforeReplay.nonEmpty)
    // the sink's rollup carries the stream's attribution
    val rolled = LshDedup.rollup(
        Streaming.readSink(spark, out).drop("batch_id"))
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rolled(1L) == (None, true))
    assert(rolled(3L) == (None, true))
    assert(rolled(2L) == (Some(1L), false))

    // failure replay: re-write the LAST batch's payload under its original
    // batchId — the partition must be REPLACED with identical rows, so the
    // sink's full row multiset is unchanged
    val lastId = beforeReplay.map(_._1).max
    val lastPayload = Streaming.readSink(spark, out)
      .filter($"batch_id" === lastId).drop("batch_id")
    Streaming.writeBatch(lastPayload, lastId, out)
    assert(sinkRows() == beforeReplay)

    // determinism across a from-scratch rerun (fresh checkpoint): the
    // idempotent-producer precondition — same input stream, same batch
    // split, byte-identical decision payloads
    val out2 = base.resolve("out2").toString
    val ckpt2 = base.resolve("ckpt2").toString
    val input2 = MemoryStream[String]
    val q2 = LshDedup.decisionsSink(
      LshDedup.lshDedupStream(
        Streaming.parseJson(input2.toDF(), schema), watermark = "10 minutes"),
      out2, ckpt2).start()
    try {
      input2.addData(doc(1, "2024-01-01 10:00:00", textA),
        doc(3, "2024-01-01 10:00:30", textC))
      q2.processAllAvailable()
      input2.addData(doc(2, "2024-01-01 10:01:00", textB))
      q2.processAllAvailable()
    } finally q2.stop()
    val rerun = Streaming.readSink(spark, out2)
      .select($"batch_id", $"doc_id", $"band", $"bh", $"claimant", $"is_new")
      .as[(Long, Long, Int, String, Long, Boolean)].collect().toSet
    assert(rerun == beforeReplay)
  }
}
