package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.io.Tables
import graft.llm.Dedup

class LshDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "doc_id LONG, ts TIMESTAMP, text STRING")

  private def doc(id: Long, t: String, text: String): String =
    s"""{"doc_id":$id,"ts":"$t","text":"$text"}"""

  // ≥3 shared word 3-grams with docA → same minhash bands with high odds;
  // the fixture is chosen so ALL bands collide (verified by the parity test)
  private val textA = "spark table row scan hash window agg sort merge batch"
  private val textB = "spark table row scan hash window agg sort merge value"
  private val textC = "slow fast line key part value the a of and in batch"

  test("streaming band hashes are bit-identical to the batch Dedup.bandsOver") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val batch = Dedup.bandsOver(docs)
      .select($"doc_id", $"band", $"bh")
      .as[(Long, Int, String)].collect().toSet
    val streamStyle = docs
      .withColumn("toks", org.apache.spark.sql.functions.split($"text", " "))
      .filter(org.apache.spark.sql.functions.size($"toks") >= 3)
      .select($"doc_id", org.apache.spark.sql.functions
        .explode(LshDedup.rowBands(LshDedup.rowSignature($"toks"))).as("x"))
      .select($"doc_id", $"x.band", $"x.bh")
      .as[(Long, Int, String)].collect().toSet
    assert(streamStyle == batch)
    assert(batch.nonEmpty)
  }

  test("a near-dup arriving later is attributed to the first claimant") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val out = LshDedup.lshDedupStream(
      Streaming.parseJson(input.toDF(), schema), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("lsh_dedup")
      .outputMode("append").start()
    try {
      input.addData(doc(1, "2024-01-01 10:00:00", textA),
        doc(3, "2024-01-01 10:00:30", textC))
      q.processAllAvailable()
      input.addData(doc(2, "2024-01-01 10:01:00", textB))
      q.processAllAvailable()
      val rolled = LshDedup.rollup(spark.table("lsh_dedup"))
        .as[(Long, Option[Long], Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rolled(1L) == (None, true))      // first claimant keeps
      assert(rolled(3L) == (None, true))      // unrelated doc keeps
      assert(rolled(2L) == (Some(1L), false)) // near-dup of doc 1
    } finally q.stop()
  }

  test("same-batch near-dups resolve deterministically by (ts, doc_id)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val out = LshDedup.lshDedupStream(
      Streaming.parseJson(input.toDF(), schema), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("lsh_same_batch")
      .outputMode("append").start()
    try {
      // identical texts, one micro-batch: lower (ts, doc_id) claims
      input.addData(doc(7, "2024-01-01 10:00:05", textA),
        doc(5, "2024-01-01 10:00:05", textA))
      q.processAllAvailable()
      val rolled = LshDedup.rollup(spark.table("lsh_same_batch"))
        .as[(Long, Option[Long], Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rolled(5L) == (None, true))
      assert(rolled(7L) == (Some(5L), false))
    } finally q.stop()
  }

  test("a bucket idle past the event-time TTL expires and re-claims fresh") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val out = LshDedup.lshDedupStream(
      Streaming.parseJson(input.toDF(), schema),
      watermark = "1 minute", ttlMs = 5L * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("lsh_ttl")
      .outputMode("append").start()
    try {
      input.addData(doc(1, "2024-01-01 10:00:00", textA))
      q.processAllAvailable()
      // push the watermark far past claim + TTL so the bucket state drops
      input.addData(doc(9, "2024-01-01 11:00:00", textC))
      q.processAllAvailable()
      input.addData(doc(8, "2024-01-01 11:01:00", textC)) // advance again
      q.processAllAvailable()
      // the SAME text beyond the retention window claims a fresh bucket
      input.addData(doc(2, "2024-01-01 11:02:00", textA))
      q.processAllAvailable()
      val rolled = LshDedup.rollup(spark.table("lsh_ttl"))
        .as[(Long, Option[Long], Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rolled(2L) == (None, true)) // not attributed to expired doc 1
    } finally q.stop()
  }

  test("5k-doc stream: every repeated text is suppressed, originals kept") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 1000 distinct templates, each repeated 5× with distinct ids — the
    // repeats land in later micro-batches than their originals. Every token
    // is unique to its (template, position), so templates share ZERO
    // shingles and the only cross-template collision channel is a 2^-30
    // band-hash accident (any affine token scheme instead yields shifted
    // near-copies: 31Δt ≡ 7Δj makes two templates share 8−|Δj| shingles).
    def text(template: Int): String =
      (0 until 10).map(j => s"w${template}_$j").mkString(" ")
    def batchDocs(rep: Int): Seq[String] =
      (0 until 1000).map { t =>
        doc(rep * 1000L + t, f"2024-01-01 10:${rep}%02d:00", text(t))
      }
    val input = MemoryStream[String]
    val out = LshDedup.lshDedupStream(
      Streaming.parseJson(input.toDF(), schema), watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("lsh_bulk")
      .outputMode("append").start()
    try {
      (0 until 5).foreach { rep =>
        input.addData(batchDocs(rep): _*)
        q.processAllAvailable()
      }
      val rolled = LshDedup.rollup(spark.table("lsh_bulk"))
        .as[(Long, Option[Long], Boolean)].collect()
      assert(rolled.length == 5000)
      val kept = rolled.filter(_._3).map(_._1).toSet
      // exactly the first copy of each template is kept...
      assert(kept == (0 until 1000).map(_.toLong).toSet)
      // ...and every repeat is attributed to ITS OWN template's original
      rolled.filterNot(_._3).foreach { case (id, dupOf, _) =>
        assert(dupOf.contains(id % 1000))
      }
    } finally q.stop()
  }
}
