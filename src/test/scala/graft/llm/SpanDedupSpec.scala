package graft.llm

import graft.SparkSpec
import graft.io.Tables

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_span_dedup matches a driver-side recomputation") {
    val docs = Tables.documents(spark, dir)
      .selectExpr("doc_id", "lower(text) as t").as[(Long, String)].collect()
    val spans = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      id -> toks.sliding(SpanDedup.SpanK).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val ndocs = spans.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val expected = spans.map { case (id, ss) =>
      val nDup = ss.count(s => ndocs(s) >= 2).toLong
      (id, ss.size.toLong, nDup, nDup * 1000 / ss.size)
    }.toSet
    val got = SpanDedup.spanDedup(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("single-substrate plan: the span explode runs ONCE — count cannot " +
    "be pushed through the distinct, so both consumers share the identical " +
    "subtree and AQE reuses the exchange naturally (unlike x_novelty's " +
    "min, which needed min_by to block the pushdown)") {
    val df = SpanDedup.spanDedup(spark, dir)
    df.collect() // finalize THIS frame's adaptive plan (see NoveltySpec)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1 || plan.contains("ReusedExchange"),
      s"expected a shared span substrate (1 scan or a ReusedExchange); " +
        s"got $scans scans and no reuse:\n$plan")
  }

  test("duplicated spans actually exist in the fixture corpus") {
    val got = SpanDedup.spanDedup(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.exists(_._3 > 0)) // non-vacuous: some recycled spans
    assert(got.forall(r => r._3 <= r._2 && r._4 <= 1000))
  }
}
