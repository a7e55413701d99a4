package graft.llm

import graft.SparkSpec
import graft.io.Tables

class NoveltySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_novelty matches a driver-side first-occurrence recomputation") {
    val docs = Tables.documents(spark, dir)
      .selectExpr("doc_id", "lower(text) as t").as[(Long, String)].collect()
    val spans = docs.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(SpanDedup.SpanK).map(_.mkString(" ")).toSet
    }.toMap
    val firstDoc = spans.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = spans.map { case (id, ss) =>
      val novel = ss.count(s => firstDoc(s) == id).toLong
      (id, ss.size.toLong, novel, novel * 1000 / ss.size)
    }.toSet
    val got = SpanDedup.novelty(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("single-substrate plan: the span explode runs ONCE (AQE reuses the " +
    "distinct exchange; min_by blocks the min-through-distinct pushdown " +
    "that split the subtrees — see the novelty scaladoc + BENCH_NOTES #80)") {
    val df = SpanDedup.novelty(spark, dir)
    // collect() (not a write) so execution finalizes THIS frame's own
    // QueryExecution — a write plans a separate one and leaves this plan
    // un-finalized (isFinalPlan=false, pre-reuse). After execution the
    // adaptive plan is final; a reused exchange means the scan+explode
    // subtree was shared instead of recomputed. If a future Spark version
    // learns to push min_by through the distinct, this re-splits into two
    // scans and must resurface here loudly.
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1 || plan.contains("ReusedExchange"),
      s"expected a shared span substrate (1 scan or a ReusedExchange); " +
        s"got $scans scans and no reuse:\n$plan")
  }

  test("the earliest document is fully novel; novelty and dup-share agree") {
    val nov = SpanDedup.novelty(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(nov.head._4 == 1000L) // lowest doc_id: every span first-seen there
    // a span is non-novel in doc d ⇒ it exists in an earlier doc ⇒ duplicated;
    // so per doc: n_dup >= n_spans - n_novel
    val dup = SpanDedup.spanDedup(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(nov.forall(r => dup(r._1) >= r._2 - r._3))
  }
}
