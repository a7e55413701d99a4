package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the contract of [[Widen]] (round 11): the conditional scan-widen
  * must (a) repartition a narrower-than-cores frame to defaultParallelism,
  * (b) return an already-wide frame UNTOUCHED — the production-scale
  * no-op that makes the helper safe to leave in 100 TB plans, (c) keep
  * the result set exactly equal either way, and (d) hash-partition on the
  * given key so downstream same-key aggregates stay partition-local.
  */
class WidenSpec extends SparkSpec {
  import spark.implicits._

  private def parts(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions

  test("narrow input is widened to defaultParallelism") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 1000).coalesce(1)
      .select($"id", ($"id" % 13).as("k"))
    val w = Widen(narrow, $"k")
    assert(parts(w) == target)
  }

  test("already-wide input is returned untouched (same plan, no exchange)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, target + 2)
      .select($"id", ($"id" % 13).as("k"))
    val w = Widen(wide, $"k")
    // Reference equality: the helper must not even wrap the frame.
    assert(w eq wide)
  }

  test("result set is identical with and without the widen") {
    val narrow = spark.range(0, 5000).coalesce(1)
      .select($"id", md5($"id".cast("string")).as("h"))
    val w = Widen(narrow, $"id")
    assert(w.exceptAll(narrow).isEmpty && narrow.exceptAll(w).isEmpty)
  }

  test("keyed widen makes a same-key aggregate partition-local") {
    val narrow = spark.range(0, 1000).coalesce(1)
      .select(($"id" % 7).as("k"), $"id".as("v"))
    val agg = Widen(narrow, $"k").groupBy($"k").agg(sum($"v"))
    agg.collect()
    // Exactly the ONE widen shuffle; the aggregate itself adds none.
    // Count actual shuffle nodes in the executed plan, not 'Exchange'
    // substrings — a BroadcastExchange/ReusedExchange appearing in a
    // future version of this plan must not be miscounted as a shuffle.
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          return shuffles(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          return shuffles(q.plan)
        case _ => 0
      }
      self + p.children.map(shuffles).sum
    }
    val n = shuffles(agg.queryExecution.executedPlan)
    assert(n == 1, s"expected one shuffle (the widen), got $n:\n" +
      agg.queryExecution.executedPlan.toString)
  }

  test("a frame with an upstream shuffle is rejected, not executed") {
    val shuffled = spark.range(0, 100)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .repartition(4, $"k")
    val e = intercept[IllegalArgumentException](Widen(shuffled, $"k"))
    assert(e.getMessage.contains("scan/projection frames only"))
  }

  test("keyless widen falls back to round-robin and still widens") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 100).coalesce(1).toDF("id")
    assert(parts(Widen(narrow)) == target)
  }
}
