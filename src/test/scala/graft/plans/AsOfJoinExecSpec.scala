package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.AsOf
import graft.io.Tables

class AsOfJoinExecSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def native(dir: String) = {
    val e = Tables.events(spark, dir)
    val views = e.filter($"event_type" === "view").select($"user_id", $"ts")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    AsOfJoinPlan.asofNative(purchases, views,
      key = "user_id", tsCol = "ts", payload = Seq("ts"))
      .select($"event_id", $"user_id", $"asof_ts")
  }

  test("native merge-scan as-of equals the union+window implementation") {
    val dir = "/root/testdata/sf0.01"
    val e = Tables.events(spark, dir)
    val views = e.filter($"event_type" === "view").select($"user_id", $"ts")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val viaWindow = AsOf.asofJoin(purchases, views,
      key = "user_id", tsCol = "ts", payload = Seq("ts"))
      .select($"event_id", $"user_id", $"asof_ts")
      .as[(Long, Long, Option[java.sql.Timestamp])].collect().toSet
    val viaExec = native(dir)
      .as[(Long, Long, Option[java.sql.Timestamp])].collect().toSet
    assert(viaExec == viaWindow)
    assert(viaExec.nonEmpty)
  }

  test("the plan is the merge-scan shape: AsOfJoinExec, 2 exchanges, no window/BNLJ") {
    val df = native("/root/testdata/sf0.001")
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val nodes = collect(plan) { case p => p }
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]), plan.toString)
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 2, plan.toString)
    val names = nodes.map(_.nodeName.toLowerCase)
    assert(!names.exists(_.contains("window")), plan.toString)
    assert(!names.exists(_.contains("nestedloop")), plan.toString)
  }

  test("forward direction equals the union+window forward as-of") {
    val dir = "/root/testdata/sf0.01"
    val e = Tables.events(spark, dir)
    val purchases = e.filter($"event_type" === "purchase").select($"user_id", $"ts")
    val views = e.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val viaWindow = AsOf.asofJoin(views, purchases,
      key = "user_id", tsCol = "ts", payload = Seq("ts"), forward = true)
      .select($"event_id", $"asof_ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    val viaExec = AsOfJoinPlan.asofNative(views, purchases,
      key = "user_id", tsCol = "ts", payload = Seq("ts"), forward = true)
      .select($"event_id", $"asof_ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    assert(viaExec == viaWindow)
    assert(viaExec.values.exists(_.isDefined))
    assert(viaExec.values.exists(_.isEmpty)) // tail views with no later purchase
  }

  test("NULL right keys match nothing — including left key 0") {
    // Regression: the eval'd merge loop unboxed a NULL right key to 0L, so
    // a null-key right row (which sorts FIRST) could be captured as the
    // candidate for left key 0. The primitive loop skips null key/time
    // rows at the head, and the wrapper filters them — assert through the
    // public API that key 0 only sees its real quote.
    val lDf = Seq((1L, 0L, 50L), (2L, 0L, 5L)).toDF("lid", "k", "t")
      .select($"lid", $"k", timestamp_micros($"t").as("ts"))
    val rDf = Seq(
        (Option.empty[Long], 1L, 111L), // null key, earliest time
        (Some(0L), 10L, 222L))          // the only legitimate key-0 quote
      .toDF("k", "t", "pay")
      .select($"k", timestamp_micros($"t").as("ts"), $"pay")
    val got = AsOfJoinPlan.asofNative(lDf, rDf, key = "k", tsCol = "ts",
      payload = Seq("pay"))
      .select($"lid", $"asof_pay").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) == Some(222L)) // t=50 >= 10: the real quote, not the null-key row
    assert(got(2L).isEmpty)       // t=5 < 10: nothing, NOT pay=111
  }

  test("NULL left key or time rows pass through with a null match") {
    val lDf = Seq(
        (1L, Some(0L), Some(50L)),
        (2L, Option.empty[Long], Some(50L)),
        (3L, Some(0L), Option.empty[Long]))
      .toDF("lid", "k", "t")
      .select($"lid", $"k", timestamp_micros($"t").as("ts"))
    val rDf = Seq((0L, 10L, 222L)).toDF("k", "t", "pay")
      .select($"k", timestamp_micros($"t").as("ts"), $"pay")
    val got = AsOfJoinPlan.asofNative(lDf, rDf, key = "k", tsCol = "ts",
      payload = Seq("pay"))
      .select($"lid", $"asof_pay").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(222L), 2L -> None, 3L -> None))
  }

  test("model check on generated interleavings, including no-match and tie edges") {
    val rnd = new scala.util.Random(13)
    val lefts = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
    val rights = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong + 4L, rnd.nextInt(1000).toLong, i.toLong)) // keys 4..11: half match nothing on the left
    val lDf = lefts.toDF("lid", "k", "t")
      .select($"lid", $"k", timestamp_micros($"t").as("ts"))
    val rDf = rights.toDF("k", "t", "pay")
      .select($"k", timestamp_micros($"t").as("ts"), $"pay")
    val got = AsOfJoinPlan.asofNative(lDf, rDf, key = "k", tsCol = "ts",
      payload = Seq("pay"))
      .select($"lid", $"asof_pay").as[(Long, Option[Long])].collect().toMap
    lefts.foreach { case (lid, k, t) =>
      // Model: latest right at or before t for the key; ties on time break
      // to the LAST in (time, insertion) sort order — but payload is what
      // the operator returns, so compare the full argmax set.
      val matches = rights.filter(r => r._1 == k && r._2 <= t)
      if (matches.isEmpty) assert(got(lid).isEmpty, s"lid=$lid")
      else {
        val maxT = matches.map(_._2).max
        val candidates = matches.filter(_._2 == maxT).map(_._3).toSet
        assert(got(lid).isDefined && candidates(got(lid).get),
          s"lid=$lid got ${got(lid)} want one of $candidates")
      }
    }
  }
}
