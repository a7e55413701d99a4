package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The distributed global prefix sum must equal the naive global window
  * under any parallelism, without planning a SinglePartition exchange.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("globalRunningSum equals the naive global window, any layout") {
    val rows = (1L to 500L).map(k => (k * 7 % 501, k % 13)) // unique keys, unordered
    val want = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
      .drop(1).toMap
    Seq(1, 2, 7).foreach { parts =>
      val df = spark.createDataset(rows).toDF("k", "v").repartition(parts)
      val got = PrefixSum.globalRunningSum(spark, df, $"k", $"v")
        .select($"k", $"running").as[(Long, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("NULL values count as 0 — an all-NULL range slice must not NPE") {
    // keys 0..99 all NULL: under range partitioning the low slices hold
    // only NULLs, which made the partition-total getLong NPE pre-fix
    val rows = (0L until 200L).map { k =>
      (k, if (k < 100) None else Some(k % 7 + 1))
    }
    val df = spark.createDataset(rows).toDF("k", "v")
      .select($"k", $"v".cast("long").as("v"))
    val got = PrefixSum.globalRunningSum(spark, df, $"k", $"v")
      .select($"k", $"running").as[(Long, Long)].collect().toMap
    val want = rows.map { case (k, v) => (k, v.getOrElse(0L)) }
      .sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
      .drop(1).toMap
    assert(got == want)
  }

  test("globalRunningSums: N totals in one pass equal N independent passes") {
    // two values with different NULL patterns over one key order — the
    // multi-value pass must agree with the single-value contract per column
    // AND plan exactly ONE range exchange + ONE window for both
    val rows = (1L to 300L).map { k =>
      (k * 11 % 301,
        if (k % 5 == 0) None else Some(k % 13),
        if (k % 2 == 0) 1L else 0L)
    }
    val df = spark.createDataset(rows).toDF("k", "a", "flag")
      .select($"k", $"a".cast("long").as("a"), $"flag")
    val got = PrefixSum.globalRunningSums(spark, df, $"k",
        Seq("run_a" -> $"a", "run_flag" -> $"flag"))
      .select($"k", $"run_a", $"run_flag").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = rows.map { case (k, a, f) => (k, a.getOrElse(0L), f) }
      .sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, sa, sf), (k, a, f)) =>
        (k, sa + a, sf + f)
      }
      .drop(1).map { case (k, sa, sf) => k -> (sa, sf) }.toMap
    assert(got == want)
    val plan = PrefixSum.globalRunningSums(spark, df, $"k",
        Seq("run_a" -> $"a", "run_flag" -> $"flag"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Window")) == 1,
      s"expected ONE window pass for both totals:\n$plan")
  }

  test("the running-sum plan has no SinglePartition exchange") {
    val df = spark.range(0, 1000).select($"id".as("k"), ($"id" % 5).as("v"))
    val plan = PrefixSum.globalRunningSum(spark, df, $"k", $"v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"found SinglePartition in:\n$plan")
    // while the naive ungrouped window DOES collapse to one partition
    val naive = df.withColumn("running",
      sum($"v").over(org.apache.spark.sql.expressions.Window.orderBy($"k")))
    assert(naive.queryExecution.executedPlan.toString.contains("SinglePartition"))
  }
}
