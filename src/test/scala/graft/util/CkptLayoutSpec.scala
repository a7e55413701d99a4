package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.util.Ckpt._

/** Pins the contract of the round-10 checkpoint-layout repair
  * (Bridge.repairCheckpointLayout, wired into [[Ckpt.ckptDisk]]): under
  * AQE, Spark's own localCheckpoint records UnknownPartitioning — the
  * adaptive plan wrapper never exposes the final plan's partitioning to
  * LogicalRDD.fromDataset — so every downstream join/aggregate on the
  * checkpointed keys silently re-shuffled data already in place. The
  * repair must (a) carry a real hash layout through the lineage cut,
  * (b) make a downstream aggregate on the layout key exchange-free,
  * (c) keep the data itself exactly equal, and (d) degrade to Spark's
  * behavior (not a wrong claim) when there is no layout to carry.
  */
class CkptLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val whole = df.queryExecution.executedPlan.toString
    whole.split("== Initial Plan ==").head
  }

  test("ckptDisk carries hash partitioning across the lineage cut") {
    val base = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .repartition(4, $"k")
      .ckptDisk()
    val part = base.queryExecution.executedPlan.outputPartitioning
    assert(part.toString.startsWith("hashpartitioning(k#"),
      s"layout lost across the checkpoint: $part")
    assert(part.numPartitions == 4)

    // (b) downstream aggregate on k: partition-local, no shuffle exchange
    val agg = base.groupBy($"k").agg(sum($"v").as("s"))
    val plan = finalPlanOf(agg)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"aggregate on the checkpointed key re-shuffled:\n$plan")

    // (c) values are exactly the unchecked-pointed computation's
    val want = (0L until 1000L).groupBy(_ % 7)
      .map { case (k, vs) => (k, vs.sum) }.toSet
    assert(agg.as[(Long, Long)].collect().toSet == want)
  }

  test("Ckpt.release still drops the repaired frame's blocks") {
    // release() pattern-matches the analyzed plan's LogicalRDD root and
    // unpersists its RDD — the repair rebuilds that node, so this pins
    // that the rebuilt frame stays releasable (the iterative folds lean
    // on eager release to bound executor-disk growth).
    val base = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .repartition(4, $"k")
      .ckptDisk()
    base.count()
    val rdd = base.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"repaired root is not a LogicalRDD: $other")
    }
    assert(rdd.getStorageLevel.useDisk, "checkpoint blocks must be on disk")
    Ckpt.release(base)
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "release must unpersist the repaired frame's blocks")
  }

  test("a layout-free frame degrades to Spark's behavior, not a wrong claim") {
    // no repartition before the checkpoint: the scan-shaped layout is no
    // hash partitioning, so the repair must leave UnknownPartitioning and
    // the downstream aggregate must still exchange (correctly).
    val base = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .ckptDisk()
    val agg = base.groupBy($"k").agg(sum($"v").as("s"))
    val plan = finalPlanOf(agg)
    assert(plan.contains("Exchange hashpartitioning"),
      s"an unpartitioned checkpoint must not claim a layout:\n$plan")
    val want = (0L until 1000L).groupBy(_ % 7)
      .map { case (k, vs) => (k, vs.sum) }.toSet
    assert(agg.as[(Long, Long)].collect().toSet == want)
  }

  test("an AQE-coalesced layout carries as a TRUE claim: downstream stays exact") {
    // Without an explicit partition count, AQE coalesces the aggregate's
    // exchange on tiny data; the repair then carries whatever partitioning
    // the FINAL plan reports for those coalesced blocks. Whatever Spark
    // claims there (coalesced hash or unknown), the carried value must
    // describe the real block layout — pinned by the downstream aggregate
    // on the same key staying exact whether or not its exchange is elided.
    val base = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .groupBy($"k").agg(sum($"v").as("s"))
      .ckptDisk()
    val agg = base.groupBy($"k").agg(sum($"s").as("s2"), count(lit(1)).as("c"))
    val want = (0L until 1000L).groupBy(_ % 7)
      .map { case (k, vs) => (k, vs.sum, 1L) }.toSet
    assert(agg.as[(Long, Long, Long)].collect().toSet == want,
      "coalesced-carry layout must describe the real blocks — every key " +
        "aggregates to exactly one row")
  }

  test("VERSION SENTINEL: this Spark is the exact version the workarounds " +
    "were validated against") {
    // Every docs/SPARK_UPSTREAM.md workaround (the checkpoint layout
    // repair and its ordering sibling) was validated on the version the
    // build.sbt comment pins. A silently-bumped image must fail HERE
    // first, with instructions, rather than wherever behavior drifts:
    // on a new version, re-run this suite's behavior sentinels, update
    // docs/SPARK_UPSTREAM.md "Affects" lines, then bump this string and
    // the build.sbt comment together.
    assert(org.apache.spark.SPARK_VERSION == "4.1.2",
      s"Spark is now ${org.apache.spark.SPARK_VERSION}; re-validate the " +
        "SPARK_UPSTREAM.md workarounds against it (see this test's comment)")
  }

  test("VERSION SENTINEL: Spark's own localCheckpoint still loses the layout " +
    "under AQE — the repair is still needed on this Spark version") {
    // The repair works around LogicalRDD.fromDataset capturing
    // `executedPlan.outputPartitioning` from the AdaptiveSparkPlanExec
    // WRAPPER (which never overrides it) instead of the final plan — see
    // docs/SPARK_UPSTREAM.md for the upstream-shaped minimal repro. If a
    // future Spark fixes fromDataset, this sentinel fails LOUDLY: on that
    // version the repair must be re-validated as a no-op (the next test
    // pins that double-repair already is one) and can then be retired.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "sentinel only means anything under AQE")
    val raw = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .repartition(4, $"k")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val recorded = raw.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.outputPartitioning
      case other => fail(s"checkpoint root is not a LogicalRDD: $other")
    }
    assert(recorded.toString.contains("UnknownPartitioning"),
      s"Spark now records '$recorded' for an AQE localCheckpoint — the " +
        "upstream gap Bridge.repairCheckpointLayout patches appears FIXED " +
        "on this version; re-validate the repair as a no-op and retire it")
  }

  test("double repair is a no-op: same layout, same blocks, same data") {
    val once = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .repartition(4, $"k")
      .ckptDisk()
    val p1 = once.queryExecution.executedPlan.outputPartitioning
    val rdd1 = once.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"repaired root is not a LogicalRDD: $other")
    }
    val twice = org.apache.spark.sql.graft.Bridge
      .repairCheckpointLayout(once, once)
    val p2 = twice.queryExecution.executedPlan.outputPartitioning
    val rdd2 = twice.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"double-repaired root is not a LogicalRDD: $other")
    }
    assert(p2.toString == p1.toString, s"double repair changed the layout: $p1 -> $p2")
    assert(rdd2 eq rdd1, "double repair must reuse the SAME checkpointed blocks")
    assert(twice.as[(Long, Long)].collect().sorted.toSeq ==
      once.as[(Long, Long)].collect().sorted.toSeq)
  }

  test("VERSION SENTINEL: Spark's own localCheckpoint also loses the " +
    "OUTPUT ORDERING under AQE — the repair's ordering leg is still needed") {
    // Same root cause as the partitioning sentinel, second symptom
    // (docs/SPARK_UPSTREAM.md #2): `LogicalRDD.fromDataset` reads
    // `executedPlan.outputOrdering`, and the AdaptiveSparkPlanExec wrapper
    // inherits the default Nil. A future Spark that fixes fromDataset for
    // ordering fails here loudly; the "ordering survives" test below pins
    // that the repair already restores exactly what this sentinel shows
    // Spark losing.
    val raw = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .repartition(4, $"k")
      .sortWithinPartitions($"k", $"v")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    raw.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        assert(lr.outputOrdering.isEmpty,
          s"Spark now records ordering '${lr.outputOrdering}' for an AQE " +
            "localCheckpoint — the ordering leg of the upstream gap appears " +
            "FIXED on this version; re-validate and retire that leg")
      case other => fail(s"checkpoint root is not a LogicalRDD: $other")
    }
  }

  test("ordering survives as a valid prefix and elides the downstream sort") {
    val base = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
      .repartition(2, $"k")
      .sortWithinPartitions($"k", $"v")
      .ckptDisk()
    val ordering = base.queryExecution.executedPlan.outputOrdering
    assert(ordering.size == 2, s"ordering lost: $ordering")
    // a per-partition sort on the carried prefix plans as a no-op
    val resorted = base.sortWithinPartitions($"k")
    val plan = finalPlanOf(resorted)
    assert(!plan.contains("Sort "),
      s"the carried ordering prefix did not elide the sort:\n$plan")
  }
}
