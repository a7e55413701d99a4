package org.apache.spark.sql.graft

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection, UnknownPartitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The [@link private[sql]] doorway this library uses (placing this file
  * inside the `org.apache.spark.sql` package tree is the established
  * pattern for reaching such members — no reflection, compiler-checked
  * against the installed Spark version). Two entries:
  *
  *  - [[ofRows]]: wrapping a custom [[LogicalPlan]] node back into a
  *    user-facing DataFrame — how every Spark-internal operator becomes
  *    a Dataset; third-party physical operators (this library's
  *    [[graft.plans.AsOfJoinExec]]) need the same constructor.
  *  - [[repairCheckpointLayout]]: re-attaching the output partitioning /
  *    ordering that `Dataset.localCheckpoint` LOSES whenever AQE is on.
  *    `LogicalRDD.fromDataset` captures
  *    `queryExecution.executedPlan.outputPartitioning`, but under AQE
  *    that plan is an [[AdaptiveSparkPlanExec]], which never overrides
  *    `outputPartitioning` — so every checkpoint reports
  *    UnknownPartitioning and every downstream join/aggregate re-inserts
  *    an exchange the data's physical layout already satisfies (measured:
  *    the PageRank inflow aggregate re-shuffled the edge frame once per
  *    iteration despite the dst-partitioned checkpoint). The repair reads
  *    the FINAL adaptive plan (public `executedPlan()` on the already-
  *    executed checkpoint action) and rebuilds the LogicalRDD with its
  *    partitioning — the same value Spark itself would have captured were
  *    the action not AQE-wrapped.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Rebuilds `checkpointed`'s [[LogicalRDD]] with the output partitioning
    * and (prefix of) output ordering of `original`'s AQE-final physical
    * plan. `original` must be the dataset the checkpoint was taken FROM,
    * already executed (which an eager localCheckpoint guarantees) — its
    * final plan's layout is, by construction, the layout of the
    * checkpointed blocks. Falls back to `checkpointed` untouched whenever
    * anything doesn't line up: no LogicalRDD at the root, an
    * UnknownPartitioning final plan, or partitioning/ordering expressions
    * that don't resolve against the checkpoint's output (attribute ids
    * normally survive — the physical output carries the analyzed plan's
    * exprIds, which are exactly the LogicalRDD's — but a mismatch must
    * degrade to the old behavior, never to a wrong layout claim).
    * Stats/constraints are rebuilt with the same
    * `rewriteStatsAndConstraints` call `fromDataset` itself uses, so the
    * repaired frame keeps its optimizer size estimate (implicit broadcast
    * decisions downstream depend on it).
    */
  def repairCheckpointLayout[T](
      original: Dataset[T], checkpointed: Dataset[T]): Dataset[T] = {
    val corig = original.asInstanceOf[classic.Dataset[T]]
    val ccp = checkpointed.asInstanceOf[classic.Dataset[T]]
    val session = ccp.sparkSession
    val finalPlan = corig.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // Same PartitioningCollection flattening as LogicalRDD.fromDataset:
    // keep the first leaf so a deep join's collection can't explode.
    @tailrec def firstLeaf(p: Partitioning): Partitioning = p match {
      case pc: PartitioningCollection => firstLeaf(pc.partitionings.head)
      case other => other
    }
    val part = firstLeaf(finalPlan.outputPartitioning)
    def resolves(refs: AttributeSet, lr: LogicalRDD): Boolean =
      refs.subsetOf(AttributeSet(lr.output))
    ccp.queryExecution.analyzed match {
      case lr: LogicalRDD if !part.isInstanceOf[UnknownPartitioning] &&
          resolves(part match {
            case e: Expression => e.references
            case _ => AttributeSet.empty
          }, lr) =>
        // A PREFIX of a sort order is still a true claim; a filtered
        // subsequence is not — takeWhile, never filter.
        val ordering = finalPlan.outputOrdering
          .takeWhile(so => resolves(so.references, lr))
        val (stats, constraints) = LogicalRDD.rewriteStatsAndConstraints(
          corig.logicalPlan, corig.queryExecution.optimizedPlan)
        val repaired = LogicalRDD(lr.output, lr.rdd, part, ordering,
          lr.isStreaming, lr.stream)(session, stats, constraints)
        new classic.Dataset[T](session, repaired, ccp.encoder)
      case _ => checkpointed
    }
  }
}
