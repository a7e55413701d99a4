package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: bucketed rewrite of PURE range joins (SURVEY.md §7.3's
  * custom-Catalyst tier — a `Rule[LogicalPlan]` where built-in planning is
  * genuinely wrong at scale).
  *
  * A join whose ONLY predicate is `pt >= lo AND pt <= hi` has no equi key,
  * so Spark must plan BroadcastNestedLoopJoin / CartesianProduct — O(N·M)
  * comparisons, infeasible when both sides are large. But a range predicate
  * IS an equi join in disguise: on a grid of width W, a point falls in
  * exactly one bucket `pt div W` and an interval covers buckets
  * `lo div W .. hi div W`; `bucket(pt) = covered_bucket(interval)` is a
  * NECESSARY condition for a match. The rewrite replicates each interval
  * row per covered bucket (a bounded explode — (hi-lo)/W + 1 copies),
  * equi-joins on the bucket, and keeps the original range predicate as the
  * exact refinement — same rows, no duplicates (one bucket per point), but
  * now a SHUFFLE HASH/SORT-MERGE join that partitions both 100 TB sides by
  * bucket instead of materializing N·M pairs.
  *
  * Scope guards (deliberately narrow — a rewrite that must never be wrong):
  * inner join, exactly the two-conjunct range shape, all three operands
  * LongType, point side and interval side each entirely from one child, and
  * non-negative domains (`div` truncates toward zero, so bucket ids are
  * floor only for values >= 0 — epoch days/seconds, ids, offsets).
  * Everything else keeps Spark's plan.
  *
  * Installed via `spark.experimental.extraOptimizations` ([[install]]) —
  * the user writes the naive BETWEEN join with bound columns named
  * [[LoMarker]]/[[HiMarker]] (the opt-in gate) and the optimizer upgrades
  * it, exactly like Catalyst's own join-strategy selection.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** Bucket width in point-domain units, read from the session conf at
    * optimize time so the CALLER — who knows (or has measured) the interval
    * length distribution — can size it per query. The cost model: an
    * interval of length L replicates to (L+W)/W bucket copies, and every
    * point probes ~(L+W) interval-replica rows in its bucket, so the join
    * intermediate is N·(L+W) — monotonically GROWING in W. Small W is
    * always better for the probe side; the only reason to widen is to cap
    * interval-side replication (I·(L+W)/W) when the interval side is also
    * huge. W = median interval length bounds replication at ~2× while
    * keeping the probe fan-out within ~2× of optimal — the balanced default
    * when both sides are 100 TB facts; a caller with a small interval side
    * (this repo's declared query: 2.4k calendar windows) should set W well
    * below L and buy an almost-lossless bucket join instead.
    */
  val BucketWidthConf = "spark.graft.rangeJoin.bucketWidth"
  val DefaultBucketWidth = 8L
  private def bucketWidth: Long =
    conf.getConfString(BucketWidthConf, DefaultBucketWidth.toString).toLong

  /** Opt-in marker: the rewrite only fires when the interval bounds are
    * columns literally named [[LoMarker]]/[[HiMarker]]. `install` puts the
    * rule on `experimental.extraOptimizations`, which is SESSION-global and
    * lazy (optimization happens at action time, after the building call
    * returns) — so install/uninstall bracketing cannot scope it. The name
    * gate makes the session-wide install safe instead: a query opts in by
    * aliasing its bound columns to the markers; every other range join in
    * the session — even the exact guarded shape — keeps Spark's own plan.
    */
  val LoMarker = "__range_lo"
  val HiMarker = "__range_hi"

  private def refsOnly(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  private def allLong(es: Expression*): Boolean = es.forall(_.dataType == LongType)

  private def marked(lo: Expression, hi: Expression): Boolean = (lo, hi) match {
    case (l: AttributeReference, h: AttributeReference) =>
      l.name == LoMarker && h.name == HiMarker
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner,
        Some(And(GreaterThanOrEqual(pt1, lo), LessThanOrEqual(pt2, hi))), hint)
        if pt1.semanticEquals(pt2) && allLong(pt1, lo, hi) && marked(lo, hi) &&
          !pt1.foldable && !lo.foldable && !hi.foldable =>
      if (refsOnly(pt1, left) && refsOnly(lo, right) && refsOnly(hi, right))
        rewrite(j, left, right, pt1, lo, hi, pointOnLeft = true, hint)
      else if (refsOnly(pt1, right) && refsOnly(lo, left) && refsOnly(hi, left))
        rewrite(j, right, left, pt1, lo, hi, pointOnLeft = false, hint)
      else j
  }

  private def bucketOf(e: Expression, w: Long): Expression =
    IntegralDivide(e, Literal(w))

  private def rewrite(
      j: Join,
      pointSide: LogicalPlan,
      intervalSide: LogicalPlan,
      pt: Expression,
      lo: Expression,
      hi: Expression,
      pointOnLeft: Boolean,
      hint: JoinHint): LogicalPlan = {
    // One conf read per rewrite: both sides MUST bucket on the same width.
    val w = bucketWidth
    val ptBucket = Alias(bucketOf(pt, w), "__graft_pt_bucket")()
    val pointB = Project(pointSide.output :+ ptBucket, pointSide)

    val ivBucket = AttributeReference("__graft_iv_bucket", LongType, nullable = true)()
    // Sequence is TimeZoneAwareExpression: without an explicit timeZoneId it
    // reports unresolved and fails optimizer plan validation, even on longs.
    // An inverted interval (lo > hi) matches nothing in the naive join, but
    // Sequence THROWS on descending bounds with step 1 — guard to an empty
    // array so the explode drops the row instead of crashing the job.
    val loB = bucketOf(lo, w)
    val hiB = bucketOf(hi, w)
    val seq = Sequence(loB, hiB, Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
    val emptyArr = Literal.create(Array.emptyLongArray, ArrayType(LongType, containsNull = false))
    val gen = Explode(If(LessThanOrEqual(loB, hiB), seq, emptyArr))
    val intervalB = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(ivBucket), child = intervalSide)

    val cond = And(EqualTo(ptBucket.toAttribute, ivBucket),
      And(GreaterThanOrEqual(pt, lo), LessThanOrEqual(pt, hi)))
    val (newLeft, newRight) =
      if (pointOnLeft) (pointB, intervalB) else (intervalB, pointB)
    Project(j.output, Join(newLeft, newRight, Inner, Some(cond), hint))
  }

  /** Idempotent session install through `experimental.extraOptimizations`
    * (the runtime equivalent of injecting via SparkSessionExtensions).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
