package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Native as-of join — the full §7.3 escalation ladder, top rung: a custom
  * `LogicalPlan` node, a `SparkStrategy`, and a physical `SparkPlan` whose
  * `doExecute` is a per-partition MERGE SCAN, installed through the public
  * `spark.experimental.extraStrategies` hook.
  *
  * [[graft.analytics.AsOf.asofJoin]] is the compose-existing-ops answer
  * (union + window): one shuffle, but the window must buffer and the
  * unified frame carries BOTH sides' columns through the sort. This
  * operator is what an engine does natively (Flink temporal join,
  * pandas-on-Spark merge_asof at its core): declare
  * `ClusteredDistribution` on the key for both children and per-partition
  * `(key, time)` orderings — Catalyst's EnsureRequirements then inserts
  * exactly one co-partitioning exchange + sort per side — and stream the
  * two sorted iterators TOGETHER, holding ONE candidate right row (the
  * latest with `r.time <= l.time` for the current key), O(1) state, zero
  * buffering, emitting left rows with their match in a single forward
  * pass. Rows never amplify; the right pointer never rewinds.
  *
  * At 100 TB that plan shape is: two shuffles (one per side, each moved
  * once), two local sorts, and a streaming zip — the same exchange count
  * as a sort-merge join but with constant-memory probe state instead of
  * a buffered match group, and it is exactly the plan AsOfJoinExecSpec
  * asserts (node present, 2 exchanges, no BNLJ, no window).
  *
  * Semantics (pinned by the oracle gate via `q_asof_native`, which runs
  * against DuckDB's native `ASOF JOIN`): backward, inclusive
  * (`r.time <= l.time`), latest-wins; left rows with a NULL key or time
  * match nothing; right rows with NULL key/time are dropped by the API
  * wrapper before the operator (a NULL can never win an inclusive-latest
  * race — same rule [[graft.analytics.AsOf.asofJoin]] documents).
  * Key and time must be LongType at this layer — the wrapper casts
  * timestamps to epoch micros, keeping the hot comparison loop primitive.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; every other node falls
  * through to Spark's built-in strategies.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** One exchange per side, then co-partitioned by key. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Local (key, time) sort per side — the merge scan's precondition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Left rows pass through in order, so both properties are the left's —
    * a downstream key-grouped op reuses the exchange and sort for free.
    */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** The merge columns are plain attributes appended by the wrapper, so
    * binding always yields a bare column ordinal — which lets the hot loop
    * read primitives (`getLong`) instead of paying a boxed `eval` per
    * comparison. Measured (16M-trade asof stress, local[32]): the eval'd
    * loop ran 2.5× slower than the composed union+window route purely on
    * per-row overhead — boxing two Longs per left row, RE-evaluating the
    * unchanged right head's key for every left row, and allocating a fresh
    * candidate copy per consumed right row.
    */
  private def ordinalOf(e: Expression, attrs: Seq[Attribute]): Int =
    BindReferences.bindReference(e, attrs) match {
      case b: BoundReference => b.ordinal
      case other => throw new IllegalStateException(
        s"as-of merge column must bind to a plain ordinal, got $other")
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = ordinalOf(leftKey, left.output)
    val ltOrd = ordinalOf(leftTime, left.output)
    val rkOrd = ordinalOf(rightKey, right.output)
    val rtOrd = ordinalOf(rightTime, right.output)
    val rArity = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rArity)
      // Merge head, decoded ONCE per pointer advance (the old rBuf.head
      // shape re-evaluated the same head's key for every left row). Rows
      // with a NULL key or time are skipped here: a NULL can never equal a
      // left key nor win an inclusive-latest race — and under the previous
      // eval'd decode a NULL right key unboxed to 0L and could falsely
      // match left key 0 (the wrapper filters NULL times; NULL keys are
      // now dropped in both layers).
      var headRow: InternalRow = null
      var headKey = 0L
      var headTime = 0L
      def advanceHead(): Unit = {
        headRow = null
        while (headRow == null && rIter.hasNext) {
          val r = rIter.next()
          if (!r.isNullAt(rkOrd) && !r.isNullAt(rtOrd)) {
            headRow = r
            headKey = r.getLong(rkOrd)
            headTime = r.getLong(rtOrd)
          }
        }
      }
      advanceHead()
      // O(1) probe state: the latest right row at or before the current
      // left time, for the current key only. Spark REUSES row objects
      // between iterator steps, so the candidate must be captured by copy —
      // into ONE reusable buffer (`copyFrom` grows it as needed) instead of
      // a fresh allocation per consumed right row.
      var cand: InternalRow = null
      var candKey = 0L
      var candBuf: UnsafeRow = null
      def captureCand(r: InternalRow): Unit = r match {
        case u: UnsafeRow =>
          if (candBuf == null) candBuf = u.copy() else candBuf.copyFrom(u)
          cand = candBuf
        case other => cand = other.copy()
      }
      lIter.map { lRow =>
        if (lRow.isNullAt(lkOrd) || lRow.isNullAt(ltOrd)) {
          project(joined(lRow, nullRight))
        } else {
          val k = lRow.getLong(lkOrd)
          val t = lRow.getLong(ltOrd)
          while (headRow != null &&
              (headKey < k || (headKey == k && headTime <= t))) {
            if (headKey == k) { captureCand(headRow); candKey = k }
            advanceHead()
          }
          if (cand != null && candKey == k) project(joined(lRow, cand))
          else project(joined(lRow, nullRight))
        }
      }
    }
  }
}

object AsOfJoinPlan {

  /** Install the strategy once per session (public hook, idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** User-facing wrapper: for each left row, the latest right payload with
    * `right.tsCol <= left.tsCol` on `key` — same contract as
    * [[graft.analytics.AsOf.asofJoin]], planned through [[AsOfJoinExec]].
    * Output: all left columns, then `asof_<payload>` columns (NULL when
    * no match). Key must be integral; timestamps compare as epoch micros.
    *
    * `forward = true` finds the EARLIEST right row with
    * `right.tsCol >= left.tsCol` — implemented by NEGATING both time
    * axes (`r.t ≥ l.t ⟺ −r.t ≤ −l.t`, and latest-under-negation =
    * earliest), so one physical operator serves both directions with no
    * extra code path in the hot loop.
    */
  def asofNative(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      payload: Seq[String],
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    def micros(c: Column): Column = {
      val m = org.apache.spark.sql.functions.unix_micros(c.cast("timestamp"))
      if (forward) org.apache.spark.sql.functions.negate(m) else m
    }
    // Left: append the primitive merge columns; Right: key + time + payload
    // only, NULL keys and times dropped (a NULL key equals no left key; a
    // NULL time can never win an inclusive-latest race), names prefixed so
    // the concatenated output never collides.
    val lPrep = left
      .withColumn("__lk", col(key).cast(LongType))
      .withColumn("__lt", micros(col(tsCol)))
    val rPrep = right
      .filter(col(tsCol).isNotNull && col(key).isNotNull)
      .select(col(key).cast(LongType).as("__rk") +: micros(col(tsCol)).as("__rt") +:
        payload.map(c => col(c).as(s"asof_$c")): _*)
    val lPlan = lPrep.queryExecution.analyzed
    val rPlan = rPrep.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).get
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, "__lk"), attr(rPlan, "__rk"),
      attr(lPlan, "__lt"), attr(rPlan, "__rt"))
    org.apache.spark.sql.graft.Bridge.ofRows(spark, node)
      .drop("__lk", "__lt", "__rk", "__rt")
  }
}
