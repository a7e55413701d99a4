package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `mg_candidates(key, k)` — Misra–Gries frequent-items candidate sketch as
  * a native TypedImperativeAggregate (Misra & Gries 1982; merge rule per
  * Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * State is at most k (key, weight) counters. Seeing a tracked key
  * increments its counter; an untracked key claims a free slot, and when
  * none is free ALL counters decrement by one (dropping zeros) — each such
  * step discards k+1 occurrences evenly, so any key with true count
  * > N/(k+1) MUST still hold a counter at the end: the sketch is
  * FALSE-NEGATIVE-FREE for heavy hitters at that threshold. Counts are
  * undercounts and the surviving set is stream-order-dependent, which is
  * why this aggregate returns CANDIDATES (the sorted key array), not
  * counts: the caller's exact rescan of the candidate set (one semi-join)
  * restores determinism and exactness — see the x_heavy_hitters query.
  *
  * Merge adds counter maps, then enforces the bound by subtracting the
  * (k+1)-largest weight from every counter and dropping non-positives —
  * the PODS'12 rule that keeps the combined error ≤ N/(k+1). That makes
  * the sketch fully partial-aggregable: each partition ships ≤ k counters
  * (16k bytes at k=1024) instead of its key distribution, which is the
  * whole point at 100 TB.
  *
  * The decrement step is O(k) and can run once per update in the worst
  * case (all-distinct stream: O(N·k) total). For the k ≤ a-few-thousand
  * regime this targets, that worst case is still ~constant work per row;
  * the amortized-O(1) variant (offset counter + min-heap) is the known
  * upgrade if a profile ever demands it.
  */
case class MisraGries(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  private lazy val k: Int = kExpr.eval().toString.toInt

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"key must be BIGINT, got ${child.dataType}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be a literal")
    else {
      val kv = try Option(kExpr.eval()).map(_.toString.toInt)
      catch { case scala.util.control.NonFatal(_) => None }
      kv match {
        case Some(v) if v > 0 => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure("k must be a positive integer literal")
      }
    }
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(
      buffer: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val cur = buffer.getOrElse(key, 0L) // counters are always >= 1
      if (cur > 0L) buffer.update(key, cur + 1L)
      else if (buffer.size < k) buffer.update(key, 1L)
      else {
        // no free slot: decrement all, drop zeros (discards one occurrence
        // of k tracked keys AND the incoming key — k+1 evenly)
        val dead = mutable.ArrayBuffer.empty[Long]
        buffer.foreachEntry { (kk, c) =>
          if (c == 1L) dead += kk else buffer.update(kk, c - 1L)
        }
        dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (kk, c) =>
      buffer.update(kk, buffer.getOrElse(kk, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-largest weight from everything, keep positives
      val weights = buffer.values.toArray
      java.util.Arrays.sort(weights)
      val cut = weights(weights.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[Long]
      buffer.foreachEntry { (kk, c) =>
        if (c - cut <= 0L) dead += kk else buffer.update(kk, c - cut)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.LongMap[Long]): Any = {
    val keys = buffer.keys.toArray
    java.util.Arrays.sort(keys)
    ArrayData.toArrayData(keys)
  }

  override def serialize(buffer: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreachEntry { (kk, c) => bb.putLong(kk); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    (1 to n).foreach(_ => m.update(bb.getLong, bb.getLong))
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "mg_candidates"
}
