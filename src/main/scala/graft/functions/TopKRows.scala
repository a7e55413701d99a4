package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `top_k_rows(ord, tag, k)` — bounded per-group top-k as a native
  * aggregate: keeps the k largest `(ord, tag)` pairs (ord DESC, ties by
  * tag ASC) and returns them as a sorted `array<struct<ord,tag>>`.
  *
  * This is the SCALABLE form of "top-k per group". The window-rank plan
  * (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`) must shuffle
  * and SORT every input row; this aggregate folds each partition down to
  * at most k pairs per group BEFORE the exchange (partial aggregation =
  * map-side top-k), so the shuffle carries O(groups × k) rows no matter
  * how many billions went in. Merge is a bounded heap-merge, eval is one
  * k·log k sort — exactly order- and partition-independent, so results
  * hash identically under any layout.
  *
  * The buffer is a min-heap on the KEPT set (worst kept pair on top):
  * update/merge evict in O(log k) only when a candidate beats the worst.
  */
case class TopKRows(
    ordExpr: Expression,
    tagExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  private lazy val k: Int = kExpr.eval().toString.toInt

  // "a is worse than b" ordering: the queue's head is the WORST kept pair.
  // Better = larger ord, then smaller tag; so worst-first = smaller ord,
  // then larger tag.
  private val worstFirst: Ordering[(Long, Long)] =
    Ordering.fromLessThan[(Long, Long)] { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    }

  override def children: Seq[Expression] = Seq(ordExpr, tagExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("tag", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (ordExpr.dataType != LongType || tagExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"ord and tag must be BIGINT, got ${ordExpr.dataType}/${tagExpr.dataType}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be a literal")
    else {
      val kv = try Option(kExpr.eval()).map(_.toString.toInt)
      catch { case scala.util.control.NonFatal(_) => None }
      kv match {
        case Some(n) if n > 0 => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure("k must be a positive integer literal")
      }
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)], p: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(p)
    else if (worstFirst.lt(p, buf.head)) { // p is better than the worst kept
      buf.dequeue(); buf.enqueue(p)
    }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val o = ordExpr.eval(input)
    val t = tagExpr.eval(input)
    if (o != null && t != null)
      offer(buf, (o.asInstanceOf[Long], t.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    // in worstFirst, "less" = better, so the ASCENDING sort is best-first
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (o, t) =>
      InternalRow(o, t).asInstanceOf[Any]
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    buf.foreach { case (o, t) => bb.putLong(o); bb.putLong(t) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    (0 until bytes.length / 16).foreach { _ =>
      buf.enqueue((bb.getLong, bb.getLong))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(ordExpr = newChildren(0), tagExpr = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "top_k_rows"
}
