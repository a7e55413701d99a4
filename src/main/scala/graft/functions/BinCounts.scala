package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** `bin_counts(value, lo, hi, nbins)` — fixed-width histogram sketch as a
  * native TypedImperativeAggregate (the custom-aggregate tier of SURVEY.md
  * §7.3, alongside the scalar CosineSimilarity expression).
  *
  * Semantics (pinned, engine-reproducible): bin = floor((v - lo) / width)
  * clamped to [0, nbins-1] — values below `lo` land in bin 0, at/above `hi`
  * in the last bin; NULLs are ignored. The buffer is a plain count vector,
  * so update is O(1), merge is a vector add, and the result is EXACTLY
  * order- and partition-independent — unlike rank-based sketches (t-digest,
  * KLL) whose merged state depends on merge order. That determinism is what
  * lets a sketch aggregate pass a cross-engine hash gate (x_hist_sketch).
  *
  * Scale: the shuffle carries one nbins-long vector per partition instead
  * of any per-row state; at 100 TB the aggregate is a map-side histogram
  * per partition plus a tiny final merge.
  */
case class BinCounts(
    child: Expression,
    loExpr: Expression,
    hiExpr: Expression,
    nExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val lo: Double = loExpr.eval().toString.toDouble
  private lazy val hi: Double = hiExpr.eval().toString.toDouble
  private lazy val nbins: Int = nExpr.eval().toString.toInt
  private lazy val width: Double = (hi - lo) / nbins

  override def children: Seq[Expression] = Seq(child, loExpr, hiExpr, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Analysis-time validation must not itself throw: literal params may be
  // NULL or non-numeric, and eval()+toString would NPE / NumberFormat there.
  private def evalNum(e: Expression): Option[Double] =
    try Option(e.eval()).map(_.toString.toDouble)
    catch { case scala.util.control.NonFatal(_) => None }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"value must be DOUBLE, got ${child.dataType}")
    else if (!Seq(loExpr, hiExpr, nExpr).forall(_.foldable))
      TypeCheckResult.TypeCheckFailure("lo, hi, nbins must be literals")
    else (evalNum(loExpr), evalNum(hiExpr), evalNum(nExpr)) match {
      case (Some(l), Some(h), Some(n)) =>
        if (n.toInt <= 0) TypeCheckResult.TypeCheckFailure("nbins must be positive")
        else if (h <= l) TypeCheckResult.TypeCheckFailure("hi must be greater than lo")
        else TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure("lo, hi, nbins must be non-null numeric literals")
    }
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nbins)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val raw = math.floor((x - lo) / width)
      val bin =
        if (raw < 0) 0
        else if (raw >= nbins) nbins - 1
        else raw.toInt
      buffer(bin) += 1L
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = ArrayData.toArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BinCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BinCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BinCounts =
    copy(child = newChildren(0), loExpr = newChildren(1),
      hiExpr = newChildren(2), nExpr = newChildren(3))
  override def prettyName: String = "bin_counts"
}
