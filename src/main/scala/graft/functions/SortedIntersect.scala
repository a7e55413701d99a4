package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: intersection of two SORTED array<long>
  * columns by linear merge-scan.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation rule, with the
  * required measurement): the built-in `array_intersect` builds a hash set
  * from its left operand on EVERY row evaluation. In the triangle-counting
  * hot path the adjacency arrays are joined to ~m edge rows, so the same
  * neighbor list gets re-hashed once per incident edge — ~Σdeg² set builds
  * and the allocation churn that goes with them. When both inputs are
  * already sorted (one `array_sort` per NODE at adjacency-build time, not
  * per edge), intersection is a single merge scan per row whose only
  * allocation is the result array. Measured on x_triangles at sf0.1:
  * whole-query median ~5.0 s → ~4.0 s.
  *
  * Contract: both arrays must be sorted ascending with no null elements —
  * the caller owns that invariant (checkInputDataTypes can't see values).
  * On unsorted input the result is undefined (a subset), exactly like any
  * merge join fed unsorted runs. Duplicate elements contribute once
  * (matching `array_intersect`'s distinct semantics). NULL array → NULL.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val out = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        out(k) = xv; k += 1
        // skip duplicates on both sides: distinct output, like array_intersect
        do i += 1 while (i < n && x.getLong(i) == xv)
        do j += 1 while (j < m && y.getLong(j) == yv)
      }
    }
    // fromPrimitiveArray keeps the result unsafe-packed — GenericArrayData
    // over a long[] would box every element
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long[] $out = new long[$n < $m ? $n : $m];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $out[$k++] = $xv;
         |    do { $i++; } while ($i < $n && $a.getLong($i) == $xv);
         |    do { $j++; } while ($j < $m && $b.getLong($j) == $yv);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($out, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}
