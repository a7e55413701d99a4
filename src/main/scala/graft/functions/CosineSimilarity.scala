package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression: cosine similarity of two array<double> columns.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation rule): the built-in
  * formulation `aggregate(zip_with(a,b,*), 0d, +)` is a higher-order function
  * — evaluated per element through interpreted lambda dispatch, outside
  * whole-stage codegen's tight loop. This expression generates a single fused
  * primitive loop (dot, |a|², |b|² in one pass), keeping the hot path of
  * similarity search fully codegen'd. Accumulation order is left-to-right,
  * identical to the HOF fold, so results are bit-identical and oracle-safe.
  *
  * Null semantics: NULL on mismatched array lengths (matching zip_with's
  * null padding poisoning the HOF fold), NULL if EITHER array contains a
  * null element (a null slot would otherwise read as 0.0 and produce a
  * plausible-but-wrong score), and NULL on a zero denominator — never NaN,
  * never silent truncation. The zero-norm case deliberately takes
  * `try_divide` semantics: under Spark 4's default ANSI mode the HOF's bare
  * Divide THROWS on a 0 divisor, which is wrong for a similarity measure
  * (one all-zero embedding would kill a whole corpus scan); a null sim is
  * simply "no similarity defined" and filters/ranks naturally.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullIntolerant: Boolean = true

  // Can produce NULL for non-null inputs (length mismatch, zero norm), so
  // nullability must not be inferred from the children alone.
  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val den = na * nb
    if (den == 0.0) null else dot / math.sqrt(den)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val den = ctx.freshName("den")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean ${n}_hasNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${n}_hasNull = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $den = $na * $nb;
         |  if (${n}_hasNull || $den == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($den);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** SQL-ergonomic builder: numeric arrays (e.g. decimal literals from
    * `array(1.0, 2.0)`) are cast to array<double> before the strict check.
    */
  private def toDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case ArrayType(_, n) => Cast(e, ArrayType(DoubleType, n))
    case _ => e // let checkInputDataTypes report the mismatch
  }

  // Arity is validated here so a wrong-arg-count call surfaces as a clear
  // analysis error naming the signature, not an IndexOutOfBoundsException
  // from inside the builder.
  private def arity(name: String, sig: String, n: Int)(children: Seq[Expression]): Unit =
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"$name expects $n arguments: $name$sig, got ${children.length}"))

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        arity("cosine_sim", "(a array<double>, b array<double>)", 2)(children)
        CosineSimilarity(toDoubleArray(children.head), toDoubleArray(children(1)))
      }),
    (new FunctionIdentifier("bin_counts"),
      new ExpressionInfo(classOf[BinCounts].getName, "bin_counts"),
      (children: Seq[Expression]) => {
        arity("bin_counts", "(value double, lo double, hi double, nbins int)", 4)(children)
        BinCounts(Cast(children.head, DoubleType), Cast(children(1), DoubleType),
          Cast(children(2), DoubleType), children(3)).toAggregateExpression()
      }),
    (new FunctionIdentifier("top_k_rows"),
      new ExpressionInfo(classOf[TopKRows].getName, "top_k_rows"),
      (children: Seq[Expression]) => {
        arity("top_k_rows", "(ord long, tag long, k int)", 3)(children)
        TopKRows(Cast(children.head, LongType), Cast(children(1), LongType),
          children(2)).toAggregateExpression()
      }),
    (new FunctionIdentifier("walk_pick"),
      new ExpressionInfo(classOf[WalkPick].getName, "walk_pick"),
      (children: Seq[Expression]) => {
        arity("walk_pick", "(start long, walk long, step long, nbrs array<long>)", 4)(children)
        WalkPick(Cast(children.head, LongType), Cast(children(1), LongType),
          Cast(children(2), LongType), children(3))
      }),
    (new FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getName, "sorted_intersect"),
      (children: Seq[Expression]) => {
        arity("sorted_intersect", "(a array<long>, b array<long>)", 2)(children)
        SortedIntersect(children.head, children(1))
      }),
    (new FunctionIdentifier("char_trigrams"),
      new ExpressionInfo(classOf[CharTrigrams].getName, "char_trigrams"),
      (children: Seq[Expression]) => {
        arity("char_trigrams", "(text string)", 1)(children)
        CharTrigrams(children.head)
      }),
    (new FunctionIdentifier("oov_count"),
      new ExpressionInfo(classOf[OovCount].getName, "oov_count"),
      (children: Seq[Expression]) => {
        arity("oov_count", "(text string, vocab array<string>)", 2)(children)
        OovCount(children.head, children(1))
      }),
    (new FunctionIdentifier("mg_candidates"),
      new ExpressionInfo(classOf[MisraGries].getName, "mg_candidates"),
      (children: Seq[Expression]) => {
        arity("mg_candidates", "(key long, k int)", 2)(children)
        MisraGries(Cast(children.head, LongType), children(1))
          .toAggregateExpression()
      }),
    // Spark's own codegen'd Bloom probe (what InjectRuntimeFilter plants),
    // exposed by name so explicit semi-join reduction (analytics.BloomJoin)
    // can use it with a sketch built elsewhere. INTEGRAL keys only: the
    // sketch stores longs, so the value child is cast to long — a fractional
    // or string key would probe a different value than was inserted.
    (new FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) => {
        arity("might_contain", "(filter binary, key long)", 2)(children)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, Cast(children(1), LongType))
      }))

  /** Idempotent per-session registration (for sessions built without the
    * extensions hook — e.g. the driver's own SparkSession).
    */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident))
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** SparkSessionExtensions hook (SURVEY.md §7.3): enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  * Injects the native function set AND the library's planner strategy
  * ([[graft.plans.AsOfJoinStrategy]] — the physical merge-scan as-of
  * join), so an extensions-configured session plans [[graft.plans
  * .AsOfJoinNode]] without the per-session `AsOfJoinPlan.install` call
  * (which remains the in-process route the declared queries use).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
