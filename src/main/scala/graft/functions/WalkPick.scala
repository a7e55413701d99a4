package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the deterministic random-walk hop pick —
  * among `nbrs`, the element `d` minimizing the pair
  * `(h, d)` where `h` is the first 15 hex chars (60 bits) of
  * `md5("start:walk:step:d")` parsed as an unsigned integer. Bit-identical
  * to the declarative form it replaces,
  * `array_min(transform(nbrs, d -> CAST(conv(substring(md5(concat_ws(':',
  * ...)), 1, 15), 16, 10) AS DECIMAL(38,0)) * 10^19 + d))` followed by
  * `% 10^19` — the decimal pack orders exactly like the (h, d) pair, and
  * so does this comparison — and to the DuckDB oracle's HUGEINT packing.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation rule): higher-order
  * functions are CodegenFallback, so the per-element md5 ran as an
  * interpreted Expression.eval tree — megamorphic dispatch the JIT chews
  * on for tens of seconds before it settles (round-11 bench attribution:
  * the suite's first x_rand_walk measurement carried a 33 s JIT-time delta
  * and a 13.8 s straggler task executing still-unoptimized interpreter
  * chains; BENCH_NOTES #61/#64). This expression is ONE monomorphic
  * method: a tight compiled loop building the candidate strings into a
  * reused buffer and reusing a thread-local MessageDigest. Whole-stage
  * codegen calls it directly.
  *
  * Null semantics: NULL on a NULL array or empty array (a sink node;
  * matches array_min over an empty transform), and null ELEMENTS are
  * IGNORED — in the model, `CAST(d AS DECIMAL)` makes the packed pick
  * NULL and `array_min` skips NULLs — so an all-null array is also NULL.
  * A NULL SCALAR input (start/walk/step) yields NULL by design
  * (nullIntolerant): a walk row never has null identity, and this
  * deliberately DIFFERS from the declarative form, whose `concat_ws`
  * would silently DROP the null field and hash a shorter key — a
  * plausible-but-wrong pick is worse than a loud null.
  */
case class WalkPick(
    first: Expression, second: Expression, third: Expression,
    fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val scalarsOk =
      Seq(first, second, third).forall(_.dataType == LongType)
    val arrOk = fourth.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (scalarsOk && arrOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "walk_pick expects (start bigint, walk bigint, step bigint, " +
        "nbrs array<bigint>), got (" +
        Seq(first, second, third, fourth)
          .map(_.dataType.simpleString).mkString(", ") + ")")
  }

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "walk_pick"

  @transient private lazy val md5Local: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  /** The whole argmin loop in one compiled, monomorphic method; both eval
    * and the generated code call it. Returns null when no non-null
    * candidate exists (empty or all-null array).
    */
  def pick(start: Long, walk: Long, step: Long, nbrs: ArrayData): java.lang.Long = {
    val md = md5Local.get()
    val prefix = new java.lang.StringBuilder(48)
      .append(start).append(':').append(walk).append(':')
      .append(step).append(':').toString
    val sb = new java.lang.StringBuilder(prefix.length + 20)
    val n = nbrs.numElements()
    var found = false
    var bestH = Long.MaxValue
    var bestD = Long.MaxValue
    var i = 0
    while (i < n) {
      if (!nbrs.isNullAt(i)) {
        val d = nbrs.getLong(i)
        sb.setLength(0)
        sb.append(prefix).append(d)
        md.reset()
        val dig = md.digest(
          sb.toString.getBytes(StandardCharsets.UTF_8))
        // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7,
        // as an unsigned 60-bit value — conv(substring(hex, 1, 15), 16, 10)
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
        h = (h << 4) | ((dig(7) & 0xffL) >>> 4)
        if (!found || h < bestH || (h == bestH && d < bestD)) {
          found = true; bestH = h; bestD = d
        }
      }
      i += 1
    }
    if (found) java.lang.Long.valueOf(bestD) else null
  }

  override protected def nullSafeEval(
      s: Any, w: Any, st: Any, arr: Any): Any =
    pick(s.asInstanceOf[Long], w.asInstanceOf[Long],
      st.asInstanceOf[Long], arr.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, st, arr) => {
      val ref = ctx.addReferenceObj("walkPick", this, classOf[WalkPick].getName)
      val r = ctx.freshName("picked")
      s"""
         |java.lang.Long $r = $ref.pick($s, $w, $st, $arr);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      fo: Expression): WalkPick =
    copy(first = f, second = s, third = t, fourth = fo)
}
