package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character-trigram expressions for the text-quality tier
  * (x_oov_rate) — the same §7.3 escalation as [[WalkPick]]: higher-order
  * functions are CodegenFallback, so the declarative derivation
  * `transform(sequence(0, size(cs)-3), i -> concat(cs[i], cs[i+1],
  * cs[i+2]))` over `split(text, '')` ran as an interpreted eval tree that
  * allocated one single-char string PER CHARACTER plus one concat per
  * trigram, and the scoring pass then exploded one row per corpus
  * character into a broadcast join. These two expressions are each one
  * monomorphic compiled loop over the UTF-8 bytes.
  *
  * Semantics pinned to the forms they replace (the oracle hash gate
  * re-proves per query): "character" = Unicode code point, exactly like
  * `split(text, '')` (Java regex advances by code point) and DuckDB's
  * `substr`; each trigram is the byte slice spanning three consecutive
  * code points, byte-identical to the three-way concat.
  */
object TextGrams {
  /** Byte offsets of each code-point start, plus the terminal length —
    * one linear walk (UTF8String.substringSQL per index would rescan from
    * the start each call: the O(len²) trap the original scaladoc
    * measured at 4.3 s vs 1.3 s on this very derivation).
    */
  private def charStarts(b: Array[Byte]): Array[Int] = {
    val starts = new Array[Int](b.length + 1)
    var n = 0
    var i = 0
    while (i < b.length) {
      starts(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    starts(n) = b.length
    java.util.Arrays.copyOf(starts, n + 1)
  }

  /** All consecutive 3-code-point slices; empty array below 3 chars. */
  def trigrams(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val starts = charStarts(bytes)
    val nChars = starts.length - 1
    if (nChars < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - 2)
    var i = 0
    while (i < nChars - 2) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + 3) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `char_trigrams(text)` — array of every consecutive 3-character
  * substring. NULL on NULL input; empty array below 3 characters (the
  * callers keep their explicit `length(text) >= 3` filter, so sub-trigram
  * docs stay excluded from output exactly as before).
  */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_trigrams expects (text string), got ${child.dataType.simpleString}")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override protected def nullSafeEval(input: Any): Any =
    TextGrams.trigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextGrams.trigrams($c)")

  override protected def withNewChildInternal(c: Expression): CharTrigrams =
    copy(child = c)
}

/** `oov_count(text, vocab array<string>)` — one pass over the text's
  * trigram windows against a FOLDABLE vocabulary, returning
  * `struct(n_grams bigint, n_oov bigint)`: total trigram instances and
  * how many fall outside the vocabulary. Replaces the scoring half of the
  * x_oov_rate plan — re-derive grams, explode one row per corpus
  * character, broadcast-join the vocab, per-doc count — with one
  * projection per DOCUMENT: no generate, no join, no aggregate. The
  * vocabulary must be a literal/foldable array (the query collects the
  * top-k vocab driver-side — k rows, the same bounded-collect discipline
  * as the IVF centroids) and is hashed into a set once per expression
  * instance, not per row.
  *
  * NULL text → NULL (nullIntolerant); NULL vocab ELEMENTS are ignored
  * (cannot match any real trigram, mirroring how the join form's NULL
  * vocab rows could never equi-match).
  */
case class OovCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"oov_count expects (text string, vocab array<string>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else right.dataType match {
      case ArrayType(StringType, _) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          "oov_count's vocab must be foldable (a literal array) — it is " +
            "hashed into a set once per plan, not per row")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"oov_count expects (text string, vocab array<string>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false)))
  override def prettyName: String = "oov_count"

  @transient private lazy val vocabSet: java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) set.add(arr.getUTF8String(i))
        i += 1
      }
    }
    set
  }

  /** One window walk; both eval and generated code call it. */
  def score(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    // inline charStarts walk, but window-local: only 4 live offsets needed
    var nGrams = 0L
    var nOov = 0L
    // offsets of the last 4 code-point boundaries seen (ring of size 4)
    val ring = new Array[Int](4)
    var seen = 0
    var i = 0
    while (i <= bytes.length) {
      ring(seen & 3) = i
      seen += 1
      if (seen >= 4) {
        val start = ring(seen & 3) // boundary 3 code points back
        val g = UTF8String.fromBytes(bytes, start, i - start)
        nGrams += 1
        if (!vocabSet.contains(g)) nOov += 1
      }
      if (i < bytes.length)
        // clamp: a truncated multi-byte tail declares more bytes than the
        // buffer holds; without the clamp the walk would jump PAST the
        // terminal boundary and silently drop the final window, while
        // charStarts (which appends the terminal unconditionally) keeps
        // it — the two expressions must agree on every input, malformed
        // UTF-8 included
        i = math.min(i + UTF8String.numBytesForFirstByte(bytes(i)), bytes.length)
      else i += 1
    }
    InternalRow(nGrams, nOov)
  }

  override protected def nullSafeEval(t: Any, v: Any): Any =
    score(t.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("oovCount", this, classOf[OovCount].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $ref.score($t);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): OovCount = copy(left = l, right = r)
}
