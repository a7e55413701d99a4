package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[CharTrigrams]]/[[OovCount]] at the expression seam: exact parity
  * with the declarative forms they replace (split('')+transform+concat,
  * and the explode+broadcast-join+count scoring), agreement between
  * interpreted eval and whole-stage codegen, multi-byte code points, and
  * the NULL/edge contract.
  */
class TextGramsSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private val texts = Seq(
    "hello world",
    "abc",
    "ab", // below trigram length
    "", // empty
    "aaaa", // repeated grams
    "héllo wörld", // 2-byte code points
    "日本語のテキスト", // 3-byte code points
    "a😀b😀c", // 4-byte (non-BMP) code points
    "tab\tand\nnewline")

  private def df = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("char_trigrams == split('')+transform+concat, per document") {
    val native = df.select($"id",
      call_function("char_trigrams", $"text").as("g"))
    val declarative = df
      .select($"id", split($"text", "").as("cs"))
      .select($"id",
        when(size($"cs") >= 3, expr(
          "transform(sequence(0, size(cs) - 3), i -> concat(cs[i], cs[i+1], cs[i+2]))"))
          .otherwise(array().cast("array<string>")).as("g"))
    assert(native.collect().toSeq.map(r => (r.getLong(0), r.getSeq[String](1)))
      == declarative.collect().toSeq.map(r => (r.getLong(0), r.getSeq[String](1))))
  }

  test("char_trigrams: interpreted eval agrees with codegen") {
    val viaCodegen = df.select(call_function("char_trigrams", $"text").as("g"))
      .collect().map(_.getSeq[String](0)).toSeq
    // force the interpreted path: evaluate the expression directly
    val viaEval = texts.map { t =>
      CharTrigrams(org.apache.spark.sql.catalyst.expressions.Literal(t))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    }
    assert(viaCodegen == viaEval)
  }

  test("char_trigrams: NULL text yields NULL, not an empty array") {
    val r = Seq((1L, Option.empty[String]), (2L, Some("abcd")))
      .toDF("id", "text")
      .select($"id", call_function("char_trigrams", $"text").as("g"))
      .orderBy($"id").collect()
    assert(r(0).isNullAt(1))
    assert(r(1).getSeq[String](1) == Seq("abc", "bcd"))
  }

  test("oov_count == the explode+join scoring it replaces") {
    val vocab = Array("llo", "wor", "日本語", "😀b😀", "aaa")
    val native = df.filter(length($"text") >= 3)
      .select($"id", call_function("oov_count", $"text", lit(vocab)).as("oc"))
      .select($"id", $"oc.n_grams", $"oc.n_oov")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val vocabDf = vocab.toSeq.toDF("g").withColumn("in_v", lit(1))
    val joined = df.filter(length($"text") >= 3)
      .select($"id", explode(call_function("char_trigrams", $"text")).as("g"))
      .join(broadcast(vocabDf), Seq("g"), "left")
      .groupBy($"id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"in_v".isNull, 1L).otherwise(0L)).as("n_oov"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native.sortBy(_._1) == joined.sortBy(_._1))
    // and the window count is the closed form
    native.foreach { case (id, nGrams, _) =>
      val len = texts(id.toInt).codePointCount(0, texts(id.toInt).length)
      assert(nGrams == len - 2, s"doc $id: $nGrams grams for $len chars")
    }
  }

  test("oov_count: interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = Array("llo", "wor", "日本語", "😀b😀", "aaa")
    val vocabLit = Literal(
      new GenericArrayData(vocab.map(UTF8String.fromString): Array[Any]),
      ArrayType(StringType))
    val viaCodegen = df.filter(length($"text") >= 3)
      .select($"id", call_function("oov_count", $"text", lit(vocab)).as("oc"))
      .select($"id", $"oc.n_grams", $"oc.n_oov").orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // force the interpreted path: evaluate the expression directly
    // (same length(text) >= 3 cut as the frame — Spark length() counts
    // code points)
    val viaEval = texts.zipWithIndex
      .collect { case (t, i) if t.codePointCount(0, t.length) >= 3 =>
        val row = OovCount(Literal(t), vocabLit).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        (i.toLong, row.getLong(0), row.getLong(1))
      }
    assert(viaCodegen == viaEval)
  }

  test("char_trigrams and oov_count agree on MALFORMED UTF-8 (truncated tail)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    // 'a','b','c' then a 3-byte lead with no continuation bytes: the lead
    // declares bytes past the buffer — the clamp must keep the terminal
    // boundary so both expressions see the same gram multiset
    val malformed = UTF8String.fromBytes(
      Array[Byte]('a', 'b', 'c', 0xE4.toByte))
    val grams = CharTrigrams(Literal(malformed, StringType)).eval(null)
      .asInstanceOf[ArrayData]
    val oc = OovCount(Literal(malformed, StringType),
      Literal(new GenericArrayData(Array[Any](UTF8String.fromString("abc"))),
        ArrayType(StringType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(oc.getLong(0) == grams.numElements().toLong,
      s"n_grams ${oc.getLong(0)} != char_trigrams count ${grams.numElements()}")
    assert(oc.getLong(1) == grams.numElements().toLong - 1L,
      "exactly the 'abc' gram is in-vocab")
  }

  test("oov_count: NULL vocab elements are ignored; non-literal vocab rejected") {
    val r = df.filter($"id" === 0L)
      .select(call_function("oov_count", $"text",
        lit(Array("llo", null, "wor"))).as("oc"))
      .select($"oc.n_grams", $"oc.n_oov").collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 7L) // llo + wor in vocab
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("oov_count", $"text",
        array($"text"))).collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
