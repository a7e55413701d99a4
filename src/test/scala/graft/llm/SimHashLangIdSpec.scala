package graft.llm

import graft.SparkSpec

class SimHashLangIdSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: (Long, String, String, Long)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("shl").toString
    rows.toDF("doc_id", "text", "lang", "n_chars").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("identical docs have identical simhash and hamming 0; near-dups small hamming") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val near = base.replace("word30", "changed")
    val dir = writeDocs(
      (1L, base, "en", base.length.toLong),
      (2L, base, "en", base.length.toLong),
      (3L, near, "en", near.length.toLong))
    val fp = SimHash.fingerprints(spark, dir).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    val hammingNear = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(hammingNear > 0 && hammingNear <= 12) // one word of 60 changed
    val pairs = SimHash.dedupSimhash(spark, dir)
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("simhash values stay within 60 bits (positive long)") {
    val dir = writeDocs((1L, "alpha beta gamma delta", "en", 22L))
    val h = SimHash.fingerprints(spark, dir).as[(Long, Long)].head()._2
    assert(h >= 0L && h < (1L << 60))
  }

  test("langId predicts the language whose stopwords dominate") {
    val dir = writeDocs(
      (1L, "the cat and the dog in a house of cards", "en", 0L),
      (2L, "el perro y la casa de los gatos en madrid", "es", 0L),
      (3L, "der hund und die katze ist nicht hier", "de", 0L),
      (4L, "xyzzy qwerty plugh", "??", 0L)) // no stopwords at all
    val got = LangId.langIdQuery(spark, dir)
      .select($"doc_id", $"pred_lang", $"best_score").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == "en" && got(1L)._2 > 0)
    assert(got(2L)._1 == "es")
    assert(got(3L)._1 == "de")
    assert(got(4L) == (("de", 0L))) // all-zero scores: deterministic alphabetical tie-break
  }
}
