package graft.llm

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: (Long, String, String, Long)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("textops").toString
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("textStats counts tokens, chars, distinct tokens") {
    val dir = writeDocs((1L, "the cat and the hat", "en", 19L))
    val r = TextOps.textStats(spark, dir)
      .select($"n_tokens", $"n_chars_obs", $"n_distinct_tokens")
      .as[(Long, Long, Long)].head()
    assert(r == ((5L, 19L, 4L)))
  }

  test("qualityScore: stopword ratio and avg token length") {
    val dir = writeDocs((1L, "the cat and the hat", "en", 19L))
    val r = TextOps.qualityScore(spark, dir)
      .select($"n_stopwords", $"stopword_ratio", $"avg_token_len")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 3L) // the, and, the
    assert(r._2 == 3.0 / 5.0)
    assert(r._3 == 19.0 / 5.0)
  }

  test("fingerprint is whitespace- and case-insensitive") {
    val dir = writeDocs(
      (1L, "Hello   World", "en", 13L),
      (2L, "hello world", "en", 11L),
      (3L, "hello worlds", "en", 12L))
    val fp = TextOps.fingerprint(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("langStats aggregates per language") {
    val dir = writeDocs(
      (1L, "one two", "en", 7L),
      (2L, "three four five", "en", 15L),
      (3L, "uno dos", "es", 7L))
    val r = TextOps.langStats(spark, dir)
      .select($"lang", $"n_docs", $"total_tokens").as[(String, Long, Long)]
      .collect().toSet
    assert(r == Set(("en", 2L, 5L), ("es", 1L, 2L)))
  }
}
