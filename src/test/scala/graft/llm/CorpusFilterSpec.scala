package graft.llm

import graft.SparkSpec

class CorpusFilterSpec extends SparkSpec {
  import spark.implicits._

  test("lmRarity counts corpus-rare bigrams per document") {
    // "a b" appears 3× corpus-wide (docs 1,2,3) — common; every other
    // bigram appears once — rare (RareMax = 2).
    val docs = Seq(
      (1L, "a b x y"),   // bigrams: "a b", "b x", "x y"
      (2L, "a b"),       // "a b"
      (3L, "z a b"),     // "z a", "a b"
      (4L, "solo")       // no bigrams -> excluded
    ).toDF("doc_id", "text")
    val out = CorpusFilter.lmRarityOver(docs)
      .as[(Long, Long, Long)].collect().toList
    assert(out == List((1L, 3L, 2L), (2L, 1L, 0L), (3L, 2L, 1L)))
  }

  test("lmRarity lowercases before pairing") {
    val docs = Seq((1L, "A b"), (2L, "a B"), (3L, "a b")).toDF("doc_id", "text")
    // all three collapse to "a b" (count 3 > RareMax) -> zero rare anywhere
    val out = CorpusFilter.lmRarityOver(docs)
      .as[(Long, Long, Long)].collect().toList
    assert(out == List((1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 0L)))
  }
}
