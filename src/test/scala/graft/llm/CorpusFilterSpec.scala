package graft.llm

import org.apache.spark.sql.functions.{array_distinct, size, split}

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

  test("paretoFront matches brute-force dominance on the fixture corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = CorpusFilter.paretoFront(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    assert(out.nonEmpty)
    // independent route: collect (vocab, chars) per doc, test every pair
    val all = graft.io.Tables.documents(spark, dir)
      .select($"doc_id",
        size(array_distinct(split($"text", " "))).cast("long"),
        $"n_chars")
      .as[(Long, Long, Long)].collect()
    def dominated(d: (Long, Long, Long)) = all.exists { e =>
      e._2 >= d._2 && e._3 <= d._3 && (e._2 > d._2 || e._3 < d._3)
    }
    val expected = all.filterNot(dominated).sortBy(_._1).toList
    assert(out == expected)
    // frontier sanity: strictly decreasing chars as vocab strictly rises
    val front = out.map(r => (r._2, r._3)).distinct.sortBy(_._1)
    front.sliding(2).foreach {
      case Seq((v1, c1), (v2, c2)) =>
        assert(v1 < v2 && c1 < c2, s"($v1,$c1) vs ($v2,$c2) not a frontier step")
      case _ =>
    }
  }

  test("paretoFront keeps equal twins and drops strict losers") {
    // (vocab, chars): doc 1 and 2 are identical frontier twins; doc 3 is
    // richer but longer (frontier); doc 4 loses to 3 on both; doc 5 ties
    // vocab with 1/2 but is longer (dominated by the twins)
    val docs = Seq(
      (1L, "a b", 6L), (2L, "a b", 6L), (3L, "a b c", 10L),
      (4L, "a b q", 12L), (5L, "b a", 8L)
    ).toDF("doc_id", "text", "n_chars")
    val keep = CorpusFilter.paretoFrontOver(docs)
      .select($"doc_id").as[Long].collect().toList
    // twins 1,2 both survive; 3 is frontier (richer, longer); 4 loses to 3
    // on both axes; 5 ties vocab with the twins but is longer
    assert(keep == List(1L, 2L, 3L))
  }

  test("gopherRules panel: union bounds, non-vacuity, permille arithmetic") {
    val out = CorpusFilter.gopherRules(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect().toList
    assert(out.map(_._1) == List("any_rule", "low_stopword_ratio",
      "low_type_token_ratio", "mean_word_length", "too_long", "too_short"))
    val byRule = out.map(r => r._1 -> r._2).toMap
    val any = byRule("any_rule")
    val singles = out.filter(_._1 != "any_rule").map(_._2)
    // union is at least the largest single rule and at most their sum
    assert(any >= singles.max && any <= singles.sum)
    // calibration holds: every rule rejects someone, none rejects everyone
    val nDocs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001").count()
    singles.foreach(c => assert(c > 0 && c < nDocs))
    out.foreach { case (_, nf, pm) => assert(pm == nf * 1000 / nDocs) }
  }
}
