package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val large = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "v")
  private lazy val small = (1L to 5000L).filter(_ % 50 == 0).map(i => (i, "x"))
    .toDF("sk", "tag")

  test("prefilter never drops a true match (no false negatives)") {
    val bytes = BloomJoin.buildFilterBytes(small, "sk", expectedItems = 1000)
    val kept = BloomJoin.prefilter(large, bytes, "k")
      .select($"k").as[Long].collect().toSet
    val trueKeys = small.select($"sk").as[Long].collect().toSet
    assert(trueKeys.subsetOf(kept))
  }

  test("prefilter actually rejects most non-matching rows") {
    val bytes = BloomJoin.buildFilterBytes(small, "sk", expectedItems = 1000)
    val kept = BloomJoin.prefilter(large, bytes, "k").count()
    // 100 true matches out of 5000; at 1% fpp the pass-through should stay
    // well under 10% of the table — the whole point of the reduction.
    assert(kept >= 100 && kept < 500, s"bloom kept $kept of 5000 rows")
  }

  test("bloomSemiJoin result is exactly the plain semi-join (FPs removed)") {
    val viaBloom = BloomJoin
      .bloomSemiJoin(large, small, "k", "sk", expectedItems = 1000)
      .select($"k", $"v").as[(Long, Long)].collect().toSet
    val plain = large.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
      .select($"k", $"v").as[(Long, Long)].collect().toSet
    assert(viaBloom == plain)
  }

  test("q_bloom_semi runs on the sf0.001 fixture with rows") {
    val out = BloomJoin.bloomSemi(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).toSeq == out.map(_.getString(0)).toSeq.sorted)
  }
}
