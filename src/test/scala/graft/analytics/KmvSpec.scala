package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_kmv_distinct estimate lands within the k=256 error envelope") {
    val row = Sketch.kmvDistinct(spark, dir)
      .select($"k", $"n_exact", $"estimate", $"rel_err")
      .as[(Long, Long, Double, Double)].collect().head
    val (k, nExact, est, relErr) = row
    assert(k == Sketch.K)
    assert(est > 0.0)
    // KMV standard error ~ 1/sqrt(k-2) ≈ 6.3%; 4 sigma is a deterministic
    // bound for this fixed dataset (the estimate never changes run to run).
    assert(math.abs(relErr) < 0.25, s"estimate $est vs exact $nExact (rel_err $relErr)")
    assert(relErr == (est - nExact.toDouble) / nExact.toDouble)
  }

  test("KMV sketches merge: min-k of a union == re-truncated union of min-k sets") {
    val hashes = graft.io.Tables.lineitem(spark, dir)
      .select(substring(md5($"l_orderkey".cast("string")), 1, 13).as("h"))
      .distinct().as[String].collect().sorted
    val k = Sketch.K
    val whole = hashes.take(k).toSeq
    // split the key space arbitrarily (by last hex char), sketch each side
    val (l, r) = hashes.partition(_.last <= '7')
    val mergedSketch = (l.take(k) ++ r.take(k)).distinct.sorted.take(k).toSeq
    assert(mergedSketch == whole,
      "merging per-partition min-k sets must reproduce the global sketch")
  }

  test("x_cms_freq never under-counts and is exact for unique buckets") {
    val rows = Sketch.cmsFreq(spark, dir)
      .select($"n_true", $"estimate", $"over_count")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 20)
    // CMS one-sided guarantee: estimate >= truth, always.
    assert(rows.forall { case (t, e, o) => e >= t && o == e - t })
  }
}
