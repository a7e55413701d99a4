package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch aggregates (HLL++ via approx_count_distinct) — not oracle-gated
  * (sketch internals differ per engine), so accuracy is pinned here against
  * the exact count instead. The scale story: the sketch shuffles a constant
  * few KB per group however many distinct values exist, where exact
  * countDistinct shuffles every distinct value.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on 50k skewed keys") {
    val df = spark.range(50000)
      .select((col("id") % 9973).as("k")) // 9973 distinct, skew-free modulus
    val exact = df.select(countDistinct($"k")).as[Long].head()
    val approx = df.select(approx_count_distinct($"k")).as[Long].head()
    assert(exact == 9973L)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("tighter rsd parameter tightens the estimate") {
    val df = spark.range(100000).select((col("id") % 31337).as("k"))
    val exact = 31337.0
    val loose = df.select(approx_count_distinct($"k", 0.1)).as[Long].head()
    val tight = df.select(approx_count_distinct($"k", 0.005)).as[Long].head()
    assert(math.abs(tight - exact) / exact < 0.02)
    assert(math.abs(tight - exact) <= math.abs(loose - exact) ||
      math.abs(loose - exact) / exact < 0.02)
  }
}
