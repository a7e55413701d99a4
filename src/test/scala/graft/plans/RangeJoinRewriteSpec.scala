package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The range-join rewrite must (a) produce exactly the naive join's rows,
  * (b) replace the nested-loop physical plan with an equi join on the
  * bucket key, and (c) never touch joins outside its guarded shape.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def pts = spark.range(0, 200).select($"id".as("pt"))
  private def ivs = spark.range(0, 40)
    .select(($"id" * 5).as("lo"), ($"id" * 5 + 11).as("hi"))

  private def naive(p: DataFrame, i: DataFrame): DataFrame =
    p.join(i, p("pt") >= i("lo") && p("pt") <= i("hi"))
      .groupBy($"lo").agg(count(lit(1)).as("n")).orderBy($"lo")

  test("rewrite preserves the naive join's rows exactly") {
    val before = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = Nil
      val want = naive(pts, ivs).as[(Long, Long)].collect().toSeq
      RangeJoinRewrite.install(spark)
      val got = naive(pts, ivs).as[(Long, Long)].collect().toSeq
      assert(got == want)
      assert(want.nonEmpty)
    } finally spark.experimental.extraOptimizations = before
  }

  test("rewrite replaces the nested-loop plan with a bucket equi join") {
    val before = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = Nil
      val naivePlan = naive(pts, ivs).queryExecution.executedPlan.toString
      assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
        naivePlan.contains("CartesianProduct"))
      RangeJoinRewrite.install(spark)
      val plan = naive(pts, ivs).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      assert(!plan.contains("CartesianProduct"))
      assert(plan.contains("__graft_pt_bucket") || plan.contains("__graft_iv_bucket"))
    } finally spark.experimental.extraOptimizations = before
  }

  test("inverted intervals (lo > hi) yield no rows instead of crashing") {
    val before = spark.experimental.extraOptimizations
    try {
      RangeJoinRewrite.install(spark)
      val p = spark.range(0, 20).select($"id".as("pt"))
      val i = Seq((5L, 15L), (12L, 3L)).toDF("lo", "hi") // second is inverted
      val got = p.join(i, p("pt") >= i("lo") && p("pt") <= i("hi"))
        .select($"pt", $"lo").as[(Long, Long)].collect().toSet
      assert(got == (5L to 15L).map(x => (x, 5L)).toSet)
    } finally spark.experimental.extraOptimizations = before
  }

  test("guards: equi-keyed, non-long, and outer joins are left alone") {
    val before = spark.experimental.extraOptimizations
    try {
      RangeJoinRewrite.install(spark)
      // equi + range: stays an equi join on the real key, no bucket columns
      val k1 = pts.withColumn("k", $"pt" % 7)
      val k2 = ivs.withColumn("k", $"lo" % 7)
      val equi = k1.join(k2, k1("k") === k2("k") &&
        k1("pt") >= k2("lo") && k1("pt") <= k2("hi"))
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft"))
      // int (not long) operands: untouched
      val ip = spark.range(0, 50).select($"id".cast("int").as("pt"))
      val ii = spark.range(0, 9)
        .select(($"id" * 5).cast("int").as("lo"), ($"id" * 5 + 11).cast("int").as("hi"))
      val intJoin = ip.join(ii, ip("pt") >= ii("lo") && ip("pt") <= ii("hi"))
      assert(!intJoin.queryExecution.executedPlan.toString.contains("__graft"))
      // left outer: untouched
      val (p, i) = (pts, ivs)
      val outer = p.join(i, p("pt") >= i("lo") && p("pt") <= i("hi"), "left")
      assert(!outer.queryExecution.executedPlan.toString.contains("__graft"))
    } finally spark.experimental.extraOptimizations = before
  }
}
