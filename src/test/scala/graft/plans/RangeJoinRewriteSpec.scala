package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The range-join rewrite must (a) produce exactly the naive join's rows,
  * (b) replace the nested-loop physical plan with an equi join on the
  * bucket key, and (c) never touch joins outside its guarded shape —
  * including the guarded SHAPE with bound columns not named with the
  * `__range_lo`/`__range_hi` opt-in markers (the session-global-install
  * safety gate).
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def pts = spark.range(0, 200).select($"id".as("pt"))
  private def ivs = spark.range(0, 40)
    .select(($"id" * 5).as("__range_lo"), ($"id" * 5 + 11).as("__range_hi"))

  private def naive(p: DataFrame, i: DataFrame): DataFrame =
    p.join(i, p("pt") >= i("__range_lo") && p("pt") <= i("__range_hi"))
      .groupBy($"__range_lo").agg(count(lit(1)).as("n")).orderBy($"__range_lo")

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
      // second interval is inverted
      val i = Seq((5L, 15L), (12L, 3L)).toDF("__range_lo", "__range_hi")
      val got = p.join(i, p("pt") >= i("__range_lo") && p("pt") <= i("__range_hi"))
        .select($"pt", $"__range_lo").as[(Long, Long)].collect().toSet
      assert(got == (5L to 15L).map(x => (x, 5L)).toSet)
    } finally spark.experimental.extraOptimizations = before
  }

  test("guards: unmarked names, equi-keyed, non-long, and outer joins are left alone") {
    val before = spark.experimental.extraOptimizations
    try {
      RangeJoinRewrite.install(spark)
      // the exact guarded shape but bound columns NOT named with the
      // markers: untouched — this is what makes session-global install safe
      val plainIvs = spark.range(0, 40)
        .select(($"id" * 5).as("lo"), ($"id" * 5 + 11).as("hi"))
      val p0 = pts
      val unmarked = p0.join(plainIvs,
        p0("pt") >= plainIvs("lo") && p0("pt") <= plainIvs("hi"))
      assert(!unmarked.queryExecution.executedPlan.toString.contains("__graft"))
      // equi + range: stays an equi join on the real key, no bucket columns
      val k1 = pts.withColumn("k", $"pt" % 7)
      val k2 = ivs.withColumn("k", $"__range_lo" % 7)
      val equi = k1.join(k2, k1("k") === k2("k") &&
        k1("pt") >= k2("__range_lo") && k1("pt") <= k2("__range_hi"))
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft"))
      // int (not long) operands: untouched
      val ip = spark.range(0, 50).select($"id".cast("int").as("pt"))
      val ii = spark.range(0, 9)
        .select(($"id" * 5).cast("int").as("__range_lo"),
          ($"id" * 5 + 11).cast("int").as("__range_hi"))
      val intJoin = ip.join(ii,
        ip("pt") >= ii("__range_lo") && ip("pt") <= ii("__range_hi"))
      assert(!intJoin.queryExecution.executedPlan.toString.contains("__graft"))
      // left outer: untouched
      val (p, i) = (pts, ivs)
      val outer = p.join(i,
        p("pt") >= i("__range_lo") && p("pt") <= i("__range_hi"), "left")
      assert(!outer.queryExecution.executedPlan.toString.contains("__graft"))
    } finally spark.experimental.extraOptimizations = before
  }
}
