package graft.io

import graft.SparkSpec

class ObservedSpec extends SparkSpec {
  import spark.implicits._

  test("row metrics ride the action's own pass — no second scan") {
    val df = Seq(Some(1.0), Some(2.0), None, Some(4.0)).toDF("v")
    val (observed, m) = Observed.rowStats(df, "t1", nullCols = Seq("v"))
    observed.write.format("noop").mode("overwrite").save()
    assert(m("n_rows") == 4L)
    assert(m("n_null_v") == 1L)
  }

  test("unfilled metrics throw instead of reading as zero") {
    val df = Seq(1).toDF("v")
    val (_, m) = Observed.rowStats(df, "t2")
    // no action ran on the observed frame
    intercept[IllegalStateException] { m("n_rows", timeoutMs = 300) }
  }
}
