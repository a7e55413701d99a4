package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinCountsSpec extends SparkSpec {
  import spark.implicits._

  private def hist(vals: Seq[Option[Double]], lo: Double, hi: Double, n: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    vals.toDF("v")
      .agg(call_function("bin_counts", $"v", lit(lo), lit(hi), lit(n)).as("h"))
      .as[Seq[Long]].head()
  }

  test("values bin by floor((v-lo)/width); out-of-range clamps; NULLs ignored") {
    val got = hist(
      Seq(Some(0.0), Some(9.99), Some(10.0), Some(25.0), Some(-5.0), Some(99.0), None),
      lo = 0.0, hi = 30.0, n = 3)
    // width 10: [0,10)→2, [10,20)→1, [20,30)+clamped-high→2; -5 clamps low
    assert(got == Seq(3L, 1L, 2L))
  }

  test("result is partition-order independent (vector-add merge)") {
    GraftFunctions.register(spark)
    val vals = (1 to 1000).map(_.toDouble)
    val one = vals.toDF("v").repartition(1)
      .agg(call_function("bin_counts", $"v", lit(0.0), lit(1000.0), lit(10)))
      .as[Seq[Long]].head()
    val many = vals.toDF("v").repartition(7)
      .agg(call_function("bin_counts", $"v", lit(0.0), lit(1000.0), lit(10)))
      .as[Seq[Long]].head()
    assert(one == many && one.sum == 1000L)
  }

  test("null or invalid literal params fail analysis cleanly, no NPE") {
    GraftFunctions.register(spark)
    Seq(1.0).toDF("v").createOrReplaceTempView("bc_bad")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bin_counts(v, 0.0, 4.0, CAST(NULL AS INT)) FROM bc_bad").collect()
    }
    assert(e.getMessage.contains("non-null numeric literals") ||
      e.getMessage.toLowerCase.contains("bin_counts"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bin_counts(v, 4.0, 0.0, 2) FROM bc_bad").collect()
    }
    assert(e2.getMessage.contains("hi must be greater than lo") ||
      e2.getMessage.toLowerCase.contains("bin_counts"))
  }

  test("works through the SQL registry too") {
    GraftFunctions.register(spark)
    Seq(1.0, 2.0).toDF("v").createOrReplaceTempView("bc_t")
    // width 2: 1.0 → [0,2) = bin 0; 2.0 → [2,4) = bin 1
    val got = spark.sql("SELECT bin_counts(v, 0.0, 4.0, 2) AS h FROM bc_t")
      .as[Seq[Long]].head()
    assert(got == Seq(1L, 1L))
  }
}
