package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
    (3L, Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, -0.6))
  ).toDF("id", "a", "b")

  test("native cosine_sim is bit-identical to the higher-order-function form") {
    GraftFunctions.register(spark)
    val rows = vecs.select(
      call_function("cosine_sim", $"a", $"b").as("fast"),
      Similarity.cosine($"a", $"b").as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, hof) =>
      assert(java.lang.Double.doubleToLongBits(fast) == java.lang.Double.doubleToLongBits(hof))
    }
  }

  test("registration is idempotent and survives re-registration") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val v = vecs.select(call_function("cosine_sim", $"a", $"a").as("c"))
      .as[Double].collect()
    v.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("type mismatch is rejected at analysis with the expression's message") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq((1, "x")).toDF("i", "s")
        .select(call_function("cosine_sim", col("i"), col("s"))).collect()
    }
    assert(e.getMessage.contains("cosine_sim") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("null array yields null (null-intolerant)") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(call_function("cosine_sim", $"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }

  test("a null ELEMENT yields null, not a 0.0-substituted score") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
    val r = df.select(call_function("cosine_sim", $"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }

  test("zero-norm input yields null (try_divide semantics), never NaN") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(call_function("cosine_sim", $"a", $"b")).collect().head
    assert(r.isNullAt(0))
    // the HOF's bare Divide throws under default ANSI — the documented reason
    // cosine_sim deviates to try_divide semantics here
    intercept[Exception] {
      df.select(Similarity.cosine($"a", $"b")).collect()
    }
  }

  test("mismatched lengths yield null, matching zip_with's null padding") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(
      call_function("cosine_sim", $"a", $"b").as("fast"),
      Similarity.cosine($"a", $"b").as("hof")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
