package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def intersect(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    GraftFunctions.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(call_function("sorted_intersect", $"a", $"b").as("c"))
      .as[Seq[Long]].head()
  }

  test("matches array_intersect on sorted inputs") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val expected = Seq((a, b)).toDF("a", "b")
        .select(array_sort(array_intersect($"a", $"b")).as("c"))
        .as[Seq[Long]].head()
      assert(intersect(a, b) == expected, s"a=$a b=$b")
    }
  }

  test("duplicates contribute once; empty and disjoint inputs work") {
    assert(intersect(Seq(1L, 1L, 2L, 3L, 3L), Seq(1L, 3L, 3L, 9L)) == Seq(1L, 3L))
    assert(intersect(Seq.empty, Seq(1L, 2L)) == Seq.empty)
    assert(intersect(Seq(1L, 2L), Seq(3L, 4L)) == Seq.empty)
  }

  test("interpreted eval equals the codegen path") {
    GraftFunctions.register(spark)
    val df = (1 to 50).map { i =>
      ((1L to i.toLong).toSeq, (i / 2L to 40L).toSeq)
    }.toDF("a", "b")
    val viaCodegen = df
      .select(call_function("sorted_intersect", $"a", $"b").as("c"))
      .as[Seq[Long]].collect().toSeq
    // filter(... === ...) over a local relation constant-folds through the
    // interpreted eval path
    val viaEval = df.collect().map { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      SortedIntersect(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }.toSeq
    assert(viaCodegen == viaEval)
  }
}
