package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded top-k aggregate must match a driver-side sort under any
  * partitioning (including heavy ord ties), and its plan must carry a
  * partial aggregation stage — the map-side fold that makes it the
  * scalable per-group top-k form.
  */
class TopKRowsSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_rows matches driver-side sort on random tied data, any layout") {
    GraftFunctions.register(spark)
    val rnd = new Random(7)
    // small ord domain => many ties => the tag tie-break is load-bearing
    val data = Seq.fill(500)((rnd.nextInt(20).toLong, rnd.nextLong(), rnd.nextInt(4)))
    Seq(1, 3, 8).foreach { parts =>
      val df = spark.createDataset(data).toDF("ord", "tag", "g")
        .repartition(parts)
      val got = df.groupBy($"g")
        .agg(call_function("top_k_rows", $"ord", $"tag", lit(5)).as("top"))
        .select($"g", $"top")
        .as[(Int, Seq[(Long, Long)])].collect().toMap
      val want = data.groupBy(_._3).map { case (g, rows) =>
        g -> rows.map(r => (r._1, r._2))
          .sortBy { case (o, t) => (-o, t) }.take(5)
      }
      assert(got.keySet == want.keySet)
      want.foreach { case (g, exp) => assert(got(g) == exp, s"group $g") }
    }
  }

  test("top_k_rows plans with a partial (map-side) aggregation stage") {
    GraftFunctions.register(spark)
    val df = spark.range(100).select(($"id" % 5).as("g"), $"id".as("v"))
      .groupBy($"g")
      .agg(call_function("top_k_rows", $"v", $"v", lit(2)).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_rows") || plan.contains("partial top_k_rows"),
      s"expected a partial aggregation stage in:\n$plan")
  }

  test("top_k_rows keeps fewer than k rows when the group is small") {
    GraftFunctions.register(spark)
    val df = Seq((1L, 10L), (1L, 11L)).toDF("g", "v")
      .groupBy($"g")
      .agg(call_function("top_k_rows", $"v", $"v", lit(5)).as("top"))
    val top = df.as[(Long, Seq[(Long, Long)])].collect().head._2
    assert(top == Seq((11L, 11L), (10L, 10L)))
  }
}
