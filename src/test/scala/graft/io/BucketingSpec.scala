package graft.io

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.count() // finalize any adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("join of two bucketed tables on the bucket key plans ZERO shuffles") {
    // the in-memory catalog dies with each test JVM but the warehouse dir
    // survives — clear both or CREATE TABLE fails on the stale location
    Seq("t_orders_b", "t_custs_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    val orders = (1L to 1000L).map(i => (i, i % 100, i * 10.0)).toDF("o_id", "cust", "total")
    val custs = (0L until 100L).map(i => (i, s"c$i")).toDF("c_id", "name")
    Bucketing.writeBucketed(orders, "t_orders_b", "cust", 4)
    Bucketing.writeBucketed(custs, "t_custs_b", "c_id", 4)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "t_orders_b", "t_custs_b", "cust", "c_id")
      assert(joined.count() == 1000)
      val plan = planString(joined)
      assert(!plan.contains("Exchange"), s"expected no exchanges, got:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("same join on unbucketed data DOES shuffle (the baseline being saved)") {
    val orders = (1L to 1000L).map(i => (i, i % 100, i * 10.0)).toDF("o_id", "cust", "total")
    val custs = (0L until 100L).map(i => (i, s"c$i")).toDF("c_id", "name")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = orders.join(custs, orders("cust") === custs("c_id"))
      assert(planString(joined).contains("Exchange"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
