package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** 90% of rows share one hot key — the bot-user shape. */
  private lazy val skewed = (1 to 1000).map { i =>
    val key = if (i % 10 == 0) i.toLong % 7 else 42L
    (key, i.toLong, i * 1.0)
  }.toDF("key", "id", "v")

  test("twoPhaseAgg equals the plain aggregation on skewed data") {
    val plain = skewed.groupBy($"key").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(Long, Long, Double)].collect().toSet
    val salted = Skew.twoPhaseAgg(
      skewed, $"key", $"id", saltBuckets = 8,
      partial = Seq(count(lit(1)).as("pn"), sum($"v").as("ps")),
      fin = Seq(sum($"pn").as("n"), sum($"ps").as("s")), keyName = "key")
      .select($"key", $"n", $"s")
      .as[(Long, Long, Double)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    val dim = (0L to 50L).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = skewed.join(dim, skewed("key") === dim("k"))
      .select($"id", $"name").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", "k", saltBuckets = 8,
      leftDistributor = $"id")
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("twoPhaseAgg actually spreads the hot key over salt buckets") {
    val partials = skewed
      .withColumn("__salt", pmod(hash($"id"), lit(8)))
      .filter($"key" === 42L)
      .groupBy($"key", $"__salt").count()
    assert(partials.count() > 1) // the hot key occupies multiple partial groups
  }

  test("q_user_stats_salted plans a two-level aggregate and matches unsalted") {
    import graft.io.Tables
    val dir = "/root/testdata/sf0.001"
    val salted = Sessions.userStatsSalted(spark, dir)
    // the salt key must appear in the physical aggregate (phase 1 groups on it)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salted grouping missing from plan:\n$plan")
    val got = salted.as[(Long, Long, Double, Long)].collect().toSeq
    val want = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum(graft.util.Det.cents($"value")).cast("double") / 100.0).as("total_value"),
        (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("span_us"))
      .orderBy($"user_id")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got == want)
  }
}
