package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def candidates(keys: Seq[Long], k: Int): Set[Long] = {
    GraftFunctions.register(spark)
    keys.toDF("key")
      .repartition(4) // force real partial buffers + a merge
      .agg(call_function("mg_candidates", $"key", lit(k)).as("c"))
      .select(explode($"c")).as[Long].collect().toSet
  }

  test("no false negatives: every key above N/(k+1) survives the sketch") {
    // Zipf-ish: key i gets ~1000/i occurrences, vocabulary 400 >> k=16
    val keys = (1 to 400).flatMap(i => Seq.fill(1000 / i)(i.toLong))
    val n = keys.length
    val k = 16
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustSurvive = exact.collect { case (key, c) if c > n / (k + 1) => key }.toSet
    val cand = candidates(keys, k)
    assert(cand.size <= k, s"candidate set ${cand.size} exceeds capacity $k")
    assert(mustSurvive.subsetOf(cand),
      s"lost heavy hitters: ${mustSurvive -- cand}")
  }

  test("capacity bound holds on an all-distinct stream") {
    val cand = candidates((1L to 5000L), 32)
    assert(cand.size <= 32)
  }

  test("a single dominant key always survives, any partitioning") {
    (1 to 4).foreach { parts =>
      GraftFunctions.register(spark)
      val keys = Seq.fill(900)(7L) ++ (1L to 300L)
      val cand = new scala.util.Random(parts) // vary shuffle seed via order
      val shuffled = cand.shuffle(keys)
      val got = shuffled.toDF("key").repartition(parts)
        .agg(call_function("mg_candidates", $"key", lit(8)).as("c"))
        .select(explode($"c")).as[Long].collect().toSet
      assert(got.contains(7L), s"parts=$parts lost the dominant key")
    }
  }

  test("heavy hitters two-pass query equals the plain aggregation") {
    import graft.analytics.Sketch
    val dir = "/root/testdata/sf0.001"
    val viaSketch = Sketch.heavyHitters(spark, dir)
      .select($"token", $"n").as[(String, Long)].collect().toList
    val toks = graft.io.Tables.documents(spark, dir)
      .select(explode(split(lower($"text"), " ")).as("token"))
    val n = toks.count()
    val plain = toks.groupBy($"token").agg(count(lit(1)).as("n"))
      .filter($"n" * Sketch.HhPhiDen > n)
      .orderBy($"n".desc, $"token")
      .as[(String, Long)].collect().toList
    assert(viaSketch == plain)
  }
}
