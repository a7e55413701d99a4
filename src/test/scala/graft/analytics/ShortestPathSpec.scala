package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShortestPathSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Independent model: hop-bounded DP over driver-collected weighted
    * edges — dp(h)(v) = min cost of a ≤h-edge path from the seed set.
    */
  private def model(): Map[Long, Long] = {
    val li = graft.io.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val pairCount: Map[(Long, Long), Long] =
      li.toSeq.groupBy(_._1).values.toSeq.flatMap { basket =>
        val parts = basket.map(_._2).distinct
        for (a <- parts; b <- parts if a != b) yield (a, b)
      }.groupBy(identity).map { case (p, os) => p -> os.size.toLong }
    val edges = pairCount.toSeq.map { case ((a, b), c) =>
      (a, b, if (c >= ShortestPath.StrongMin) 1L else 2L)
    }
    val bySrc = edges.groupBy(_._1)
    var dist: Map[Long, Long] =
      li.map(_._2).filter(_ < ShortestPath.SeedMax).distinct.map(_ -> 0L).toMap
    (1 to ShortestPath.MaxRounds).foreach { _ =>
      val relaxed = dist.toSeq.flatMap { case (v, d) =>
        bySrc.getOrElse(v, Seq.empty).map { case (_, u, w) => (u, d + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, ds) => v -> ds.map(_._2).min }
    }
    dist
  }

  test("x_shortest_path equals the hop-bounded DP model") {
    val got = ShortestPath.shortestPath(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == model())
  }

  test("seeds are exactly the zero-distance nodes") {
    val got = ShortestPath.shortestPath(spark, dir)
      .as[(Long, Long)].collect()
    val zeros = got.filter(_._2 == 0L).map(_._1).toSet
    assert(zeros.nonEmpty && zeros.forall(_ < ShortestPath.SeedMax))
    assert(got.filter(_._1 < ShortestPath.SeedMax).forall(_._2 == 0L))
  }

  test("weights are load-bearing: some node is cheaper than 2x its hop count") {
    // If every edge cost 2 (all-weak), dist would be exactly 2*hops; a
    // strong tie on a shortest route makes dist < 2*hops somewhere.
    val hops = Bfs.bfsDist(spark, dir).as[(Long, Long)].collect().toMap
    val dist = ShortestPath.shortestPath(spark, dir)
      .as[(Long, Long)].collect().toMap
    // Sanity: hops <= dist <= 2*hops for every commonly-reached node
    // (MaxHops = MaxRounds, so the reachable sets coincide).
    assert(dist.keySet == hops.keySet)
    assert(dist.forall { case (v, d) => d >= hops(v) && d <= 2 * hops(v) })
    assert(dist.exists { case (v, d) => d < 2 * hops(v) })
  }
}
