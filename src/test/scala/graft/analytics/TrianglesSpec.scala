package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_triangles matches a brute-force count on the fixture graph") {
    // Brute force: enumerate all (a < b < c) node triples among edges via
    // a driver-side adjacency set — only feasible at fixture scale.
    val li = graft.io.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val parts = basket.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val perNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, bs) <- adj; b <- bs
      cs <- adj.get(b).toSeq; c <- cs
      if edges.contains((a, c))
    } {
      perNode(a) += 1; perNode(b) += 1; perNode(c) += 1
    }
    val expected = perNode.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Triangles.triangles(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("triangle participation is even and positive") {
    val got = Triangles.triangles(spark, dir).as[(Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._2 > 0))
  }
}
