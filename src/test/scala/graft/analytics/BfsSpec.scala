package graft.analytics

import graft.SparkSpec

/** BFS distances on a planted basket graph vs a driver-side BFS. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("bfsDist matches driver BFS on a planted chain of baskets") {
    // baskets: {0,10} {10,20} {20,30} {30,40} — a part chain 0-10-20-30-40;
    // plus an isolated basket {50} (no co-purchase partner).
    val dir = java.nio.file.Files.createTempDirectory("bfs").toString
    Seq((1L, 0L), (1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (3L, 30L),
      (4L, 30L), (4L, 40L), (5L, 50L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Bfs.bfsDist(spark, dir)
      .as[(Long, Long)].collect().toMap
    // seeds: parts < 5 in lineitem -> {0}. chain distances, cap at 3 hops;
    // 40 is 4 hops away -> absent; 50 unreachable -> absent.
    assert(got == Map(0L -> 0L, 10L -> 1L, 20L -> 2L, 30L -> 3L))
  }
}
