package graft.llm

import graft.SparkSpec

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)]): Map[Long, (Long, Boolean)] =
    Cluster.componentsOver(pairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Boolean)].collect()
      .map { case (d, c, k) => d -> (c, k) }.toMap

  test("two disjoint components get their own min-id labels") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false),
      10L -> (10L, true), 11L -> (10L, false)))
  }

  test("a chain converges to one component (transitive closure)") {
    // 5-4, 4-3, 3-2, 2-1: min label must travel the full chain length.
    val got = components(Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)))
    assert(got.values.map(_._1).toSet == Set(1L))
    assert(got.count(_._2._2) == 1 && got(1L)._2)
  }

  test("bridged buckets merge into one cluster") {
    // two stars {1,2,3} and {7,8,9} bridged by 3-7.
    val got = components(Seq((1L, 2L), (1L, 3L), (7L, 8L), (7L, 9L), (3L, 7L)))
    assert(got.values.map(_._1).toSet == Set(1L))
  }

  test("a 60-node chain converges within MaxRounds (pointer jumping)") {
    // Plain propagation would need 59 rounds (> MaxRounds = 25); the
    // label-of-label shortcut makes this O(log diameter). Gate forced to 0
    // so the DISTRIBUTED path runs (the driver union-find would hide it).
    val chain = (1L until 60L).map(i => (i, i + 1))
    val got = Cluster.componentsOver(
        chain.toDF("doc_a", "doc_b"), driverSolveMaxPairs = 0L)
      .as[(Long, Long, Boolean)].collect()
      .map { case (d, c, k) => d -> (c, k) }.toMap
    assert(got.size == 60 && got.values.map(_._1).toSet == Set(1L))
  }

  test("exactly one keeper per cluster, keeper is the min id") {
    val got = components(Seq((5L, 9L), (9L, 2L), (20L, 30L)))
    val byCluster = got.toSeq.groupBy(_._2._1)
    assert(byCluster.keySet == Set(2L, 20L))
    byCluster.foreach { case (cid, members) =>
      val keepers = members.filter(_._2._2).map(_._1)
      assert(keepers == Seq(cid))
    }
  }
}
