package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pathological graph shapes for the k-core peel: the synchronous-rounds
  * semantics must behave on structures the co-purchase fixture never
  * produces — stars (everything peels), cliques (nothing peels), and the
  * chained-peel graph where round r's removals CAUSE round r+1's (the
  * case that catches an implementation that only peels once).
  */
class NeighborsAdversarialSpec extends SparkSpec {
  import spark.implicits._

  /** The same peel loop as Neighbors.kcore, over an arbitrary edge list. */
  private def kcoreOf(edges: Seq[(Long, Long)], k: Long, rounds: Int): Set[(Long, Long)] = {
    val und = edges.toDF("a", "b").distinct().localCheckpoint()
    def degrees(e: DataFrame): DataFrame =
      e.select($"a".as("node")).unionAll(e.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
    var alive = degrees(und).select($"node")
    for (_ <- 1 to rounds) {
      val cur = und
        .join(broadcast(alive.select($"node".as("a"))), "a")
        .join(broadcast(alive.select($"node".as("b"))), "b")
      alive = degrees(cur).filter($"deg" >= k).select($"node").localCheckpoint()
    }
    val fin = und
      .join(broadcast(alive.select($"node".as("a"))), "a")
      .join(broadcast(alive.select($"node".as("b"))), "b")
    degrees(fin).as[(Long, Long)].collect().toSet
  }

  test("a star graph peels to nothing at k=2") {
    val star = (1L to 10L).map(i => 0L -> i)
    assert(kcoreOf(star, k = 2, rounds = 6).isEmpty)
  }

  test("a clique is its own core; a pendant chain peels over MULTIPLE rounds") {
    val clique = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val coreOnly = kcoreOf(clique, k = 4, rounds = 6)
    assert(coreOnly == (0L until 5L).map(n => n -> 4L).toSet)
    // chain 10-11-12 hanging off node 0: removing 12 (deg 1) drops 11 to
    // deg 1 in round 2, then 10 in round 3 — the cascade only a true
    // iterated peel catches (k=2)
    val chain = clique ++ Seq(0L -> 10L, 10L -> 11L, 11L -> 12L)
    val after = kcoreOf(chain, k = 2, rounds = 6)
    assert(after.map(_._1) == (0L until 5L).toSet)
    val oneRound = kcoreOf(chain, k = 2, rounds = 1)
    assert(oneRound.map(_._1).contains(11L)) // single peel is NOT enough
  }
}
