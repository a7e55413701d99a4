package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemanticSpec extends SparkSpec {
  import spark.implicits._

  /** Build a (vec_id, v) frame from (id, vector) pairs. */
  private def frame(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "v")

  test("planted identical vectors dedup greedily to the lowest id") {
    // 48 nearly-orthogonal basis fillers + an identical triple {0, 5, 9}.
    val dup = Seq.fill(8)(1.0) ++ Seq.fill(8)(0.0)
    val fillers = (1L to 60L).filterNot(i => i == 5L || i == 9L).map { i =>
      val v = Array.fill(16)(0.0)
      v(((i * 7) % 16).toInt) = 1.0
      v((i % 16).toInt) += 0.5
      (i, v.toSeq)
    }
    val rows = Seq(0L -> dup, 5L -> dup, 9L -> dup) ++ fillers
    val out = Semantic.semanticDedupOver(spark, frame(rows))
      .as[(Long, Long, Int, Long)].collect().toList.sortBy(_._1)
    // identical vectors always share an argmax cluster, so greedy
    // keep-lowest must drop 5 (keeper 0, one lower partner) and 9
    // (keeper 0, partners {0, 5}).
    val byLoser = out.map(r => r._1 -> r).toMap
    assert(byLoser.contains(5L) && byLoser(5L)._2 == 0L && byLoser(5L)._4 == 1L)
    assert(byLoser.contains(9L) && byLoser(9L)._2 == 0L && byLoser(9L)._4 == 2L)
    assert(!byLoser.contains(0L), "the keeper must never appear as a loser")
  }

  test("an all-orthogonal corpus has no semantic duplicates") {
    val rows = (0L until 32L).map { i =>
      val v = Array.fill(32)(0.0)
      v(i.toInt) = 1.0
      (i, v.toSeq)
    }
    assert(Semantic.semanticDedupOver(spark, frame(rows)).count() == 0L)
  }

  test("losers always have a lower-id keeper in the same cluster") {
    // pseudo-random corpus; structural invariants must hold regardless
    val rnd = new scala.util.Random(7)
    val rows = (0L until 80L).map { i =>
      (i, Seq.fill(8)(rnd.nextDouble() - 0.5))
    }
    val out = Semantic.semanticDedupOver(spark, frame(rows))
      .as[(Long, Long, Int, Long)].collect()
    out.foreach { case (loser, keeper, cid, n) =>
      assert(keeper < loser, s"keeper $keeper !< loser $loser")
      assert(n >= 1L)
      assert(cid >= 0 && cid < Semantic.NList)
    }
  }
}
