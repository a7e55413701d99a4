package graft.analytics

import java.security.MessageDigest

import graft.SparkSpec
import graft.io.Tables

class RandWalkSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("x_rand_walk picks exactly the md5-argmin neighbor at every step") {
    val adj = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect().toSeq
      .groupBy(_._1).values.toSeq
      .flatMap { basket =>
        val ps = basket.map(_._2).distinct
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }
      .toSet.groupBy((p: (Long, Long)) => p._1)
      .view.mapValues(_.map(_._2)).toMap

    val out = RandWalk.randWalk(spark, dir)
      .as[(Long, Int, Long, Long, Long)].collect()

    // one row per (sampled start) × walk, sampling by the md5 hex gate
    val sampled = adj.keySet.filter(s =>
      "0123".contains(md5hex(s"ws:$s").charAt(0)))
    assert(out.map(_._1).toSet == sampled)
    assert(out.length == sampled.size * RandWalk.Walks)
    assert(out.map(r => (r._1, r._2)).distinct.length == out.length)

    out.foreach { case (start, walk, n1, n2, n3) =>
      var cur = start
      Seq(n1, n2, n3).zipWithIndex.foreach { case (next, i) =>
        val nbrs = adj(cur)
        assert(nbrs.contains(next)) // every hop is a real edge
        val pick = nbrs.minBy { d =>
          val h60 = java.lang.Long.parseLong(
            md5hex(s"$start:$walk:${i + 1}:$d").substring(0, 15), 16)
          (h60, d)
        }
        assert(next == pick, s"start=$start walk=$walk step=${i + 1}")
        cur = next
      }
    }

    // the two walks from one start genuinely diverge somewhere
    val diverged = out.groupBy(_._1).values.count { ws =>
      ws.map(w => (w._3, w._4, w._5)).distinct.length > 1
    }
    assert(diverged > sampled.size / 2)
  }

  test("every step broadcasts the FRONTIER side in the AQE-final plan") {
    // The broadcast(f) hint is load-bearing (RandWalk.scala: edge-side
    // broadcast measured 15.3 s vs 5.0 s at sf0.1) and, until this spec,
    // nothing would catch it being lost — the plan still executes, just
    // 3-4x slower, which is exactly the in-suite inflation profile the
    // round-8 driver bench showed. The frontier is always the LEFT join
    // input, so every join must plan as BroadcastHashJoin BuildLeft; an
    // edge-side broadcast shows up as BuildRight, a lost hint usually as
    // SortMergeJoin.
    val df = RandWalk.randWalk(spark, dir)
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    val joins = plan.linesIterator
      .filter(_.contains("BroadcastHashJoin")).toSeq
    assert(joins.size == RandWalk.Steps,
      s"expected ${RandWalk.Steps} broadcast joins:\n$plan")
    assert(joins.forall(_.contains("BuildLeft")),
      s"a step broadcasts the EDGE side, not the frontier:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"a step lost its broadcast hint entirely:\n$plan")
  }
}
