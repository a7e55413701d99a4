package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.util.Ckpt._

/** Bounded WEIGHTED shortest paths over the co-purchase graph — the
  * Bellman–Ford relaxation [[Bfs]]'s unweighted hop count cannot express:
  * a strong tie (parts sharing ≥ [[StrongMin]] orders) costs 1, a weak tie
  * costs 2, and the cheapest ≤[[MaxRounds]]-edge route from the seed set is
  * NOT the fewest-hop route (two strong hops beat one weak hop — the spec
  * pins a node where the weighted answer and 2×BFS-hops disagree).
  *
  * Distance semantics: dist(v) = min over walks of ≤[[MaxRounds]] edges from
  * any seed of the edge-cost sum. Positive costs make walk-min ≡ path-min,
  * which is exactly what the oracle's recursive-CTE walk + final `min(d)`
  * computes — the same equivalence [[Bfs]] pins for hops, lifted to weights.
  *
  * Scale shape: the weighted edge list is built with ONE shuffle (the
  * basket aggregate shared with [[PageRank]]; the per-(src,dst) shared-order
  * count falls out of the same pair explosion partition-locally after the
  * explicit dst repartition), checkpointed DISK_ONLY like every iterative
  * substrate in the graph tier. Each relaxation round is one broadcast join
  * of the node-bounded FRONTIER (only nodes whose distance improved last
  * round — the textbook Bellman–Ford work cut; round sizes at sf0.1:
  * 5→1132→1181→2 nodes, so round 3+ is near-free where the naive
  * all-nodes relaxation re-scans everything) against the dst-partitioned
  * edges, whose candidate fan-out min-aggregates PARTITION-LOCAL in that
  * carried layout, then a node-bounded merge with the old distances.
  * Distance frames are node-bounded; on a graph whose node set outgrows a
  * broadcast the same joins degrade to shuffle joins on the
  * already-partitioned key. The round's two multiply-referenced frames
  * (edges, merged distances) are localCheckpointed — the 2^k
  * iterative-lineage trap (BENCH_NOTES #10); the once-consumed frontier
  * is not.
  */
object ShortestPath {

  val MaxRounds = 4
  val SeedMax = 5L // same seed set as Bfs: parts with partkey < 5
  /** Shared-order count at or above which a co-purchase tie is "strong". */
  val StrongMin = 2L

  /** Directed weighted edges: (src, dst, w) with w = 1 for strong ties
    * (≥ [[StrongMin]] distinct shared orders), 2 for weak ones. Built from
    * the same basket-aggregate pair explosion as [[PageRank.edges]]; the
    * count of shared orders per pair replaces the dedup (each order
    * contributes its basket's pairs exactly once — `collect_set` dedups
    * within the basket — so `count(*)` per (src,dst) IS the distinct shared
    * -order count), and runs partition-local after the repartition for the
    * same exchange-free reason (dst ⊆ (src,dst) clusters the count keys
    * just as src did). DST, for the same reason as [[PageRank.edges]]: the
    * relaxation joins stream the edge side against a broadcast frontier,
    * so the layout is free to choose, and a dst layout lands each round's
    * candidate frame already keyed by the node it relaxes — the candidate
    * min-aggregate runs partition-local (see [[shortestPath]]).
    */
  private[analytics] def weightedEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey")
    li.groupBy($"l_orderkey").agg(collect_set($"l_partkey").as("ps"))
      .select(explode($"ps").as("src"), $"ps")
      .select($"src", explode($"ps").as("dst"))
      .where($"src" =!= $"dst")
      .repartition(spark.sparkContext.defaultParallelism, $"dst")
      .groupBy($"src", $"dst").agg(count(lit(1)).as("c"))
      .select($"src", $"dst",
        when($"c" >= StrongMin, 1L).otherwise(2L).as("w"))
  }

  def shortestPath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = weightedEdges(spark, dir)
      .ckptDisk()
    val seeds = Tables.lineitem(spark, dir)
      .select($"l_partkey".as("node")).filter($"node" < SeedMax).distinct()
      .withColumn("dist", lit(0L)).ckptDisk()
    var dist = seeds
    var frontier = seeds
    (1 to MaxRounds).foreach { _ =>
      // The relaxation's fan-out frame (one row per frontier-incident edge)
      // is min-aggregated BEFORE touching the node frame: the broadcast
      // join streams the dst-partitioned edge side in place and the alias
      // dst→node carries that layout (ckptDisk keeps it across e's lineage
      // cut — Bridge.repairCheckpointLayout), so this aggregate — the only
      // edge-fan-out-sized step of the round — runs PARTITION-LOCAL. The
      // merge below then handles two node-bounded frames only; folding the
      // fan-out into the union (the previous shape) re-exchanged it every
      // round. min is associative, so min(dist ∪ cand) ≡
      // min(dist ∪ min-per-node(cand)) — same exact longs, same hashes.
      val candMin = e.join(broadcast(frontier), e("src") === frontier("node"))
        .select($"dst".as("node"), ($"dist" + $"w").as("dist"))
        .groupBy($"node").agg(min($"dist").as("dist"))
      val merged = dist.union(candMin)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .ckptDisk()
      // Next frontier: strictly-improved nodes only. A node absent from the
      // old frame joins with old=null (new discovery — improved by
      // definition); an unimproved node relaxes nothing new next round.
      // No checkpoint: improved is consumed exactly once (next round's
      // broadcast build) and both its inputs are checkpointed, so the
      // subtree is depth-1 and executes once — the eager checkpoint was a
      // fourth job per round writing a frame nobody reads twice.
      val improved = merged
        .join(dist.withColumnRenamed("dist", "old"), Seq("node"), "left")
        .filter($"old".isNull || $"dist" < $"old")
        .select($"node", $"dist")
      dist = merged
      frontier = improved
    }
    dist.orderBy($"node")
  }

  val shortestPathSql: String =
    s"""WITH RECURSIVE pc AS (
       | SELECT a.l_partkey AS src, b.l_partkey AS dst,
       |        count(DISTINCT a.l_orderkey) AS c
       | FROM lineitem a JOIN lineitem b
       |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
       | GROUP BY 1, 2),
       |e AS (
       | SELECT src, dst, CASE WHEN c >= $StrongMin THEN 1 ELSE 2 END AS w
       | FROM pc),
       |walk(node, d, h) AS (
       | SELECT DISTINCT l_partkey, 0, 0 FROM lineitem WHERE l_partkey < $SeedMax
       | UNION
       | SELECT e.dst, wk.d + e.w, wk.h + 1
       | FROM walk wk JOIN e ON wk.node = e.src
       | WHERE wk.h < $MaxRounds)
       |SELECT node, CAST(min(d) AS BIGINT) AS dist
       |FROM walk GROUP BY node
       |ORDER BY node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_shortest_path" -> (shortestPath _))

  val oracles: Map[String, String] = Map(
    "x_shortest_path" -> shortestPathSql)
}
