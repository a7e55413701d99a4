package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Bounded breadth-first search over the co-purchase graph
  * ([[PageRank.edges]] — one shared graph definition): minimum hop distance
  * from a seed part set, capped at [[MaxHops]] hops. The "blast radius"
  * query of recommendation / influence analysis.
  *
  * Scale: synchronous frontier expansion — each hop is ONE equi join of the
  * current frontier against the src-partitioned edge list plus an anti-join
  * against the visited set, so hop h touches only the newly reachable rim,
  * never the whole graph. The frontier is localCheckpointed per hop to cut
  * the iterative lineage (the 2^k re-execution trap — BENCH_NOTES #10).
  * BFS discovery order IS minimum distance, so no min-aggregate over all
  * walks is needed — the oracle's recursive-CTE UNION walk with a final
  * `min(d)` proves exactly that equivalence.
  */
object Bfs {

  val MaxHops = 3
  val SeedMax = 5L // seeds: parts with partkey < 5 appearing in lineitem

  def bfsDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = PageRank.edges(spark, dir).localCheckpoint()
    val seeds = Tables.lineitem(spark, dir)
      .select($"l_partkey".as("node")).filter($"node" < SeedMax).distinct()
      .withColumn("dist", lit(0L))
    var visited = seeds.localCheckpoint()
    var frontier = visited
    (1 to MaxHops).foreach { h =>
      // frontier and visited are node-bounded (≤|V| rows, two columns) —
      // broadcast both, so each hop is ONE map-side pass over the
      // src-partitioned edge list plus the candidates' distinct (which
      // partial-aggregates map-side down to ≤|V| rows before its
      // exchange). Nothing edge-sized ever shuffles inside the loop; on a
      // graph whose frontier outgrows a broadcast, drop the hints and the
      // same plan degrades to shuffle joins on the already-partitioned key.
      val candidates = broadcast(frontier).join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
      frontier = candidates
        .join(broadcast(visited), Seq("node"), "left_anti")
        .withColumn("dist", lit(h.toLong))
        .localCheckpoint()
      visited = visited.union(frontier).localCheckpoint()
    }
    visited.orderBy($"node")
  }

  val bfsDistSql: String =
    s"""WITH RECURSIVE e AS (
       | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       | FROM lineitem a JOIN lineitem b
       |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |walk(node, d) AS (
       | SELECT DISTINCT l_partkey, 0 FROM lineitem WHERE l_partkey < $SeedMax
       | UNION
       | SELECT e.dst, w.d + 1 FROM walk w JOIN e ON w.node = e.src
       | WHERE w.d < $MaxHops)
       |SELECT node, CAST(min(d) AS BIGINT) AS dist
       |FROM walk GROUP BY node
       |ORDER BY node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bfs_dist" -> (bfsDist _))

  val oracles: Map[String, String] = Map(
    "x_bfs_dist" -> bfsDistSql)
}
