package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.util.Ckpt._

/** Triangle counting over the co-purchase graph (same derived graph as
  * [[PageRank]]: parts are nodes, edges connect parts sharing an order) —
  * the clustering/community primitive: a part in many triangles sits in a
  * dense substitute/complement neighborhood, and triangle counts are the
  * building block of clustering coefficients.
  *
  * Algorithm: ORIENTED wedge join. Each undirected edge is directed from the
  * lower to the higher endpoint under the total order (degree, id) —
  * "degree ordering". Every triangle then has exactly ONE wedge a→b→c with
  * a closing edge a→c, so one equi-join on the wedge middle plus one
  * membership join counts each triangle once, no deduplication step. The
  * point of ordering by DEGREE (not id) is the skew bound: a node's
  * out-degree under degree ordering is O(√m) regardless of its real degree
  * (Chiba–Nishizeki / Suri & Vassilvitskii's MR-triangles argument), so the
  * wedge fan-out Σ outdeg² stays bounded even when a hub part co-occurs
  * with everything — id-ordering would put a low-id hub's full neighborhood
  * in its out-list and go quadratic there. The oracle uses the simpler
  * id-orientation: the triangle SET is orientation-independent, so results
  * match; only the skew profile differs, and the oracle only runs at
  * fixture scale.
  *
  * Scale notes (round-12 dataflow): 2 shuffles TOTAL before the final
  * per-node count — the basket aggregate and one explicit repartition on
  * `src` that simultaneously serves the cross-order dedup, the adjacency
  * build, and the degree count (one `collect_set` is all three). The
  * degree projection and the oriented adjacency are broadcast (node-sized;
  * swap for shuffle joins when nodes outgrow a broadcast — the plan
  * degrades declaratively). The orientation itself is a partition-local
  * filter+regroup riding the checkpoint's repaired hash layout, so it adds
  * zero exchanges.
  */
object Triangles {

  /** FULL undirected adjacency — (node, all-neighbors set, degree), one row
    * per node, hash-partitioned and checkpointed on `src`.
    *
    * Round-12 restructure: the previous dataflow built an |E|-row edge
    * list (repartition + partition-local dedup), then paid a SECOND
    * |E|-sized exchange to group it into adjacency and a THIRD exchange
    * for the degree aggregate (union of both endpoints). Building the full
    * adjacency FIRST folds all three into one: the basket-exploded
    * directed pairs (both directions) shuffle once on `src`, and
    * `collect_set` is simultaneously the cross-order dedup, the adjacency,
    * and (via `size`) the degree — no separate dedup pass, no degree
    * union, and the checkpoint pins |V| rows instead of |E|. The array
    * payload totals the same 2m longs either way; rows and exchanges
    * don't (sf0.1: 3 exchanges + an |E| checkpoint → 1 exchange + a |V|
    * checkpoint on this substrate).
    */
  private def fullAdjacency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey")
    // Basket-aggregate shape (see PageRank.edges): one lineitem shuffle
    // into per-order baskets (≤7 items at any SF), pairs exploded map-side
    // after the exchange; explicit repartition count opts out of AQE's
    // scan-shaped coalescing because everything downstream is CPU-bound,
    // and lands HashPartitioning(src) so the collect_set aggregate runs
    // partition-local with no second exchange.
    li.groupBy($"l_orderkey").agg(collect_set($"l_partkey").as("ps"))
      .select(explode($"ps").as("src"), $"ps")
      .select($"src", explode($"ps").as("dst"))
      .where($"src" =!= $"dst")
      .repartition(spark.sparkContext.defaultParallelism, $"src")
      .groupBy($"src").agg(collect_set($"dst").as("all"))
      .select($"src", $"all", size($"all").as("d"))
  }

  /** x_triangles — top-20 parts by the number of co-purchase triangles they
    * participate in: (part, n_tri), ties broken by part id.
    *
    * Counting is EDGE-LOCAL adjacency intersection, not a materialized wedge
    * join: for each oriented edge a→b, the triangles through it are
    * N⁺(a) ∩ N⁺(b), so each edge row joins the two out-neighbor lists in and
    * intersects them — emitting (a, |∩|), (b, |∩|) and one row per closing
    * node. The co-purchase graph is dense and near-regular (sf0.1: 20k
    * nodes, 1.2M edges, max degree 222), which makes the wedge set ~49M
    * rows; the adjacency frame is only |V| rows, so it broadcasts and the
    * whole enumeration is map-side — the only shuffle after the edge build
    * is the final per-node count (measured at sf0.1: 15.4 s as a wedge
    * join, 4.6 s edge-local). When the graph outgrows a broadcast the SAME
    * plan degrades to shuffle joins on the edge key — the declarative win.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // DISK_ONLY checkpoints (here and for adj below): deserialized in-memory
    // blocks made this query hostage to suite-level storage eviction — the
    // round-5 driver bench medianed 18.9 s (runs 25.6/4.4/18.9) vs 3.3 s
    // isolated, same commit. Serialized disk blocks have a fixed re-read
    // cost and cannot be evicted mid-query.
    val full = fullAdjacency(spark, dir).ckptDisk()
    // Orient x -> y iff (d(x), x) < (d(y), y). Degree ordering caps
    // out-degrees at O(√m) (Chiba–Nishizeki), bounding every out-list
    // below. With the full adjacency in hand the orientation is a FILTER,
    // not a re-grouping: explode each node's neighbor set, broadcast the
    // (node → degree) projection of the SAME checkpoint in for the
    // neighbor's degree, keep the out-edges, and re-collect per node.
    // Generate/project/broadcast-join/filter all preserve the checkpoint's
    // repaired HashPartitioning(src) (Ckpt.ckptDisk — without the layout
    // repair, Spark's own localCheckpoint reports UnknownPartitioning and
    // this aggregate would re-shuffle |E| rows), so the re-collect is
    // partition-local: the whole orientation adds ZERO exchanges.
    // Neighbor lists are sorted ONCE per node so the per-edge intersection
    // can be the native merge-scan `sorted_intersect` — array_intersect
    // rebuilds a hash set from its left operand on every edge row
    // (measured whole-query median ~5.0 s → ~4.0 s at sf0.1).
    graft.functions.GraftFunctions.register(spark)
    val deg = full.select($"src".as("dst"), $"d".as("dd"))
    val adj = full
      .select($"src", $"d", explode($"all").as("dst"))
      .join(broadcast(deg), "dst")
      .where($"dd" > $"d" || ($"dd" === $"d" && $"dst" > $"src"))
      .groupBy($"src")
      .agg(array_sort(collect_list($"dst")).as("nbrs"))
      .ckptDisk()
    // adj is consumed twice (explode side + closing broadcast side), so it
    // carries the checkpoint — |V| rows whose array payload is the oriented
    // HALF of the edge set.
    // Explicit broadcast below: the adjacency frame is |V| rows but its
    // array payload (~O(m) longs total) puts the size ESTIMATE just past
    // the 10 MB auto-broadcast threshold, so Spark would pick a sort-merge
    // join and shuffle+sort the edge list twice (measured 10.4 s; broadcast
    // 4.6 s). Past broadcastable adjacency size (~100M edges), drop the
    // hint and the same plan degrades to those shuffle joins.
    val contrib = adj
      .select($"src", $"nbrs".as("na"), explode($"nbrs").as("dst"))
      .join(broadcast(adj.select($"src".as("dst"), $"nbrs".as("nb"))),
        Seq("dst"), "left")
      .withColumn("common",
        call_function("sorted_intersect", $"na",
          coalesce($"nb", array().cast("array<bigint>"))))
      .filter(size($"common") > 0)
      .select(explode(concat(
        array(struct($"src".as("part"), size($"common").cast("long").as("c")),
          struct($"dst".as("part"), size($"common").cast("long").as("c"))),
        transform($"common", x => struct(x.as("part"), lit(1L).as("c"))))).as("pc"))
    contrib.select($"pc.part".as("part"), $"pc.c".as("c"))
      .groupBy($"part").agg(sum($"c").as("n_tri"))
      .orderBy($"n_tri".desc, $"part")
      .limit(20)
  }

  val trianglesSql: String =
    """WITH e AS (
      | SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      | FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |t AS (
      | SELECT e1.u AS a, e1.v AS b, e2.v AS c
      | FROM e e1 JOIN e e2 ON e2.u = e1.v
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT part, count(*) AS n_tri
      |FROM (SELECT unnest([a, b, c]) AS part FROM t)
      |GROUP BY part
      |ORDER BY n_tri DESC, part
      |LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_triangles" -> (triangles _))

  val oracles: Map[String, String] = Map(
    "x_triangles" -> trianglesSql)
}
