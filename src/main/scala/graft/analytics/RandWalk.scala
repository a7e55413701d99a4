package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic random walks over the co-purchase graph — the walk-corpus
  * generator a node2vec/DeepWalk-style graph-embedding pipeline starts
  * from (walks are the "sentences" the skip-gram stage consumes). Each
  * start node launches [[Walks]] walks of [[Steps]] steps; the next hop is
  * the out-neighbor minimizing `md5(start:walk:step:dst)` with a `(hash,
  * dst)` tie-break — hash-driven selection instead of an RNG, so the walk
  * corpus is REPRODUCIBLE under replay, repartitioning, and engine (the
  * property that lets an incremental pipeline re-run a partition without
  * invalidating every downstream embedding, and lets the DuckDB oracle
  * re-derive the identical corpus).
  *
  * Scale shape: one frontier of (starts × walks) rows advances through
  * [[Steps]] rounds; each round is ONE equi-join against the edge frame on
  * the current node plus ONE argmin aggregate (`min(struct(hash, dst))` —
  * a Tungsten-friendly struct-min, no window) keyed by the walk. Frontier
  * size is constant across rounds (walks never fork), so cost is
  * Steps × (join + aggregate) with no blow-up; at 100 TB the edge frame is
  * the big side — co-partition it by `src` once (the [[PageRank.edges]]
  * frame already lands src-partitioned) and every round's join reuses that
  * layout, or broadcast the adjacency if the graph fits.
  *
  * Walk-corpus derivations (visit counts, skip-gram pairs) are projections
  * of this output; the paths themselves are the declared contract.
  */
object RandWalk {

  val Steps = 3
  val Walks = 2

  /** x_rand_walk — (start, walk) → the 3 hash-chosen hops. */
  def randWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = PageRank.edges(spark, dir).localCheckpoint()
    val starts = e.select($"src".as("start")).distinct()
    var f = starts
      .select($"start",
        explode(array((0 until Walks).map(lit): _*)).as("walk"))
      .withColumn("cur", $"start")
    (1 to Steps).foreach { k =>
      val joined = f.join(e, f("cur") === e("src")).drop("src")
      val carried = Seq("start", "walk") ++ (1 until k).map(i => s"n$i")
      f = joined
        .withColumn("h", md5(concat_ws(":",
          $"start".cast("string"), $"walk".cast("string"),
          lit(k.toString), $"dst".cast("string"))))
        .groupBy(carried.map(col): _*)
        .agg(min(struct($"h", $"dst")).as("pick"))
        .withColumn(s"n$k", $"pick.dst").drop("pick")
        .withColumn("cur", col(s"n$k"))
    }
    f.select($"start", $"walk", $"n1", $"n2", $"n3")
      .orderBy($"start", $"walk")
  }

  val randWalkSql: String = {
    def stepSql(k: Int, from: String): String = {
      val carried = (1 until k).map(i => s"$from.n$i, ").mkString
      val cur = if (k == 1) s"$from.start" else s"$from.n${k - 1}"
      s"""s$k AS (
         | SELECT $from.start, $from.walk, ${carried}e.dst AS n$k
         | FROM $from JOIN e ON $cur = e.src
         | QUALIFY row_number() OVER (
         |   PARTITION BY $from.start, $from.walk
         |   ORDER BY md5(concat_ws(':', CAST($from.start AS VARCHAR),
         |     CAST($from.walk AS VARCHAR), '$k', CAST(e.dst AS VARCHAR))),
         |     e.dst) = 1)"""
    }
    val steps = (1 to Steps)
      .map(k => stepSql(k, if (k == 1) "f0" else s"s${k - 1}"))
      .mkString(",\n")
    s"""WITH e AS (
       | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       | FROM lineitem a JOIN lineitem b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |starts AS (SELECT DISTINCT src AS start FROM e),
       |f0 AS (
       | SELECT start, walk, start AS cur
       | FROM starts CROSS JOIN (SELECT unnest([0, 1]) AS walk)),
       |$steps
       |SELECT start, walk, n1, n2, n3 FROM s$Steps
       |ORDER BY start, walk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_rand_walk" -> (randWalk _))

  val oracles: Map[String, String] = Map(
    "x_rand_walk" -> randWalkSql)
}
