package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Ckpt._

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
  * Scale shape: one frontier of (sampled starts × walks) rows advances
  * through [[Steps]] rounds; each round is ONE broadcast equi-join of the
  * (tiny, never-growing) frontier against the edge frame plus ONE argmin
  * aggregate keyed by the walk — hash-aggregated via a single decimal
  * encoding of (hash, dst), with map-side partial mins so the shuffle
  * carries one row per walk, not the candidate fan-out. Frontier size is
  * constant across rounds (walks never fork), so cost is Steps × (join +
  * aggregate) with no blow-up; at 100 TB the edge frame is the big side —
  * it streams map-side through every round in whatever layout
  * [[PageRank.edges]] checkpointed (the broadcast join and the walk-keyed
  * argmin are both indifferent to edge partitioning), and a frontier too
  * big to broadcast would instead co-partition on the current node.
  *
  * Walk-corpus derivations (visit counts, skip-gram pairs) are projections
  * of this output; the paths themselves are the declared contract.
  */
object RandWalk {

  val Steps = 3
  val Walks = 2

  /** 10¹⁹ — strictly greater than any BIGINT, so `h·PackBase + dst` orders
    * exactly like the pair (h, dst) with zero collision ambiguity.
    */
  val PackBase = "10000000000000000000"

  /** x_rand_walk — (start, walk) → the 3 hash-chosen hops.
    *
    * Every step executes the IDENTICAL plan shape on the IDENTICAL schema
    * `(start, walk, path: array<bigint>, cur)`: the step ordinal is derived
    * in-plan as `size(path) + 1` (not a per-step literal), the hops
    * accumulate in ONE array column (not a widening n1..nk column set), and
    * the walk's path rides through the argmin as a grouping key (arrays are
    * valid HashAggregate grouping keys; only the BUFFER must be mutable,
    * and the buffer stays the single DECIMAL(38,0) min). With zero
    * step-varying expressions or schemas, the generated whole-stage code is
    * the same source text every round, so the Janino class cache compiles
    * each stage ONCE and steps 2..k run the already-C2-promoted classes —
    * round 9 measured the old per-step-distinct lineage paying ~40 separate
    * compile+interpret-then-promote cycles, a 3.6–10.8 s JVM-regime lottery
    * on an otherwise-right plan (docs/BENCH_NOTES.md #43/#52).
    */
  def randWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = PageRank.edges(spark, dir).ckptDisk()
    // Deterministic ¼ start-sample (md5 hex gate) — a walk corpus is built
    // in sampled epochs, not from every node every time; the gate is the
    // same replay-stable selection the quota/stratified samplers use.
    val starts = e.select($"src".as("start")).distinct()
      .filter(substring(md5(concat(lit("ws:"), $"start".cast("string"))), 1, 1)
        .isin("0", "1", "2", "3"))
    var f = starts
      .select($"start",
        explode(array((0 until Walks).map(lit): _*)).as("walk"))
      .withColumn("path", array().cast("array<bigint>"))
      .withColumn("cur", $"start")
    (1 to Steps).foreach { _ =>
      // broadcast(f) is load-bearing: after the first aggregate the
      // frontier has no size stats and Spark otherwise broadcasts the
      // EDGE side (2.4M rows at sf0.1) in later steps — measured 15.3 s
      // vs 5.0 s for the identical chain. The frontier is walks-per-start
      // bounded and never grows, so it is ALWAYS the broadcast side.
      val joined = broadcast(f).join(e, f("cur") === e("src")).drop("src")
      // Argmin by (h, dst) through ONE hash-aggregable primitive:
      // pick = h·10¹⁹ + dst as DECIMAL(38,0). min(struct(h, dst)) reads
      // nicer but falls back to SortAggregate (struct isn't a mutable
      // buffer type — measured as 3 full sorts of the multi-million-row
      // candidate set, 18 s at sf0.1); the decimal keeps the EXACT (h, dst)
      // order (10¹⁹ > any BIGINT dst) and hash-aggregates with map-side
      // partial mins, so the shuffle carries one row per walk, not the
      // candidate set. h is the md5's first 15 hex chars as a 60-bit long
      // ([[graft.llm.Dedup]]'s parse — order-isomorphic to the hex prefix).
      f = joined
        .withColumn("h", conv(substring(md5(concat_ws(":",
          $"start".cast("string"), $"walk".cast("string"),
          (size($"path") + 1).cast("string"), $"dst".cast("string"))), 1, 15),
          16, 10).cast("long"))
        .withColumn("pick", expr(
          s"CAST(h AS DECIMAL(38,0)) * $PackBase + CAST(dst AS DECIMAL(38,0))"))
        .groupBy($"start", $"walk", $"path")
        .agg(min($"pick").as("p"))
        .withColumn("nxt", expr(s"CAST(p % $PackBase AS BIGINT)"))
        .select($"start", $"walk",
          concat($"path", array($"nxt")).as("path"), $"nxt".as("cur"))
    }
    f.select($"start", $"walk",
        $"path"(0).as("n1"), $"path"(1).as("n2"), $"path"(2).as("n3"))
      .orderBy($"start", $"walk")
  }

  val randWalkSql: String = {
    def stepSql(k: Int, from: String): String = {
      val carried = (1 until k).map(i => s"$from.n$i, ").mkString
      val cur = if (k == 1) s"$from.start" else s"$from.n${k - 1}"
      // the same h·10¹⁹+dst packing as the Spark side (HUGEINT arithmetic),
      // so both engines resolve even a 60-bit hash collision identically
      s"""s$k AS (
         | SELECT $from.start, $from.walk, $carried
         |  CAST(min(
         |    CAST(CAST('0x' || substr(md5(concat_ws(':',
         |      CAST($from.start AS VARCHAR), CAST($from.walk AS VARCHAR),
         |      '$k', CAST(e.dst AS VARCHAR))), 1, 15) AS BIGINT) AS HUGEINT)
         |    * $PackBase + e.dst) % $PackBase AS BIGINT) AS n$k
         | FROM $from JOIN e ON $cur = e.src
         | GROUP BY ALL)"""
    }
    val steps = (1 to Steps)
      .map(k => stepSql(k, if (k == 1) "f0" else s"s${k - 1}"))
      .mkString(",\n")
    s"""WITH e AS (
       | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       | FROM lineitem a JOIN lineitem b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |starts AS (
       | SELECT DISTINCT src AS start FROM e
       | WHERE substr(md5('ws:' || CAST(src AS VARCHAR)), 1, 1)
       |   IN ('0', '1', '2', '3')),
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
