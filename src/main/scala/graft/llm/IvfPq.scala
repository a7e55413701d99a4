package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.Similarity.cosineFast
import graft.util.Ckpt._

/** IVF-PQ — the billion-scale ANN architecture (Jégou et al. 2011, the
  * layout behind FAISS's workhorse index): an [[Ivf]]-style coarse
  * quantizer routes each query to a few inverted lists, and candidates
  * inside them are scored WITHOUT touching their original vectors — each
  * candidate is [[Pq.M]] small codes, and the query precomputes an ADC
  * (asymmetric-distance) LOOKUP TABLE of per-subspace distances to every
  * sub-centroid, so scoring a candidate is M table lookups + an add. At
  * 100 TB this is the difference between scanning 256-byte vectors and
  * scanning 4-byte codes with a broadcast LUT.
  *
  * Deterministic end to end (the [[Semantic]]/[[Pq]] recipe): both
  * quantizers are stride-seeded (no Lloyd — this module composes the
  * DECLARED x_pq_assign codes, Pq.subCodebook, so index and query agree
  * with the standalone assignment query by construction), every cosine and
  * every LUT cell is 6 dp-rounded before any argmax/argmin, and the final
  * ranking key is the exact integer micro-ADC.
  *
  * Scale notes: coarse centroids (16 rows), the PQ codebook (M·K rows) and
  * the per-query LUT (probes × M·K rows) all broadcast; candidate
  * generation is an equi-join on the coarse cell id; the 4 LUT attachments
  * are broadcast joins; nothing but (cell, neighbor, 4 codes) ever
  * shuffles. The final top-k window partitions by query id.
  */
object IvfPq {

  /** Coarse cells; nlist ≈ √N at production scale (see Semantic). */
  val CoarseNList = 16
  val NProbe = 4
  val Probes = 10L
  val TopK = 10

  /** x_ivfpq_topk — (query_id, neighbor_id, rnk, adc): per probe vector,
    * the [[TopK]] candidates from the [[NProbe]] nearest coarse cells with
    * the smallest PQ-approximated squared distance.
    */
  def ivfpqTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    searchOver(spark, e, e.filter($"vec_id" < Probes)
        .select($"vec_id".as("query_id"), $"v".as("qv")),
      CoarseNList, NProbe, TopK)
  }

  /** The full IVF-PQ pipeline over any (vec_id, v) corpus and
    * (query_id, qv) probe frame — the seam the scale-stress scenario
    * drives synthetic corpora through (nlist ≈ √N there; the declared
    * query pins the fixture constants).
    */
  def searchOver(spark: SparkSession, e: DataFrame, probes: DataFrame,
      nlist: Int, nProbe: Int, topK: Int): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    // ONE explicit vec_id exchange, materialized. Every index-build
    // aggregate downstream (coarse argmax, per-subspace argmin, code
    // pivot) clusters on vec_id — HashPartitioning(vec_id) satisfies them
    // all, so they run partition-local, and the cass ⋈ codes join below is
    // zero-exchange. Without this, cass and codesOver each shuffled their
    // own aggregates and the join (two frames behind aggregates — no size
    // estimates, BENCH_NOTES #25) fell back to a SortMergeJoin over the
    // whole index: 6 exchanges where the index build needs 1.
    // Materialized: the seeds collect, two counts, and both index
    // aggregates all sit on ep — without the checkpoint each action
    // re-executes the scan + exchange (measured 3.6 s vs 2.0 s at sf0.1).
    val ep = e.repartition(spark.sparkContext.defaultParallelism, $"vec_id")
      .ckptDisk()

    // coarse quantizer: stride-seeded centroids, 6dp-rounded cosine argmax
    val n = ep.count()
    val stride = math.max(1L, n / nlist)
    val seeds = ep.filter(pmod($"vec_id", lit(stride)) === 0)
      .orderBy($"vec_id").limit(nlist)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val coarse = broadcast(
      seeds.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
        .toSeq.toDF("ccid", "cv"))
    val cass = ep.crossJoin(coarse)
      .withColumn("sim", round(cosineFast(spark, $"v", $"cv"), 6) + lit(0.0))
      .groupBy($"vec_id")
      .agg(max_by($"ccid", struct($"sim", -$"ccid")).as("ccid"))

    // inverted lists carry ONLY the PQ codes — the point of the layout.
    // Both sides inherit ep's vec_id partitioning (aggregates were
    // partition-local), so this is exchange-free; the shuffle_hash hint
    // swaps the planner's sort-merge fallback for a no-sort hash join.
    // PQ sub-codebook built ONCE, shared by code assignment and the ADC
    // LUT below (each build is a count + seed collect on the driver).
    val subCb = Pq.subCodebook(spark, ep)
    val lists = cass.hint("shuffle_hash")
      .join(Pq.codesOver(spark, ep, Some(subCb)), Seq("vec_id"))
      .select($"ccid", $"vec_id".as("neighbor_id"), $"c0", $"c1", $"c2", $"c3")

    // cell routing: nProbe best cells per query by the same rounded cosine
    val wCell = Window.partitionBy($"query_id").orderBy($"csim".desc, $"ccid".asc)
    val pcell = probes.crossJoin(coarse)
      .withColumn("csim", round(cosineFast(spark, $"qv", $"cv"), 6) + lit(0.0))
      .withColumn("prn", row_number().over(wCell))
      .filter($"prn" <= nProbe)
      .select($"query_id", $"ccid")

    // ADC lookup table: per (query, subspace, code) squared distance
    val lut = probes.crossJoin(subCb)
      .withColumn("qsub",
        expr(s"slice(qv, CAST(m * ${Pq.SubDim} + 1 AS INT), ${Pq.SubDim})"))
      .withColumn("d", expr(
        "round(aggregate(zip_with(qsub, c, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x), 6)"))
      .select($"query_id", $"m", $"cid", $"d")
    def lutM(m: Int, code: String, d: String) = broadcast(
      lut.filter($"m" === m)
        .select($"query_id", $"cid".as(code), $"d".as(d)))

    // pcell is probes×nProbe rows but sits behind a window, so the planner
    // has no size estimate — broadcast explicitly or it sort-merge-joins
    // the inverted lists (shuffling + sorting the whole index)
    val cand = broadcast(pcell).join(lists, Seq("ccid"))
      .filter($"neighbor_id" =!= $"query_id")
      .join(lutM(0, "c0", "d0"), Seq("query_id", "c0"))
      .join(lutM(1, "c1", "d1"), Seq("query_id", "c1"))
      .join(lutM(2, "c2", "d2"), Seq("query_id", "c2"))
      .join(lutM(3, "c3", "d3"), Seq("query_id", "c3"))
      // fixed-order 4-term sum — deterministic IEEE, never an agg order
      .withColumn("adc", $"d0" + $"d1" + $"d2" + $"d3")
      .withColumn("adcs", round($"adc" * 1000000L).cast("long"))
    val wTop = Window.partitionBy($"query_id").orderBy($"adcs".asc, $"neighbor_id".asc)
    cand.withColumn("rnk", row_number().over(wTop))
      .filter($"rnk" <= topK)
      .select($"query_id", $"neighbor_id", $"rnk".cast("long").as("rnk"), $"adc")
      .orderBy($"query_id", $"rnk")
  }

  val ivfpqTopKSql: String = {
    val sd = Pq.SubDim
    s"""WITH e AS (
       | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       | FROM embeddings),
       |codes AS (SELECT vec_id, c0, c1, c2, c3 FROM (${Pq.pqAssignSql})),
       |cst AS (SELECT greatest(CAST(count(*) // $CoarseNList AS BIGINT), 1) AS stride FROM e),
       |cseeds AS (
       | SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS ccid, v AS cv
       | FROM (SELECT vec_id, v FROM e, cst WHERE vec_id % stride = 0
       |       ORDER BY vec_id LIMIT $CoarseNList)),
       |cscored AS (
       | SELECT e.vec_id, s.ccid,
       |  round(
       |   list_sum(list_transform(list_zip(e.v, s.cv), p -> p[1] * p[2])) /
       |   sqrt(list_sum(list_transform(e.v, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |   6) + 0.0 AS sim
       | FROM e, cseeds s),
       |cass AS (
       | SELECT vec_id, ccid FROM (
       |  SELECT vec_id, ccid,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, ccid) AS rk
       |  FROM cscored) WHERE rk = 1),
       |probes AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $Probes),
       |pcell AS (
       | SELECT query_id, ccid FROM (
       |  SELECT p.query_id, s.ccid,
       |   row_number() OVER (PARTITION BY p.query_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(p.qv, s.cv), x -> x[1] * x[2])) /
       |     sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS prn
       |  FROM probes p, cseeds s) WHERE prn <= $NProbe),
       |pqst AS (SELECT greatest(CAST(count(*) // ${Pq.K} AS BIGINT), 1) AS stride FROM e),
       |pqseeds AS (
       | SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v
       | FROM (SELECT vec_id, v FROM e, pqst WHERE vec_id % stride = 0
       |       ORDER BY vec_id LIMIT ${Pq.K})),
       |pqcb AS (
       | SELECT m, cid, v[CAST(m * $sd + 1 AS BIGINT):CAST((m + 1) * $sd AS BIGINT)] AS c
       | FROM pqseeds, (SELECT unnest(range(${Pq.M})) AS m)),
       |lut AS (
       | SELECT p.query_id, cb.m, cb.cid,
       |  round(list_sum(list_transform(
       |    list_zip(p.qv[CAST(cb.m * $sd + 1 AS BIGINT):CAST((cb.m + 1) * $sd AS BIGINT)], cb.c),
       |    x -> (x[1] - x[2]) * (x[1] - x[2]))), 6) AS d
       | FROM probes p, pqcb cb),
       |cand AS (
       | SELECT pc.query_id, ca.vec_id AS neighbor_id
       | FROM pcell pc JOIN cass ca ON ca.ccid = pc.ccid
       | WHERE ca.vec_id != pc.query_id),
       |scored AS (
       | SELECT c.query_id, c.neighbor_id,
       |  l0.d + l1.d + l2.d + l3.d AS adc
       | FROM cand c
       | JOIN codes k ON k.vec_id = c.neighbor_id
       | JOIN lut l0 ON l0.query_id = c.query_id AND l0.m = 0 AND l0.cid = k.c0
       | JOIN lut l1 ON l1.query_id = c.query_id AND l1.m = 1 AND l1.cid = k.c1
       | JOIN lut l2 ON l2.query_id = c.query_id AND l2.m = 2 AND l2.cid = k.c2
       | JOIN lut l3 ON l3.query_id = c.query_id AND l3.m = 3 AND l3.cid = k.c3),
       |ranked AS (
       | SELECT query_id, neighbor_id, adc,
       |  row_number() OVER (PARTITION BY query_id
       |   ORDER BY CAST(round(1000000 * adc) AS BIGINT), neighbor_id) AS rk
       | FROM scored)
       |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rnk, adc
       |FROM ranked WHERE rk <= $TopK
       |ORDER BY query_id, rnk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_ivfpq_topk" -> (ivfpqTopK _))

  val oracles: Map[String, String] = Map(
    "x_ivfpq_topk" -> ivfpqTopKSql)
}
