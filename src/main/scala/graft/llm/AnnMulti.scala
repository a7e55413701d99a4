package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.io.Tables
import graft.llm.Similarity.cosineFast
import graft.util.Ckpt._

/** Multi-probe ANN retrieval with its recall eval — the answer to the
  * number x_ann_recall exists to surface: the single 8-bit sign-table
  * route retrieves recall@10 ≈ 0.035 on this fixture (near-random 64-dim
  * embeddings put the true top-10 at cosine ~0.2–0.4, where one sign
  * bucket almost never collides). The fix an IVF deployment actually
  * ships is MULTI-PROBE (Multi-probe LSH, Lv et al. VLDB 2007; FAISS's
  * nprobe): route each query to its [[MultiNProbe]] nearest coarse cells
  * instead of one, trading scanned-fraction for recall along a dial.
  *
  * x_ann_recall_multi runs the same oracle-gated eval shape as
  * x_ann_recall — brute-force truth UNCHANGED, only the approximate route
  * swapped — and additionally reports n_cand, the per-query candidate
  * count, so the artifact quantifies BOTH sides of the trade: recall@10
  * rises from ≈0.035 to ≥0.5 while scanning ~[[MultiNProbe]]/[[MultiNList]]
  * of the corpus instead of all of it.
  *
  * Determinism (the [[IvfPq]]/[[Semantic]] recipe): coarse centroids are
  * stride-seeded — no Lloyd float means — every routing cosine is
  * 6 dp-rounded before its argmax/rank with ties to the lowest cell id,
  * and the final ranking key is the exact integer micro-cosine.
  *
  * Scale notes: centroids broadcast (nlist rows); cell assignment is one
  * map-side-combined argmax aggregate (never a window over N·nlist scored
  * rows); candidate generation is an equi-join of the probe routing table
  * (probes × nprobe rows, broadcast) against the cid-keyed lists; top-k
  * goes through the bounded native `top_k_rows` aggregate, so the shuffle
  * carries O(probes·k) rows. The corpus-sized frames move exactly once.
  */
object AnnMulti {

  /** Coarse cells and probes per query: 8 of 16 cells ≈ half the corpus
    * scanned — the honest price of recall ≥ 0.5 on near-random vectors
    * (real embedding corpora cluster, which moves the dial toward FAISS's
    * typical 1–8% scanned; the fixture's randomness is the worst case).
    */
  val MultiNList = 16
  val MultiNProbe = 8

  /** Lloyd refinement passes over the stride seeds (round-6 upgrade). Two
    * iterations move the mid-dial most (nprobe=4 recall 0.52 → 0.60 at
    * sf0.1, docs/ANN_RECALL.md); the nprobe=8 point is already at the
    * fixture's ceiling (~0.79; best-of-5 restarts with Lloyd-5 top out at
    * 0.835 — random 64-dim vectors have no cluster structure to find).
    *
    * The refinement is FIXED-POINT so the oracle reproduces it bit-exactly:
    * per (cell, dim) the mean accumulates `round(x·10⁶)` BIGINTs (exact,
    * order-independent — a float mean's partial sums are neither) and the
    * centroid component is the single division `Σ/(10⁶·n)`; both factors
    * are exactly representable doubles, so Spark and DuckDB round
    * identically. Cells that lose all members keep their previous centroid.
    */
  val LloydIters = 2

  /** Stride seeds + [[LloydIters]] fixed-point Lloyd passes. Centroids are
    * driver-local between passes (nlist rows — the k-means shape: centroids
    * on the driver, data distributed, every use a broadcast); each pass is
    * one map-side-combined argmax + one exact integer aggregate.
    */
  private[llm] def refinedCentroids(spark: SparkSession, e: DataFrame,
      nlist: Int): DataFrame = {
    import spark.implicits._
    val n = e.count()
    val stride = math.max(1L, n / nlist)
    val seeds = e.filter(pmod($"vec_id", lit(stride)) === 0)
      .orderBy($"vec_id").limit(nlist)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    var cent: Seq[(Long, Seq[Double])] =
      seeds.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }.toSeq
    (1 to LloydIters).foreach { _ =>
      val cdf = broadcast(cent.toDF("ccid", "cv"))
      val refined = e.crossJoin(cdf)
        .withColumn("sim", round(cosineFast(spark, $"v", $"cv"), 6) + lit(0.0))
        .groupBy($"vec_id")
        .agg(max_by($"ccid", struct($"sim", -$"ccid")).as("ccid"))
        .join(e, Seq("vec_id"))
        .select($"ccid", posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"ccid", $"pos")
        .agg(sum(round($"x" * 1000000L).cast("long")).as("sx"),
          count(lit(1)).as("cnt"))
        .groupBy($"ccid")
        .agg(array_sort(collect_list(struct($"pos",
          ($"sx".cast("double") / ($"cnt" * 1000000L).cast("double")).as("m"))))
          .as("pm"))
        .select($"ccid", transform($"pm", p => p.getField("m")).as("cv"))
        .as[(Long, Seq[Double])].collect().toMap
      cent = cent.map { case (id, v) => (id, refined.getOrElse(id, v)) }
    }
    cent.toDF("ccid", "cv")
  }

  /** The oracle-side twin of [[refinedCentroids]]: CTEs `e`, `cst`,
    * `cseeds0` (stride seeds) and [[LloydIters]] unrolled fixed-point
    * passes, ending in a CTE named `cseeds` the downstream query text
    * references exactly as before.
    */
  private def coarseSqlCtes(nlist: Int): String = {
    val head =
      s"""WITH e AS (
         | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         | FROM embeddings),
         |cst AS (SELECT greatest(CAST(count(*) // $nlist AS BIGINT), 1) AS stride FROM e),
         |cseeds0 AS (
         | SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS ccid, v AS cv
         | FROM (SELECT vec_id, v FROM e, cst WHERE vec_id % stride = 0
         |       ORDER BY vec_id LIMIT $nlist))""".stripMargin
    val iters = (1 to LloydIters).map { k =>
      s""",
         |cass$k AS (
         | SELECT vec_id, ccid FROM (
         |  SELECT e.vec_id, s.ccid,
         |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |    round(
         |     list_sum(list_transform(list_zip(e.v, s.cv), p -> p[1] * p[2])) /
         |     sqrt(list_sum(list_transform(e.v, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
         |     6) + 0.0 DESC, s.ccid) AS rk
         |  FROM e, cseeds${k - 1} s) WHERE rk = 1),
         |cm$k AS (
         | SELECT ccid, pos,
         |  CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE)
         |   / CAST(count(*) * 1000000 AS DOUBLE) AS m
         | FROM (SELECT ca.ccid, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS x
         |       FROM cass$k ca JOIN e ON e.vec_id = ca.vec_id)
         | GROUP BY ccid, pos),
         |cref$k AS (SELECT ccid, list(m ORDER BY pos) AS cv FROM cm$k GROUP BY ccid),
         |cseeds$k AS (
         | SELECT s.ccid, COALESCE(r.cv, s.cv) AS cv
         | FROM cseeds${k - 1} s LEFT JOIN cref$k r ON r.ccid = s.ccid)""".stripMargin
    }.mkString
    val tail =
      s""",
         |cseeds AS (SELECT ccid, cv FROM cseeds$LloydIters)""".stripMargin
    head + iters + tail
  }

  /** x_ann_recall_multi — recall@[[Similarity.RecallK]] of the multi-probe
    * IVF route vs exact brute force, per probe: (query_id, n_true, n_cand,
    * n_approx, n_overlap, recall).
    */
  def annRecallMulti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))

    // stride-seeded + Lloyd-refined coarse centroids (oracle-expressible)
    val coarse = broadcast(refinedCentroids(spark, e, MultiNList))

    // every vector → nearest cell, map-side-combined argmax
    val cass = e.crossJoin(coarse)
      .withColumn("sim", round(cosineFast(spark, $"v", $"cv"), 6) + lit(0.0))
      .groupBy($"vec_id")
      .agg(max_by($"ccid", struct($"sim", -$"ccid")).as("ccid"))
    val lists = cass.join(e, Seq("vec_id"))
      .select($"ccid", $"vec_id".as("neighbor_id"), $"v".as("nv"))

    val probes = broadcast(e.filter($"vec_id" < Similarity.RecallProbes)
      .select($"vec_id".as("query_id"), $"v".as("qv")))

    // multi-probe routing: nprobe best cells per query (qv rides along —
    // probes × nprobe rows, broadcast)
    val wCell = Window.partitionBy($"query_id").orderBy($"csim".desc, $"ccid".asc)
    val pcell = probes.crossJoin(coarse)
      .withColumn("csim", round(cosineFast(spark, $"qv", $"cv"), 6) + lit(0.0))
      .withColumn("prn", row_number().over(wCell))
      .filter($"prn" <= MultiNProbe)
      .select($"query_id", $"qv", $"ccid")

    def microSim(a: Column, b: Column): Column =
      round(cosineFast(spark, a, b) * 1000000L).cast("long")
    def topIds(scored: DataFrame): DataFrame = scored
      .groupBy($"query_id")
      .agg(call_function("top_k_rows", $"s", $"neighbor_id",
        lit(Similarity.RecallK)).as("top"))
      .select($"query_id", explode($"top").as("x"))
      .select($"query_id", $"x.tag".as("neighbor_id"))

    // truth: brute force, UNCHANGED from x_ann_recall
    val truth = topIds(probes.crossJoin(
        e.select($"vec_id".as("neighbor_id"), $"v".as("nv")))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id", microSim($"qv", $"nv").as("s")))

    // approximate: score only the probed cells' candidates
    val scored = broadcast(pcell).join(lists, Seq("ccid"))
      .filter($"neighbor_id" =!= $"query_id")
      .select($"query_id", $"neighbor_id", microSim($"qv", $"nv").as("s"))
      .ckptDisk() // referenced twice (top-k + n_cand): one scan, not two
    val approx = topIds(scored)

    val tc = truth.groupBy($"query_id").agg(count(lit(1)).as("n_true"))
    val cc = scored.groupBy($"query_id").agg(count(lit(1)).as("n_cand"))
    val ac = approx.groupBy($"query_id").agg(count(lit(1)).as("n_approx"))
    // ≤ probes·k rows each, but behind aggregates the planner can't size —
    // broadcast explicitly or the overlap join plans as a sort-merge
    val ov = truth.join(broadcast(approx), Seq("query_id", "neighbor_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("n_overlap"))
    tc.join(broadcast(cc), Seq("query_id"), "left")
      .join(broadcast(ac), Seq("query_id"), "left")
      .join(broadcast(ov), Seq("query_id"), "left")
      .select($"query_id", $"n_true",
        coalesce($"n_cand", lit(0L)).as("n_cand"),
        coalesce($"n_approx", lit(0L)).as("n_approx"),
        coalesce($"n_overlap", lit(0L)).as("n_overlap"))
      .withColumn("recall", $"n_overlap".cast("double") / $"n_true".cast("double"))
      .orderBy($"query_id")
  }

  val annRecallMultiSql: String =
    coarseSqlCtes(MultiNList) +
    s""",
       |cass AS (
       | SELECT vec_id, ccid FROM (
       |  SELECT e.vec_id, s.ccid,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(e.v, s.cv), p -> p[1] * p[2])) /
       |     sqrt(list_sum(list_transform(e.v, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS rk
       |  FROM e, cseeds s) WHERE rk = 1),
       |p AS (SELECT vec_id AS query_id, v AS qv FROM e
       |      WHERE vec_id < ${Similarity.RecallProbes}),
       |pcell AS (
       | SELECT query_id, ccid FROM (
       |  SELECT p.query_id, s.ccid,
       |   row_number() OVER (PARTITION BY p.query_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(p.qv, s.cv), x -> x[1] * x[2])) /
       |     sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS prn
       |  FROM p, cseeds s) WHERE prn <= $MultiNProbe),
       |ts AS (
       | SELECT p.query_id, c.vec_id AS neighbor_id,
       |  CAST(round(1000000 *
       |   list_sum(list_transform(list_zip(p.qv, c.v), q -> q[1] * q[2])) /
       |   sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(c.v, x -> x * x)))) AS BIGINT) AS s
       | FROM p, e c WHERE c.vec_id != p.query_id),
       |truth AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |   row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rk
       |  FROM ts) WHERE rk <= ${Similarity.RecallK}),
       |cs AS (
       | SELECT p.query_id, ca.vec_id AS neighbor_id,
       |  CAST(round(1000000 *
       |   list_sum(list_transform(list_zip(p.qv, c.v), q -> q[1] * q[2])) /
       |   sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(c.v, x -> x * x)))) AS BIGINT) AS s
       | FROM p
       | JOIN pcell pc ON pc.query_id = p.query_id
       | JOIN cass ca ON ca.ccid = pc.ccid AND ca.vec_id != p.query_id
       | JOIN e c ON c.vec_id = ca.vec_id),
       |approx AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |   row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rk
       |  FROM cs) WHERE rk <= ${Similarity.RecallK}),
       |tc AS (SELECT query_id, count(*) AS n_true FROM truth GROUP BY 1),
       |cc AS (SELECT query_id, count(*) AS n_cand FROM cs GROUP BY 1),
       |ac AS (SELECT query_id, count(*) AS n_approx FROM approx GROUP BY 1),
       |ov AS (
       | SELECT t.query_id, count(*) AS n_overlap
       | FROM truth t JOIN approx a
       |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
       | GROUP BY 1)
       |SELECT tc.query_id, tc.n_true,
       | COALESCE(cc.n_cand, 0) AS n_cand,
       | COALESCE(ac.n_approx, 0) AS n_approx,
       | COALESCE(ov.n_overlap, 0) AS n_overlap,
       | CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / CAST(tc.n_true AS DOUBLE) AS recall
       |FROM tc
       |LEFT JOIN cc ON cc.query_id = tc.query_id
       |LEFT JOIN ac ON ac.query_id = tc.query_id
       |LEFT JOIN ov ON ov.query_id = tc.query_id
       |ORDER BY tc.query_id""".stripMargin

  /** x_ann_multiprobe_topk — the multi-probe route as a first-class SEARCH
    * query, not just its eval: per probe vector, the top-[[Similarity.RecallK]]
    * candidates from the [[MultiNProbe]] nearest coarse cells, ranked by
    * exact integer micro-cosine. Complements x_ivf_topk (whose oracle
    * leg is exhaustive-probe = brute force): here the APPROXIMATE route
    * itself is oracle-gated, because stride-seeded centroids + 6 dp
    * routing are DuckDB-expressible — the hash gate pins cell assignment,
    * routing, and ranking end to end at nprobe < nlist.
    */
  def multiprobeTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    searchOver(spark, e,
      e.filter($"vec_id" < Similarity.RecallProbes)
        .select($"vec_id".as("query_id"), $"v".as("qv")),
      MultiNList, MultiNProbe, Similarity.RecallK)
  }

  /** The multi-probe search over any (vec_id, v) corpus and (query_id, qv)
    * probe frame — the seam the scale-stress scenario drives 200k-vector
    * synthetic corpora through (nlist ≈ √N there; the declared query pins
    * the fixture constants).
    */
  def searchOver(spark: SparkSession, e: DataFrame, probesDf: DataFrame,
      nlist: Int, nProbe: Int, topK: Int): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)

    val coarse = broadcast(refinedCentroids(spark, e, nlist))

    val cass = e.crossJoin(coarse)
      .withColumn("sim", round(cosineFast(spark, $"v", $"cv"), 6) + lit(0.0))
      .groupBy($"vec_id")
      .agg(max_by($"ccid", struct($"sim", -$"ccid")).as("ccid"))
    val lists = cass.join(e, Seq("vec_id"))
      .select($"ccid", $"vec_id".as("neighbor_id"), $"v".as("nv"))

    val probes = broadcast(probesDf)
    val wCell = Window.partitionBy($"query_id").orderBy($"csim".desc, $"ccid".asc)
    val pcell = probes.crossJoin(coarse)
      .withColumn("csim", round(cosineFast(spark, $"qv", $"cv"), 6) + lit(0.0))
      .withColumn("prn", row_number().over(wCell))
      .filter($"prn" <= nProbe)
      .select($"query_id", $"qv", $"ccid")

    val scored = broadcast(pcell).join(lists, Seq("ccid"))
      .filter($"neighbor_id" =!= $"query_id")
      .select($"query_id", $"neighbor_id",
        round(cosineFast(spark, $"qv", $"nv") * 1000000L).cast("long").as("micro_sim"))
    // bounded native top-k aggregate: the shuffle carries O(probes·k) rows,
    // never a window over every scored candidate
    scored.groupBy($"query_id")
      .agg(call_function("top_k_rows", $"micro_sim", $"neighbor_id",
        lit(topK)).as("top"))
      .select($"query_id", posexplode($"top").as(Seq("p", "x")))
      // top_k_rows returns best-first (ord DESC, ties tag ASC): position IS rank
      .select($"query_id", $"x.tag".as("neighbor_id"),
        ($"p" + 1).cast("long").as("rnk"), $"x.ord".as("micro_sim"))
      .orderBy($"query_id", $"rnk")
  }

  val multiprobeTopKSql: String =
    coarseSqlCtes(MultiNList) +
    s""",
       |cass AS (
       | SELECT vec_id, ccid FROM (
       |  SELECT e.vec_id, s.ccid,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(e.v, s.cv), p -> p[1] * p[2])) /
       |     sqrt(list_sum(list_transform(e.v, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS rk
       |  FROM e, cseeds s) WHERE rk = 1),
       |p AS (SELECT vec_id AS query_id, v AS qv FROM e
       |      WHERE vec_id < ${Similarity.RecallProbes}),
       |pcell AS (
       | SELECT query_id, ccid FROM (
       |  SELECT p.query_id, s.ccid,
       |   row_number() OVER (PARTITION BY p.query_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(p.qv, s.cv), x -> x[1] * x[2])) /
       |     sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS prn
       |  FROM p, cseeds s) WHERE prn <= $MultiNProbe),
       |cs AS (
       | SELECT p.query_id, ca.vec_id AS neighbor_id,
       |  CAST(round(1000000 *
       |   list_sum(list_transform(list_zip(p.qv, c.v), q -> q[1] * q[2])) /
       |   sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(c.v, x -> x * x)))) AS BIGINT) AS micro_sim
       | FROM p
       | JOIN pcell pc ON pc.query_id = p.query_id
       | JOIN cass ca ON ca.ccid = pc.ccid AND ca.vec_id != p.query_id
       | JOIN e c ON c.vec_id = ca.vec_id)
       |SELECT query_id, neighbor_id,
       | CAST(row_number() OVER (PARTITION BY query_id
       |   ORDER BY micro_sim DESC, neighbor_id) AS BIGINT) AS rnk,
       | micro_sim
       |FROM cs
       |QUALIFY rnk <= ${Similarity.RecallK}
       |ORDER BY query_id, rnk""".stripMargin

  /** Probe depth for the FILTERED search: the label predicate keeps ~1/10
    * of each cell's list, so the filtered route probes every cell — the
    * classic filtered-ANN trade (Milvus/FAISS "filtered search"): as the
    * filter gets more selective, per-cell candidate yield drops and nprobe
    * must rise to keep top-k full; at 10% selectivity × 16 cells, probing
    * all 16 still scans only ~10% of the corpus.
    */
  val FilteredNProbe = 16

  /** x_ann_filtered_topk — METADATA-FILTERED vector search: per probe, the
    * top-[[Similarity.RecallK]] same-label neighbors from its
    * [[FilteredNProbe]] nearest coarse cells. The constrained-search shape
    * every production vector store exposes ("nearest within this tenant /
    * class / date range"), absent from the plain top-k queries. The label
    * predicate is applied to the INVERTED LISTS before scoring
    * (post-routing pre-scoring — the IVF sweet spot: routing stays
    * label-blind so one index serves every filter, but no excluded vector
    * is ever scored), and it rides the candidate equi-join, not a
    * post-hoc filter on scored output — at 100 TB that is the difference
    * between scoring 10× too many candidates and scoring exactly the
    * matching ones. Queries whose label is rare may return fewer than k
    * rows; both engines agree, and that honesty is part of the contract.
    */
  def filteredTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val e = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("v"))

    val coarse = broadcast(refinedCentroids(spark, e, MultiNList))

    val cass = e.crossJoin(coarse)
      .withColumn("sim", round(cosineFast(spark, $"v", $"cv"), 6) + lit(0.0))
      .groupBy($"vec_id")
      .agg(max_by($"ccid", struct($"sim", -$"ccid")).as("ccid"))
    // label rides the inverted list rows — the filter column lives beside
    // the vectors, so filtered candidate generation is one equi-join
    val lists = cass.join(e, Seq("vec_id"))
      .join(emb.select($"vec_id", $"label"), Seq("vec_id"))
      .select($"ccid", $"vec_id".as("neighbor_id"), $"v".as("nv"), $"label")

    val probes = broadcast(emb.filter($"vec_id" < Similarity.RecallProbes)
      .select($"vec_id".as("query_id"),
        transform($"embedding", x => x.cast("double")).as("qv"),
        $"label".as("qlabel")))
    val wCell = Window.partitionBy($"query_id").orderBy($"csim".desc, $"ccid".asc)
    val pcell = probes.crossJoin(coarse)
      .withColumn("csim", round(cosineFast(spark, $"qv", $"cv"), 6) + lit(0.0))
      .withColumn("prn", row_number().over(wCell))
      .filter($"prn" <= FilteredNProbe)
      .select($"query_id", $"qv", $"qlabel", $"ccid")

    val scored = broadcast(pcell).as("pc")
      .join(lists.as("ls"),
        $"pc.ccid" === $"ls.ccid" && $"pc.qlabel" === $"ls.label")
      .filter($"ls.neighbor_id" =!= $"pc.query_id")
      .select($"pc.query_id".as("query_id"), $"ls.neighbor_id".as("neighbor_id"),
        round(cosineFast(spark, $"pc.qv", $"ls.nv") * 1000000L).cast("long")
          .as("micro_sim"))
    scored.groupBy($"query_id")
      .agg(call_function("top_k_rows", $"micro_sim", $"neighbor_id",
        lit(Similarity.RecallK)).as("top"))
      .select($"query_id", posexplode($"top").as(Seq("p", "x")))
      .select($"query_id", $"x.tag".as("neighbor_id"),
        ($"p" + 1).cast("long").as("rnk"), $"x.ord".as("micro_sim"))
      .orderBy($"query_id", $"rnk")
  }

  val filteredTopKSql: String =
    coarseSqlCtes(MultiNList) +
    s""",
       |cass AS (
       | SELECT vec_id, ccid FROM (
       |  SELECT e.vec_id, s.ccid,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(e.v, s.cv), p -> p[1] * p[2])) /
       |     sqrt(list_sum(list_transform(e.v, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS rk
       |  FROM e, cseeds s) WHERE rk = 1),
       |p AS (SELECT e.vec_id AS query_id, e.v AS qv, m.label AS qlabel
       |      FROM e JOIN embeddings m ON m.vec_id = e.vec_id
       |      WHERE e.vec_id < ${Similarity.RecallProbes}),
       |pcell AS (
       | SELECT query_id, ccid FROM (
       |  SELECT p.query_id, s.ccid,
       |   row_number() OVER (PARTITION BY p.query_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(p.qv, s.cv), x -> x[1] * x[2])) /
       |     sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS prn
       |  FROM p, cseeds s) WHERE prn <= $FilteredNProbe),
       |cs AS (
       | SELECT p.query_id, ca.vec_id AS neighbor_id,
       |  CAST(round(1000000 *
       |   list_sum(list_transform(list_zip(p.qv, c.v), q -> q[1] * q[2])) /
       |   sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(c.v, x -> x * x)))) AS BIGINT) AS micro_sim
       | FROM p
       | JOIN pcell pc ON pc.query_id = p.query_id
       | JOIN cass ca ON ca.ccid = pc.ccid AND ca.vec_id != p.query_id
       | JOIN embeddings m ON m.vec_id = ca.vec_id AND m.label = p.qlabel
       | JOIN e c ON c.vec_id = ca.vec_id)
       |SELECT query_id, neighbor_id,
       | CAST(row_number() OVER (PARTITION BY query_id
       |   ORDER BY micro_sim DESC, neighbor_id) AS BIGINT) AS rnk,
       | micro_sim
       |FROM cs
       |QUALIFY rnk <= ${Similarity.RecallK}
       |ORDER BY query_id, rnk""".stripMargin

  /** The nprobe operating points the curve sweeps. */
  val CurveProbes: Seq[Int] = Seq(1, 2, 4, 8)

  /** x_ann_nprobe_curve — the recall-vs-scanned-fraction DIAL as one query:
    * mean recall@10 and mean candidate count at nprobe ∈ [[CurveProbes]].
    * The tuning table an ANN deployment reads before picking its operating
    * point — and it costs ONE candidate scan, not four: every candidate
    * (query, neighbor) pair belongs to exactly one coarse cell, so it
    * carries the cell's routing rank `prn`; recall at nprobe = p is just
    * the same scored frame filtered to prn ≤ p. The scored frame is
    * localCheckpointed and the four operating points are a bounded
    * explode over it — no re-route, no re-scan, no re-score.
    */
  def annNprobeCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))

    val coarse = broadcast(refinedCentroids(spark, e, MultiNList))

    val cass = e.crossJoin(coarse)
      .withColumn("sim", round(cosineFast(spark, $"v", $"cv"), 6) + lit(0.0))
      .groupBy($"vec_id")
      .agg(max_by($"ccid", struct($"sim", -$"ccid")).as("ccid"))
    val lists = cass.join(e, Seq("vec_id"))
      .select($"ccid", $"vec_id".as("neighbor_id"), $"v".as("nv"))

    val probes = broadcast(e.filter($"vec_id" < Similarity.RecallProbes)
      .select($"vec_id".as("query_id"), $"v".as("qv")))
    val wCell = Window.partitionBy($"query_id").orderBy($"csim".desc, $"ccid".asc)
    // routing ranks for ALL cells up to the deepest operating point
    val pcell = probes.crossJoin(coarse)
      .withColumn("csim", round(cosineFast(spark, $"qv", $"cv"), 6) + lit(0.0))
      .withColumn("prn", row_number().over(wCell))
      .filter($"prn" <= CurveProbes.max)
      .select($"query_id", $"qv", $"ccid", $"prn")

    def microSim(a: Column, b: Column): Column =
      round(cosineFast(spark, a, b) * 1000000L).cast("long")
    // one scored frame, prn attached (each neighbor sits in exactly one cell)
    val scored = broadcast(pcell).join(lists, Seq("ccid"))
      .filter($"neighbor_id" =!= $"query_id")
      .select($"query_id", $"prn", $"neighbor_id",
        microSim($"qv", $"nv").as("s"))
      .ckptDisk()

    val truth = probes.crossJoin(
        e.select($"vec_id".as("neighbor_id"), $"v".as("nv")))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id", microSim($"qv", $"nv").as("s"))
      .groupBy($"query_id")
      .agg(call_function("top_k_rows", $"s", $"neighbor_id",
        lit(Similarity.RecallK)).as("top"))
      .select($"query_id", explode($"top").as("x"))
      .select($"query_id", $"x.tag".as("neighbor_id"))

    val points = CurveProbes.toDF("nprobe")
    val approx = broadcast(points).join(scored, $"prn" <= $"nprobe")
      .groupBy($"nprobe", $"query_id")
      .agg(call_function("top_k_rows", $"s", $"neighbor_id",
        lit(Similarity.RecallK)).as("top"),
        count(lit(1)).as("n_cand"))
      .ckptDisk() // referenced twice (overlap + base): one computation
    val overlap = approx
      .select($"nprobe", $"query_id", explode($"top").as("x"))
      .select($"nprobe", $"query_id", $"x.tag".as("neighbor_id"))
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy($"nprobe", $"query_id")
      .agg(count(lit(1)).as("n_overlap"))
    // LEFT join: a query whose top-k misses the truth entirely still counts
    // in the mean with overlap 0 — dropping it would inflate recall.
    approx.select($"nprobe", $"query_id", $"n_cand")
      .join(broadcast(overlap), Seq("nprobe", "query_id"), "left")
      .groupBy($"nprobe")
      .agg(count(lit(1)).as("n_queries"),
        sum(coalesce($"n_overlap", lit(0L))).as("total_overlap"),
        sum($"n_cand").as("total_cand"))
      .withColumn("mean_recall", $"total_overlap".cast("double") /
        (lit(Similarity.RecallK) * $"n_queries").cast("double"))
      .orderBy($"nprobe")
  }

  val annNprobeCurveSql: String =
    coarseSqlCtes(MultiNList) +
    s""",
       |cass AS (
       | SELECT vec_id, ccid FROM (
       |  SELECT e.vec_id, s.ccid,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(e.v, s.cv), p -> p[1] * p[2])) /
       |     sqrt(list_sum(list_transform(e.v, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS rk
       |  FROM e, cseeds s) WHERE rk = 1),
       |p AS (SELECT vec_id AS query_id, v AS qv FROM e
       |      WHERE vec_id < ${Similarity.RecallProbes}),
       |pcell AS (
       | SELECT query_id, ccid, prn FROM (
       |  SELECT p.query_id, s.ccid,
       |   row_number() OVER (PARTITION BY p.query_id ORDER BY
       |    round(
       |     list_sum(list_transform(list_zip(p.qv, s.cv), x -> x[1] * x[2])) /
       |     sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(s.cv, x -> x * x))),
       |     6) + 0.0 DESC, s.ccid) AS prn
       |  FROM p, cseeds s) WHERE prn <= ${CurveProbes.max}),
       |scored AS (
       | SELECT p.query_id, pc.prn, ca.vec_id AS neighbor_id,
       |  CAST(round(1000000 *
       |   list_sum(list_transform(list_zip(p.qv, c.v), q -> q[1] * q[2])) /
       |   sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(c.v, x -> x * x)))) AS BIGINT) AS s
       | FROM p
       | JOIN pcell pc ON pc.query_id = p.query_id
       | JOIN cass ca ON ca.ccid = pc.ccid AND ca.vec_id != p.query_id
       | JOIN e c ON c.vec_id = ca.vec_id),
       |ts AS (
       | SELECT p.query_id, c.vec_id AS neighbor_id,
       |  CAST(round(1000000 *
       |   list_sum(list_transform(list_zip(p.qv, c.v), q -> q[1] * q[2])) /
       |   sqrt(list_sum(list_transform(p.qv, x -> x * x)) * list_sum(list_transform(c.v, x -> x * x)))) AS BIGINT) AS s
       | FROM p, e c WHERE c.vec_id != p.query_id),
       |truth AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |   row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rk
       |  FROM ts) WHERE rk <= ${Similarity.RecallK}),
       |pts AS (SELECT unnest([${CurveProbes.mkString(", ")}]) AS nprobe),
       |cand AS (
       | SELECT pts.nprobe, sc.query_id, sc.neighbor_id, sc.s
       | FROM pts JOIN scored sc ON sc.prn <= pts.nprobe),
       |ccount AS (
       | SELECT nprobe, query_id, count(*) AS n_cand
       | FROM cand GROUP BY 1, 2),
       |approx AS (
       | SELECT nprobe, query_id, neighbor_id FROM (
       |  SELECT nprobe, query_id, neighbor_id,
       |   row_number() OVER (PARTITION BY nprobe, query_id
       |    ORDER BY s DESC, neighbor_id) AS rk
       |  FROM cand) WHERE rk <= ${Similarity.RecallK}),
       |hits AS (
       | SELECT a.nprobe, a.query_id, count(*) AS n_overlap
       | FROM approx a JOIN truth t
       |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
       | GROUP BY 1, 2)
       |SELECT cc.nprobe, count(*) AS n_queries,
       | CAST(sum(coalesce(h.n_overlap, 0)) AS BIGINT) AS total_overlap,
       | CAST(sum(cc.n_cand) AS BIGINT) AS total_cand,
       | CAST(sum(coalesce(h.n_overlap, 0)) AS DOUBLE)
       |  / (${Similarity.RecallK} * count(*)) AS mean_recall
       |FROM ccount cc
       |LEFT JOIN hits h ON h.nprobe = cc.nprobe AND h.query_id = cc.query_id
       |GROUP BY cc.nprobe
       |ORDER BY cc.nprobe""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_ann_recall_multi" -> (annRecallMulti _),
    "x_ann_multiprobe_topk" -> (multiprobeTopK _),
    "x_ann_filtered_topk" -> (filteredTopK _),
    "x_ann_nprobe_curve" -> (annNprobeCurve _))

  val oracles: Map[String, String] = Map(
    "x_ann_recall_multi" -> annRecallMultiSql,
    "x_ann_multiprobe_topk" -> multiprobeTopKSql,
    "x_ann_filtered_topk" -> filteredTopKSql,
    "x_ann_nprobe_curve" -> annNprobeCurveSql)
}
