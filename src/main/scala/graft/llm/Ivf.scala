package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.Similarity.cosineFast

/** IVF (inverted-file) approximate nearest-neighbor index — the scale path
  * for similarity search beyond brute force (SURVEY.md north-star ops):
  *
  *  1. train: k coarse centroids (deterministic seeding: the first `nlist`
  *     vectors by id; fixed Lloyd iterations, cosine assignment);
  *  2. assign: every vector → nearest centroid (broadcast centroids, one
  *     map-only pass — the inverted lists are just a `cid` column, so they
  *     partition/bucket naturally at 100 TB);
  *  3. search: probe only the `nProbe` nearest inverted lists per query —
  *     an equi-join on `cid` instead of a full cross join, cutting candidate
  *     generation by ~nlist/nProbe.
  *
  * The exhaustive-probe configuration (nProbe = nlist) is exact — identical
  * to brute force whatever the centroids are — which is what lets
  * `x_ivf_topk` go through the DuckDB hash gate; the approximate path
  * (nProbe < nlist, where float-mean centroids steer recall) is pinned by
  * the IvfSpec recall test instead.
  */
object Ivf {

  /** vectors: (vec_id long, v array<double>). Returns (cid int, centroid),
    * materialized as a driver-local DataFrame (nlist rows ≪ N — the standard
    * k-means shape: centroids live on the driver, data stays distributed, and
    * every downstream use is a cheap broadcast instead of re-running Lloyd).
    *
    * Deterministic stride seeding WITHOUT a global sort: candidate seeds are
    * the rows whose id is a stride multiple (consecutive-id seeding
    * degenerates when ids correlate with clusters), a distributed top-k
    * (TakeOrderedAndProject) keeps the nlist smallest, and the tiny result is
    * indexed on the driver. No single-partition exchange anywhere — the
    * round-1 `Window.orderBy(vec_id)` seeding forced ALL vectors through one
    * task and was the repo's one true scale-killer.
    */
  def train(spark: SparkSession, vectors: DataFrame, nlist: Int, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val n = vectors.count()
    val stride = math.max(1L, n / nlist)
    var seeds = vectors
      .filter(pmod($"vec_id", lit(stride)) === 0)
      .orderBy($"vec_id").limit(nlist)                 // distributed top-k
      .select($"vec_id", $"v")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    if (seeds.length < nlist)                          // sparse-id fallback
      seeds = (seeds ++ vectors.orderBy($"vec_id").limit(nlist)
        .select($"vec_id", $"v").as[(Long, Seq[Double])].collect()
        .filterNot(s => seeds.exists(_._1 == s._1))).sortBy(_._1).take(nlist)
    var centroids = toLocalCentroids(spark, seeds.zipWithIndex.map { case ((_, v), i) => (i, v) })
    (1 to iters).foreach { _ =>
      val updated = assign(spark, vectors, centroids)
        .join(vectors, "vec_id")
        .select($"cid", posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"cid", $"pos").agg(avg($"x").as("m"))
        .groupBy($"cid")
        .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
        .select($"cid", transform($"pm", p => p.getField("m")).as("centroid"))
        .as[(Int, Seq[Double])].collect().sortBy(_._1)
      centroids = toLocalCentroids(spark, updated)
    }
    centroids
  }

  private def toLocalCentroids(spark: SparkSession, rows: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("cid", "centroid")
  }

  /** (vec_id, cid): nearest centroid by cosine, deterministic tie-break
    * (lowest cid wins at equal similarity — `max_by` over (sim, -cid)).
    *
    * Argmax via hash aggregate, NOT a row_number window: a window over the
    * crossJoin output would shuffle all N×nlist scored rows by vec_id —
    * an nlist-fold amplification of the hottest exchange in the index. The
    * aggregate form reduces map-side (each partition keeps one running best
    * per vec_id), so the exchange carries one row per vector.
    */
  def assign(spark: SparkSession, vectors: DataFrame, centroids: DataFrame): DataFrame = {
    import spark.implicits._
    vectors.crossJoin(broadcast(centroids))
      .withColumn("sim", cosineFast(spark, $"v", $"centroid"))
      .groupBy($"vec_id")
      .agg(max_by($"cid", struct($"sim", -$"cid")).as("cid"))
  }

  /** Top-k cosine neighbors per query, searching only nProbe inverted lists.
    * queries: (query_id, qv). Returns (query_id, neighbor_id, rnk, sim).
    * roundSim ≥ 0 rounds the cosine to that many decimals BEFORE ranking
    * (with -0.0 canonicalized) so an oracle's float fold ranks identically.
    *
    * `excludeSelf` drops neighbors with vec_id == query_id — correct ONLY
    * when query ids live in the vector id space (as in ivfTopK, whose
    * probes ARE vectors). Pass false for external query ids, or a vector
    * that happens to share a number with a query id is silently unfindable.
    */
  def search(
      spark: SparkSession,
      vectors: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      roundSim: Int = -1,
      excludeSelf: Boolean = true): DataFrame = {
    import spark.implicits._
    val lists = assign(spark, vectors, centroids)
      .join(vectors, "vec_id")
      .select($"cid", $"vec_id".as("neighbor_id"), $"v".as("nv"))

    val wProbe = Window.partitionBy($"query_id").orderBy($"csim".desc, $"cid".asc)
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", cosineFast(spark, $"qv", $"centroid"))
      .withColumn("prn", row_number().over(wProbe))
      .filter($"prn" <= nProbe)
      .select($"query_id", $"qv", $"cid")

    val rawSim = cosineFast(spark, $"qv", $"nv")
    val simCol = if (roundSim >= 0) round(rawSim, roundSim) + lit(0.0) else rawSim
    val wTop = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    val joined = probed.join(lists, "cid") // equi-join on the inverted-list id: the ANN win
    (if (excludeSelf) joined.filter($"query_id" =!= $"neighbor_id") else joined)
      .withColumn("sim", simCol)
      .withColumn("rnk", row_number().over(wTop))
      .filter($"rnk" <= k)
      .select($"query_id", $"neighbor_id", $"rnk", $"sim")
  }

  val TopKList = 8   // declared-query nlist
  val TopKK = 8      // declared-query k

  /** x_ivf_topk — the declared, oracle-gated face of the ANN index: train 8
    * coarse lists over `embeddings`, then search 5 probe vectors (ids 5..9)
    * with nProbe = nlist. Exhaustive probe makes the result EXACTLY the
    * brute-force top-k (so the DuckDB oracle gates the whole train → assign →
    * inverted-list-join machinery end to end, independent of float-mean
    * centroid drift); the nProbe < nlist approximate path rides the same code
    * and is pinned by IvfSpec's recall test.
    */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val centroids = train(spark, e, TopKList, iters = 1)
    val probes = e.filter($"vec_id" >= 5 && $"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    search(spark, e, centroids, probes, k = TopKK, nProbe = TopKList, roundSim = 6)
      .orderBy($"query_id", $"rnk")
  }

  /** Oracle: brute-force cosine top-k — by construction identical to the
    * exhaustive-probe IVF search above.
    */
  val ivfTopKSql: String =
    s"""WITH e AS (
       | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       | FROM embeddings),
       |pairs AS (
       | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  round(
       |   list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2])) /
       |   sqrt(list_sum(list_transform(q.v, x -> x * x)) * list_sum(list_transform(c.v, x -> x * x))),
       |   6) + 0.0 AS sim
       | FROM e q, e c
       | WHERE q.vec_id >= 5 AND q.vec_id < 10 AND q.vec_id != c.vec_id),
       |ranked AS (
       | SELECT query_id, neighbor_id, sim,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rnk
       | FROM pairs)
       |SELECT query_id, neighbor_id, rnk, sim
       |FROM ranked WHERE rnk <= $TopKK
       |ORDER BY query_id, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_ivf_topk" -> (ivfTopK _))

  val oracles: Map[String, String] = Map(
    "x_ivf_topk" -> ivfTopKSql)
}
