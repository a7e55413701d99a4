package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Library operator (not oracle-declared): float mean aggregation is
  * order-dependent across engines, so correctness is pinned by the recall
  * unit test instead of the DuckDB hash gate.
  */
object Ivf {

  /** vectors: (vec_id long, v array<double>). Returns (cid int, centroid).
    *
    * Deterministic stride seeding: one seed per n/nlist span of the id-sorted
    * input (consecutive-id seeding degenerates when ids correlate with
    * clusters — all seeds land in one cluster and Lloyd can't recover).
    */
  def train(spark: SparkSession, vectors: DataFrame, nlist: Int, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val n = vectors.count()
    val stride = math.max(1L, n / nlist)
    val w = Window.orderBy($"vec_id")
    var centroids = vectors
      .withColumn("rn", row_number().over(w) - 1)
      .filter($"rn" % stride === 0 && $"rn" / stride < nlist)
      .select(($"rn" / stride).cast("int").as("cid"), $"v".as("centroid"))
    (1 to iters).foreach { _ =>
      val assigned = assign(spark, vectors, centroids)
      centroids = assigned
        .join(vectors, "vec_id")
        .select($"cid", posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"cid", $"pos").agg(avg($"x").as("m"))
        .groupBy($"cid")
        .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
        .select($"cid", transform($"pm", p => p.getField("m")).as("centroid"))
    }
    centroids
  }

  /** (vec_id, cid): nearest centroid by cosine, deterministic tie-break. */
  def assign(spark: SparkSession, vectors: DataFrame, centroids: DataFrame): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid".asc)
    vectors.crossJoin(broadcast(centroids))
      .withColumn("sim", cosineFast(spark, $"v", $"centroid"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"cid")
  }

  /** Top-k cosine neighbors per query, searching only nProbe inverted lists.
    * queries: (query_id, qv). Returns (query_id, neighbor_id, rnk, sim).
    */
  def search(
      spark: SparkSession,
      vectors: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int): DataFrame = {
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

    val wTop = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    probed.join(lists, "cid") // equi-join on the inverted-list id: the ANN win
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("sim", cosineFast(spark, $"qv", $"nv"))
      .withColumn("rnk", row_number().over(wTop))
      .filter($"rnk" <= k)
      .select($"query_id", $"neighbor_id", $"rnk", $"sim")
  }
}
