package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Cardinality sketching that survives a cross-engine hash gate.
  *
  * HLL-family sketches (Spark's `approx_count_distinct`, DuckDB's
  * `approx_count_distinct`) give engine-dependent estimates — useless when
  * results must be reproducible across engines or runs. K-Minimum-Values
  * is the deterministic alternative: hash every key with md5 (identical
  * everywhere), keep the k smallest DISTINCT hash values, and estimate
  * |D| ≈ (k−1)/u_k where u_k is the kth minimum as a fraction of the hash
  * space. Every step — md5, lexicographic hex order, exact integer parse,
  * one IEEE division — is bit-identical in any engine.
  *
  * Scale path: "k smallest values" is exactly Spark's TakeOrdered pattern —
  * each partition keeps its local k minima, the driver merges k·P values.
  * The sketch is MERGEABLE (union of KMV sets, re-truncated to k, is the
  * KMV of the union), so per-partition/per-day sketches compose into a
  * corpus-wide estimate without rescanning — the property that matters at
  * 100 TB, where the exact `count(DISTINCT)` this query also emits for
  * comparison would be a full shuffle of every key.
  */
object Sketch {

  val K = 256
  /** 16^13 = 2^52: 13 hex chars parse exactly into both long and double. */
  val HashSpace: Double = 4503599627370496.0

  /** x_kmv_distinct — KMV estimate of |distinct l_orderkey| side-by-side
    * with the exact count. One row: k, the kth-minimum hash, the estimate,
    * the exact cardinality, and the signed relative error.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val kth = li
      .select(substring(md5($"l_orderkey".cast("string")), 1, 13).as("h13"))
      .distinct()
      .orderBy($"h13")
      .limit(K)
      .agg(max($"h13").as("kth_hash"), count(lit(1)).as("k"))
    val exact = li.agg(countDistinct($"l_orderkey").as("n_exact"))
    kth.crossJoin(exact)
      .select(
        $"k", $"kth_hash", $"n_exact",
        (($"k".cast("double") - 1.0) * lit(HashSpace) /
          conv($"kth_hash", 16, 10).cast("long").cast("double")).as("estimate"))
      .select($"k", $"kth_hash", $"n_exact", $"estimate",
        (($"estimate" - $"n_exact".cast("double")) / $"n_exact".cast("double")).as("rel_err"))
  }

  val kmvDistinctSql: String =
    s"""WITH h AS (
       | SELECT DISTINCT substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 13) AS h13
       | FROM lineitem),
       |topk AS (SELECT h13 FROM h ORDER BY h13 LIMIT $K),
       |kth AS (SELECT max(h13) AS kth_hash, CAST(count(*) AS BIGINT) AS k FROM topk),
       |ex AS (SELECT count(DISTINCT l_orderkey) AS n_exact FROM lineitem),
       |est AS (
       | SELECT kth.k, kth.kth_hash, ex.n_exact,
       |  (CAST(kth.k AS DOUBLE) - 1.0) * $HashSpace /
       |    CAST(CAST('0x' || kth.kth_hash AS BIGINT) AS DOUBLE) AS estimate
       | FROM kth, ex)
       |SELECT k, kth_hash, n_exact, estimate,
       | (estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
       |FROM est""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_kmv_distinct" -> (kmvDistinct _))

  val oracles: Map[String, String] = Map(
    "x_kmv_distinct" -> kmvDistinctSql)
}
