package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Deduplication operators for training-data pipelines over `documents`.
  *
  *  - Exact dedup: hash-groupBy on a content hash — one shuffle on the hash,
  *    scales linearly; the canonical first step at 100 TB.
  *  - MinHash+LSH near-dedup: shingle → k minhashes → band buckets →
  *    bucket-equi-join for candidate pairs. The join is on (band, band_hash),
  *    so candidate generation never goes quadratic: cost is bounded by bucket
  *    sizes, the standard LSH scale-out argument. All hashing is md5-over-UTF8
  *    so the DuckDB oracle computes the identical signatures.
  *
  * Built-ins + higher-order functions only (SURVEY.md §7.3): no UDF, no
  * custom Expression needed — shingling is `transform(sequence(...))`, the
  * minhash is `array_min` over md5s, all inside codegen.
  */
object Dedup {

  /** x_dedup_exact — representative doc (min doc_id) per content hash. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("text_hash"))
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"doc_id")
  }

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY doc_id""".stripMargin

  val NumHashes = 8   // minhash signature length
  val NumBands = 4    // LSH bands (2 signatures per band)

  /** Word 3-gram shingles of a space-tokenized text column. */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    transform(sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ",
        element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))
  }

  /** One minhash component: min over shingles of md5("<h>:" + shingle).
    * Lexicographic min over fixed-width hex == numeric min of the hash.
    */
  def minhash(sh: Column, h: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$h:"), s))))

  /** Per-doc minhash signatures (docs with ≥3 tokens; all fixture docs are). */
  def signatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigCols = (0 until NumHashes).map(h => minhash($"sh", h).as(s"sig$h"))
    Tables.documents(spark, dir)
      .select($"doc_id", shingles($"text").as("sh"), split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select(($"doc_id" +: sigCols): _*)
  }

  /** LSH band rows: (doc_id, band, band_hash), band_hash = md5(sig_{2b}||sig_{2b+1}). */
  def bands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bandStructs = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        md5(concat(col(s"sig${2 * b}"), col(s"sig${2 * b + 1}"))).as("bh"))
    }
    signatures(spark, dir)
      .select($"doc_id", explode(array(bandStructs: _*)).as("x"))
      .select($"doc_id", $"x.band".as("band"), $"x.bh".as("bh"))
  }

  /** x_dedup_minhash — candidate near-duplicate pairs: docs sharing any LSH
    * band bucket. Equi-join on (band, band_hash); never quadratic.
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = bands(spark, dir)
    b.as("l").join(b.as("r"), Seq("band", "bh"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  val dedupMinhashSql: String = {
    val sigDefs = (0 until NumHashes)
      .map(h => s"list_min(list_transform(s, x -> md5('$h:' || x))) AS sig$h")
      .mkString(",\n  ")
    val bandRows = (0 until NumBands).map { b =>
      val u = if (b == 0) "" else "UNION ALL "
      s"${u}SELECT doc_id, $b AS band, md5(sig${2 * b} || sig${2 * b + 1}) AS bh FROM sigs"
    }.mkString("\n ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
       |  FROM toks WHERE len(t) >= 3),
       |sigs AS (SELECT doc_id,
       |  $sigDefs
       |  FROM sh),
       |bands AS (
       | $bandRows)
       |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** x_dedup_jaccard — exact n-gram Jaccard similarity for candidate pairs
    * (the verify step after LSH blocking): docs sharing a band, scored by
    * |A ∩ B| / |A ∪ B| over distinct shingle sets, exact integer arithmetic.
    */
  def dedupJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", array_distinct(shingles($"text")).as("sh"))
    val pairs = dedupMinhash(spark, dir)
    pairs
      .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"sh_a", $"sh_b")).cast("long").as("n_common"),
        size(array_union($"sh_a", $"sh_b")).cast("long").as("n_union"))
      .withColumn("jaccard", $"n_common".cast("double") / $"n_union")
      .orderBy($"doc_a", $"doc_b")
  }

  val dedupJaccardSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |  FROM toks WHERE len(t) >= 3),
       |shfull AS (SELECT doc_id,
       |  list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
       |  FROM toks WHERE len(t) >= 3),
       |sigs AS (SELECT doc_id,
       |  ${(0 until NumHashes).map(h => s"list_min(list_transform(s, x -> md5('$h:' || x))) AS sig$h").mkString(",\n  ")}
       |  FROM shfull),
       |bands AS (
       | ${(0 until NumBands).map { b =>
            val u = if (b == 0) "" else "UNION ALL "
            s"${u}SELECT doc_id, $b AS band, md5(sig${2 * b} || sig${2 * b + 1}) AS bh FROM sigs"
          }.mkString("\n ")}),
       |pairs AS (
       | SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       | FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id)
       |SELECT doc_a, doc_b,
       | CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
       | CAST(len(list_distinct(list_concat(a.s, b.s))) AS BIGINT) AS n_union,
       | CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
       |FROM pairs JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_dedup_exact" -> (dedupExact _),
    "x_dedup_minhash" -> (dedupMinhash _),
    "x_dedup_jaccard" -> (dedupJaccard _))

  val oracles: Map[String, String] = Map(
    "x_dedup_exact" -> dedupExactSql,
    "x_dedup_minhash" -> dedupMinhashSql,
    "x_dedup_jaccard" -> dedupJaccardSql)
}
