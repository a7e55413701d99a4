package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Privacy operators for training-data pipelines: PII redaction (the
  * scrub every crawl corpus passes through before training) and
  * k-anonymity suppression (the release gate for quasi-identifier
  * aggregates). Both are deterministic column algebra — regexp_replace
  * chains and one hash-aggregate — so they run map-side / one-shuffle at
  * any scale and hash-compare exactly against the oracle.
  */
object Privacy {

  /** Redaction patterns, RE2/Java-compatible (no lookarounds, so the same
    * pattern string runs under Spark's java.util.regex and DuckDB's RE2).
    * Order matters: emails first (their local part looks like a word, but
    * their digits could otherwise be eaten by the phone pass), then IPv4
    * (dotted digits — phone-shaped), then phone runs.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

  /** Full scrub chain: email → [EMAIL], IPv4 → [IP], phone-run → [PHONE].
    * Each pass is a codegen'd regexp_replace over the column — map-only,
    * no shuffle, whole-stage codegen keeps it in one generated function.
    */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Long digit runs (account/customer numbers) → [ACCT]. */
  val AcctRe = "[0-9]{6,}"
  def maskAccounts(c: Column): Column = regexp_replace(c, AcctRe, "[ACCT]")

  /** x_pii_scrub — customer names with their embedded account number
    * masked, plus the digit count that was redacted (the audit metric a
    * scrub job reports). The fixture corpus has no emails/phones — those
    * patterns are pinned by PrivacySpec on planted strings — so the
    * declared query exercises the digit-run masker over real rows.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_custkey",
        maskAccounts($"c_name").as("masked_name"),
        (length($"c_name") -
          length(regexp_replace($"c_name", "[0-9]", ""))).cast("long")
          .as("n_digits"))
      .orderBy($"c_custkey")
  }

  val piiScrubSql: String =
    """SELECT c_custkey,
      | regexp_replace(c_name, '[0-9]{6,}', '[ACCT]', 'g') AS masked_name,
      | CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS n_digits
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** k-anonymity threshold for [[kAnon]]: groups smaller than K are
    * suppressed into one residual row. 8 splits the sf0.01 fixture's
    * (nation, segment) group-size range (5..21), so both paths fire at the
    * gate.
    */
  val K = 8

  /** x_k_anon — the k-anonymous release of the (nation, segment) customer
    * histogram: quasi-identifier groups with ≥ K members are released
    * as-is; smaller groups collapse into a single `__suppressed__` row
    * carrying only their total (so counts still reconcile, but no rare
    * combination is attributable). One hash-aggregate + a tiny residual
    * aggregate — the suppressed side is a scalar, not a second scan.
    */
  def kAnon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.customer(spark, dir)
      .groupBy($"c_nationkey".cast("long").as("nationkey"), $"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("n"))
    val released = g.filter($"n" >= K)
    val suppressed = g.filter($"n" < K)
      .agg(coalesce(sum($"n"), lit(0L)).as("n"))
      .filter($"n" > 0)
      .select(lit(-1L).as("nationkey"), lit("__suppressed__").as("segment"), $"n")
    released.union(suppressed).orderBy($"nationkey", $"segment")
  }

  val kAnonSql: String =
    s"""WITH g AS (
       | SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS segment,
       |        count(*) AS n
       | FROM customer GROUP BY 1, 2)
       |SELECT nationkey, segment, n FROM g WHERE n >= $K
       |UNION ALL
       |SELECT -1, '__suppressed__', CAST(sum(n) AS BIGINT) FROM g WHERE n < $K HAVING count(*) > 0
       |ORDER BY nationkey, segment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_pii_scrub" -> (piiScrub _),
    "x_k_anon" -> (kAnon _))

  val oracles: Map[String, String] = Map(
    "x_pii_scrub" -> piiScrubSql,
    "x_k_anon" -> kAnonSql)
}
