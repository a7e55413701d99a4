package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness parquet tables (see /root/repo/TESTDATA.md).
  *
  * All engine queries read through here so scan options stay in one place.
  * Parquet + column pruning + predicate pushdown come from Spark's vectorized
  * DataSource V2 reader; at the 100 TB design point the same call reads a
  * partitioned table directory instead of a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Every named load — including `apply(_, _, "events")` — goes through the
    * table's canonical loader, so no path hands out an inconsistent view of
    * the ns-timestamp table.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else raw(spark, dir, name)

  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every harness table as a temp view so users can `spark.sql`
    * against the engine directly (the SQL face of the library). `events`
    * goes through its ns-timestamp-safe loader.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp. Read nanos as long (`legacy.parquet.nanosAsLong`) and
    * truncate to microseconds with integer division — the same truncation
    * DuckDB applies when narrowing ns→µs, so oracle comparisons agree.
    *
    * NOTE the conf is deliberately SESSION-level (no per-read option
    * exists): after the first events() call, other ns-timestamp parquet in
    * the same session also reads as long instead of erroring. This library
    * has exactly one ns table, and a long column is strictly more
    * recoverable than Spark 4's refusal — but it is a session-wide effect,
    * recorded here.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val r = raw(spark, dir, "events")
    r.schema("ts").dataType match {
      case LongType =>
        r.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] without timezone (the regenerated fixtures) reads as
        // TIMESTAMP_NTZ, which `unix_micros`/`window` reject. Cast to the
        // session-zone TIMESTAMP; every entry point pins
        // spark.sql.session.timeZone=UTC, so the wall-clock is preserved and
        // epoch arithmetic agrees with DuckDB's naive-as-UTC interpretation.
        r.withColumn("ts", col("ts").cast("timestamp"))
      case _ => r
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
