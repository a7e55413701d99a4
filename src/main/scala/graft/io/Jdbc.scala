package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink — the engine-side analogue of the reference's Postgres
  * leg (the spark-submit packages `org.postgresql:postgresql:42.7.7`,
  * kafka_stream.pyc @ 91; SURVEY.md §2.3 daily_kpis writes JDBC).
  *
  * Runtime-exercised broker-free: Spark's own distribution ships Apache
  * Derby (the metastore's embedded pure-JVM database), so JdbcSpec
  * round-trips a partitioned write and a predicate-pushdown parallel read
  * through these exact builders against `jdbc:derby:memory:` — same code
  * path a Postgres deployment takes, different driver string. The option
  * plumbing (partitioned parallel reads, batched writes) is the part that
  * matters at scale: without partitionColumn bounds a JDBC read is a
  * single-task bottleneck regardless of cluster size.
  */
object Jdbc {

  /** Batched append/overwrite to a JDBC table (the daily-KPIs sink). */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      user: String,
      password: String,
      mode: String = "append",
      driver: String = "org.postgresql.Driver",
      batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("driver", driver)
      .option("batchsize", batchSize)
      .mode(mode)
      .save()

  /** Does `table` exist on this connection? Probed via metadata, not a
    * swallowed exception, so real errors stay loud. Honors a
    * schema-qualified name: "analytics.kpis" must match
    * (TABLE_SCHEM=analytics, TABLE_NAME=kpis) and nothing else — a
    * bare-name match across all schemas would false-positive on a
    * same-named table in an unrelated schema. An UNQUALIFIED name
    * resolves against the connection's CURRENT schema (what subsequent
    * statements will see), never against same-named tables elsewhere.
    * Both patterns are pushed into getTables so the driver filters
    * server-side instead of this probe enumerating the whole catalog.
    */
  private[graft] def tableExists(
      conn: java.sql.Connection, table: String): Boolean = {
    val (schemaPart, namePart) = table.lastIndexOf('.') match {
      case -1 => (None, table)
      case i  => (Some(table.substring(0, i)), table.substring(i + 1))
    }
    val md = conn.getMetaData
    // Unquoted identifiers are case-folded by the engine before storage
    // (Derby/Oracle/DB2 upper-case, Postgres/MySQL lower-case) — fold the
    // probe the same way so the metadata pattern matches what the CREATE
    // actually stored.
    def folded(id: String): String =
      if (md.storesUpperCaseIdentifiers) id.toUpperCase(java.util.Locale.ROOT)
      else if (md.storesLowerCaseIdentifiers) id.toLowerCase(java.util.Locale.ROOT)
      else id
    // getTables' pattern args are LIKE patterns: escape the wildcards so
    // "kpi_sink" probes for exactly that table, not any "kpi?sink".
    val esc = Option(md.getSearchStringEscape).getOrElse("")
    def pat(id: String): String =
      if (esc.isEmpty) id
      else id.replace(esc, esc + esc)
        .replace("_", esc + "_").replace("%", esc + "%")
    val schemaPattern = schemaPart.map(s => pat(folded(s)))
      // pre-JDBC-4.1 drivers THROW from getSchema (SQLFeatureNotSupported,
      // or AbstractMethodError for jars compiled against JDBC 3/4.0 —
      // a LinkageError scala.util.Try would NOT catch) rather than
      // returning null; any failure here means "driver can't say",
      // which is exactly the any-schema fallback case.
      .orElse((try Option(conn.getSchema)
        catch { case _: Throwable => None }).map(pat))
      .orNull // driver without getSchema support: fall back to any-schema
    val rs = md.getTables(null, schemaPattern, pat(folded(namePart)),
      Array("TABLE"))
    try rs.next() finally rs.close()
  }

  /** Exactly-once (in row terms) micro-batch JDBC sink — the foreachBatch
    * recipe for the reference's daily-KPIs Postgres leg. Structured
    * Streaming re-runs a failed micro-batch under the SAME batchId, so the
    * write must converge under replay: delete this batch's rows by
    * `batch_id`, then append the payload stamped with it — the JDBC
    * analogue of the parquet sink's dynamic partition overwrite
    * ([[graft.streaming.Streaming]] writeBatch). The delete is ONE
    * driver-side statement on the (indexable) batch key; the insert is the
    * ordinary batched parallel write. The two statements are not one
    * transaction — a crash between them leaves a MISSING batch that the
    * replay itself repairs, never a duplicate: at-least-once delete +
    * idempotent re-insert is the standard converge-under-replay contract.
    */
  def writeBatchIdempotent(
      batch: DataFrame,
      batchId: Long,
      url: String,
      table: String,
      user: String,
      password: String,
      driver: String = "org.postgresql.Driver",
      batchSize: Int = 10000): Unit = {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url, user, password)
    try {
      // first-batch bootstrap: the sink table is created by the first
      // append below (Spark's JDBC append creates a missing table), so
      // the keyed delete only runs once the table exists. A cross-schema
      // false positive from the probe would skip the delete for qualified
      // sinks (replay would then DUPLICATE) — see [[tableExists]] for how
      // the probe pins schema and case-folding.
      if (tableExists(conn, table)) {
        // Spark's JDBC writer quotes column identifiers on CREATE, so the
        // stored column is the case-sensitive "batch_id" — the delete must
        // quote it the same way (ANSI double quotes: Derby + Postgres)
        val st = conn.prepareStatement(
          s"""DELETE FROM $table WHERE "batch_id" = ?""")
        try { st.setLong(1, batchId); st.executeUpdate() } finally st.close()
      }
    } finally conn.close()
    write(batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId)),
      url, table, user, password, mode = "append",
      driver = driver, batchSize = batchSize)
  }

  /** Parallel partitioned read: numPartitions concurrent range scans on a
    * numeric column — without these options a JDBC read is a single-task
    * bottleneck regardless of cluster size.
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      driver: String = "org.postgresql.Driver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
}
