package graft.io

import graft.SparkSpec

/** Round-trips the JDBC builders against Apache Derby's embedded engine —
  * pure-JVM, shipped in Spark's own jars directory for the metastore, so
  * the SAME `io.Jdbc` code path the reference's Postgres leg uses
  * (kafka_stream.pyc @ 91) executes for real here: driver loading, batched
  * writes, bound-partitioned parallel reads, and filter pushdown into the
  * remote scan.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"
  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def kpis = Seq(
    (1L, "2025-07-01", 120.5, 17L),
    (2L, "2025-07-02", 98.25, 11L),
    (3L, "2025-07-03", 143.0, 21L),
    (4L, "2025-07-04", 77.75, 9L),
    (5L, "2025-07-05", 160.0, 25L),
    (6L, "2025-07-06", 55.5, 6L))
    .toDF("id", "ds", "revenue", "n_orders")

  test("partitioned write + bound-partitioned parallel read round-trip") {
    Jdbc.write(kpis.repartition(3), url("rt"), "daily_kpis",
      user = "app", password = "", mode = "overwrite",
      driver = DerbyDriver, batchSize = 2)
    val back = Jdbc.readPartitioned(spark, url("rt"), "daily_kpis",
      user = "app", password = "",
      partitionColumn = "id", lowerBound = 1L, upperBound = 7L,
      numPartitions = 3, driver = DerbyDriver)
    // the read is genuinely parallel: one range scan per partition
    assert(back.rdd.getNumPartitions == 3)
    assert(back.orderBy($"id").collect().toSeq ==
      kpis.orderBy($"id").collect().toSeq)
  }

  test("filters push down into the JDBC scan, not a post-scan Spark filter") {
    Jdbc.write(kpis, url("push"), "daily_kpis",
      user = "app", password = "", mode = "overwrite", driver = DerbyDriver)
    val filtered = Jdbc.readPartitioned(spark, url("push"), "daily_kpis",
      user = "app", password = "",
      partitionColumn = "id", lowerBound = 1L, upperBound = 7L,
      numPartitions = 2, driver = DerbyDriver)
      .filter($"n_orders" > 10L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(n_orders,10)"),
      s"expected n_orders > 10 pushed into the JDBC scan:\n$plan")
    assert(filtered.count() == 4)
  }

  test("append mode accumulates batches (the daily-KPIs sink contract)") {
    Jdbc.write(kpis.filter($"id" <= 3), url("app1"), "daily_kpis",
      user = "app", password = "", mode = "overwrite", driver = DerbyDriver)
    Jdbc.write(kpis.filter($"id" > 3), url("app1"), "daily_kpis",
      user = "app", password = "", mode = "append", driver = DerbyDriver)
    val back = Jdbc.readPartitioned(spark, url("app1"), "daily_kpis",
      user = "app", password = "",
      partitionColumn = "id", lowerBound = 1L, upperBound = 7L,
      numPartitions = 2, driver = DerbyDriver)
    assert(back.count() == 6)
  }

  test("batch_id-keyed delete-then-append converges under micro-batch replay") {
    val u = url("replay")
    // bootstrap the sink table with batch 0 (the column set a foreachBatch
    // JDBC sink owns: payload + batch_id)
    Jdbc.writeBatchIdempotent(kpis.filter($"id" <= 3), 0L, u, "kpi_sink",
      user = "app", password = "", driver = DerbyDriver)
    Jdbc.writeBatchIdempotent(kpis.filter($"id" > 3), 1L, u, "kpi_sink",
      user = "app", password = "", driver = DerbyDriver)
    def rows() = Jdbc.readPartitioned(spark, u, "kpi_sink",
      user = "app", password = "",
      partitionColumn = "id", lowerBound = 1L, upperBound = 7L,
      numPartitions = 2, driver = DerbyDriver)
      .select($"batch_id", $"id").as[(Long, Long)].collect().toSet
    val before = rows()
    assert(before == Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L), (1L, 6L)))
    // failure recovery: the SAME batchId re-delivers the SAME payload —
    // a plain append would duplicate batch 1; the keyed delete converges
    Jdbc.writeBatchIdempotent(kpis.filter($"id" > 3), 1L, u, "kpi_sink",
      user = "app", password = "", driver = DerbyDriver)
    assert(rows() == before)
  }

  test("schema-qualified sink names replay-converge too (the probe matches schema AND name)") {
    val u = url("qualified")
    // Derby resolves the unqualified form to the user's default schema APP;
    // the qualified name must hit the SAME existence probe path
    Jdbc.writeBatchIdempotent(kpis.filter($"id" <= 2), 0L, u, "app.kpi_q",
      user = "app", password = "", driver = DerbyDriver)
    Jdbc.writeBatchIdempotent(kpis.filter($"id" === 3), 1L, u, "app.kpi_q",
      user = "app", password = "", driver = DerbyDriver)
    def rows() = Jdbc.readPartitioned(spark, u, "app.kpi_q",
      user = "app", password = "",
      partitionColumn = "id", lowerBound = 1L, upperBound = 7L,
      numPartitions = 2, driver = DerbyDriver)
      .select($"batch_id", $"id").as[(Long, Long)].collect().toSet
    val before = rows()
    assert(before == Set((0L, 1L), (0L, 2L), (1L, 3L)))
    // replay of batch 1 under the qualified name: a bare-name probe that
    // failed to match would skip the delete and duplicate (1L, 3L)
    Jdbc.writeBatchIdempotent(kpis.filter($"id" === 3), 1L, u, "app.kpi_q",
      user = "app", password = "", driver = DerbyDriver)
    assert(rows() == before)
  }

  test("unqualified probe resolves against the CURRENT schema, not any schema") {
    val u = url("xschema")
    // Plant a same-named table in an UNRELATED schema before the sink's
    // first batch: a probe that scans all schemas would see it, believe
    // the sink exists, and run the keyed DELETE against the current-schema
    // name — which Derby rejects (APP.KPI_X doesn't exist yet), failing
    // the very first micro-batch.
    val conn = java.sql.DriverManager.getConnection(u, "app", "")
    try {
      val st = conn.createStatement()
      try {
        st.executeUpdate("CREATE SCHEMA other")
        st.executeUpdate(
          "CREATE TABLE other.kpi_x (id BIGINT, batch_id BIGINT)")
      } finally st.close()
    } finally conn.close()
    Jdbc.writeBatchIdempotent(kpis.filter($"id" <= 2), 0L, u, "kpi_x",
      user = "app", password = "", driver = DerbyDriver)
    // replay still converges through the schema-scoped probe
    Jdbc.writeBatchIdempotent(kpis.filter($"id" <= 2), 0L, u, "kpi_x",
      user = "app", password = "", driver = DerbyDriver)
    val back = Jdbc.readPartitioned(spark, u, "kpi_x",
      user = "app", password = "",
      partitionColumn = "id", lowerBound = 1L, upperBound = 7L,
      numPartitions = 2, driver = DerbyDriver)
      .select($"batch_id", $"id").as[(Long, Long)].collect().toSet
    assert(back == Set((0L, 1L), (0L, 2L)))
    // the decoy in the other schema was never touched
    val conn2 = java.sql.DriverManager.getConnection(u, "app", "")
    try {
      val rs = conn2.createStatement()
        .executeQuery("SELECT count(*) FROM other.kpi_x")
      rs.next()
      assert(rs.getInt(1) == 0)
      rs.close()
    } finally conn2.close()
  }
}
