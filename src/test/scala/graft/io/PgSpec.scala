package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

/** The Postgres leg, runtime-exercised against a REAL PostgreSQL 15 server
  * (see [[PgTestServer]]) through the wire-protocol client in [[Pg]] — the
  * reference's `kafka_stream.pyc @ 91` sink, previously provable only
  * through Derby because no JDBC driver jar ships with this image.
  *
  * Every test `assume`s the server can be provisioned, so the suite
  * CANCELS (not fails) on images without the binaries — environment drift
  * is the norm here.
  */
class PgSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tgt =
    if (PgTestServer.available) Some(PgTestServer.target()) else None

  private def withPg(f: Pg.Target => Unit): Unit = {
    assume(PgTestServer.available,
      "postgres binaries/user not present on this image")
    f(tgt.get)
  }

  // every verification connection is closed — a bare t.connect().query(...)
  // leaks a socket AND a dedicated postgres backend until JVM exit
  private def queryOnce(t: Pg.Target, sql: String) = {
    val conn = t.connect()
    try conn.query(sql) finally conn.close()
  }

  private def kpis = Seq(
    (1L, "2025-07-01", 120.5, 17L),
    (2L, "2025-07-02", 98.25, 11L),
    (3L, "2025-07-03", 143.0, 21L),
    (4L, "2025-07-04", 77.75, 9L),
    (5L, "2025-07-05", 160.0, 25L),
    (6L, "2025-07-06", 55.5, 6L))
    .toDF("id", "ds", "revenue", "n_orders")

  test("wire protocol basics: exec + query round a real server") {
    withPg { t =>
      val conn = t.connect()
      try {
        assert(conn.query("SELECT 41 + 1").head.head.contains("42"))
        assert(conn.query("SELECT NULL").head.head.isEmpty)
        // server-side error surfaces as an exception AND the connection
        // stays usable (the cycle drains to ReadyForQuery first)
        val e = intercept[java.io.IOException](conn.exec("SELECT no_such_col"))
        assert(e.getMessage.contains("SQLSTATE"))
        assert(conn.query("SELECT version()").head.head.get.contains("PostgreSQL"))
        // startup ParameterStatus capture: readPartitioned's numeric-exact
        // extract(epoch ...) contract requires server >= 14 and asserts on
        // this field — it must be populated, and on this image it's PG 15
        assert(conn.serverMajor >= 14,
          s"server_version not captured at startup (got ${conn.serverMajor})")
        // resolved path agrees with the startup capture, and the SHOW
        // fallback it would use on ParameterStatus-stripping middleware
        // parses to the same major on the real wire (150004 / 10000 = 15)
        assert(conn.serverMajorResolved == conn.serverMajor)
        assert(conn.query("SHOW server_version_num").head.head
          .flatMap(_.trim.toIntOption).map(_ / 10000)
          .contains(conn.serverMajor))
      } finally conn.close()
    }
  }

  test("distributed COPY write + bound-partitioned parallel read round-trip") {
    withPg { t =>
      Pg.writePartitioned(kpis.repartition(3), t, "daily_kpis", overwrite = true)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("ds", StringType),
        StructField("revenue", DoubleType), StructField("n_orders", LongType)))
      val back = Pg.readPartitioned(spark, t, "daily_kpis", schema,
        partCol = "id", lower = 1L, upper = 6L, numParts = 3)
      assert(back.rdd.getNumPartitions == 3,
        "read must be bound-partitioned, not single-task")
      assert(back.as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
        == kpis.as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq)
      // overwrite truncates rather than appending
      Pg.writePartitioned(kpis, t, "daily_kpis", overwrite = true)
      assert(queryOnce(t, "SELECT count(*) FROM daily_kpis")
        .head.head.contains("6"))
    }
  }

  test("COPY text escaping survives tabs, newlines, backslashes and NULLs") {
    withPg { t =>
      val nasty = Seq(
        (1L, Some("plain")),
        (2L, Some("tab\there")),
        (3L, Some("line\nbreak")),
        (4L, Some("back\\slash")),
        (5L, Some("cr\rhere")),
        (6L, None: Option[String]))
        .toDF("id", "s")
      Pg.writePartitioned(nasty, t, "nasty", overwrite = true)
      val got = queryOnce(t, "SELECT id, s FROM nasty ORDER BY id")
        .map { r => (r(0).get.toLong, r(1)) }
      assert(got == Vector(
        (1L, Some("plain")), (2L, Some("tab\there")), (3L, Some("line\nbreak")),
        (4L, Some("back\\slash")), (5L, Some("cr\rhere")), (6L, None)))
    }
  }

  test("typed round-trip: timestamp, date, decimal, boolean, bytea") {
    withPg { t =>
      val df = Seq(
        (1L, java.sql.Timestamp.valueOf("2025-07-01 12:34:56.789"),
          java.sql.Date.valueOf("2025-07-01"), BigDecimal("12345.67"),
          true, Array[Byte](0, 1, 127, -128)),
        (2L, java.sql.Timestamp.valueOf("1999-12-31 23:59:59.000001"),
          java.sql.Date.valueOf("1999-12-31"), BigDecimal("-0.01"),
          false, Array[Byte]()))
        .toDF("id", "ts", "d", "amount", "flag", "payload")
        // pin the intended numeric(10,2) — a bare Scala BigDecimal infers
        // Spark's default DecimalType(38,18), which would round-trip with
        // 18 digits of trailing zeros
        .withColumn("amount", $"amount".cast("decimal(10,2)"))
      Pg.writePartitioned(df, t, "typed", overwrite = true)
      val got = queryOnce(t,
        "SELECT id, ts, d, amount, flag, encode(payload,'hex') FROM typed ORDER BY id")
      assert(got(0) == Vector(Some("1"), Some("2025-07-01 12:34:56.789"),
        Some("2025-07-01"), Some("12345.67"), Some("t"), Some("00017f80")))
      assert(got(1) == Vector(Some("2"), Some("1999-12-31 23:59:59.000001"),
        Some("1999-12-31"), Some("-0.01"), Some("f"), Some("")))
      // and back through the engine-side cast path — BinaryType included
      // (bytea is hex-rendered server-side and unhex'd engine-side; a
      // plain string->binary cast would return the UTF-8 bytes of the
      // hex TEXT, silent corruption)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampType),
        StructField("d", DateType),
        StructField("amount", DecimalType(10, 2)),
        StructField("flag", BooleanType),
        StructField("payload", BinaryType)))
      val back = Pg.readPartitioned(spark, t, "typed", schema,
        "id", 1L, 2L, 2)
      val rows = back.orderBy("id").collect()
      assert(rows(0).getTimestamp(1) ==
        java.sql.Timestamp.valueOf("2025-07-01 12:34:56.789"))
      assert(rows(0).getDate(2) == java.sql.Date.valueOf("2025-07-01"))
      assert(rows(0).getDecimal(3) == new java.math.BigDecimal("12345.67"))
      assert(rows(0).getBoolean(4) && !rows(1).getBoolean(4))
      assert(rows(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](0, 1, 127, -128))
      assert(rows(1).getAs[Array[Byte]](5).isEmpty)
    }
  }

  test("timestamp round-trip is session-timezone independent") {
    withPg { t =>
      // the sink renders UTC wall into a zoneless column and the read
      // extracts exact epoch micros server-side — the same INSTANT must
      // come back whatever spark.sql.session.timeZone says
      val instant = java.time.Instant.parse("2025-07-01T16:34:56.123456Z")
      val df = Seq(Tuple2(1L, java.sql.Timestamp.from(instant)))
        .toDF("id", "ts")
      Pg.writePartitioned(df, t, "tz_rt", overwrite = true)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampType)))
      val prior = spark.conf.get("spark.sql.session.timeZone")
      try {
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        val got = Pg.readPartitioned(spark, t, "tz_rt", schema, "id", 1L, 1L, 1)
          .collect().head.getTimestamp(1).toInstant
        assert(got == instant, s"instant shifted under session tz: $got")
      } finally spark.conf.set("spark.sql.session.timeZone", prior)
    }
  }

  test("readPartitioned keeps out-of-bounds and NULL-key rows (Spark-JDBC bound semantics)") {
    withPg { t =>
      val df = Seq(
        (Some(0L), "below"), (Some(3L), "inside"), (Some(9L), "above"),
        (Option.empty[Long], "nullkey"))
        .toDF("id", "s")
      Pg.writePartitioned(df, t, "bounds_rt", overwrite = true)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("s", StringType)))
      // bounds cover only [2, 5] — rows at 0, 9, and NULL must STILL appear
      // (bounds shape partitions; they never filter)
      val back = Pg.readPartitioned(spark, t, "bounds_rt", schema,
        "id", 2L, 5L, 3)
      val got = back.collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1))).toSet
      assert(got == Set(
        (Some(0L), "below"), (Some(3L), "inside"), (Some(9L), "above"),
        (None, "nullkey")))
      // single-partition degenerate case still reads everything
      assert(Pg.readPartitioned(spark, t, "bounds_rt", schema,
        "id", 0L, 0L, 1).count() == 4)
    }
  }

  test("idempotent micro-batch sink converges under same-batchId replay") {
    withPg { t =>
      val b0 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      val b1 = Seq((3L, 30.0)).toDF("k", "v")
      Pg.writeBatchIdempotent(b0, 0L, t, "mb_sink")
      Pg.writeBatchIdempotent(b1, 1L, t, "mb_sink")
      // replay batch 0 (Structured Streaming re-runs a failed batch under
      // the SAME id): row-level no-op, batch 1 untouched
      Pg.writeBatchIdempotent(b0, 0L, t, "mb_sink")
      val got = queryOnce(t,
        "SELECT k, v, batch_id FROM mb_sink ORDER BY k")
      assert(got == Vector(
        Vector(Some("1"), Some("10"), Some("0")),
        Vector(Some("2"), Some("20"), Some("0")),
        Vector(Some("3"), Some("30"), Some("1"))))
    }
  }
}
