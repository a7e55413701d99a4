package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")

  private def ev(id: Long, t: String, user: Long, etype: String, v: Double): String =
    s"""{"event_id":$id,"ts":"$t","user_id":$user,"event_type":"$etype","value":$v}"""

  test("session_window groups events within gap; watermark finalizes sessions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val stats = Streaming.sessionStats(
      Streaming.parseJson(input.toDF(), schema), gap = "30 minutes", watermark = "10 minutes")
    val q = stats.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // one session for user 1 (10:00, 10:10), one event user 2
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
        ev(2, "2024-01-01 10:10:00", 1, "click", 2.0),
        ev(3, "2024-01-01 10:05:00", 2, "view", 5.0))
      q.processAllAvailable()
      // advance the watermark far past both sessions' close
      input.addData(ev(9, "2024-01-01 13:00:00", 9, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("sess")
        .select($"user_id", $"n_events", $"session_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(out.contains((1L, 2L, 3.0))) // merged session, exact decimal sum
      assert(out.contains((2L, 1L, 5.0)))
    } finally q.stop()
  }

  test("late event beyond the watermark is dropped from session state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val stats = Streaming.sessionStats(
      Streaming.parseJson(input.toDF(), schema), gap = "30 minutes", watermark = "10 minutes")
    val q = stats.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", 1, "view", 1.0))
      q.processAllAvailable()
      input.addData(ev(2, "2024-01-01 13:00:00", 2, "view", 1.0)) // watermark -> 12:50
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 10:05:00", 1, "click", 2.0)) // too late
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 16:00:00", 3, "view", 1.0)) // close user 2's session
      q.processAllAvailable()
      val user1 = spark.table("sess_late").filter($"user_id" === 1L)
        .select($"n_events").as[Long].collect().toSeq
      assert(user1 == Seq(1L)) // the late click never joined the session
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits a summary when a user's session closes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import Streaming.{SessionSummary, UserEvent}
    val input = MemoryStream[UserEvent]
    val q = Streaming.userSessionTracker(input.toDS(), gapMs = 30 * 60 * 1000,
        idleTimeoutMs = 0 /* NoTimeout: keeps processAllAvailable deterministic */)
      .writeStream.format("memory").queryName("tracker").outputMode("append").start()
    def ev(u: Long, t: String, v: Double) =
      UserEvent(u, java.sql.Timestamp.valueOf(t), v)
    try {
      // session 1 for user 7: two events
      input.addData(ev(7, "2024-01-01 10:00:00", 1.5), ev(7, "2024-01-01 10:10:00", 2.25))
      q.processAllAvailable()
      assert(spark.table("tracker").isEmpty) // session still open, nothing emitted
      // a later event past the gap closes session 1 and opens session 2
      input.addData(ev(7, "2024-01-01 12:00:00", 10.0))
      q.processAllAvailable()
      val out = spark.table("tracker").as[SessionSummary].collect().toSeq
      assert(out == Seq(SessionSummary(7L, 1L, 2L, 3.75))) // exact cents math
    } finally q.stop()
  }

  test("dedupStream drops payload duplicates across batches, state watermark-bounded") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = Streaming.dedupStream(
      input.toDF().toDF("ts", "text"), payloadCol = "text", watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData((t("2024-01-01 10:00:00"), "alpha"), (t("2024-01-01 10:00:01"), "beta"))
      q.processAllAvailable()
      // same payload again within the watermark window: dropped
      input.addData((t("2024-01-01 10:01:00"), "alpha"))
      q.processAllAvailable()
      val texts = spark.table("dedup").select($"text").as[String].collect().toSeq
      assert(texts.sorted == Seq("alpha", "beta"))
    } finally q.stop()
  }

  test("dedupStream: null payloads pass through instead of collapsing to one") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Option[String])]
    val deduped = Streaming.dedupStream(input.toDF().toDF("ts", "text"))
    val q = deduped.writeStream.format("memory").queryName("nulldedup")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData((t("2024-01-01 10:00:00"), None),
        (t("2024-01-01 10:00:01"), None), (t("2024-01-01 10:00:02"), Some("x")))
      q.processAllAvailable()
      input.addData((t("2024-01-01 10:01:00"), Some("x"))) // real dup: dropped
      q.processAllAvailable()
      assert(spark.table("nulldedup").count() == 3) // 2 null rows + 1 "x"
    } finally q.stop()
  }

  test("a late event folds into the session without rewinding its clock") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import Streaming.UserEvent
    val input = MemoryStream[UserEvent]
    def ev(sec: Long) = UserEvent(1L, new java.sql.Timestamp(sec * 1000), 1.0)
    val out = Streaming.userSessionTracker(
      input.toDS(), gapMs = 50000L, idleTimeoutMs = 0L)
    val q = out.writeStream.format("memory").queryName("lateclock")
      .outputMode("append").start()
    try {
      input.addData(ev(100))
      q.processAllAvailable()
      // late ev(10) must NOT rewind lastTs to 10s: ev(130) is within the
      // 50s gap of the session high-water (100s) and must not split.
      input.addData(ev(10), ev(130))
      q.processAllAvailable()
      assert(spark.table("lateclock").count() == 0) // no session closed
    } finally q.stop()
  }

  test("stateful dedup runs on the RocksDB state store (large-state path)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    Streaming.useRocksDbState(spark)
    try {
      val input = MemoryStream[(java.sql.Timestamp, String)]
      val q = Streaming.dedupStream(input.toDF().toDF("ts", "text"))
        .writeStream.format("memory").queryName("rocksdedup")
        .outputMode("append").start()
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      try {
        input.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:00:01"), "b"))
        q.processAllAvailable()
        input.addData((t("2024-01-01 10:01:00"), "a")) // dup: dropped by RocksDB state
        q.processAllAvailable()
        assert(spark.table("rocksdedup").count() == 2)
        // prove the state really lives in RocksDB: the provider exports
        // rocksdb* custom metrics the HDFS-backed default does not
        val custom = q.lastProgress.stateOperators(0).customMetrics.keySet()
        assert(custom.stream().anyMatch(_.startsWith("rocksdb")),
          s"no rocksdb metrics in $custom — query fell back to the default provider")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-static enrichment joins the broadcast dimension per batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = Streaming.enrichWithDim(input.toDF().toDF("user_id", "v"), dim, "user_id")
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (3L, 30.0)) // user 3 has no dim row → null tier
      q.processAllAvailable()
      val got = spark.table("enriched").select($"user_id", $"tier")
        .as[(Long, Option[String])].collect().toMap
      assert(got == Map(1L -> Some("gold"), 3L -> None))
    } finally q.stop()
  }

  test("stream-stream join attributes clicks within the delay bound only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = Streaming.clickAttribution(
      imps.toDF().toDF("imp_id", "imp_ts", "campaign"),
      clicks.toDF().toDF("click_imp_id", "click_ts"),
      maxDelay = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      imps.addData((1L, t("2024-01-01 10:00:00"), "spring"),
        (2L, t("2024-01-01 10:00:00"), "spring"))
      clicks.addData((1L, t("2024-01-01 10:05:00")), // within 30 min: attributed
        (2L, t("2024-01-01 11:00:00")))              // 60 min late: outside bound
      q.processAllAvailable()
      val got = spark.table("attrib").select($"imp_id").as[Long].collect().toSeq
      assert(got == Seq(1L))
    } finally q.stop()
  }

  test("parquetSink batch replay is idempotent (dynamic partition overwrite)") {
    val out = java.nio.file.Files.createTempDirectory("sink").toString + "/out"
    val b0 = Seq((1L, 10.0), (2L, 20.0)).toDF("user_id", "v")
    val b1 = Seq((3L, 30.0)).toDF("user_id", "v")
    Streaming.writeBatch(b0, 0L, out)
    Streaming.writeBatch(b1, 1L, out)
    // failure recovery: Structured Streaming re-runs the last batch with the
    // SAME id — the write must replace batch 1's partition, not append to it
    Streaming.writeBatch(b1, 1L, out)
    val back = Streaming.readSink(spark, out)
    // partition inference yields INT for numeric dirs; readSink restores LONG
    assert(back.schema("batch_id").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows = back.select($"batch_id", $"user_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((0L, 1L), (0L, 2L), (1L, 3L)))
  }

  test("file-source drain is incremental across invocations (checkpointed file log)") {
    val base = java.nio.file.Files.createTempDirectory("drop")
    val dropDir = base.resolve("in")
    val outRoot = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    java.nio.file.Files.createDirectories(dropDir)
    def land(name: String, lines: String*): Unit =
      java.nio.file.Files.write(dropDir.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))

    land("a.json",
      ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
      ev(2, "2024-01-01 10:05:00", 2, "click", 2.0))
    Streaming.drainToSink(
      Streaming.readJsonDir(spark, dropDir.toString, schema), outRoot, ckpt)
    assert(Streaming.readSink(spark, outRoot).count() == 2)

    // a second invocation sees ONLY the newly landed file — a.json is in the
    // checkpoint's file log and must not be re-ingested (no id-1/2 dups)
    land("b.json", ev(3, "2024-01-01 11:00:00", 3, "view", 3.0))
    Streaming.drainToSink(
      Streaming.readJsonDir(spark, dropDir.toString, schema), outRoot, ckpt)
    val ids = Streaming.readSink(spark, outRoot)
      .select($"event_id").as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L))

    // a run with nothing new writes nothing
    Streaming.drainToSink(
      Streaming.readJsonDir(spark, dropDir.toString, schema), outRoot, ckpt)
    assert(Streaming.readSink(spark, outRoot).count() == 3)
  }

  test("tumbling window counts per event type") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val counts = Streaming.tumblingCounts(
      Streaming.parseJson(input.toDF(), schema), window_ = "1 hour", watermark = "5 minutes")
    val q = counts.writeStream.format("memory").queryName("tumble")
      .outputMode("append").start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:05:00", 1, "view", 0.0),
        ev(2, "2024-01-01 10:55:00", 2, "view", 0.0),
        ev(3, "2024-01-01 10:30:00", 3, "click", 0.0))
      q.processAllAvailable()
      input.addData(ev(9, "2024-01-01 12:00:00", 9, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("tumble")
        .filter($"window_start" === "2024-01-01 10:00:00")
        .select($"event_type", $"n_events").as[(String, Long)].collect().toSet
      assert(out == Set(("view", 2L), ("click", 1L)))
    } finally q.stop()
  }

  test("trendingCandidates keeps the dominant token across batches, state bounded") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streaming.TokenEvent]
    val k = 8
    val snaps = Streaming.trendingCandidates(input.toDS(), k = k, nShards = 4)
    val q = snaps.writeStream.format("memory").queryName("trend")
      .outputMode("update").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      // batch 1: 60x "hot" + 100 distinct fillers
      input.addData(
        Seq.fill(60)(Streaming.TokenEvent(t0, "hot")) ++
          (1 to 100).map(i => Streaming.TokenEvent(t0, s"filler$i")): _*)
      q.processAllAvailable()
      // batch 2: more fillers only — hot's counter must survive the noise
      input.addData((101 to 180).map(i => Streaming.TokenEvent(t0, s"filler$i")): _*)
      q.processAllAvailable()
      val rows = spark.table("trend")
        .select($"shard", $"tokens").as[(Int, Seq[String])].collect()
      assert(rows.forall(_._2.length <= k), "state exceeded MG capacity")
      // latest snapshot of hot's shard (last emission wins in update mode —
      // take the final occurrence per shard in emission order)
      val lastPerShard = rows.zipWithIndex
        .groupBy(_._1._1).map { case (s, rs) => s -> rs.maxBy(_._2)._1._2 }
      assert(lastPerShard.values.exists(_.contains("hot")),
        "dominant token lost from every shard sketch")
    } finally q.stop()
  }

  test("stream/batch parity: session_window through the sink equals the oracle-gated batch tier") {
    // THE equivalence claim of the streaming tier: the same fixture events
    // sessionized (30-min gap) through MemoryStream → session_window →
    // foreachBatch parquet sink → batch read-back must agree per session
    // with the DuckDB-hash-gated batch query (Sessions.sessionStats's
    // lag+running-sum form). Typed MemoryStream (no JSON hop) so
    // microsecond timestamps survive bit-exact. One semantic note: the
    // batch form keeps events at EXACTLY gap distance in one session
    // (`> gap` splits), session_window's half-open [t, t+gap) splits them —
    // the fixture's microsecond timestamps make an exact-30:00.000000 gap
    // a non-event.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = graft.io.Tables.events(spark, dir)
      .select($"ts".cast("timestamp").as("ts"), $"user_id", $"value")
      .as[(java.sql.Timestamp, Long, Double)].collect()

    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val stats = Streaming.sessionStats(
      input.toDF().toDF("ts", "user_id", "value"),
      gap = "30 minutes", watermark = "0 seconds")
    val outRoot = java.nio.file.Files.createTempDirectory("parity_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("parity_ckpt").toString
    val q = stats.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        Streaming.writeBatch(batch, batchId, outRoot)
      }
      .start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      // sentinel far past every fixture session: advances the watermark so
      // the last open sessions finalize and reach the sink
      input.addData(Seq((java.sql.Timestamp.valueOf("2099-01-01 00:00:00"), 999999L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = Streaming.readSink(spark, outRoot)
      .filter($"user_id" =!= 999999L)
      .select($"user_id", $"n_events", $"session_value",
        // span = end - start - gap (session_window end = last event + gap)
        (org.apache.spark.sql.functions.unix_micros($"session_end") -
          org.apache.spark.sql.functions.unix_micros($"session_start") -
          30L * 60 * 1000000).as("span_us"))
      .as[(Long, Long, Double, Long)].collect()

    val batch = graft.analytics.Sessions.sessionStats(spark, dir)
      .select($"user_id", $"n_events", $"session_value", $"span_us")
      .as[(Long, Long, Double, Long)].collect()

    // per-session multiset equality (session ids are tier-local labels)
    def key(t: (Long, Long, Double, Long)) = t
    assert(streamed.length == batch.length,
      s"${streamed.length} streamed sessions vs ${batch.length} batch")
    assert(streamed.groupBy(key).view.mapValues(_.length).toMap ==
      batch.groupBy(key).view.mapValues(_.length).toMap)
  }
}
