package graft.analytics

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Round-trip proof that [[Layout.compactExecute]] EXECUTES the plan
  * `x_compact_plan` declares — not just that bin ids come out right, but
  * that the rewrite it drives is the one a table-maintenance job needs:
  *
  *  1. exactly ONE data file per (day, bin) output directory (the entire
  *     point of compaction: the repartition on the plan's keys lands each
  *     bin in a single task, so the partitioned write can't fragment it);
  *  2. strictly FEWER output files than source (day, hour) micro-files —
  *     the rewrite actually compacted;
  *  3. the read-back row multiset is IDENTICAL to the source events
  *     (compaction moves bytes, never rows);
  *  4. per-bin read-back counts equal the plan's own `bin_rows` — the
  *     executed layout IS the declared plan, file for file.
  */
class CompactRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))

  test("compactExecute writes one file per planned bin and preserves every row") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("compact_rt").toString
    try {
      Layout.compactExecute(spark, dir, out)

      val plan = Layout.compactPlan(spark, dir)
        .select($"day", $"bin", $"bin_rows").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(plan.nonEmpty)

      // 1. one parquet data file per (day, bin) partition directory
      val binDirs = Files.walk(Path.of(out)).filter(Files.isDirectory(_))
        .filter(_.getFileName.toString.startsWith("bin=")).toArray
        .map(_.asInstanceOf[Path])
      assert(binDirs.length == plan.size,
        s"${binDirs.length} bin dirs vs ${plan.size} planned bins")
      binDirs.foreach { d =>
        val dataFiles = Files.list(d)
          .filter(f => f.getFileName.toString.endsWith(".parquet")).count()
        assert(dataFiles == 1L, s"$d holds $dataFiles data files, want 1")
      }

      // 2. compaction compacted: fewer files than (day, hour) micro-files
      val sourceFiles = graft.io.Tables.events(spark, dir)
        .selectExpr(
          "datediff(to_date(ts), date '1970-01-01') AS day", "hour(ts) AS hr")
        .distinct().count()
      assert(binDirs.length < sourceFiles,
        s"${binDirs.length} output files !< $sourceFiles source micro-files")

      // 3. row multiset preserved (event_id is unique per fixture row, so
      // set equality over ids + equal counts pins the multiset)
      val back = spark.read.parquet(out)
      assert(back.count() ==
        graft.io.Tables.events(spark, dir).count())
      val srcIds = graft.io.Tables.events(spark, dir)
        .select($"event_id").as[Long].collect().sorted.toSeq
      val outIds = back.select($"event_id").as[Long].collect().sorted.toSeq
      assert(outIds == srcIds)

      // 4. executed per-bin counts equal the plan's bin_rows (partition
      // columns read back as INT — cast up to compare against the plan)
      val executed = back
        .groupBy($"day".cast("long").as("day"), $"bin".cast("long").as("bin"))
        .count().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(executed == plan)
    } finally deleteRec(Path.of(out))
  }

  test("NULL-ts rows survive the executed rewrite and land in their planned bin") {
    // Dirty input: row 3 has a NULL timestamp. The plan's groupBy keeps
    // the NULL (day, hr) group as a bin; the executing join must route the
    // row there (null-safe keys), not silently drop it — an equi-join on
    // (day, hr) loses it and the compacted table diverges from the plan.
    val dirty = Seq(
      (1L, Option("2024-01-01 00:10:00"), "a"),
      (2L, Option("2024-01-01 05:00:00"), "bb"),
      (3L, Option.empty[String], "ccc"),
      (4L, Option("2024-01-02 23:59:59"), "d"))
      .toDF("event_id", "ts_s", "props")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"), $"props")
    val out = Files.createTempDirectory("compact_null").toString
    try {
      Layout.compactExecuteOver(dirty, out)
      val back = spark.read.parquet(out)
      // every row survived, including the NULL-ts one
      assert(back.count() == 4L)
      assert(back.select($"event_id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
      // the NULL-ts row reads back under the Hive default partition (NULL day)
      assert(back.filter($"day".isNull).select($"event_id")
        .as[Long].collect().toSeq == Seq(3L))
      // executed per-bin counts equal the plan's, NULL group included
      val plan = Layout.compactPlanOver(dirty)
        .select($"day", $"bin", $"bin_rows").collect()
        .map(r => (Option(r.get(0)).map(_.toString.toLong),
          r.getLong(1)) -> r.getLong(2)).toMap
      val executed = back
        .groupBy($"day".cast("long").as("day"), $"bin".cast("long").as("bin"))
        .count().collect()
        .map(r => (Option(r.get(0)).map(_.toString.toLong),
          r.getLong(1)) -> r.getLong(2)).toMap
      assert(executed == plan)
    } finally deleteRec(Path.of(out))
  }
}
