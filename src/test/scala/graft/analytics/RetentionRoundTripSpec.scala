package graft.analytics

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-trip proof that [[Layout.retentionVacuum]] EXECUTES the plan
  * `x_retention_plan` declares, with the cost profile the plan promises:
  *
  *  1. every `drop` partition is gone and every retained day survives;
  *  2. `keep` partitions keep their EXACT original data files (path +
  *     length + mtime) — the vacuum never touched their bytes;
  *  3. the read-back holds zero erasure-cohort rows, and per-day counts
  *     equal the plan's `n_rows - reclaim_rows` — the executed vacuum IS
  *     the declared plan, partition for partition;
  *  4. a second run is a no-op: nothing rewritten, file inventory
  *     identical (idempotence — safe to schedule blindly);
  *  5. NULL-ts rows are retained (rewritten if erased, never dropped).
  */
class RetentionRoundTripSpec extends SparkSpec {
  import spark.implicits._

  /** Files.walk with the close its javadoc requires. */
  private def walked(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.toArray.toSeq.map(_.asInstanceOf[Path]) finally s.close()
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      walked(p).sortBy(_.toString)(Ordering[String].reverse)
        .foreach(f => Files.delete(f))

  /** (path, length, mtime) of every data file, keyed by partition dir. */
  private def inventory(root: Path): Map[String, Set[(String, Long, Long)]] =
    walked(root).filter(_.getFileName.toString.endsWith(".parquet"))
      .groupBy(_.getParent.getFileName.toString)
      .map { case (k, v) =>
        k -> v.map(f => (f.toString, Files.size(f),
          Files.getLastModifiedTime(f).toMillis)).toSet
      }

  test("retentionVacuum executes the declared plan in place") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.io.Tables.events(spark, dir)
    val out = Files.createTempDirectory("retention_rt").resolve("t")
    try {
      Layout.writeDayPartitioned(events, out.toString)

      val plan = Layout.retentionPlanOver(events).collect().map { r =>
        val day = if (r.isNullAt(0)) None else Some(r.getLong(0))
        day -> (r.getLong(1), r.getString(3), r.getLong(4))
      }.toMap
      val actions = plan.values.map(_._2).toSet
      assert(actions == Set("drop", "rewrite", "keep"),
        s"fixture should exercise all three actions, got $actions")

      val before = inventory(out)
      val stats = Layout.retentionVacuum(spark, out.toString)

      // 1. drop partitions gone, retained days present (unless rewritten
      //    down to zero rows, which the fixture's mix never does)
      val after = inventory(out)
      plan.foreach { case (day, (_, action, _)) =>
        val dirName =
          day.map(d => s"day=$d").getOrElse("day=__HIVE_DEFAULT_PARTITION__")
        if (action == "drop")
          assert(!after.contains(dirName), s"$dirName should be dropped")
        else assert(after.contains(dirName), s"$dirName should survive")
      }
      assert(stats.droppedDays.toSet ==
        plan.collect { case (Some(d), (_, "drop", _)) => d }.toSet)
      assert(stats.rewrittenDays.toSet ==
        plan.collect { case (d, (_, "rewrite", _)) => d }.toSet)

      // 2. keep partitions byte-untouched
      plan.collect { case (Some(d), (_, "keep", _)) => s"day=$d" }
        .foreach { k =>
          assert(after(k) == before(k), s"$k files changed but action=keep")
        }

      // 3. executed vacuum == declared plan, partition for partition
      val survived = spark.read.parquet(out.toString)
      assert(survived.filter(Layout.erased($"user_id"))
        .count() == 0L, "erasure-cohort rows survived the vacuum")
      val counts = survived.groupBy($"day".cast("long").as("day"))
        .count().collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
          r.getLong(1)).toMap
      plan.foreach { case (day, (nRows, action, reclaim)) =>
        val want = if (action == "drop") 0L else nRows - reclaim
        assert(counts.getOrElse(day, 0L) == want,
          s"day=$day survived=${counts.getOrElse(day, 0L)} want=$want")
      }

      // 4. idempotent: second run rewrites nothing, moves nothing
      val again = Layout.retentionVacuum(spark, out.toString)
      assert(again.rewrittenDays.isEmpty && again.droppedDays.isEmpty)
      assert(inventory(out) == after, "second vacuum changed files")
    } finally deleteRec(out.getParent)
  }

  test("NULL-ts rows are retained, and rewritten only if erased") {
    // user 6 is the fixture erasure cohort (md5 prefix '1'); user 0 is not.
    val rows = Seq(
      (1L, "2024-01-20 10:00:00", 0L), // keep day, clean user
      (2L, null.asInstanceOf[String], 0L), // NULL ts, clean user
      (3L, null.asInstanceOf[String], 6L), // NULL ts, erased user
      (4L, "2024-01-01 00:00:00", 0L)) // expired day
      .toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val plan = Layout.retentionPlanOver(rows).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        r.getString(3)).toMap
    assert(plan(None) == "rewrite", "NULL day with erased rows must rewrite")

    val out = Files.createTempDirectory("retention_null").resolve("t")
    try {
      Layout.writeDayPartitioned(rows, out.toString)
      val stats = Layout.retentionVacuum(spark, out.toString)
      assert(stats.rewrittenDays == Seq(None))
      val back = spark.read.parquet(out.toString)
        .select($"event_id").as[Long].collect().sorted
      assert(back.toSeq == Seq(1L, 2L),
        "vacuum must drop expired day 4 and erased NULL-ts row 3, keep 1 and 2")
    } finally deleteRec(out.getParent)
  }

  test("a table with ONLY the NULL-day partition still gets its erasure scan") {
    // No numeric day exists, so nothing can expire — but the plan marks the
    // NULL partition `rewrite` (erase_rows > 0) and the vacuum must agree:
    // age-unprovable rows are retained, never exempted from erasure.
    val rows = Seq((1L, 0L), (2L, 6L), (3L, 0L)) // user 6 = cohort
      .toDF("event_id", "user_id")
      .withColumn("ts", lit(null).cast("timestamp"))
    val plan = Layout.retentionPlanOver(rows).collect()
    assert(plan.length == 1 && plan(0).isNullAt(0) &&
      plan(0).getString(3) == "rewrite")
    val out = Files.createTempDirectory("retention_nullonly").resolve("t")
    try {
      Layout.writeDayPartitioned(rows, out.toString)
      val stats = Layout.retentionVacuum(spark, out.toString)
      assert(stats.droppedDays.isEmpty && stats.rewrittenDays == Seq(None))
      val back = spark.read.parquet(out.toString)
        .select($"event_id").as[Long].collect().sorted
      assert(back.toSeq == Seq(1L, 3L), "erased row 2 must go, 1 and 3 stay")
    } finally deleteRec(out.getParent)
  }

  test("a vacuum killed mid-swap is repaired by the next run, losing no clean rows") {
    // The swap is rename(live→bak); rename(staged→live); delete(bak). Both
    // crash windows leave a `.vacbak.day=X` tombstone on disk:
    //  A) after rename-aside, before rename-in → live MISSING, bak = original
    //  B) after rename-in, before tombstone delete → live = cleaned, bak left
    // The next vacuum must converge both to the cleaned table with every
    // clean row intact — the row-loss mode this design exists to prevent.
    val rows = Seq(
      (1L, "2024-01-20 10:00:00", 0L), // clean row in the dirty partition
      (2L, "2024-01-20 11:00:00", 6L), // erased row (user 6 = cohort)
      (3L, "2024-01-19 10:00:00", 0L)) // clean partition
      .toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val dirtyDay = Layout.retentionPlanOver(rows).collect()
      .collectFirst { case r if r.getString(3) == "rewrite" => r.getLong(0) }
      .get

    def freshTable(): Path = {
      val out = Files.createTempDirectory("retention_crash").resolve("t")
      Layout.writeDayPartitioned(rows, out.toString)
      out
    }
    def surviving(out: Path): Seq[Long] =
      spark.read.parquet(out.toString)
        .select($"event_id").as[Long].collect().sorted.toSeq

    // window A: the original was moved aside and the crash hit before the
    // cleaned dir landed — the partition's rows live ONLY in the tombstone
    val a = freshTable()
    try {
      Files.move(a.resolve(s"day=$dirtyDay"),
        a.resolve(s".vacbak.day=$dirtyDay"))
      val stats = Layout.retentionVacuum(spark, a.toString)
      assert(stats.rewrittenDays == Seq(Some(dirtyDay)),
        "recovery must restore the tombstone and THEN re-clean it")
      assert(surviving(a) == Seq(1L, 3L), "clean row 1 must survive window A")
      assert(!Files.exists(a.resolve(s".vacbak.day=$dirtyDay")))
    } finally deleteRec(a.getParent)

    // window B: the cleaned dir landed but the tombstone was never dropped
    val b = freshTable()
    try {
      val live = b.resolve(s"day=$dirtyDay")
      Files.move(live, b.resolve(s".vacbak.day=$dirtyDay"))
      // land a "cleaned" dir the way the crashed run would have: vacuum a
      // copy of the same table and steal its rewritten partition dir
      val donor = freshTable()
      try {
        Layout.retentionVacuum(spark, donor.toString)
        Files.move(donor.resolve(s"day=$dirtyDay"), live)
      } finally deleteRec(donor.getParent)
      val stats = Layout.retentionVacuum(spark, b.toString)
      assert(stats.rewrittenDays.isEmpty,
        "window B's live dir is already clean — nothing to rewrite")
      assert(surviving(b) == Seq(1L, 3L), "clean row 1 must survive window B")
      assert(!Files.exists(b.resolve(s".vacbak.day=$dirtyDay")))
    } finally deleteRec(b.getParent)

    // LEGACY window A: a vacuum built before the dot-prefix rename crashed
    // mid-swap, leaving the OLD suffix form `day=X.__vacbak`. An upgraded
    // vacuum must recognize it: un-recovered, it escapes the prefix-keyed
    // repair AND matches the `day=` inventory filter, whose non-numeric
    // remainder would abort every subsequent run while the partition's
    // clean rows stay invisible (round-10 code-review finding).
    val c = freshTable()
    try {
      Files.move(c.resolve(s"day=$dirtyDay"),
        c.resolve(s"day=$dirtyDay.__vacbak"))
      val stats = Layout.retentionVacuum(spark, c.toString)
      assert(stats.rewrittenDays == Seq(Some(dirtyDay)),
        "legacy tombstone must be restored and re-cleaned")
      assert(surviving(c) == Seq(1L, 3L),
        "clean row 1 must survive the legacy crash window")
      assert(!Files.exists(c.resolve(s"day=$dirtyDay.__vacbak")))
    } finally deleteRec(c.getParent)
  }
}
