package graft.analytics

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Pins [[Layout.retentionVacuum]]'s reader-isolation contract by planting
  * every reader-visible filesystem state of a partition swap and asserting
  * what a plain `spark.read.parquet(root)` observes in each:
  *
  *  - S0 (pre-swap): the partition's OLD rows;
  *  - S1 (tombstone window — live renamed aside, cleaned dir not yet
  *    landed): a WELL-FORMED table that is merely missing the in-flight
  *    partition — same schema, same inferred `day` type, no error. This
  *    window is the documented limitation: per-partition, not snapshot,
  *    consistency;
  *  - S2 (landed, tombstone not yet dropped): the partition's NEW rows,
  *    the hidden tombstone invisible to the reader.
  *
  * The dot-prefixed tombstone name is load-bearing for S1/S2 — a visible
  * `day=X.__vacbak` dir would enter partition discovery as a non-numeric
  * `day` value and flip the inferred column type to string mid-swap; the
  * S1/S2 schema assertions would catch that regression.
  */
class VacuumReaderSpec extends SparkSpec {
  import spark.implicits._

  private def walked(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.toArray.toSeq.map(_.asInstanceOf[Path]) finally s.close()
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      walked(p).sortBy(_.toString)(Ordering[String].reverse)
        .foreach(f => Files.delete(f))

  test("every reader-visible swap state is a well-formed table") {
    // day 19742 (2024-01-20) holds a clean row and an erased row (user 6 =
    // fixture cohort); day 19741 is all clean. The vacuum will swap ONLY
    // day 19742.
    val rows = Seq(
      (1L, "2024-01-20 10:00:00", 0L),
      (2L, "2024-01-20 11:00:00", 6L),
      (3L, "2024-01-19 10:00:00", 0L))
      .toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val dirty = Layout.retentionPlanOver(rows).collect()
      .collectFirst { case r if r.getString(3) == "rewrite" => r.getLong(0) }
      .get

    val root = Files.createTempDirectory("vac_reader").resolve("t")
    try {
      Layout.writeDayPartitioned(rows, root.toString)

      def readIds(): Seq[Long] =
        spark.read.parquet(root.toString)
          .select($"event_id").as[Long].collect().sorted.toSeq
      def dayType(): String =
        spark.read.parquet(root.toString).schema("day").dataType.typeName

      // S0: pre-swap — old rows, numeric day type
      assert(readIds() == Seq(1L, 2L, 3L))
      val day0Type = dayType()

      // Build the cleaned dir a real vacuum would stage, via a donor table
      val donor = Files.createTempDirectory("vac_reader_donor").resolve("t")
      val staged = Files.createTempDirectory("vac_reader_stage")
        .resolve(s"day=$dirty")
      try {
        Layout.writeDayPartitioned(rows, donor.toString)
        Layout.retentionVacuum(spark, donor.toString)
        Files.move(donor.resolve(s"day=$dirty"), staged)
      } finally deleteRec(donor.getParent)

      try {
        // S1: tombstone window — live missing, hidden tombstone present
        Files.move(root.resolve(s"day=$dirty"),
          root.resolve(s".vacbak.day=$dirty"))
        assert(readIds() == Seq(3L),
          "S1 reader must see the table minus the in-flight partition")
        assert(dayType() == day0Type,
          "S1 must not perturb partition discovery or the day type")

        // S2: cleaned dir landed, tombstone not yet dropped — new rows
        Files.move(staged, root.resolve(s"day=$dirty"))
        assert(readIds() == Seq(1L, 3L),
          "S2 reader must see the cleaned partition (erased row gone)")
        assert(dayType() == day0Type)

        // The next vacuum call converges: tombstone dropped, rows intact
        val stats = Layout.retentionVacuum(spark, root.toString)
        assert(stats.rewrittenDays.isEmpty)
        assert(!Files.exists(root.resolve(s".vacbak.day=$dirty")))
        assert(readIds() == Seq(1L, 3L))
      } finally deleteRec(staged.getParent)
    } finally deleteRec(root.getParent)
  }
}
