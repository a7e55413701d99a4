package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private case class Row7(user: Long, run: Long, tpe: String, from: Long,
    to: Option[Long], n: Long, current: Boolean)

  private def history(): Array[(Long, Long, String, Long, Option[Long], Long, Boolean)] =
    Scd.scd2Build(spark, dir)
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)].collect()

  test("x_scd2_build tiles each user's timeline with half-open intervals") {
    val rows = history().groupBy(_._1)
    rows.foreach { case (_, hs) =>
      val sorted = hs.sortBy(_._2)
      // runs are numbered 1..n and consecutive intervals chain exactly
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4)) // valid_to == next valid_from
          assert(a._3 != b._3)        // a run BOUNDARY means the type changed
        case _ =>
      }
      assert(sorted.init.forall(!_._7) && sorted.last._7) // exactly one current
      assert(sorted.last._5.isEmpty)
    }
  }

  test("x_scd2_build conserves events and matches a driver-side rebuild") {
    val rows = history()
    val events = Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as tus")
      .as[(Long, Long, String, Long)].collect()
    assert(rows.map(_._6).sum == events.length.toLong)
    // rebuild run structure per user
    val expected = events.groupBy(_._2).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._4, e._1))
      val runs = sorted.foldLeft(List.empty[List[(Long, Long, String, Long)]]) {
        case (acc, e) if acc.nonEmpty && acc.head.head._3 == e._3 =>
          (e :: acc.head) :: acc.tail
        case (acc, e) => List(e) :: acc
      }.reverse.map(_.reverse)
      runs.zipWithIndex.map { case (r, i) =>
        (uid, (i + 1).toLong, r.head._3, r.map(_._4).min, r.length.toLong)
      }
    }.toSet
    assert(rows.map(r => (r._1, r._2, r._3, r._4, r._6)).toSet == expected)
  }

  test("x_pit_join resolves each purchase to the state 1µs before it") {
    val out = Scd.pitJoin(spark, dir)
      .as[(String, Long, Long)].collect().toList
    // total credit: every purchase lands in exactly one prior-state bucket
    val nPurch = Tables.events(spark, dir)
      .filter($"event_type" === "purchase").count()
    assert(out.map(_._2).sum == nPurch)
    assert(out.map(_._1).distinct.size == out.size) // one row per state
    // driver-side PIT replay against the same history
    val hist = history()
    val purchases = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) - 1 as t")
      .as[(Long, Long)].collect()
    val expected = purchases.map { case (uid, t) =>
      hist.filter(h => h._1 == uid && h._4 <= t && h._5.forall(t < _))
        .map(_._3).headOption.getOrElse("(none)")
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.map(r => r._1 -> r._2).toMap == expected)
    // a purchase opening its own run must NOT resolve to itself: every
    // (none) row is a user's literal first event
    val firstEvents = hist.filter(_._2 == 1L).map(h => (h._1, h._4)).toSet
    val nones = purchases.filter { case (uid, t) =>
      !hist.exists(h => h._1 == uid && h._4 <= t && h._5.forall(t < _))
    }
    nones.foreach { case (uid, t) => assert(firstEvents.contains((uid, t + 1))) }
  }

  // ---- capped (bounded-partition) history: parity with the atomic plan ----

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  /** Rows differing between the atomic and capped plans (null-safe compare
    * over the full 7-column contract), keyed by (user_id, run).
    */
  private def parity(df: DataFrame, slices: Int): Long = {
    val a = Scd.historyOver(df)
    val c = Scd.historyCappedOver(df, slices)
    val cols = Seq("event_type", "valid_from_us", "valid_to_us", "n_events",
      "is_current")
    val joined = a.join(c.withColumnsRenamed(cols.map(x => x -> s"c_$x").toMap),
      Seq("user_id", "run"), "full")
    joined.filter(!cols.map(x => col(x) <=> col(s"c_$x")).reduce(_ && _))
      .count()
  }

  test("capped SCD2 history is bit-identical to the atomic window plan") {
    // one hot user whose type alternates in runs of 3, plus a cold user —
    // at 8 slices the range partitioner MUST cut the hot timeline inside
    // runs somewhere, exercising both stitch outcomes (fold a continued
    // run, keep a genuine change).
    val types = Seq("view", "click")
    val hot = (0 until 48).map { i =>
      (i.toLong, 1L, ts(i * 7), types((i / 3) % 2), 0.0)
    }
    val cold = Seq((100L, 2L, ts(0), "view", 0.0), (101L, 2L, ts(10), "view", 0.0))
    val df = (hot ++ cold).toDF("event_id", "user_id", "ts", "event_type", "value")
    (2 to 8).foreach(s => assert(parity(df, s) == 0, s"slices=$s"))
  }

  test("capped SCD2 replicates NULL type and NULL timestamp semantics exactly") {
    // The row rule's three-valued compare: a NULL previous type OPENS a run
    // (each null-after-null is its own singleton run); a NULL current type
    // with a non-null previous CONTINUES it. Null timestamps sort first.
    // Plant both at chunk-boundary-prone positions and demand parity at
    // every slicing.
    val df = Seq(
      (1L, 1L, null.asInstanceOf[Timestamp], null.asInstanceOf[String], 0.0),
      (2L, 1L, null.asInstanceOf[Timestamp], null.asInstanceOf[String], 0.0),
      (3L, 1L, ts(0), "view", 0.0),
      (4L, 1L, ts(10), null.asInstanceOf[String], 0.0),
      (5L, 1L, ts(20), "view", 0.0),
      (6L, 1L, ts(30), "click", 0.0),
      (7L, 2L, null.asInstanceOf[Timestamp], "view", 0.0),
      (8L, 2L, ts(5), "view", 0.0),
      (9L, 3L, ts(5), "view", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    (2 to 6).foreach(s => assert(parity(df, s) == 0, s"slices=$s"))
  }

  test("capped SCD2 bounds the event-level window partition for a single-user burst") {
    val burst = (0 until 1000).map(i =>
      (i.toLong, 7L, ts(i), if (i / 100 % 2 == 0) "view" else "click", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(parity(burst, slices = 8) == 0)
    // re-derive the slice assignment exactly as the operator does: no
    // (slice, user) chunk may hold the whole burst
    val sliced = burst
      .withColumn("tus", unix_micros($"ts".cast("timestamp")))
      .repartitionByRange(8, $"user_id", $"tus".asc_nulls_first, $"event_id")
      .withColumn("pid", spark_partition_id())
    val maxChunk = sliced.groupBy($"pid", $"user_id").count()
      .agg(max($"count")).as[Long].head()
    assert(maxChunk < 1000, s"burst not split: maxChunk=$maxChunk")
  }

  test("capped SCD2: the corpus-sized chunk window runs ONCE, behind the checkpoint") {
    // `local` feeds both the boundary summary and the run rollup; the
    // chunk-level sort+window must live behind the LogicalRDD scan so the
    // AQE-final plan holds only summary-/run-sized windows.
    val df = Scd.historyCappedOver(
      (0 until 200).map(i =>
        (i.toLong, (i % 3).toLong, ts(i), if (i % 7 == 0) "view" else "click", 0.0))
        .toDF("event_id", "user_id", "ts", "event_type", "value"), 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty && windows.forall(
      w => !w.contains("__pid") || w.contains("windowspecdefinition(user_id")),
      s"the chunk window leaked past the checkpoint:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"no checkpoint scan in the final plan:\n$plan")
  }

  test("x_scd2_capped matches x_scd2_build on the fixture end-to-end") {
    val a = Scd.scd2Build(spark, dir).collect().toSeq
    val c = Scd.scd2BuildCapped(spark, dir).collect().toSeq
    assert(a == c)
  }
}
