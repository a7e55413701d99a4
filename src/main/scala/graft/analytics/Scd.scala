package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Slowly-changing-dimension (type 2) construction from a change stream —
  * collapse each user's event-type sequence into validity intervals
  * [valid_from, valid_to) with an is_current flag, the warehouse
  * dimension-history build [[Upsert]] (type 1, latest-wins) doesn't cover
  * (§2.3 warehouse contract; the reference's orders feed is exactly the
  * change-capture input such a build consumes).
  *
  * Run detection is the gaps-and-islands pattern: lag() flags changes,
  * a running sum numbers runs, one aggregate per (user, run) keeps
  * first/last/extent, and lead() closes each interval with the next run's
  * start — half-open intervals, so consecutive rows tile the timeline
  * exactly. All timestamps integer µs; ties broken by event_id.
  *
  * At 100 TB: every window partitions by user_id (one exchange, the
  * sessionization partitioning, AQE skew split applies) — run numbering,
  * the run rollup, and interval closing all reuse it; nothing global,
  * output is runs (≪ events).
  */
object Scd {

  /** x_scd2_build — per-user type-2 history rows. */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"tus".asc, $"event_id".asc)
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byRun = Window.partitionBy($"user_id").orderBy($"run".asc)
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("tus"))
      .withColumn("chg",
        when(lag($"event_type", 1).over(byUser).isNull ||
          lag($"event_type", 1).over(byUser) =!= $"event_type", 1L).otherwise(0L))
      .withColumn("run", sum($"chg").over(running))
      .groupBy($"user_id", $"run")
      .agg(first($"event_type").as("event_type"),
        min($"tus").as("valid_from_us"), count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead($"valid_from_us", 1).over(byRun))
      .withColumn("is_current", $"valid_to_us".isNull)
      .select($"user_id", $"run", $"event_type", $"valid_from_us",
        $"valid_to_us", $"n_events", $"is_current")
      .orderBy($"user_id", $"run")
  }

  val scd2BuildSql: String =
    """WITH e AS (
      | SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
      | FROM events),
      |chg AS (
      | SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |                  OR lag(event_type) OVER w <> event_type
      |           THEN 1 ELSE 0 END AS chg
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      |runs AS (
      | SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
      | FROM chg),
      |grp AS (
      | SELECT user_id, run, any_value(event_type) AS event_type,
      |  min(tus) AS valid_from_us, count(*) AS n_events
      | FROM runs GROUP BY 1, 2)
      |SELECT user_id, run, event_type, valid_from_us,
      | lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run)
      |   AS valid_to_us,
      | n_events,
      | lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run) IS NULL
      |   AS is_current
      |FROM grp
      |ORDER BY user_id, run""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_scd2_build" -> (scd2Build _))

  val oracles: Map[String, String] = Map(
    "x_scd2_build" -> scd2BuildSql)
}
