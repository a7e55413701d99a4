package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class JourneySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("islands partition each user's active days into maximal consecutive runs") {
    val out = Journey.islands(spark, dir)
      .select($"user_id", $"start_day", $"streak_days")
      .as[(Long, Long, Long)].collect().toList
    val activeDays = Tables.events(spark, dir)
      .select($"user_id",
        datediff(to_date($"ts".cast("timestamp")), lit("1970-01-01"))
          .cast("long").as("day"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // streaks reconstruct each user's exact active-day set, and are maximal:
    // the day before a streak's start and after its end are inactive
    out.groupBy(_._1).foreach { case (u, streaks) =>
      val covered = streaks.flatMap { case (_, s, len) => s until (s + len) }
      assert(covered.toSet == activeDays(u), s"user $u day cover")
      assert(covered.length == covered.distinct.length, s"user $u overlap")
      streaks.foreach { case (_, s, len) =>
        assert(!activeDays(u).contains(s - 1), s"user $u streak at $s not maximal left")
        assert(!activeDays(u).contains(s + len), s"user $u streak at $s not maximal right")
      }
    }
  }

  test("transition rows normalize to 1 per prev_type and count every adjacency") {
    val rows = Journey.transitions(spark, dir)
      .select($"prev_type", $"n", $"p").as[(String, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (prev, g) =>
      val tot = g.map(_._3).sum
      assert(math.abs(tot - 1.0) < 1e-9, s"$prev rows sum to $tot")
    }
    // total transitions = total events - distinct users (one lag-null each)
    val nEvents = Tables.events(spark, dir).count()
    val nUsers = Tables.events(spark, dir).select($"user_id").distinct().count()
    assert(rows.map(_._2).sum == nEvents - nUsers)
  }

  test("q_tpch_q5 revenue matches the unoptimized SQL-view formulation") {
    Tables.registerViews(spark, dir)
    val expected = spark.sql(
      s"""SELECT n_name, sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_ucents
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = '${Tpch.Q5Region}'
         |  AND year(CAST(o_orderdate AS DATE)) = ${Tpch.Q5Year}
         |GROUP BY n_name ORDER BY revenue_ucents DESC, n_name""".stripMargin)
      .as[(String, Long)].collect().toList
    val got = Tpch.tpchQ5(spark, dir)
      .as[(String, Long)].collect().toList
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_tpch_q7 flows are symmetric-pair-filtered and year-complete") {
    val rows = Tpch.tpchQ7(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val pair = Set(Tpch.Q7NationA, Tpch.Q7NationB)
    rows.foreach { case (sn, cn, yr, rev) =>
      assert(pair.contains(sn) && pair.contains(cn) && sn != cn)
      assert(yr >= 1995 && yr <= 2001)
      assert(rev > 0)
    }
  }

  test("x_source_tail cumulative share is monotone and ends at exactly 1") {
    val rows = graft.llm.Drift.sourceTail(spark, dir)
      .as[(Long, String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    val tok = rows.map(_._3)
    assert(tok.toSeq == tok.toSeq.sortBy(-_), "volume descending")
    assert(rows.map(_._4).last == tok.sum, "cum ends at total")
    assert(math.abs(rows.last._5 - 1.0) < 1e-12)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 == a._4 + b._3, "cumulative sum consistent")
    }
  }

  test("kmv merge union estimate dominates each side and brackets the exact") {
    import graft.analytics.Sketch
    val r = Sketch.kmvMerge(spark, dir).collect().head
    val (ea, eb, eu) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"))
    val (xa, xb, xu) = (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"),
      r.getAs[Long]("exact_union"))
    assert(eu >= math.max(ea, eb) - 1e-9, "union >= each side")
    assert(xu <= xa + xb)
    // At this fixture every slice has fewer than K=256 distinct users, so
    // the sketches are non-full and the estimator returns the EXACT count
    // (round-4 advice: a non-full KMV contains every hash) — the former
    // 30% band existed only because the old formula extrapolated here.
    assert(eu == xu.toDouble, s"non-full union sketch must be exact: $eu vs $xu")
    assert(ea == xa.toDouble && eb == xb.toDouble,
      s"non-full side sketches must be exact: $ea/$xa, $eb/$xb")
    val ei = r.getAs[Double]("est_inter")
    assert(ei == ea + eb - eu)
  }
}
