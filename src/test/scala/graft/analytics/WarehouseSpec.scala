package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the warehouse-maintenance queries over the real
  * sf0.001 fixture (the oracle gate checks cross-engine hashes; these pin
  * the MEANING — interval algebra, partial-aggregate equivalence, exact
  * z-score membership — independently of DuckDB).
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_scd2 intervals chain: valid_to = next valid_from, one open row per user") {
    val rows = Warehouse.scd2(spark, dir)
      .select($"user_id", $"valid_from_us", $"valid_to_us", $"event_type", $"is_current")
      .as[(Long, Long, Option[Long], String, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      // exactly the last interval is open / current
      assert(sorted.init.forall(r => r._3.isDefined && !r._5), s"user $u: non-last open row")
      assert(sorted.last._3.isEmpty && sorted.last._5, s"user $u: last row not current")
      // intervals chain with no gap and no overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"user $u: interval break at ${b._2}")
          assert(a._4 != b._4, s"user $u: consecutive rows with same type not collapsed")
        case _ => ()
      }
    }
  }

  test("q_incr_agg merged partials equal a from-scratch daily aggregate") {
    val merged = Warehouse.incrAgg(spark, dir)
      .select($"day".cast("string"), $"n_orders", $"revenue")
      .as[(String, Long, Double)].collect().toSeq
    val direct = graft.io.Tables.orders(spark, dir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"), (sum(graft.util.Det.cents($"o_totalprice")).cast("double") / 100.0).as("rev"))
      .select($"day".cast("string"), $"n", $"rev")
      .as[(String, Long, Double)].collect().toSeq
    assert(merged.sorted == direct.sorted)
  }

  test("q_outliers keeps exactly the |z| > 1.5 rows (double-arithmetic cross-check)") {
    val cust = graft.io.Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)].collect()
    val bySeg = cust.groupBy(_._2).map { case (seg, rows) =>
      val xs = rows.map(_._3)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / n)
      seg -> ((mu, sd))
    }
    val expected = cust.filter { case (_, seg, bal) =>
      val (mu, sd) = bySeg(seg)
      math.abs(bal - mu) > 1.5 * sd
    }.map(_._1).toSet
    val got = Warehouse.outliers(spark, dir).select($"c_custkey").as[Long].collect().toSet
    // The engine decides in exact integer cents; the double cross-check may
    // disagree only for rows sitting within float-epsilon of the boundary.
    val sym = (expected diff got) union (got diff expected)
    assert(sym.isEmpty, s"boundary mismatch for custkeys: $sym")
    assert(got.nonEmpty, "outlier screen kept nothing — threshold is unfalsifiable on this data")
  }

  test("q_sample_stratified yields exactly k rows per stratum, stable across runs") {
    val a = Warehouse.sampleStratified(spark, dir)
      .select($"o_orderpriority", $"o_orderkey").as[(String, Long)].collect().toSeq
    val perStratum = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perStratum.values.forall(_ == 20), s"per-stratum sizes: $perStratum")
    val b = Warehouse.sampleStratified(spark, dir)
      .select($"o_orderpriority", $"o_orderkey").as[(String, Long)].collect().toSeq
    assert(a == b, "hash-order sample not reproducible across runs")
  }

  test("q_concurrency matches a brute-force sweep per day") {
    val got = Warehouse.concurrency(spark, dir)
      .select($"day".cast("string"), $"max_concurrent", $"n_intervals")
      .as[(String, Long, Long)].collect().map { case (d, m, n) => d -> ((m, n)) }.toMap
    val ev = graft.io.Tables.events(spark, dir)
      .select(to_date($"ts").cast("string").as("day"), unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(String, Long)].collect()
    val expected = ev.groupBy(_._1).map { case (day, rs) =>
      val intervals = rs.map { case (_, us) =>
        val dayStart = us - Math.floorMod(us, Warehouse.DayMicros)
        (us, math.min(us + Warehouse.IntervalMicros, dayStart + Warehouse.DayMicros))
      }
      // max overlap is attained at some interval start (half-open intervals)
      val m = intervals.map { case (s, _) =>
        intervals.count { case (s2, e2) => s2 <= s && s < e2 }
      }.max
      day -> ((m.toLong, intervals.length.toLong))
    }
    assert(got == expected)
  }

  test("q_range_count prefix-sum route equals the direct range join") {
    val viaPrefix = Warehouse.rangeCount(spark, dir)
      .as[(Long, Long)].collect().toSeq
    val o = graft.io.Tables.orders(spark, dir)
      .select($"o_orderkey", to_date($"o_orderdate").as("s"))
    val l = graft.io.Tables.lineitem(spark, dir)
      .select(to_date($"l_shipdate").as("ship"))
    val direct = o.join(l,
        $"ship" >= $"s" && $"ship" <= date_add($"s", 30), "left")
      .groupBy($"o_orderkey").agg(count($"ship").as("n"))
      .orderBy($"o_orderkey")
      .as[(Long, Long)].collect().toSeq
    assert(viaPrefix == direct)
  }

  test("incrJoinMv: every delta leg is non-vacuous and the A-vs-A0 choice matters") {
    import org.apache.spark.sql.functions._
    val a = graft.io.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority",
        to_date($"o_orderdate").as("od"))
    val b = graft.io.Tables.lineitem(spark, dir)
      .select($"l_orderkey", to_date($"l_shipdate").as("sd"))
    val aCut = to_date(lit(Warehouse.IncrJoinOrdCut))
    val bCut = to_date(lit(Warehouse.IncrJoinLiCut))
    def cnt(ax: org.apache.spark.sql.DataFrame, bx: org.apache.spark.sql.DataFrame) =
      ax.join(bx, $"o_orderkey" === $"l_orderkey").count()
    val l1 = cnt(a.filter($"od" < aCut), b.filter($"sd" < bCut))
    val l2 = cnt(a.filter($"od" >= aCut), b.filter($"sd" < bCut))
    val l3 = cnt(a, b.filter($"sd" >= bCut))
    assert(l1 > 0 && l2 > 0 && l3 > 0, s"vacuous leg: $l1/$l2/$l3")
    // the classic trap: ΔA⋈ΔB must land exactly once. Using A₀ in leg 3
    // (instead of all of A) drops those rows — totals must then disagree.
    val l3Wrong = cnt(a.filter($"od" < aCut), b.filter($"sd" >= bCut))
    val full = cnt(a, b)
    assert(l1 + l2 + l3 == full, "three-leg partition != full join")
    assert(l1 + l2 + l3Wrong < full, "trap variant unexpectedly complete")
    // and the declared query's totals equal the naive aggregate
    val viaLegs = Warehouse.incrJoinMv(spark, dir)
      .agg(sum($"n_lines")).as[Long].head()
    assert(viaLegs == full)
  }
}
