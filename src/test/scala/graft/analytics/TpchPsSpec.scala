package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class TpchPsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("partsupp derivation: keys in range, pairs unique, values in their domains") {
    val ps = TpchPs.partsupp(spark, dir).cache()
    val sCnt = Tables.supplier(spark, dir).count()
    val pCnt = Tables.part(spark, dir).count()
    val rows = ps.as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 4 * pCnt)
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    rows.foreach { case (p, s, qty, cost) =>
      assert(s >= 0 && s < sCnt, s"suppkey $s out of [0,$sCnt)")
      assert(qty >= 1 && qty <= 9999, s"availqty $qty")
      assert(cost >= 100 && cost <= 100000, s"supplycost_cents $cost")
      // values are pure congruences of the pair — recompute and compare
      assert(qty == (p * 31 + s * 17) % 9999 + 1)
      assert(cost == (p * 7919 + s * 104729) % 99901 + 100)
    }
    // toy-S stride collisions can collapse a part to a single supplier
    // (step ≡ 0 mod S), but most parts keep all 4
    val perPart = rows.groupBy(_._1).map(_._2.length)
    assert(perPart.min >= 1 && perPart.max <= 4)
    assert(perPart.count(_ == 4) > perPart.size / 2)
    ps.unpersist()
  }

  test("q_tpch_q2 rows are the min-cost EUROPE suppliers of their part") {
    val out = TpchPs.tpchQ2(spark, dir)
      .select($"p_partkey", $"supplycost_cents").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    // independent route: per-part min over the region-scoped partsupp
    val euMin = TpchPs.partsupp(spark, dir)
      .join(Tables.supplier(spark, dir), $"ps_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, dir).filter($"r_name" === TpchPs.Q2Region),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"ps_partkey").agg(min($"ps_supplycost_cents").as("m"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (p, c) => assert(euMin(p) == c, s"part $p: $c != min") }
  }

  test("q_tpch_q9 profit matches a per-line recomputation") {
    val out = TpchPs.tpchQ9(spark, dir)
      .as[(String, Long, Long)].collect().toList
    assert(out.nonEmpty)
    val total = out.map(_._3).sum
    // independent check: same joins, ungrouped sum
    val ps = TpchPs.partsupp(spark, dir)
    val flat = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter($"p_name".contains(TpchPs.Q9NamePart)),
        $"l_partkey" === $"p_partkey")
      .join(ps, $"l_partkey" === $"ps_partkey" && $"l_suppkey" === $"ps_suppkey")
      .select(sum(graft.util.Det.cents($"l_extendedprice") *
          (lit(100L) - round($"l_discount" * 100).cast("long")) -
        $"ps_supplycost_cents" * graft.util.Det.cents($"l_quantity")).as("t"))
      .as[Long].head()
    assert(total == flat)
  }

  test("q_tpch_q11 returned parts all clear the concentration threshold") {
    val nat = TpchPs.partsupp(spark, dir)
      .join(Tables.supplier(spark, dir), $"ps_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, dir).filter($"n_name" === TpchPs.Q11Nation),
        $"s_nationkey" === $"n_nationkey")
      .select($"ps_partkey", ($"ps_supplycost_cents" * $"ps_availqty").as("v"))
    val totalV = nat.agg(sum($"v")).as[Long].head()
    val out = TpchPs.tpchQ11(spark, dir).as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (p, v) =>
      assert(v * TpchPs.Q11Per > totalV, s"part $p below threshold")
    }
    // descending by value, ties impossible to mis-order (partkey tiebreak)
    assert(out.map(_._2).toList == out.map(_._2).toList.sorted.reverse)
  }

  test("lineitemExt derivation: mode in domain, receipt lag 1-30, commit in ship±30") {
    val ext = TpchPs.lineitemExt(spark, dir)
      .select($"l_shipmode", datediff($"l_receiptdate", $"l_sd"),
        datediff($"l_commitdate", $"l_sd"))
      .as[(String, Int, Int)].collect()
    assert(ext.nonEmpty)
    val modes = Set("MAIL", "SHIP", "AIR", "RAIL", "TRUCK", "FOB", "REG AIR")
    ext.foreach { case (m, rLag, cOff) =>
      assert(modes.contains(m), s"mode $m")
      assert(rLag >= 1 && rLag <= 30, s"receipt lag $rLag")
      assert(cOff >= -30 && cOff <= 30, s"commit offset $cOff")
    }
    // all seven modes actually occur — the congruence isn't degenerate
    assert(ext.map(_._1).toSet == modes)
    // and the mode varies WITHIN a fixed linenumber: the round-6 derivation
    // used l_orderkey*7 ≡ 0 (mod 7), collapsing the mode to a pure
    // linenumber function (Q12's MAIL/SHIP filter then selected exactly
    // linenumbers 5 and 7 — position-correlated selectivity the hash gate
    // cannot see because both engines agreed on the degenerate table).
    val distinctPerLine = TpchPs.lineitemExt(spark, dir)
      .groupBy($"l_linenumber")
      .agg(countDistinct($"l_shipmode").as("nmodes"))
      .as[(Long, Long)].collect()
    assert(distinctPerLine.nonEmpty && distinctPerLine.forall(_._2 > 1),
      s"mode is linenumber-determined: ${distinctPerLine.mkString(",")}")
  }

  test("q_tpch_q12 counts match a driver-side recomputation over the late lines") {
    val out = TpchPs.tpchQ12(spark, dir)
      .as[(String, Long, Long)].collect().toList
    assert(out.nonEmpty && out.map(_._1) == out.map(_._1).sorted)
    val prio = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority")
      .as[(Long, String)].collect().toMap
    val late = TpchPs.lineitemExt(spark, dir)
      .filter($"l_shipmode".isin("MAIL", "SHIP") &&
        $"l_commitdate" < $"l_receiptdate" && $"l_sd" < $"l_commitdate" &&
        $"l_receiptdate" >= lit(TpchPs.Q12Start).cast("date") &&
        $"l_receiptdate" < lit(TpchPs.Q12End).cast("date"))
      .select($"l_orderkey", $"l_shipmode").as[(Long, String)].collect()
    val expected = late.groupBy(_._2).map { case (m, ls) =>
      val high = ls.count(l => Set("1-URGENT", "2-HIGH").contains(prio(l._1)))
      (m, high.toLong, (ls.length - high).toLong)
    }.toList.sortBy(_._1)
    assert(out == expected)
  }

  test("q_tpch_q20 suppliers really hold excess stock of a matched part") {
    val out = TpchPs.tpchQ20(spark, dir).as[(Long, String)].collect()
    assert(out.nonEmpty)
    val shipped = Tables.lineitem(spark, dir)
      .filter(to_date($"l_shipdate") >= lit(TpchPs.Q20Start) &&
        to_date($"l_shipdate") < lit(TpchPs.Q20End))
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(graft.util.Det.cents($"l_quantity")).as("qc"))
    val witness = TpchPs.partsupp(spark, dir)
      .join(Tables.part(spark, dir).filter($"p_name".startsWith(TpchPs.Q20Name)),
        $"ps_partkey" === $"p_partkey")
      .join(shipped, $"ps_partkey" === $"l_partkey" && $"ps_suppkey" === $"l_suppkey")
      .filter($"ps_availqty" * 200L > $"qc")
      .select($"ps_suppkey").distinct().as[Long].collect().toSet
    out.foreach { case (s, _) => assert(witness.contains(s), s"supplier $s has no witness") }
  }
}
