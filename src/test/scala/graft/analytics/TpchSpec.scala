package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class TpchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_tpch_q18 equals an independent window formulation") {
    val out = Tpch.tpchQ18(spark, dir)
      .select($"o_orderkey", $"total_qty").as[(Long, Long)].collect().toList
    // independent route: join first, aggregate once, filter + sort after
    val expected = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_totalprice", $"o_orderdate")
      .agg(sum($"l_quantity".cast("long")).as("tq"))
      .filter($"tq" > Tpch.Q18MinQty)
      .orderBy($"o_totalprice".desc, to_date($"o_orderdate"), $"o_orderkey")
      .limit(100)
      .select($"o_orderkey", $"tq").as[(Long, Long)].collect().toList
    assert(out == expected)
    assert(out.forall(_._2 > Tpch.Q18MinQty))
  }

  test("q_tpch_q14 promo share is a valid ratio and months are complete") {
    val rows = Tpch.tpchQ14(spark, dir)
      .select($"ym", $"promo_share").as[(String, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ym, share) =>
      assert(share >= 0.0 && share <= 1.0, s"$ym: $share")
    }
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("q_tpch_q3 emits at most 10 orders in descending revenue order") {
    val rev = Tpch.tpchQ3(spark, dir)
      .select($"revenue_ucents").as[Long].collect().toList
    assert(rev.length <= 10 && rev == rev.sorted.reverse)
  }

  test("q_tpch_q4 semi-join counts orders once however many lines are late") {
    val out = Tpch.tpchQ4(spark, dir)
      .as[(String, Long)].collect().toMap
    // independent formulation: distinct qualifying order keys per priority
    val ord = Tables.orders(spark, dir)
      .filter(to_date($"o_orderdate") >= lit(Tpch.Q4Start) &&
        to_date($"o_orderdate") < lit(Tpch.Q4End))
    val expected = ord
      .join(Tables.lineitem(spark, dir),
        $"o_orderkey" === $"l_orderkey" &&
          to_date($"l_shipdate") > date_add(to_date($"o_orderdate"), Tpch.Q4LateDays))
      .select($"o_orderpriority", $"o_orderkey").distinct()
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out == expected)
  }

  test("q_tpch_q13 keeps zero-order customers and conserves the population") {
    val out = Tpch.tpchQ13(spark, dir)
      .as[(Long, Long)].collect()
    val nCust = Tables.customer(spark, dir).count()
    assert(out.map(_._2).sum == nCust, "distribution must cover every customer")
    // the excluded-priority filter guarantees some zero-count customers at
    // this SF only if a customer's orders are all 5-LOW; just pin presence
    // of the 0 bucket when any customer lacks qualifying orders
    val withOrders = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter($"o_orderpriority" =!= Tpch.Q13ExcludedPriority),
        $"c_custkey" === $"o_custkey", "left_semi").count()
    val zeroBucket = out.toMap.getOrElse(0L, 0L)
    assert(zeroBucket == nCust - withOrders, "outer join dropped customers")
  }

  test("q_tpch_q16 counts distinct suppliers within the admitted part groups") {
    val out = Tpch.tpchQ16(spark, dir)
      .as[(String, Int, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (brand, size, _) =>
      brand != Tpch.Q16ExcludedBrand && Tpch.Q16Sizes.contains(size) })
    // independent recount for one group
    val (b0, s0, n0) = out.head
    val recount = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .filter($"p_brand" === b0 && $"p_size" === s0)
      .select($"l_suppkey").distinct().count()
    assert(n0 == recount)
  }

  test("q_tpch_q21 blames only the sole late supplier of multi-supplier orders") {
    val out = Tpch.tpchQ21(spark, dir).as[(Long, Long)].collect().toMap
    // reconstruct per-order fault sets independently
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .select($"o_orderkey", to_date($"o_orderdate").as("o_date")),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        (to_date($"l_shipdate") > date_add($"o_date", Tpch.Q4LateDays)).as("late"))
      .as[(Long, Long, Boolean)].collect()
    val byOrder = li.groupBy(_._1)
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    byOrder.foreach { case (_, lines) =>
      val sups = lines.map(_._2).distinct
      val lateSups = lines.filter(_._3).map(_._2).distinct
      if (sups.length > 1 && lateSups.length == 1)
        expected(lateSups.head) = expected.getOrElse(lateSups.head, 0L) + 1
    }
    assert(out == expected.toMap)
  }

  test("q_tpch_q15 returns exactly the argmax suppliers (ties survive)") {
    val out = Tpch.tpchQ15(spark, dir).as[(Long, Long)].collect()
    assert(out.nonEmpty)
    val totals = out.map(_._2).distinct
    assert(totals.length == 1, "every returned supplier shares the max total")
    // no supplier anywhere beats the returned total
    val all = Tables.lineitem(spark, dir)
      .filter(to_date($"l_shipdate") >= lit(Tpch.Q4Start) &&
        to_date($"l_shipdate") < lit(Tpch.Q4End))
      .groupBy($"l_suppkey")
      .agg(sum(graft.util.Det.cents($"l_extendedprice") *
        (lit(100L) - round($"l_discount" * 100).cast("long"))).as("t"))
      .agg(max($"t")).as[Long].head()
    assert(totals.head == all)
  }

  test("q_tpch_q17 integer sub-average test admits exactly qty < 0.2*avg") {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter($"p_brand" === Tpch.Q17Brand),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity".cast("long").as("qty"))
      .as[(Long, Long)].collect()
    val byPart = li.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = li.count { case (pk, q) =>
      val qs = byPart(pk); q.toDouble < 0.2 * (qs.sum.toDouble / qs.length)
    }
    val got = Tpch.tpchQ17(spark, dir)
      .select($"n_lines").as[Long].head()
    assert(got == expected, s"integer form admitted $got, float definition $expected")
  }

  test("q_tpch_q19 disjunction equals the union of its branches") {
    val one = Tpch.tpchQ19(spark, dir)
      .as[(Long, Long)].collect().head
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val joined = li.join(part, $"l_partkey" === $"p_partkey")
    def branch(b: String, sMax: Int, qLo: Int, qHi: Int) = joined
      .filter($"p_brand" === b && $"p_size".between(1, sMax) &&
        $"l_quantity".between(qLo, qHi))
    val union = branch("Brand#12", 15, 1, 11)
      .union(branch("Brand#23", 25, 10, 20))
      .union(branch("Brand#34", 35, 20, 30))
    assert(one._2 == union.count(), "branch disjointness (quantity ranges) broken")
  }
}
