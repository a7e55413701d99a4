package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Driver-side rebuild of the whole pipeline — normalization, Morton
    * interleave, file prefixes, stats-pruning — from collected raw rows,
    * independent of the DataFrame implementation.
    */
  private def expected(): Map[String, (Long, Long, Long, Long, Long)] = {
    val rows = Tables.orders(spark, dir)
      .select($"o_custkey".cast("long"),
        datediff(to_date($"o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long"))
      .as[(Long, Long)].collect()
    val (ulo, uhi) = (rows.map(_._1).min, rows.map(_._1).max)
    val (vlo, vhi) = (rows.map(_._2).min, rows.map(_._2).max)
    def nrm(x: Long, lo: Long, hi: Long): Long =
      (x - lo) * 65535 / math.max(hi - lo, 1)
    def morton(u: Long, v: Long): Long =
      (0 until 16).map(i =>
        (((u >> i) & 1) << (2 * i)) | (((v >> i) & 1) << (2 * i + 1))).sum
    val matching = rows.count { case (u, v) =>
      u >= Layout.CustLo && u <= Layout.CustHi &&
        v >= Layout.DayLo && v < Layout.DayHi
    }.toLong
    def stats(fileOf: ((Long, Long)) => Long) = {
      val files = rows.groupBy(fileOf).values.toSeq
      val hit = files.filter { f =>
        val (us, vs) = (f.map(_._1), f.map(_._2))
        !(us.max < Layout.CustLo || us.min > Layout.CustHi ||
          vs.max < Layout.DayLo || vs.min >= Layout.DayHi)
      }
      val scanned = hit.map(_.length.toLong).sum
      (files.length.toLong, hit.length.toLong, scanned, matching,
        scanned * 1000 / matching)
    }
    Map(
      "zorder" -> stats { case (u, v) =>
        morton(nrm(u, ulo, uhi), nrm(v, vlo, vhi)) >> (32 - Layout.FileBits)
      },
      "linear" -> stats { case (_, v) =>
        nrm(v, vlo, vhi) >> (16 - Layout.FileBits)
      })
  }

  test("x_zorder_prune matches a driver-side bit-level recomputation") {
    val out = Layout.zorderPrune(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out.keySet == Set("zorder", "linear"))
    val exp = expected()
    assert(out("zorder") == exp("zorder"), "zorder row")
    assert(out("linear") == exp("linear"), "linear row")
  }

  test("pruning is sound (no matching row in a skipped file) and z-order wins at sf0.01") {
    // soundness at every SF the suite touches: hit files must cover every
    // matching row, so scanned >= matching
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      Layout.zorderPrune(spark, d)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .foreach { r => assert(r._4 >= r._5, s"$d ${r._1}: scanned < matching") }
    }
    // the design claim: once files hold enough rows for geometry to matter,
    // the 2-D box scans strictly fewer files and rows under z-order
    val at01 = Layout.zorderPrune(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(at01("zorder")._3 < at01("linear")._3, "files_hit not better")
    assert(at01("zorder")._6 < at01("linear")._6, "amplification not better")
  }
}
