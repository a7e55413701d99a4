package graft.analytics

import java.security.MessageDigest

import graft.SparkSpec
import graft.io.Tables

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side reference: registers + scaled denominator + raw estimate
    * over a key set, exactly the module's arithmetic.
    */
  private def refSketch(keys: Iterable[String]): (Map[Long, Long], Long, Double) = {
    val regs = keys.foldLeft(Map.empty[Long, Long]) { (m, k) =>
      val h = md5hex(k)
      val j = java.lang.Long.parseLong(h.substring(0, 2), 16)
      val w = java.lang.Long.parseLong(h.substring(2, 15), 16)
      val rho = if (w == 0L) 53L else 53L - (64L - java.lang.Long.numberOfLeadingZeros(w))
      m.updated(j, math.max(m.getOrElse(j, 0L), rho))
    }
    val z = regs.values.map(r => 1L << (53 - r)).sum +
      (Hll.M - regs.size).toLong * 9007199254740992L
    (regs, z, Hll.AlphaM2Scale / z.toDouble)
  }

  test("x_hll_distinct matches the driver-side register recomputation exactly") {
    val dir = "/root/testdata/sf0.001"
    val keys = Tables.lineitem(spark, dir)
      .select($"l_orderkey".cast("string")).as[String].collect()
    val nExact = keys.distinct.length.toLong
    val (regs, z, est) = refSketch(keys)
    val row = Hll.hllDistinct(spark, dir).collect().head
    assert(row.getAs[Long]("m") == Hll.M.toLong)
    assert(row.getAs[Long]("m_hit") == regs.size.toLong)
    assert(row.getAs[Long]("m_zero") == (Hll.M - regs.size).toLong)
    assert(row.getAs[Long]("z_scaled") == z)
    assert(row.getAs[Double]("estimate") == est) // bit-exact: same int ops + one division
    assert(row.getAs[Long]("n_exact") == nExact)
  }

  test("raw estimator lands inside 3x the theoretical HLL error at sf0.01") {
    val row = Hll.hllDistinct(spark, "/root/testdata/sf0.01").collect().head
    // 1.04/sqrt(256) = 6.5%; allow 3 sigma. Also asserts the fixture is in
    // the raw-estimator regime (n >> 2.5m) the scaladoc claims.
    assert(row.getAs[Long]("n_exact") > 2.5 * Hll.M)
    assert(math.abs(row.getAs[Double]("rel_err")) < 3 * 1.04 / math.sqrt(Hll.M))
  }

  test("x_hll_merge: max-merged ALL sketch is identical to a direct global sketch") {
    val dir = "/root/testdata/sf0.001"
    val hashes = Tables.documents(spark, dir)
      .select($"text").as[String].collect().map(md5hex)
    // Direct global sketch built straight over the content hashes (no
    // per-source split) — the max-merged ALL row must reproduce it exactly.
    val (regs, z, est) = {
      val rs = hashes.foldLeft(Map.empty[Long, Long]) { (m, h) =>
        val j = java.lang.Long.parseLong(h.substring(0, 2), 16)
        val w = java.lang.Long.parseLong(h.substring(2, 15), 16)
        val rho = if (w == 0L) 53L else 53L - (64L - java.lang.Long.numberOfLeadingZeros(w))
        m.updated(j, math.max(m.getOrElse(j, 0L), rho))
      }
      val zz = rs.values.map(r => 1L << (53 - r)).sum +
        (Hll.M - rs.size).toLong * 9007199254740992L
      (rs, zz, Hll.AlphaM2Scale / zz.toDouble)
    }
    val all = Hll.hllMerge(spark, dir).collect()
      .find(_.getAs[String]("source") == "ALL").get
    assert(all.getAs[Long]("m_hit") == regs.size.toLong)
    assert(all.getAs[Double]("estimate") == est)
    assert(all.getAs[Long]("n_exact") == hashes.distinct.length.toLong)
    assert(z > 0)
  }

  test("every source row is present and err_permille is floor((est-n)/n*1000)") {
    val rows = Hll.hllMerge(spark, "/root/testdata/sf0.001").collect()
    val srcs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"source").distinct().as[String].collect().toSet
    assert(rows.map(_.getAs[String]("source")).toSet == srcs + "ALL")
    rows.foreach { r =>
      val est = r.getAs[Double]("estimate")
      val n = r.getAs[Long]("n_exact").toDouble
      assert(r.getAs[Long]("err_permille") == math.floor((est - n) * 1000.0 / n).toLong)
    }
  }
}
