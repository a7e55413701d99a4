package graft.analytics

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side recompute: the DIRECT global bottom-k sample and its
    * quantile picks — the law the merged route must reproduce.
    */
  private def model(): (Long, Long, Long, Long, Long, Long) = {
    val rows = graft.io.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber".cast("long"),
        round($"l_extendedprice" * 100).cast("long"),
        year(to_date($"l_shipdate")).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val hashed = rows.map { case (ok, ln, cents, y) =>
      (java.lang.Long.parseLong(md5hex(s"$ok:$ln").take(13), 16), cents, y)
    }
    val sample = hashed.sortBy(t => (t._1, t._2)).take(BottomK.SketchK)
      .map(t => (t._2, t._1)).sortBy(identity)
    val k = sample.length.toLong
    def pick(rank: Long): Long = sample((rank - 1).toInt)._1
    (rows.length.toLong, hashed.map(_._3).distinct.length.toLong, k,
      pick((k + 1) / 2), pick((k * 9 + 9) / 10), pick((k * 99 + 99) / 100))
  }

  test("x_quantile_merge equals the direct global bottom-k recompute") {
    val got = BottomK.quantileMerge(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(model()))
  }

  test("merged estimates are ordered and inside the data range") {
    val (_, _, k, p50, p90, p99) = {
      val r = BottomK.quantileMerge(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long)].head()
      (r._1, r._2, r._3, r._4, r._5, r._6)
    }
    assert(k > 0 && p50 <= p90 && p90 <= p99)
    val (lo, hi) = graft.io.Tables.lineitem(spark, dir)
      .agg(min(round($"l_extendedprice" * 100).cast("long")),
        max(round($"l_extendedprice" * 100).cast("long")))
      .as[(Long, Long)].head()
    assert(p50 >= lo && p99 <= hi)
  }

  test("sketch estimates converge on the exact quantiles at larger input") {
    // At sf0.01 (~6k lineitem rows) the k=1024 sample's p50 must land
    // within a few percent of the exact median — the 1/sqrt(k) rank bound
    // with generous slack.
    val big = "/root/testdata/sf0.01"
    val est = BottomK.quantileMerge(spark, big)
      .select($"p50_est").as[Long].head()
    val cents = graft.io.Tables.lineitem(spark, big)
      .select(round($"l_extendedprice" * 100).cast("long")).as[Long]
      .collect().sorted
    val exact = cents((cents.length - 1) / 2)
    val p40 = cents((cents.length * 2) / 5)
    val p60 = cents((cents.length * 3) / 5)
    assert(est >= p40 && est <= p60,
      s"p50_est=$est outside [p40=$p40, p60=$p60] around exact=$exact")
  }
}
