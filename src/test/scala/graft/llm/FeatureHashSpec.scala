package graft.llm

import java.security.MessageDigest

import graft.SparkSpec
import graft.io.Tables

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def md5Bucket(tok: String): (Long, Long) = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    (h % FeatureHash.Buckets, if (h % 2 == 0) 1L else -1L)
  }

  test("x_feature_hash matches a driver-side MD5 recomputation") {
    val toks = Tables.documents(spark, dir)
      .selectExpr("lower(text) as t").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
    val expected = toks.map(t => (t, md5Bucket(t)))
      .groupBy(_._2._1).map { case (b, xs) =>
        (b, xs.length.toLong, xs.map(_._1).distinct.length.toLong,
          xs.map(_._2._2).sum)
      }.toSet
    val got = FeatureHash.featureHash(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("bucket mass conserves tokens; collision load is realistic") {
    val rows = FeatureHash.featureHash(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long)].collect()
    val nToks = Tables.documents(spark, "/root/testdata/sf0.01")
      .selectExpr("size(filter(split(lower(text), ' '), x -> x != '')) as n")
      .as[Int].collect().map(_.toLong).sum
    assert(rows.map(_._2).sum == nToks)
    assert(rows.forall(r => math.abs(r._4) <= r._2)) // sign sum bounded by mass
    assert(rows.exists(_._3 > 1)) // hashing trick actually collides somewhere
  }
}
