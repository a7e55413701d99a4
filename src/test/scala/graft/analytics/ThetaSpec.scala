package graft.analytics

import java.security.MessageDigest

import graft.SparkSpec
import graft.io.Tables

class ThetaSpec extends SparkSpec {
  import spark.implicits._

  private def md5h13(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)

  private def custs(dir: String, prio: String): Set[Long] =
    Tables.orders(spark, dir)
      .filter($"o_orderpriority" === prio)
      .select($"o_custkey").distinct().as[Long].collect().toSet

  test("x_theta_intersect matches a driver-side sketch recomputation exactly") {
    val dir = "/root/testdata/sf0.01"
    val a = custs(dir, "1-URGENT")
    val b = custs(dir, "5-LOW")
    def sk(s: Set[Long]): Vector[String] =
      s.map(c => md5h13(c.toString)).toVector.sorted.take(Sketch.K)
    val (ska, skb) = (sk(a), sk(b))
    def th(sketch: Vector[String], full: Int): Long =
      if (sketch.length < full) Sketch.HashSpace.toLong
      else java.lang.Long.parseLong(sketch.last, 16)
    val theta = math.min(th(ska, Sketch.K), th(skb, Sketch.K))
    val common = ska.toSet.intersect(skb.toSet)
      .count(h => java.lang.Long.parseLong(h, 16) < theta).toLong
    val est = common.toDouble * Sketch.HashSpace / theta.toDouble
    val row = Sketch.thetaIntersect(spark, dir).collect().head
    assert(row.getAs[Long]("k_a") == ska.length.toLong)
    assert(row.getAs[Long]("k_b") == skb.length.toLong)
    assert(row.getAs[Long]("theta") == theta)
    assert(row.getAs[Long]("n_common") == common)
    assert(row.getAs[Long]("n_exact") == a.intersect(b).size.toLong)
    assert(row.getAs[Double]("est_theta") == est)
  }

  test("direct theta composition beats inclusion-exclusion on this overlap") {
    val row = Sketch.thetaIntersect(spark, "/root/testdata/sf0.01").collect().head
    val n = row.getAs[Long]("n_exact").toDouble
    val errTheta = math.abs(row.getAs[Double]("est_theta") - n)
    val errIE = math.abs(row.getAs[Double]("est_incl_excl") - n)
    assert(n > 0)
    // The scaladoc's claim, pinned: on a full-sketch overlap the direct
    // estimator's error must not exceed the subtraction-of-three-estimates
    // rival's (strictly smaller on this fixture).
    assert(errTheta < errIE, s"theta err $errTheta vs incl-excl $errIE")
    // And it lands within the theoretical ~3/sqrt(K) band of the truth.
    assert(errTheta / n < 3.0 / math.sqrt(Sketch.K.toDouble))
  }

  test("non-full sketches make the estimator exact at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val row = Sketch.thetaIntersect(spark, dir).collect().head
    if (row.getAs[Long]("k_a") < Sketch.K && row.getAs[Long]("k_b") < Sketch.K) {
      // θ = full hash space ⇒ the sketches ARE the sets: estimate ≡ exact.
      assert(row.getAs[Double]("est_theta") == row.getAs[Long]("n_exact").toDouble)
    }
  }
}
