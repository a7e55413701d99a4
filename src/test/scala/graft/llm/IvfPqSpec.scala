package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ivfpq ranks by ADC computed from the declared PQ codes and a real LUT") {
    val out = IvfPq.ivfpqTopK(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // ranks are 1..k and adc is non-decreasing within each query
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to rows.length).toSeq, s"query $q ranks")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).toSeq.sorted, s"query $q adc order")
      assert(rows.length <= IvfPq.TopK)
      assert(rows.forall(_._2 != q), s"query $q self-match")
    }
    // ADC recomputed by hand for the top hit of each query: distance from
    // the query subvector to the CANDIDATE'S assigned sub-centroid
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val n = vecs.size
    val stride = math.max(1L, n / Pq.K)
    val pqSeeds = vecs.toSeq.filter(_._1 % stride == 0).sortBy(_._1)
      .take(Pq.K).map(_._2)
    def code(v: Seq[Double], m: Int): Int = {
      val sub = v.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
      pqSeeds.zipWithIndex.map { case (s, i) =>
        val c = s.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
        (round6(sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum), i)
      }.min._2
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.filter(_._3 == 1L).take(5).foreach { case (q, nb, _, adc) =>
      val qv = vecs(q)
      val nv = vecs(nb)
      val expect = (0 until Pq.M).map { m =>
        val c = pqSeeds(code(nv, m)).slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
        val qs = qv.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
        round6(qs.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sum
      assert(math.abs(adc - expect) < 1e-9, s"query $q neighbor $nb adc")
    }
  }
}
