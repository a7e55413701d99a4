package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("drift_tv terms are symmetric and bounded by the scaled token totals") {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(lower($"text"), " ")).as("t"))
    val rows = Drift.driftTv(spark, dir)
      .select($"c_a", $"c_b", $"tv_scaled").as[(Long, Long, Long)].collect()
    assert(rows.length == 20)
    val (na, nb) = {
      val parity = pmod(regexp_extract($"source", "^src([0-9]+)$", 1)
        .cast("long"), lit(2))
      val c = Tables.documents(spark, dir)
        .select(parity.as("g"), explode(split(lower($"text"), " ")).as("t"))
        .groupBy($"g").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      (c(0L), c(1L))
    }
    rows.foreach { case (ca, cb, tv) =>
      assert(tv == math.abs(ca * nb - cb * na))
      assert(tv <= na * nb, "a TV term cannot exceed the common denominator")
    }
    // descending, tie-broken: the declared cut is deterministic
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sortBy(-_))
    assert(toks.count() == na + nb)
  }

  test("vocab coverage is a valid per-language ratio over the real stream") {
    val rows = Drift.vocabCoverage(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    rows.foreach { case (lang, total, covered, cov) =>
      assert(covered <= total, s"$lang covered>total")
      assert(math.abs(cov - covered.toDouble / total) < 1e-15)
    }
    val realTotal = Tables.documents(spark, dir)
      .select(explode(split(lower($"text"), " "))).count()
    assert(rows.map(_._2).sum == realTotal)
  }

  test("bpe merge pairs count exactly the corpus-weighted adjacent bigraphs") {
    val rows = Terms.bpeMerge(spark, dir)
      .as[(String, Long)].collect()
    assert(rows.length == 30)
    assert(rows.forall(_._1.length == 2))
    // independent scala-side recount of the top pair
    val (topPair, topN) = rows.head
    val recount = Tables.documents(spark, dir)
      .select(explode(split(lower($"text"), " ")).as("w"))
      .filter(length($"w") >= 2)
      .as[String].collect()
      .map(w => w.sliding(2).count(_ == topPair).toLong).sum
    assert(recount == topN, s"$topPair: $recount vs $topN")
  }

  test("pq assignment picks the true argmin sub-codebook entry per subspace") {
    val out = Pq.pqAssign(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(out.length == vecs.size)
    val n = vecs.size
    val stride = math.max(1L, n / Pq.K)
    val seeds = vecs.toSeq.filter(_._1 % stride == 0).sortBy(_._1)
      .take(Pq.K).map(_._2)
    def code(v: Seq[Double], m: Int): Long = {
      val sub = v.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
      seeds.zipWithIndex.map { case (s, i) =>
        val c = s.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
        val d = BigDecimal(sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (d, i.toLong)
      }.min._2
    }
    out.take(50).foreach { case (id, c0, c1, c2, c3, err) =>
      val v = vecs(id)
      assert((c0, c1, c2, c3) == (code(v, 0), code(v, 1), code(v, 2), code(v, 3)), s"vec $id")
      assert(err >= 0.0)
    }
  }
}
