package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

/** Driver-side recomputation of both retrieval queries on sf0.001 — the
  * BM25 integer algebra and the RRF fusion are each rebuilt from raw
  * tokens/vectors with BigInt arithmetic, so a divergence in either
  * engine-side formula fails here before the oracle gate sees it.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** (doc -> score) for one query, recomputed from raw text with BigInt —
    * the same floor-division algebra as [[Retrieval.bm25TermScore]] but an
    * independent implementation (driver-side Scala over collected rows).
    */
  private def bm25Expected(terms: Seq[String]): Map[Long, Long] = {
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = BigInt(docs.length)
    val tt = BigInt(toks.values.map(_.length).sum)
    val dfm = terms.map { t =>
      t -> BigInt(toks.values.count(_.contains(t)))
    }.toMap
    docs.flatMap { case (id, _) =>
      val dl = BigInt(toks(id).length)
      val score = terms.map { t =>
        val tf = BigInt(toks(id).count(_ == t))
        if (tf == 0) BigInt(0)
        else ((2 * n + 2) * 22 * tf * tt * Retrieval.BmScale) /
          ((2 * dfm(t) + 1) * (10 * tt * tf + 3 * tt + 9 * dl * n))
      }.sum
      if (score > 0) Some(id -> score.toLong) else None
    }.toMap
  }

  test("x_bm25_topk matches a BigInt driver-side recomputation, per query") {
    val out = Retrieval.bm25TopK(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    Retrieval.QueryDefs.foreach { case (q, terms, _) =>
      val exp = bm25Expected(terms)
      val expTop = exp.toSeq.sortBy { case (id, s) => (-s, id) }
        .take(Retrieval.BmTopK)
      val got = out.filter(_._1 == q).sortBy(_._2)
        .map(r => (r._3, r._4)).toSeq
      assert(got == expTop, s"query $q")
    }
  }

  test("bm25: the rare term dominates — every query-1 winner contains 'dup'") {
    // df('dup') is ~5% of docs vs ~75%+ for every other term, so the
    // rational idf weight (2N+2)/(2df+1) is ~15x larger: a single 'dup'
    // occurrence outscores any pileup of 'key'. If the idf leg were wired
    // wrong (e.g. df/N inverted) this inclusion breaks immediately.
    val winners = Retrieval.bm25TopK(spark, dir)
      .filter($"query_id" === 1L).select($"doc_id").as[Long].collect().toSet
    val dupDocs = Tables.documents(spark, dir)
      .filter(array_contains(split($"text", " "), "dup"))
      .select($"doc_id").as[Long].collect().toSet
    assert(winners.nonEmpty && winners.subsetOf(dupDocs),
      s"non-dup docs in the rare-term query's top-k: ${winners -- dupDocs}")
  }

  test("x_rrf_hybrid equals fusion of the two independently recomputed rank lists") {
    val out = Retrieval.rrfHybrid(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // lexical leg: recomputed BM25 ranks to RrfListK
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    Retrieval.QueryDefs.foreach { case (q, terms, probe) =>
      val lexRanks = bm25Expected(terms).toSeq
        .sortBy { case (id, s) => (-s, id) }.take(Retrieval.RrfListK)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }
      val semRanks = vecs.toSeq.filter(_._1 != probe)
        .map { case (id, v) =>
          id -> math.round(cos(vecs(probe), v) * 1e6)
        }
        .sortBy { case (id, s) => (-s, id) }.take(Retrieval.RrfListK)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }
      val fused = (lexRanks ++ semRanks)
        .map { case (id, r) => id -> Retrieval.RrfScale / (Retrieval.RrfK + r) }
        .groupBy(_._1).map { case (id, cs) => id -> cs.map(_._2).sum }
      val expTop = fused.toSeq.sortBy { case (id, s) => (-s, id) }
        .take(Retrieval.RrfTopK)
      val got = out.filter(_._1 == q).sortBy(_._2)
        .map(r => (r._3, r._4)).toSeq
      assert(got == expTop, s"query $q")
    }
  }

  test("rrf: a doc on both lists outranks one with only a deep single-list rank") {
    // structural property of the fusion constant: rank 1 on ONE list
    // (1e9/61 ≈ 1.6e7) cannot beat presence at e.g. ranks 25+25 on BOTH
    // (2 * 1e9/85 ≈ 2.4e7) — fusion rewards agreement between modalities.
    val both = Retrieval.RrfScale / (Retrieval.RrfK + 25) * 2
    val single = Retrieval.RrfScale / (Retrieval.RrfK + 1)
    assert(both > single)
  }
}
