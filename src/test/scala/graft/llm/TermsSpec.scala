package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TermsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_tfidf ranks 10 tokens per source, scores consistent with tf*N/df") {
    val rows = Terms.tfidf(spark, dir)
      .select($"source", $"rk", $"token", $"tf", $"df", $"score")
      .as[(String, Long, String, Long, Long, Double)].collect()
    val nSources = rows.map(_._1).distinct.length
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 10L), s"$src ranks")
      // scores non-increasing in rank order
      val byRank = rs.sortBy(_._2).map(_._6)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"$src not sorted")
    }
    rows.foreach { case (_, _, _, tf, df, score) =>
      assert(df >= 1 && df <= nSources)
      assert(score == tf.toDouble * nSources / df.toDouble)
    }
  }

  test("x_ngrams counts match a direct recomputation for the top bigram") {
    val top = Terms.ngrams(spark, dir)
      .select($"bigram", $"n", $"n_docs").as[(String, Long, Long)].collect()
    assert(top.length == 50)
    assert(top.forall { case (_, n, nd) => nd >= 1 && nd <= n })
    val (bigram, n, _) = top.head
    val Array(w1, w2) = bigram.split(" ", 2)
    val direct = graft.io.Tables.documents(spark, dir)
      .select(split(lower($"text"), " ").as("t"))
      .as[Seq[String]].collect()
      .map(toks => toks.zip(toks.drop(1)).count { case (a, b) => a == w1 && b == w2 })
      .sum
    assert(direct.toLong == n, s"top bigram '$bigram': engine $n vs direct $direct")
  }
}
