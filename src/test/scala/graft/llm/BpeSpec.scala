package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Independent sequential BPE (Sennrich): symbol LISTS, greedy leftmost
    * non-overlapping merge-all per round, argmax by (count desc, pair asc).
    */
  private def model(vocab: Seq[(String, Long)],
                    rounds: Int): Seq[(Long, String, String, Long)] = {
    var segs: Seq[(Vector[String], Long)] =
      vocab.map { case (w, wc) => (w.map(_.toString).toVector, wc) }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (syms, wc) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + wc
          case _            =>
        }
      }
      val ((a, b), n) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, x + " " + y) }
      segs = segs.map { case (syms, wc) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), wc)
      }
      (r.toLong, s"$a $b", a + b, n)
    }
  }

  private def trainSynthetic(vocab: Seq[(String, Long)], rounds: Int) =
    Bpe.trainOver(vocab.toDF("w", "wc"), rounds)
      .as[(Long, String, String, Long)].collect().toSeq

  test("x_bpe_train equals sequential BPE on the fixture vocabulary") {
    val vocab = graft.io.Tables.documents(spark, dir)
      .select(explode(split(lower($"text"), " ")).as("w"))
      .filter(length($"w") >= 2)
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .as[(String, Long)].collect().toSeq
    val got = Bpe.bpeTrain(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == model(vocab, Bpe.Rounds))
  }

  test("self-adjacent runs merge greedily leftmost like textbook BPE") {
    // "aaaaa" with pair (a,a): textbook merges positions (1,2) and (3,4),
    // leaving "aa aa a" — the single-space replace form gets "aa a aa"
    // instead (it consumes the shared boundary space); this pins the
    // wrapped-block representation actually fixing that.
    val vocab = Seq(("aaaaa", 1L))
    val got = trainSynthetic(vocab, 2)
    assert(got == model(vocab, 2))
    // round 1: (a,a) appears 4 times — the single-space replace form
    // would count the same but MERGE to [aa, a, aa]; round 2 then counts
    // over the textbook [aa, aa, a], where (aa,aa) and (aa,a) tie at 1
    // and the tie-break picks "aa a" (' ' sorts before 'a').
    assert(got.head == ((1L, "a a", "aa", 4L)))
    assert(got(1) == ((2L, "aa a", "aaa", 1L)))
  }

  test("chained occurrences all merge in one round") {
    val vocab = Seq(("ababab", 2L), ("abab", 3L))
    val got = trainSynthetic(vocab, 3)
    assert(got == model(vocab, 3))
    // (a,b) count: 3 per 'ababab' x2 + 2 per 'abab' x3 = 12
    assert(got.head == ((1L, "a b", "ab", 12L)))
    // after round 1 every word is all-'ab' blocks: (ab,ab) = 2*2 + 1*3
    assert(got(1) == ((2L, "ab ab", "abab", 7L)))
  }

  test("count ties break on the lexicographically first pair") {
    val vocab = Seq(("zy", 5L), ("ab", 5L))
    val got = trainSynthetic(vocab, 1)
    assert(got.head == ((1L, "a b", "ab", 5L)))
  }
}
