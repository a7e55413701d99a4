package graft.llm

import graft.SparkSpec
import graft.io.Tables

class WeakLabelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_weak_label matches a driver-side LF replay and its invariants") {
    val out = WeakLabel.weakLabel(spark, dir)
      .as[(String, Long, Long, Long)].collect().toList
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()

    // driver-side replay of the vote
    val expected = docs.map { case (_, text) =>
      val toks = text.split(" ").toSet
      val votes = WeakLabel.Labels.map { l =>
        l -> WeakLabel.LabelFns.count { case (lbl, kw) =>
          lbl == l && toks.contains(kw) }.toLong
      }
      val total = votes.map(_._2).sum
      val winner =
        if (total == 0L) "(abstain)"
        else votes.filter(_._2 == votes.map(_._2).max).map(_._1).min
      val conflict = votes.count(_._2 > 0L) >= 2
      val clean = total > 0L && votes.map(_._2).max == total
      (winner, conflict, clean)
    }
    val agg = expected.groupBy(_._1).map { case (l, rs) =>
      (l, rs.length.toLong, rs.count(_._2).toLong, rs.count(_._3).toLong)
    }.toSet
    assert(out.toSet == agg)

    // invariants: total credit, diagnostics bounded, abstain has neither
    assert(out.map(_._2).sum == docs.length.toLong)
    out.foreach { case (l, n, conf, clean) =>
      assert(conf <= n && clean <= n)
      // a clean winner took EVERY vote, so no second label voted
      assert(conf + clean <= n || l == "(abstain)")
      if (l == "(abstain)") assert(conf == 0L && clean == 0L)
    }
  }

  test("the LF set keeps ties decidable by the documented lexicographic rule") {
    // two LFs per label, labels sorted — the tie-break order is the
    // public contract the oracle CASE chain mirrors
    assert(WeakLabel.Labels == Seq("compute", "query", "storage"))
    assert(WeakLabel.LabelFns.groupBy(_._1).values.forall(_.size == 2))
  }
}
