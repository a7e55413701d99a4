package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("x_edit_join blocking is lossless vs the brute-force join") {
    val titles = Tables.documents(spark, dir)
      .selectExpr("doc_id", s"substring(lower(text), 1, ${EditJoin.TitleLen}) as name")
      .as[(Long, String)].collect()
    val dirty = titles.filter(_._1 % EditJoin.DirtyMod == 0).map { case (id, n) =>
      val p = (id % 14).toInt + 1
      (id, n.substring(0, p - 1) + n.substring(p))
    }
    val expected = (for {
      (vid, vn) <- dirty; (did, n) <- titles
      d = lev(vn, n) if d <= EditJoin.Tau
    } yield (vid, did, d.toLong)).toSet
    val got = EditJoin.editJoin(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("every dirty record recovers its own source at distance 1") {
    val got = EditJoin.editJoin(spark, dir).as[(Long, Long, Long)].collect()
    val selfMatches = got.filter(r => r._1 == r._2)
    val nDirty = Tables.documents(spark, dir)
      .filter($"doc_id" % EditJoin.DirtyMod === 0).count()
    assert(selfMatches.length == nDirty.toInt)
    assert(selfMatches.forall(_._3 == 1L)) // a deletion is exactly one edit
  }
}
