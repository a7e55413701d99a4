package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial shapes for the PassJoin blocking: the pigeonhole argument
  * must survive inputs the fixture doesn't exercise — shared prefixes
  * (block-key collisions en masse), repeated characters (deletion
  * producing the same string from different positions), and near-minimal
  * lengths.
  */
class EditJoinAdversarialSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Re-implements editJoin's candidate+verify pipeline over an arbitrary
    * in-memory catalog/dirty pair (same expressions, fixture-free).
    */
  private def passJoin(catalog: Seq[(Long, String)], dirty: Seq[(Long, String)]): Set[(Long, Long)] = {
    val cat = catalog.toDF("doc_id", "name")
      .withColumn("l", length($"name"))
      .select($"doc_id", $"name", $"l",
        explode(array(
          struct(lit(1).as("seg"), expr("substring(name, 1, l div 2)").as("part")),
          struct(lit(2).as("seg"), expr("substring(name, l div 2 + 1, l)").as("part")))).as("s"))
      .select($"doc_id", $"name", $"l", $"s.seg", $"s.part")
    val q = dirty.toDF("vid", "vname")
      .withColumn("lq", length($"vname"))
      .select($"vid", $"vname",
        explode(expr(
          """flatten(transform(sequence(lq - 1, lq + 1), tl ->
            |  array(
            |   named_struct('l', tl, 'seg', 1,
            |     'part', substring(vname, 1, tl div 2)),
            |   named_struct('l', tl, 'seg', 2,
            |     'part', substring(vname, lq - (tl - tl div 2) + 1, 64)))))"""
            .stripMargin)).as("k"))
      .select($"vid", $"vname", $"k.l", $"k.seg", $"k.part")
    q.join(cat, Seq("l", "seg", "part"))
      .select($"vid", $"vname", $"doc_id", $"name").distinct()
      .filter(levenshtein($"vname", $"name") <= 1)
      .select($"vid", $"doc_id").as[(Long, Long)].collect().toSet
  }

  test("blocking stays lossless when every string shares a long prefix") {
    val catalog = (0L until 40L).map(i => i -> f"Customer#${i}%09d")
    val dirty = catalog.filter(_._1 % 3 == 0).map { case (id, n) =>
      val p = (id % (n.length - 1)).toInt
      (id + 1000) -> (n.substring(0, p) + n.substring(p + 1))
    }
    val expected = (for {
      (vid, vn) <- dirty; (did, n) <- catalog if lev(vn, n) <= 1
    } yield (vid, did)).toSet
    assert(passJoin(catalog, dirty) == expected)
    assert(expected.nonEmpty)
  }

  test("blocking stays lossless on repeated-character strings and short lengths") {
    val catalog = Seq(0L -> "aaaaaaaa", 1L -> "aaaabaaa", 2L -> "abababab",
      3L -> "aaa", 4L -> "aab", 5L -> "bbbbbbbb")
    val dirty = Seq(10L -> "aaaaaaa", 11L -> "ababab", 12L -> "aa", 13L -> "aaab")
    val expected = (for {
      (vid, vn) <- dirty; (did, n) <- catalog if lev(vn, n) <= 1
    } yield (vid, did)).toSet
    assert(passJoin(catalog, dirty) == expected)
    // "aaaaaaa" must match BOTH "aaaaaaaa" (insert) and "aaaabaaa"? (no: dist 2)
    assert(expected.contains((10L, 0L)))
    assert(expected.contains((12L, 3L))) // "aa" -> "aaa" insert
  }
}
