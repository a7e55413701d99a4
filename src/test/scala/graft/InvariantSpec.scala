package graft

import scala.util.Random

import graft.analytics.Upsert
import graft.llm.{Cluster, TextClean}

/** Cross-cutting invariants on seeded pseudo-random inputs — cheap
  * property-style coverage without the (unavailable-offline) scalatest-
  * scalacheck bridge.
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("componentsOver matches a local union-find on random graphs") {
    val rnd = new Random(42)
    (1 to 4).foreach { _ =>
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // reference: driver-side union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // union-find roots are not necessarily component minima; take min per root
      val byRoot = nodes.groupBy(find)
      val expected = byRoot.flatMap { case (_, ms) =>
        val m = ms.min; ms.map(_ -> m)
      }
      // BOTH solve paths must match the reference: the driver union-find
      // (default gate) and the distributed propagation (gate forced to 0)
      val df = edges.toDF("doc_a", "doc_b")
      val viaDriver = Cluster.componentsOver(df)
        .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
      val viaDistributed = Cluster.componentsOver(df, driverSolveMaxPairs = 0L)
        .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
      assert(viaDriver == expected, s"driver path, edges=$edges")
      assert(viaDistributed == expected, s"distributed path, edges=$edges")
    }
  }

  test("canonicalize is idempotent on gnarly inputs") {
    val gnarly = Seq("  A\t\tB  ", "MiXeD  CaSe\nlines\r\n", "", " ", "a",
      "tabs\there", "Ünïcode  ÅB")
    gnarly.foreach { s =>
      val df = Seq(s).toDF("text")
      val once = df.select(TextClean.canonicalize($"text").as("t"))
      val twice = once.select(TextClean.canonicalize($"t").as("t"))
      assert(once.as[String].head() == twice.as[String].head(), s"input='$s'")
    }
  }

  test("applyChanges is idempotent: re-applying the same change set is a no-op") {
    val base = Seq((1L, "a", 1L, 0L), (2L, "b", 1L, 0L), (3L, "c", 1L, 0L))
      .toDF("id", "v", "version", "seq")
    val changes = Seq((2L, "b2", 2L, 1L), (4L, "d", 2L, 1L))
      .toDF("id", "v", "version", "seq")
    val once = Upsert.applyChanges(base, changes, "id", "version", "seq")
    val twice = Upsert.applyChanges(once, changes, "id", "version", "seq")
    val a = once.as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = twice.as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
