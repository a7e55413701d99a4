package graft.llm

import graft.SparkSpec
import graft.io.Tables

class EmbedStatsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x_embed_dim_stats matches a driver-side micro-unit recomputation") {
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val dims = vecs.head._2.length
    val out = EmbedStats.embedDimStats(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == dims && out.map(_._1).toList == (0L until dims).toList)
    for (d <- 0 until dims) {
      val q = vecs.map { case (_, v) => math.floor(v(d).toDouble * 1e6).toLong }
      val (_, n, mean, mn, mx, rms2) = out(d)
      assert(n == vecs.length.toLong, s"dim $d n")
      assert(mean == q.sum / n, s"dim $d mean")
      assert(mn == q.min && mx == q.max, s"dim $d min/max")
      assert(rms2 == q.map(x => x * x).sum / n, s"dim $d rms2")
    }
  }

  test("no dead dimensions in the fixture (the QA signal is live)") {
    // a dead dim would have min == max; the check exercises exactly what a
    // curator reads this table for
    EmbedStats.embedDimStats(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .foreach { r => assert(r._4 < r._5, s"dim ${r._1} is constant") }
  }
}
