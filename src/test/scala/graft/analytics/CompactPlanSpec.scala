package graft.analytics

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class CompactPlanSpec extends SparkSpec {
  import spark.implicits._

  private def hourlyFiles(dir: String): Seq[((Long, Long), (Long, Long))] =
    Tables.events(spark, dir)
      .select(
        datediff(to_date($"ts"), lit("1970-01-01").cast("date")).cast("long"),
        hour($"ts").cast("long"),
        length(coalesce($"props", lit(""))).cast("long") + 24L)
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).toSeq
      .map { case (k, rows) => (k, (rows.length.toLong, rows.map(_._3).sum)) }
      .sortBy(_._1)

  test("x_compact_plan matches a driver-side next-fit recomputation exactly") {
    val dir = "/root/testdata/sf0.001"
    val files = hourlyFiles(dir)
    val expected = files.groupBy(_._1._1).toSeq.flatMap { case (day, fs) =>
      var cum = 0L
      fs.sortBy(_._1._2).map { case (_, (nRows, bytes)) =>
        val bin = cum / Layout.CompactTargetBytes
        cum += bytes
        ((day, bin), (1L, nRows, bytes))
      }
    }.groupBy(_._1).view.mapValues { g =>
      (g.map(_._2._1).sum, g.map(_._2._2).sum, g.map(_._2._3).sum)
    }.toMap
    val got = Layout.compactPlan(spark, dir).collect()
      .map(r => ((r.getAs[Long]("day"), r.getAs[Long]("bin")),
        (r.getAs[Long]("n_files"), r.getAs[Long]("bin_rows"),
          r.getAs[Long]("bin_bytes")))).toMap
    assert(got == expected)
  }

  test("plan conserves rows and bytes, and bins are contiguous per day") {
    val dir = "/root/testdata/sf0.01"
    val rows = Layout.compactPlan(spark, dir).collect()
    val totalRows = Tables.events(spark, dir).count()
    assert(rows.map(_.getAs[Long]("bin_rows")).sum == totalRows)
    rows.groupBy(_.getAs[Long]("day")).foreach { case (_, bs) =>
      val bins = bs.map(_.getAs[Long]("bin")).sorted.toSeq
      assert(bins == (0L until bins.length.toLong).toSeq)
    }
    // Non-vacuous at the gated SF: compaction actually merges (some bin
    // holds >1 source file) and splits days (some day has >1 bin).
    assert(rows.exists(_.getAs[Long]("n_files") > 1))
    assert(rows.groupBy(_.getAs[Long]("day")).exists(_._2.length > 1))
  }
}
