package graft.analytics

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-trip proof that [[Layout.zorderExecute]] writes the layouts
  * `x_zorder_prune` only scores, and that the SCORE IS REAL: the declared
  * query simulates stats-based pruning over synthetic file bins, so the
  * executed rewrite must land files whose actual per-file column min/max
  * footprints reproduce the simulation number for number —
  *
  *  1. one data file per (layout, file) directory (clustering executed,
  *     not approximated);
  *  2. per-layout row multiset identical to the source orders projection;
  *  3. `files_nonempty` / `files_hit` / `rows_scanned` recomputed from
  *     the REAL files' (u, v) min/max equal the declared query's own
  *     output, both layouts — the plan's pruning verdict holds on disk.
  */
class ZorderRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))

  test("zorderExecute lands one file per plan bin and reproduces the declared pruning verdict") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("zorder_rt").toString
    try {
      Layout.zorderExecute(spark, dir, out)

      // 1. one parquet data file per (layout, file) partition directory
      val fileDirs = Files.walk(Path.of(out)).filter(Files.isDirectory(_))
        .filter(_.getFileName.toString.startsWith("file=")).toArray
        .map(_.asInstanceOf[Path])
      assert(fileDirs.nonEmpty)
      fileDirs.foreach { d =>
        val n = Files.list(d)
          .filter(f => f.getFileName.toString.endsWith(".parquet")).count()
        assert(n == 1L, s"$d holds $n data files, want 1")
      }

      val back = spark.read.parquet(out)
        .select($"layout", $"file".cast("long").as("file"), $"u", $"v")

      // 2. each layout carries the full orders projection
      val src = graft.io.Tables.orders(spark, dir)
        .selectExpr("cast(o_custkey as long) AS u",
          "cast(datediff(to_date(o_orderdate), date '1970-01-01') as long) AS v")
        .groupBy($"u", $"v").count()
        .as[(Long, Long, Long)].collect()
        .map { case (u, v, c) => (u, v) -> c }.toMap
      Seq("zorder", "linear").foreach { lay =>
        val got = back.filter($"layout" === lay)
          .groupBy($"u", $"v").count()
          .as[(Long, Long, Long)].collect()
          .map { case (u, v, c) => (u, v) -> c }.toMap
        assert(got == src, s"$lay layout lost or duplicated rows")
      }

      // 3. pruning verdict from the REAL files equals the declared query
      val executed = back
        .groupBy($"layout", $"file")
        .agg(count(lit(1)).as("n"),
          min($"u").as("u_min"), max($"u").as("u_max"),
          min($"v").as("v_min"), max($"v").as("v_max"))
        .withColumn("hit",
          !($"u_max" < Layout.CustLo || $"u_min" > Layout.CustHi ||
            $"v_max" < Layout.DayLo || $"v_min" >= Layout.DayHi))
        .groupBy($"layout")
        .agg(count(lit(1)).as("files_nonempty"),
          sum(when($"hit", 1L).otherwise(0L)).as("files_hit"),
          sum(when($"hit", $"n").otherwise(0L)).as("rows_scanned"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val declared = Layout.zorderPrune(spark, dir)
        .select($"layout", $"files_nonempty", $"files_hit", $"rows_scanned")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(executed == declared)
    } finally deleteRec(Path.of(out))
  }
}
