package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Per-file (min, max) of a column, computed from the written files
    * themselves — exactly the stats a pruning reader consults (row group ≈
    * file at this size).
    */
  private def fileStats(dir: String, c: String): Seq[(Long, Long)] = {
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    files.toSeq.map { f =>
      spark.read.parquet(f)
        .agg(min(col(c)).cast("long"), max(col(c)).cast("long"))
        .as[(Long, Long)].collect().head
    }
  }

  private def overlaps(stats: Seq[((Long, Long), (Long, Long))],
      box: ((Long, Long), (Long, Long))): Int =
    stats.count { case ((mnx, mxx), (mny, mxy)) =>
      mxx >= box._1._1 && mnx <= box._1._2 && mxy >= box._2._1 && mny <= box._2._2
    }

  test("zValue interleaves bits monotonically within a row-major cell") {
    val z00 = Layout.zValue(lit(0L), lit(0L))
    val z10 = Layout.zValue(lit(1L), lit(0L))
    val z01 = Layout.zValue(lit(0L), lit(1L))
    val z11 = Layout.zValue(lit(3L), lit(3L))
    val got = spark.range(1).select(z00, z10, z01, z11).as[(Long, Long, Long, Long)]
      .collect().head
    assert(got == ((0L, 1L, 2L, 15L)))
  }

  test("quantize stays monotone and in-range on wide (overflow-prone) domains") {
    // span ~9.2e18 — the old long multiply (v-mn)*65535 wraps negative here
    val mn = 0L
    val mx = Long.MaxValue - 1
    val vs = Seq(0L, 1L << 20, 1L << 40, 1L << 55, 1L << 62, Long.MaxValue - 1)
    val got = vs.toDF("v")
      .select(Layout.quantize($"v", lit(mn), lit(mx)).as("q"))
      .as[Long].collect().toSeq
    assert(got == got.sorted, s"non-monotone: $got")
    assert(got.forall(q => q >= 0L && q < (1L << 16)), s"out of range: $got")
    assert(got.head == 0L && got.last == (1L << 16) - 1)
    // and the narrow-domain behavior is unchanged (exact integer division)
    val narrow = Seq(0L, 1L, 500L, 999L, 1000L).toDF("v")
      .select(Layout.quantize($"v", lit(0L), lit(1000L)).as("q"))
      .as[Long].collect().toSeq
    assert(narrow == Seq(0L, 1L, 500L, 999L, 1000L).map(v => v * 65535L / 1000L))
  }

  test("a 2-D box predicate overlaps fewer z-ordered files than linear files") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val zdir = "/tmp/layout_z"
    val ldir = "/tmp/layout_linear"
    // 64 files, not 16: the margin must survive range-partitioner boundary
    // straddle (sampled bounds shift run-to-run). Linear hits ~nFiles/8 = 8
    // files on its sort axis; the z box is ~1/64 of rows ≈ 1-2 files — a
    // strict win even when both straddle a boundary.
    val nFiles = 64
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", zdir, nFiles)
    Layout.linearWrite(li, "l_partkey", ldir, nFiles)

    def stats(dir: String) =
      fileStats(dir, "l_partkey").zip(fileStats(dir, "l_suppkey"))
    // ~1/8 of each axis: selective on BOTH dims — the case where linear
    // layout prunes on its sort axis only and overlaps everything on the
    // other.
    val (maxP, maxS) = li.agg(max($"l_partkey"), max($"l_suppkey"))
      .as[(Long, Long)].collect().head
    val box = ((1L, maxP / 8), (1L, maxS / 8))
    val zHit = overlaps(stats(zdir), box)
    val lHit = overlaps(stats(ldir), box)
    assert(zHit < lHit,
      s"z-order hit $zHit of $nFiles files vs linear $lHit — no pruning win")
    // And both layouts return identical data for the box.
    def boxCount(dir: String) = spark.read.parquet(dir)
      .filter($"l_partkey".between(box._1._1, box._1._2) &&
        $"l_suppkey".between(box._2._1, box._2._2)).count()
    assert(boxCount(zdir) == boxCount(ldir))
  }
}
