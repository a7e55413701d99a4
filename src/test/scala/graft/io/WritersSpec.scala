package graft.io

import java.nio.file.Files

import graft.SparkSpec

class WritersSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString + "/out"

  private val rows = Seq(
    (1L, "alpha", 1.5, "2024-01-01"),
    (2L, "beta", 2.5, "2024-01-01"),
    (3L, "gamma", 3.5, "2024-01-02"))
  private def df = rows.toDF("id", "name", "v", "ds")

  test("ORC round-trip preserves rows and types, partitioned by ds") {
    val path = tmp("orc")
    Writers.writeOrc(df, path, Seq("ds"))
    val back = Writers.readOrc(spark, path)
      .select($"id", $"name", $"v", $"ds").as[(Long, String, Double, String)]
    assert(back.collect().sorted.toSeq == rows.sorted)
    // partition directories exist → downstream readers can prune on ds
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("ds="))
    assert(dirs.toSet == Set("ds=2024-01-01", "ds=2024-01-02"))
  }

  test("CSV round-trip with explicit schema preserves rows") {
    val path = tmp("csv")
    Writers.writeCsv(df, path, Seq("ds"))
    val back = Writers.readCsv(spark, path, df.schema)
      .select($"id", $"name", $"v", $"ds").as[(Long, String, Double, String)]
    assert(back.collect().sorted.toSeq == rows.sorted)
  }

  test("JSONL round-trip with explicit schema preserves rows") {
    val path = tmp("jsonl")
    Writers.writeJsonl(df, path)
    val back = Writers.readJsonl(spark, path, df.schema)
      .select($"id", $"name", $"v", $"ds").as[(Long, String, Double, String)]
    assert(back.collect().sorted.toSeq == rows.sorted)
  }

  test("readEvolved merges added columns across schema versions, nulls backfill") {
    val path = tmp("evolve")
    // v1 files: (id, name); later ingest code adds a quality column
    Seq((1L, "old")).toDF("id", "name")
      .write.mode("append").parquet(path)
    Seq((2L, "new", 0.9)).toDF("id", "name", "quality")
      .write.mode("append").parquet(path)
    val back = Writers.readEvolved(spark, path)
    assert(back.columns.sorted.toSeq == Seq("id", "name", "quality"))
    val rows = back.select($"id", $"name", $"quality")
      .as[(Long, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "old", None), (2L, "new", Some(0.9))))
  }

  test("dynamic overwrite replaces only the rewritten partition") {
    val path = tmp("dyn")
    Writers.writeOrc(df, path, Seq("ds"))
    // rewrite ds=2024-01-02 with different content; 01-01 must survive
    Writers.writeOrc(Seq((9L, "delta", 9.5, "2024-01-02")).toDF("id", "name", "v", "ds"),
      path, Seq("ds"))
    val back = Writers.readOrc(spark, path)
      .select($"id", $"name", $"v", $"ds").as[(Long, String, Double, String)]
    assert(back.collect().sorted.toSeq ==
      Seq((1L, "alpha", 1.5, "2024-01-01"), (2L, "beta", 2.5, "2024-01-01"),
        (9L, "delta", 9.5, "2024-01-02")))
  }
}
