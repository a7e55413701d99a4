package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  /** Reference-shaped users payload (FIXTURES.md B1: the 11-column fake-users
    * API response stored raw then parsed with inferred schema).
    */
  private val usersJson =
    """[{"id": 1, "name": "Ada Example", "company": "Acme", "username": "ada",
      |  "email": "ada@example.com", "address": "1 Main St", "zip": "70000",
      |  "state": "HCM", "country": "VN", "phone": "+84-000-0000", "photo": "p1"},
      | {"id": 2, "name": "Bob Sample", "company": "Beta", "username": "bob",
      |  "email": "bob@example.com", "address": "2 Main St", "zip": "70001",
      |  "state": "HN", "country": "VN", "phone": "+84-000-0001", "photo": "p2"}]"""
      .stripMargin

  test("fromJsonPayload parses an array-of-records payload with inferred schema") {
    val df = Ingest.fromJsonPayload(spark, usersJson)
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("address", "company", "country", "email",
      "id", "name", "phone", "photo", "state", "username", "zip"))
    assert(df.schema("id").dataType.typeName == "long") // pandas-style split: id numeric
    assert(df.filter($"username" === "ada").count() == 1)
  }

  test("fromJsonPayload parses NDJSON with one record per line (no silent drop)") {
    val ndjson = "{\"a\": 1}\n{\"a\": 2}\n\n{\"a\": 3}"
    val df = Ingest.fromJsonPayload(spark, ndjson)
    assert(df.count() == 3)
    assert(df.select($"a").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("writeRawZone overwrites only the written date partition") {
    val root = java.nio.file.Files.createTempDirectory("rawzone").toString + "/raw"
    val day1 = Seq((1L, "a")).toDF("id", "v")
    val day2 = Seq((2L, "b")).toDF("id", "v")
    Ingest.writeRawZone(day1, root, "2024-01-01")
    Ingest.writeRawZone(day2, root, "2024-01-02")
    // overwrite day1 with new content; day2 must survive (dynamic overwrite)
    Ingest.writeRawZone(Seq((3L, "c")).toDF("id", "v"), root, "2024-01-01")
    val all = spark.read.parquet(root)
    assert(all.count() == 2)
    assert(all.filter($"ds" === "2024-01-01").select($"id").as[Long].head() == 3L)
    assert(all.filter($"ds" === "2024-01-02").select($"id").as[Long].head() == 2L)
  }

  test("csv_replay_limit envelope is one JSON object per row") {
    val df = Ingest.csvReplayLimit(spark, "/root/testdata/sf0.001")
    val rows = df.as[(Long, String)].collect()
    assert(rows.length == 100)
    assert(rows.forall { case (_, v) => v.startsWith("{") && v.contains("\"event_id\"") })
  }
}
