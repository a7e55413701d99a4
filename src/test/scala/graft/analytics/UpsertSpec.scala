package graft.analytics

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("applyChanges keeps highest version per key; new keys insert") {
    val base = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "version")
    val changes = Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "version")
    val got = Upsert.applyChanges(base, changes, "id", "version", "id")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 2L)))
  }

  test("equal versions resolve by the tie-break column, deterministically") {
    val base = Seq((1L, "old", 1L, 10L)).toDF("id", "v", "version", "seq")
    val changes = Seq((1L, "new", 1L, 20L)).toDF("id", "v", "version", "seq")
    val got = Upsert.applyChanges(base, changes, "id", "version", "seq")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "new", 1L, 20L)))
  }
}
