package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Writers
import graft.llm.CorpusFilter

/** End-to-end curation path over the real sf0.001 fixture: the composed
  * retention filter feeds a partitioned ORC sink and the sink reads back
  * intact — the full corpus-curation loop (filter → write → serve) through
  * the same operators the declared queries gate.
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("quality filter output round-trips through a lang-partitioned ORC sink") {
    val out = Files.createTempDirectory("curated").toString + "/corpus"
    val retained = CorpusFilter.qualityFilter(spark, "/root/testdata/sf0.001")
    val expected = retained.as[(Long, String, String, Long)].collect().toSet
    assert(expected.nonEmpty, "retention filter kept nothing at sf0.001")

    Writers.writeOrc(retained, out, Seq("lang"))
    val back = Writers.readOrc(spark, out)
      .select($"doc_id", $"lang", $"pred_lang", $"n_tokens")
      .as[(Long, String, String, Long)].collect().toSet
    assert(back == expected)

    // partition pruning surface: only the written langs appear as dirs
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(dirs == expected.map(r => s"lang=${r._2}"))
  }
}
