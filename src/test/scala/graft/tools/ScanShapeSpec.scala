package graft.tools

import graft.SparkSpec

/** Pins the round-14 scan-dedup fixes (BENCH_NOTES #83): each query's
  * FINAL adaptive plan must not contain identical duplicate FileScans —
  * the class where the corpus is read twice for one answer. Catalyst
  * splits shared subtrees through three different rules (group-key filter
  * pushdown, column pruning, aggregate pushdown), so each fix used a
  * different tool and a regression can come back through any of them; the
  * executed-plan check catches all three. The substrate-materializing
  * queries (pmi, hll) trivially pass in-plan — their one corpus pass runs
  * at frame construction into a checkpoint — which is exactly the
  * contract: no scan duplication visible anywhere downstream.
  */
class ScanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect() // finalize THIS frame's adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("x_tfidf: df derives from tf — one tokenize pass, no duplicate scan") {
    assert(ScanAudit.duplicateScans(finalPlan("x_tfidf")).isEmpty)
  }

  test("x_pmi_pairs: tagged one-pass aggregate — no duplicate scan") {
    assert(ScanAudit.duplicateScans(finalPlan("x_pmi_pairs")).isEmpty)
  }

  test("x_hll_merge: shared distinct substrate — no duplicate scan") {
    assert(ScanAudit.duplicateScans(finalPlan("x_hll_merge")).isEmpty)
  }

  test("x_heavy_hitters: exactly the ONE inherent duplicate (sketch pass " +
    "+ candidate-only exact rescan) — fused aggregates must not split " +
    "back into a third scan") {
    val dups = ScanAudit.duplicateScans(finalPlan("x_heavy_hitters"))
    assert(dups.size == 1 && dups.head.startsWith("x2:"),
      s"expected the single inherent x2 text scan; got: $dups")
  }

  test("duplicateScans: counts only the Final Plan section (the Initial " +
    "Plan an executed AdaptiveSparkPlan prints would double-count " +
    "every scan)") {
    val plan =
      """AdaptiveSparkPlan isFinalPlan=true
        |+- == Final Plan ==
        |   +- FileScan parquet [a#1L] Batched: true, x
        |+- == Initial Plan ==
        |   +- FileScan parquet [a#2L] Batched: true, x""".stripMargin
    assert(ScanAudit.duplicateScans(plan).isEmpty)
    val dup =
      """+- FileScan parquet [a#1L] Batched: true, x
        |+- FileScan parquet [a#7L] Batched: true, x""".stripMargin
    assert(ScanAudit.duplicateScans(dup).size == 1)
  }
}
