package graft.tools

import graft.SparkSpec

/** Runs each scale-stress scenario's FULL code path at smoke size, so the
  * scale harness itself lives under the `sbt test` gate — a broken
  * generator, a renamed seam, or a drifted invariant fails CI instead of
  * being discovered mid-round when the 200k+ runs are launched. The
  * invariants are size-independent by construction (every scenario derives
  * its expectation from n), so "small n passes" genuinely exercises the
  * same assertions the big runs make.
  */
class StressSmokeSpec extends SparkSpec {

  test("heavy-hitters scenario recovers all 10 planted hot tokens at smoke size") {
    assert(Stress.runHeavyHitters(spark, 5000L))
  }

  test("ivfpq scenario holds the reconstruction-floor invariant at smoke size") {
    assert(Stress.runIvfPq(spark, 4000L))
  }

  test("multiprobe scenario recovers every planted twin at smoke size") {
    assert(Stress.runMultiprobe(spark, 4000L))
  }

  test("ppjoin scenario recovers every planted intra-group pair at smoke size") {
    assert(Stress.runPpjoin(spark, 2000L))
  }

  test("sketches scenario: HLL inside 4-sigma, bitmap popcounts exact at smoke size") {
    assert(Stress.runSketches(spark, 20000L))
  }
}
