package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.Bench
import graft.Bench.Run

/** Pins the per-run throttle-attribution triage (BENCH_NOTES #76): the
  * round-12 driver pass was probe-clean at pass granularity yet measured
  * x_triangles at 21.7 s through a mid-suite throttle burst (judge-verified:
  * same plan 9.1 s on a hot host, 1.05 s cooled). The triage must flag that
  * exact shape — uniform task slowdown + flat GC/JIT + >=2x baseline — and
  * must NOT flag the shapes the existing channels already explain
  * (straggler, GC pause, JIT storm) or micro-query noise.
  */
class BenchTriageSpec extends AnyFunSuite {

  private val hotMs: Long = (CpuProbe.RefMiniMs * CpuProbe.ToleranceMini).toLong + 1
  private val coolMs: Long = CpuProbe.RefMiniMs

  // The round-12 x_triangles burst run, verbatim: 21.7 s wall, 32 tasks
  // uniformly ~7.7 s (sum 246.4 s, max 7.7 s), flat GC/JIT, baseline 2.26.
  private def burstRun(pb: Long = -1, pa: Long = -1): Run =
    Run(secs = 21.7, gcMs = 400, jitMs = 300, maxTaskMs = 7700,
      tasks = 32, taskSumMs = 246400, probeBeforeMs = pb, probeAfterMs = pa)

  test("the round-12 burst signature is suspect on the heuristic alone") {
    assert(Bench.suspectRun(burstRun(), Some(2.26)))
  }

  test("a hot mini-probe reading next to a SLOW run is suspect regardless " +
    "of run shape") {
    // straggler shape (max >> mean task) that the heuristic would pass,
    // but the probe saw the host throttled just outside the window and the
    // run came out 4x its baseline
    val straggler = Run(4.0, 100, 100, 3500, 32, 4400, hotMs, -1)
    assert(Bench.suspectRun(straggler, Some(1.0)))
    val hotAfter = Run(4.0, 100, 100, 3500, 32, 4400, -1, hotMs)
    assert(Bench.suspectRun(hotAfter, Some(1.0)))
  }

  test("a hot probe next to a FAST run is NOT suspect (round-13 ADVICE: " +
    "a fast run evidently wasn't throttled; excluding it would discard " +
    "the best sample and bias the min-tier headline upward)") {
    // at baseline — under the 1.5x slow edge
    val fast = Run(1.0, 100, 100, 200, 32, 3000, hotMs, hotMs)
    assert(!Bench.suspectRun(fast, Some(1.0)))
    // no baseline, but the fastest sibling says this run was the fast one
    assert(!Bench.suspectRun(fast, None, Some(1.2)))
  }

  test("probe-hot slow edge: baseline preferred, sibling fallback, " +
    "unconditional with neither") {
    val r = Run(3.0, 100, 100, 200, 32, 9000, hotMs, -1)
    assert(Bench.suspectRun(r, Some(1.0)))        // 3x baseline: slow
    assert(!Bench.suspectRun(r, Some(2.5)))       // 1.2x baseline: fast
    assert(Bench.suspectRun(r, None, Some(1.0)))  // 3x sibling: slow
    assert(!Bench.suspectRun(r, None, Some(2.5))) // 1.2x sibling: fast
    // no reference at all: the probe keeps its original authority
    assert(Bench.suspectRun(r, None, None))
    // a failed (-1) baseline/sibling entry is no reference
    assert(Bench.suspectRun(r, Some(0.0), None))
  }

  // --- per-run mem gate (round 15; round-14 verdict #1): the bandwidth
  // channel gets the SAME suspect rule as the md5 mini — hot reading next
  // to a ≥1.5×-slow run excludes it from the chosen stat. Calibration: the
  // r14 driver pass read pass-level mem-clean (83-95 ms at its 3 sample
  // points) while x_cms_freq benched 3.63 s vs ≤0.89 clean with 151-410 ms
  // run-level mem readings — per-run evidence, per-run gate.

  private val memHotMs: Long =
    (CpuProbe.RefMemMs * CpuProbe.ToleranceMem).toLong + 1
  private val memCoolMs: Long = CpuProbe.RefMemMs

  test("a hot mem reading next to a SLOW run is suspect (either side), " +
    "exactly like the md5 mini channel") {
    val slow = Run(4.0, 100, 100, 3500, 32, 4400, coolMs, coolMs,
      memBeforeMs = memHotMs, memAfterMs = -1)
    assert(Bench.suspectRun(slow, Some(1.0)))
    val hotAfter = Run(4.0, 100, 100, 3500, 32, 4400, coolMs, coolMs,
      memBeforeMs = -1, memAfterMs = memHotMs)
    assert(Bench.suspectRun(hotAfter, Some(1.0)))
  }

  test("a hot mem reading next to a FAST run is NOT suspect (same " +
    "round-13-ADVICE guard as the md5 channel: don't discard best samples)") {
    val fast = Run(1.0, 100, 100, 200, 32, 3000, coolMs, coolMs,
      memBeforeMs = memHotMs, memAfterMs = memHotMs)
    assert(!Bench.suspectRun(fast, Some(1.0)))
    assert(!Bench.suspectRun(fast, None, Some(1.2)))
  }

  test("mem-hot slow edge mirrors the mini channel: baseline preferred, " +
    "sibling fallback, unconditional with neither") {
    val r = Run(3.0, 100, 100, 200, 32, 9000, coolMs, coolMs,
      memBeforeMs = memHotMs, memAfterMs = -1)
    assert(Bench.suspectRun(r, Some(1.0)))
    assert(!Bench.suspectRun(r, Some(2.5)))
    assert(Bench.suspectRun(r, None, Some(1.0)))
    assert(!Bench.suspectRun(r, None, Some(2.5)))
    assert(Bench.suspectRun(r, None, None))
  }

  test("cool or unprobed (-1) mem readings never make a run suspect") {
    val r = Run(4.0, 100, 100, 3500, 32, 4400, coolMs, coolMs,
      memBeforeMs = memCoolMs, memAfterMs = -1)
    assert(!Bench.suspectRun(r, Some(1.0)))
    val unprobed = Run(4.0, 100, 100, 3500, 32, 4400, coolMs, coolMs)
    assert(!Bench.suspectRun(unprobed, Some(1.0)))
  }

  test("a cool probed run with a straggler is NOT suspect") {
    // one 3.5 s task over a 4.4 s task sum: a straggler, not a burst —
    // max_task attribution already explains it
    val straggler = Run(4.0, 100, 100, 3500, 32, 4400, coolMs, coolMs)
    assert(!Bench.suspectRun(straggler, Some(1.0)))
  }

  test("unprobed (-1) readings are never hot") {
    assert(!CpuProbe.miniHot(-1L))
    assert(!CpuProbe.miniHot(coolMs))
    assert(CpuProbe.miniHot(hotMs))
  }

  test("a GC-dominated slow run is NOT suspect (the gc channel owns it)") {
    val gcHeavy = burstRun().copy(gcMs = 5000, jitMs = 0)
    assert(!Bench.suspectRun(gcHeavy, Some(2.26)))
  }

  test("a JIT-storm slow run is NOT suspect (the jit channel owns it)") {
    val jitHeavy = burstRun().copy(gcMs = 0, jitMs = 5000)
    assert(!Bench.suspectRun(jitHeavy, Some(2.26)))
  }

  test("heuristic needs a baseline: uniform-slow without one stays clean") {
    assert(!Bench.suspectRun(burstRun(), None))
    assert(!Bench.suspectRun(burstRun(), Some(0.0))) // failed baseline entry
  }

  test("a run within 2x of baseline is NOT suspect however uniform") {
    assert(!Bench.suspectRun(burstRun(), Some(15.0)))
  }

  test("a driver-side-dominated slow run is NOT suspect (tiny task sums " +
    "stay eligible for gt2x as real regressions)") {
    // wall 3 s at 2x baseline, but only 0.4 s of summed task time: the
    // executors were idle — whatever is slow, it isn't a fleet-wide
    // throttle stretching task walls
    val driverBound = Run(3.0, 50, 50, 40, 12, 420, -1, -1)
    assert(!Bench.suspectRun(driverBound, Some(1.2)))
  }

  test("micro-query guards: < 8 tasks or < 1 s wall never trip the heuristic") {
    assert(!Bench.suspectRun(burstRun().copy(tasks = 4, taskSumMs = 30800),
      Some(2.26)))
    val micro = Run(0.6, 0, 0, 18, 32, 576, -1, -1)
    assert(!Bench.suspectRun(micro, Some(0.2)))
  }

  test("a failed run (secs < 0) is never suspect, even probe-hot") {
    assert(!Bench.suspectRun(
      Run(-1.0, 0, 0, 0, 0, 0, hotMs, hotMs), Some(1.0)))
  }

  test("chooseStat: min tier takes the min, noisy tier the median") {
    assert(Bench.chooseStat(noisy = false, Seq(3.0, 1.5, 2.0)) == 1.5)
    assert(Bench.chooseStat(noisy = true, Seq(3.0, 1.5, 2.0)) == 2.0)
  }

  test("chooseStat: even-sized noisy sample takes the midpoint (a suspect " +
    "run excluded from median3 must not silently report the max)") {
    assert(Bench.chooseStat(noisy = true, Seq(1.0, 3.0)) == 2.0)
    assert(Bench.chooseStat(noisy = true, Seq(4.0, 1.0, 3.0, 2.0)) == 2.5)
  }

  test("chooseStat: empty sample reports failure (-1)") {
    assert(Bench.chooseStat(noisy = true, Seq.empty) == -1.0)
    assert(Bench.chooseStat(noisy = false, Seq.empty) == -1.0)
  }

  test("mini probe measures and the refs/fingerprint are coherent") {
    val ms = CpuProbe.miniMs()
    assert(ms > 0)
    assert(CpuProbe.RefMiniMs == math.max(1L, CpuProbe.RefSingleMs / 8))
    assert(Set("builtin", "env").contains(CpuProbe.RefSource))
    assert(CpuProbe.HostCpus > 0)
  }

  test("memory-bandwidth channel measures (observational, non-gating)") {
    val ms = CpuProbe.memMs(4)
    assert(ms > 0)
    assert(CpuProbe.RefMemMs > 0)
  }

  // --- pass-level clean() gate boundaries (previously smoke-covered only)

  private def rd(single: Long, wide: Long): CpuProbe.Reading =
    CpuProbe.Reading("t", single, wide, memMs = 100)

  test("clean(): readings at the references certify") {
    val rs = Seq(rd(CpuProbe.RefSingleMs, CpuProbe.RefWideMs),
      rd(CpuProbe.RefSingleMs, CpuProbe.RefWideMs))
    assert(CpuProbe.clean(rs))
  }

  test("clean(): one reading past its absolute ceiling fails the pass " +
    "(uniform throttle from query one has low drift but high absolutes)") {
    val hotSingle = (CpuProbe.RefSingleMs * CpuProbe.ToleranceSingle).toLong + 1
    assert(!CpuProbe.clean(Seq(rd(hotSingle, CpuProbe.RefWideMs))))
    val hotWide = (CpuProbe.RefWideMs * CpuProbe.ToleranceWide).toLong + 1
    assert(!CpuProbe.clean(Seq(rd(CpuProbe.RefSingleMs, hotWide))))
  }

  test("clean(): within-pass drift past tolerance fails even under the " +
    "absolute ceilings") {
    // both readings individually under the single ceiling, but the pass
    // drifted more than ToleranceSingle between them
    val lo = 500L
    val hi = (lo * CpuProbe.ToleranceSingle).toLong + 10
    assert(hi <= CpuProbe.RefSingleMs * CpuProbe.ToleranceSingle)
    assert(!CpuProbe.clean(Seq(rd(lo, CpuProbe.RefWideMs),
      rd(hi, CpuProbe.RefWideMs))))
  }

  test("clean(): no readings can never certify") {
    assert(!CpuProbe.clean(Seq.empty))
  }

  test("clean(): the mem channel does not gate clean() — it carries its " +
    "own three-valued verdict (memVerdict) instead") {
    val r = CpuProbe.Reading("t", CpuProbe.RefSingleMs, CpuProbe.RefWideMs,
      memMs = CpuProbe.RefMemMs * 10)
    assert(CpuProbe.clean(Seq(r)))
  }

  // --- memVerdict band edges (round-14 graduation, round-13 verdict #1)

  private def mem(ms: Long*): Seq[CpuProbe.Reading] =
    ms.map(m => CpuProbe.Reading("t", CpuProbe.RefSingleMs,
      CpuProbe.RefWideMs, memMs = m))

  test("memVerdict: every quiet reading on record is clean (75-87 ms)") {
    assert(CpuProbe.memVerdict(mem(75, 80, 87)) == "clean")
    assert(CpuProbe.memVerdict(mem(CpuProbe.RefMemMs)) == "clean")
  }

  test("memVerdict: the r13 driver pass (79/80/148 — 7 false gt2x names) " +
    "is elevated, the worked example this verdict exists to catch") {
    assert(CpuProbe.memVerdict(mem(79, 80, 148)) == "elevated")
  }

  test("memVerdict: induced-contention readings (155-225, BENCH_NOTES " +
    "#77) are elevated on the absolute edge alone") {
    assert(CpuProbe.memVerdict(mem(155, 225)) == "elevated")
    assert(CpuProbe.memVerdict(mem(160)) == "elevated")
  }

  test("memVerdict: drift term — readings individually under the absolute " +
    "edge but drifting past tolerance within the pass are elevated " +
    "(the regime arriving mid-pass, the r13 signature)") {
    val edge = (CpuProbe.RefMemMs * CpuProbe.ToleranceMem).toLong // 143
    assert(CpuProbe.memVerdict(mem(80, edge)) == "elevated") // 1.79x drift
    assert(CpuProbe.memVerdict(mem(edge, edge)) == "clean")  // no drift
  }

  test("memVerdict: the exogenous storm regime (1102-1217, BENCH_NOTES " +
    "#79) is dirty") {
    assert(CpuProbe.memVerdict(mem(80, 80, 1102)) == "dirty")
  }

  test("memVerdict: no readings is unknown, never clean") {
    assert(CpuProbe.memVerdict(Seq.empty) == "unknown")
  }

  test("regimeDivert: pass-level tier — non-clean pass verdict diverts " +
    "only sub-3x entries (the uniform regime can't produce more)") {
    assert(Bench.regimeDivert("elevated", 2.5, queryMemHot = false))
    assert(!Bench.regimeDivert("elevated", 3.5, queryMemHot = false))
    assert(Bench.regimeDivert("dirty", 2.9, queryMemHot = false))
    assert(!Bench.regimeDivert("clean", 2.5, queryMemHot = false))
  }

  test("regimeDivert: per-query tier — run-level mem-hot evidence diverts " +
    "with NO ratio ceiling (the intermittent regime taxes sub-second " +
    "queries 3-4.5x while the 3-point pass probe reads clean)") {
    assert(Bench.regimeDivert("clean", 4.5, queryMemHot = true))
    assert(Bench.regimeDivert("clean", 2.1, queryMemHot = true))
    assert(!Bench.regimeDivert("clean", 2.1, queryMemHot = false))
  }

  test("memHot: per-run mem attribution uses the same clean edge; " +
    "-1 (not probed) is never hot") {
    assert(!CpuProbe.memHot(-1L))
    assert(!CpuProbe.memHot(CpuProbe.RefMemMs))
    assert(CpuProbe.memHot(
      (CpuProbe.RefMemMs * CpuProbe.ToleranceMem).toLong + 1))
  }
}
