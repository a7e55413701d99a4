package graft.util

/** Pure-CPU calibration probe — the bench artifact's self-certification
  * channel (docs/BENCH_NOTES.md #69/#70).
  *
  * This host throttles task wall time fleet-wide after sustained load
  * (measured: same-commit suite passes 206.8 vs 306.0 s with untouched
  * trivial queries co-moving and 22–31 s single tasks, while a CPU probe
  * run after idle showed full speed). A throttled pass is indistinguishable
  * INSIDE a bench artifact from a plan regression unless the artifact
  * carries its own speed-of-light reading — so `graft.Bench` runs this
  * probe at suite start, middle, and end and records the readings.
  *
  * The probe is a fixed-work md5 loop (the same probe shape #69 used as a
  * diagnostic), measured two ways: one thread (detects per-task wall-time
  * stretch — the throttle's task-granular signature) and all-cores-wide
  * (detects lost parallelism / steal). It deliberately uses no Spark: the
  * throttle is a host property, and a pure-JVM loop can't be confounded by
  * plan shape, GC, or listener state. The md5 instance is warmed once per
  * reading before the measured window so the probe's own JIT never counts.
  */
object CpuProbe {

  /** md5 digests per measured reading — sized so one reading is ~750 ms on
    * this host at full speed (calibrated; see RefSingleMs). Long enough a
    * window that scheduler jitter averages out (at 1.5M digests the wide
    * reading swung 1.25× run-to-run on a QUIET host; the throttle this
    * probe detects is a 3–10× signal, but the clean gate wants headroom).
    */
  val Work = 3000000

  private def burn(iters: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](64)
    var i = 0
    var acc = 0L
    while (i < iters) {
      buf(0) = (i & 0xff).toByte
      val d = md.digest(buf)
      acc += d(0)
      i += 1
    }
    acc
  }

  @volatile private var sink = 0L

  /** One single-threaded reading: min-of-2 wall ms for [[Work]] digests.
    * Min-of-2: a throttled host stays slow through BOTH windows; one-off
    * scheduling/GC-thread interference does not — the min discards the
    * same noise class the bench's own min-of-2 discards.
    */
  def singleMs(): Long = {
    sink += burn(Work / 8) // per-reading warm: JIT + cache, outside the window
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      sink += burn(Work)
      (System.nanoTime() - t0) / 1000000
    }.min
  }

  /** One wide reading: `threads` concurrent copies of the same fixed work,
    * min-of-2 wall ms for all to finish. At full speed and perfect scaling
    * this matches [[singleMs]]; steal/throttle shows as a multiple. Inside
    * a Spark-hosting JVM this channel is intrinsically noisier than the
    * single one (the 32-way barrier exposes every background thread and
    * turbo-state dip), hence its own reference and looser tolerance below.
    */
  def wideMs(threads: Int): Long = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      import scala.jdk.CollectionConverters._
      val warm = (1 to threads).map(_ =>
        (() => burn(Work / 8)): java.util.concurrent.Callable[Long])
      pool.invokeAll(warm.asJava).asScala.foreach(f => sink += f.get())
      (1 to 2).map { _ =>
        val jobs = (1 to threads).map(_ =>
          (() => burn(Work)): java.util.concurrent.Callable[Long])
        val t0 = System.nanoTime()
        pool.invokeAll(jobs.asJava).asScala.foreach(f => sink += f.get())
        (System.nanoTime() - t0) / 1000000
      }.min
    } finally pool.shutdown()
  }

  /** Memory-bandwidth channel (round 13, graduated to load-bearing in
    * round 14): a probe-clean full pass measured every query uniformly
    * ~1.4× slow while single, wide AND mini md5 readings all sat at
    * reference — the md5 loop is compute-bound and cache-resident, so it
    * cannot see the regime where the host's MEMORY BANDWIDTH is contended
    * (Spark's scans, shuffles and hash tables are exactly that bound).
    * This channel streams a shared 256 MB array with `threads` concurrent
    * sequential scanners ([[MemPasses]] full-array passes per measured
    * window = 8 GB of DRAM traffic; the quiet-host reference is the
    * MEASURED 110 ms, which implies ~73 GB/s effective bandwidth on this
    * host), min-of-2.
    *
    * The channel still does not gate `clean` (the md5 channels own the
    * 3–10× burst regime), but since round 14 it carries its own
    * three-valued verdict ([[memVerdict]]) which `Bench` uses to divert
    * bandwidth-regime gt2x false positives — the r13 driver pass named 7
    * "regressions", 7-for-7 environmental, in exactly this regime.
    */
  val MemWords: Int = 32 << 20 // 32M longs = 256 MB, far past any L3
  val MemPasses = 32 // 8 GB of traffic per window: ~110 ms measured on this
                     // quiet host (=> ~73 GB/s effective) — long enough to
                     // average scheduler jitter that dominated an 8-pass
                     // (~28 ms) window
  /** Deliberately a PERMANENT 256 MB live array (round-14 ADVICE
    * adjudication): per-reading allocate/null was considered and rejected —
    * with per-run mem readings riding the early tier (round 14), that would
    * churn ~256 MB of humongous allocations per reading straight through
    * the old gen, a bigger GC perturbation than a fixed, never-moving block
    * the heap is sized for (the bench JVM runs at -Xmx 24g per build.sbt —
    * the block is ~1% of heap; the delta is noted in BENCH_NOTES #80 for
    * round-over-round gc_ms comparability).
    */
  private lazy val memArr: Array[Long] = {
    val a = new Array[Long](MemWords)
    var i = 0
    while (i < MemWords) { a(i) = i * 0x9E3779B97F4A7C15L; i += 1 }
    a
  }

  private def memScan(lo: Int, hi: Int): Long = {
    var acc = 0L
    var p = 0
    while (p < MemPasses) {
      var i = lo
      while (i < hi) { acc += memArr(i); i += 1 }
      p += 1
    }
    acc
  }

  def memMs(threads: Int): Long = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      import scala.jdk.CollectionConverters._
      val chunk = MemWords / threads
      def jobs = (0 until threads).map { t =>
        val lo = t * chunk
        val hi = if (t == threads - 1) MemWords else lo + chunk
        (() => memScan(lo, hi)): java.util.concurrent.Callable[Long]
      }
      // one warm pass: faults the array in / populates TLBs outside the window
      pool.invokeAll(jobs.asJava).asScala.foreach(f => sink += f.get())
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        pool.invokeAll(jobs.asJava).asScala.foreach(f => sink += f.get())
        (System.nanoTime() - t0) / 1000000
      }.min
    } finally pool.shutdown()
  }

  /** One labeled probe reading (single + wide md5, wide memory stream). */
  case class Reading(label: String, singleMs: Long, wideMs: Long, memMs: Long)

  def read(label: String, threads: Int): Reading =
    Reading(label, singleMs(), wideMs(threads), memMs(threads))

  /** Quiet-host, IN-SITU reference readings for THIS container's CPU —
    * measured inside a Spark-hosting Bench JVM, the exact condition the
    * probe runs in (round-12 calibration: bare JVM single 696–789 /
    * wide 873–945; inside the Bench JVM single 760–832 / wide 1102–1574
    * across a full 254-query sf0.01 pass — the single channel shifts ~6%,
    * the wide channel inflates 1.2–1.7× and swings, because the 32-way
    * barrier exposes Spark's background threads and post-load turbo dips).
    *
    * `clean` flags a pass as certified only when every reading is within
    * its channel tolerance of these refs AND the pass's own max/min drift
    * is within the same tolerance — a pass throttled uniformly from its
    * first query (low drift, high absolute) still self-reports. Channel
    * roles: the SINGLE channel is the precise gate (the documented
    * throttle stretches individual task wall time 3–10×, BENCH_NOTES #69 —
    * a 1.5× ceiling separates that from the ≤1.13× natural drift with
    * headroom on both sides); the WIDE channel is the coarse
    * steal-detector (tolerance 2.0 accommodates its in-situ noise while
    * still catching a host that has lost real cores).
    */
  private def envMs(name: String, default: Long): Long =
    sys.env.get(name).flatMap(_.toLongOption).getOrElse(default)
  val RefSingleMs = envMs("SPARK_GRAFT_PROBE_REF_SINGLE_MS", 795L)
  val RefWideMs = envMs("SPARK_GRAFT_PROBE_REF_WIDE_MS", 1200L)
  /** Where the references came from: the built-in constants are calibrated
    * for THIS 32-vCPU container only — on any other host they'd mislabel a
    * merely-different machine as throttled (or a throttled one as clean).
    * The artifact records the source plus the host's core count so a
    * foreign-host reading is distinguishable from a dirty one; a foreign
    * host overrides via SPARK_GRAFT_PROBE_REF_{SINGLE,WIDE}_MS after its
    * own `CpuProbe.main` calibration.
    */
  val RefSource: String =
    if (sys.env.contains("SPARK_GRAFT_PROBE_REF_SINGLE_MS") ||
        sys.env.contains("SPARK_GRAFT_PROBE_REF_WIDE_MS")) "env" else "builtin"
  val HostCpus: Int = Runtime.getRuntime.availableProcessors
  val ToleranceSingle = 1.5
  val ToleranceWide = 2.0

  /** Per-run mini probe (BENCH_NOTES #76): the 3-point pass probe certifies
    * the PASS but cannot see a mid-suite throttle burst between its samples
    * (the round-12 driver artifact was probe-clean while x_triangles ran
    * 21.7 s from exactly such a burst). This is the same single-thread md5
    * channel at 1/8 the work (~100 ms at full speed) so it can ride before
    * and after individual measured runs, outside their windows. min-of-2
    * discards one-off scheduler/GC-thread interference exactly like the
    * full reading; the throttle it detects is a 3–10× signal against a
    * ≤1.13× natural drift, so the looser 1.75 tolerance (short windows
    * jitter more than 750 ms ones) still separates with headroom.
    */
  val MiniWork: Int = Work / 8
  def RefMiniMs: Long = math.max(1L, RefSingleMs / 8)
  val ToleranceMini = 1.75

  /** Quiet-host reference for the memory-bandwidth channel (see [[memMs]];
    * env-overridable like the md5 refs). Calibrated in-situ round 13.
    */
  val RefMemMs = envMs("SPARK_GRAFT_PROBE_REF_MEM_MS", 110L)

  /** Band edges for [[memVerdict]], from the round-13 in-artifact
    * calibration (BENCH_NOTES #77/#79 + the r13 driver pass, the worked
    * example this graduation exists for): every QUIET reading on record is
    * 75–87 ms (0.68–0.79× of RefMemMs=110); induced bandwidth contention
    * read 155–225 ms (#77); the exogenous storm 1102–1217 ms (#79); and
    * the r13 driver pass — median query ratio 1.142, 7 false gt2x names —
    * read 79/80/148: its WORST reading is only 1.345×, under the 1.5×
    * edge first suggested, so a 1.5× absolute-only rule would have
    * certified the exact pass this verdict must catch. Hence two terms,
    * mirroring the md5 `clean()` design:
    *  - absolute: 1.3× (143 ms) — 1.64× headroom above the observed quiet
    *    maximum (87 ms), and below the mildest contended reading on
    *    record (148 ms);
    *  - drift: max/min ≤ 1.3 within the pass — the r13 driver pass's
    *    signature was the regime ARRIVING mid-pass (79 → 148, a 1.87×
    *    drift), visible even when the absolute max sits near the edge.
    * The dirty edge (5×) separates the storm regime (10–14×) from mere
    * contention (1.4–2×) with two-sided headroom.
    */
  val ToleranceMem = 1.3
  val MemDirtyFactor = 5.0

  /** Three-valued verdict over a pass's mem readings — the graduation the
    * round-13 verdict ordered. "clean": every reading within
    * [[ToleranceMem]]× of [[RefMemMs]] AND within-pass drift ≤
    * [[ToleranceMem]] — the md5-certified numbers are bandwidth-trustworthy
    * too. "elevated": the contention regime (uniform ~1.2–2× query
    * inflation); absolute times are inflated and sub-3× baseline ratios
    * are regime, not regression (Bench diverts them to `gt2x_regime`).
    * "dirty": a reading past 5× — the storm regime; nothing measured under
    * it is usable.
    */
  def memVerdict(rs: Seq[Reading]): String =
    if (rs.isEmpty) "unknown"
    else {
      val ms = rs.map(_.memMs.toDouble)
      if (ms.max > RefMemMs * MemDirtyFactor) "dirty"
      else if (ms.max <= RefMemMs * ToleranceMem &&
        ms.max / ms.min <= ToleranceMem) "clean"
      else "elevated"
    }

  /** Is a single mem reading elevated (per-run attribution for the early
    * tier — observational at run granularity; the pass-level [[memVerdict]]
    * is what gates). -1 (not probed) is never elevated.
    */
  def memHot(ms: Long): Boolean = ms > RefMemMs * ToleranceMem

  def miniMs(): Long = {
    sink += burn(MiniWork / 4) // warm outside the window
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      sink += burn(MiniWork)
      (System.nanoTime() - t0) / 1000000
    }.min
  }

  /** Is a mini reading "hot" — evidence the host was throttled at that
    * instant? -1 (not probed) is never hot.
    */
  def miniHot(ms: Long): Boolean = ms > RefMiniMs * ToleranceMini

  /** Thread count the wide reference was calibrated at — the probe always
    * runs this wide regardless of Spark's parallelism setting: it measures
    * the HOST (this container is fixed at 32 vCPUs), not the session.
    */
  val RefThreads = 32

  def clean(rs: Seq[Reading]): Boolean = rs.nonEmpty && {
    val s = rs.map(_.singleMs.toDouble)
    val w = rs.map(_.wideMs.toDouble)
    s.max / s.min <= ToleranceSingle && w.max / w.min <= ToleranceWide &&
      s.max <= RefSingleMs * ToleranceSingle &&
      w.max <= RefWideMs * ToleranceWide
  }

  /** Calibration scratch: print a few readings to (re)derive the Ref
    * constants on a quiet host. Not part of any declared surface.
    */
  def main(args: Array[String]): Unit = {
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = args.headOption.map(_.toInt).getOrElse(3)
    (1 to n).foreach { i =>
      val r = read(s"cal$i", threads)
      println(s"reading $i: single=${r.singleMs} ms wide=${r.wideMs} ms " +
        s"mem=${r.memMs} ms")
    }
  }
}
