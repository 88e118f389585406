package graft.bench

/** Self-attributing bench sanity verdict (the r11 lesson, twice over): a
  * min-of-mins reference record plus an absolute aggregate threshold cannot
  * distinguish HOST WEATHER from a code regression — two consecutive rounds
  * archived `sanity_ok:false` on byte-identical plans (r10: 4 flagged, r11:
  * 53 flagged at 1.58×), each costing a manual session of focused re-runs to
  * adjudicate. This gate makes the attribution part of the bench line:
  *
  *  1. **Host calibration from controls.** [[Controls]] is a fixed panel of
  *     cheap queries whose plans never change (4 batch shapes + 2 streaming
  *     shapes — streaming's fixed multi-second setup is the shape host
  *     throttling inflates most, so the panel must include it). The MEDIAN
  *     control ratio (this run's min-of-reps ÷ the committed record) is the
  *     host-calibration factor `env_ratio`: on a quiet host ≈ 1, on a
  *     throttled host it measures the throttle directly. Median over six
  *     tolerates two genuinely-regressed controls without polluting the
  *     calibration.
  *  2. **Calibrated per-query flags.** A query is flagged only when it
  *     exceeds `ref × env_ratio × `[[FlagRatio]] with >[[FlagAbsSec]]
  *     absolute excess — i.e. it is slow RELATIVE TO HOW SLOW THIS HOST IS
  *     RIGHT NOW. Under a uniform 2× throttle nothing flags; a single query
  *     that tripled while the controls sat at 1× still flags.
  *  3. **Shuffle-bytes plan check.** Wall time can lie on a noisy host;
  *     per-execution shuffle volume cannot — it is a pure function of the
  *     plan. Each query's tallied bytes are compared against the committed
  *     [[graft.Bench]] shuffle record; an INCREASE beyond tolerance is a
  *     plan regression ([[Result.planChanged]]) regardless of timing, a
  *     decrease is reported separately ([[Result.planCheaper]] — the record
  *     premise "carried entries stay valid while plans only got cheaper"
  *     still holds, but the record deserves regeneration).
  *
  * The aggregate `sanity_vs_ref` (this run's common-slice sum ÷ the record
  * sum) is still emitted for cross-round continuity, but it no longer
  * gates: the record is a per-query best-ever composite no single honest
  * run can sum-match on a loaded host, so gating on its sum is gating on
  * the weather. The verdict is:
  *
  *  - `"regression"` — any calibrated flag or any plan-bytes increase;
  *  - `"environmental"` — no flags, but the controls measured the host
  *    outside [[EnvBand]] (timings untrustworthy, code fine);
  *  - `"ok"` — no flags, quiet host.
  *
  * `sanity_ok` is `verdict != "regression"` — the question the driver's
  * gate actually asks ("did the code get slower?"), not "was the host
  * quiet?". Proven by injection in SanityGateSpec and end-to-end via
  * `SPARK_GRAFT_BENCH_SLOW` (timing-only regression: flags, controls
  * quiet) / `SPARK_GRAFT_BENCH_RESHUFFLE` (plan change: bytes flag it even
  * if timing hides it) / a CPU-starved run (uniform slowdown: verdict
  * "environmental", zero flags).
  */
object SanityGate {

  /** The calibration panel: plan-stable, cheap (record total ≈ 4.3 s),
    * covering the suite's cost shapes — scan+agg (q02), shuffle join+agg
    * (q03), window dedup (q10), vector/ADC (q108), and two streaming
    * queries (q100, q111) whose fixed state-store/planner setup dominates
    * their time and therefore probes exactly the overhead host throttling
    * inflates most. Changing any control's PLAN requires regenerating the
    * committed record in the same commit (the shuffle-bytes check enforces
    * this: a control whose bytes moved flags as a plan change).
    */
  val Controls: Seq[String] = Seq(
    "q02_priority_agg", "q03_revenue_by_nation", "q10_dedup_by_key",
    "q108_pq_adc_knn", "q100_stream_sink", "q111_stream_dedup_wm")

  /** Calibrated per-query flag threshold: > 1.5× the host-adjusted
    * reference (same ratio the uncalibrated r9 gate used — calibration
    * moves the baseline, not the sensitivity).
    */
  val FlagRatio = 1.5

  /** Absolute excess floor (seconds) under the ratio flag — keeps sub-100ms
    * queries' scheduling jitter out; a plan regression on a query that
    * cheap is caught by the shuffle-bytes check instead.
    */
  val FlagAbsSec = 0.3

  /** env_ratio band outside which a no-flag run reads "environmental":
    * timings are not record-quality, but nothing points at the code.
    */
  val EnvBand: (Double, Double) = (0.8, 1.25)

  /** Minimum controls present (a dev subset run without the panel gets
    * env_ratio = 1 — uncalibrated, same behavior as the old gate).
    */
  val MinControls = 3

  /** The post-suite retest's OWN calibration panel (r12 verdict #1 — the
    * one defect that put a false "regression" in the r12 archive): the
    * retest used to compare flagged queries against the RAW record, so a
    * throttle phase still active at retest time re-confirmed its own false
    * flags (q261/q262). The retest now re-times these cheap batch controls
    * in the same breath and clears a flag only against the RETEST-TIME
    * host factor. Batch shapes only: the streaming controls' fixed
    * multi-second setup would triple the retest's cost for calibration the
    * batch panel already provides.
    */
  val RetestControls: Seq[String] =
    Seq("q02_priority_agg", "q03_revenue_by_nation", "q10_dedup_by_key")

  /** Does a flagged query's retest CLEAR it, judged at the retest batch's
    * own measured host factor? Mirrors the flag condition exactly — a
    * retest survives (keeps the flag) only if it is still past
    * [[FlagRatio]]× the retest-calibrated reference with more than
    * [[FlagAbsSec]] absolute excess. A permanent regression (e.g. the
    * SLOW injection's +1.2 s wrapper) stays past both bars at any honest
    * host factor; an in-phase micro-stall retests at ≈ the phase factor,
    * which is exactly what `retestEnv` measures, and clears.
    */
  def retestClears(refSec: Double, retestSec: Double, retestEnv: Double): Boolean =
    !(retestSec > refSec * retestEnv * FlagRatio &&
      retestSec - refSec * retestEnv > FlagAbsSec)

  /** Which flagged queries to re-time: all of them up to `cap`, else a
    * deterministic stride sample of `cap` (r12 advice: a mass flag event —
    * the violent-throttle shape the retest exists to clear — used to skip
    * retesting entirely and archive `sanity_ok=false` unexamined). The
    * stride keeps the sample spread across the execution order, so a phase
    * that hit one contiguous band is still sampled throughout.
    */
  def retestSample(flagged: Seq[String], cap: Int): Seq[String] =
    if (flagged.size <= cap) flagged
    else {
      val stride = flagged.size.toDouble / cap
      (0 until cap).map(i => flagged((i * stride).toInt))
    }

  /** Half-window (in execution positions) of the time-local calibration
    * neighborhood: 31 queries ≈ a few minutes of run — wide enough that a
    * single genuinely-regressed query cannot drag its own baseline up
    * (one of 31 barely moves a median), narrow enough to track a throttle
    * phase transition.
    */
  val NeighborHalfWindow = 15

  /** The local baseline never drops below this fraction of the global
    * control calibration — a window full of queries that all got FASTER
    * than the record (plan wins landing together) must not mask a genuine
    * regression sitting among them.
    */
  val EnvLocalFloorFrac = 0.5

  /** Shuffle-bytes tolerance: relative (AQE boundary wiggle) OR absolute
    * (empty-ish queries); the r10/r11 driver runs were byte-identical on
    * every comparable entry, so this is generous.
    */
  val PlanBytesRelTol = 0.05
  val PlanBytesAbsTol = 32768L

  /** Absolute executor-CPU excess floor (seconds) for the CPU third signal
    * — wider than [[FlagAbsSec]] because CPU is summed over up to 32
    * concurrent task threads, so per-task scheduling jitter aggregates.
    */
  val CpuAbsSec = 0.5

  /** One benched query: min-of-reps seconds, error marker, tallied
    * per-execution shuffle-write bytes (None when the tally is disabled),
    * and warm-rep executor CPU seconds (None when reps < 2 — rep 1's CPU
    * includes interpreted/C1 execution before JIT and operator-internal
    * cache builds, so only warm reps give the stable plan-determined
    * compute number the CPU check needs).
    */
  final case class Obs(name: String, sec: Double, err: Boolean,
                       shuffleBytes: Option[Long],
                       cpuSec: Option[Double] = None)

  final case class Result(
      commonN: Int,
      rawRatio: Double,
      envRatio: Double,
      ctrlSpread: Double,
      controlsN: Int,
      flagged: Seq[String],
      planChanged: Seq[String],
      planCheaper: Seq[String],
      cpuEnv: Double = 1.0,
      cpuChanged: Seq[String] = Nil) {
    /** Calibrated aggregate — the run's sum ratio with the measured host
      * factor divided out (informational; per-query flags gate).
      */
    def calRatio: Double = rawRatio / envRatio
    def verdict: String =
      if (flagged.nonEmpty || planChanged.nonEmpty) "regression"
      // environmental when the controls read a loaded host OR the aggregate
      // is off even though the controls look quiet (a throttle phase that
      // started after the early-executing panel): timings are not
      // record-quality, but nothing points at the code
      else if (envRatio < EnvBand._1 || envRatio > EnvBand._2 ||
        calRatio < EnvBand._1 || calRatio > EnvBand._2) "environmental"
      else "ok"
    /** "Did the code get slower?" — the driver-gate question. The CPU
      * third signal is deliberately NOT part of this (see [[evaluate]]):
      * its load-immunity premise failed measurement on this host.
      */
    def ok: Boolean = flagged.isEmpty && planChanged.isEmpty
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Evaluate a run against the committed per-query records. Returns None
    * below 20 common queries (a subset too small to judge, same floor as
    * the old gate).
    *
    * `refCpu` (optional) enables the CPU THIRD SIGNAL (r13) —
    * INFORMATIONAL ONLY, by measurement. The candidate hypothesis (STATUS
    * r13 next-candidates) was that external host stalls inflate WALL time
    * but not task-thread CPU time, so warm-rep executor CPU vs a committed
    * record could attribute even a stall that reproduces inside the retest
    * window. Measured on this host (two 24-query sf0.1 runs inside a
    * throttle phase, 2026-08-16): a micro-stalled query's CPU inflates
    * 22-30× TOGETHER with its wall time (q261 wall 0.69→15.4 s, cpu
    * 0.82→18.3 s; q262 and q310 alike) — the guest's per-thread CPU
    * accounting accrues through external preemption, so the signal has NO
    * attribution power for exactly the stalls it was meant to attribute,
    * and gating on it would ADD false-flag exposure during phases.
    * [[Result.cpuChanged]] (CALIBRATED exactly like the wall check:
    * control-median CPU factor, spread widening, time-local neighborhood)
    * therefore rides the bench line as telemetry — it NAMES a genuine
    * pure-compute regression (proven end-to-end by the
    * `SPARK_GRAFT_BENCH_BURN` injection: several CPU-seconds of extra
    * codegen'd hashing whose wall hides under [[FlagAbsSec]] and whose
    * bytes are unchanged) — but does not gate `ok`/`verdict` until
    * quiet-window cross-run variance data supports a gate (observed warm
    * CPU run-to-run ratios up to 2.1× under weather — too wide to gate
    * honestly today).
    */
  def evaluate(obs: Seq[Obs], refSec: Map[String, Double],
               refBytes: Map[String, Long],
               refCpu: Map[String, Double] = Map.empty): Option[Result] = {
    val common = obs.filter(o => !o.err && refSec.contains(o.name))
    if (common.size < 20) return None
    val ctrlRatios = common.filter(o => Controls.contains(o.name))
      .map(o => o.sec / refSec(o.name))
    val calibrated = ctrlRatios.size >= MinControls
    val envRatio = if (calibrated) median(ctrlRatios) else 1.0
    // Load is rarely a clean scalar: concurrent jobs hit some queries 2x
    // and others 4x. The SPREAD of the control panel (max control ratio
    // over the median) measures exactly that non-uniformity, so the flag
    // threshold widens with it — a quiet host keeps the full 1.5x
    // sensitivity (spread ~1), a lumpy host flags only what exceeds even
    // its own worst-hit control's band. Without this, a control itself can
    // flag under load (observed: a 2.1x control vs a 1.4x median).
    val ctrlSpread =
      if (calibrated && envRatio > 0) ctrlRatios.max / envRatio else 1.0
    val effRatio = FlagRatio * math.max(1.0, ctrlSpread)
    val rawRatio = common.map(_.sec).sum / common.map(o => refSec(o.name)).sum
    // TIME-LOCAL calibration (the phase-transition lesson: a throttle phase
    // that begins mid-run inflates a CONTIGUOUS band of queries — observed:
    // 41 flags, all in q257..q338, zero below — while the control panel,
    // which executes early in sorted order, still reads the quiet phase).
    // Each query therefore flags against the median ratio of its EXECUTION
    // NEIGHBORS (obs arrive in execution order), who share its phase: under
    // any host weather the neighborhood absorbs the shift, while a genuine
    // single-query regression stands out against its own neighbors. A mass
    // uniform timing regression with byte-identical plans is structurally
    // indistinguishable from weather by timing alone — that case belongs to
    // the shuffle-bytes check, which is load-immune.
    val ratios = common.map(o => o.sec / refSec(o.name))
    def envLocalAt(i: Int): Double = {
      if (!calibrated) return 1.0
      val lo = math.max(0, i - NeighborHalfWindow)
      val hi = math.min(common.size - 1, i + NeighborHalfWindow)
      math.max(envRatio * EnvLocalFloorFrac, median(ratios.slice(lo, hi + 1)))
    }
    val flagged = common.zipWithIndex.collect {
      case (o, i) if o.sec > refSec(o.name) * envLocalAt(i) * effRatio &&
        o.sec - refSec(o.name) * envLocalAt(i) > FlagAbsSec => o.name
    }.sorted
    def bytesDelta(o: Obs): Option[Long] = for {
      b <- o.shuffleBytes
      r <- refBytes.get(o.name)
    } yield b - r
    def tol(name: String): Long =
      math.max(PlanBytesAbsTol, (refBytes(name) * PlanBytesRelTol).toLong)
    val planChanged = common.collect {
      case o if bytesDelta(o).exists(_ > tol(o.name)) => o.name
    }.sorted
    val planCheaper = common.collect {
      case o if bytesDelta(o).exists(_ < -tol(o.name)) => o.name
    }.sorted
    // CPU third signal (informational — see the method Scaladoc for the
    // measured demotion): same calibration architecture as wall time —
    // control-median CPU factor, spread-widened threshold, time-local
    // neighborhood over the defined subsequence in execution order. The
    // record is warm-rep CPU, so entries are plan-determined compute.
    val cpuDefined = common.flatMap(o => for {
      v <- o.cpuSec; r <- refCpu.get(o.name) if r > 0
    } yield (o.name, v, r))
    val cpuCtrl = cpuDefined.collect {
      case (n, v, r) if Controls.contains(n) => v / r }
    val cpuCalibrated = cpuCtrl.size >= MinControls
    val cpuEnv = if (cpuCalibrated) median(cpuCtrl) else 1.0
    val cpuSpread =
      if (cpuCalibrated && cpuEnv > 0) cpuCtrl.max / cpuEnv else 1.0
    val cpuEff = FlagRatio * math.max(1.0, cpuSpread)
    val cpuRatios = cpuDefined.map { case (_, v, r) => v / r }
    def cpuLocalAt(i: Int): Double = {
      if (!cpuCalibrated) return 1.0
      val lo = math.max(0, i - NeighborHalfWindow)
      val hi = math.min(cpuDefined.size - 1, i + NeighborHalfWindow)
      math.max(cpuEnv * EnvLocalFloorFrac, median(cpuRatios.slice(lo, hi + 1)))
    }
    def cpuHot(i: Int): Boolean = {
      val (_, v, r) = cpuDefined(i)
      v > r * cpuLocalAt(i) * cpuEff && v - r * cpuLocalAt(i) > CpuAbsSec
    }
    val cpuChanged = cpuDefined.indices.collect {
      case i if cpuHot(i) => cpuDefined(i)._1 }.sorted
    Some(Result(common.size, rawRatio, envRatio, ctrlSpread, ctrlRatios.size,
      flagged, planChanged, planCheaper, cpuEnv, cpuChanged))
  }

  /** Parse a "name value" record file (the committed bench references). */
  def readRecord(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.exists()) return Map.empty
    val src = scala.io.Source.fromFile(f)
    try src.getLines().flatMap { l =>
      l.trim.split("\\s+") match {
        case Array(n, v) => scala.util.Try(n -> v.toDouble).toOption
        case _ => None
      }
    }.toMap finally src.close()
  }
}
