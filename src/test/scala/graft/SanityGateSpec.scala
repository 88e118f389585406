package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.SanityGate
import graft.bench.SanityGate.Obs

/** The bench sanity verdict's attribution contract, proven by injection on
  * synthetic runs (no Spark): a uniform host slowdown must read
  * "environmental" with ZERO flagged queries, a targeted timing regression
  * must flag exactly its query on a quiet AND on a throttled host, and a
  * plan change must surface through the shuffle-bytes record even when its
  * timing hides in noise. This is the r11 verdict's "done" criterion as a
  * spec; the end-to-end pair (SPARK_GRAFT_BENCH_SLOW / _RESHUFFLE, and a
  * CPU-starved run) exercises the same paths through graft.Bench itself.
  */
class SanityGateSpec extends AnyFunSuite {

  // a 30-query reference: the six controls at realistic costs + 24 batch
  // queries, all with committed shuffle bytes
  private val ref: Map[String, Double] =
    SanityGate.Controls.zip(Seq(0.37, 0.69, 0.67, 0.64, 0.94, 1.29)).toMap ++
      (1 to 24).map(i => f"q9$i%02d_synth" -> (0.2 + 0.05 * i)).toMap
  private val refBytes: Map[String, Long] =
    ref.keys.map(k => k -> (1000000L + k.hashCode.abs % 1000000L)).toMap

  private def run(scale: Double, over: Map[String, Double] = Map.empty,
                  bytesOver: Map[String, Long] = Map.empty): Seq[Obs] =
    ref.keys.toSeq.sorted.map { k =>
      Obs(k, over.getOrElse(k, ref(k) * scale), err = false,
        Some(bytesOver.getOrElse(k, refBytes(k))))
    }

  test("quiet host, unchanged code: verdict ok, nothing flagged") {
    val r = SanityGate.evaluate(run(1.02), ref, refBytes).get
    assert(r.verdict === "ok" && r.ok)
    assert(r.flagged.isEmpty && r.planChanged.isEmpty && r.planCheaper.isEmpty)
    assert(math.abs(r.envRatio - 1.02) < 0.01)
  }

  test("uniform 2x host slowdown: environmental, ZERO flagged (the r11 failure mode fixed)") {
    val r = SanityGate.evaluate(run(2.0), ref, refBytes).get
    assert(r.verdict === "environmental")
    assert(r.ok, "a throttled host is not a code regression")
    assert(r.flagged.isEmpty, s"nothing may flag under uniform throttle, got ${r.flagged}")
    assert(math.abs(r.envRatio - 2.0) < 0.01)
    assert(math.abs(r.calRatio - 1.0) < 0.01, "calibrated aggregate ~1 under pure weather")
  }

  test("targeted 3x timing regression on a quiet host: regression, exactly that query") {
    val r = SanityGate.evaluate(
      run(1.0, over = Map("q910_synth" -> ref("q910_synth") * 3)), ref, refBytes).get
    assert(r.verdict === "regression" && !r.ok)
    assert(r.flagged === Seq("q910_synth"))
  }

  test("targeted regression UNDER a 2x throttle still flags (calibration does not hide it)") {
    // host 2x everywhere, and q910 additionally regressed 4x vs its ref
    val r = SanityGate.evaluate(
      run(2.0, over = Map("q910_synth" -> ref("q910_synth") * 4)), ref, refBytes).get
    assert(r.flagged === Seq("q910_synth"))
    assert(r.verdict === "regression")
  }

  test("plan change surfaces via shuffle bytes even when timing is unchanged") {
    val r = SanityGate.evaluate(
      run(1.0, bytesOver = Map("q905_synth" -> (refBytes("q905_synth") * 2))),
      ref, refBytes).get
    assert(r.planChanged === Seq("q905_synth"))
    assert(r.verdict === "regression")
  }

  test("shuffle-bytes DECREASE reports planCheaper, not regression") {
    val r = SanityGate.evaluate(
      run(1.0, bytesOver = Map("q905_synth" -> (refBytes("q905_synth") / 4))),
      ref, refBytes).get
    assert(r.planCheaper === Seq("q905_synth"))
    assert(r.planChanged.isEmpty && r.ok)
    assert(r.verdict === "ok")
  }

  test("sub-tolerance byte wiggle and small-query jitter do not flag") {
    val r = SanityGate.evaluate(
      run(1.0,
        over = Map("q901_synth" -> (ref("q901_synth") + 0.2)), // below 0.3s floor
        bytesOver = Map("q903_synth" -> (refBytes("q903_synth") + 1000L))),
      ref, refBytes).get
    assert(r.verdict === "ok")
  }

  test("controls missing (dev subset): uncalibrated fallback, env_ratio = 1") {
    val subset = run(2.0).filterNot(o => SanityGate.Controls.contains(o.name))
    val r = SanityGate.evaluate(subset, ref, refBytes).get
    assert(r.controlsN === 0 && r.envRatio === 1.0)
    // without calibration a 2x run DOES flag — same behavior as the old gate
    assert(r.flagged.nonEmpty)
  }

  test("fewer than 20 common queries: no verdict") {
    assert(SanityGate.evaluate(run(1.0).take(10), ref, refBytes).isEmpty)
  }

  test("non-uniform load: control spread widens the flag band instead of false-flagging") {
    // a lumpy host: most queries 1.3x, one CONTROL hit 2.6x (spread 2.0) and
    // one non-control hit 2.5x — neither is a code regression, and with the
    // spread-widened threshold (1.5 * 2.0 = 3.0x) neither flags
    val lumpy = run(1.3, over = Map(
      SanityGate.Controls.head -> ref(SanityGate.Controls.head) * 2.6,
      "q912_synth" -> ref("q912_synth") * 2.5))
    val r = SanityGate.evaluate(lumpy, ref, refBytes).get
    assert(r.flagged.isEmpty, s"lumpy load must not flag, got ${r.flagged}")
    assert(r.ctrlSpread > 1.5)
    // a genuine regression still clears even the widened band
    val withReg = run(1.3, over = Map(
      SanityGate.Controls.head -> ref(SanityGate.Controls.head) * 2.6,
      "q912_synth" -> ref("q912_synth") * 8.0))
    val r2 = SanityGate.evaluate(withReg, ref, refBytes).get
    assert(r2.flagged === Seq("q912_synth"))
  }

  test("mid-run throttle phase: a contiguous inflated band does not flag; a spike inside it does") {
    // the observed failure mode: execution-ordered queries, quiet first
    // half (controls run early and read ~1x), 2.5x throttle for the whole
    // back half — position-fixed calibration flagged the entire band;
    // time-local calibration must flag NOTHING
    val names = ref.keys.toSeq.sorted // execution order
    val half = names.size / 2
    def phased(over: Map[String, Double]) = names.zipWithIndex.map { case (k, i) =>
      val scale = if (i < half) 1.02 else 2.5
      Obs(k, over.getOrElse(k, ref(k) * scale), err = false, Some(refBytes(k)))
    }
    val r = SanityGate.evaluate(phased(Map.empty), ref, refBytes).get
    assert(r.flagged.isEmpty, s"a throttle phase must not flag, got ${r.flagged}")
    assert(r.verdict === "environmental") // raw aggregate is well off
    // a genuine regression INSIDE the slow phase still stands out against
    // its phase-sharing neighbors
    val spiked = names(names.size - 3)
    val r2 = SanityGate.evaluate(
      phased(Map(spiked -> ref(spiked) * 12.0)), ref, refBytes).get
    assert(r2.flagged === Seq(spiked))
    assert(r2.verdict === "regression")
  }

  test("a window of plan WINS cannot mask a regression (local floor)") {
    // back half all runs 0.3x the record (legitimately faster code) except
    // one query at 1.4x the record — faster neighbors would put the local
    // median at 0.3 and flag everything ≥0.9x; the floor (half the global
    // control calibration) keeps honest entries unflagged while the 1.4x
    // query, being > 1.5 * max(0.3, 0.5*env≈1) ... stays unflagged too at
    // only 1.4x — but a genuine 2x query among 0.3x neighbors flags
    val names = ref.keys.toSeq.sorted
    val half = names.size / 2
    val reg = names.last
    val obs = names.zipWithIndex.map { case (k, i) =>
      val scale =
        if (k == reg) 2.0
        else if (i < half || SanityGate.Controls.contains(k)) 1.0
        else 0.3
      Obs(k, ref(k) * scale, err = false, Some(refBytes(k)))
    }
    val r = SanityGate.evaluate(obs, ref, refBytes).get
    assert(r.flagged === Seq(reg),
      s"the 2x query must flag against the floored local baseline, got ${r.flagged}")
  }

  test("errored queries are excluded from calibration and flags") {
    val obs = run(1.0).map(o =>
      if (o.name == "q910_synth") o.copy(sec = 99.0, err = true) else o)
    val r = SanityGate.evaluate(obs, ref, refBytes).get
    assert(r.flagged.isEmpty && r.verdict === "ok")
  }

  test("calibrated retest: an in-phase flag with an in-phase retest clears; a real regression survives") {
    // the r12 archive's one defect, made structurally impossible: q261-shaped
    // false flag — micro-stall put the min at 5x during the suite, the
    // retest lands at the phase factor (1.9x) while the retest CONTROLS
    // also read 1.9x. Against the raw record (retestEnv = 1) the old retest
    // kept the flag; judged at the retest-time host factor it clears.
    assert(!SanityGate.retestClears(refSec = 0.5, retestSec = 0.95, retestEnv = 1.0),
      "the OLD uncalibrated comparison would have kept this flag (the r12 bug)")
    assert(SanityGate.retestClears(refSec = 0.5, retestSec = 0.95, retestEnv = 1.9),
      "judged at the retest-time host factor the in-phase flag must clear")
    // a PERMANENT +1.2 s regression (the SLOW injection wrapper) stays past
    // the calibrated bar even when retested inside the same 1.9x phase
    assert(!SanityGate.retestClears(refSec = 0.2, retestSec = 0.2 * 1.9 + 1.2, retestEnv = 1.9),
      "a permanent regression must survive its calibrated retest")
    // the absolute-excess floor still applies: a cheap query within
    // FlagAbsSec of its calibrated reference clears regardless of ratio
    assert(SanityGate.retestClears(refSec = 0.1, retestSec = 0.3, retestEnv = 1.0))
    // and a retest on a genuinely quiet host clears a weather flag outright
    assert(SanityGate.retestClears(refSec = 0.5, retestSec = 0.55, retestEnv = 1.0))
  }

  test("cpu third signal is telemetry: names a pure-compute regression, never gates (measured demotion)") {
    // the r13 measurement that demoted the signal: a stalled query's
    // thread-CPU inflates WITH its wall (q261 wall 0.69→15.4 s, cpu
    // 0.82→18.3 s), so cpu cannot attribute stalls and must not gate.
    val refCpu = ref.map { case (k, v) => k -> v * 3.0 } // ~3 cpu-sec per wall-sec
    def withCpu(obs: Seq[Obs], cpuScale: Double,
                cpuOver: Map[String, Double] = Map.empty): Seq[Obs] =
      obs.map(o => o.copy(cpuSec =
        Some(cpuOver.getOrElse(o.name, refCpu(o.name) * cpuScale))))
    // (a) BURN shape: wall + bytes quiet, one query's cpu 5x — NAMED in
    // cpuChanged, but verdict stays ok (informational only)
    val burn = withCpu(run(1.0), 1.0,
      Map("q910_synth" -> refCpu("q910_synth") * 5))
    val ra = SanityGate.evaluate(burn, ref, refBytes, refCpu).get
    assert(ra.cpuChanged === Seq("q910_synth"))
    assert(ra.verdict === "ok" && ra.ok,
      "cpu telemetry must not gate the verdict")
    // (b) frequency-scaled host: cpu inflates UNIFORMLY — the cpu control
    // calibration absorbs it, nothing named
    val freq = withCpu(run(1.0), 2.0)
    val rb = SanityGate.evaluate(freq, ref, refBytes, refCpu).get
    assert(rb.cpuChanged.isEmpty)
    assert(math.abs(rb.cpuEnv - 2.0) < 0.01)
    // (c) the measured stall shape: one query's wall AND cpu co-inflate
    // 20x — the WALL path flags it (then the calibrated retest
    // adjudicates); the cpu list reporting it too is consistent telemetry
    val stall = withCpu(
      run(1.0, over = Map("q910_synth" -> ref("q910_synth") * 20)), 1.0,
      Map("q910_synth" -> refCpu("q910_synth") * 20))
    val rc = SanityGate.evaluate(stall, ref, refBytes, refCpu).get
    assert(rc.flagged === Seq("q910_synth") && rc.verdict === "regression")
    assert(rc.cpuChanged === Seq("q910_synth"))
    // (d) no cpu record committed (or reps=1 run): the signal is inert
    val rd = SanityGate.evaluate(burn, ref, refBytes).get
    assert(rd.cpuChanged.isEmpty && rd.cpuEnv === 1.0)
    // (e) sub-floor cpu wiggle does not get named: CpuAbsSec absorbs
    // per-task scheduling jitter aggregated over 32 threads
    val wiggle = withCpu(run(1.0), 1.0,
      Map("q901_synth" -> (refCpu("q901_synth") * 1.6).min(refCpu("q901_synth") + 0.4)))
    val re = SanityGate.evaluate(wiggle, ref, refBytes, refCpu).get
    assert(re.cpuChanged.isEmpty)
  }

  test("mass flag events are stride-sampled for retest instead of skipped") {
    // r12 advice #5: >cap flags (the violent-throttle shape) used to skip
    // the retest entirely and archive sanity_ok=false unexamined
    val flagged = (1 to 100).map(i => f"q$i%03d_x")
    val s = SanityGate.retestSample(flagged, 40)
    assert(s.size === 40)
    assert(s.distinct.size === 40, "stride must not duplicate")
    assert(s.toSet.subsetOf(flagged.toSet))
    assert(s.head === flagged.head, "sample must start at the first flag")
    assert(flagged.indexOf(s.last) >= 95, "sample must span the tail")
    // at or under the cap: retest everything, no sampling
    assert(SanityGate.retestSample(flagged.take(40), 40) === flagged.take(40))
    assert(SanityGate.retestSample(Nil, 40) === Nil)
  }
}
