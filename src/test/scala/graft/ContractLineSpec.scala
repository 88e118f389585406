package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.ContractLine

/** The bench contract line's parse-proofing (r14 verdict #7: r13's line
  * reached the driver unparseable — `BENCH_r13.json parsed: null` — and cost
  * a full round of per-query regression visibility; r14's identical format
  * parsed fine, so the guard validates EVERY line in-process before it is
  * printed and ships a Jackson-built fallback on failure instead of an
  * unparseable round).
  */
class ContractLineSpec extends AnyFunSuite {

  test("a representative full-size contract line round-trips a strict JSON parse") {
    // 336 query entries + medians + shuffle bytes + sanity tail — the real
    // line's size class (~30 KB), so a parser line-length sensitivity in the
    // validator itself would surface here
    val names = (1 to 336).map(i => f"q$i%03d_some_query_name")
    def m(v: Int => String) =
      names.zipWithIndex.map { case (n, i) => s""""$n":${v(i)}""" }
        .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":156.123,"unit":"sec",""" +
      s""""queries":${m(i => (i * 0.001).toString)},"sf":"/root/testdata/sf0.1","reps":3,""" +
      s""""total_median":160.0,"queries_median":${m(i => (i * 0.0011).toString)},""" +
      s""""errors":[],"queries_shuffle_bytes":${m(i => (i * 1000L).toString)},""" +
      s""""sanity_common_n":336,"sanity_vs_ref":1.02,"sanity_env_ratio":1.0,""" +
      s""""sanity_flagged":["q001_some_query_name","q002_some_query_name"],""" +
      s""""sanity_verdict":"ok","sanity_ok":true}"""
    assert(ContractLine.parseable(line), "the canonical line shape must parse")
    assert(ContractLine.ensureParseable(line, sys.error("fallback must not build")) eq line)
  }

  test("a bare NaN token — the one double-corruption shape — triggers the fallback") {
    val bad = """{"metric":"total","value":NaN,"unit":"sec","queries":{"q01":0.1}}"""
    assert(!ContractLine.parseable(bad), "strict parse must reject a NaN token")
    val fb = ContractLine.ensureParseable(bad,
      ContractLine.fallback(Double.NaN,
        Seq("q01_a" -> 0.1, "q02_b" -> Double.PositiveInfinity), "/x/sf0.1", 3,
        Seq("q02_b")))
    assert(ContractLine.parseable(fb), "the fallback must itself parse")
    assert(fb.contains("\"contract_fallback\":true"))
    assert(fb.contains("\"metric\":\"total\""))
    assert(fb.contains("\"q01_a\":0.1"))
    assert(!fb.contains("NaN") && !fb.contains("Infinity"),
      "non-finite doubles must be mapped, not serialized")
  }

  test("truncated and trailing-garbage lines are rejected, honest lines pass") {
    val ok = """{"metric":"total","value":1.5,"unit":"sec","queries":{}}"""
    assert(ContractLine.parseable(ok))
    assert(!ContractLine.parseable(ok.dropRight(2)), "a truncated line must fail")
    assert(!ContractLine.parseable(ok + " stray"),
      "trailing tokens on the contract line must fail")
    assert(!ContractLine.parseable("not json at all"))
  }
}
