package graft

import org.scalatest.funsuite.AnyFunSuite

/** The drift-adjudication protocol as unit-checked truth table — BASELINE
  * .md's prose rules (±30% noise envelope, calibration gating, structural
  * = ≥2× steady across ≥2 clean passes) must be decided by code the same
  * way a human judge has been deciding them. */
class BenchDriftSpec extends AnyFunSuite {

  private val clean3 = Seq(0.4, 0.5, 0.3) // all passes calibration-clean

  test("calibration gate is absolute: contended passes are excluded even " +
      "when ALL passes are contended") {
    assert(BenchDrift.cleanIdx(Seq(0.3, 3.5, 0.4)) == Seq(0, 2))
    // fully contended run: a relative-to-min bound would bless all three;
    // the absolute bound must reject them all → verdicts become
    // no_clean_pass, never structural
    assert(BenchDrift.cleanIdx(Seq(3.5, 4.0, 4.2)).isEmpty)
    assert(BenchDrift.status(Some(1.0), Seq(2.5, 2.6, 2.4),
      Seq(3.5, 4.0, 4.2)) == "no_clean_pass")
  }

  test("steady-state verdicts: ok / noise / structural / failed / new") {
    // inside the ±30% envelope
    assert(BenchDrift.status(Some(1.0), Seq(1.1, 0.9, 1.2), clean3) == "ok")
    // best clean sample outside 1.3× but below 2× → noise, not structural
    assert(BenchDrift.status(Some(1.0), Seq(1.6, 1.7, 1.5), clean3)
      == "noise")
    // every clean pass ≥ 2× steady → structural
    assert(BenchDrift.status(Some(1.0), Seq(2.1, 2.4, 2.0), clean3)
      == "structural")
    // all reps failed
    assert(BenchDrift.status(Some(1.0), Seq(-1.0, -1.0, -1.0), clean3)
      == "failed")
    // no baseline entry yet
    assert(BenchDrift.status(None, Seq(9.9, 9.9, 9.9), clean3) == "new")
  }

  test("a single slow sample cannot flag structural (min-based rule)") {
    // the amortized-index shape: pass 1 pays the build (8× steady), later
    // passes reuse — expected, must stay ok
    assert(BenchDrift.status(Some(0.8), Seq(6.4, 0.9, 0.7), clean3) == "ok")
    // one VM excursion among clean passes — noise territory at worst
    assert(BenchDrift.status(Some(1.0), Seq(2.5, 1.0, 1.1), clean3) == "ok")
    // two slow + one fast clean sample: still not structural (min rules)
    assert(BenchDrift.status(Some(1.0), Seq(2.5, 2.6, 1.1), clean3) == "ok")
  }

  test("the noise envelope is two-sided: an implausible speedup is drift") {
    // a query gone near-empty (silently broken) runs far FASTER than
    // steady — that is a drift signal, not health; still non-gating
    assert(BenchDrift.status(Some(1.0), Seq(0.2, 0.25, 0.22), clean3)
      == "noise")
    // a mild warm-cache speedup inside the envelope stays ok
    assert(BenchDrift.status(Some(1.0), Seq(0.85, 0.9, 0.88), clean3)
      == "ok")
  }

  test("a non-positive steady entry is not comparable (treated as new)") {
    // without the guard, 2·0·run = 0 flags every run structural forever
    // while runRatio excludes the same entry from its pool
    assert(BenchDrift.status(Some(0.0), Seq(1.0, 1.1, 0.9), clean3) == "new")
    assert(BenchDrift.status(Some(-1.0), Seq(1.0, 1.1, 0.9), clean3)
      == "new")
    assert(BenchDrift.cleanBestRatio(Some(0.0), Seq(1.0, 1.1, 0.9), clean3)
      .isEmpty)
  }

  test("structural needs ≥2 clean passes") {
    // only pass 3 is clean and it is 3× steady: suspicious but a single
    // comparable sample is not proof
    assert(BenchDrift.status(Some(1.0), Seq(3.1, 3.2, 3.0),
      Seq(4.0, 4.1, 0.4)) == "noise")
  }

  test("failed reps are excluded from clean samples, not counted as fast") {
    assert(BenchDrift.status(Some(1.0), Seq(-1.0, 2.2, 2.4), clean3)
      == "structural")
    assert(BenchDrift.status(Some(1.0), Seq(-1.0, -1.0, 2.4), clean3)
      == "noise") // one clean sample left → can't be structural
  }

  test("uniform run contention cannot mass-flag structural; a localized " +
      "regression still does") {
    // the observed failure mode: IO contention slows every long query
    // ~2.8x while the small CPU-bound calibration probe stays clean. The
    // run median carries that factor; normalized, the verdict is
    // noise/ok — never structural.
    val contended = BenchDrift.runRatio(Seq(2.7, 2.8, 2.9, 2.8, 2.75))
    assert(contended == 2.8)
    assert(BenchDrift.status(Some(1.0), Seq(2.8, 2.9, 2.7), clean3,
      contended) == "noise")
    // a REAL regression inside that contended run measures r*m = 2x on
    // top of the 2.8x contention — still >= 2 x steady x runRatio
    assert(BenchDrift.status(Some(1.0), Seq(5.7, 5.9, 5.8), clean3,
      contended) == "structural")
    // uncontended run (median < 1): floored at 1.0 — a faster-than-steady
    // run must not SHRINK the structural bound
    val quiet = BenchDrift.runRatio(Seq(0.85, 0.9, 1.1, 0.8))
    assert(quiet == 1.0)
    assert(BenchDrift.status(Some(1.0), Seq(2.1, 2.4, 2.0), clean3, quiet)
      == "structural")
    // a single huge ratio among many steady ones cannot lift the median
    assert(BenchDrift.runRatio(Seq(1.0, 1.05, 0.98, 1.1, 9.0)) == 1.05)
    // empty pool (no baseline yet) -> neutral factor
    assert(BenchDrift.runRatio(Nil) == 1.0)
  }

  test("cleanBestRatio pools only comparable samples") {
    // best CLEAN sample over steady
    assert(BenchDrift.cleanBestRatio(Some(2.0), Seq(9.0, 5.0, 4.0), clean3)
      .contains(2.0))
    // contended passes excluded from the pool datum too
    assert(BenchDrift.cleanBestRatio(Some(1.0), Seq(1.0, 9.0, 9.5),
      Seq(0.4, 3.0, 3.1)).contains(1.0))
    // no steady entry / no clean pass / all reps failed -> no datum
    assert(BenchDrift.cleanBestRatio(None, Seq(1.0), Seq(0.4)).isEmpty)
    assert(BenchDrift.cleanBestRatio(Some(1.0), Seq(1.0, 1.0, 1.0),
      Seq(3.0, 3.0, 3.0)).isEmpty)
    assert(BenchDrift.cleanBestRatio(Some(1.0), Seq(-1.0, -1.0, -1.0),
      clean3).isEmpty)
  }

  test("parseSteady flattens sections, skips the comment, tolerates junk") {
    val m = BenchDrift.parseSteady(
      """{"comment": "x",
        |"headline": {"q1": 0.5, "q2": 2},
        |"extras": {"q3": 1.25}}""".stripMargin)
    assert(m == Map("q1" -> 0.5, "q2" -> 2.0, "q3" -> 1.25))
    assert(BenchDrift.parseSteady("not json").isEmpty)
    assert(BenchDrift.parseSteady("[1,2]").isEmpty)
  }

  test("environment verdict: two consecutive contended runs escalate") {
    // quiet run: always ok, regardless of history
    assert(BenchDrift.environmentVerdict(None, 1.0) == "ok")
    assert(BenchDrift.environmentVerdict(Some(2.0), 1.0) == "ok")
    // boundary: exactly 1.5 is NOT contended (strict >)
    assert(BenchDrift.environmentVerdict(Some(2.0), 1.5) == "ok")
    // first strike: contended now, but no contended predecessor
    assert(BenchDrift.environmentVerdict(None, 1.6) == "elevated")
    assert(BenchDrift.environmentVerdict(Some(1.2), 1.6) == "elevated")
    assert(BenchDrift.environmentVerdict(Some(1.5), 1.6) == "elevated")
    // persistent: both this run and the recorded predecessor contended —
    // the uniform-slowdown blind spot's machine verdict
    assert(BenchDrift.environmentVerdict(Some(1.6), 1.7) == "degraded")
    assert(BenchDrift.environmentVerdict(Some(4.0), 2.0) == "degraded")
  }

  test("parseRunRatio reads a same-boot record, tolerates junk") {
    val boot = "aaaa-bbbb"
    assert(BenchDrift.parseRunRatio(
      s"""{"metric":"total","value":17.8,"run_ratio":1.032,"boot_id":"$boot","sf":"x"}""",
      boot).contains(1.032))
    assert(BenchDrift.parseRunRatio(
      s"""{"run_ratio":2,"boot_id":"$boot"}""", boot).contains(2.0))
    assert(BenchDrift.parseRunRatio(
      s"""{"value":1.0,"boot_id":"$boot"}""", boot).isEmpty)
    assert(BenchDrift.parseRunRatio("not json", boot).isEmpty)
    assert(BenchDrift.parseRunRatio("[1]", boot).isEmpty)
  }

  test("parseRunRatio rejects foreign-boot records (fresh-checkout weather)") {
    // a committed bench_last_run.json from another machine/boot must not
    // count as strike one of the degraded escalation
    val rec = """{"run_ratio":2.5,"boot_id":"other-machine"}"""
    assert(BenchDrift.parseRunRatio(rec, "this-machine").isEmpty)
    // old-format record without boot_id: also foreign (conservative)
    assert(BenchDrift.parseRunRatio("""{"run_ratio":2.5}""", "this-machine")
      .isEmpty)
    // unreadable local boot id: never match, even against itself
    assert(BenchDrift.parseRunRatio(
      """{"run_ratio":2.5,"boot_id":"unknown"}""", "unknown").isEmpty)
    // and the live default path agrees with an explicitly passed bootId
    if (BenchDrift.bootId != "unknown") {
      val live = s"""{"run_ratio":1.9,"boot_id":"${BenchDrift.bootId}"}"""
      assert(BenchDrift.parseRunRatio(live).contains(1.9))
    }
  }
}
