package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contamination guard is what keeps a load-spiked capture from
  * masquerading as the committed baseline (round 9's round-end artifact
  * was a single pass with lanes at up to 67x their clean medians). Pure
  * decision logic — fake probe samples, no Spark session. */
class BenchGuardSpec extends AnyFunSuite {

  test("contaminated: median over the 1.5x fence flags the run") {
    // all three probes spiked: plainly dirty
    assert(Bench.contaminated(Seq(1.2, 1.4, 1.3), refS = 0.3))
    // just under the fence is still clean (strict >; 0.44 < 0.3 * 1.5)
    assert(!Bench.contaminated(Seq(0.44, 0.44, 0.44), refS = 0.3))
    // quiet box
    assert(!Bench.contaminated(Seq(0.29, 0.31, 0.30), refS = 0.3))
  }

  test("contaminated: one transient burst in a 3-pass run is absorbed") {
    // round-robin medians already survive one spiked pass; the guard
    // must agree (median of [0.3, 0.31, 9.0] = 0.31)
    assert(!Bench.contaminated(Seq(0.30, 9.0, 0.31), refS = 0.3))
    // but two spiked probes of four move the median over the fence
    assert(Bench.contaminated(Seq(0.30, 9.0, 8.0, 0.31), refS = 0.3))
  }

  test("contaminated: degenerate inputs") {
    assert(!Bench.contaminated(Nil, refS = 0.3))
    assert(Bench.contaminated(Seq(10.0), refS = 0.3))
  }

  test("certifiable: only a full clean multi-pass capture certifies") {
    assert(Bench.certifiable(3, 3, 0, budgetHit = false,
      isContaminated = false))
    // the round-9 failure mode: single pass under load, budget hit
    assert(!Bench.certifiable(1, 3, 0, budgetHit = true,
      isContaminated = true))
    // single-pass even when "complete" (ITERS=1): one sample is not a
    // median
    assert(!Bench.certifiable(1, 1, 0, budgetHit = false,
      isContaminated = false))
    // truncated (budget) run
    assert(!Bench.certifiable(2, 3, 0, budgetHit = true,
      isContaminated = false))
    // any lane erroring disqualifies
    assert(!Bench.certifiable(3, 3, 1, budgetHit = false,
      isContaminated = false))
    // clean numbers on a loaded box disqualify
    assert(!Bench.certifiable(3, 3, 0, budgetHit = false,
      isContaminated = true))
  }

  test("awaitQuietWindow: quiet box needs exactly one probe, no sleep") {
    var sleeps = 0
    val (p, tries) = Bench.awaitQuietWindow(
      () => 0.29, refS = 0.3, maxTries = 8,
      sleep = () => sleeps += 1, log = _ => ())
    assert(p == 0.29 && tries == 1 && sleeps == 0)
  }

  test("awaitQuietWindow: busy box waits until a quiet probe appears") {
    // busy, busy, quiet — two sleeps, three probes, returns the quiet one
    val samples = Iterator(2.0, 1.8, 0.31)
    var sleeps = 0
    val (p, tries) = Bench.awaitQuietWindow(
      () => samples.next(), refS = 0.3, maxTries = 8,
      sleep = () => sleeps += 1, log = _ => ())
    assert(p == 0.31 && tries == 3 && sleeps == 2)
  }

  test("awaitQuietWindow: attempt budget bounds the wait on a loaded box") {
    // never goes quiet: exactly maxTries probes, then give up and return
    // the (still dirty) last sample — the sweep proceeds and the
    // contamination stamp downstream does the refusing
    var probes = 0
    val (p, tries) = Bench.awaitQuietWindow(
      () => { probes += 1; 5.0 }, refS = 0.3, maxTries = 4,
      sleep = () => (), log = _ => ())
    assert(p == 5.0 && tries == 4 && probes == 4)
  }

  test("median: odd, even, and single-sample inputs") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(7.0)) == 7.0)
  }
}
