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

  test("derivedBudgetS: scales with the catalog, not a constant") {
    // the round-11 failure mode: 158 lanes at the certified ~1.05 s/lane
    // need ~500 s for 3 passes; the derived budget must exceed that
    val b158 = Bench.derivedBudgetS(158, 3, Some((166.2, 158)))
    assert(b158 > 500.0, s"derived budget $b158 must fit 3 clean passes")
    // certified per-lane cost x current lanes x iters x 1.3 headroom
    assert(math.abs(b158 - 166.2 * 3 * 1.3) < 1e-6)
    // catalog growth moves the budget even with a stale certified capture
    val b200 = Bench.derivedBudgetS(200, 3, Some((166.2, 158)))
    assert(b200 > b158 && math.abs(b200 - 166.2 / 158 * 200 * 3 * 1.3) < 1e-6)
  }

  test("derivedBudgetS: no baseline falls back to the per-lane allowance") {
    assert(Bench.derivedBudgetS(158, 3, None) ==
      158 * 3 * Bench.PerLaneAllowanceS)
    // degenerate certified inputs degrade to the fallback, not a 0 budget
    assert(Bench.derivedBudgetS(158, 3, Some((0.0, 158))) ==
      158 * 3 * Bench.PerLaneAllowanceS)
  }

  test("derivedBudgetS: an unusually-quiet certified capture can't starve " +
      "the budget below the floor") {
    // certified total of 10 s for 158 lanes would derive a 39 s budget;
    // the no-baseline floor keeps the next run viable
    assert(Bench.derivedBudgetS(158, 3, Some((10.0, 158))) ==
      158 * 3 * Bench.PerLaneAllowanceS)
  }

  test("implausibleLanes: >3x the certified median flags; new lanes never") {
    val cert = Map("a" -> 1.0, "b" -> 0.5, "c" -> 2.0)
    val medians = Seq(
      "a" -> 3.5,   // 3.5x -> flagged (the dd06-at-22.5x class)
      "b" -> 1.4,   // 2.8x -> inside the same-code spread, clean
      "c" -> 2.1,   // 1.05x -> clean
      "new" -> 99.0 // no certified median -> never flagged
    )
    assert(Bench.implausibleLanes(medians, cert) == Seq("a"))
    // exactly 3x is NOT flagged (strict >, mirroring contaminated's fence)
    assert(Bench.implausibleLanes(Seq("a" -> 3.0), cert).isEmpty)
    // empty certified map (fresh checkout): nothing ever flags
    assert(Bench.implausibleLanes(medians, Map.empty).isEmpty)
  }

  test("certifiable: an implausible capture never certifies") {
    assert(!Bench.certifiable(3, 3, 0, budgetHit = false,
      isContaminated = false, isImplausible = true))
    // and the default keeps the historical 5-arg call sites meaningful
    assert(Bench.certifiable(3, 3, 0, budgetHit = false,
      isContaminated = false))
  }

  test("parseCertified: reads the writer's own format, band optional") {
    val doc = """{"total":12.5,"queries":{""" +
      """"aj01_asof":{"median":0.245531786,"samples":[0.8,0.19,0.245]},""" +
      """"g05_bet":{"median":6.1,"samples":[6.0,6.1,6.3],"band":[4.76,6.11]}},""" +
      """"errors":[],"passes":3}"""
    val parsed = Bench.parseCertified(doc)
    assert(parsed("aj01_asof") == ((0.245531786, None)))
    assert(parsed("g05_bet") == ((6.1, Some((4.76, 6.11)))))
    assert(Bench.certifiedTotalLanes(doc).contains((12.5, 2)))
    // junk input degrades to empty, not a crash
    assert(Bench.parseCertified("not json at all").isEmpty)
    assert(Bench.certifiedTotalLanes("{}").isEmpty)
  }

  test("parseCertified: round-trips the committed certified artifact") {
    // the real committed baseline must be readable, else the derived
    // budget and the plausibility fence silently degrade to fallbacks
    val p = java.nio.file.Paths.get("docs/BENCH_full_latest.json")
    assume(java.nio.file.Files.exists(p))
    val doc = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val parsed = Bench.parseCertified(doc)
    assert(parsed.size > 100, s"expected the full catalog, got ${parsed.size}")
    val Some((total, lanes)) = Bench.certifiedTotalLanes(doc)
    assert(lanes == parsed.size)
    // the total is the sum of medians (writer invariant)
    assert(math.abs(total - parsed.values.map(_._1).sum) < 1e-6)
  }

  test("extendBand: seeds from the first median, then widens monotonically") {
    assert(Bench.extendBand(None, 1.5) == ((1.5, 1.5)))
    assert(Bench.extendBand(Some((1.0, 2.0)), 1.5) == ((1.0, 2.0)))
    assert(Bench.extendBand(Some((1.0, 2.0)), 0.5) == ((0.5, 2.0)))
    assert(Bench.extendBand(Some((1.0, 2.0)), 2.5) == ((1.0, 2.5)))
  }

  test("bandForCapture: a refused capture never extends the band") {
    // certified capture: extends exactly like extendBand
    assert(Bench.bandForCapture(Some((1.0, 2.0)), 2.5,
      isCertifiable = true) == Some((1.0, 2.5)))
    assert(Bench.bandForCapture(None, 1.5,
      isCertifiable = true) == Some((1.5, 1.5)))
    // the round-12 failure shape: an implausible capture whose lane read
    // 6.2x its certified median must carry the PRIOR band unchanged —
    // its noise never enters certified-looking lineage
    assert(Bench.bandForCapture(Some((1.0, 2.0)), 6.7,
      isCertifiable = false) == Some((1.0, 2.0)))
    // refused capture with no certified prior: no band at all, rather
    // than one fabricated from unvetted numbers
    assert(Bench.bandForCapture(None, 6.7, isCertifiable = false).isEmpty)
  }

  test("laneRecord: a flagged lane carries its prior certified median and " +
      "band even when the capture certifies overall") {
    // the round-13 loophole, reproduced: capture certifies (<= 3 flagged
    // lanes), g08 read 12.04 s against a certified 1.12 s with band
    // [1.12, 1.50] — the baseline must keep 1.12 as median and the band
    // unchanged, NOT adopt 12.04 as band hi + next plausibility fence
    val prior = Some((1.124883338, Some((1.124883338, 1.499377695))))
    assert(Bench.laneRecord(prior, 12.035733266,
      isCertifiable = true, isFlagged = true) ==
      ((1.124883338, Some((1.124883338, 1.499377695)))))
    // flagged lane whose prior entry predates bands: band synthesized
    // from the prior median, never from the flagged reading
    assert(Bench.laneRecord(Some((0.5, None)), 6.0,
      isCertifiable = true, isFlagged = true) ==
      ((0.5, Some((0.5, 0.5)))))
  }

  test("laneRecord: an unflagged lane in a certifying capture extends " +
      "normally; a refused capture carries priors") {
    // clean lane, certifying capture: this median becomes the baseline
    // and extends the band — the pre-fix behavior, preserved
    assert(Bench.laneRecord(Some((1.0, Some((0.9, 1.1)))), 1.3,
      isCertifiable = true, isFlagged = false) ==
      ((1.3, Some((0.9, 1.3)))))
    // new lane (no prior), certifying: seeds its own band
    assert(Bench.laneRecord(None, 0.7,
      isCertifiable = true, isFlagged = false) ==
      ((0.7, Some((0.7, 0.7)))))
    // refused capture: band carries prior unchanged for every lane
    assert(Bench.laneRecord(Some((1.0, Some((0.9, 1.1)))), 6.7,
      isCertifiable = false, isFlagged = false) ==
      ((6.7, Some((0.9, 1.1)))))
    // refused + no prior: no band fabricated
    assert(Bench.laneRecord(None, 6.7,
      isCertifiable = false, isFlagged = false) == ((6.7, None)))
  }

  test("applyReseed: a legitimately-changed lane drops its certified " +
      "prior; everything else keeps the anti-laundering default") {
    // the round-14 case: cr01/cr02 gained a real LSH pass, so their
    // certified 0.5 s medians would flag them >3x forever AND the
    // flagged-lane guard would pin the stale baseline forever — the
    // explicit reseed list (builder-set, never driver-set) treats them
    // as new lanes for one certifying capture
    val cert = Map("cr01_corpus_report" -> 0.5, "cr02_datasheet_delta" -> 0.7,
      "g08_degree_shape" -> 1.1)
    val after = Bench.applyReseed(cert, Seq("cr01", "cr02"))
    assert(after == Map("g08_degree_shape" -> 1.1))
    // reseeded lanes are never flagged (no certified median left)...
    assert(Bench.implausibleLanes(
      Seq("cr01_corpus_report" -> 2.5, "g08_degree_shape" -> 1.2),
      after).isEmpty)
    // ...while an empty reseed list changes nothing
    assert(Bench.applyReseed(cert, Nil) == cert)
  }
}
