package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins byte-identity between oracle fragments that are DUPLICATED by
  * construction: the wp03 composed funnel embeds rb01's robots
  * parse-chain CTEs verbatim (factoring the mixed-literal source was
  * judged riskier than a pinned copy). If either side's chain drifts,
  * this breaks before any lane does. */
class OracleSyncSpec extends AnyFunSuite {

  test("wp03 embeds rb01's robots parse chain verbatim") {
    val rb = SparkEntry.oracleSql("rb01_robots_gate")
    val from = rb.indexOf("ln AS (")
    val to = rb.indexOf("mt AS (")
    assert(from >= 0 && to > from, "rb01 chain markers missing")
    val chain = rb.substring(from, to)
    // the chain is the whole parse pipeline, not a trivial snippet
    assert(chain.contains("rl AS (") && chain.length > 800, chain.length)
    assert(SparkEntry.oracleSql("wp03_web_robots").contains(chain),
      "wp03's copy of the robots parse chain drifted from rb01's")
  }
}
