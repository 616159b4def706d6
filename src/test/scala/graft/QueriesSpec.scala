package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and produces a sane result.
  * Oracle value-matching is covered by the driver's DuckDB gate (and
  * locally by tools/check_oracle.py); this spec guards run-ability and
  * non-emptiness so a broken query can't reach the gate silently.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // candidate-pair mining may legitimately return zero pairs on the tiny sf
  private val mayBeEmpty = Set(
    "dd01_minhash_candidates", "dd02_simhash_pairs", "dd03_ngram_jaccard",
    "dd04_embedding_neardup", "q07_never_ordered_parts",
    "q28_shared_segments", "q29_exclusive_types")

  test("every oracle query has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
