package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PortableBloom, TextFunctions}
import graft.operators.Decontaminate

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 13-token docs sharing exact 5-gram runs across the split
  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "unrelated words that never appear in any eval document at all"),
    (4L, "short text")
  ).toDF("doc_id", "text")
  private lazy val test_ = Seq(
    (10L, "alpha beta gamma delta epsilon zeta something else entirely here"),
    (11L, "prefix filler one two three four five six suffix filler")
  ).toDF("doc_id", "text")

  test("bloom probe Column twin equals the driver contains() twin") {
    val keys = Seq("alpha beta", "one two", "zeta eta", "", "x y z")
      .toDF("k")
    val bloom = PortableBloom.build(keys, col("k"), numWords = 4, numProbes = 5)
    val probes = Seq("alpha beta", "one two", "zeta eta", "", "x y z",
      "absent gram", "another absent one", "beta alpha").toDF("g")
    val (h1, h2) = PortableBloom.hashPair(col("g"))
    val got = probes
      .select(col("g"), bloom.mightContain(h1, h2).as("m"))
      .collect()
      .map(r => r.getString(0) -> r.getBoolean(1))
      .toMap
    for ((g, m) <- got)
      assert(m == bloom.contains(g), s"column/driver probe disagree on '$g'")
    // and zero false negatives on the inserted keys
    for (k <- Seq("alpha beta", "one two", "zeta eta", "", "x y z"))
      assert(got(k), s"false negative on inserted key '$k'")
  }

  test("build rejects a saturated filter (key side too large for numWords)") {
    // 100 keys x 3 probes into 256 bits sets well over half of them
    val big = spark.range(100).selectExpr("CAST(id AS STRING) AS k")
    intercept[IllegalArgumentException] {
      PortableBloom.build(big, col("k"), numWords = 4, numProbes = 3)
    }
  }

  test("bloomDecontaminate equals the bloom-free exact semi-join") {
    val n = 5
    val got = Decontaminate.bloomDecontaminate(
        train, "doc_id", "text", test_, "text", nGram = n)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // bloom-free replay: explode grams, exact semi-join, same aggregation
    val te = test_
      .select(explode(TextFunctions.wordGrams(col("text"), n)).as("g"))
      .distinct()
    val want = train
      .select(col("doc_id").as("train_id"),
        size(TextFunctions.wordGrams(col("text"), n)).cast("long").as("n_grams"),
        explode(TextFunctions.wordGrams(col("text"), n)).as("g"))
      .join(te, Seq("g"), "left_semi")
      .groupBy("train_id", "n_grams")
      .agg(count(lit(1)).as("n_hits"))
      .select(col("train_id"), col("n_hits"), col("n_grams"),
        (col("n_hits").cast("double") / col("n_grams")).as("contamination"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // and the fixture genuinely exercises both outcomes
    val ids = got.map(_._1).toSet
    assert(ids == Set(1L, 2L), s"expected docs 1 and 2 contaminated, got $ids")
  }

  test("wordGrams: counts, boundaries, and the below-n empty case") {
    val gs = train
      .select(col("doc_id"), TextFunctions.wordGrams(col("text"), 5).as("gs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    assert(gs(1L).length == 6) // 10 tokens -> 6 overlapping 5-grams
    assert(gs(1L).head == "alpha beta gamma delta epsilon")
    assert(gs(1L).last == "zeta eta theta iota kappa")
    assert(gs(4L).isEmpty) // 2 tokens < n
  }

  test("crossSourceGramOverlap: hand-computed pair matrix") {
    // s1 and s2 share exactly one 5-gram; the 'a b c d e' gram also
    // appears verbatim in s3, so all three pairs see it; s4 is disjoint
    val docs = Seq(
      ("s1", "a b c d e f"), // grams: 'a b c d e', 'b c d e f'
      ("s2", "a b c d e x"), // grams: 'a b c d e', 'b c d e x'
      ("s3", "a b c d e"), // gram: 'a b c d e'
      ("s4", "q r s t u") // gram: 'q r s t u' (shared with nobody)
    ).toDF("source", "text")
    val got = graft.operators.Decontaminate
      .crossSourceGramOverlap(docs, "source", "text", nGram = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("s1", "s2") -> 1L, ("s1", "s3") -> 1L, ("s2", "s3") -> 1L))
    // duplicate grams within one source count ONCE (distinct semantics)
    val dup = Seq(
      ("s1", "a b c d e a b c d e a b c d e"), // 'a b c d e' many times
      ("s2", "a b c d e")).toDF("source", "text")
    val got2 = graft.operators.Decontaminate
      .crossSourceGramOverlap(dup, "source", "text", nGram = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got2 == Map(("s1", "s2") -> 1L))
  }
}
