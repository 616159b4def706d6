package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.CorpusStats

class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 docs, hand-countable vocabulary: a:5, b:3, c:2, d:1  (T=11, V=4)
  private def corpus = Seq(
    (1L, "a a b"),
    (2L, "a b c"),
    (3L, "a a b c"),
    (4L, "d")).toDF("doc_id", "text")

  private def nllMicro(c: Long, denom: Double): Long =
    math.round(-math.log((c + 1).toDouble / denom) / math.log(2.0) * 1e6)

  test("unigramSurprisal: hand-computed add-one model, full vocab") {
    val out = CorpusStats.unigramSurprisal(corpus, "doc_id", "text", vocabCap = 10)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val denom = 11.0 + 4.0
    val a = nllMicro(5, denom); val b = nllMicro(3, denom)
    val c = nllMicro(2, denom); val d = nllMicro(1, denom)
    assert(out.toSeq == Seq(
      (1L, 3L, (2 * a + b) / 3),
      (2L, 3L, (a + b + c) / 3),
      (3L, 4L, (2 * a + b + c) / 4),
      (4L, 1L, d)))
  }

  test("tokenizeToIds: frequency-ranked ids in document order, OOV -> 0") {
    // vocab order (count desc, tok): a=1, b=2, c=3; d beyond vocabSize=3
    val out = CorpusStats.tokenizeToIds(corpus, "doc_id", "text", vocabSize = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, Seq(1L, 1L, 2L), 3L, 0L),
      (2L, Seq(1L, 2L, 3L), 3L, 0L),
      (3L, Seq(1L, 1L, 2L, 3L), 4L, 0L),
      (4L, Seq(0L), 1L, 1L)))
    // full vocab: d gets id 4
    val full = CorpusStats.tokenizeToIds(corpus, "doc_id", "text", vocabSize = 10)
      .filter(col("doc_id") === 4L).head()
    assert(full.getSeq[Long](1) == Seq(4L) && full.getLong(3) == 0L)
  }

  test("bm25TopK: exact integer-chain driver replay; unmatched docs absent") {
    val docs = Seq(
      (1L, "x x x a b"), // tf(x)=3, len 5
      (2L, "x a a a a a"), // tf(x)=1, long doc
      (3L, "b b b b"), // no query term -> absent
      (4L, "x y")).toDF("doc_id", "text") // tf(x)=1, short doc
    val (n, t) = (4L, 17L)
    val avgMicro = t * 1000000L / n
    val dfx = 3L
    val idf = math.round(math.log((n - dfx + 0.5) / (dfx + 0.5) + 1.0) /
      math.log(2.0) * 1e6)
    def score(tf: Long, len: Long): Long = {
      val ratio = len * 1000000000000L / avgMicro
      val norm = 250000L + 750000L * ratio / 1000000L
      val tfpart = tf * 2200000L * 1000000L /
        (tf * 1000000L + 1200000L * norm / 1000000L)
      idf * tfpart / 1000000L
    }
    val expected = Seq(
      (1L, score(3, 5)), (2L, score(1, 6)), (4L, score(1, 2)))
      .sortBy(p => (-p._2, p._1))
    val got = CorpusStats.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected)
    // the short doc outranks the long one at equal tf (length norm),
    // and high-tf doc 1 ranks first
    assert(got.head._1 == 1L && got(1)._1 == 4L && got(2)._1 == 2L)
  }

  test("bm25TopK: all-blank corpus returns the empty frame, no NPE") {
    val docs = Seq((1L, " "), (2L, "")).toDF("doc_id", "text")
    val out = CorpusStats.bm25TopK(docs, "doc_id", "text", Seq("x"))
    assert(out.columns.toSeq == Seq("doc_id", "score_micro"))
    assert(out.count() == 0L)
  }

  test("bm25TopKFromIndex: byte-identical to the row-local form on the " +
      "same corpus") {
    // the index form is what the incremental tier maintains — its
    // per-posting scoring must reproduce the row-local chain exactly,
    // multi-term (per-doc contributions SUM across terms) and
    // zero-df (a pinned query term absent from the corpus) included
    val docs = Seq(
      (1L, "x x x a b"), (2L, "x a a a a a"), (3L, "b b b b"),
      (4L, "x y"), (5L, " "), (6L, "y y b x")).toDF("doc_id", "text")
    val (postings, lens) = CorpusStats.bm25Index(docs, "doc_id", "text")
    for (q <- Seq(Seq("x"), Seq("x", "b"), Seq("x", "y", "zzz_absent"))) {
      val direct = CorpusStats.bm25TopK(docs, "doc_id", "text", q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val viaIndex = CorpusStats.bm25TopKFromIndex(
        postings, lens, "doc_id", q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaIndex == direct, s"query $q")
    }
    // empty index serves the empty frame
    val empty = CorpusStats.bm25Index(
      Seq((1L, " ")).toDF("doc_id", "text"), "doc_id", "text")
    assert(CorpusStats.bm25TopKFromIndex(
      empty._1, empty._2, "doc_id", Seq("x")).count() == 0L)
  }

  test("bm25BatchTopK: one-query slices reproduce the single-query form; " +
      "ranks restart per query; duplicate and absent terms behave") {
    val docs = Seq(
      (1L, "x x x a b"), (2L, "x a a a a a"), (3L, "b b b b"),
      (4L, "x y"), (6L, "y y b x")).toDF("doc_id", "text")
    val (postings, lens) = CorpusStats.bm25Index(docs, "doc_id", "text")
    // equivalence against the driver-literal single-query scorer —
    // multi-term and zero-df included (the scaladoc's promise)
    for (q <- Seq(Seq("x"), Seq("x", "b"), Seq("x", "y", "zzz_absent"))) {
      val direct = CorpusStats.bm25TopKFromIndex(
        postings, lens, "doc_id", q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val qf = q.map(t => (7L, t)).toDF("qid", "term")
      val batch = CorpusStats.bm25BatchTopK(
        postings, lens, "doc_id", qf, "qid", "term", k = 10)
        .orderBy(col("rank"))
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
      assert(batch == direct, s"query $q")
    }
    // multi-query frame: per-query ranks are independent 1..k runs,
    // duplicate (qid, term) rows fold to one contribution, and a
    // query whose only term is absent from the corpus emits nothing
    val qf = Seq((1L, "x"), (1L, "x"), (2L, "b"), (3L, "zzz_absent"))
      .toDF("qid", "term")
    val out = CorpusStats.bm25BatchTopK(
      postings, lens, "doc_id", qf, "qid", "term", k = 2)
      .orderBy(col("qid"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 1L, 2L, 2L))
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 1L, 2L))
    val directX = CorpusStats.bm25TopKFromIndex(
      postings, lens, "doc_id", Seq("x"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._4)).toSeq == directX)
    // empty corpus serves the empty frame with the contract columns
    val empty = CorpusStats.bm25Index(
      Seq((1L, " ")).toDF("doc_id", "text"), "doc_id", "text")
    val e = CorpusStats.bm25BatchTopK(
      empty._1, empty._2, "doc_id", qf, "qid", "term")
    assert(e.columns.toSeq == Seq("qid", "doc_id", "rank", "score_micro"))
    assert(e.count() == 0L)
  }

  test("temperatureWeights: hand-computed sqrt smoothing upweights the small source") {
    // big: 16 tokens, small: 4 -> raw shares 800/200 permille, smoothed
    // sqrt weights 4e6/2e6 -> shares 666666/333333 micro (exact floor)
    val docs = Seq(
      (1L, (1 to 16).map(_ => "a").mkString(" "), "big"),
      (2L, "b b b b", "small")).toDF("doc_id", "text", "src")
    val out = CorpusStats.temperatureWeights(docs, "src", "text")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("big", 16L, 4000000L, 666666L),
      ("small", 4L, 2000000L, 333333L)))
    // two sqrt steps: 16^(1/4)=2, 4^(1/4)=sqrt(2) -> weights 2e6 /
    // floor(sqrt(2)*1e6)=1414213; the small share rises again
    val out2 = CorpusStats.temperatureWeights(docs, "src", "text", sqrtSteps = 2)
      .orderBy("src").collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out2.toSeq == Seq(
      ("big", 2000000L, 2000000L * 1000000L / 3414213L),
      ("small", 1414213L, 1414213L * 1000000L / 3414213L)))
    // empty corpus: zero weights, zero shares, no division error
    val empty = Seq((1L, " ", "x")).toDF("doc_id", "text", "src")
    val e = CorpusStats.temperatureWeights(empty, "src", "text").head()
    assert(e.getLong(2) == 0L && e.getLong(3) == 0L)
  }

  test("naiveBayesPredict: hand-computed model, exact tie-break, tokenless absent") {
    // symmetric 2-class corpus: en tokens a:3 b:1 c:1 (T=5), fr tokens
    // c:3 d:1 a:1 (T=5), V=4; docs 5/6 share text "a c" so their class
    // scores tie EXACTLY and the argmin must break by label ("en").
    // docs 7/8 have no tokens -> absent (and keep priors symmetric).
    val docs = Seq(
      (1L, "a", "en"), (2L, "a b", "en"), (5L, "a c", "en"),
      (3L, "c", "fr"), (4L, "c d", "fr"), (6L, "a c", "fr"),
      (7L, " ", "en"), (8L, "", "fr")).toDF("doc_id", "text", "lang")
    val out = CorpusStats.naiveBayesPredict(docs, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val prior = nllMicro(3, 8.0) // 4 docs of 8 per class: -log2(1/2)
    assert(out.map(t => (t._1, t._2, t._4)).toSeq == Seq(
      (1L, "en", true), (2L, "en", true), (3L, "fr", true),
      (4L, "fr", true), (5L, "en", true), (6L, "en", false)))
    // doc 1 "a" under en: prior + nll((3+1)/(5+4))
    assert(out.head._3 == prior + nllMicro(3, 9.0))
    // the tied pair carries the identical score on both rows
    assert(out(4)._3 == out(5)._3)
  }

  test("naiveBayesCalibration: accuracy per exact margin bin; null bin for one class") {
    // the nb01 spec corpus: symmetric 2-class, docs 5/6 tie EXACTLY
    // (margin 0 -> bin 0, one of two correct); docs 1/3 differ by one
    // token nll = exactly 1.0 bits (bin 1), docs 2/4 by 2.0 bits (bin 2)
    val docs = Seq(
      (1L, "a", "en"), (2L, "a b", "en"), (5L, "a c", "en"),
      (3L, "c", "fr"), (4L, "c d", "fr"), (6L, "a c", "fr"),
      (7L, " ", "en"), (8L, "", "fr")).toDF("doc_id", "text", "lang")
    val out = CorpusStats.naiveBayesCalibration(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 500L),
      (1L, 2L, 2L, 1000L),
      (2L, 2L, 2L, 1000L)))
    // one-class corpus: no runner-up, the whole corpus surfaces in the
    // null margin bin (a data bug made visible, not dropped)
    val one = Seq((1L, "a", "en"), (2L, "b", "en")).toDF("doc_id", "text", "lang")
    val nulls = CorpusStats.naiveBayesCalibration(one, "doc_id", "text", "lang")
      .collect()
    assert(nulls.length == 1 && nulls.head.isNullAt(0) &&
      nulls.head.getLong(1) == 2L && nulls.head.getLong(3) == 1000L)
  }

  test("bigramSurprisal: hand-computed conditional add-one model") {
    // corpus bigrams: "a a":2, "a b":3, "b c":2; contexts a:5, b:3; V=4
    val out = CorpusStats.bigramSurprisal(corpus, "doc_id", "text", vocabCap = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val aa = nllMicro(2, 9.0) // (2+1)/(5+4)
    val ab = nllMicro(3, 9.0)
    val bc = nllMicro(2, 7.0) // (2+1)/(3+4)
    assert(out.toSeq == Seq(
      (1L, 2L, (aa + ab) / 2),
      (2L, 2L, (ab + bc) / 2),
      (3L, 3L, (aa + ab + bc) / 3))) // doc4 has no bigrams: absent
  }

  test("bigramSurprisal: OOV bigrams and contexts score with count 0") {
    // vocabCap=1 keeps only bigram "a b" (cb 3) and context "a" (cu 5)
    val out = CorpusStats.bigramSurprisal(corpus, "doc_id", "text", vocabCap = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val aaOov = nllMicro(0, 9.0) // cb OOV, ctx a kept
    val ab = nllMicro(3, 9.0)
    val bcOov = nllMicro(0, 4.0) // both OOV: (0+1)/(0+4) = 2 bits exactly
    assert(bcOov == 2000000L)
    assert(out(1L) == (aaOov + ab) / 2)
    assert(out(2L) == (ab + bcOov) / 2)
    assert(out(3L) == (aaOov + ab + bcOov) / 3)
  }

  test("perplexityBuckets: tercile cuts at binWidth 1 are exact; coarse bins merge") {
    // per-doc surprisal over the shared corpus (denom 15):
    // doc1 1516915 < doc3 1718168 < doc2 1850249 < doc4 2906891.
    // N=4: t1 = 2nd smallest (ceil(1.332)=2), t2 = 3rd (ceil(2.668)=3)
    val out = CorpusStats.perplexityBuckets(corpus, "doc_id", "text",
      vocabCap = 10, binWidth = 1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "head"), (2L, "middle"), (3L, "head"), (4L, "tail")))
    // a bin wider than the whole value range merges every doc into the
    // quantile bin -> everything is head (bin-granular by contract)
    val coarse = CorpusStats.perplexityBuckets(corpus, "doc_id", "text",
      vocabCap = 10, binWidth = 10000000L)
      .select("ppl_bucket").collect().map(_.getString(0)).toSet
    assert(coarse == Set("head"))
    // empty corpus: zero rows, schema intact
    val empty = CorpusStats.perplexityBuckets(
      corpus.filter(col("doc_id") > 99L), "doc_id", "text")
    assert(empty.columns.toSeq ==
      Seq("doc_id", "n_tokens", "nll_micro_avg", "ppl_bucket"))
    assert(empty.count() == 0L)
  }

  test("stupidBackoffSurprisal: direct ratio with full caps, backoff under cap 1") {
    def dir(cb: Long, cu: Long): Long =
      math.round(-math.log(cb.toDouble / cu) / math.log(2.0) * 1e6)
    def bo(cw: Long, denom: Double): Long =
      math.round(-math.log(0.4 * (cw + 1) / denom) / math.log(2.0) * 1e6)
    // full cap: every position direct — "a a" 2/5, "a b" 3/5, "b c" 2/3
    val full = CorpusStats.stupidBackoffSurprisal(corpus, "doc_id", "text", vocabCap = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (aa, ab, bc) = (dir(2, 5), dir(3, 5), dir(2, 3))
    assert(full.toSeq == Seq(
      (1L, 2L, 0L, (aa + ab) / 2),
      (2L, 2L, 0L, (ab + bc) / 2),
      (3L, 3L, 0L, (aa + ab + bc) / 3))) // doc4: no bigrams, absent
    // cap 1 keeps bigram "a b" (cb 3) and context "a" (cu 5); "a a" and
    // "b c" back off — "a a" to in-cap w2 a (cw 5), "b c" to OOV c (cw 0)
    val capped = CorpusStats.stupidBackoffSurprisal(corpus, "doc_id", "text", vocabCap = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val (boA, boOov) = (bo(5, 15.0), bo(0, 15.0))
    assert(capped.toSeq == Seq(
      (1L, 1L, (boA + dir(3, 5)) / 2),
      (2L, 1L, (dir(3, 5) + boOov) / 2),
      (3L, 2L, (boA + dir(3, 5) + boOov) / 3)))
  }

  test("stupidBackoffSurprisal: an in-cap bigram with a capped-out context backs off") {
    // unigrams a:3, q:2, r:2 -> cap-1 unigram table {a}; bigrams
    // {"q r":2} -> cap-1 bigram table {"q r"} whose context q is NOT in
    // the unigram table, so the position must take the backoff path
    // (w2 = r is also OOV: cw 0; T=7, V=3, denom=10)
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "q r"), (5L, "q r"))
      .toDF("doc_id", "text")
    val out = CorpusStats.stupidBackoffSurprisal(docs, "doc_id", "text", vocabCap = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bo = math.round(-math.log(0.4 * 1 / 10.0) / math.log(2.0) * 1e6)
    assert(out.toSeq == Seq((4L, 1L, 1L, bo), (5L, 1L, 1L, bo)))
  }

  test("unigramSurprisal: tokens beyond vocabCap score as OOV (count 0)") {
    // cap 2 keeps {a, b}; c and d become OOV but T and V stay corpus-wide
    val out = CorpusStats.unigramSurprisal(corpus, "doc_id", "text", vocabCap = 2)
      .orderBy("doc_id").collect()
    val denom = 15.0
    val oov = nllMicro(0, denom)
    assert(out(3).getLong(2) == oov) // doc 4 is a single OOV token
    // doc 2 = a + b + oov(c)
    assert(out(1).getLong(2) ==
      (nllMicro(5, denom) + nllMicro(3, denom) + oov) / 3)
    // OOV is the most surprising class
    assert(oov > nllMicro(1, denom))
  }

  test("unigramSurprisal: vocab cap tie-break is deterministic (count desc, token asc)") {
    // x and y both occur twice; cap 1 must keep x (token asc)
    val docs = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    val out = CorpusStats.unigramSurprisal(docs, "doc_id", "text", vocabCap = 1)
      .orderBy("doc_id").collect()
    val denom = 6.0 // T=4, V=2
    val inV = nllMicro(2, denom); val oov = nllMicro(0, denom)
    assert(out(0).getLong(2) == (inV + oov) / 2)
    assert(out(1).getLong(2) == (inV + oov) / 2)
  }

  test("tfidfTopTerms: rare terms outrank common ones") {
    // "common" is in every doc (idf floor), each doc has one rare term
    val docs = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common rare3"),
      (4L, "common rare4")).toDF("doc_id", "text")
    val out = CorpusStats.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    // rare term first (df=1), common second (df=4) — even doc 1's double
    // "common" (tf=2, score exactly 2.0e6) loses to rare1's log2(2.5)+1
    val n1 = 5.0 // N+1
    def score(tf: Long, df: Long): Long =
      math.round(tf * (math.log(n1 / (df + 1)) / math.log(2.0) + 1) * 1e6)
    assert(score(1, 1) > score(2, 4))
    assert(out.toSeq == Seq(
      (1L, "rare1", 1L, 1L), (1L, "common", 2L, 2L),
      (2L, "rare2", 1L, 1L), (2L, "common", 1L, 2L),
      (3L, "rare3", 1L, 1L), (3L, "common", 1L, 2L),
      (4L, "rare4", 1L, 1L), (4L, "common", 1L, 2L)))
  }

  test("tfidfTopTerms: rank ties break by token ascending") {
    val docs = Seq((1L, "beta alpha")).toDF("doc_id", "text")
    val out = CorpusStats.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("rank").collect().map(_.getString(1))
    assert(out.toSeq == Seq("alpha", "beta")) // identical scores
  }

  test("boilerplateScore: permille of grams above the df threshold") {
    // exactly one shared 3-gram ("the same header") in docs 1-3: the
    // 4th token diverges, so "same header <x>" grams stay unique
    val docs = Seq(
      (1L, "the same header one unique tail"),
      (2L, "the same header two unique tail"),
      (3L, "the same header three unique tail"),
      (4L, "totally different text here now ok")).toDF("doc_id", "text")
    val out = CorpusStats.boilerplateScore(docs, "doc_id", "text", nGram = 3, minDf = 3L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // each doc has 4 3-grams; only "the same header" reaches df=3
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 250L, 3L),
      (2L, 4L, 1L, 250L, 3L),
      (3L, 4L, 1L, 250L, 3L),
      (4L, 4L, 0L, 0L, 1L)))
  }

  test("boilerplateScore: repeated grams within a doc count per occurrence") {
    // doc 1 contains "a b c" twice; df counts docs (2), occurrences count
    // grams (2 of doc 1's 4)
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b c d")).toDF("doc_id", "text")
    val out = CorpusStats.boilerplateScore(docs, "doc_id", "text", nGram = 3, minDf = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, 500L, 2L),
      (2L, 2L, 1L, 500L, 2L)))
  }

  test("boilerplateScore: window formulation ≡ FromCounts (relational) formulation") {
    // the default path computes df with one window over gh; the extreme-
    // skew path (pre-materialized counts + groupBy + join) must agree on
    // every column — 60 docs with shared headers, repeats, and short docs
    val docs = (1L to 60L).map { i =>
      val body =
        if (i % 3 == 0) s"shared site header text then unique tail $i"
        else if (i % 3 == 1) s"shared site header text plus body $i repeated body $i"
        else s"only unique words here ${i}a ${i}b ${i}c"
      (i, body)
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val fast = canon(
      CorpusStats.boilerplateScore(docs, "doc_id", "text", nGram = 3, minDf = 5L))
    val relational = canon(
      CorpusStats.boilerplateScoreFromCounts(
        CorpusStats.docGramCounts(docs, "doc_id", "text", 3)
          .localCheckpoint(true), "doc_id", minDf = 5L))
    assert(fast == relational)
  }

  test("boilerplateScore: docs shorter than nGram are absent") {
    val docs = Seq((1L, "one two"), (2L, "one two three")).toDF("doc_id", "text")
    val out = CorpusStats.boilerplateScore(docs, "doc_id", "text", nGram = 3, minDf = 2L)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("removeBoilerplateLines: drops cross-doc lines, keeps unique ones in order") {
    val banner = "ACCEPT COOKIES"
    val footer = "(c) 2026 example.com"
    val docs = Seq(
      (1L, s"$banner\nfirst unique line\n$footer", "en"),
      (2L, s"$banner\nsecond unique line\n$footer", "en"),
      (3L, s"$banner\nthird unique line\nmore text\n$footer", "de"),
      (4L, "no boilerplate at all\njust content", "fr")).toDF("doc_id", "text", "lang")
    val out = CorpusStats.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq(
      "first unique line",
      "second unique line",
      "third unique line\nmore text",
      "no boilerplate at all\njust content"))
    // non-text columns pass through
    assert(out.map(_.getString(2)).toSeq == Seq("en", "en", "de", "fr"))
  }

  test("removeBoilerplateLines: CRLF input matches LF boilerplate; output is LF") {
    val docs = Seq(
      (1L, "SAME\r\nkeep a"),
      (2L, "SAME\nkeep b"),
      (3L, "SAME\r\nkeep c\r\nkeep d")).toDF("doc_id", "text")
    val out = CorpusStats.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3L)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("keep a", "keep b", "keep c\nkeep d"))
  }

  test("removeBoilerplateLines: a doc that is ALL boilerplate becomes empty text") {
    val docs = Seq(
      (1L, "SAME"), (2L, "SAME"), (3L, "SAME\nkept line")).toDF("doc_id", "text")
    val out = CorpusStats.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3L)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("", "", "kept line"))
  }

  test("empty/whitespace docs are absent from token-model outputs, not zeroed") {
    val docs = Seq((1L, "real tokens here"), (2L, "   ")).toDF("doc_id", "text")
    assert(CorpusStats.unigramSurprisal(docs, "doc_id", "text", 10)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(CorpusStats.tfidfTopTerms(docs, "doc_id", "text", 3)
      .select("doc_id").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("removeBoilerplateLines: untouched docs keep their text verbatim (incl CRLF)") {
    val docs = Seq(
      (1L, "only\r\ndoc"), (2L, "another one")).toDF("doc_id", "text")
    val out = CorpusStats.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 2L)
      .orderBy("doc_id").collect().map(_.getString(1))
    // no line reaches minDocs, so even CRLF text passes through unmodified
    assert(out.toSeq == Seq("only\r\ndoc", "another one"))
  }

  test("mixtureWeights: per-source totals and exact permille shares") {
    val docs = Seq(
      (1L, "one two three", "web"),
      (2L, "four five", "web"),
      (3L, "six", "books")).toDF("doc_id", "text", "source")
    val out = CorpusStats.mixtureWeights(docs, "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("books", 1L, 1L, 3L, 166L), // floor(1000/6)
      ("web", 2L, 5L, 22L, 833L))) // floor(5000/6)
  }

  test("redactPii: emails, phones, IPs replaced; counts agree") {
    val txt = "Mail alice.smith+x@sub.example.org or bob@x.io, " +
      "call +44-20-7946-0958, server 192.168.1.255 and 10.0.0.1."
    val df = Seq(txt).toDF("text")
    val red = df.select(TextFunctions.redactPii(col("text"))).head.getString(0)
    assert(red == "Mail <EMAIL> or <EMAIL>, call <PHONE>, " +
      "server <IP> and <IP>.")
    val (e, p, i) = TextFunctions.piiCounts(col("text"))
    val r = df.select(e, p, i).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 2L)))
  }

  test("piiCounts mirror the redaction cascade: nested matches count once") {
    // a phone-shaped digit run inside the email's local part, and an
    // IP-shaped email domain: both are swallowed by the email pass, so
    // they must count as emails only — exactly what the output shows
    val txt = "x+1-222-333-4444@example.com and root@10.1.2.3.org plus " +
      "a real +1-555-000-1111 and host 172.16.0.9"
    val df = Seq(txt).toDF("text")
    val red = df.select(TextFunctions.redactPii(col("text"))).head.getString(0)
    assert(red == "<EMAIL> and <EMAIL> plus a real <PHONE> and host <IP>")
    val (e, p, i) = TextFunctions.piiCounts(col("text"))
    val r = df.select(e, p, i).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)),
      s"counts must equal the markers in: $red")
  }

  test("redactPii: plain text untouched; no false positives on versions/decimals") {
    val txt = "version 1.2.3 costs 10.50 at 3-4pm"
    val red = Seq(txt).toDF("text")
      .select(TextFunctions.redactPii(col("text"))).head.getString(0)
    assert(red == txt)
  }

  test("heavyHitters equals the full-vocabulary wordcount top-k") {
    // zipf-ish fixture: "alpha" 12x, "beta" 8x, "gamma" 5x, tail 1x each
    // (alpha 7+5, beta 3+5, gamma 1+2+2)
    val docs = Seq(
      (1L, ("alpha " * 7 + "beta " * 3 + "gamma rare1 rare2").trim),
      (2L, ("alpha " * 5 + "beta " * 5 + "gamma gamma rare3 rare4").trim),
      (3L, "gamma gamma rare5 rare6 rare7")
    ).toDF("doc_id", "text")
    val got = CorpusStats.heavyHitters(docs, "doc_id", "text",
        k = 3, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = CorpusStats.termCounts(docs, "doc_id", "text")
      .orderBy(desc("c"), asc("tok")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got == Seq(("alpha", 12L), ("beta", 8L), ("gamma", 5L)))
  }

  test("heavyHitters: result is exact even when partitions disagree") {
    // many distinct tokens + a skewed head, spread over several
    // partitions so Misra-Gries decrements actually fire (capacity 4)
    val rows = (1 to 200).map { i =>
      val head = if (i % 2 == 0) "hot " * 5 else "warm " * 3
      (i.toLong, head + s"tail$i uniq${i}a uniq${i}b uniq${i}c")
    }
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text")
      .repartition(8)
    val got = CorpusStats.heavyHitters(docs, "doc_id", "text",
        k = 2, capacity = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("hot", 500L), ("warm", 300L)))
  }

  test("heavyHitters refuses an uncertifiable top-k instead of guessing") {
    // 50 distinct tokens but k = 60: fewer candidates than k can ever
    // exist, so no certificate is possible — must throw, never return a
    // short/approximate answer
    val docs = Seq((1L, (1 to 50).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text").repartition(4)
    intercept[IllegalArgumentException] {
      CorpusStats.heavyHitters(docs, "doc_id", "text", k = 60, capacity = 60)
    }
  }

  test("dsirWeights matches a driver-side replay of the hashed-ngram LLR") {
    import graft.functions.PortableHash
    val raw = Seq(
      (1L, "alpha beta alpha"),
      (2L, "gamma delta epsilon"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val target = Seq("alpha beta", "alpha beta alpha zeta")
      .toDF("text")
    val buckets = 16
    def feats(text: String): Seq[Int] = {
      val ts = text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      val uni = ts
      val bi = if (ts.length < 2) Seq.empty
               else ts.sliding(2).map(_.mkString(" ")).toSeq
      (uni ++ bi).map(f => (PortableHash.md5_32(f) % buckets).toInt)
    }
    val rawDocs = Map(
      1L -> "alpha beta alpha", 2L -> "gamma delta epsilon",
      3L -> "alpha beta gamma")
    val tCnt = Seq("alpha beta", "alpha beta alpha zeta")
      .flatMap(feats).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rCnt = rawDocs.values.flatMap(feats)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTot = tCnt.values.sum; val rTot = rCnt.values.sum
    def llr(b: Int): Long = math.round(
      (math.log(
        ((tCnt.getOrElse(b, 0L) + 1).toDouble / (tTot + buckets)) /
        ((rCnt.getOrElse(b, 0L) + 1).toDouble / (rTot + buckets))) /
        math.log(2.0)) * 1e6)
    val expected = rawDocs.map { case (id, text) =>
      val fs = feats(text)
      (id, fs.size.toLong, fs.map(llr).sum)
    }.toSeq.sortBy(_._1)
    val got = CorpusStats.dsirWeights(raw, "doc_id", "text", target, "text",
        buckets = buckets)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("dsirWeights ranks target-like raw docs above off-target ones") {
    val raw = (1 to 20).map { i =>
      if (i % 2 == 0) (i.toLong, "spark shuffle partition broadcast join")
      else (i.toLong, "cooking pasta tomato basil dinner")
    }.toDF("doc_id", "text")
    val target = Seq("spark broadcast join", "spark shuffle partition")
      .toDF("text")
    val w = CorpusStats.dsirWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val evens = (2 to 20 by 2).map(i => w(i.toLong))
    val odds = (1 to 19 by 2).map(i => w(i.toLong))
    assert(evens.min > odds.max,
      s"target-like docs must outscore off-target: $w")
  }

  test("novelGramRate: first doc owns its grams, repeats inside it still count novel") {
    val d = Seq(
      (1L, "a b c a b c"),     // grams: abc bca cab abc — all owned by doc 1
      (2L, "a b c x y z"),     // abc seen; bcx cxy xyz novel
      (3L, "a b c")            // abc only — nothing novel
    ).toDF("doc_id", "text")
    val got = CorpusStats.novelGramRate(d, "doc_id", "text", nGram = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 4L, 1000L),
      (2L, 4L, 3L, 750L),
      (3L, 1L, 0L, 0L)))
  }

  test("psiDrift: zero on identical distributions, exact on a known shift") {
    val ref = Seq.tabulate(60)(i => (i.toLong, (i % 3).toLong))
      .toDF("id", "bucket")
    // identical shares (and equal totals): p == q exactly -> psi 0
    val same = CorpusStats.psiDrift(ref, ref, "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(same.length == 3 && same.forall(_._2 == 0L), same.toSeq)
    // shifted: driver replay of the exact smoothing + log2 + rounding
    val cur = Seq.tabulate(40)(i => (i.toLong, (i % 2).toLong))
      .toDF("id", "bucket") // bucket 2 empty on the cur side
    val got = CorpusStats.psiDrift(ref, cur, "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    def psi(nr: Long, nc: Long): Long = {
      val p = (nr + 1).toDouble / 63.0 // tRef 60 + 3 buckets
      val q = (nc + 1).toDouble / 43.0 // tCur 40 + 3 buckets
      math.round((p - q) * (math.log(p / q) / math.log(2.0)) * 1e6)
    }
    assert(got == Seq(
      (0L, 20L, 20L, psi(20, 20)),
      (1L, 20L, 20L, psi(20, 20)),
      (2L, 20L, 0L, psi(20, 0))))
    assert(got(2)._4 > 0L, "a vanished bucket must contribute positive PSI")
  }

  test("ksDrift: identical samples gap 0; a shifted sample yields the exact max gap") {
    val a = Seq.tabulate(40)(i => (i.toLong, (i % 4 + 1).toLong))
      .toDF("id", "v") // values 1..4, 10 each
    val same = CorpusStats.ksDrift(a, a, "v").collect()
    assert(same.forall(_.getLong(5) == 0L))
    // b shifted up by 2: values 3..6, 10 each. ECDFs (micro):
    // value 1: A 250000, B 0        -> gap 250000
    // value 2: A 500000, B 0        -> gap 500000
    // value 3: A 750000, B 250000   -> gap 500000
    // value 4: A 1000000, B 500000  -> gap 500000  (KS = 0.5)
    val b = Seq.tabulate(40)(i => (i.toLong, (i % 4 + 3).toLong))
      .toDF("id", "v")
    val got = CorpusStats.ksDrift(a, b, "v")
      .collect().map(r => (r.getLong(0), r.getLong(5))).toSeq
    assert(got.head == (2L, 500000L), got) // max gap, smallest value first
    assert(got.take(3).map(_._2).forall(_ == 500000L))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("groupTokenEntropy: uniform vs degenerate sources, exact micro-bits") {
    val d = Seq(
      (1L, "u", "a b c d"),   // uniform over 4 tokens: H = 2 bits exactly
      (2L, "k", "x x x x")    // degenerate: H = 0
    ).toDF("doc_id", "src", "text")
    val got = CorpusStats.groupTokenEntropy(d, "src", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 0L),
      ("u", 4L, 4L, 2000000L)))
  }

  test("tokenizerFertility: exact counts and permille per language") {
    val d = Seq(
      (1L, "en", "hello world"),        // 2 tokens, 2 subwords
      (2L, "en", "foo42 bar!"),         // 2 tokens, 5 subwords (foo,42,bar,!)
      (3L, "de", "übermäßig gut"),      // 2 tokens; non-ASCII letters are
                                        // single-char subwords under the
                                        // [A-Za-z] proxy: 2+4+1+3 chars..
      (4L, "xx", ""), (5L, "xx", "  ")  // empty/whitespace-only: 0 tokens
                                        // (not split("")'s phantom [""]),
                                        // 0 subwords — fertility 0/max(0,1)
    ).toDF("doc_id", "lang", "text")
    val got = CorpusStats.tokenizerFertility(d, "lang", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    // de: "übermäßig gut" -> letters runs split at non-ASCII chars:
    // ü|berm|ä|ß|ig|gut = subwords: ü,berm,ä,ß,ig,gut = 6
    // en: hello,world + foo,42,bar,! = 6 subwords over 4 tokens
    assert(got == Seq(
      ("de", 1L, 2L, 6L, 3000L),
      ("en", 2L, 4L, 6L, 1500L),
      ("xx", 2L, 0L, 0L, 0L)))
  }

  test("classifierReport: exact marginals, permilles, and a pred-only label") {
    val scored = Seq(
      ("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de"), ("de", "xx")).toDF("truth", "pred")
    val got = CorpusStats.classifierReport(scored, "truth", "pred")
      .orderBy("label")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // de: n_true 2, n_pred 2, tp 1 -> p 500, r 500, f1 500
    // en: n_true 3, n_pred 2, tp 2 -> p 1000, r 666, f1 (2*1000*666)//1666 = 799
    // xx: pred-only -> n_true 0, tp 0, everything 0
    assert(got == Seq(
      ("de", 2L, 2L, 1L, 500L, 500L, 500L),
      ("en", 3L, 2L, 2L, 1000L, 666L, 799L),
      ("xx", 0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("charEntropy: exact micro-bits on closed-form distributions") {
    // "A a B b" lowers+strips to "aabb": p(a)=p(b)=1/2 -> exactly 1 bit;
    // "abcd": uniform over 4 -> exactly 2 bits; "aaaa": 0 bits
    val docs = Seq((1L, "A a B b"), (2L, "abcd"), (3L, "aaaa"), (4L, "  "))
      .toDF("doc_id", "text")
    val got = CorpusStats.charEntropy(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, 2L, 1000000L),
      (2L, 4L, 4L, 2000000L),
      (3L, 4L, 1L, 0L))) // doc 4 is whitespace-only: no row
  }

  test("charEntropy: wide-alphabet 100 kB document in one task") {
    // the round-9 cut rescanned the char list once per distinct char —
    // O(charset × len); this fixture (1,000-symbol alphabet × 100
    // copies + a skew head) would have cost ~10⁸ comparisons and now
    // costs one sort. Closed form: 'z' appears 4,000 times of 104,000
    // (p = 1/26), the other 1,000 symbols 100 times each (p = 1/1040).
    // CJK ideographs: caseless (lower() is identity) and non-whitespace
    val alphabet = (0 until 1000).map(i => (0x4E00 + i).toChar.toString)
    val body = (alphabet.mkString * 100) + ("z" * 4000)
    val docs = Seq((1L, body)).toDF("doc_id", "text")
    val r = CorpusStats.charEntropy(docs, "doc_id", "text").head()
    assert(r.getLong(1) == 104000L)
    assert(r.getLong(2) == 1001L)
    // exact integer replay of the operator's micro-bit fold
    val t1 = 100L * Math.round(-(Math.log(100.0 / 104000.0) /
      Math.log(2.0)) * 1e6)
    val t2 = 4000L * Math.round(-(Math.log(4000.0 / 104000.0) /
      Math.log(2.0)) * 1e6)
    assert(r.getLong(3) == Math.floorDiv(1000L * t1 + t2, 104000L))
  }

  test("quantileBins: binWidth=1 equals the exact type-1 quantile") {
    // values 1..100 (as n_chars stand-in): type-1 quantile at permille q
    // is the ceil(q*N/1000)-th smallest value
    val vals = (1 to 100).map(_.toLong)
    val df = vals.map(v => (v, v)).toDF("doc_id", "v")
    val qs = Seq(1, 250, 500, 750, 990, 1000)
    val got = CorpusStats.quantileBins(df, "v", binWidth = 1L, qs = qs)
      .orderBy(col("q_permille")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    val want = qs.map { q =>
      val k = (q.toLong * 100L + 999L) / 1000L
      (q.toLong, 100L, vals.sorted.apply((k - 1).toInt))
    }
    assert(got == want)
  }

  test("quantileBins: nulls are excluded; negative values bin by FLOOR division") {
    // nulls must not form a first-sorting phantom bin that inflates
    // n_total and drags every quantile down
    val withNulls = Seq[(Long, Option[Long])](
      (1L, Some(10L)), (2L, None), (3L, Some(20L)), (4L, None))
      .toDF("doc_id", "v")
    val n = CorpusStats.quantileBins(withNulls, "v", binWidth = 1L,
        qs = Seq(500, 1000))
      .orderBy(col("q_permille")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(n == Seq((500L, 2L, 10L), (1000L, 2L, 20L)))
    // signed values: -150..-100 belong to floor bin -2 (edge -200 would
    // be wrong; truncation would merge (-bw, bw) into bin 0)
    val signed = Seq((1L, -150L), (2L, -50L), (3L, 50L), (4L, 150L))
      .toDF("doc_id", "v")
    val s = CorpusStats.quantileBins(signed, "v", binWidth = 100L,
        qs = Seq(250, 500, 750, 1000))
      .orderBy(col("q_permille")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(s == Seq((250L, -2L, -200L), (500L, -1L, -100L),
      (750L, 0L, 0L), (1000L, 1L, 100L)))
    // fractional negatives: a bare long cast truncates -0.5 to 0 and
    // reintroduces the (-bw, bw) merge — the operator must FLOOR doubles
    // before binning, so -0.5 lands in bin -1 and 0.5 in bin 0
    val frac = Seq((1L, -0.5), (2L, 0.5)).toDF("doc_id", "v")
    val f = CorpusStats.quantileBins(frac, "v", binWidth = 1L,
        qs = Seq(500, 1000))
      .orderBy(col("q_permille")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(f == Seq((500L, -1L, -1L), (1000L, 0L, 0L)))
  }

  test("languageQualityReport: hand-computed per-language shares, pass rates, quantiles") {
    // en: 3 docs — one Gopher-passing (60 words with stopwords), two
    // short failures; fr: 2 short docs. Lengths chosen so the binned
    // quantiles are hand-checkable at binWidth = 10.
    val passing = ("the cat and the dog went to the house of a friend " +
      "that they have known for years and they sat with tea ") +
      ("and talked about the weather and the garden and the books " +
        "that they have read with joy over the long winter evenings ") +
      "and the cat sat on the mat with the dog by the fire at night"
    val enShort = Seq("the cat and that it was", "the dog and that it is")
    val frDocs = Seq("le chat est sur la table", "la porte est une des grandes")
    val docs = (Seq((1L, passing)) ++
      enShort.zipWithIndex.map { case (t, i) => (2L + i, t) } ++
      frDocs.zipWithIndex.map { case (t, i) => (4L + i, t) })
      .toDF("doc_id", "text")
    // driver replay of the expectations from the strings themselves
    def words(s: String) = s.trim.split("\\s+").count(_.nonEmpty)
    assert(words(passing) >= 50, s"fixture must pass r_word_count: ${words(passing)}")
    val enTokens = (words(passing) + enShort.map(words).sum).toLong
    val enLens = (Seq(passing) ++ enShort).map(_.length.toLong)
    def q(lens: Seq[Long], permille: Long): Long = {
      val bins = lens.map(_ / 10L).sorted
      val k = ((permille * bins.size + 999L) / 1000L).toInt
      bins(k - 1) * 10L
    }
    val got = CorpusStats.languageQualityReport(
        docs, "doc_id", "text", binWidth = 10L, qs = Seq(500, 1000))
      .orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == 2)
    val (en, fr) = (got(0), got(1))
    assert(en._1 == "en" && en._2 == 3L)
    assert(en._3 == enTokens)
    // exactly one of three passes -> 333 permille (floor)
    assert(en._4 == 333L)
    assert(en._5 == q(enLens, 500) && en._6 == q(enLens, 1000))
    assert(fr._1 == "fr" && fr._2 == 2L && fr._4 == 0L)
    assert(fr._5 == q(frDocs.map(_.length.toLong), 500))
  }

  test("quantileBins: wider bins floor to the bin lower edge") {
    // 10 docs of length 5..95 step 10; binWidth 20 -> bins 0,1,2,3,4
    // (2 docs each); P50 threshold ceil(0.5*10)=5 -> bin 2 -> edge 40
    val df = (0 until 10).map(i => (i.toLong, 5L + 10L * i)).toDF("doc_id", "v")
    val got = CorpusStats.quantileBins(df, "v", binWidth = 20L,
        qs = Seq(500, 1000))
      .orderBy(col("q_permille")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((500L, 2L, 40L), (1000L, 4L, 80L)))
  }

  test("vocabGrowth: hand-computed Heaps curve, sparse buckets included") {
    // bucketWidth 2: docs {0,1} -> bucket 0, {2} -> 1, {7} -> 3
    // tokens: b0 = 5 (a b a | b c), b1 = 3 (c d d), b3 = 1 (e)
    // first ids: a,b -> 0; c -> 1; d -> 2; e -> 7
    //   -> new_tokens: b0 = 3 (a,b,c), b1 = 1 (d), b3 = 1 (e)
    val docs = Seq((0L, "a b a"), (1L, "b c"), (2L, "c d d"), (7L, "e"))
      .toDF("doc_id", "text")
    val got = CorpusStats.vocabGrowth(docs, "doc_id", "text", bucketWidth = 2L)
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 5L, 3L, 5L, 3L),
      (1L, 3L, 1L, 8L, 4L),
      (3L, 1L, 1L, 9L, 5L)))
  }
}
