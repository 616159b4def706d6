package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ScaleProof.{Bounds, OpStats}

/** Pins the scale-growth contract: the ceilings in [[ScaleProof.bounds]]
  * must accept the committed round-4 measured table (SCALING.md
  * §Measured evidence) and reject regressions. The MEASURED enforcement
  * runs via `Test/runMain graft.ScaleProof` (now exits 1 on any ceiling
  * violation); this spec keeps the ceilings themselves honest so a
  * future edit can't silently widen or orphan them. */
class ScaleProofSpec extends AnyFunSuite {

  private def pair(name: String, s1: Double, s10: Double, skew10: Double) = Seq(
    OpStats(name, "1x", 0L, 0.0, s1, s1, 1.0, 1),
    OpStats(name, "10x", 0L, 0.0, s10, s10, skew10, 1))

  test("committed round-4 measured table passes every ceiling") {
    // shuffle MiB 1x -> 10x and 10x skew, transcribed from SCALING.md
    val committed = Seq(
      // dd01/dd02/dd04/cu01 re-measured after the round-5 id-pair refactor
      pair("dd01_minhash", 2.8, 17.4, 1.2),
      pair("dd02_simhash", 7.7, 116.1, 1.1),
      pair("dd03_ngram", 14, 108, 1.9),
      pair("dc01_contain", 5.1, 14, 1.7),
      pair("dd04_embdup", 2.1, 30.9, 1.0),
      pair("dd04_embdup_q8", 2.1, 30.9, 1.0),
      pair("ann01_lsh", 0, 0, 1.0),
      pair("ann02_ivf", 0.5, 5.7, 16),
      pair("ann03_knn", 2.3, 77.0, 1.1),
      pair("ann03_knn_q8", 2.3, 77.0, 1.4),
      pair("cu01_curate", 2.6, 58.4, 1.1), // r8 narrow stats frame
      pair("lm01_surprisal", 0.1, 0.5, 1.0),
      pair("ti01_tfidf", 2.9, 61, 1.4),
      pair("bp01_boiler", 3.8, 55, 1.2),
      pair("bp02_rmlines", 0.1, 2.5, 1.4),
      // round-5 substring-dedup lanes (SCALING.md round-5 addendum)
      pair("sd01_spans", 5.0, 78.1, 1.1),
      pair("sd02_rmspans", 5.8, 71.2, 1.1),
      pair("ms01_mixsample", 0.1, 1.2, 1.0),
      // second-half round-5 lanes (SCALING.md round-5 addendum)
      pair("dd05_resolve", 2.9, 40.5, 1.3),
      pair("sp03_shards", 0.2, 2.5, 1.1),
      pair("qs01_select", 0.01, 0.2, 1.1),
      // round-8 portable-embedder lane (SCALING.md round-8 addendum)
      pair("me01_embed", 1.6, 27.0, 1.5),
      // round-8 bloom decontamination (FIXED 1x eval side — the
      // operator's contract — corpus-only growth) + heavy hitters
      // (shuffles only the certified candidate recount, ~0 base)
      pair("dc02_bloom", 1.0, 0.2, 1.0),
      pair("hh01_heavy", 0.0, 0.2, 1.2),
      // round-8 third-sitting lanes (SCALING.md addendum)
      pair("cd01_cdc", 1.4, 4.4, 1.1),
      pair("fp01_winnow", 2.6, 42.9, 1.1),
      pair("id01_incr", 2.2, 12.6, 1.1),
      // nb01 re-measured in r9 with the CONSUMED action (sum nll_micro):
      // count() had let the optimizer prune the argmin aggregate and the
      // classes fan-out exchange (PLANS.md r9)
      pair("nb01_nbayes", 2.8, 98.1, 1.6),
      pair("km01_kmeans", 0.0, 0.4, 1.1),
      pair("bm01_bm25", 0.0, 0.0, 1.1),
      pair("sn01_snm", 1.1, 3.0, 1.0),
      // round-9 lanes (SCALING.md round-9 addendum)
      pair("pd01_keepfirst", 0.1, 1.8, 1.2),
      pair("sw01_softdedup", 2.9, 42.4, 1.3),
      pair("ds01_dsir", 1.7, 0.8, 1.0),
      pair("ng01_novelty", 5.5, 59.0, 1.1),
      pair("cm01_confusion", 2.8, 98.1, 2.1),
      pair("sp06_strat", 0.1, 1.3, 1.1),
      pair("pq01_pq_encode", 0.0, 0.3, 1.1),
      pair("jl01_project", 0.0, 0.0, 1.0),
      pair("pq02_adc", 0.0, 0.3, 1.1),
      pair("dr01_psi", 0.0, 0.4, 2.1),
      pair("tf01_fertility", 0.0, 0.0, 1.0),
      pair("ks01_ks", 0.0, 0.4, 1.4),
      pair("en01_entropy", 0.0, 0.4, 1.1),
      // round-9 sketch/filter/tokenizer lanes (all ~zero-shuffle)
      pair("hl01_hll", 0.0, 0.0, 1.0),
      pair("kv01_kmv", 0.0, 0.1, 1.1),
      pair("cs01_countmin", 0.0, 0.2, 1.0),
      pair("gq01_gopher", 0.0, 0.0, 1.1),
      pair("pc01_bpe", 0.0, 0.1, 1.0),
      pair("vg01_heaps", 0.0, 0.6, 1.5),
      pair("ce01_charent", 0.0, 0.0, 1.1),
      pair("xs01_xsource", 4.5, 37.0, 1.1),
      pair("g14_linkpred", 2.9, 77.6, 1.1),
      // round-10 lanes (SCALING.md round-10 addendum)
      pair("g13_closeness", 2.9, 44.7, 1.1),
      pair("pc02_bpe_encode", 7.3, 96.5, 1.1),
      pair("ss01_srcjaccard", 0.0, 0.3, 1.0),
      pair("ct01_containment", 0.0, 0.3, 1.1),
      pair("qd01_quantiles", 0.0, 0.0, 1.0),
      // round-11 URL front-door lanes (SCALING.md round-11 addendum)
      pair("url02_urldedup", 0.0, 0.1, 1.2),
      pair("url03_domaincap", 0.0, 0.4, 1.1),
      pair("lq01_langquality", 0.0, 0.0, 1.9),
      // round-12 acquire tail (SCALING.md round-12 addendum)
      pair("wp02_capmix", 0.0, 0.4, 1.6),
      // round-12 lanes (SCALING.md round-12 addendum)
      pair("lm03_backoff", 4.1, 58.4, 1.1),
      pair("zo01_zorder", 0.0, 0.0, 1.1),
      pair("c402_blocklist", 0.0, 0.0, 1.5),
      pair("cd02_diff", 0.4, 4.3, 1.4),
      pair("lm04_pplbuckets", 1.6, 33.6, 1.1),
      pair("zo02_pruning", 0.0, 0.0, 1.0),
      pair("cm02_calibration", 2.2, 52.1, 1.1),
      pair("ch01_turnstats", 0.0, 0.0, 1.1),
      pair("ch02_promptdedup", 0.0, 0.2, 1.0),
      pair("ch03_renderspans", 0.0, 0.0, 1.1),
      pair("pk02_padding", 0.2, 2.5, 1.1),
      pair("mw03_mixsolve", 0.0, 0.0, 1.1),
      pair("ch04_sftpipe", 0.1, 1.1, 1.2),
      // round-13 lanes (SCALING.md round-13 addendum)
      pair("ch05_packspans", 0.1, 1.6, 1.0),
      pair("rb03_fetchsched", 0.0, 0.7, 1.1),
      pair("wp05_incr", 0.0, 0.2, 1.8),
      pair("url06_incrcap", 0.0, 1.0, 1.1),
      pair("mw04_incrmix", 0.0, 0.0, 1.0),
      pair("ch07_packshards", 0.1, 1.7, 1.1),
      // round-14 fourth-sitting lanes (SCALING.md addendum)
      pair("id02_incrindex", 1.4, 28.8, 1.9),
      pair("hl03_incrhll", 0.8, 23.9, 2.8),
      pair("cs03_incrcm", 0.2, 25.5, 1.5),
      // round-14 fifth-sitting lanes (SCALING.md addendum)
      pair("hn01_batchbm25", 2.4, 38.3, 1.7),
      pair("pp01_prefpairs", 0.0, 0.1, 1.0),
      pair("hl04_groupedhll", 0.0, 0.1, 1.1),
      pair("hl05_incrgrouped", 1.0, 16.2, 2.6)).flatten
    val violations = ScaleProof.checkBounds(committed)
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("every measured lane has a ceiling and every ceiling has a lane") {
    val measured = Set("dd01_minhash", "dd02_simhash", "dd03_ngram",
      "dd04_embdup", "dd04_embdup_q8", "ann01_lsh", "ann02_ivf",
      "ann03_knn", "ann03_knn_q8", "dc01_contain", "lm01_surprisal",
      "ti01_tfidf", "bp01_boiler", "bp02_rmlines", "sd01_spans",
      "sd02_rmspans", "ms01_mixsample", "cu01_curate",
      "dd05_resolve", "sp03_shards", "qs01_select", "me01_embed",
      "dc02_bloom", "hh01_heavy", "id01_incr", "nb01_nbayes",
      "km01_kmeans", "cd01_cdc", "fp01_winnow", "bm01_bm25", "sn01_snm",
      "pd01_keepfirst", "sw01_softdedup", "ds01_dsir", "ng01_novelty",
      "cm01_confusion", "sp06_strat", "pq01_pq_encode", "jl01_project",
      "pq02_adc", "dr01_psi", "tf01_fertility", "ks01_ks", "en01_entropy",
      "hl01_hll", "kv01_kmv", "cs01_countmin", "gq01_gopher", "pc01_bpe",
      "vg01_heaps", "ce01_charent", "xs01_xsource", "g14_linkpred",
      "g13_closeness", "pc02_bpe_encode", "ss01_srcjaccard",
      "ct01_containment", "qd01_quantiles", "url02_urldedup",
      "url03_domaincap", "lq01_langquality", "wp02_capmix",
      "lm03_backoff", "zo01_zorder", "c402_blocklist", "cd02_diff",
      "lm04_pplbuckets", "zo02_pruning", "cm02_calibration",
      "ch01_turnstats", "ch02_promptdedup", "ch03_renderspans",
      "pk02_padding", "mw03_mixsolve", "ch04_sftpipe",
      "ch05_packspans", "rb03_fetchsched", "wp05_incr",
      "url06_incrcap", "mw04_incrmix", "ch07_packshards",
      "sd03_incrspans", "fp02_incrwinnow", "ann04_incrivf",
      "bm02_incrbm25", "dc03_incrdecon", "ann05_incrknn",
      "id02_incrindex", "hl03_incrhll", "cs03_incrcm",
      "hn01_batchbm25", "pp01_prefpairs", "hl04_groupedhll",
      "hl05_incrgrouped")
    assert(ScaleProof.bounds.keySet == measured)
  }

  test("checkBounds rejects shuffle-growth and skew regressions") {
    // dd03 at 20x growth (ceiling 12) and 12 skew (ceiling 8): both flagged
    val bad = pair("dd03_ngram", 14, 280, 12.0)
    val v = ScaleProof.checkBounds(bad)
    assert(v.size == 2, v.mkString("\n"))
    assert(v.exists(_.contains("shuffle growth")) && v.exists(_.contains("skew")))
    // a zero-shuffle lane that starts shuffling at 10x trips the absolute
    // ceiling even though the ratio is undefined
    val abs = pair("ann01_lsh", 0.0, 50.0, 1.0)
    assert(ScaleProof.checkBounds(abs).exists(_.contains("abs ceiling")))
    // lanes missing a scale (filtered run) or without a ceiling are skipped
    assert(ScaleProof.checkBounds(
      Seq(OpStats("dd03_ngram", "10x", 0L, 0.0, 999, 999, 99, 1))).isEmpty)
    assert(ScaleProof.checkBounds(pair("unknown_lane", 1, 999, 99)).isEmpty)
  }

  test("committed 100x third-point table passes its ceilings; regressions flagged") {
    def pair100(name: String, s10: Double, s100: Double, skew: Double) = Seq(
      OpStats(name, "10x", 0L, 0.0, s10, s10, 1.0, 1),
      OpStats(name, "100x", 0L, 0.0, s100, s100, skew, 1))
    val committed = Seq(
      pair100("dd01_minhash", 17.4, 5045.1, 1.2),
      pair100("cu01_curate", 58.4, 6726.5, 1.8), // r8 narrow stats frame
      pair100("sd01_spans", 78.1, 1007.7, 1.2),
      pair100("qs01_select", 0.2, 0.5, 1.2),
      pair100("sp03_shards", 2.5, 15.9, 1.3),
      // round-8 portable-embedder third point
      pair100("me01_embed", 27.0, 293.6, 1.2),
      // round-8 bloom decontamination + heavy hitters third points
      pair100("dc02_bloom", 0.2, 4.0, 1.1),
      pair100("hh01_heavy", 0.2, 0.7, 1.1),
      // round-8 third-sitting third points
      pair100("cd01_cdc", 4.4, 44.7, 1.1),
      pair100("id01_incr", 12.6, 207.9, 1.1),
      // nb01 third point re-measured with the r9 CONSUMED action
      pair100("nb01_nbayes", 98.1, 1015.7, 1.4),
      pair100("fp01_winnow", 42.9, 3922.9, 1.2),
      // round-9 third points (SCALING.md round-9 addendum)
      pair100("cm01_confusion", 98.1, 1020.7, 1.8),
      pair100("ds01_dsir", 0.8, 5.9, 1.0), // literal-LUT scoring
      pair100("ng01_novelty", 59.0, 958.9, 2.1),
      pair100("pd01_keepfirst", 1.8, 117.3, 1.8),
      // round-10 third points (SCALING.md round-10 addendum)
      pair100("dr01_psi", 0.0, 0.0, 1.2),
      pair100("tf01_fertility", 0.0, 0.0, 1.0),
      pair100("ks01_ks", 0.4, 0.6, 1.1),
      pair100("en01_entropy", 0.4, 1.2, 1.0),
      pair100("hl01_hll", 0.0, 0.0, 1.1),
      pair100("kv01_kmv", 0.1, 0.3, 1.0),
      pair100("cs01_countmin", 0.2, 0.2, 1.1),
      pair100("gq01_gopher", 0.0, 0.0, 1.1),
      pair100("pc01_bpe", 0.1, 0.4, 1.1),
      pair100("vg01_heaps", 0.6, 1.6, 1.3),
      pair100("ce01_charent", 0.0, 0.0, 1.1),
      pair100("xs01_xsource", 37.0, 160.0, 1.0),
      pair100("sp06_strat", 1.3, 6.4, 1.0),
      pair100("pc02_bpe_encode", 96.5, 927.8, 1.2),
      pair100("g14_linkpred", 95.9, 7875.2, 3.6),
      pair100("g13_closeness", 44.7, 6354.8, 1.5),
      pair100("sw01_softdedup", 42.4, 7887.3, 3.4),
      pair100("ss01_srcjaccard", 0.3, 1.1, 1.1),
      pair100("ct01_containment", 0.3, 1.1, 1.0),
      pair100("qd01_quantiles", 0.0, 0.0, 1.1),
      // round-11 third points (SCALING.md round-11 addendum)
      pair100("url02_urldedup", 0.1, 0.6, 1.2),
      pair100("url03_domaincap", 0.4, 0.4, 1.0),
      pair100("lq01_langquality", 0.0, 0.0, 1.0),
      // round-12 third points (SCALING.md round-12 addendum)
      pair100("lm03_backoff", 58.4, 587.0, 1.2),
      pair100("zo01_zorder", 0.0, 0.0, 1.0),
      pair100("c402_blocklist", 0.0, 0.0, 1.4),
      pair100("cd02_diff", 4.3, 39.7, 1.2),
      pair100("lm04_pplbuckets", 33.6, 376.7, 1.1),
      pair100("zo02_pruning", 0.0, 0.0, 1.4),
      pair100("cm02_calibration", 52.1, 592.0, 1.4),
      pair100("ch01_turnstats", 0.0, 0.0, 1.1),
      pair100("ch02_promptdedup", 0.2, 0.7, 1.1),
      pair100("ch03_renderspans", 0.0, 0.0, 1.1),
      pair100("pk02_padding", 2.5, 14.3, 2.6),
      pair100("mw03_mixsolve", 0.0, 0.0, 1.1),
      pair100("ch04_sftpipe", 1.1, 22.8, 1.2),
      // round-13 third points (SCALING.md round-13 addendum)
      pair100("ch05_packspans", 1.6, 16.3, 1.1),
      pair100("rb03_fetchsched", 0.7, 10.5, 1.1),
      pair100("wp05_incr", 0.2, 13.6, 2.0),
      pair100("url06_incrcap", 1.0, 7.7, 1.3),
      pair100("mw04_incrmix", 0.0, 0.4, 1.5),
      pair100("ch07_packshards", 1.7, 17.3, 1.1),
      // round-14 fourth-sitting third points (SCALING.md addendum)
      pair100("id02_incrindex", 28.8, 514.9, 1.5),
      pair100("hl03_incrhll", 23.9, 123.9, 4.1),
      pair100("cs03_incrcm", 25.5, 28.4, 3.3)).flatten
    assert(ScaleProof.checkBounds(committed).isEmpty)
    // a 100x regression (sd01 at 30x growth vs ceiling 20) is flagged
    val bad = pair100("sd01_spans", 78.1, 2343.0, 1.2)
    assert(ScaleProof.checkBounds(bad).exists(_.contains("shuffle growth")))
    // every 100x ceiling refers to a lane that also has a 1x/10x ceiling
    assert(ScaleProof.bounds100.keySet.subsetOf(ScaleProof.bounds.keySet))
  }

  test("corpus layout-version marker is positive and bumps with the generator") {
    assert(ScaleProof.CorpusLayoutVersion >= 3)
  }
}
