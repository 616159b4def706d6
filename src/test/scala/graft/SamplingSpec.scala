package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** NOTE on `WARN WindowExec: No Partition Defined` in the test log: the
  * warnings come from the NAIVE-REPLAY twins these equivalence tests
  * compare against (`mixtureSampleNaive` etc. — deliberate single-window
  * reference implementations over tiny fixtures), not from the production
  * operators, which are partition-bounded by construction and plan-pinned
  * in PlanShapeSpec. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("mixtureBudgets: exact floor solve; epochs scale; unlisted/empty sources surfaced") {
    def toks(n: Int) = ("tok " * n).trim
    val docs = Seq(
      (1L, toks(60), "a"), (2L, toks(40), "a"), // a: 100 tokens
      (3L, toks(50), "b"), // b: 50
      (4L, toks(10), "c")) // c: unlisted
      .toDF("doc_id", "text", "src")
    val even = Seq("a" -> 500000L, "b" -> 500000L)
    val out = Sampling.mixtureBudgets(docs, "src", "text", even)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // T = min(100/0.5, 50/0.5) = 100 -> 50 tokens per listed source;
    // the unlisted source c is surfaced at weight/budget 0
    assert(out.toSeq == Seq(
      ("a", 100L, 500000L, 50L), ("b", 50L, 500000L, 50L),
      ("c", 10L, 0L, 0L)))
    // two epochs double the scarce source's capacity: T = 200
    val ep2 = Sampling.mixtureBudgets(docs, "src", "text", even, maxEpochs = 2)
      .orderBy("src").collect().map(r => (r.getString(0), r.getLong(3)))
    assert(ep2.toSeq == Seq(("a", 100L), ("b", 100L), ("c", 0L)))
    // a named source with no corpus tokens zeroes every budget (hard
    // proportions are unsatisfiable without it) — loud, not renormalized
    val zero = Sampling.mixtureBudgets(docs, "src", "text",
      Seq("a" -> 500000L, "missing" -> 500000L))
      .orderBy("src").collect().map(r => (r.getString(0), r.getLong(3)))
    assert(zero.toSeq == Seq(("a", 0L), ("b", 0L), ("c", 0L), ("missing", 0L)))
    assertThrows[IllegalArgumentException](
      Sampling.mixtureBudgets(docs, "src", "text", Seq("a" -> 999999L)))
    assertThrows[IllegalArgumentException](
      Sampling.mixtureBudgets(docs, "src", "text",
        Seq("a" -> 500000L, "a" -> 500000L)))
  }

  test("paddingReport: hand-checked waste; two-level plan equals naive windows") {
    val docs = Seq(
      (1L, "a"), (2L, "a b c"), (3L, "a b"), (4L, ""), (5L, "a b c d"))
      .toDF("doc_id", "text")
    val out = Sampling.paddingReport(docs, "doc_id", "text", batchSize = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // arrival {1,2}{3,4}{5}: padded 3*2+2*2+4 = 14; sorted {5,2}{3,1}{4}:
    // 4*2+2*2+0 = 12 — the length sort recovers 2 of 4 wasted tokens
    assert(out.toSeq == Seq(
      ("arrival", 3L, 10L, 14L, (4L * 1000L) / 14L),
      ("length_sorted", 3L, 10L, 12L, (2L * 1000L) / 12L)))
    // equivalence on a messier corpus: negative ids, duplicate lengths
    // ids injective (37 invertible mod prime 991, i < 991) but scattered
    // and negative; lengths heavily duplicated; every 41st text NULL
    // (must count as a zero-token row in BOTH layouts, never drop)
    val messy = (1 to 257).map(i =>
      ((i * 37L % 991L) - 450L,
        if (i % 41 == 0) null else ("tok " * (i % 13)).trim))
      .toDF("doc_id", "text")
    val fast = Sampling.paddingReport(messy, "doc_id", "text", 16)
      .collect().map(_.toSeq).toSeq
    val naive = Sampling.paddingReportNaive(messy, "doc_id", "text", 16)
      .collect().map(_.toSeq).toSeq
    assert(fast == naive)
    // empty corpus: two zero rows
    val empty = Sampling.paddingReport(
      docs.filter(col("doc_id") > 99L), "doc_id", "text", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(empty.toSeq == Seq(("arrival", 0L, 0L), ("length_sorted", 0L, 0L)))
    // an id domain spanning MORE than a signed long (64-bit hash ids):
    // the shift-based slicing must neither throw (ANSI overflow) nor
    // diverge from the naive global window
    val wide = Seq(
      (Long.MinValue + 1L, "a b c"), (-7L, "a"), (0L, "a b"),
      (Long.MaxValue - 2L, "a b c d"), (Long.MaxValue, ""))
      .toDF("doc_id", "text")
    val wf = Sampling.paddingReport(wide, "doc_id", "text", 2)
      .collect().map(_.toSeq).toSeq
    val wn = Sampling.paddingReportNaive(wide, "doc_id", "text", 2)
      .collect().map(_.toSeq).toSeq
    assert(wf == wn)
  }

  test("mixtureBudgets: a null source label raises descriptively") {
    val docs = Seq((1L, "tok tok", Some("a")), (2L, "tok", None))
      .toDF("doc_id", "text", "src")
    val e = intercept[Exception] {
      Sampling.mixtureBudgets(docs, "src", "text", Seq("a" -> 1000000L))
    }
    assert(e.getMessage.contains("mixtureBudgets: null src"))
  }

  test("hashSplit: every row assigned, weights roughly respected, deterministic") {
    val df = ids(4000)
    val counts = Sampling.hashSplit(df, "id", "s1",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 4000L)
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform: 4000 draws keep each bucket well within ±5 pp
    assert(math.abs(counts("train") - 3200L) < 200, counts)
    assert(math.abs(counts("val") - 400L) < 200, counts)
    // identical call -> identical assignment, row by row
    val a = Sampling.hashSplit(df, "id", "s1", Seq("a" -> 1.0, "b" -> 1.0))
      .orderBy("id").select("split").as[String].collect().toSeq
    val b = Sampling.hashSplit(df, "id", "s1", Seq("a" -> 1.0, "b" -> 1.0))
      .orderBy("id").select("split").as[String].collect().toSeq
    assert(a == b)
  }

  test("hashSplit: assignment matches a driver-side md5 replay (engine portability)") {
    val got = Sampling.hashSplit(ids(50), "id", "graft",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy("id").select("split").as[String].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = (1 to 50).map { i =>
      val hex = md.digest(s"$i-graft".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      if (hex < "cccccccc") "train" else if (hex < "e6666666") "val" else "test"
    }
    assert(got == expect)
  }

  test("hashSplit adds no shuffle (map-side only)") {
    val plan = Sampling.hashSplit(ids(10), "id", "s", Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("sampleFraction: nested thresholds with the same salt, independent with different salts") {
    val df = ids(2000)
    val f3 = Sampling.sampleFraction(df, "id", "s", 0.3).select("id").as[Long].collect().toSet
    val f6 = Sampling.sampleFraction(df, "id", "s", 0.6).select("id").as[Long].collect().toSet
    assert(f3.subsetOf(f6))
    assert(math.abs(f3.size - 600) < 120, f3.size)
    // composing two 0.5s with DIFFERENT salts is an unbiased quarter
    val q = Sampling.sampleFraction(
      Sampling.sampleFraction(df, "id", "sA", 0.5), "id", "sB", 0.5)
      .count()
    assert(math.abs(q - 500L) < 150, q)
    // edge fractions
    assert(Sampling.sampleFraction(df, "id", "s", 0.0).count() == 0L)
    assert(Sampling.sampleFraction(df, "id", "s", 1.0).count() == 2000L)
  }

  test("sampleByStratum: per-stratum fractions, unlisted strata dropped, nested in sampleFraction") {
    val df = Seq.tabulate(3000)(i => (i.toLong, s"s${i % 3}")).toDF("id", "g")
    val out = Sampling.sampleByStratum(df, "id", "g",
      Map("s0" -> 1.0, "s1" -> 0.2, "s2" -> 0.0), salt = "st")
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("s0", 0L) == 1000L) // fraction 1.0 keeps ALL rows
    assert(math.abs(counts.getOrElse("s1", 0L) - 200L) < 80, counts)
    assert(!counts.contains("s2"))
    // stratum rows are the SAME rows sampleFraction would keep (shared hash)
    val viaFraction = Sampling.sampleFraction(
      df.filter(col("g") === "s1"), "id", "st", 0.2)
      .select("id").as[Long].collect().toSet
    val viaStratum = out.filter(col("g") === "s1")
      .select("id").as[Long].collect().toSet
    assert(viaStratum == viaFraction)
    // strata missing from the map are dropped, not kept
    val partial = Sampling.sampleByStratum(df, "id", "g",
      Map("s1" -> 0.5), salt = "st")
    assert(partial.select("g").distinct().as[String].collect().toSeq == Seq("s1"))
  }

  test("balancedFractions: downsamples big strata toward target, keeps small ones whole") {
    // strata sizes: s0=2000, s1=500, s2=100; target 400
    val df = (Seq.fill(2000)("s0") ++ Seq.fill(500)("s1") ++ Seq.fill(100)("s2"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
    val fr = Sampling.balancedFractions(df, "g", 400L)
    assert(fr("s0") == 0.2 && fr("s1") == 0.8 && fr("s2") == 1.0)
    val out = Sampling.sampleByStratum(df, "id", "g", fr, "bal")
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(out("s2") == 100L)                      // under target: untouched
    assert(math.abs(out("s0") - 400L) < 80, out)   // binomial around target
    assert(math.abs(out("s1") - 400L) < 80, out)
  }

  test("null ids fail fast instead of co-moving, hogging ranks, or vanishing") {
    val df = Seq(Some(1L), None).map(o => Tuple1(o.map(java.lang.Long.valueOf).orNull))
      .toDF("id")
    val ex = intercept[Exception] {
      Sampling.hashSplit(df, "id", "s", Seq("a" -> 0.5, "b" -> 0.5)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("null id")), ex.getMessage)
  }

  test("groupSample: min(n, group size) rows per group, hash-then-id rank order") {
    val df = Seq.tabulate(30)(i => (s"g${i % 3}", i.toLong)) ++ Seq(("tiny", 99L))
    val out = Sampling.groupSample(df.toDF("g", "id"), "g", "id", n = 4, salt = "s")
      .orderBy("g", "sample_rank").collect()
    val perGroup = out.groupBy(_.getAs[String]("g")).view.mapValues(_.length).toMap
    assert(perGroup == Map("g0" -> 4, "g1" -> 4, "g2" -> 4, "tiny" -> 1))
    assert(out.filter(_.getAs[String]("g") == "g0")
      .map(_.getAs[Int]("sample_rank")).toSeq == Seq(1, 2, 3, 4))
  }

  test("mixtureSample: two-level bucket plan == naive single-window prefix, exactly") {
    val rnd = new scala.util.Random(7)
    val docs = (1 to 400).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(20))("w" + rnd.nextInt(50))
        .mkString(" "), "s" + (i % 5))
    }.toDF("id", "text", "src")
    val budgets = Seq(("s0", 120L), ("s1", 0L), ("s2", 55L), ("s3", 1000000L))
      .toDF("src", "token_budget") // s4 has no budget row: dropped
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("src", "id", "n_tokens").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val fast = canon(Sampling.mixtureSample(docs, "id", "text", "src", budgets))
    val naive = canon(
      Sampling.mixtureSampleNaive(docs, "id", "text", "src", budgets))
    assert(fast == naive)
    assert(fast.nonEmpty)
    // budget 0: nothing from s1; no budget row: nothing from s4;
    // huge budget: ALL of s3
    assert(!fast.exists(_._1 == "s1") && !fast.exists(_._1 == "s4"))
    assert(fast.count(_._1 == "s3") == 80)
    // each group's take is the maximal under-budget prefix: totals fit
    val bySrc = fast.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySrc("s0") <= 120L && bySrc("s2") <= 55L)
  }

  test("mixtureSample: the full-corpus window partitions by (group, bucket), never group alone") {
    val docs = Seq((1L, "a b c", "s")).toDF("id", "text", "src")
    val budgets = Seq(("s", 10L)).toDF("src", "token_budget")
    val plan = Sampling.mixtureSample(docs, "id", "text", "src", budgets)
      .queryExecution.optimizedPlan.toString()
    // the window that sorts by the per-doc hash (the one that sees every
    // document of the boundary slice) must be keyed by (src, graft_bkt);
    // a window keyed by src alone over doc hashes = the naive skew trap
    val docWindows = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("graft_hh"))
      .toList
    assert(docWindows.nonEmpty, plan)
    assert(docWindows.forall(_.contains("graft_bkt")),
      s"doc-level window not bucket-partitioned:\n${docWindows.mkString("\n")}")
  }

  test("shardByTokens: two-level plan == naive global window, exactly") {
    val rnd = new scala.util.Random(11)
    val docs = (1 to 500).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))("w" + rnd.nextInt(40)).mkString(" "))
    }.toDF("id", "text") // some zero-token docs included
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "n_tokens", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    for (n <- Seq(1, 4, 7)) {
      val fast = canon(Sampling.shardByTokens(docs, "id", "text", n))
      assert(fast == canon(Sampling.shardByTokensNaive(docs, "id", "text", n)),
        s"nShards=$n")
      assert(fast.map(_._3).distinct.sorted == (0 until n), s"nShards=$n")
    }
  }

  test("shardByTokens: shards balanced in token mass to within one document") {
    val rnd = new scala.util.Random(13)
    val docs = (1 to 600).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
    }.toDF("id", "text")
    val got = Sampling.shardByTokens(docs, "id", "text", nShards = 8)
      .groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(1))
    val total = got.sum
    val maxDoc = 30L
    // shard boundaries are token-positions: each shard's mass is within
    // one straddling document of the ideal total/n slice
    assert(got.forall(t => math.abs(t - total / 8.0) <= maxDoc + 1),
      got.mkString(","))
  }

  test("shardByTokens: the doc-level window is slice-partitioned, never global") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    val plan = Sampling.shardByTokens(docs, "id", "text", nShards = 4)
      .queryExecution.optimizedPlan.toString()
    val docWindows = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("graft_hh"))
      .toList
    assert(docWindows.nonEmpty, plan)
    assert(docWindows.forall(_.contains("graft_bkt")),
      s"doc-level window not slice-partitioned:\n${docWindows.mkString("\n")}")
  }

  test("mixtureSampleWithRepetition: two-level plan == naive, epochs + residual exact") {
    val rnd = new scala.util.Random(19)
    val docs = (1 to 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(20))("w" + rnd.nextInt(30)).mkString(" "),
        "g" + (i % 3))
    }.toDF("id", "text", "grp")
    // g0 upsampled ~2.4 epochs, g1 ~exactly downsampled, g2 tiny budget
    val budgets = Seq(("g0", 7000L), ("g1", 500L), ("g2", 60L))
      .toDF("grp", "token_budget")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "grp", "n_tokens", "epoch").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    val fast = canon(Sampling.mixtureSampleWithRepetition(
      docs, "id", "text", "grp", budgets))
    assert(fast == canon(Sampling.mixtureSampleWithRepetitionNaive(
      docs, "id", "text", "grp", budgets)))
    // per-group emitted token mass is within one doc below the budget,
    // and full epochs emit every doc exactly once each
    val byGrp = fast.groupBy(_._2)
    val bud = Map("g0" -> 7000L, "g1" -> 500L, "g2" -> 60L)
    for ((g, rows) <- byGrp) {
      val mass = rows.map(_._3).sum
      assert(mass <= bud(g), s"$g over budget: $mass")
      assert(mass > bud(g) - 20, s"$g under-filled: $mass")
      val nDocs = docs.filter(col("grp") === g).count()
      val epochs = rows.map(_._4).distinct.sorted
      for (e <- epochs.init) // every epoch but the last is a full pass
        assert(rows.count(_._4 == e) == nDocs, s"$g epoch $e not full")
    }
    // upsampling actually happened for g0
    assert(fast.filter(_._2 == "g0").map(_._4).max >= 1L)
  }

  test("selectTopQualityShare: hierarchical plan == naive global window, exactly") {
    val rnd = new scala.util.Random(17)
    // few distinct scores over many docs (some zero-token), so score BINS
    // are fat: the boundary bin genuinely splits across hash slices
    val docs = (1 to 500).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))("w" + rnd.nextInt(40)).mkString(" "),
        (rnd.nextInt(5) * 10).toLong)
    }.toDF("id", "text", "score")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "score", "n_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    for (share <- Seq(0, 137, 500, 803, 1000)) {
      val fast = canon(Sampling.selectTopQualityShare(
        docs, "id", "text", "score", share))
      assert(fast == canon(Sampling.selectTopQualityShareNaive(
        docs, "id", "text", "score", share)), s"share=$share")
    }
    // share=1000 keeps everything; share=0 keeps only the zero-token
    // prefix of the top score band (cum <= 0)
    assert(canon(Sampling.selectTopQualityShare(
      docs, "id", "text", "score", 1000)).size == 500)
  }

  test("selectTopQualityShare: kept set is the greedy top-score token prefix") {
    val docs = Seq(
      (1L, "a b c d", 90L),  // 4 tokens, best score
      (2L, "a b c", 50L),    // 3 tokens
      (3L, "a b c d e", 50L),// 5 tokens, same bin as 2
      (4L, "a b", 10L)       // worst score
    ).toDF("id", "text", "score")
    // total 14 tokens; share 500 -> budget 7: doc1 (4) kept whole-bin,
    // bin 50 is the boundary with remainder 3 — within it the salted hash
    // order decides whether doc2 (3 tokens, fits) leads or doc3 (5 tokens,
    // overflows and stops the prefix) does; doc4 never reachable
    val got = Sampling.selectTopQualityShare(docs, "id", "text", "score", 500)
      .select("id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(1L) && !got.contains(4L))
    assert(got.values.sum <= 7L)
    assert(got.keySet == Set(1L, 2L) || got.keySet == Set(1L)) // greedy prefix, not knapsack
  }

  test("selectTopQualityShare: doc-level window is slice-partitioned, never global") {
    val docs = Seq((1L, "a b c", 50L)).toDF("id", "text", "score")
    val plan = Sampling.selectTopQualityShare(docs, "id", "text", "score", 500)
      .queryExecution.optimizedPlan.toString()
    val docWindows = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("graft_hh"))
      .toList
    assert(docWindows.nonEmpty, plan)
    assert(docWindows.forall(_.contains("graft_bkt")),
      s"doc-level window not slice-partitioned:\n${docWindows.mkString("\n")}")
  }

  test("leakageSafeSplit: near-dup clusters share a split; others match plain hashSplit") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (4L, "completely unrelated content about databases and distributed query engines"),
      (5L, "yet another separate document mentioning graphs vertices and edges")
    ).toDF("doc_id", "text")
    val w = Seq("train" -> 0.5, "test" -> 0.5)
    val got = Sampling.leakageSafeSplit(docs, "doc_id", "text", "s", w,
        threshold = 0.7)
      .select("doc_id", "rep_id", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // 1,2,3 form one near-dup cluster -> same rep (min id 1), same split
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L && got(3L)._1 == 1L)
    assert(Set(got(1L)._2, got(2L)._2, got(3L)._2).size == 1)
    // unclustered docs keep their own id and match a plain hashSplit
    assert(got(4L)._1 == 4L && got(5L)._1 == 5L)
    val plain = Sampling.hashSplit(docs, "doc_id", "s", w)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(4L)._2 == plain(4L) && got(5L)._2 == plain(5L))
    // and every row is present exactly once
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("groupSample: preFilterFraction keeps the result exact when groups stay big enough") {
    // 200 rows per group, n=3: a 0.5 pre-filter keeps ~100 per group — far
    // more than 3, so the hash-ordered top-3 is unchanged
    val df = Seq.tabulate(600)(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val full = Sampling.groupSample(df, "g", "id", n = 3, salt = "s")
      .select("g", "id").as[(String, Long)].collect().toSet
    val pre = Sampling.groupSample(df, "g", "id", n = 3, salt = "s",
        preFilterFraction = 0.5)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(full == pre)
  }

  test("prioritySample matches a driver DLT replay exactly (sample, priorities, tau)") {
    val docs = (1 to 300).map(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("id", "w")
    val k = 40
    val got = Sampling.prioritySample(docs, "id", col("w"), k, "spec")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // driver replay of the exact arithmetic: md5-60bit -> (+1)/2^60 -> w/u
    def prio(id: Long, w: Long): Double = {
      val d = graft.functions.PortableHash.md5
        .digest(s"$id-spec".getBytes("UTF-8"))
      val h = graft.functions.PortableHash.first60(d)
      w.toDouble / ((h.toDouble + 1.0) / 1152921504606846976.0)
    }
    val all = (1 to 300).map(i => (i.toLong, (i % 7 + 1).toLong))
      .map { case (id, w) => (id, w, prio(id, w)) }
      .sortBy { case (id, _, q) => (-q, id) }
    val tau = all(k)._3
    val want = all.take(k).map { case (id, w, q) =>
      (id, w, q, math.max(w.toDouble, tau))
    }
    assert(got.length == k)
    assert(got.sortBy(t => (-t._3, t._1)).toSeq == want)
  }

  test("prioritySample: estimator behaves (w_hat >= w; totals in range; salt independence)") {
    val docs = (1 to 500).map(i => (i.toLong, (i % 13 + 1).toLong * 10L))
      .toDF("id", "w")
    val s1 = Sampling.prioritySample(docs, "id", col("w"), 100, "a").collect()
    assert(s1.forall(r => r.getDouble(3) >= r.getLong(1).toDouble))
    // DLT unbiasedness: E[sum w_hat over the sample] = total weight; for
    // this fixed seed the concentration is far tighter than the 2x band
    val total = (1 to 500).map(i => (i % 13 + 1).toLong * 10L).sum.toDouble
    val est = s1.map(_.getDouble(3)).sum
    assert(est > total / 2 && est < total * 2, s"est=$est total=$total")
    // a different salt draws a genuinely different sample
    val s2 = Sampling.prioritySample(docs, "id", col("w"), 100, "b").collect()
    assert(s1.map(_.getLong(0)).toSet != s2.map(_.getLong(0)).toSet)
    // same salt reproduces exactly
    val s3 = Sampling.prioritySample(docs, "id", col("w"), 100, "a").collect()
    assert(s1.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      s3.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
  }

  test("prioritySample: population <= k has no threshold — estimator is exact") {
    val docs = (1 to 5).map(i => (i.toLong, i.toLong * 10L)).toDF("id", "w")
    val got = Sampling.prioritySample(docs, "id", col("w"), 20, "a")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length == 5)
    // tau = 0: w_hat degrades to the exact weight for every row
    assert(got.forall { case (_, w, wh) => wh == w.toDouble })
  }

  test("prioritySample filters non-positive weights before scoring") {
    val docs = Seq((1L, 10L), (2L, 0L), (3L, -5L), (4L, 7L))
      .toDF("id", "w")
    val got = Sampling.prioritySample(docs, "id", col("w"), 10, "a")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("prioritySample raises on positive weights that truncate to 0") {
    // a weight in (0,1) is positive to the caller but 0 after the long
    // cast — silently excluding that row would corrupt the estimate, so
    // the contract violation must be LOUD
    val docs = Seq((1L, 10.0), (2L, 0.4)).toDF("id", "w")
    val ex = intercept[Exception] {
      Sampling.prioritySample(docs, "id", col("w"), 10, "a").collect()
    }
    assert(ex.getMessage.contains("truncates to 0") ||
      Option(ex.getCause).exists(_.getMessage.contains("truncates to 0")))
    // fractional weights >= 1 still truncate-and-sample (documented)
    val ok = Sampling.prioritySample(
      Seq((1L, 10.5), (2L, 1.2)).toDF("id", "w"), "id", col("w"), 10, "a")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == Map(1L -> 10L, 2L -> 1L))
  }

  test("stratifiedFixedSample: two-level plan equals the naive per-stratum window") {
    val df = (1 to 900)
      .map(i => (i.toLong, s"s${i % 3}")).toDF("id", "stratum")
    val k = 25
    val got = Sampling.stratifiedFixedSample(df, "id", "stratum", k, "t1")
      .orderBy("stratum", "sample_rank")
      .as[(String, Long, Long)].collect().toSeq
    // naive reference: one global window per stratum (tiny fixture only —
    // the unpartitioned-window warning, if any, is this twin, not the op)
    import org.apache.spark.sql.expressions.Window
    val h = substring(md5(concat(col("id").cast("string"), lit("-t1"))
      .cast("binary")), 1, 8)
    val naive = df
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(h.asc, col("id").asc))
        .cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col("stratum"), col("id"), col("sample_rank"))
      .orderBy("stratum", "sample_rank")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == naive)
    assert(got.count(_._1 == "s0") == k)
  }

  test("stratifiedFixedSample: strata smaller than k keep every row, ranked") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "stratum")
    val got = Sampling.stratifiedFixedSample(df, "id", "stratum", 10, "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 3)
    assert(got.filter(_._1 == "a").map(_._3).sorted.toSeq == Seq(1L, 2L))
    assert(got.filter(_._1 == "b").map(_._3).toSeq == Seq(1L))
  }
}
