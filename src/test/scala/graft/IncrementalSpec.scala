package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

/** Incremental.maintainKeepFirst: folding a snapshot delta into the
  * stored (signals, keepers) tables must be indistinguishable from
  * batch recomputation — every edge the election can move on is
  * hand-checked here; wp05's oracle proves the property end-to-end on
  * the real funnel. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // signal schema: (id, key, pass)
  private def sig(rows: (Long, String, Boolean)*) =
    rows.toDF("id", "key", "pass")
  private def keep(rows: (String, Long)*) = rows.toDF("key", "keep_id")
  private def diff(rows: (Long, String)*) = rows.toDF("id", "status")

  private def run(
      prior: Seq[(Long, String, Boolean)],
      delta: Seq[(Long, String, Boolean)],
      d: Seq[(Long, String)],
      priorKeepers: Seq[(String, Long)]) = {
    val (ns, nk) = Incremental.maintainKeepFirst(
      sig(prior: _*), sig(delta: _*), diff(d: _*), keep(priorKeepers: _*),
      "id", "key", "pass")
    (ns.orderBy("id").as[(Long, String, Boolean)].collect().toSeq,
      nk.orderBy("key").as[(String, Long)].collect().toSeq)
  }

  test("added doc with a smaller id steals ownership") {
    val (ns, nk) = run(
      prior = Seq((5L, "a", true), (7L, "a", true), (9L, "b", true)),
      delta = Seq((2L, "a", true)),
      d = Seq((2L, "added")),
      priorKeepers = Seq(("a", 5L), ("b", 9L)))
    assert(ns.map(_._1) == Seq(2L, 5L, 7L, 9L))
    // "a" re-elected to the new minimum; untouched "b" carried forward
    assert(nk == Seq(("a", 2L), ("b", 9L)))
  }

  test("removed keeper re-elects among remaining; emptied key disappears") {
    val (ns, nk) = run(
      prior = Seq((1L, "a", true), (4L, "a", true), (3L, "c", true)),
      delta = Seq.empty,
      d = Seq((1L, "removed"), (3L, "removed")),
      priorKeepers = Seq(("a", 1L), ("c", 3L)))
    assert(ns.map(_._1) == Seq(4L))
    // "a" falls to the runner-up; "c" lost its only member and is gone
    assert(nk == Seq(("a", 4L)))
  }

  test("changed doc flipping pass loses ownership; flipping back regains") {
    val (_, nk1) = run(
      prior = Seq((1L, "a", true), (2L, "a", true)),
      delta = Seq((1L, "a", false)), // 1's recomputed row fails the gate
      d = Seq((1L, "changed")),
      priorKeepers = Seq(("a", 1L)))
    assert(nk1 == Seq(("a", 2L)))
    val (_, nk2) = run(
      prior = Seq((1L, "a", false), (2L, "a", true)),
      delta = Seq((1L, "a", true)),
      d = Seq((1L, "changed")),
      priorKeepers = Seq(("a", 2L)))
    assert(nk2 == Seq(("a", 1L)))
  }

  test("changed doc moving keys re-elects BOTH groups") {
    val (ns, nk) = run(
      prior = Seq((1L, "a", true), (2L, "a", true), (5L, "b", true)),
      delta = Seq((1L, "b", true)), // 1 migrates a -> b
      d = Seq((1L, "changed")),
      priorKeepers = Seq(("a", 1L), ("b", 5L)))
    assert(ns == Seq((1L, "b", true), (2L, "a", true), (5L, "b", true)))
    assert(nk == Seq(("a", 2L), ("b", 1L)))
  }

  test("null keys never elect; untouched keepers carried byte-for-byte") {
    val (ns, nk) = run(
      prior = Seq((1L, null, true), (2L, "z", true)),
      delta = Seq((3L, null, true)),
      d = Seq((3L, "added")),
      priorKeepers = Seq(("z", 2L)))
    assert(ns.map(_._1) == Seq(1L, 2L, 3L))
    assert(nk == Seq(("z", 2L)))
  }

  test("maintainMinK: incremental equals batch on a randomized step") {
    import graft.operators.{Incremental, Sampling}
    val rng = new scala.util.Random(29L)
    val oldRows = (0L until 400L).map(i => (i, s"d${rng.nextInt(12)}"))
    val removed = oldRows.filter(_._1 % 6 == 0).map(_._1)
    val added = (400L until 470L).map(i => (i, s"d${rng.nextInt(12)}"))
    val newRows = oldRows.filterNot(r => removed.contains(r._1)) ++ added
    val prior = oldRows.toDF("id", "key")
    val priorSample = Sampling.stratifiedFixedSample(
      prior, "id", "key", k = 4, salt = "mk")
    val d = (removed.map(_ -> "removed") ++ added.map(_._1 -> "added"))
      .toDF("id", "status")
    val (next, nextSample) = Incremental.maintainMinK(
      prior, added.toDF("id", "key"), d, priorSample,
      "id", "key", k = 4, salt = "mk")
    assert(next.as[(Long, String)].collect().toSet == newRows.toSet)
    // content-addressed: the maintained sample must equal the batch
    // operator's output over the new snapshot EXACTLY (ranks included)
    val batch = Sampling.stratifiedFixedSample(
      newRows.toDF("id", "key"), "id", "key", k = 4, salt = "mk")
      .as[(String, Long, Long)].collect().toSet
    assert(nextSample.as[(String, Long, Long)].collect().toSet == batch)
  }

  test("maintainMinK: untouched groups carry; eviction and promotion re-rank") {
    import graft.operators.{Incremental, Sampling}
    // group "a" is touched (one member removed), "b" untouched
    val prior = Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (11L, "b"))
      .toDF("id", "key")
    val priorSample = Sampling.stratifiedFixedSample(
      prior, "id", "key", k = 2, salt = "s")
    val d = Seq((2L, "removed")).toDF("id", "status")
    val (_, nextSample) = Incremental.maintainMinK(
      prior, Seq.empty[(Long, String)].toDF("id", "key"), d, priorSample,
      "id", "key", k = 2, salt = "s")
    val got = nextSample.as[(String, Long, Long)].collect().toSet
    val batch = Sampling.stratifiedFixedSample(
      Seq((1L, "a"), (3L, "a"), (10L, "b"), (11L, "b")).toDF("id", "key"),
      "id", "key", k = 2, salt = "s")
      .as[(String, Long, Long)].collect().toSet
    assert(got == batch)
    // "a" now has exactly its two survivors; "b" is untouched
    assert(got.count(_._1 == "a") == 2 && got.count(_._1 == "b") == 2)
    assert(!got.exists(_._2 == 2L))
  }

  test("maintainGroupSums: fold equals batch; emptied groups disappear") {
    import graft.operators.Incremental
    // prior: two groups; the step empties "b", moves a row a->c with a
    // new value, and adds a fresh "d" row
    val prior = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "key", "v")
    val priorTotals = prior.groupBy(col("key")).agg(
      count(lit(1)).as("n_rows"), sum(col("v")).as("v"))
    val delta = Seq((2L, "c", 99L), (9L, "d", 7L)).toDF("id", "key", "v")
    val d = Seq((2L, "changed"), (3L, "removed"), (9L, "added"))
      .toDF("id", "status")
    val (next, totals) = Incremental.maintainGroupSums(
      prior, delta, d, priorTotals, "id", "key", Seq("v"))
    assert(next.as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 10L), (2L, "c", 99L), (9L, "d", 7L)))
    assert(totals.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 1L, 10L), ("c", 1L, 99L), ("d", 1L, 7L)))
  }

  test("maintainGroupSums: randomized step equals batch; null keys excluded") {
    import graft.operators.Incremental
    val rng = new scala.util.Random(41L)
    val oldRows = (0L until 500L).map(i =>
      (i, if (i % 13 == 0) null else s"g${rng.nextInt(20)}",
        rng.nextInt(1000).toLong, rng.nextInt(50).toLong))
    val removed = oldRows.filter(_._1 % 7 == 0).map(_._1).toSet
    val changed = oldRows.filter(r => r._1 % 7 == 1).map(r =>
      (r._1, if (r._1 % 26 == 1) null else s"g${rng.nextInt(20)}",
        rng.nextInt(1000).toLong, rng.nextInt(50).toLong))
    val added = (500L until 560L).map(i =>
      (i, s"g${rng.nextInt(20)}", rng.nextInt(1000).toLong,
        rng.nextInt(50).toLong))
    val newRows = oldRows.filterNot(r => removed(r._1))
      .filterNot(_._1 % 7 == 1) ++ changed ++ added
    val d = (removed.toSeq.map(_ -> "removed") ++
      changed.map(_._1 -> "changed") ++ added.map(_._1 -> "added"))
      .toDF("id", "status")
    val prior = oldRows.toDF("id", "key", "x", "y")
    val priorTotals = prior.filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_rows"),
        sum(col("x")).as("x"), sum(col("y")).as("y"))
    val (_, totals) = Incremental.maintainGroupSums(
      prior, (changed ++ added).toDF("id", "key", "x", "y"), d,
      priorTotals, "id", "key", Seq("x", "y"))
    val gold = newRows.filter(_._2 != null).groupBy(_._2).map {
      case (k, rs) =>
        (k, rs.size.toLong, rs.map(_._3).sum, rs.map(_._4).sum)
    }.toSet
    assert(totals.as[(String, Long, Long, Long)].collect().toSet == gold)
  }

  test("incremental equals batch on a randomized snapshot step") {
    val rng = new scala.util.Random(13L)
    val oldRows = (0L until 300L).map(i =>
      (i, if (i % 11 == 0) null else s"k${rng.nextInt(40)}",
        rng.nextInt(4) > 0))
    // delta: ~1/5 removed, ~1/5 changed (new key/pass), fresh adds
    val removed = oldRows.filter(_._1 % 5 == 0).map(_._1)
    val changed = oldRows.filter(r => r._1 % 5 == 1)
      .map(r => (r._1, s"k${rng.nextInt(40)}", rng.nextBoolean()))
    val added = (300L until 360L).map(i =>
      (i, s"k${rng.nextInt(40)}", rng.nextBoolean()))
    val newRows = oldRows
      .filterNot(r => removed.contains(r._1))
      .filterNot(r => r._1 % 5 == 1) ++ changed ++ added
    val d = removed.map(_ -> "removed") ++
      changed.map(_._1 -> "changed") ++ added.map(_._1 -> "added")
    val priorKeepers = oldRows.filter(r => r._3 && r._2 != null)
      .groupBy(_._2).map { case (k, rs) => (k, rs.map(_._1).min) }.toSeq
    val (ns, nk) = run(oldRows, changed ++ added, d, priorKeepers)
    // batch gold over the new snapshot
    assert(ns.toSet == newRows.toSet)
    val gold = newRows.filter(r => r._3 && r._2 != null)
      .groupBy(_._2).map { case (k, rs) => (k, rs.map(_._1).min) }
      .toSeq.sortBy(_._1)
    assert(nk == gold)
  }

  // --- posting-list families -------------------------------------------

  /** Randomized snapshot step over a small vocabulary (so k-token
    * windows collide across documents and the step flips dup statuses
    * in both directions): %5==0 removed, %5==1 re-texted, 10 added. */
  private def textStep(seed: Long): (Seq[(Long, String)], Seq[(Long, String)],
      Seq[(Long, String)]) = {
    val rng = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l")
    def text() = Seq.fill(6 + rng.nextInt(10))(
      vocab(rng.nextInt(vocab.size))).mkString(" ")
    val oldDocs = (0L until 40L).map(i => (i, text()))
    val changed = oldDocs.filter(_._1 % 5 == 1).map(r => (r._1, text()))
    val added = (40L until 50L).map(i => (i, text()))
    val newDocs = oldDocs.filter(r => r._1 % 5 != 0 && r._1 % 5 != 1) ++
      changed ++ added
    val d = oldDocs.filter(_._1 % 5 == 0).map(_._1 -> "removed") ++
      changed.map(_._1 -> "changed") ++ added.map(_._1 -> "added")
    (oldDocs, newDocs, d)
  }

  test("maintainDupSpans: incremental equals batch on a randomized step") {
    import graft.operators.Dedup
    val (oldDocs, newDocs, d) = textStep(7L)
    val oldDf = oldDocs.toDF("id", "text")
    val newDf = newDocs.toDF("id", "text")
    val k = 3
    val priorPost = Dedup.spanPostings(oldDf, "id", "text", k)
    val deltaIds = d.collect { case (i, s) if s != "removed" => i }.toSet
    val deltaPost = Dedup.spanPostings(
      newDf.filter(col("id").isin(deltaIds.toSeq: _*)), "id", "text", k)
    val (np, nc, nsp) = Incremental.maintainDupSpans(
      priorPost, deltaPost, diff(d: _*),
      Dedup.gramDocCounts(priorPost, "id"),
      Dedup.dupSpans(oldDf, "id", "text", k, minDocs = 2L),
      "id", k, minDocs = 2L)
    // all three maintained artifacts equal their batch recomputation
    assert(np.as[(Long, Int, Long)].collect().toSet ==
      Dedup.spanPostings(newDf, "id", "text", k)
        .as[(Long, Int, Long)].collect().toSet)
    assert(nc.as[(Long, Long)].collect().toSet ==
      Dedup.gramDocCounts(Dedup.spanPostings(newDf, "id", "text", k), "id")
        .as[(Long, Long)].collect().toSet)
    val goldSpans = Dedup.dupSpans(newDf, "id", "text", k, minDocs = 2L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(goldSpans.nonEmpty, "step must produce duplicated spans")
    assert(nsp.as[(Long, Long, Long, Long)].collect().toSet == goldSpans)
  }

  test("maintainWinnowingPairs: incremental equals batch on a randomized step") {
    import graft.operators.Dedup
    val (oldDocs, newDocs, d) = textStep(21L)
    val oldDf = oldDocs.toDF("id", "text")
    val newDf = newDocs.toDF("id", "text")
    def fps(df: org.apache.spark.sql.DataFrame) =
      Dedup.winnowingFingerprints(df, "id", "text", k = 2, w = 2)
    val priorFps = fps(oldDf)
    val deltaIds = d.collect { case (i, s) if s != "removed" => i }.toSet
    val deltaFps = fps(newDf.filter(col("id").isin(deltaIds.toSeq: _*)))
    val (nf, np) = Incremental.maintainWinnowingPairs(
      priorFps, deltaFps, diff(d: _*), Dedup.winnowingPairCounts(priorFps, "id"),
      "id")
    assert(nf.as[(Long, Long)].collect().toSet ==
      fps(newDf).as[(Long, Long)].collect().toSet)
    val gold = Dedup.winnowingPairCounts(fps(newDf), "id")
      .as[(Long, Long, Long)].collect().toSet
    assert(gold.nonEmpty, "step must produce shared fingerprints")
    assert(np.as[(Long, Long, Long)].collect().toSet == gold)
  }

  test("maintainIvfAssignments: incremental equals batch under pinned " +
      "centroids") {
    import graft.operators.Similarity
    val rng = new scala.util.Random(5L)
    def vec() = Array.fill(8)(rng.nextFloat() * 2f - 1f)
    val oldVecs = (0L until 60L).map(i => (i, vec()))
    val changed = oldVecs.filter(_._1 % 5 == 1).map(r => (r._1, vec()))
    val added = (60L until 75L).map(i => (i, vec()))
    val newVecs = oldVecs.filter(r => r._1 % 5 != 0 && r._1 % 5 != 1) ++
      changed ++ added
    val d = oldVecs.filter(_._1 % 5 == 0).map(_._1 -> "removed") ++
      changed.map(_._1 -> "changed") ++ added.map(_._1 -> "added")
    val oldDf = oldVecs.toDF("id", "vec")
    val newDf = newVecs.toDF("id", "vec")
    // centroids pinned to the OLD snapshot — the persisted index artifact
    val cents = Similarity.Ivf.portableCentroids(oldDf, "id", "vec", nCells = 8)
      .localCheckpoint() // pin: both sides must see identical centroids
    val prior = Similarity.Ivf.assignCells(oldDf, "id", "vec", cents)
    val deltaIds = d.collect { case (i, s) if s != "removed" => i }.toSet
    val next = Incremental.maintainIvfAssignments(
      prior, newDf.filter(col("id").isin(deltaIds.toSeq: _*)),
      diff(d: _*), cents, "id", "vec")
    val gold = Similarity.Ivf.assignCells(newDf, "id", "vec", cents)
      .select(col("id"), col("cell")).as[(Long, Int)].collect().toSet
    assert(gold.map(_._2).size > 1, "step must span multiple cells")
    assert(next.select(col("id"), col("cell"))
      .as[(Long, Int)].collect().toSet == gold)
  }

  // --- capped minhash band index ---------------------------------------

  test("maintainMinhashIndex: incremental equals batch on a randomized step") {
    import graft.operators.Dedup
    val (oldDocs0, newDocs0, d) = textStep(21L)
    // seed an exact-duplicate crowd (ids %4==2, minus the re-texted
    // %5==1 rows) so buckets actually exceed the cap on both snapshots
    // and the step moves crowd membership (removals + adds 42, 46)
    def crowd(rows: Seq[(Long, String)]) = rows.map { case (i, t) =>
      if (i % 4 == 2 && i % 5 != 1) (i, "x y z w v u t s") else (i, t)
    }
    val oldDocs = crowd(oldDocs0)
    val newDocs = crowd(newDocs0)
    val oldDf = oldDocs.toDF("id", "text")
    val newDf = newDocs.toDF("id", "text")
    def sigsOf(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id"),
      Dedup.minhashSigColumnPortable(col("text"), numHashes = 16, nGram = 2)
        .as("sig"))
    val cap = 2
    val priorSigs = sigsOf(oldDf)
    val priorIndex = Dedup.minhashIndexFromSigs(priorSigs,
      numHashes = 16, bands = 4, maxBucketSize = cap)
    val deltaIds = d.collect { case (i, s) if s != "removed" => i }.toSet
    val (nextSigs, nextIndex) = Incremental.maintainMinhashIndex(
      priorSigs, sigsOf(newDf.filter(col("id").isin(deltaIds.toSeq: _*))),
      diff(d: _*), priorIndex, numHashes = 16, bands = 4, maxBucketSize = cap)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("sig"), col("band"), col("bucket"))
      .as[(Long, Seq[Long], Int, Long)].collect()
      .map(t => (t._1, t._2.toList, t._3, t._4)).toSet
    assert(nextSigs.select(col("id")).as[Long].collect().toSet ==
      newDocs.map(_._1).toSet)
    val gold = rows(Dedup.minhashIndexFromSigs(sigsOf(newDf),
      numHashes = 16, bands = 4, maxBucketSize = cap))
    // the 12-token vocabulary makes crowds certain: the step must
    // exercise the cap (some bucket over cap => degraded to its rep)
    assert(gold.size < newDocs.size * 4, "step must degrade some bucket")
    assert(rows(nextIndex) == gold)
  }

  test("maintainMinhashIndex: removal resurrects degraded rows; " +
      "arrival degrades a crowd") {
    import graft.operators.Dedup
    // three identical docs share EVERY bucket; cap=2 degrades all their
    // buckets to the min-id representative at build time
    val oldDocs = Seq((1L, "x y z w v u"), (2L, "x y z w v u"),
      (3L, "x y z w v u"), (9L, "totally different words here now"))
    val oldDf = oldDocs.toDF("id", "text")
    def sigsOf(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id"),
      Dedup.minhashSigColumnPortable(col("text"), numHashes = 16, nGram = 2)
        .as("sig"))
    val priorSigs = sigsOf(oldDf)
    val priorIndex = Dedup.minhashIndexFromSigs(priorSigs,
      numHashes = 16, bands = 4, maxBucketSize = 2)
    assert(priorIndex.filter(col("id").isin(2L, 3L)).count() == 0L,
      "crowd must be degraded to its min-id representative")
    // step 1: removing one crowd member RESURRECTS the other two
    val (s1, i1) = Incremental.maintainMinhashIndex(
      priorSigs, sigsOf(oldDf).filter(lit(false)),
      diff((1L, "removed")), priorIndex,
      numHashes = 16, bands = 4, maxBucketSize = 2)
    assert(i1.filter(col("id") === 2L).count() == 4L &&
      i1.filter(col("id") === 3L).count() == 4L)
    def gold(sigs: org.apache.spark.sql.DataFrame) =
      Dedup.minhashIndexFromSigs(sigs, numHashes = 16, bands = 4,
        maxBucketSize = 2)
        .select(col("id"), col("band"), col("bucket"))
        .as[(Long, Int, Long)].collect().toSet
    assert(i1.select(col("id"), col("band"), col("bucket"))
      .as[(Long, Int, Long)].collect().toSet == gold(s1))
    // step 2: a fourth copy arriving re-degrades the crowd
    val (s2, i2) = Incremental.maintainMinhashIndex(
      s1, sigsOf(Seq((4L, "x y z w v u")).toDF("id", "text")),
      diff((4L, "added")), i1, numHashes = 16, bands = 4, maxBucketSize = 2)
    assert(i2.filter(col("id").isin(3L, 4L)).count() == 0L,
      "over-cap crowd keeps only its min-id representative (2)")
    assert(i2.select(col("id"), col("band"), col("bucket"))
      .as[(Long, Int, Long)].collect().toSet == gold(s2))
  }

  // --- the cr03 confirmed-pair maintenance: candidacy flips of
  // UNTOUCHED pairs (a third doc moving a shared bucket across the cap)
  // must drop/compute their confirm — sf0.01's cap (1000) never binds,
  // so this path is pinned here with cap=2 via the injectable parameter

  test("incrementalReportRows: a cap flip drops and restores the " +
      "near-dup verdict of untouched pairs") {
    def report(oldD: Seq[(Long, String)], newD: Seq[(Long, String)]) =
      SparkEntry.incrementalReportRows(
        oldD.toDF("doc_id", "text"), newD.toDF("doc_id", "text"),
        maxBucketSize = 2)
    def nearDup(df: org.apache.spark.sql.DataFrame): Long = df
      .filter(col("metric") === "near_dup_docs")
      .select(col("value")).as[Long].head()
    val twin = "alpha beta gamma delta epsilon zeta"
    val other = (9L, "completely different words appear here instead")
    // arrival of a third copy pushes every shared bucket over cap=2:
    // the (1,2) pair — BOTH members untouched — loses candidacy
    val out1 = report(
      Seq((1L, twin), (2L, twin), other),
      Seq((1L, twin), (2L, twin), (3L, twin), other))
    assert(nearDup(out1) == 0L)
    // removal of the third copy brings the buckets back under cap:
    // the untouched (1,2) pair re-appears and confirms (jaccard 1.0)
    val out2 = report(
      Seq((1L, twin), (2L, twin), (3L, twin), other),
      Seq((1L, twin), (2L, twin), other))
    assert(nearDup(out2) == 2L)
  }

  // --- sketch state ------------------------------------------------------

  test("maintainRegisterMax: incremental equals batch; emptied corpus " +
      "empties the table") {
    import graft.operators.Sketches
    val (oldDocs, newDocs, d) = textStep(33L)
    val oldDf = oldDocs.toDF("id", "text")
    val newDf = newDocs.toDF("id", "text")
    val prior = Sketches.hllContrib(oldDf, "id", "text", p = 4)
    val deltaIds = d.collect { case (i, s) if s != "removed" => i }.toSet
    val (nc, nr) = Incremental.maintainRegisterMax(
      prior,
      Sketches.hllContrib(
        newDf.filter(col("id").isin(deltaIds.toSeq: _*)), "id", "text", p = 4),
      diff(d: _*),
      Sketches.hllRegisters(oldDf, "text", p = 4), "id")
    assert(nc.as[(Long, Long, Long)].collect().toSet ==
      Sketches.hllContrib(newDf, "id", "text", p = 4)
        .as[(Long, Long, Long)].collect().toSet)
    val gold = Sketches.hllRegisters(newDf, "text", p = 4)
      .as[(Long, Long)].collect().toSet
    assert(gold.nonEmpty)
    assert(nr.as[(Long, Long)].collect().toSet == gold)
    // removing every contributor leaves no register rows, as batch would
    val one = Seq((1L, "solo doc")).toDF("id", "text")
    val (_, empty) = Incremental.maintainRegisterMax(
      Sketches.hllContrib(one, "id", "text", p = 4),
      Sketches.hllContrib(one.filter(lit(false)), "id", "text", p = 4),
      diff((1L, "removed")),
      Sketches.hllRegisters(one, "text", p = 4), "id")
    assert(empty.count() == 0L)
  }

  test("maintainRegisterMax keyed (group, bucket): a doc changing GROUP " +
      "moves its contributions; incremental equals batch per group") {
    import graft.operators.Sketches
    def contrib(rows: Seq[(Long, String, String)]) =
      Sketches.groupedHllContrib(
        rows.toDF("id", "grp", "text"), "id", "grp", "text", p = 4)
    def registers(rows: Seq[(Long, String, String)]) = rows
      .groupBy(_._2).toSeq.flatMap { case (g, docs) =>
        Sketches.hllRegisters(
          docs.map(r => (r._1, r._3)).toDF("id", "text"), "text", p = 4)
          .as[(Long, Long)].collect().map { case (b, r) => (g, b, r) }
      }.toSet
    val oldRows = Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "epsilon zeta"),
      (3L, "fr", "un deux trois"))
    // doc 2 MOVES from en to fr with new text; doc 3 removed; 4 arrives
    val newRows = Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "fr", "epsilon zeta eta"),
      (4L, "de", "ein zwei drei"))
    val (_, nextReg) = Incremental.maintainRegisterMax(
      contrib(oldRows),
      contrib(newRows.filter(r => Set(2L, 4L)(r._1))),
      diff((2L, "changed"), (3L, "removed"), (4L, "added")),
      contrib(oldRows).groupBy(col("grp"), col("bucket"))
        .agg(max(col("rho")).as("register")),
      "id", keyCols = Seq("grp", "bucket"))
    assert(nextReg.as[(String, Long, Long)].collect().toSet ==
      registers(newRows))
    // en lost doc 2's buckets entirely (group membership is per-row
    // state, not a key rename): no en register may still carry a rho
    // only doc 2's old tokens produced
    assert(registers(newRows).exists(_._1 == "fr"))
  }

  test("count-only maintainGroupSums + kmvFromHashes equals batch " +
      "kmvDistinct") {
    import graft.operators.Sketches
    val (oldDocs, newDocs, d) = textStep(59L)
    val oldDf = oldDocs.toDF("id", "text")
    val newDf = newDocs.toDF("id", "text")
    val prior = Sketches.kmvContrib(oldDf, "id", "text")
    val priorTotals = prior.groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"))
    val deltaIds = d.collect { case (i, s) if s != "removed" => i }.toSet
    val (_, totals) = Incremental.maintainGroupSums(
      prior,
      Sketches.kmvContrib(
        newDf.filter(col("id").isin(deltaIds.toSeq: _*)), "id", "text"),
      diff(d: _*), priorTotals, "id", "h", Seq.empty, countCol = "n_docs")
    // the maintained vocabulary is exactly the new snapshot's hash set
    assert(totals.select(col("h")).as[Long].collect().toSet ==
      Sketches.kmvContrib(newDf, "id", "text")
        .select(col("h")).distinct().as[Long].collect().toSet)
    // and the batch sketch tail over it IS the batch sketch
    assert(Sketches.kmvFromHashes(totals.select(col("h")), k = 8)
      .as[(Long, Long, Long)].collect().toSeq ==
      Sketches.kmvDistinct(newDf, "text", k = 8)
        .as[(Long, Long, Long)].collect().toSeq)
  }

  test("maintainCountMinCells: incremental equals batch on a randomized " +
      "step") {
    import graft.operators.Sketches
    val (oldDocs, newDocs, d) = textStep(47L)
    val oldDf = oldDocs.toDF("id", "text")
    val newDf = newDocs.toDF("id", "text")
    val prior = Sketches.countMinContrib(oldDf, "id", "text", d = 2, w = 8)
    val deltaIds = d.collect { case (i, s) if s != "removed" => i }.toSet
    val (nc, cells) = Incremental.maintainCountMinCells(
      prior,
      Sketches.countMinContrib(
        newDf.filter(col("id").isin(deltaIds.toSeq: _*)), "id", "text",
        d = 2, w = 8),
      diff(d: _*),
      Sketches.countMinCells(oldDf, "text", d = 2, w = 8), "id")
    assert(nc.as[(Long, Long, Long, Long)].collect().toSet ==
      Sketches.countMinContrib(newDf, "id", "text", d = 2, w = 8)
        .as[(Long, Long, Long, Long)].collect().toSet)
    val gold = Sketches.countMinCells(newDf, "text", d = 2, w = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(gold.nonEmpty)
    assert(cells.as[(Long, Long, Long)].collect().toSet == gold)
  }
}
