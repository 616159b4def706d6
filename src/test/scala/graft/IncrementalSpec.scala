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
}
