package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    (0L until 200L).map { i =>
      (i, Seq.fill(32)((rnd.nextGaussian()).toFloat))
    }.toDF("id", "vec")
  }

  private lazy val query: Seq[Float] =
    corpus.filter(col("id") === 0L).head().getSeq[Float](1)

  private lazy val bruteTop10: Seq[Long] =
    Similarity.bruteForceTopK(corpus, "id", "vec", query, 10)
      .collect().map(_.getLong(0)).toSeq

  test("bruteForceTopK: query vector itself ranks first with score 1") {
    val top = Similarity.bruteForceTopK(corpus, "id", "vec", query, 10).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("knnJoin: cluster members are each other's nearest neighbors") {
    // 3 tight clusters: same direction, different magnitudes (cosine == 1
    // within a cluster, and parallel vectors land in identical LSH
    // buckets, so within-cluster recall is deterministic)
    val rnd = new scala.util.Random(5)
    val dirs = Seq.fill(3)(Seq.fill(16)(rnd.nextGaussian().toFloat))
    val docs = (for {
      c <- 0 until 3
      m <- 1 to 5
    } yield ((c * 100 + m).toLong, dirs(c).map(x => x * m)))
      .toDF("id", "vec")
    val g = Similarity.knnJoin(docs, "id", "vec", dim = 16, k = 4)
      .collect()
    val byId = g.groupBy(_.getLong(0))
    assert(byId.size == 15, s"every row needs neighbors: ${byId.keySet}")
    byId.foreach { case (id, rows) =>
      val cluster = id / 100
      // all 4 same-cluster peers present, all with cosine ~1, before any
      // cross-cluster candidate
      val top4 = rows.sortBy(_.getInt(3)).take(4)
      assert(top4.forall(_.getLong(1) / 100 == cluster),
        s"id $id neighbors ${rows.map(_.getLong(1)).toSeq}")
      assert(top4.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-6))
    }
  }

  test("knnJoin: a zero vector scores 0.0 (cosineSim zero-norm guard) and never outranks real neighbors") {
    // cosineSim defines cosine-with-zero-norm as 0.0 (not 0/0 = NaN), so
    // a failed-embedding row can appear in neighbor lists only with zero
    // similarity, behind every positive-cosine neighbor; nothing is NaN
    val rnd = new scala.util.Random(3)
    val base = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val docs = (Seq((0L, Seq.fill(16)(0.0f))) ++
      (1L to 10L).map(i => (i, base.map(x => x * i))))
      .toDF("id", "vec")
    val g = Similarity.knnJoin(docs, "id", "vec", dim = 16, k = 3,
      bits = 2, tables = 4)
      .collect()
    assert(g.nonEmpty)
    assert(!g.exists(r => r.getDouble(2).isNaN), "NaN score leaked")
    // any pair involving the zero vector scores exactly 0.0
    assert(g.filter(r => r.getLong(0) == 0L || r.getLong(1) == 0L)
      .forall(_.getDouble(2) == 0.0))
    // the 10 parallel vectors (cosine 1 to each other) must all rank a
    // real peer first — the zero vector can never be a rank-1 neighbor
    assert(!g.exists(r => r.getLong(1) == 0L && r.getInt(3) == 1),
      "zero vector outranked a real neighbor")
  }

  test("knnJoin ranks are dense per id and bounded by k") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("id", "vec")
    val g = Similarity.knnJoin(docs, "id", "vec", dim = 16, k = 3,
      bits = 2, tables = 4) // coarse buckets -> plenty of candidates
      .collect()
    g.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"id $id ranks $ranks")
      assert(ranks.length <= 3)
      assert(!rows.exists(_.getLong(1) == id), "self must not be a neighbor")
    }
  }

  test("hardNegatives: excludes gold positives and self, ranks the near-misses") {
    // two tight clusters; anchor 1's hardest negatives are its OWN
    // cluster-mates that aren't gold positives
    val rnd = new scala.util.Random(9)
    def near(base: Seq[Float]) = base.map(x => x + rnd.nextGaussian().toFloat * 0.01f)
    val a = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val b = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val docs = ((1L to 8L).map(i => (i, near(a))) ++
      (11L to 18L).map(i => (i, near(b)))).toDF("id", "vec")
    val gold = Seq((1L, 2L), (1L, 3L)).toDF("anchor", "pos")
    val all = Similarity.hardNegatives(docs, "id", "vec", dim = 16,
      positives = gold, anchorCol = "anchor", positiveCol = "pos",
      k = 3, bits = 2, tables = 4).collect()
    // ONLY anchors get negative lists — in particular positive 2 gets no
    // list at all (it would rank its own anchor 1 as a top "negative")
    assert(all.map(_.getAs[Long]("id")).toSet == Set(1L), all.mkString(","))
    val negs = all.sortBy(_.getAs[Int]("neg_rank"))
    assert(negs.length == 3, negs.mkString(","))
    val negIds = negs.map(_.getAs[Long]("negative_id")).toSet
    assert(!negIds.contains(1L) && !negIds.contains(2L) && !negIds.contains(3L),
      s"self/positives leaked: $negIds")
    // hard = same cluster: all three come from cluster A (ids 4-8)
    assert(negIds.subsetOf((4L to 8L).toSet), negIds)
    assert(negs.map(_.getAs[Int]("neg_rank")).toSeq == Seq(1, 2, 3))
  }

  test("crossTopK matches bruteForceTopK for the same query") {
    val queries = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val got = Similarity.crossTopK(queries, "qid", "qvec", corpus, "id", "vec", 10)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(got == bruteTop10)
  }

  test("lshTopK returns the self-match and decent recall vs brute force") {
    val approx = Similarity.lshTopK(corpus, "id", "vec", dim = 32,
      query = query, k = 10, bits = 4, tables = 8)
      .collect().map(_.getLong(0)).toSet
    assert(approx.contains(0L))
    val recall = approx.intersect(bruteTop10.toSet).size / 10.0
    assert(recall >= 0.3, s"LSH recall too low: $recall")
  }

  test("k-means IVF: trained centroids separate synthetic clusters; nProbe=1 finds in-cluster neighbors") {
    // 3 well-separated direction clusters in 8-d
    val rnd = new scala.util.Random(5)
    val protos = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    val pts = (0L until 150L).map { i =>
      val p = protos((i % 3).toInt)
      (i, p.map(v => v + (rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }.toDF("id", "vec")
    val cents = Similarity.Ivf.trainCentroids(pts, "id", "vec", nCells = 3, iters = 4)
    val assigned = Similarity.Ivf.assignCells(pts, "id", "vec", cents)
    // every ground-truth cluster maps to exactly one cell
    val purity = assigned
      .withColumn("truth", col("id") % 3)
      .groupBy("truth").agg(countDistinct("cell").as("cells"))
      .collect().map(_.getLong(1))
    assert(purity.forall(_ == 1L), s"clusters split across cells: ${purity.toSeq}")
    // probing 1 of 3 cells recovers the true top-10 for an in-cluster query
    val q = pts.filter(col("id") === 0L).head().getSeq[Float](1)
    val exact = Similarity.bruteForceTopK(pts, "id", "vec", q, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.Ivf.probe(assigned, "id", "vec", cents, q, k = 10, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(ivf == exact, s"nProbe=1 recall loss: ${exact.diff(ivf)}")
  }

  test("VectorAvg aggregator: element-wise mean, merge-safe, empty-group safe") {
    import graft.functions.VectorAvg
    val df = Seq(
      ("a", Seq(1f, 2f, 3f)), ("a", Seq(3f, 4f, 5f)),
      ("b", Seq(10f, 20f, 30f))
    ).toDF("g", "v").repartition(4) // force partial buffers + merge
    val out = df.groupBy("g").agg(VectorAvg.vectorAvg(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(out("a") == Seq(2f, 3f, 4f))
    assert(out("b") == Seq(10f, 20f, 30f))
  }

  test("VectorAvgExact: integer micro-units, floor semantics, ragged zero-pad") {
    import graft.functions.VectorAvgExact
    // -0.5 pins quantize's negative rounding: floor(-499999.5) = -500000
    val df = Seq(
      ("a", Seq(1.0f, -0.5f)), ("a", Seq(2.0f, -0.5f)),
      ("a", Seq(0.000001f, -0.5f)),
      ("b", Seq(1.0f, 1.0f, 3.0f)), ("b", Seq(1.0f))
    ).toDF("g", "v").repartition(4) // force partial buffers + merge
    val out = df.groupBy("g")
      .agg(VectorAvgExact.vectorAvgExact(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // a: sums (3000001, -1500000)/3 → floorDiv: (1000000, -500000)
    assert(out("a") == Seq(1000000L, -500000L))
    // b: ragged second vector zero-pads dims 1-2: (2000000, 1000000,
    // 3000000)/2 with floorDiv → (1000000, 500000, 1500000)
    assert(out("b") == Seq(1000000L, 500000L, 1500000L))
    // merge-order independence: single partition gives identical results
    val one = Seq(("a", Seq(1.0f, -0.5f)), ("a", Seq(2.0f, -0.5f)),
        ("a", Seq(0.000001f, -0.5f)))
      .toDF("g", "v").coalesce(1)
      .groupBy("g").agg(VectorAvgExact.vectorAvgExact(col("v")).as("m"))
      .head().getSeq[Long](1)
    assert(one == out("a"))
    // NaN fails fast (the SQL twin ERRORS on CAST(floor(NaN) AS BIGINT);
    // a silent toLong saturation would diverge in kind)
    val ex = intercept[Exception] {
      Seq(("a", Seq(Float.NaN))).toDF("g", "v")
        .groupBy("g").agg(VectorAvgExact.vectorAvgExact(col("v")).as("m"))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("IVF probe returns k rows including the self-match at full probe") {
    val cents = Similarity.Ivf.centroids(corpus, "id", "vec", nCells = 8)
    assert(cents.count() == 8)
    val assigned = Similarity.Ivf.assignCells(corpus, "id", "vec", cents)
    assert(assigned.count() == 200)
    // every row lands in exactly one cell
    assert(assigned.groupBy("id").count().filter(col("count") > 1).isEmpty)
    val res = Similarity.Ivf.probe(assigned, "id", "vec", cents, query,
      k = 10, nProbe = 8)
    val ids = res.collect().map(_.getLong(0)).toSeq
    assert(ids.length == 10)
    assert(ids.head == 0L) // full probe = exact
    assert(ids == bruteTop10)
  }

  test("portableCentroids: cell order replays md5-32 of the id string") {
    def md5_32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val expected = (0L until 200L).sortBy(i => (md5_32(i.toString), i)).take(16)
    val got = Similarity.Ivf.portableCentroids(corpus, "id", "vec", 16)
      .orderBy("cell").collect()
    assert(got.map(_.getInt(0)).toSeq == (0 until 16))
    // each cell's centroid is the expected id's vector, in hash order
    val vecById = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    got.zip(expected).foreach { case (row, id) =>
      assert(row.getSeq[Float](1) == vecById(id),
        s"cell ${row.getInt(0)} is not id $id's vector")
    }
  }

  test("kMeansAssignInt: exact driver replay of quantize/argmin/floor-div Lloyd") {
    // 40 deterministic 3-dim vectors including negatives (so floorDiv vs
    // truncation matters in the centroid means)
    val data = (0L until 40L).map { i =>
      (i, Seq.tabulate(3)(d => ((i * 7 + d * 13) % 19).toFloat / 19f - 0.4f))
    }
    val df = data.toDF("id", "vec")
    val k = 4; val iters = 2
    def q(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong
    val micro = data.map { case (id, v) => id -> v.map(q) }.toMap
    var cents: Map[Int, Seq[Long]] = (0L until 40L)
      .sortBy(i => (graft.functions.PortableHash.md5_32(i.toString), i))
      .take(k).zipWithIndex.map { case (id, c) => c -> micro(id) }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(): Map[Long, Int] = micro.map { case (id, v) =>
      id -> cents.toSeq.map { case (c, ct) => (d2(v, ct), c) }.min._2
    }
    for (_ <- 1 to iters) {
      val as = assign()
      val upd = as.groupBy(_._2).map { case (c, members) =>
        val vs = members.keys.toSeq.map(micro)
        c -> Seq.tabulate(3)(d =>
          Math.floorDiv(vs.map(_(d)).sum, vs.size.toLong))
      }
      cents = cents.map { case (c, prev) => c -> upd.getOrElse(c, prev) }
    }
    val fin = assign()
    val expected = data.map(_._1).map(id =>
      (id, fin(id).toLong, d2(micro(id), cents(fin(id)))))
    val got = Similarity.Ivf.kMeansAssignInt(df, "id", "vec", k, iters)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
  }

  test("kMeansAssignInt: empty corpus returns the empty frame") {
    val df = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    val out = Similarity.Ivf.kMeansAssignInt(df, "id", "vec", k = 4, iters = 2)
    assert(out.columns.toSeq == Seq("id", "cell", "d2") && out.count() == 0L)
  }

  test("kMeansAssignInt: emptied cell carries its previous centroid") {
    // the two ids FIRST in md5-sample order share one vector, so both
    // init centroids are identical, every point ties to cell 0 in
    // iteration 1 and cell 1 empties; the carried (0,0) centroid must
    // then win the final assignment for the origin points
    val order = (0L until 3L).sortBy(i =>
      (graft.functions.PortableHash.md5_32(i.toString), i))
    val df = Seq(
      (order(0), Seq(0f, 0f)), (order(1), Seq(0f, 0f)),
      (order(2), Seq(1f, 1f))).toDF("id", "vec")
    val got = Similarity.Ivf.kMeansAssignInt(df, "id", "vec", k = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val far = 2L * 666667L * 666667L // (1e6 - 333333)^2 per dim
    assert(got == Set(
      (order(0), 1L, 0L), (order(1), 1L, 0L), (order(2), 0L, far)))
  }

  test("portableHyperplanes: +/-1 entries, deterministic across calls") {
    val a = Similarity.portableHyperplanes(8, 4, 2)
    val b = Similarity.portableHyperplanes(8, 4, 2)
    assert(a.flatten.flatten.forall(v => v == 1f || v == -1f))
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
    // not degenerate: both signs appear
    assert(a.flatten.flatten.distinct.length == 2)
  }

  test("pqEncodeInt: codes equal per-subspace kMeansAssignInt, d2_total sums") {
    val vecs = (1 to 30).map { i =>
      (i.toLong, (0 until 8).map(d => ((i * 7 + d * 3) % 11) / 10f))
    }
    val df = vecs.toDF("id", "vec")
    val pq = Similarity.Ivf.pqEncodeInt(df, "id", "vec",
        m = 2, subDim = 4, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    // reference: run the single-space trainer on each slice independently
    val sub0 = Similarity.Ivf.kMeansAssignInt(
      df.select(col("id"), slice(col("vec"), 1, 4).as("vec")),
      "id", "vec", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sub1 = Similarity.Ivf.kMeansAssignInt(
      df.select(col("id"), slice(col("vec"), 5, 4).as("vec")),
      "id", "vec", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pq.keySet == vecs.map(_._1).toSet)
    vecs.map(_._1).foreach { id =>
      assert(pq(id)._1 == (sub0(id)._1, sub1(id)._1), s"codes of $id")
      assert(pq(id)._2 == sub0(id)._2 + sub1(id)._2, s"d2_total of $id")
    }
  }

  test("pqEncodeInt: empty corpus returns the empty frame with full schema") {
    val df = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    val out = Similarity.Ivf.pqEncodeInt(df, "id", "vec", m = 2, subDim = 4)
    assert(out.columns.toSeq == Seq("id", "code0", "code1", "d2_total"))
    assert(out.count() == 0L)
  }

  test("pqTopK: ADC scores match a driver replay through codes and tables") {
    val dim = 8
    val vecs = (1 to 25).map { i =>
      (i.toLong, (0 until dim).map(d => ((i * 5 + d * 7) % 13) / 12f))
    }
    val query = (0 until dim).map(d => (d % 3) / 2f)
    val k = 25 // full ranking, so the whole ADC order is checked
    val got = Similarity.Ivf.pqTopK(vecs.toDF("id", "vec"), "id", "vec",
        query, k = k, m = 2, subDim = 4, kCode = 3, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver replay: encode via pqEncodeInt (spec'd against the trainer
    // above), rebuild the codebooks' ADC tables from per-code distances
    val codes = Similarity.Ivf.pqEncodeInt(vecs.toDF("id", "vec"),
        "id", "vec", m = 2, subDim = 4, k = 3, iters = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def micro(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong
    val qm = query.map(micro)
    // exact_d2 must be the true full-width distance
    got.foreach { case (id, _, exact) =>
      val v = vecs.find(_._1 == id).get._2.map(micro)
      val expected = v.zip(qm).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(exact == expected, s"exact_d2 of $id")
    }
    // ADC is constant within a code pair and the output is adc-ordered
    val adcByCode = got.map { case (id, adc, _) => codes(id) -> adc }.toMap
    got.foreach { case (id, adc, _) =>
      assert(adcByCode(codes(id)) == adc, s"adc of $id not code-determined")
    }
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq, "not adc-ordered")
    assert(got.length == k)
  }

  test("randomProjectInt matches a driver-side replay and is distance-faithful-ish") {
    import graft.functions.PortableHash
    val vecs = Seq(
      (1L, Seq(0.5f, -0.25f, 1.0f, 0.0f)),
      (2L, Seq(0.5f, -0.25f, 1.0f, 0.0f)), // identical to 1
      (3L, Seq(-1.0f, 0.75f, 0.1f, 0.9f)))
    val got = Similarity.Ivf.randomProjectInt(
        vecs.toDF("id", "vec"), "id", "vec", inDim = 4, outDim = 3, "t")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def sign(j: Int, i: Int): Long =
      if (PortableHash.md5_32(s"t-$j-$i") % 2 == 0) 1L else -1L
    for ((id, v) <- vecs; j <- 0 until 3) {
      val expected = v.zipWithIndex.map { case (x, i) =>
        math.floor(x.toDouble * 1e6 + 0.5).toLong * sign(j, i)
      }.sum
      assert(got((id, j.toLong)) == expected, s"y($id, $j)")
    }
    // identical inputs project identically (exact integers, no noise)
    assert((0 until 3).forall(j =>
      got((1L, j.toLong)) == got((2L, j.toLong))))
  }
}
