package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash
import graft.operators.Sketches

/** Driver-side exact replays of the portable sketch family: every
  * register/cell must equal a from-scratch Scala computation of the
  * same md5 hashes, and the estimate chain must reproduce the
  * published HLL/KMV formulas step for step. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta alpha"),
    (2L, "beta epsilon zeta eta theta iota"),
    (3L, "alpha kappa lambda mu nu xi omicron pi"),
    (4L, "rho sigma tau upsilon phi chi psi omega beta")
  ).toDF("doc_id", "text")

  private lazy val allToks: Seq[String] =
    docs.collect().flatMap(r => toks(r.getString(1))).toSeq

  test("hllRegisters equals a driver replay of bucket/rho per token") {
    val p = 4
    val wBits = 32 - p
    val mod = 1L << wBits
    val expected = allToks.distinct
      .map(PortableHash.md5_32)
      .map(h => (h / mod, { val w = h % mod
        if (w == 0L) (wBits + 1).toLong
        else (wBits + 1).toLong - java.lang.Long.toBinaryString(w).length }))
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    val got = Sketches.hllRegisters(docs, "text", p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("hllEstimate reproduces the published estimator, small-range branch") {
    val p = 4
    val m = 1 << p
    val regs = Sketches.hllRegisters(docs, "text", p)
    val rmap = regs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vZero = m - rmap.size
    val s = vZero.toDouble + rmap.values.map(r => 1.0 / (1L << r)).sum
    val raw = 0.673 * (m.toDouble * m.toDouble) / s
    val row = Sketches.hllEstimate(regs, p).head()
    assert(row.getAs[Long]("m") == m.toLong)
    assert(row.getAs[Long]("v_zero") == vZero.toLong)
    assert(row.getAs[Long]("raw_est_micro") == math.round(raw * 1e6))
    // 30 distinct tokens over 16 buckets: raw <= 2.5m only if vZero > 0;
    // whichever branch fires, est must equal the replayed choice
    val lc =
      if (vZero > 0)
        Some(math.round(m.toDouble * (math.log(m.toDouble / vZero) /
          math.log(2.0)) * 0.6931471805599453 * 1e6))
      else None
    val want =
      if (raw <= 2.5 * m && vZero > 0) lc.get
      else math.round(raw * 1e6)
    assert(row.getAs[Long]("est_micro") == want)
  }

  test("hllEstimate raw branch when every bucket is occupied") {
    // registers covering all 16 buckets -> v_zero = 0, lc null, est = raw
    val regs = (0 until 16).map(b => (b.toLong, 1L)).toDF("bucket", "register")
    val row = Sketches.hllEstimate(regs, 4).head()
    assert(row.getAs[Long]("v_zero") == 0L)
    assert(row.isNullAt(row.fieldIndex("lc_est_micro")))
    val raw = 0.673 * 256.0 / (16.0 * 0.5)
    assert(row.getAs[Long]("est_micro") == math.round(raw * 1e6))
  }

  test("kmvDistinct equals the driver bottom-k replay") {
    val k = 8
    val hs = allToks.distinct.map(t => PortableHash.first60(
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")))).sorted
    val bottom = hs.take(k)
    val kth = bottom.last
    val est = (BigInt(k - 1) * BigInt(2).pow(60) / BigInt(kth)).toLong
    val row = Sketches.kmvDistinct(docs, "text", k).head()
    assert(row.getAs[Long]("n_kept") == k.toLong)
    assert(row.getAs[Long]("kth_min") == kth)
    assert(row.getAs[Long]("est_distinct") == est)
  }

  test("kmvDistinct is exact below k") {
    val tiny = Seq((1L, "one two three")).toDF("doc_id", "text")
    val row = Sketches.kmvDistinct(tiny, "text", 16).head()
    assert(row.getAs[Long]("n_kept") == 3L)
    assert(row.getAs[Long]("est_distinct") == 3L)
  }

  test("contribution frames fold to the batch sketches exactly") {
    // hllContrib: max over per-doc maxes == the global register table
    val folded = Sketches.hllContrib(docs, "doc_id", "text", p = 4)
      .groupBy(col("bucket")).agg(max(col("rho")).as("register"))
      .as[(Long, Long)].collect().toSet
    assert(folded ==
      Sketches.hllRegisters(docs, "text", p = 4)
        .as[(Long, Long)].collect().toSet)
    // countMinContrib: sum over per-doc counts == the global cell table
    val cellsFolded = Sketches.countMinContrib(docs, "doc_id", "text",
      d = 4, w = 64)
      .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))
      .as[(Long, Long, Long)].collect().toSet
    assert(cellsFolded ==
      Sketches.countMinCells(docs, "text", d = 4, w = 64)
        .as[(Long, Long, Long)].collect().toSet)
  }

  test("countMinCells equals a driver replay and point estimates bound exact") {
    val d = 4
    val w = 64
    val expected = allToks
      .flatMap(t => (0 until d).map(r =>
        (r.toLong, PortableHash.md5_32(s"cm$r|$t") % w)))
      .groupBy(identity).map { case (cell, xs) => cell -> xs.size.toLong }
    val got = Sketches.countMinCells(docs, "text", d, w).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)

    val probes = Seq("alpha", "beta", "nosuchtoken")
    val pts = Sketches.countMinPoint(docs, "text", probes, d, w).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (t <- probes) {
      val (est, ex) = pts(t)
      assert(ex == exact.getOrElse(t, 0L))
      assert(est >= ex, s"CM underestimated $t")
      val cells = (0 until d).map(r =>
        expected.getOrElse((r.toLong, PortableHash.md5_32(s"cm$r|$t") % w), 0L))
      assert(est == cells.min)
    }
  }

  test("sourceJaccard: complete sketches give the exact Jaccard") {
    // k >> vocab: every sketch holds its whole set, so union_kept is
    // the true union size and the estimate IS exact Jaccard
    val d = Seq(
      (1L, "a", "x y z"),
      (2L, "b", "y z w"),
      (3L, "c", "p q rq"),
      (4L, "d", "   ") // empty vocabulary: appears in no pair
    ).toDF("doc_id", "src", "text")
    val got = Sketches.sourceJaccard(d, "src", "text", k = 64)
      .orderBy(col("src_a"), col("src_b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("a", "b", 4L, 2L, 500000L, true), // {x,y,z}∪{y,z,w}=4, ∩={y,z}
      ("a", "c", 6L, 0L, 0L, true),
      ("b", "c", 6L, 0L, 0L, true)))
  }

  test("sourceContainment: complete sketches give exact directional ratios") {
    // A = {x y z} fully inside B = {x y z w v}: containment_a = 1.0,
    // containment_b = 3/5; the symmetric Jaccard (3/5... = 600000) can't
    // tell which side is the subset
    val d = Seq(
      (1L, "a", "x y z"),
      (2L, "b", "x y z w v")
    ).toDF("doc_id", "src", "text")
    val r = Sketches.sourceContainment(d, "src", "text", k = 64).head()
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    assert(r.getAs[Long]("a_kept") == 3L && r.getAs[Long]("b_kept") == 5L)
    assert(r.getAs[Long]("inter_k") == 3L)
    assert(r.getAs[Long]("containment_a_micro") == 1000000L)
    assert(r.getAs[Long]("containment_b_micro") == 600000L)
    // complete sketch (union 5 < k=64): the row declares itself exact
    assert(r.getAs[Boolean]("exact"))
  }

  test("sourceJaccard: small-k estimator endpoints and driver replay") {
    // identical vocabularies estimate exactly 1.0 at ANY k; disjoint
    // ones exactly 0.0
    val text = (1 to 100).map(i => s"tok$i").mkString(" ")
    val other = (1 to 100).map(i => s"alt$i").mkString(" ")
    val d = Seq((1L, "a", text), (2L, "b", text), (3L, "c", other))
      .toDF("doc_id", "src", "text")
    val got = Sketches.sourceJaccard(d, "src", "text", k = 8)
      .orderBy(col("src_a"), col("src_b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq.map(t => (t._1, t._2, t._5)) == Seq(
      ("a", "b", 1000000L), ("a", "c", 0L), ("b", "c", 0L)))
    // 100-token vocabularies at k=8: every merged sketch saturates
    // (union_kept = k), so no row may claim exactness
    assert(got.forall(!_._6))
    // driver replay of the a/c pair at k=8: merge the two 8-sketches,
    // rank, count dual membership among the merged bottom-8
    val sa = (1 to 100).map(i => PortableHash.md5_60(s"tok$i")).sorted.take(8)
    val sc = (1 to 100).map(i => PortableHash.md5_60(s"alt$i")).sorted.take(8)
    val mergedK = (sa ++ sc).distinct.sorted.take(8)
    val inter = mergedK.count(h => sa.contains(h) && sc.contains(h))
    val ac = got.find(t => t._1 == "a" && t._2 == "c").get
    assert(ac._3 == 8L && ac._4 == inter.toLong)
  }

  test("grouped HLL: each group's slice equals the global operator " +
      "over that group's documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta epsilon"),
      (2L, "en", "alpha beta zeta eta theta iota kappa"),
      (3L, "fr", "un deux trois quatre"),
      (4L, "fr", "un cinq six"),
      (5L, "de", "ein zwei")).toDF("doc_id", "lang", "text")
    val reg = Sketches.groupedHllRegisters(docs, "lang", "text", p = 4)
    val est = Sketches.groupedHllEstimate(reg, "lang", p = 4)
    for (g <- Seq("en", "fr", "de")) {
      val slice = docs.filter(col("lang") === g)
      val regSlice = reg.filter(col("lang") === g)
        .select("bucket", "register")
        .as[(Long, Long)].collect().toSet
      val global = Sketches.hllRegisters(slice, "text", p = 4)
        .as[(Long, Long)].collect().toSet
      assert(regSlice == global, s"registers for $g")
      val estSlice = est.filter(col("lang") === g)
        .select("m", "v_zero", "raw_est_micro", "lc_est_micro", "est_micro")
        .collect().map(_.toSeq).toSeq
      val estGlobal = Sketches.hllEstimate(
        Sketches.hllRegisters(slice, "text", p = 4), p = 4)
        .collect().map(_.toSeq).toSeq
      assert(estSlice == estGlobal, s"estimate for $g")
    }
    // p mismatch raises per group (the hllEstimate guard, grouped)
    val badReg = (0 until 17).map(b => ("en", b.toLong, 1L))
      .toDF("lang", "bucket", "register")
    val e = intercept[Exception] {
      Sketches.groupedHllEstimate(badReg, "lang", p = 4).collect()
    }
    assert(e.getMessage.contains("groupedHllEstimate"))
  }
}
