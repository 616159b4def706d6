package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class QuantizationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("quantizeI8: per-element roundtrip error is bounded by scale/2") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.5f, 3.0f, 0.0f)),
      (2L, Seq(-0.001f, 0.002f, -0.003f, 0.004f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector must not NaN
    ).toDF("id", "vec")
    val q = Similarity.quantizeI8(vecs, "vec").collect()
    q.foreach { r =>
      val orig = r.getSeq[Float](r.fieldIndex("vec"))
      val q8 = r.getSeq[Byte](r.fieldIndex("q8"))
      val scale = r.getAs[Double]("q8_scale")
      assert(!scale.isNaN && scale > 0)
      orig.zip(q8).foreach { case (x, b) =>
        assert(math.abs(b * scale - x) <= scale / 2 + 1e-9,
          s"x=$x b=$b scale=$scale")
      }
      assert(q8.forall(b => b >= -127 && b <= 127))
    }
    // zero vector: norm 0, quantized all-zero
    val z = q.find(_.getAs[Long]("id") == 3L).get
    assert(z.getAs[Double]("q8_norm") == 0.0)
  }

  test("dot_q8 expression equals a driver-side integer dot product") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 50).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextInt(255) - 127).toByte),
        Seq.fill(16)((rnd.nextInt(255) - 127).toByte))
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), GraftFunctions.dotQ8(col("a"), col("b")).as("d"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("d")).toMap
    rows.foreach { case (id, a, b) =>
      val expect = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
      assert(got(id) == expect, s"id $id")
    }
  }

  test("quantized cosine top-10 recalls the exact float top-10 on real embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qv = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val corpus = e.filter(col("vec_id") =!= 0L)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qv, 10)
      .select("vec_id").as[Long].collect().toSet

    val qRow = Similarity.quantizeI8(
      Seq(Tuple1(qv)).toDF("embedding"), "embedding")
      .select("q8", "q8_scale", "q8_norm").head()
    val quantized = Similarity.quantizeI8(corpus, "embedding")
      .withColumn("qscore", Similarity.cosineQ8(
        col("q8"), col("q8_scale"), col("q8_norm"),
        typedLit(qRow.getSeq[Byte](qRow.fieldIndex("q8")).toSeq),
        lit(qRow.getAs[Double]("q8_scale")),
        lit(qRow.getAs[Double]("q8_norm"))))
      .orderBy(desc("qscore"), col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(quantized).size / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall (exact=$exact quant=$quantized)")
  }

  test("embeddingNearDup quantized=true: same pairs within the rounding band") {
    import graft.operators.Dedup
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def pairs(quantized: Boolean) = Dedup.embeddingNearDup(
      e, "vec_id", "embedding", dim = 64, cosThreshold = -1.0,
      bitsPerTable = 6, tables = 4, quantized = quantized)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    val fl = pairs(quantized = false)
    val q8 = pairs(quantized = true)
    // candidate generation is identical (same hyperplanes, threshold -1
    // admits every candidate) — only the scoring path differs
    assert(fl.keySet == q8.keySet)
    assert(fl.nonEmpty)
    val maxErr = fl.map { case (k, c) => math.abs(c - q8(k)) }.max
    assert(maxErr < 0.01, s"quantized cosine drifted by $maxErr")
  }

  test("knnJoin quantized=true: neighbor sets survive quantization") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def knn(quantized: Boolean) = Similarity.knnJoin(
      e, "vec_id", "embedding", dim = 64, k = 5, bits = 6, tables = 4,
      quantized = quantized)
      .collect().groupBy(_.getAs[Long]("id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val fl = knn(quantized = false)
    val q8 = knn(quantized = true)
    assert(fl.keySet == q8.keySet)
    // ranks may swap inside the ~0.01 cosine band; the neighbor SETS must
    // agree nearly everywhere
    val agree = fl.keys.count(id =>
      (fl(id) & q8(id)).size >= math.min(fl(id).size, q8(id).size) - 1)
    assert(agree >= (fl.size * 0.9).toInt,
      s"only $agree/${fl.size} ids kept their neighbor set")
  }
}
