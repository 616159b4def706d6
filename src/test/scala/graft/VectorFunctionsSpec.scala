package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftFunctions._

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(cosineSim(col("a"), col("b")).as("c"))
      .head().getDouble(0)

  test("cosine of a vector with itself is 1") {
    assert(math.abs(cos(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) - 1.0) < 1e-12)
  }

  test("cosine is symmetric and within [-1, 1] (100 random pairs, seed 7)") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 100).map { _ =>
      val n = 1 + rnd.nextInt(16)
      (Seq.fill(n)((rnd.nextGaussian() * 10).toFloat),
        Seq.fill(n)((rnd.nextGaussian() * 10).toFloat))
    }
    import spark.implicits._
    val rows = pairs.toDF("a", "b")
      .select(cosineSim(col("a"), col("b")).as("ab"),
        cosineSim(col("b"), col("a")).as("ba"))
      .collect()
    rows.foreach { r =>
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("cosine of orthogonal vectors is 0, opposite is -1") {
    assert(math.abs(cos(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
    assert(math.abs(cos(Seq(1f, 2f), Seq(-1f, -2f)) + 1.0) < 1e-12)
  }

  test("zero vector yields 0 (null-safe convention)") {
    assert(cos(Seq(0f, 0f), Seq(1f, 2f)) == 0.0)
  }

  test("dot product and l2 norm agree with manual computation") {
    val row = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .select(dotProduct(col("a"), col("b")).as("d"), l2Norm(col("a")).as("n"))
      .head()
    assert(row.getDouble(0) == 32.0)
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("cosine accepts array<double> via implicit cast") {
    val c = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(cosineSim(col("a"), col("b")).as("c")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-6)
  }

  test("hash_embed is deterministic, unit-norm, and cosine-sane") {
    val df = Seq(
      ("d1", "the quick brown fox jumps"),
      ("d2", "the quick brown fox jumps"),
      ("d3", "completely different words entirely elsewhere")
    ).toDF("id", "text")
      .withColumn("v", hashEmbed(col("text"), 64))
    val vs = df.select("id", "v").collect().map(r =>
      r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(vs("d1") == vs("d2"))
    val norm = math.sqrt(vs("d1").map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    val sameCos = df.filter(col("id") === "d1")
      .crossJoin(df.filter(col("id") === "d2").select(col("v").as("v2")))
      .select(cosineSim(col("v"), col("v2"))).head().getDouble(0)
    assert(math.abs(sameCos - 1.0) < 1e-6)
  }

  test("PortableHashEmbedder: unit-norm, md5-slot replay, zero slots present") {
    import graft.vector.PortableHashEmbedder
    val dim = 8
    val df = Seq(
      (1L, "  The quick Brown fox  "),
      (2L, "the quick brown fox"),
      (3L, "zip")
    ).toDF("id", "text")
    val out = PortableHashEmbedder.embed(df, "id", "text", dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // trim + lower + \s+ split: leading/trailing/case noise is invisible
    assert(out(1L) == out(2L))
    assert(out.values.forall(_.length == dim))
    val norm = math.sqrt(out(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // driver replay of the portable math: md5-32 slot/sign bag, L2 norm
    def replay(text: String): Seq[Float] = {
      val acc = new Array[Long](dim)
      text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").foreach { t =>
        val h = graft.functions.PortableHash.md5_32(t)
        val slot = ((h >> 1) % dim).toInt
        acc(slot) += (if (h % 2 == 0) 1L else -1L)
      }
      val n = acc.map(x => x * x).sum
      val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n.toDouble)
      acc.map(x => (x.toDouble * inv).toFloat).toSeq
    }
    assert(out(1L) == replay("the quick brown fox"))
    assert(out(3L) == replay("zip"))
    // a single-token doc puts exactly one nonzero slot in the dense array
    assert(out(3L).count(_ != 0f) == 1)
    // NULL text keeps its row as the zero vector (the dense id grid, not
    // an explode-side drop) — matching the SQL replay's LEFT JOIN grid
    val withNull = Seq((1L, Some("hello world")), (2L, None))
      .toDF("id", "text")
    val nv = PortableHashEmbedder.embed(withNull, "id", "text", dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(nv.keySet == Set(1L, 2L))
    assert(nv(2L) == Seq.fill(dim)(0f))
  }

  test("CharNgramEmbedder: null text embeds to null, not the empty-string vector") {
    val emb = new graft.vector.CharNgramEmbedder(dim = 64)
    val df = Seq((1L, null: String), (2L, null: String), (3L, "real text"))
      .toDF("id", "text")
    val rows = emb.embed(df, col("text"), "v").orderBy("id").collect()
    // two null-text rows must NOT share an (identical) vector
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(2))
    assert(!rows(2).isNullAt(2))
  }

  test("CharNgramEmbedder: executor Column path equals driver embedQuery, no UDF") {
    val emb = new graft.vector.CharNgramEmbedder(dim = 64)
    val texts = Seq("manage data", "x", "", "Spark  Internals",
      "DATA İ I analysis", "emoji 🎉🚀 pad")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val viaPlan = emb.embed(df, col("text"), "v")
      .orderBy("id").collect().map(_.getSeq[Float](2))
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(viaPlan(i) == emb.embedQuery(t), s"text '$t'")
    }
    // subword robustness: shared trigrams → high cosine for variants
    val a = emb.embedQuery("developer")
    val b = emb.embedQuery("developers")
    val cos = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos > 0.8, s"cosine $cos")
    // the plan must contain no BatchEvalPython/ScalaUDF node
    val plan = emb.embed(df, col("text"), "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }

  test("cosine_sim works from SQL too") {
    spark.sql("SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c")
      .head().getDouble(0) match {
      case c => assert(math.abs(c - 1.0) < 1e-12)
    }
  }

  test("lsh_buckets works from SQL text (foldable CreateArray planes)") {
    // SQL array(...) constructors resolve to foldable CreateArray, not a
    // pre-folded Literal — the builder must fold them. One plane table,
    // two hyperplanes: v=(1,2) → dot(e1)=1>=0, dot(e2)=2>=0 → bits 11 = 3.
    val r = spark.sql(
      "SELECT lsh_buckets(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(array(" +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(0 AS FLOAT), CAST(1 AS FLOAT))))) AS b")
      .selectExpr("b[0].band AS band", "b[0].bucket AS bucket")
      .head()
    assert(r.getInt(0) == 0 && r.getLong(1) == 3L,
      s"expected band 0 bucket 3, got $r")
  }
}
