package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions._

/** Property-based invariants for the custom expressions, evaluated at the
  * `nullSafeEval` level (no Spark session — pure Catalyst eval), so a
  * regression in the hashing/geometry itself is caught independently of
  * plan wiring. Run natively by sbt's ScalaCheck integration.
  */
object ExpressionProps extends Properties("graft.expressions") {

  private val floatVec: Gen[Array[Float]] =
    Gen.chooseNum(1, 64).flatMap(n =>
      Gen.containerOfN[Array, Float](n, Gen.chooseNum(-100f, 100f)))

  private val tokenList: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
        "zeta", "eta", "theta", "iota", "kappa")))

  private def arr(xs: Array[Float]) = new GenericArrayData(xs)
  private def strArr(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private val cos = CosineSimilarity(null, null)
  private val sim = SimHash64(null)

  property("cosine symmetric, bounded, self=1") = Prop.forAll(floatVec, floatVec) {
    (a, b) =>
      val n = math.min(a.length, b.length)
      val x = a.take(n); val y = b.take(n)
      val ab = cos.nullSafeEval(arr(x), arr(y)).asInstanceOf[Double]
      val ba = cos.nullSafeEval(arr(y), arr(x)).asInstanceOf[Double]
      val self = cos.nullSafeEval(arr(x), arr(x)).asInstanceOf[Double]
      val selfOk = x.forall(_ == 0f) || math.abs(self - 1.0) < 1e-9
      math.abs(ab - ba) < 1e-12 && ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9 && selfOk
  }

  property("cosine scale-invariant") = Prop.forAll(floatVec) { a =>
    val scaled = a.map(_ * 3.5f)
    val c = cos.nullSafeEval(arr(a), arr(scaled)).asInstanceOf[Double]
    a.forall(_ == 0f) || math.abs(c - 1.0) < 1e-6
  }

  property("minhash estimate tracks true jaccard within 0.3 (k=128)") =
    Prop.forAll(tokenList, tokenList) { (ta, tb) =>
      val mh = MinHashFromHashes(null, 128)
      val ng = NgramHashes(null, 1)
      val ha = ng.nullSafeEval(strArr(ta)).asInstanceOf[GenericArrayData]
        .toLongArray()
      val hb = ng.nullSafeEval(strArr(tb)).asInstanceOf[GenericArrayData]
        .toLongArray()
      val sa = ha.toSet; val sb = hb.toSet
      if (sa.isEmpty || sb.isEmpty) true
      else {
        val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
        val siga = mh.nullSafeEval(new GenericArrayData(ha)).asInstanceOf[GenericArrayData].toIntArray()
        val sigb = mh.nullSafeEval(new GenericArrayData(hb)).asInstanceOf[GenericArrayData].toIntArray()
        val est = siga.zip(sigb).count { case (x, y) => x == y } / 128.0
        math.abs(est - trueJ) < 0.3
      }
    }

  property("simhash: identical tokens → identical signature; determinism") =
    Prop.forAll(tokenList) { ts =>
      val h1 = sim.nullSafeEval(strArr(ts)).asInstanceOf[Long]
      val h2 = sim.nullSafeEval(strArr(ts)).asInstanceOf[Long]
      h1 == h2
    }

  property("ngram hashes: count <= max(0, tokens-n+1), distinct, sorted") =
    Prop.forAll(tokenList, Gen.chooseNum(1, 4)) { (ts, n) =>
      val ng = NgramHashes(null, n)
      val out = ng.nullSafeEval(strArr(ts)).asInstanceOf[GenericArrayData]
        .toLongArray()
      val bound = math.max(0, ts.length - n + 1)
      out.length <= bound &&
        out.distinct.length == out.length &&
        out.sameElements(out.sorted)
    }

  property("hashEmbed: unit norm (or zero), deterministic") =
    Prop.forAll(tokenList) { ts =>
      val text = ts.mkString(" ")
      val v1 = VectorOps.hashEmbed(text, 32)
      val v2 = VectorOps.hashEmbed(text, 32)
      val norm = math.sqrt((0 until 32).map(i =>
        v1.getFloat(i).toDouble * v1.getFloat(i)).sum)
      val same = (0 until 32).forall(i => v1.getFloat(i) == v2.getFloat(i))
      same && (math.abs(norm - 1.0) < 1e-5 || norm == 0.0)
    }

  property("rolling fingerprint: deterministic, prefix-stable minima") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.length >= 16)) { s =>
      val rf = RollingFingerprint(null, 8)
      val a = rf.nullSafeEval(UTF8String.fromString(s)).asInstanceOf[Long]
      val b = rf.nullSafeEval(UTF8String.fromString(s)).asInstanceOf[Long]
      // appending text can only lower (or keep) the min-hash fingerprint set:
      // the original windows are all still present
      val ext = rf.nullSafeEval(UTF8String.fromString(s + "ZZZZZZZZ")).asInstanceOf[Long]
      a == b && ext <= a
    }
}
