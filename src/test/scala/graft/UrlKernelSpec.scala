package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{UrlFunctions, UrlKernel}

/** The compiled URL kernel ([[graft.functions.UrlKernel]] /
  * `url_domain`) must be byte-equivalent to the Column-tier chain it
  * replaced — the Column tier is the documented contract (and what the
  * DuckDB oracles replay), the kernel is the codegen-friendly hot path.
  * Checked on a hand-built adversarial corpus hitting every contract
  * branch, plus a seeded fuzz over URL-ish character soup.
  */
class UrlKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val adversarial = Seq(
    "not a url 5", "", "www.example.com/x", "http://", "http://?q=1",
    "http://WWW.Site1.COM/Articles/Item3?id=3&utm_source=news",
    "HTTPS://user:pw@cdn.Site2.CO.UK:80/x/",
    "http://XN--BCHER-KVA.com/x",
    "http://a.GitHub.IO", "http://x.y.Blogspot.co.uk/p",
    "http://foo.uk.com", "http://a.ne.jp", "http://github.io/x",
    "http://192.168.0.1:8080/a", "http://256.1.2.3.4",
    "http://example.com./x", "http://example.com.../",
    "http://EXAMPLE.COM.:8080/", "http://localhost:80/",
    "http://localhost", "http://a@b@c.com/path", "http://a.com:/x",
    "FTP://A.B.C", "http://a.com#frag", "http://a.com?x=1",
    "http://www.bbc.co.uk/news", "http://a.b.sub.gov.br/x",
    "http://Bücher.example/x", "http://İstanbul.com/x",
    "http://ex.com/a@b", "http://.", "http://..", "http://:8080/x",
    "https://s3.amazonaws.com", "https://x.s3.amazonaws.com",
    "ht!tp://bad.com", "http:/one-slash.com", "//protocol-relative.com")

  private def assertParity(urls: Seq[String]): Unit = {
    val rows = urls.toDF("url")
      .select(col("url"),
        UrlFunctions.urlDomain(col("url")).as("kernel"),
        UrlFunctions.urlDomainColumnTier(col("url")).as("column"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"urlDomain mismatch for '${r.getString(0)}': " +
          s"kernel=${r.get(1)} column=${r.get(2)}")
    }
  }

  test("urlDomain kernel == Column tier on the adversarial corpus") {
    assertParity(adversarial)
  }

  test("urlDomain kernel == Column tier under seeded fuzz") {
    val rng = new scala.util.Random(20260816L)
    val alphabet = "abAB09.:/@?#%&=~_-é İ".toCharArray
    val fuzz = Seq.fill(2000) {
      val n = rng.nextInt(40)
      val body = Array.fill(n)(alphabet(rng.nextInt(alphabet.length)))
      (if (rng.nextBoolean()) "http://" else "") + new String(body)
    }
    assertParity(fuzz)
  }

  test("urlHostOf matches the Column urlHost on the corpus") {
    val expected = adversarial.toDF("url")
      .select(UrlFunctions.urlHost(col("url"))).as[String].collect()
    adversarial.zip(expected).foreach { case (u, e) =>
      assert(UrlKernel.urlHostOf(u) == e, s"urlHost mismatch for '$u'")
    }
  }

  private val canonAdversarial = adversarial ++ Seq(
    // escapes: unreserved decode, reserved pass-through, the %2%45
    // cascade case, dangling %, disguised tracking key, bad hex
    "http://a.com/esc%7E%41%2fX", "http://a.com/p%2%45",
    "http://a.com/p%", "http://a.com/%", "http://a.com/%g1%1",
    "http://a.com/x?utm%5Fsource=1&b=2", "http://a.com/%2Fa%2e",
    // ports: default elision (numeric), kept, malformed, overflow —
    // incl. the review-found case: >10 digits that are IN range once
    // leading zeros strip (try_cast accepts them; a raw length cap
    // diverged here)
    "http://a.com:080/x", "HTTPS://a.com:443/x", "https://a.com:8443/x",
    "http://a.com:99999999999999999999/x", "http://a.com:0080/x",
    "https://a.com:00000008443/x", "http://a.com:0000000000000000080/x",
    "http://a.com:00000000000/x", "http://a.com:02147483648/x",
    // query: tracking in various positions, order preservation,
    // emptied query, empty params
    "http://a.com/x?id=1&utm_source=n&b=2", "http://a.com/x?fbclid=z",
    "http://a.com/x?REF=1&z=2", "http://a.com/x?&&a=1&&",
    "http://a.com/x?gclid", "http://a.com/x?",
    // paths: trailing slashes, empty path, fragment interplay
    "http://a.com", "http://a.com/", "http://a.com//", "http://a.com///x///",
    "http://a.com#frag?notquery", "http://a.com/p#f", "http://a.com/p?q=1#f",
    // userinfo + case + absolute-FQDN
    "HTTP://User:PW@WWW.Ex.COM.:80/A/B/", "http://xn--BCHER-kva.com/Ü")

  test("canonicalizeUrl kernel == Column tier on the adversarial corpus") {
    val rows = canonAdversarial.toDF("url")
      .select(col("url"),
        UrlFunctions.canonicalizeUrl(col("url")).as("kernel"),
        UrlFunctions.canonicalizeUrlColumnTier(col("url")).as("column"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"canonicalizeUrl mismatch for '${r.getString(0)}': " +
          s"kernel=${r.get(1)} column=${r.get(2)}")
    }
  }

  test("canonicalizeUrl kernel == Column tier under seeded fuzz") {
    val rng = new scala.util.Random(31013L)
    val alphabet = "ab%417EF2fg.:/@?#&=~_- é".toCharArray
    val fuzz = Seq.fill(3000) {
      val n = rng.nextInt(48)
      val body = Array.fill(n)(alphabet(rng.nextInt(alphabet.length)))
      (if (rng.nextInt(4) > 0) "http://h.com" else "") + new String(body)
    }
    val rows = fuzz.toDF("url")
      .select(col("url"),
        UrlFunctions.canonicalizeUrl(col("url")).as("kernel"),
        UrlFunctions.canonicalizeUrlColumnTier(col("url")).as("column"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"canonicalizeUrl mismatch for '${r.getString(0)}': " +
          s"kernel=${r.get(1)} column=${r.get(2)}")
    }
  }

  test("null input and null-domain rows propagate") {
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, "nope"),
      (3L, "http://ok.example.com/x"))
      .toDF("id", "url")
      .select(UrlFunctions.urlDomain(col("url")).as("d"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(None, None, Some("example.com")))
  }
}
