package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlFunctions._

/** The URL front door: every canonicalization choice in the
  * UrlFunctions contract pinned on hand-built URLs, plus the dedup /
  * domain-cap operators over them. */
class UrlFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(url: String): Option[String] =
    Option(Seq(url).toDF("u")
      .select(canonicalizeUrl(col("u"))).head().getString(0))

  test("canonicalizeUrl: scheme/host lowercase, path case preserved") {
    assert(canon("HTTP://WWW.Example.COM/Path/File") ==
      Some("http://www.example.com/Path/File"))
  }

  test("canonicalizeUrl: default ports drop, explicit ports survive") {
    assert(canon("http://a.com:80/x") == Some("http://a.com/x"))
    assert(canon("https://a.com:443/x") == Some("https://a.com/x"))
    // :80 is NOT the default for https — it must survive
    assert(canon("https://a.com:80/x") == Some("https://a.com:80/x"))
    assert(canon("http://a.com:8080/x") == Some("http://a.com:8080/x"))
  }

  test("canonicalizeUrl: ports fold numerically (zero-padding, normalization)") {
    // :080 IS the http default; a kept port emits without leading zeros
    assert(canon("http://a.com:080/x") == Some("http://a.com/x"))
    assert(canon("https://a.com:0443/x") == Some("https://a.com/x"))
    assert(canon("http://a.com:08080/x") == Some("http://a.com:8080/x"))
    // an int-overflowing port is malformed and drops like an absent one
    assert(canon("http://a.com:99999999999/x") == Some("http://a.com/x"))
  }

  test("canonicalizeUrl/urlHost/urlDomain: absolute-FQDN trailing dots fold") {
    assert(canon("http://example.com./p") == Some("http://example.com/p"))
    val r = Seq("http://sub.example.com.:80/p").toDF("u")
      .select(urlHost(col("u")), urlDomain(col("u"))).head()
    assert(r.getString(0) == "sub.example.com")
    assert(r.getString(1) == "example.com")
    // defensive strip on a bare host too — never an empty pseudo-domain
    val d = Seq("example.com.").toDF("h")
      .select(registeredDomain(col("h"))).head().getString(0)
    assert(d == "example.com")
  }

  test("canonicalizeUrl: unreserved percent-escapes decode, reserved stay") {
    // %7E='~' %41='A' decode (both hex cases); %2F='/' is RESERVED and
    // must stay exactly as written, case included
    assert(canon("http://a.com/esc%7E%41%2fX") ==
      Some("http://a.com/esc~A%2fX"))
    assert(canon("http://a.com/u%7e") == Some("http://a.com/u~"))
    // a percent-disguised tracking key is decoded, then filtered
    assert(canon("http://a.com/x?utm%5Fsource=n&b=2") ==
      Some("http://a.com/x?b=2"))
    // %25 = '%' never decodes (it would double-decode)
    assert(canon("http://a.com/p%2541") == Some("http://a.com/p%2541"))
    // SINGLE-PASS: a decoded char must never complete a dangling '%h'
    // into a brand-new escape (a replace-fold would turn %2%45 into
    // '.' via the manufactured %2E, colliding distinct raw URLs)
    assert(canon("http://a.com/p%2%45") == Some("http://a.com/p%2E"))
    assert(canon("http://a.com/x%7%41") == Some("http://a.com/x%7A"))
    // dangling escapes survive as the literal text they are
    assert(canon("http://a.com/a%") == Some("http://a.com/a%"))
    assert(canon("http://a.com/a%4") == Some("http://a.com/a%4"))
    assert(canon("http://a.com/a%zz") == Some("http://a.com/a%zz"))
  }

  test("canonicalizeUrl: userinfo and fragment strip") {
    assert(canon("http://user:pw@a.com/x#frag") == Some("http://a.com/x"))
    // an @ in the PATH must not trigger the userinfo strip
    assert(canon("http://a.com/x@y") == Some("http://a.com/x@y"))
  }

  test("canonicalizeUrl: tracking params drop, order preserved, case-insensitive keys") {
    assert(canon("http://a.com/x?b=2&utm_source=nl&a=1&fbclid=z") ==
      Some("http://a.com/x?b=2&a=1"))
    assert(canon("http://a.com/x?UTM_CAMPAIGN=c&gclid") ==
      Some("http://a.com/x"))
    // a key that merely CONTAINS a tracking key is not a tracking key
    assert(canon("http://a.com/x?xref=1&refresh=2") ==
      Some("http://a.com/x?xref=1&refresh=2"))
  }

  test("canonicalizeUrl: trailing slashes and empty path fold to one form") {
    assert(canon("http://a.com") == Some("http://a.com/"))
    assert(canon("http://a.com/") == Some("http://a.com/"))
    assert(canon("http://a.com//") == Some("http://a.com/"))
    assert(canon("http://a.com/p/") == Some("http://a.com/p"))
    // query survives path-slash folding
    assert(canon("http://a.com/?q=1") == Some("http://a.com/?q=1"))
  }

  test("canonicalizeUrl: non-URLs reject to null, www is kept") {
    assert(canon("not a url at all").isEmpty)
    assert(canon("a.com/no-scheme").isEmpty)
    assert(canon("http://WWW.a.com/x") == Some("http://www.a.com/x"))
  }

  test("urlHost / urlDomain: gated on the scheme, eTLD+1 heuristic") {
    val rows = Seq(
      "https://News.BBC.co.uk:443/story",
      "http://cdn.static.example.com/a",
      "http://localhost:9000/x",
      "http://10.0.0.1/x",
      "garbage string").toDF("u")
      .select(urlHost(col("u")).as("h"), urlDomain(col("u")).as("d"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows(0) == (("news.bbc.co.uk", Some("bbc.co.uk"))))
    assert(rows(1) == (("cdn.static.example.com", Some("example.com"))))
    assert(rows(2) == (("localhost", Some("localhost"))))
    assert(rows(3) == (("10.0.0.1", Some("10.0.0.1"))))
    // no scheme: host is empty, domain is null — garbage never parses
    // as its own host
    assert(rows(4) == (("", None)))
  }

  test("registeredDomain: public-suffix snapshot keeps tenant + suffix") {
    def dom(h: String): String = Seq(h).toDF("h")
      .select(registeredDomain(col("h"))).head().getString(0)
    // 2-label platform suffix: every tenant is its own publisher —
    // lumping all of github.io into one domainCap budget is the silent
    // merge the snapshot exists to prevent
    assert(dom("alice.github.io") == "alice.github.io")
    assert(dom("www.alice.github.io") == "alice.github.io")
    // 3-label snapshot suffix keeps FOUR labels
    assert(dom("myblog.blogspot.co.uk") == "myblog.blogspot.co.uk")
    assert(dom("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
    // ccTLD second-level registries outside the ps2 set
    assert(dom("foo.ne.jp") == "foo.ne.jp")
    assert(dom("x.foo.ne.jp") == "foo.ne.jp")
    assert(dom("beehive.govt.nz") == "beehive.govt.nz")
    // CentralNic pseudo-ccTLD (3-letter TLD — the ps2-cc branch can't
    // see it; last-two would merge every uk.com tenant)
    assert(dom("shop.uk.com") == "shop.uk.com")
    // the suffix ITSELF (no tenant label) falls through to last-two
    assert(dom("github.io") == "github.io")
    // ps2-cc and plain tiers unchanged by the snapshot branch
    assert(dom("news.bbc.co.uk") == "bbc.co.uk")
    assert(dom("sub.example.com") == "example.com")
  }

  test("publicSuffixSnapshot invariant: no entry is a dot-suffix of another") {
    // exactly one alternation branch can match any host, so neither
    // engine's alternation-preference semantics can change an answer
    val entries = graft.functions.UrlFunctions.publicSuffixSnapshot
    assert(entries.distinct.size == entries.size)
    for (a <- entries; b <- entries if a != b)
      assert(!b.endsWith("." + a),
        s"'$b' ends with '.$a' — overlapping snapshot entries")
    // and every entry is multi-label lowercase (single-label entries
    // would shadow real TLDs; case would silently never match the
    // lowercased host)
    entries.foreach { e =>
      assert(e.contains(".") && e == e.toLowerCase, e)
    }
  }

  test("IDN policy (clause 10): punycode folds case, passes through, and " +
      "stays distinct from the Unicode form") {
    // A-label host: case folds, never IDNA-decoded
    assert(canon("http://XN--BCHER-KVA.com/Path") ==
      Some("http://xn--bcher-kva.com/Path"))
    // registeredDomain works on punycode labels like any other label
    def dom(h: String): String = Seq(h).toDF("h")
      .select(registeredDomain(col("h"))).head().getString(0)
    assert(dom("www.xn--bcher-kva.co.uk") == "xn--bcher-kva.co.uk")
    assert(dom("xn--fiq228c.github.io") == "xn--fiq228c.github.io")
    // the U-label spelling of the same host is a DISTINCT canonical by
    // policy (mapping U->A is full IDNA2008+UTS46, owned upstream)
    val uLabel = canon("http://bücher.com/Path")
    assert(uLabel == Some("http://bücher.com/Path"))
    assert(uLabel != canon("http://xn--bcher-kva.com/Path"))
  }

  test("urlFilterSignals: each rule fires on its own trigger, null canon fails all") {
    val cases = Seq(
      (1L, "http://a.com/docs/page1?q=1"),                    // keeps
      (2L, "http://a.com/img/logo.png"),                      // extension
      (3L, "http://a.com/a/b/c/d/e/f/g/h/i/page"),            // depth (10)
      (4L, "http://a.com/x?a=1&b=2&c=3&d=4&e=5"),             // params (5)
      (5L, "http://a.com/20240101/9988776655"),               // digits
      (6L, "http://a.com/best-casino-bonuses"),               // blocklist
      (7L, "http://a.com/" + "p" * 200),                      // length
      (8L, "no scheme here"),                                 // unparseable
      (9L, "http://a.com/img/logo.PNG"),                      // case-folded ext
      (10L, "http://a.com/Casino-Royale-review")              // case-folded block
    ).toDF("id", "url")
    val sigs = graft.functions.UrlFunctions.urlFilterSignals(col("url"))
    val got = cases
      .select(col("id") +: sigs.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> r).toMap
    def rule(id: Long, name: String) = got(id).getAs[Boolean](name)
    assert(rule(1L, "keep"))
    assert(!rule(2L, "r_extension") && !rule(2L, "keep") &&
      rule(2L, "r_length"))
    assert(!rule(3L, "r_path_depth") &&
      got(3L).getAs[Long]("n_path_segments") == 10L)
    assert(!rule(4L, "r_params") && got(4L).getAs[Long]("n_params") == 5L)
    assert(!rule(5L, "r_digits"))
    assert(!rule(6L, "r_blocklist"))
    assert(!rule(7L, "r_length"))
    // unparseable: null canonical, every rule false, zero counters
    assert(got(8L).isNullAt(got(8L).fieldIndex("url_canon")))
    for (n <- Seq("r_extension", "r_length", "r_path_depth", "r_params",
        "r_digits", "r_blocklist", "keep"))
      assert(!rule(8L, n), n)
    // rules match case-insensitively even though canonical paths keep
    // their case: /logo.PNG and /Casino must still trip
    assert(!rule(9L, "r_extension"))
    assert(!rule(10L, "r_blocklist"))
  }

  test("urlDedup: keep-first by id per canonical URL; unparseable rows all survive") {
    val df = Seq(
      (1L, "http://a.com/x?utm_source=nl"),
      (2L, "HTTP://A.COM:80/x"),   // same canonical as id 1
      (3L, "http://a.com/x/"),     // same again (trailing slash)
      (4L, "http://a.com/y"),
      (5L, "junk"),
      (6L, "junk")                 // unparseable rows never group
    ).toDF("id", "url")
    val got = operators.Dedup.urlDedup(df, "id", "url")
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, Some("http://a.com/x"), 3L),
      (4L, Some("http://a.com/y"), 1L),
      (5L, None, 1L),
      (6L, None, 1L)))
  }

  test("urlDedup: a null id raises instead of collapsing junk rows") {
    // a NULL id on an unparseable row nulls the whole coalesced group
    // key — every null-id junk row would silently merge into ONE group
    // with a null survivor; the contract is unique AND non-null ids,
    // enforced with a loud raise
    val df = Seq(
      (Some(1L), "junk one"),
      (None: Option[Long], "junk two")
    ).toDF("id", "url")
    val e = intercept[Exception] {
      operators.Dedup.urlDedup(df, "id", "url").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("urlDedup: null id")))
  }

  test("domainCap: per-registered-domain min-k, unparseable rows excluded") {
    // 10 docs on example.com (via two different hosts), 2 on b.org, 1 junk
    val rows = (1L to 10L).map(i =>
      (i, s"http://${if (i % 2 == 0) "www" else "cdn"}.example.com/p$i")) ++
      Seq((11L, "http://b.org/x"), (12L, "http://b.org/y"), (13L, "nope"))
    val df = rows.toDF("id", "url")
    val got = operators.Sampling.domainCap(df, "id", "url", k = 3,
      salt = "t")
    val byDom = got.collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byDom == Map("example.com" -> 3, "b.org" -> 2))
    // ranks are 1..k dense per domain
    val ranks = got.filter(col("domain") === "example.com")
      .orderBy(col("sample_rank")).collect().map(_.getLong(2)).toSeq
    assert(ranks == Seq(1L, 2L, 3L))
    // content-addressed: same answer on re-run and under reordering
    val again = operators.Sampling.domainCap(
      df.orderBy(desc("id")), "id", "url", k = 3, salt = "t")
    assert(again.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      got.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }
}
