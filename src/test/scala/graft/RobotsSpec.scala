package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots

/** Every clause of the robots.txt contract (RFC 9309 semantics, the
  * documented simplifications) on hand-built documents. */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rules(doc: String, agent: String = "graftbot") =
    Robots.parseRobots(
      Seq(("d1", doc)).toDF("domain", "robots"), "domain", "robots", agent)
      .select("pattern", "is_allow", "plen")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
      .toSet

  private def gate(doc: String, paths: Seq[String], agent: String = "graftbot")
      : Map[String, Boolean] = {
    val r = Robots.parseRobots(
      Seq(("d1", doc)).toDF("domain", "robots"), "domain", "robots", agent)
    val urls = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, "d1", p) }
      .toDF("id", "dom", "path")
    val out = Robots.robotsGate(urls, "id", "dom", "path", r)
      .collect().map(r2 => (r2.getLong(0), r2.getBoolean(1))).toMap
    paths.zipWithIndex.map { case (p, i) => p -> out(i.toLong) }.toMap
  }

  test("parse: comments, CRLF, blank lines, mixed case, colon spacing") {
    val doc = "# top comment\r\nUser-Agent : *\r\n\r\n" +
      "DISALLOW: /private # inline comment\r\nAllow:/private/ok\r\n"
    assert(rules(doc) == Set(
      ("/private", false, 8L),
      ("/private/ok", true, 11L)))
  }

  test("parse: consecutive user-agent lines share one group") {
    val doc = "User-agent: alpha\nUser-agent: graftbot\nDisallow: /x\n" +
      "User-agent: beta\nDisallow: /y\n"
    // graftbot's group carries /x only; beta's group is not selected
    assert(rules(doc) == Set(("/x", false, 2L)))
  }

  test("parse: agent-named groups beat * groups; else * applies") {
    val doc = "User-agent: graftbot\nDisallow: /g\n" +
      "User-agent: *\nDisallow: /star\n"
    assert(rules(doc) == Set(("/g", false, 2L)))
    assert(rules(doc, agent = "otherbot") == Set(("/star", false, 5L)))
    // two groups naming the agent BOTH apply (RFC: rules combine)
    val two = "User-agent: graftbot\nDisallow: /a\n" +
      "User-agent: GRAFTBOT\nAllow: /a/b\n"
    assert(rules(two) == Set(("/a", false, 2L), ("/a/b", true, 4L)))
  }

  test("parse: rules before any group and empty patterns are dropped") {
    val doc = "Disallow: /orphan\nUser-agent: *\nDisallow:\nAllow: /ok\n"
    assert(rules(doc) == Set(("/ok", true, 3L)))
  }

  test("gate: longest match wins, allow wins ties, default allow") {
    val doc = "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
    val got = gate(doc, Seq(
      "/private/secret", // disallow (/private is the longest match)
      "/private/ok/page", // allow (11 > 8)
      "/public/page", // no rule matches -> allowed
      "/priv")) // prefix of the rule, not matched by it -> allowed
    assert(got == Map(
      "/private/secret" -> false,
      "/private/ok/page" -> true,
      "/public/page" -> true,
      "/priv" -> true))
    // tie: equal-length allow and disallow -> allow (least restrictive)
    val tie = "User-agent: *\nDisallow: /ab\nAllow: /ab\n"
    assert(gate(tie, Seq("/abc")) == Map("/abc" -> true))
    // precedence is OCTET length (§2.2.2): "/café" is 5 chars / 6 BYTES
    // and "/caf*" 5/5 — char length would call it a tie (allow wins);
    // octet length ranks the disallow first, as a conforming crawler does
    val octets = "User-agent: *\nDisallow: /café\nAllow: /caf*\n"
    assert(gate(octets, Seq("/café-zone")) == Map("/café-zone" -> false))
  }

  test("gate: * wildcard and trailing-$ anchor (RFC 9309 §2.2.3)") {
    val doc = "User-agent: *\nDisallow: /docs/*.pdf$\nDisallow: /x*y\n"
    val got = gate(doc, Seq(
      "/docs/a.pdf",      // anchored match -> disallowed
      "/docs/a.pdf?x=1",  // $ anchor: query tail breaks the match
      "/docs/deep/b.pdf", // * spans path segments
      "/xZZZy",           // /x*y
      "/xZZZyMore",       // prefix match (no anchor) -> disallowed
      "/x"))              // incomplete -> allowed
    assert(got == Map(
      "/docs/a.pdf" -> false,
      "/docs/a.pdf?x=1" -> true,
      "/docs/deep/b.pdf" -> false,
      "/xZZZy" -> false,
      "/xZZZyMore" -> false,
      "/x" -> true))
  }

  test("gate: regex metacharacters in patterns stay literal") {
    val doc = "User-agent: *\nDisallow: /a+b(c).d\n"
    val got = gate(doc, Seq("/a+b(c).d/e", "/aab(c)xd"))
    // '+(),.' are literal: only the exact prefix matches
    assert(got == Map("/a+b(c).d/e" -> false, "/aab(c)xd" -> true))
  }

  private def meta(doc: String, agent: String = "graftbot") = {
    val r = Robots.robotsMeta(
      Seq(("d1", doc)).toDF("domain", "robots"), "domain", "robots", agent)
      .head()
    (if (r.isNullAt(1)) None else Some(r.getLong(1)),
      r.getLong(2), r.getSeq[String](3).toList)
  }

  test("meta: group-scoped crawl-delay, fractional floor, shadowing, conservative max") {
    // selected * group: 1.5 s -> 1500 ms; sitemap surfaced
    assert(meta("User-agent: *\nCrawl-delay: 1.5\nDisallow: /a\n" +
      "Sitemap: https://s1/sm.xml") ==
      ((Some(1500L), 1L, List("https://s1/sm.xml"))))
    // agent-named group shadows the * group's delay
    assert(meta("User-agent: graftbot\nCrawl-delay: 2\n" +
      "User-agent: *\nCrawl-delay: 9")._1 == Some(2000L))
    // bogus delay in one selected group is ignored; the parseable
    // 0.25 s in the consecutive-UA shared group is the only candidate
    assert(meta("User-agent: graftbot\nCrawl-delay: bogus\n" +
      "User-agent: alpha\nUser-agent: graftbot\nCrawl-delay: 0.25")._1 ==
      Some(250L))
    // foreign-agent-only file: no selected group -> null delay, but
    // sitemaps are group-independent and sorted distinct
    assert(meta("User-agent: otherbot\nCrawl-delay: 3\n" +
      "Sitemap: https://s3/b.xml\nSitemap: https://s3/a.xml\n" +
      "Sitemap: https://s3/a.xml") ==
      ((None, 2L, List("https://s3/a.xml", "https://s3/b.xml"))))
    // for DELAY attribution a crawl-delay is a group MEMBER record: it
    // ENDS a user-agent run, so alpha and graftbot here are separate
    // groups and graftbot waits its own group's 7 s (the access parser
    // would merge these UA lines — each side implements its own spec)
    assert(meta("User-agent: alpha\nCrawl-delay: 4\n" +
      "User-agent: graftbot\nCrawl-delay: 7\nDisallow: /x")._1 ==
      Some(7000L))
    // both selected groups carry a delay: the conservative MAX wins
    assert(meta("User-agent: graftbot\nCrawl-delay: 3\n" +
      "User-agent: graftbot\nCrawl-delay: 8")._1 == Some(8000L))
    // negative delays are invalid -> ignored
    assert(meta("User-agent: *\nCrawl-delay: -5")._1 == None)
    // NaN/Infinity/absurd values are garbage, never a zero or maximal
    // delay (floor(NaN) would otherwise convert to 0 and win)
    assert(meta("User-agent: *\nCrawl-delay: NaN\n" +
      "User-agent: *\nCrawl-delay: 5")._1 == Some(5000L))
    assert(meta("User-agent: *\nCrawl-delay: Infinity")._1 == None)
    assert(meta("User-agent: *\nCrawl-delay: 1e300")._1 == None)
    assert(meta("User-agent: *\nCrawl-delay: 90000")._1 == None)
    // null robots: null delay, empty sitemap list
    val r0 = Robots.robotsMeta(
      Seq(("d1", Option.empty[String])).toDF("domain", "robots"),
      "domain", "robots", "graftbot").head()
    assert(r0.isNullAt(1) && r0.getLong(2) == 0L)
  }

  test("gate: no robots / empty robots -> everything allowed") {
    val r = Robots.parseRobots(
      Seq(("d1", null: String), ("d2", "")).toDF("domain", "robots"),
      "domain", "robots", "graftbot")
    assert(r.count() == 0)
    val urls = Seq((1L, "d1", "/any"), (2L, "d3", "/other"))
      .toDF("id", "dom", "path")
    val out = Robots.robotsGate(urls, "id", "dom", "path", r)
      .collect().map(x => (x.getLong(0), x.getBoolean(1))).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }
}
