package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HtmlParse

/** The parser tier's two contracts: byte-equality with the regex tier
  * on the shared domain (well-formed markup), and the documented
  * long-tail behaviors the regex clauses cannot see. */
class HtmlParseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def regexTier(html: String): String =
    Seq(html).toDF("h")
      .select(graft.functions.HtmlFunctions.stripHtml(col("h")))
      .head().getString(0)

  private def parsed(html: String): String = HtmlParse.extractVisible(html)

  /** Shared-domain corpus: every '<' begins well-formed markup, tags
    * close, no quoted '>' — the regex tier's documented domain. */
  private val sharedDomain = Seq(
    "<p>plain paragraph</p>",
    "<html><!-- c --><head><style>p{color:red}</style>" +
      "<script>var x=1; if (x<2) { x = 3; }</script></head><body>" +
      "<h1>Doc 7</h1><p>some text</p><div>Tom &amp; Jerry &lt;3 " +
      "<b>bold</b>&nbsp;and &quot;q&quot; it&#39;s done, R&D dept, " +
      "A&#65;&#x42;Z caf&#233; won&#8217;t &amp;#38; &#bad;</div>" +
      "</body></html>",
    "fast<b>er</b> and <i>slow</i>er",
    "<h1>Title</h1><p>First.</p>\n\n<p>Second.</p>",
    "a<br/>b<br >c",
    "<ul><li>one</li><li>two</li></ul><table><tr>x</tr></table>",
    "<DIV CLASS='a'>upper</DIV><P>case</P>",
    "<pre>not a block p</pre><divx>nor div</divx><h7>nor h</h7>",
    "<script>a<script>b</script>c</script>",
    "<!doctype html><p>after doctype</p>",
    "&#9;tab &#10;lf &#13;cr &#32;space &#126;~ &#x7E;~",
    "no markup at all, just text with &amp; and 7 < 8 spelled &lt;",
    "")

  test("shared domain: parser tier is byte-equal to the regex tier") {
    sharedDomain.foreach { h =>
      assert(parsed(h) == regexTier(h), s"diverged on: $h")
    }
  }

  test("ht02's premise: the ht01 synth is in the shared domain") {
    // the lane-level oracle equality rests on this — the synthesized
    // markup around arbitrary document text must extract identically
    // through both tiers
    for (txt <- Seq("plain words", "with & ampersand", "digits 123",
        "<already> <markup>", "q > r", "multi\nline\ttext")) {
      val h = s"<html><!-- id 5 --><head><style>p{color:red}</style>" +
        s"<script>var x=1; if (x<2) { x = 3; }</script></head><body>" +
        s"<h1>Doc 5</h1><p>$txt</p><div>Tom &amp; Jerry</div></body></html>"
      // note: doc text containing '<'/'>' is handled — both tiers see
      // the same characters; equality, not prettiness, is the contract
      if (!txt.contains("<"))
        assert(parsed(h) == regexTier(h), s"diverged on text: $txt")
    }
  }

  test("parser-only: quoted '>' inside attributes does not split the tag") {
    assert(parsed("""<a title="a > b">link</a> text""") == "link text")
    assert(parsed("<img alt='x>y'>after") == "after")
    // the regex tier documented limitation on the same input: its tag
    // clause closes at the quoted '>', leaking the rest of the tag
    assert(regexTier("""<a title="a > b">link</a> text""") != "link text")
  }

  test("parser-only: CDATA wrappers drop, inner text kept") {
    assert(parsed("<p>before <![CDATA[kept < raw & text]]> after</p>")
      == "before kept < raw & text after")
    // unterminated CDATA: rest of the document is the inner text
    assert(parsed("<p>x</p><![CDATA[tail") == "x\ntail")
  }

  test("parser-only: bogus and conditional markup drops to the first '>'") {
    assert(parsed("<![if !IE]>shown<![endif]>") == "shown")
    assert(parsed("<?xml version='1.0'?>doc") == "doc")
    // full conditional comments are ordinary comments in both tiers
    assert(parsed("<!--[if IE]><p>ie only</p><![endif]-->rest") == "rest")
    assert(regexTier("<!--[if IE]><p>ie only</p><![endif]-->rest") == "rest")
  }

  test("documented divergence: unterminated raw-text drops to EOF (HTML5)") {
    // the regex tier keeps orphan script content as text (graceful
    // degradation); the parser follows the HTML5 tokenizer and treats
    // everything after <script> as script data
    assert(parsed("<script>orphan") == "")
    assert(regexTier("<script>orphan") == "orphan")
    // unterminated COMMENT likewise consumes to EOF in the parser
    assert(parsed("<!-- never closed <p>x</p>") == "")
  }

  test("unclosed plain tag stays literal text in both tiers") {
    assert(parsed("a > b <span") == "a > b <span")
    assert(regexTier("a > b <span") == "a > b <span")
  }

  test("entity twin: decodeEntitiesStr equals the Column decode") {
    val cases = Seq(
      "Tom &amp; Jerry &lt;3 &quot;q&quot; it&#39;s&nbsp;ok",
      "&amp;#38; and &amp;#x26;", "R&D and A&&#108;t;B", "&#38;lt; stays",
      "a && b & c &", "&#65;&#x42;&#X43; and &#0065;",
      "&#0; &#7; &#bad; &#x; &#12345678;", "caf&#233; won&#8217;t",
      // non-ASCII digits (fullwidth 20, Arabic-Indic 65) must stay
      // literal in BOTH tiers: the Column regex class is [0-9A-Fa-f]
      // and the Scala scanner must not be wider (Character.digit is)
      "&#x２０; and &#٦٥; stay",
      "", "&", "&&", "&amp", "&#", "&#x", "plain")
    val colOut = cases.toDF("s")
      .select(graft.functions.HtmlFunctions.decodeEntities(col("s")))
      .collect().map(_.getString(0)).toSeq
    val strOut = cases.map(HtmlParse.decodeEntitiesStr)
    assert(strOut == colOut)
  }

  test("operator form: one mapPartitions pass, null markup -> null clean") {
    val df = Seq(
      (1L, Some("<p>Hello &amp; welcome</p>")),
      (2L, None: Option[String])
    ).toDF("doc_id", "html")
    val got = HtmlParse.extractVisibleText(df, "doc_id", "html")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, Some("Hello & welcome"), 26L),
      (2L, None, 0L)))
  }
}
