package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlFunctions._

/** Every clause of the HTML-extraction contract pinned on hand-built
  * markup, plus the graceful-degradation cases. */
class HtmlFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(stripHtml(col("h"))).head().getString(0)

  test("script/style elements drop whole; inline tags become spaces") {
    assert(strip("<p>keep</p><script>var x = '<b>no</b>';</script><p>this</p>")
      == "keep\nthis")
    assert(strip("<style type=\"text/css\">p{color:red}</style>hello")
      == "hello")
    // inline tags must not fuse words
    assert(strip("fast<b>er</b> and <i>slow</i>er") == "fast er and slow er")
  }

  test("comments drop; block tags become newlines, runs collapse") {
    assert(strip("<!-- hidden -->visible") == "visible")
    assert(strip("<h1>Title</h1><p>First.</p>\n\n<p>Second.</p>")
      == "Title\nFirst.\nSecond.")
    assert(strip("a<br/>b<br >c") == "a\nb\nc")
  }

  test("entities decode in one pass — no phantom tags from text") {
    assert(strip("<p>Tom &amp; Jerry &lt;3 &quot;q&quot; it&#39;s&nbsp;ok</p>")
      == "Tom & Jerry <3 \"q\" it's ok")
    // &amp;lt; is the TEXT '&lt;', never a tag
    assert(strip("<p>write &amp;lt; for less-than</p>")
      == "write &lt; for less-than")
  }

  test("numeric character references decode in the ASCII range") {
    // decimal, hex (either x case), leading zeros — all the same code
    assert(strip("<p>&#65;&#x42;&#X43; and &#0065;</p>") == "ABC and A")
    // tab/LF/CR decode then fall to the whitespace discipline
    assert(strip("<p>a&#9;b&#10;c&#13;d</p>") == "a b\nc d")
    // non-ASCII refs STAY encoded by contract (engine char() parity;
    // the parser tier owns full Unicode)
    assert(strip("<p>caf&#233; won&#8217;t</p>") == "caf&#233; won&#8217;t")
    // control/zero codes and malformed bodies stay literal text
    assert(strip("<p>&#0; &#7; &#bad; &#x; &#12345678;</p>")
      == "&#0; &#7; &#bad; &#x; &#12345678;")
  }

  test("single-pass decode: no cascade in either direction") {
    // a staged fold with &amp; LAST re-decodes '&amp;#38;' into '&';
    // the single pass keeps it as the literal text '&#38;'
    assert(strip("<p>&amp;#38; and &amp;#x26;</p>") == "&#38; and &#x26;")
    // a staged fold with &amp; FIRST turns '&amp;lt;' into '<'; and a
    // bare & followed by a numeric ref forming an entity body must
    // decode as text, never re-scan ('&' + 'l' + 't;' is '&lt;' TEXT)
    assert(strip("<p>R&D and A&&#108;t;B</p>") == "R&D and A&lt;B")
    // numeric ampersand itself: decoded output never re-enters the scan
    assert(strip("<p>&#38;lt; stays</p>") == "&lt; stays")
    // dangling ampersands survive as text
    assert(strip("<p>a && b & c &</p>") == "a && b & c &")
  }

  test("malformed markup degrades gracefully") {
    // stray '>' is text; an unclosed '<tag' with no '>' survives as
    // text — never a delete-to-end-of-document
    assert(strip("a > b <span") == "a > b <span")
    // unterminated script: the non-greedy element regex can't match, the
    // tag-level pass still strips the open tag, content survives as text
    assert(strip("<script>orphan") == "orphan")
    assert(strip("") == "")
  }

  test("markupPermille: mostly-markup pages score high, plain text zero") {
    val df = Seq(
      ("markup", "<div><script>var a=1;var b=2;var c=3;</script><p>hi</p></div>"),
      ("plain", "just plain prose with no tags at all")
    ).toDF("k", "h").select(col("k"), markupPermille(col("h")).as("m"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("plain") == 0L)
    assert(m("markup") > 900L, s"got ${m("markup")}")
  }
}
