package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the fetch-side stage (CommonCrawl WARC →
  * WET, C4's "extract visible text") that runs even before the URL
  * front door's content policies. A real extractor is a full HTML5
  * parser; this is the deliberately-documented regex tier every
  * large-scale pipeline actually ships for the 99% path (trafilatura/
  * jusText-class tools fall back to exactly these rules when parsing
  * fails), expressed as a codegen'd scan-local Column chain whose every
  * regex lives in the Java∩RE2 intersection — so a DuckDB oracle
  * replays the extraction byte-for-byte.
  *
  * Extraction contract (each clause documented, deliberately simple):
  *   1. `<script>`/`<style>` ELEMENTS drop whole (tag + content — the
  *      two elements whose text is never prose), non-greedy per
  *      element, case-insensitive, dot-matches-newline;
  *   2. HTML comments (`<!-- -->`) drop whole;
  *   3. block-level boundaries (`p`, `div`, `h1..h6`, `li`, `ul`,
  *      `ol`, `tr`, `table`, `br`) become NEWLINES (open or close tag
  *      — a paragraph break must not fuse the words around it);
  *   4. every remaining tag becomes a single space (inline tags like
  *      `<b>` must not fuse words either);
  *   5. the five XML entities + `&nbsp;` and `&#39;` decode —
  *      `&amp;` LAST, so `&amp;lt;` yields the text `&lt;` and never
  *      double-decodes into a phantom tag;
  *   6. whitespace discipline: horizontal runs collapse to one space,
  *      spaces hugging newlines drop, newline runs collapse to one,
  *      result trimmed.
  * Unparseable/mismatched markup degrades gracefully (an unclosed
  * `<tag` with no `>` survives as TEXT — the extractor never deletes
  * to end-of-document on a truncated tag; a stray `>` is text). Not
  * handled, by contract: CDATA, conditional comments,
  * numeric entities beyond `&#39;`, and nested same-element script
  * blocks — the long tail a parser tier would own. */
object HtmlFunctions {

  /** Decode the six named/numeric entities the extractor owns;
    * `&amp;` decodes LAST (the standard ordering — decoding it first
    * would turn `&amp;lt;` into `<`, manufacturing a tag out of text). */
  def decodeEntities(text: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&nbsp;" -> " ",
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&apos;" -> "'",
      "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (from, to)) =>
      call_function("replace", c, lit(from), lit(to))
    }
  }

  /** Visible text of an HTML string under the object-scaladoc contract.
    * Pure scan-local regexp work — zero shuffle at any corpus size. */
  def stripHtml(html: Column): Column = {
    // 1. script/style elements drop whole (two passes — RE2 has no
    // backreferences to pin open/close tag equality in one)
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    // 2. comments
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // 3. block boundaries -> newline (explicit whitespace class — the
    // tx02 convention: Java's and RE2's \s disagree on \x0B)
    val blocks = regexp_replace(noComment,
      "(?i)</?(p|div|h[1-6]|li|ul|ol|tr|table|br)" +
        "([ \\t\\n\\x0B\\f\\r][^>]*)?/?>", "\n")
    // 4. every remaining tag -> space
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    // 5. entities
    val decoded = decodeEntities(noTags)
    // 6. whitespace discipline (the edge strip is explicit because
    // trim() in BOTH engines strips only spaces, not newlines)
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " "),
          " ?\\n ?", "\n"),
        "\\n+", "\n"),
      "^[ \\n]+|[ \\n]+$", "")
  }

  /** Markup-share diagnostic: permille of the RAW length that the
    * extractor dropped (tags, scripts, comments, collapsed space) — a
    * cheap boilerplate-density signal (a page that is 95% markup is
    * rarely prose). Integer permille via the house `ldiv`; 0 for empty
    * input. */
  def markupPermille(html: Column): Column = {
    val rawLen = length(html).cast("long")
    val cleanLen = length(stripHtml(html)).cast("long")
    when(rawLen <= 0L, lit(0L))
      .otherwise(TextFunctions.ldiv(
        (rawLen - cleanLen) * lit(1000L), rawLen))
  }
}
