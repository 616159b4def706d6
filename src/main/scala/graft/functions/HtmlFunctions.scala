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
  *   5. entities decode in ONE left-to-right pass over `&`-fragments
  *      ([[decodeEntities]]): the five XML named entities + `&nbsp;`,
  *      and numeric character references (`&#NNN;`, `&#xHH;`) in the
  *      ASCII range (printable 32–126 + tab/LF/CR). Decoded output is
  *      never re-scanned, so `&amp;lt;` yields the text `&lt;` and
  *      `&amp;#38;` yields the text `&#38;` — no staged-replace
  *      cascade in either direction. Non-ASCII references
  *      (`&#8217;`-class) stay encoded by contract (engine `char()`
  *      is Latin-1-modulo-256 — full Unicode belongs to a parser
  *      tier);
  *   6. whitespace discipline: horizontal runs collapse to one space,
  *      spaces hugging newlines drop, newline runs collapse to one,
  *      result trimmed.
  * Unparseable/mismatched markup degrades gracefully (an unclosed
  * `<tag` with no `>` survives as TEXT — the extractor never deletes
  * to end-of-document on a truncated tag; a stray `>` is text). Not
  * handled, by contract: CDATA, conditional comments, non-ASCII
  * numeric references, and nested same-element script blocks — the
  * long tail a parser tier would own. */
object HtmlFunctions {

  /** Decode the entities the extractor owns — the six named forms
    * (`&amp; &lt; &gt; &quot; &apos; &nbsp;`, case-sensitive per the
    * HTML entity tables) plus NUMERIC character references
    * (`&#NNN;` decimal, `&#xHH;`/`&#XHH;` hex) for the ASCII range:
    * printable 32–126 and the whitespace codes 9/10/13. Non-ASCII
    * codepoints (`&#8217;`-class) stay encoded by contract — Spark's
    * `char()` is Latin-1-modulo-256, so decoding them could not match
    * a byte-exact DuckDB replay; the parser tier owns full Unicode.
    *
    * ONE left-to-right pass (the `decodeUnreservedEscapes` split
    * formulation): split on `&`, each fragment either decodes its
    * leading entity body or keeps its literal `&` back, and decoded
    * output is NEVER re-scanned. A staged replace-fold cascades no
    * matter how it is ordered — with `&amp;` last, `&amp;#38;`
    * (literal text `&#38;`) re-decodes to `&`; with `&amp;` first,
    * `&amp;lt;` manufactures a phantom `<` — while the single pass
    * gets both right (`&amp;#38;` → `&#38;`, `&amp;lt;` → `&lt;`,
    * `&&#108;t;` → `&lt;` as text). A dangling `&` with no entity
    * body behind it survives as the literal text it is. */
  def decodeEntities(text: Column): Column = {
    val parts = split(text, "&")
    val decodedTail = aggregate(
      slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
      lit(""),
      (acc, p) => concat(acc, decodeAmpFragment(p)))
    when(size(parts) <= 1, text)
      .otherwise(concat(element_at(parts, 1), decodedTail))
  }

  /** One post-`&` fragment: decode the leading entity body (named or
    * ASCII numeric) and keep the rest verbatim, or restore the `&`. */
  private def decodeAmpFragment(p: Column): Column = {
    val named: Seq[(String, String)] = Seq(
      "amp;" -> "&", "lt;" -> "<", "gt;" -> ">",
      "quot;" -> "\"", "apos;" -> "'", "nbsp;" -> " ")
    val dec = regexp_extract(p, "^#([0-9]{1,7});", 1)
    val hex = regexp_extract(p, "^#[xX]([0-9A-Fa-f]{1,6});", 1)
    val code = when(dec =!= "", dec.try_cast("int"))
      .when(hex =!= "", conv(hex, 16, 10).try_cast("int"))
    // consumed prefix: '#' + digits + ';' vs '#x' + hex + ';'
    val consumed = when(dec =!= "", length(dec) + 2)
      .otherwise(length(hex) + 3)
    val asciiOk = code.isNotNull &&
      ((code >= 32 && code <= 126) || code === 9 || code === 10 || code === 13)
    val numeric = when(asciiOk,
      concat(call_function("char", code),
        p.substr(consumed + 1, length(p))))
      .otherwise(concat(lit("&"), p))
    named.foldRight(numeric) { case ((body, to), els) =>
      when(substring(p, 1, body.length) === body,
        concat(lit(to), p.substr(lit(body.length + 1), length(p))))
        .otherwise(els)
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
