package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parser-tier HTML → visible-text extraction — the long-tail companion
  * to the regex tier in [[graft.functions.HtmlFunctions]] (which remains
  * the documented 99% path: codegen'd, oracle-replayable, zero JVM
  * objects per row). This tier is a real single-pass tag TOKENIZER run
  * through `mapPartitions` (the documented last-resort tier: it breaks
  * whole-stage codegen for this one projection but stays scan-local and
  * zero-shuffle at any corpus size), for the markup the regex clauses
  * cannot see:
  *
  *   - quoted attribute values containing `>` (`<a title="a > b">` —
  *     the regex tag clause closes the tag at the quoted `>`);
  *   - CDATA sections: `<![CDATA[ ... ]]>` wrappers drop, inner text
  *     KEPT verbatim (the XML semantics — what embedded RSS/Atom
  *     payloads mean; the regex tier leaves the wrapper in the text);
  *   - downlevel-revealed conditional comments (`<![if !IE]>`) and
  *     other `<!`/`<?` bogus markup: dropped to the first `>`;
  *   - unterminated `<script>`/`<style>`/`<!--`: consumed to
  *     end-of-document (the HTML5 tokenizer behavior), where the regex
  *     tier degrades to keeping the content as text — a DOCUMENTED
  *     divergence outside the shared domain.
  *
  * SHARED-DOMAIN CONTRACT (HtmlParseSpec pins it, and the ht02 lane
  * enforces it against ht01's DuckDB regex replay as a full oracle): on
  * markup where every `<` begins well-formed markup (`<!`, `<?`, `</`,
  * or a letter; tags closed; no quoted `>`), the tokenizer output is
  * BYTE-EQUAL to `HtmlFunctions.stripHtml` — same block-tag newline
  * set, same inline-tag spaces, same single-pass entity decode (named +
  * ASCII numeric, decoded output never re-scanned), same whitespace
  * discipline. The entity and whitespace stages are Scala twins of the
  * Column formulas (same Java regex, same split-on-'&' replay).
  *
  * Scale: one pass, O(len) per document, no state across rows; the
  * operator appends one string column — partitioning, pushdown on other
  * columns, and everything downstream are unaffected. */
object HtmlParse {

  private val BlockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "tr", "table", "br")

  /** Case-insensitive indexOf for the raw-text close-tag scan. */
  private def indexOfCI(s: String, target: String, from: Int): Int = {
    val n = s.length; val m = target.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, target, 0, m)) return i
      i += 1
    }
    -1
  }

  /** Markup pass of the tokenizer: tags/comments/CDATA → separators
    * (block tags → '\n', everything else → ' ', CDATA inner text kept),
    * BEFORE entity decode and whitespace discipline — the same stage
    * order as the regex tier. */
  private[graft] def stripTags(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') { out.append(c); i += 1 }
      else if (html.startsWith("<!--", i)) {
        // comment: whole thing → one space; unterminated → to EOF
        val e = html.indexOf("-->", i + 4)
        out.append(' ')
        i = if (e >= 0) e + 3 else n
      } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
        // CDATA: wrappers drop, inner text kept; unterminated → rest
        // of the document is the inner text
        val e = html.indexOf("]]>", i + 9)
        if (e >= 0) { out.append(html, i + 9, e); i = e + 3 }
        else { out.append(html, i + 9, n); i = n }
      } else if (i + 1 < n &&
          (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        // bogus markup (<!doctype>, <![if !IE]>, <?xml?>): to first '>'
        val e = html.indexOf('>', i)
        if (e >= 0) { out.append(' '); i = e + 1 }
        else { out.append(html, i, n); i = n }
      } else if (i + 1 < n &&
          (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
        // a real tag: read the name, then scan QUOTE-AWARE for the
        // closing '>' (attribute values may contain '>')
        val isClose = html.charAt(i + 1) == '/'
        var j = if (isClose) i + 2 else i + 1
        val nameStart = j
        while (j < n && html.charAt(j).isLetterOrDigit) j += 1
        val name = html.substring(nameStart, j).toLowerCase
        var k = j
        var quote: Char = 0
        var closed = -1
        while (k < n && closed < 0) {
          val ch = html.charAt(k)
          if (quote != 0) { if (ch == quote) quote = 0 }
          else if (ch == '"' || ch == '\'') quote = ch
          else if (ch == '>') closed = k
          k += 1
        }
        if (closed < 0) {
          // unclosed tag: survives as literal text (regex-tier parity —
          // never delete to end-of-document on a truncated tag)
          out.append(html, i, n); i = n
        } else if (!isClose && (name == "script" || name == "style")) {
          // raw-text element: content to the matching close tag drops;
          // unterminated → to EOF (HTML5; regex tier diverges here by
          // contract)
          val closeIdx = indexOfCI(html, "</" + name, closed + 1)
          out.append(' ')
          if (closeIdx >= 0) {
            val gt = html.indexOf('>', closeIdx)
            i = if (gt >= 0) gt + 1 else n
          } else i = n
        } else {
          out.append(if (BlockTags(name)) '\n' else ' ')
          i = closed + 1
        }
      } else { out.append(c); i += 1 } // stray '<' before a non-tag char
    }
    out.toString
  }

  /** Scala twin of `HtmlFunctions.decodeEntities` — the same ONE
    * left-to-right pass over '&'-fragments (named bodies + ASCII
    * numeric refs, decoded output never re-scanned), kept
    * formula-identical so the two tiers cannot drift. */
  private[graft] def decodeEntitiesStr(text: String): String = {
    val parts = text.split("&", -1)
    if (parts.length <= 1) return text
    val out = new java.lang.StringBuilder(text.length)
    out.append(parts(0))
    var pi = 1
    while (pi < parts.length) {
      val p = parts(pi)
      out.append(decodeAmpFragment(p))
      pi += 1
    }
    out.toString
  }

  private val Named = Seq(
    "amp;" -> "&", "lt;" -> "<", "gt;" -> ">",
    "quot;" -> "\"", "apos;" -> "'", "nbsp;" -> " ")

  private def decodeAmpFragment(p: String): String = {
    Named.foreach { case (body, to) =>
      if (p.startsWith(body)) return to + p.substring(body.length)
    }
    // numeric refs: 1-7 decimal digits or 1-6 hex digits, then ';',
    // ASCII printable or tab/LF/CR — exactly the Column formula
    if (p.startsWith("#")) {
      var j = 1
      if (j < p.length && (p.charAt(j) == 'x' || p.charAt(j) == 'X')) {
        j += 1
        val start = j
        // ASCII hex ONLY — Character.digit(c, 16) also accepts fullwidth
        // and other Unicode digits, which the Column/DuckDB formula's
        // [0-9A-Fa-f] class keeps literal; accepting them here would
        // break the pinned byte-equality between the two tiers
        def asciiHex(c: Char): Boolean =
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
            (c >= 'A' && c <= 'F')
        while (j < p.length && j - start < 7 && asciiHex(p.charAt(j))) j += 1
        val len = j - start
        if (len >= 1 && len <= 6 && j < p.length && p.charAt(j) == ';') {
          val code = Integer.parseInt(p.substring(start, j), 16)
          if (asciiOk(code))
            return code.toChar.toString + p.substring(j + 1)
        }
      } else {
        val start = j
        while (j < p.length && j - start < 8 &&
          p.charAt(j) >= '0' && p.charAt(j) <= '9') j += 1
        val len = j - start
        if (len >= 1 && len <= 7 && j < p.length && p.charAt(j) == ';') {
          val code = Integer.parseInt(p.substring(start, j))
          if (asciiOk(code))
            return code.toChar.toString + p.substring(j + 1)
        }
      }
    }
    "&" + p
  }

  private def asciiOk(code: Int): Boolean =
    (code >= 32 && code <= 126) || code == 9 || code == 10 || code == 13

  /** Scala twin of the regex tier's whitespace discipline — the same
    * four Java regexes `regexp_replace` runs. */
  private[graft] def whitespaceDiscipline(s: String): String =
    s.replaceAll("[ \\t\\x0B\\f\\r]+", " ")
      .replaceAll(" ?\\n ?", "\n")
      .replaceAll("\\n+", "\n")
      .replaceAll("^[ \\n]+|[ \\n]+$", "")

  /** Full parser-tier extraction of one document: markup pass → entity
    * decode → whitespace discipline (the regex tier's stage order). */
  private[graft] def extractVisible(html: String): String =
    if (html == null) null
    else whitespaceDiscipline(decodeEntitiesStr(stripTags(html)))

  /** Operator form: (idCol, htmlCol) → (idCol, clean, n_raw_chars) via
    * one `mapPartitions` pass — scan-local, zero shuffle; `n_raw_chars`
    * lets callers compute the markup-share diagnostic without carrying
    * the raw markup further. Null markup → null clean, 0 raw chars. */
  def extractVisibleText(
      df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, html) =>
        // codePointCount, not String.length: the engines' length() is
        // code points, and astral chars would skew the permille
        (id, extractVisible(html),
          if (html == null) 0L
          else html.codePointCount(0, html.length).toLong)
      })
      .toDF(idCol, "clean", "n_raw_chars")
  }
}
