package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registered domain (eTLD+1) of a raw URL as ONE codegen'd expression —
  * the compiled twin of the Column-tier chain
  * `UrlFunctions.urlDomain = registeredDomain(urlHost(url))`.
  *
  * Why this exists: the Column composition re-embeds the whole
  * `urlHost` regex tree at every one of `registeredDomain`'s ~8
  * references to its host argument (Column trees have no let-binding),
  * and predicate pushdown then duplicates the expanded tree again into
  * the null-domain filter. In `Sampling.domainCap` that inlined to a
  * single `sort_addToSorter` method past the JVM's 64 KB limit — Spark
  * fell back to interpreted eval on the per-URL hot path, exactly the
  * wrong plan at crawl scale. This expression generates a three-line
  * call site (one static method call per row) and runs each regex
  * ONCE over precompiled patterns, so the hot path stays inside
  * whole-stage codegen no matter what surrounds it.
  *
  * Semantics are equal BY CONSTRUCTION: [[UrlKernel]] runs the exact
  * same pattern strings through the same `java.util.regex` engine that
  * Spark's `rlike`/`regexp_extract`/`regexp_replace` use, in the same
  * composition order, with `UTF8String.toLowerCase` for the case fold
  * (the locale-free fold `lower()` performs — `String#toLowerCase`
  * would diverge under tr/az locales). `UrlKernelSpec` pins the
  * equivalence against the Column tier on adversarial corpora, and the
  * url03/mw01/wp03 DuckDB oracles value-check it end to end.
  */
/** Canonical URL form as ONE codegen'd expression — the compiled twin
  * of `UrlFunctions.canonicalizeUrl`. The Column tier's unreserved-
  * escape decoder is an `aggregate` higher-order function — a
  * CodegenFallback that runs INTERPRETED per row, twice (path + query),
  * inside the funnel's one-text-scan stage. This expression runs the
  * identical 10-clause contract as compiled Scala over precompiled
  * patterns (see [[UrlKernel.canonicalizeUrlOf]]); UrlKernelSpec pins
  * byte-equivalence against the Column tier, and the url01/url02/wp01–
  * wp04 DuckDB oracles value-check it end to end. */
case class CanonicalizeUrlExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.strings(prettyName, child.dataType)
  override def dataType: DataType = StringType
  // null for anything without a scheme://host shape
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "canonicalize_url"

  override def nullSafeEval(a: Any): Any =
    UrlKernel.canonicalizeUrlOf(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.UrlKernel.canonicalizeUrlOf($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class UrlDomainExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.strings(prettyName, child.dataType)
  override def dataType: DataType = StringType
  // null for unparseable input (no scheme://host shape), not only for
  // null input — nullable regardless of the child
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_domain"

  override def nullSafeEval(a: Any): Any =
    UrlKernel.urlDomainOf(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.UrlKernel.urlDomainOf($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The compiled URL-host/registered-domain kernel behind
  * [[UrlDomainExpr]] — static, callable from generated code. Every
  * pattern string below is byte-identical to its Column-tier source in
  * [[UrlFunctions]]; keep them in lockstep (UrlKernelSpec enforces the
  * behavioral half of that contract). */
object UrlKernel {
  // UrlFunctions.schemeOf / afterScheme
  private val Scheme = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://")
  private val SchemePrefix = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://")
  private val Fragment = Pattern.compile("#.*$")
  // UrlFunctions.hostPortOf / urlHost
  private val Authority = Pattern.compile("^([^/?]*)")
  private val Userinfo = Pattern.compile("^.*@")
  private val Port = Pattern.compile(":[0-9]*$")
  private val TrailingDots = Pattern.compile("\\.+$")
  // UrlFunctions.registeredDomain
  private val Ipv4 = Pattern.compile("^([0-9]{1,3}\\.){3}[0-9]{1,3}$")
  private val SnapSuffix = Pattern.compile(UrlFunctions.snapshotSuffixRe)
  private val SnapDomain = Pattern.compile(UrlFunctions.snapshotDomainRe)
  private val Ps2 = Pattern.compile("\\.(co|com|org|net|ac|gov|edu)\\.[a-z][a-z]$")
  private val Last3 = Pattern.compile("([^.]+\\.[^.]+\\.[^.]+)$")
  private val Last2 = Pattern.compile("([^.]+\\.[^.]+)$")

  /** regexp_extract semantics: first find, group 1, "" when no match. */
  private def extract(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** regexp_replace-with-"" semantics (replace ALL matches). */
  private def strip(p: Pattern, s: String): String =
    p.matcher(s).replaceAll("")

  /** `lower()`'s exact fold (UTF8String's, not the locale-sensitive
    * `String#toLowerCase`). */
  private def fold(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** UrlFunctions.urlHost, compiled: lowercased host with no scheme,
    * userinfo, port, or trailing dots; "" when there is no
    * `scheme://` prefix. */
  def urlHostOf(url: String): String = {
    if (!Scheme.matcher(url).find()) return ""
    val after = strip(Fragment, strip(SchemePrefix, url))
    val hostPort = fold(strip(Userinfo, extract(Authority, after)))
    strip(TrailingDots, strip(Port, hostPort))
  }

  /** UrlFunctions.registeredDomain, compiled (same branch order:
    * IPv4 literal, snapshot suffix, `<ps2>.<cc>`, last-two-labels,
    * dot-less host as-is). */
  def registeredDomainOf(host: String): String = {
    val h = strip(TrailingDots, host)
    if (Ipv4.matcher(h).find()) h
    else if (SnapSuffix.matcher(h).find()) extract(SnapDomain, h)
    else if (Ps2.matcher(h).find()) extract(Last3, h)
    else if (h.contains(".")) extract(Last2, h)
    else h
  }

  /** UrlFunctions.urlDomain, compiled: null for anything without a
    * `scheme://host` shape. */
  def urlDomainOf(url: UTF8String): UTF8String = {
    if (url == null) return null
    val host = urlHostOf(url.toString)
    if (host.isEmpty) null else UTF8String.fromString(registeredDomainOf(host))
  }

  // UrlFunctions.canonicalizeUrl's remaining pattern set
  private val PortNum = Pattern.compile(":([0-9]+)$")
  private val AuthorityPrefix = Pattern.compile("^[^/?]*")
  private val PathPart = Pattern.compile("^([^?]*)")
  private val QueryPart = Pattern.compile("\\?(.*)$")
  private val TrailSlashes = Pattern.compile("/+$")
  private val Tracking = Pattern.compile(UrlFunctions.trackingParamRe)

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
  /** RFC 3986 §2.3 unreserved: the exact char class
    * `[A-Za-z0-9._~-]` the Column tier checks. */
  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '~' || c == '-'

  /** UrlFunctions.decodeUnreservedEscapes, compiled: the same
    * split-on-'%' single pass (no replace-fold cascade — `/p%2%45`
    * decodes to `/p%2E`, a dangling `%` survives as literal text). */
  private def decodeUnreserved(s: String): String = {
    val parts = s.split("%", -1)
    if (parts.length <= 1) return s
    val sb = new java.lang.StringBuilder(parts(0))
    var i = 1
    while (i < parts.length) {
      val p = parts(i)
      var decoded = false
      if (p.length >= 2) {
        val h1 = p.charAt(0)
        val h2 = p.charAt(1)
        if (isHex(h1) && isHex(h2)) {
          val ch = ((hexVal(h1) << 4) | hexVal(h2)).toChar
          if (isUnreserved(ch)) {
            sb.append(ch).append(p, 2, p.length)
            decoded = true
          }
        }
      }
      if (!decoded) sb.append('%').append(p)
      i += 1
    }
    sb.toString
  }

  /** try_cast-to-int semantics over the port capture: null for "" and
    * for anything past Int range (the Column tier's malformed-port
    * drop). The capture is digits-only by pattern; leading zeros are
    * NOT overflow — try_cast accepts ':00000008443' as 8443, so the
    * length check runs on the zero-stripped digits (review finding:
    * a raw length cap diverged from the Column tier there). */
  private def portToInt(portStr: String): Integer =
    if (portStr.isEmpty) null
    else {
      val t = portStr.dropWhile(_ == '0')
      if (t.isEmpty) Integer.valueOf(0)
      else if (t.length > 10) null
      else {
        val l = t.toLong
        if (l > Int.MaxValue) null else Integer.valueOf(l.toInt)
      }
    }

  /** UrlFunctions.canonicalizeUrl, compiled — the identical 10-clause
    * contract (scheme/host case fold, userinfo strip, fragment drop,
    * numeric default-port elision, tracking-param filter in original
    * order, trailing-slash fold, unreserved-escape decode, punycode
    * pass-through); null for anything without a `scheme://host`
    * shape. */
  def canonicalizeUrlOf(url: UTF8String): UTF8String = {
    if (url == null) return null
    val s = url.toString
    val scheme = fold(extract(Scheme, s))
    if (scheme.isEmpty) return null
    // one parse chain: after/hostPort/host computed once and reused
    // below (the Column tier re-embeds these subtrees per reference;
    // being the compiled tier means NOT paying that twice per row)
    val after = strip(Fragment, strip(SchemePrefix, s))
    val hostPort = fold(strip(Userinfo, extract(Authority, after)))
    val host = strip(TrailingDots, strip(Port, hostPort))
    if (host.isEmpty) return null
    val portN = portToInt(extract(PortNum, hostPort))
    val keepPort = portN != null &&
      !(scheme == "http" && portN.intValue == 80) &&
      !(scheme == "https" && portN.intValue == 443)
    val pathQuery = strip(AuthorityPrefix, after)
    val rawPath = decodeUnreserved(extract(PathPart, pathQuery))
    val strippedPath = strip(TrailSlashes, rawPath)
    val path = if (strippedPath.isEmpty) "/" else strippedPath
    val rawQuery = decodeUnreserved(extract(QueryPart, pathQuery))
    val query = rawQuery.split("&", -1).iterator
      .filter(p => p.nonEmpty && !Tracking.matcher(fold(p)).find())
      .mkString("&")
    val sb = new java.lang.StringBuilder(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(portN.intValue)
    sb.append(path)
    if (query.nonEmpty) sb.append('?').append(query)
    UTF8String.fromString(sb.toString)
  }
}
