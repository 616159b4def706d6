package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain primitives for corpus front doors — the acquire-side stage
  * every production pipeline runs before any text ever reaches cleaning:
  * C4 deduplicates at URL level (Raffel et al. 2020 §2.2), and Gopher /
  * RefinedWeb cap and mix per registered domain (Rae et al. 2021;
  * Penedo et al. 2023).
  *
  * Everything here is composed built-in Column work (regexp chains + one
  * array filter) — codegen'd, scan-local, zero shuffle — and every regex
  * is restricted to syntax that means the same thing in Java regex and
  * RE2 (no lookaround, no backreferences, no ordered-alternation
  * dependence), so a DuckDB oracle can replay the identical surgery.
  *
  * Canonicalization contract (each choice documented because URL
  * canonicalization IS a policy, not a fact — RFC 3986 §6 defines the
  * normalizations; which to apply is the pipeline's call):
  *   1. scheme is required (`scheme://`); anything else canonicalizes to
  *      NULL — the front door rejects it rather than guessing;
  *   2. scheme and host lowercase (RFC 3986 §6.2.2.1); path/query keep
  *      their case (paths are case-sensitive on most origins);
  *   3. userinfo (`user:pw@`) is stripped — it never identifies content;
  *   4. default ports drop (http:80, https:443 — RFC 3986 §6.2.3);
  *      any other explicit port is kept;
  *   5. the fragment drops entirely (never sent to the server);
  *   6. tracking query parameters drop by KEY (utm_*, fbclid, gclid,
  *      msclkid, mc_eid, igshid, ref, ref_src — the C4/CCNet-era core
  *      set), matched case-insensitively, with or without a value;
  *      surviving parameters keep their original ORDER (sorting would
  *      merge order-sensitive endpoints) and an emptied query drops its
  *      `?`;
  *   7. trailing slashes strip from the path; an empty path becomes `/`
  *      (so `http://a.com`, `http://a.com/` and `http://a.com//` all
  *      canonicalize identically);
  *   8. `www.` is NOT stripped from the host — `www.x.com` and `x.com`
  *      can serve different content; [[registeredDomain]] is the level
  *      that groups them;
  *   9. percent-escapes of UNRESERVED characters decode in the path and
  *      query (RFC 3986 §6.2.2.2: `%7Euser` ≡ `~user`; a disguised
  *      `utm%5Fsource` is then caught by the tracking filter); escapes
  *      of reserved octets stay exactly as written — decoding them
  *      could change URL structure;
  *  10. IDN hosts: punycode (`xn--...`) passes through AS-IS — it is
  *      already the canonical DNS wire form (RFC 5890 A-label) — with
  *      only the usual case fold (`XN--BCHER-KVA.com` ≡
  *      `xn--bcher-kva.com`). The Unicode form (U-label) of the same
  *      host is a DISTINCT canonical by policy: mapping U-labels to
  *      A-labels is the full IDNA2008+UTS46 algorithm (bidi rules,
  *      joiner rules, a Unicode-version-pinned mapping table), which no
  *      regex tier should pretend to implement — and crawl frontiers
  *      emit A-labels anyway. Pipelines that also see U-label URLs
  *      punycode them upstream at fetch time.
  */
object UrlFunctions {

  /** Parsed-out pieces, each `""` when absent (regexp_extract's no-match
    * value in BOTH engines — null never enters the chain until the final
    * validity gate). */
  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** authority+path+query with scheme and fragment removed. */
  private def afterScheme(url: Column): Column =
    regexp_replace(
      regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
      "#.*$", "")

  /** lowercase host:port with userinfo stripped (split on the LAST `@`
    * of the authority — RFC 3986 allows `@` only percent-encoded after
    * the authority, but a greedy `^.*@` would eat into the path on
    * malformed input, so the strip runs on the authority alone). */
  private def hostPortOf(url: Column): Column =
    lower(regexp_replace(
      regexp_extract(afterScheme(url), "^([^/?]*)", 1), "^.*@", ""))

  /** Lowercased host of a URL: no scheme, userinfo, port, path, and no
    * trailing dots (the absolute-FQDN form `example.com.` names the
    * same host as `example.com` — common in crawl data, and without
    * the fold it would both split the dedup group and slip past the
    * per-domain cap via an empty registeredDomain). Empty string when
    * the URL has no `scheme://` prefix (gated explicitly — without it
    * a bare non-URL string would parse as its own "host"). */
  def urlHost(url: Column): Column =
    when(schemeOf(url) === "", lit(""))
      .otherwise(regexp_replace(
        regexp_replace(hostPortOf(url), ":[0-9]*$", ""),
        "\\.+$", ""))

  private def portOf(url: Column): Column =
    regexp_extract(hostPortOf(url), ":([0-9]+)$", 1)

  private def pathQueryOf(url: Column): Column =
    regexp_replace(afterScheme(url), "^[^/?]*", "")

  /** Tracking-parameter keys dropped by [[canonicalizeUrl]]: one
    * RE2/Java-identical pattern over the lowercased `key[=value]` pair. */
  private[graft] val trackingParamRe =
    "^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$"

  /** Decode percent-escapes of the RFC 3986 §2.3 UNRESERVED characters
    * (`[A-Za-z0-9._~-]`) in ONE left-to-right pass — `%7Euser` ≡
    * `~user` (§6.2.2.2). Escapes of RESERVED octets (`%2F`, `%26`,
    * `%3D`, `%25`, …) are structural and stay exactly as written; their
    * hex case is also not normalized (a documented subset of §6.2.2.1).
    *
    * Single-pass by construction: split on `%`, then each fragment
    * either decodes its leading two hex digits (when they name an
    * unreserved octet) or keeps its literal `%` back. A replace-fold
    * over the escape table would CASCADE — in `/p%2%45` the `%45`→`E`
    * replacement manufactures a brand-new `%2E` that a later fold step
    * decodes to `.`, silently colliding distinct raw URLs; the split
    * formulation decodes `/p%2%45` to the correct `/p%2E`. A dangling
    * `%` (no valid escape behind it) survives as the literal text it
    * is. The identical formula replays in DuckDB (split +
    * list_transform + hex cast), so the oracle shares the semantics
    * by construction. */
  private[graft] def decodeUnreservedEscapes(s: Column): Column = {
    // '%' is not a regex metacharacter: this is a literal split. The
    // default limit (-1) keeps trailing empty fragments, so "a%" round-
    // trips ("" decodes to the literal "%").
    val parts = split(s, "%")
    val decodedTail = aggregate(
      slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
      lit(""),
      (acc, p) => {
        val hex2 = substring(p, 1, 2)
        val code = conv(hex2, 16, 10).try_cast("int")
        val ch = call_function("char", code)
        val isEscape = hex2.rlike("^[0-9A-Fa-f]{2}$") &&
          ch.rlike("^[A-Za-z0-9._~-]$")
        concat(acc,
          when(isEscape, concat(ch, p.substr(lit(3), length(p))))
            .otherwise(concat(lit("%"), p)))
      })
    when(size(parts) <= 1, s)
      .otherwise(concat(element_at(parts, 1), decodedTail))
  }

  /** Canonical form of a URL under the contract in the object scaladoc;
    * NULL for anything without a `scheme://host` shape.
    *
    * Compiled as the codegen'd [[CanonicalizeUrlExpr]] (registered
    * `canonicalize_url`): the Column tier's escape decoder is an
    * `aggregate` higher-order function — a CodegenFallback evaluated
    * INTERPRETED per row, twice, inside the funnel's one-text-scan
    * stage. The kernel runs the identical contract over precompiled
    * patterns in one method ([[UrlKernel.canonicalizeUrlOf]]);
    * UrlKernelSpec pins the equivalence against
    * [[canonicalizeUrlColumnTier]], the documented semantics. */
  def canonicalizeUrl(url: Column): Column =
    call_function("canonicalize_url", url)

  /** The original Column-tier composition of [[canonicalizeUrl]] —
    * kept ONLY as the equivalence baseline for UrlKernelSpec (it is
    * the documented semantics and the DuckDB oracles' replay source;
    * [[UrlKernel]] must match it forever). */
  private[graft] def canonicalizeUrlColumnTier(url: Column): Column = {
    val scheme = schemeOf(url)
    val host = urlHost(url)
    // port compares and emits NUMERICALLY: ":080" is the default http
    // port (string equality would keep it and split the dedup group)
    // and a kept ":08080" emits as ":8080". try_cast: an absent port is
    // "" and a port that doesn't fit an int is malformed — both null
    // out and drop, instead of throwing under ANSI mode.
    val portN = portOf(url).try_cast("int")
    val keepPort = portN.isNotNull &&
      !(scheme === "http" && portN === 80) &&
      !(scheme === "https" && portN === 443)
    // unreserved escapes decode BEFORE any other path/query work, so a
    // disguised tracking key (utm%5Fsource) is filtered and a decoded
    // char can never be '/'/'&'/'=' (those are reserved — not decoded)
    val rawPath = decodeUnreservedEscapes(
      regexp_extract(pathQueryOf(url), "^([^?]*)", 1))
    val path = {
      val stripped = regexp_replace(rawPath, "/+$", "")
      when(stripped === "", lit("/")).otherwise(stripped)
    }
    val rawQuery = decodeUnreservedEscapes(
      regexp_extract(pathQueryOf(url), "\\?(.*)$", 1))
    val query = array_join(
      filter(split(rawQuery, "&"),
        p => p =!= "" && !lower(p).rlike(trackingParamRe)),
      "&")
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), portN.cast("string")))
          .otherwise(lit("")),
        path,
        when(query =!= "", concat(lit("?"), query)).otherwise(lit(""))))
  }

  /** Pinned snapshot of high-traffic multi-label PUBLIC SUFFIXES that
    * the `<ps2>.<cc>` heuristic branch of [[registeredDomain]] cannot
    * see. This is a documented SNAPSHOT, deliberately NOT the live
    * Mozilla public-suffix list (a 10k-line moving target): it covers
    * the tiers a real crawl hits in the first million pages —
    * multi-tenant platform suffixes (every github.io tenant is an
    * independent publisher; giving all of github.io ONE `domainCap`
    * budget is exactly the silent-merge failure the cap exists to
    * prevent), the CentralNic `uk.com`-style pseudo-ccTLDs (3-letter
    * TLD, so the 2-letter-cc branch never fires), and the ccTLD
    * second-level registries outside {co com org net ac gov edu}
    * (`ne.jp`, `govt.nz`, `go.kr`, ...). A deployment tracking the full
    * PSL swaps this list; the matching logic doesn't change.
    *
    * Invariant (spec-pinned): no entry is a dot-suffix of another
    * entry, so exactly one alternative can match any host and neither
    * engine's alternation-preference semantics can change an answer. */
  private[graft] val publicSuffixSnapshot: Seq[String] = Seq(
    // multi-tenant platform suffixes (PSL private section tier)
    "github.io", "gitlab.io", "bitbucket.io", "readthedocs.io",
    "blogspot.com", "blogspot.de", "blogspot.fr", "blogspot.it",
    "blogspot.in", "blogspot.jp", "blogspot.ca", "blogspot.mx",
    "blogspot.co.uk", "blogspot.com.au", "blogspot.com.br",
    "blogspot.co.nz", "blogspot.co.za",
    "wordpress.com", "appspot.com", "herokuapp.com",
    "azurewebsites.net", "cloudfront.net", "firebaseapp.com",
    "web.app", "netlify.app", "vercel.app", "pages.dev", "workers.dev",
    "fly.dev", "onrender.com", "surge.sh", "neocities.org",
    "glitch.me", "repl.co", "cloudfunctions.net",
    "elasticbeanstalk.com", "s3.amazonaws.com",
    "duckdns.org", "dyndns.org", "eu.org",
    // CentralNic pseudo-ccTLDs: 3-letter TLD, invisible to the
    // 2-letter-cc branch
    "uk.com", "us.com", "eu.com", "de.com", "jpn.com", "br.com",
    "cn.com", "ru.com", "sa.com", "za.com", "gr.com", "co.com",
    "gb.net", "uk.net", "se.net",
    // ccTLD second-level registries outside the ps2 set
    "ne.jp", "or.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp", "lg.jp",
    "me.uk", "ltd.uk", "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    "id.au", "asn.au",
    "govt.nz", "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    "school.nz", "cri.nz", "health.nz", "mil.nz",
    "go.kr", "or.kr", "ne.kr", "pe.kr", "re.kr",
    "firm.in", "gen.in", "ind.in", "nic.in", "res.in",
    "gen.tr", "web.tr", "bel.tr", "k12.tr", "av.tr",
    "art.br", "adv.br", "ind.br", "inf.br", "srv.br", "eng.br",
    "bj.cn", "sh.cn", "gd.cn",
    "in.ua", "kiev.ua", "kyiv.ua",
    "msk.ru", "spb.ru",
    "go.id", "or.id", "web.id", "my.id", "sch.id",
    "in.th", "go.th", "or.th",
    "muni.il", "k12.il")

  /** `\.(?:a\.b|c\.d)$` — does the host end in a snapshot suffix with a
    * tenant label before it? (A host EQUAL to a suffix has no tenant
    * and deliberately falls through to the generic branches.) */
  private[graft] val snapshotSuffixRe: String =
    "\\.(?:" +
      publicSuffixSnapshot.map(_.replace(".", "\\.")).mkString("|") +
      ")$"

  /** `([^.]+\.(?:a\.b|c\.d))$` — the tenant label plus its snapshot
    * suffix. Entry label-counts may differ (github.io vs
    * blogspot.co.uk); the capture keeps suffix+1 labels either way. */
  private[graft] val snapshotDomainRe: String =
    "([^.]+\\.(?:" +
      publicSuffixSnapshot.map(_.replace(".", "\\.")).mkString("|") +
      "))$"

  /** Registered domain (eTLD+1) of a HOST string, by a documented
    * heuristic rather than the full public-suffix list (which is a
    * 10k-line moving target; the heuristic covers the dominant shapes
    * and is engine-replayable):
    *   - a dotted-quad IPv4 literal is its own "domain";
    *   - a dot-less host (localhost, intranet names) is its own domain;
    *   - a host ending in a [[publicSuffixSnapshot]] entry keeps the
    *     suffix plus ONE tenant label (x.github.io → x.github.io;
    *     a.b.blogspot.co.uk → b.blogspot.co.uk) — checked BEFORE the
    *     generic branches, which would otherwise merge every tenant of
    *     a platform suffix into one pseudo-domain;
    *   - `x.<ps2>.<cc>` where ps2 ∈ {co, com, org, net, ac, gov, edu}
    *     and cc is a two-letter TLD keeps THREE labels (bbc.co.uk);
    *   - anything else keeps the last TWO labels (sub.example.com →
    *     example.com).
    * The ps2 multi-label branch is an explicit `when`, not a regex
    * alternation, and the snapshot alternation is suffix-disjoint by
    * invariant, so no engine's alternation-preference semantics can
    * change the answer. Trailing dots strip first (defensively — the
    * [[urlHost]] path already folds them): without the strip an
    * absolute-FQDN host ends in '.', no suffix regex can match, and
    * every such host would lump into one empty-string pseudo-domain. */
  def registeredDomain(host: Column): Column = {
    val h = regexp_replace(host, "\\.+$", "")
    when(h.rlike("^([0-9]{1,3}\\.){3}[0-9]{1,3}$"), h)
      .when(h.rlike(snapshotSuffixRe),
        regexp_extract(h, snapshotDomainRe, 1))
      .when(h.rlike("\\.(co|com|org|net|ac|gov|edu)\\.[a-z][a-z]$"),
        regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .when(h.contains("."), regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .otherwise(h)
  }

  /** RefinedWeb/C4-style URL filter signals (Penedo et al. 2023 §3.1
    * filter URLs before fetch; C4 drops non-prose resources) — the
    * content policies that run ON the URL, downstream of
    * [[canonicalizeUrl]]'s syntax normalization. Integer counters +
    * rule booleans in the gopherRules style (exact comparisons, no
    * floats), all scan-local:
    *   - `r_extension`: the canonical PATH does not end in a non-prose
    *     resource extension (image/style/script/archive/binary — the
    *     published static-asset list every crawler skips);
    *   - `r_length`: canonical URL ≤ 200 chars (egregiously long URLs
    *     are tracking/session artifacts);
    *   - `r_path_depth`: ≤ 8 path segments;
    *   - `r_params`: ≤ 4 surviving query parameters (tracking keys are
    *     already gone — what remains at 5+ is a stateful app view, not
    *     a document);
    *   - `r_digits`: digits are ≤ half of the path's characters
    *     (calendar/session/hash paths);
    *   - `r_blocklist`: no blocklisted token anywhere in the lowercase
    *     canonical URL (the standard adult/gambling seed list — a real
    *     deployment swaps in its curated list);
    *   - `keep` = every rule passes. NULL canonical (unparseable) rows
    *     report every rule false and keep = false — the front door
    *     rejects what it cannot read.
    *
    * Output columns: (url_canon, n_path_segments, n_params,
    * n_path_digits, n_path_chars, r_extension, r_length, r_path_depth,
    * r_params, r_digits, r_blocklist, keep) appended by the caller via
    * select — this returns the struct-free column list.
    *
    * Staging: feed an ATTRIBUTE via [[urlFilterSignalsFromCanon]] on
    * hot paths — this convenience overload inlines `canonicalizeUrl`
    * (a deep regexp+decode tree) into EVERY rule that references the
    * canonical form, and the duplicated trees measured ~3× the staged
    * plan on the bench lane (the `wordGramsFromTokens` staging
    * discipline). */
  def urlFilterSignals(url: Column): Seq[(String, Column)] =
    urlFilterSignalsFromCanon(canonicalizeUrl(url))

  /** [[urlFilterSignals]] over an already-computed CANONICAL column —
    * pass an aliased attribute from a previous select so the
    * canonicalization tree evaluates once per row. */
  def urlFilterSignalsFromCanon(canon: Column): Seq[(String, Column)] = {
    // path/query of the CANONICAL form (tracking params already gone)
    val afterHost = regexp_replace(canon, "^[a-z0-9+.-]+://[^/?]*", "")
    val path = regexp_extract(afterHost, "^([^?]*)", 1)
    val query = regexp_extract(afterHost, "\\?(.*)$", 1)
    val nSegments = when(path === "/" || path === "", lit(0L))
      .otherwise((length(path) -
        length(regexp_replace(path, "/", ""))).cast("long"))
    val nParams = when(query === "", lit(0L))
      .otherwise((length(query) -
        length(regexp_replace(query, "&", ""))).cast("long") + 1L)
    val nPathDigits =
      length(regexp_replace(path, "[^0-9]", "")).cast("long")
    val nPathChars = length(path).cast("long")
    val extRe = "\\.(jpg|jpeg|png|gif|webp|svg|ico|css|js|woff2?" +
      "|zip|gz|tar|rar|exe|dmg|iso|mp3|mp4|avi|mov|pdf|xml|rss)$"
    val blockRe = "(porn|xxx|casino|viagra|escort)"
    // rules match the LOWERCASED path/URL: the canonical form preserves
    // path/query case (contract clause 2), so /logo.PNG and /Casino
    // must still trip their rules
    val rExtension = canon.isNotNull && !lower(path).rlike(extRe)
    val rLength = canon.isNotNull && length(canon) <= 200
    val rPathDepth = canon.isNotNull && nSegments <= 8L
    val rParams = canon.isNotNull && nParams <= 4L
    val rDigits = canon.isNotNull && nPathDigits * 2L <= nPathChars
    val rBlocklist = canon.isNotNull && !lower(canon).rlike(blockRe)
    Seq(
      "url_canon" -> canon,
      "n_path_segments" -> when(canon.isNull, lit(0L)).otherwise(nSegments),
      "n_params" -> when(canon.isNull, lit(0L)).otherwise(nParams),
      "n_path_digits" -> when(canon.isNull, lit(0L)).otherwise(nPathDigits),
      "n_path_chars" -> when(canon.isNull, lit(0L)).otherwise(nPathChars),
      "r_extension" -> rExtension,
      "r_length" -> rLength,
      "r_path_depth" -> rPathDepth,
      "r_params" -> rParams,
      "r_digits" -> rDigits,
      "r_blocklist" -> rBlocklist,
      "keep" -> (rExtension && rLength && rPathDepth && rParams &&
        rDigits && rBlocklist))
  }

  /** [[registeredDomain]] of a URL's host; NULL when the URL doesn't
    * parse (no `scheme://` or empty host → the front-door reject,
    * mirroring [[canonicalizeUrl]]'s validity gate — without the scheme
    * check a bare string would leak through as its own "host").
    *
    * Compiled as the codegen'd [[UrlDomainExpr]] (registered
    * `url_domain`), not the Column chain: composing
    * `registeredDomain(urlHost(url))` at the Column tier re-embeds the
    * whole host tree at each of registeredDomain's ~8 host references
    * (no let-binding in Column trees), which blew `domainCap`'s sort
    * stage past the JVM 64 KB codegen limit and dropped the per-URL hot
    * path to interpreted eval. The expression is one static call per
    * row over precompiled patterns; [[UrlKernel]] pins the exact
    * Column-tier semantics (UrlKernelSpec proves the equivalence). The
    * Column twin stays available as [[urlDomainColumnTier]] for that
    * spec. */
  def urlDomain(url: Column): Column = call_function("url_domain", url)

  /** The original Column-tier composition of [[urlDomain]] — kept ONLY
    * as the equivalence baseline for UrlKernelSpec (it is the
    * documented semantics; [[UrlKernel]] must match it forever). */
  private[graft] def urlDomainColumnTier(url: Column): Column = {
    val h = urlHost(url)
    when(schemeOf(url) === "" || h === "", lit(null).cast("string"))
      .otherwise(registeredDomain(h))
  }
}
