package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt policy gate (RFC 9309) — the acquire-side stage between
  * the URL filter battery and the fetch itself: C4/CCNet-class crawls
  * honor robots exclusions, so a corpus front door needs the same gate
  * at compaction time (drop pages a well-behaved crawler should never
  * have fetched).
  *
  * Split into a PARSE side (per-domain robots text → the applicable
  * rule frame for one agent) and an EVAL side (urls × rules → allowed),
  * so one parsed frame gates any number of URL tables.
  *
  * Documented contract (RFC 9309 semantics, with the simplifications a
  * relational tier should own — each clause replayable in DuckDB, all
  * regexes Java∩RE2):
  *   1. lines split on LF; a trailing CR is stripped (CRLF input);
  *      `#` comments strip to end of line; blank lines are ignored
  *      (they do NOT terminate a group — RFC 9309 §2.2);
  *   2. a directive is `key : value` with optional blanks around the
  *      colon; keys match case-insensitively; only `user-agent`,
  *      `allow`, `disallow` participate (crawl-delay/sitemap are not
  *      access control);
  *   3. CONSECUTIVE user-agent lines head one shared group (§2.2.1);
  *      rules before any user-agent line belong to no group and are
  *      ignored;
  *   4. group selection for an agent token: every group naming the
  *      token (case-insensitive EXACT match — the product-token
  *      prefix-matching of §2.2.1 is a documented simplification) if
  *      any exists, else every `*` group; no group → everything
  *      allowed;
  *   5. rule matching is against the URL PATH (+ `?query` if the
  *      caller includes it), expecting the CANONICAL form — the
  *      percent-encoding equivalence of §2.2.2 is the
  *      canonicalization stage's job, not re-done here;
  *   6. patterns support the §2.2.3 special characters: `*` matches
  *      any span, a TRAILING `$` anchors the end; everything else is
  *      literal (the pattern compiles to `^` + escaped body, so a
  *      match is always a prefix match);
  *   7. precedence: among matching rules the LONGEST pattern (octet
  *      length, §2.2.2) wins; on a tie `allow` wins (least
  *      restrictive); no matching rule → allowed. An EMPTY pattern
  *      (`Disallow:` — the classic allow-all idiom) matches nothing
  *      under longest-match and is dropped at parse.
  *
  * Scale: robots documents are small by protocol (RFC caps parseable
  * size at 500 KiB) and the rule frame is rules-per-domain bounded, so
  * the eval join broadcasts it; the per-URL work is one regexp battery
  * against the handful of domain rules plus an id-domain max — the URL
  * table's text never moves (the winner is reduced before any
  * exchange). */
object Robots {

  /** Compile one robots path pattern (already split from its trailing
    * `$` anchor) to the Java∩RE2 regex of contract clause 6: escaped
    * literals, `*` → `.*`, `^`-anchored prefix match. */
  private def patternRegex(pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val body = when(anchored,
      substring(pattern, lit(1), length(pattern) - 1))
      .otherwise(pattern)
    // backslash FIRST (escaping the escapes), '*' deliberately absent
    // (it becomes '.*' after everything else is escaped)
    val escaped = Seq("\\", ".", "+", "?", "(", ")", "[", "]", "{", "}",
      "|", "^", "$").foldLeft(body) { (c, ch) =>
      call_function("replace", c, lit(ch), lit("\\" + ch))
    }
    val wild = call_function("replace", escaped, lit("*"), lit(".*"))
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Parse per-domain robots text into the rule frame APPLICABLE to
    * `agent`: (domain, pattern, is_allow, plen, rx). Input: one row per
    * domain with the raw robots document (null/empty → no rules →
    * everything allowed downstream). One narrow shuffle on the domain
    * key for the line windows; output is rules-per-domain bounded. */
  def parseRobots(
      robots: DataFrame,
      domainCol: String,
      robotsCol: String,
      agent: String): DataFrame = {
    val grouped = groupedAccessRows(kvRows(robots, domainCol, robotsCol))
    val selected = selectedGroups(grouped, agent)
    grouped
      .filter(col("key").isin("allow", "disallow") &&
        col("gid") > 0L && col("value") =!= "")
      .join(selected, Seq("domain", "gid"))
      .select(col("domain"),
        col("value").as("pattern"),
        (col("key") === "allow").as("is_allow"),
        // OCTET length, as clause 7 / RFC 9309 §2.2.2 pin — char length
        // disagrees on multi-byte patterns and picks a different winner
        // than a conforming crawler (oracle twin: DuckDB strlen)
        octet_length(col("value")).cast("long").as("plen"),
        patternRegex(col("value")).as("rx"))
  }

  /** Every parsed `key : value` record with its line position —
    * CR/comment/blank handling per contract clause 1, keys lowered,
    * values right-trimmed. NOT key-filtered: [[parseRobots]] keeps the
    * access-control keys, [[robotsMeta]] also reads crawl-delay and
    * sitemap records. */
  private def kvRows(
      robots: DataFrame, domainCol: String, robotsCol: String): DataFrame =
    robots
      .select(col(domainCol).as("domain"),
        posexplode(split(coalesce(col(robotsCol), lit("")), "\n"))
          .as(Seq("pos", "raw")))
      // CR strip (CRLF docs), comment strip, blank trim (explicit
      // space/tab class — trim() is spaces-only and \s is
      // engine-divergent)
      .select(col("domain"), col("pos"),
        regexp_replace(
          regexp_replace(regexp_replace(col("raw"), "\r$", ""),
            "#.*$", ""),
          "^[ \t]+|[ \t]+$", "").as("line"))
      .filter(col("line") =!= "")
      .select(col("domain"), col("pos"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)[ \t]*:", 1))
          .as("key"),
        regexp_replace(
          regexp_extract(col("line"), "^[A-Za-z-]+[ \t]*:[ \t]*(.*)$", 1),
          "[ \t]+$", "").as("value"))

  /** Per-domain politeness/discovery METADATA — the records the access
    * gate deliberately ignores, surfaced for the fetch scheduler:
    *
    *   - `crawl_delay_ms`: the LARGEST parseable Crawl-delay among the
    *     groups SELECTED for `agent` (same clause-4 selection as
    *     [[parseRobots]]) — politeness errs slow, so when several
    *     selected groups disagree the conservative delay wins.
    *     Fractional seconds floor to milliseconds; unparseable,
    *     NaN/Infinity, negative, or absurd (> 86400 s) values are
    *     ignored as garbage; no selected group or no valid delay →
    *     null. For DELAY attribution, Crawl-delay is a group MEMBER
    *     record — it ends a user-agent run the way allow/disallow do —
    *     matching the parsers that actually honor it ("User-agent: a,
    *     Crawl-delay: 2, User-agent: *, Crawl-delay: 9" is two groups,
    *     and agent `a` waits 2 s, not 9). This deliberately differs
    *     from the ACCESS parser's grouping, where crawl-delay is an
    *     unknown record and invisible to adjacency per RFC 9309 —
    *     each side implements its own spec.
    *   - `sitemaps`: all Sitemap record values, sorted distinct —
    *     GROUP-INDEPENDENT by the sitemaps.org protocol (valid anywhere
    *     in the file), so they surface even when no group applies.
    *
    * One row per input domain (null/empty robots → null delay, empty
    * sitemap list). Same bounded-frame scale shape as [[parseRobots]].
    * Output: (domain, crawl_delay_ms, n_sitemaps, sitemaps). */
  def robotsMeta(
      robots: DataFrame,
      domainCol: String,
      robotsCol: String,
      agent: String): DataFrame = {
    val kv = kvRows(robots, domainCol, robotsCol)
    // delay-side grouping: crawl-delay participates like a rule record
    val grouped4 = groupedRows(kv.filter(
      col("key").isin("user-agent", "allow", "disallow", "crawl-delay")))
    val selected = selectedGroups(grouped4, agent)
    val delays = grouped4
      .filter(col("key") === "crawl-delay" && col("gid") > 0L)
      .join(selected, Seq("domain", "gid"))
      .withColumn("__d", expr("try_cast(value AS double)"))
      // range-guard BEFORE floor: floor(NaN) silently converts to 0L
      // (a zero delay from garbage input — the exact opposite of
      // politeness) and Infinity/1e300 to Long.MaxValue; the 86400 s
      // ceiling drops absurd values as garbage too
      .filter(col("__d").isNotNull && !isnan(col("__d")) &&
        col("__d") >= 0.0 && col("__d") <= 86400.0)
      .withColumn("__ms", floor(col("__d") * 1000.0).cast("long"))
      .groupBy(col("domain")).agg(max(col("__ms")).as("crawl_delay_ms"))
    val sitemaps = kv
      .filter(col("key") === "sitemap" && col("value") =!= "")
      .groupBy(col("domain"))
      .agg(sort_array(collect_set(col("value"))).as("sitemaps"))
    robots.select(col(domainCol).as("domain")).distinct()
      .join(delays, Seq("domain"), "left_outer")
      .join(sitemaps, Seq("domain"), "left_outer")
      .select(col("domain"), col("crawl_delay_ms"),
        coalesce(size(col("sitemaps")), lit(0)).cast("long")
          .as("n_sitemaps"),
        coalesce(col("sitemaps"), array().cast("array<string>"))
          .as("sitemaps"))
  }

  /** The access-control rows (user-agent/allow/disallow ONLY — other
    * records are ignored for GROUPING, so two user-agent lines with a
    * crawl-delay between them still share a group) with their group id:
    * a user-agent line not immediately preceded by another user-agent
    * line starts a new group (contract clause 3). */
  private def groupedAccessRows(kv: DataFrame): DataFrame =
    groupedRows(kv.filter(col("key").isin("user-agent", "allow", "disallow")))

  /** The UA-run grouping window over an already-key-filtered frame —
    * which keys participate decides adjacency, so each caller names its
    * own record set ([[groupedAccessRows]] the RFC 9309 access records,
    * [[robotsMeta]] those plus crawl-delay). */
  private def groupedRows(kvFiltered: DataFrame): DataFrame = {
    val w = Window.partitionBy("domain").orderBy("pos")
    kvFiltered
      .withColumn("prev_key", lag(col("key"), 1).over(w))
      .withColumn("gstart",
        (col("key") === "user-agent" &&
          (col("prev_key").isNull || col("prev_key") =!= "user-agent"))
          .cast("long"))
      .withColumn("gid", sum(col("gstart")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Contract clause 4 group selection for one agent token: every group
    * naming the token exactly (case-insensitive) if any exists in the
    * domain, else every `*` group. Output: (domain, gid). */
  private def selectedGroups(grouped: DataFrame, agent: String): DataFrame = {
    val groups = grouped
      .filter(col("key") === "user-agent")
      .groupBy(col("domain"), col("gid"))
      .agg(
        max((lower(col("value")) === agent.toLowerCase).cast("int"))
          .as("has_agent"),
        max((col("value") === "*").cast("int")).as("has_star"))
    val domAny = groups.groupBy(col("domain"))
      .agg(max(col("has_agent")).as("dom_has_agent"))
    groups.join(domAny, Seq("domain"))
      .filter(when(col("dom_has_agent") === 1, col("has_agent") === 1)
        .otherwise(col("has_star") === 1))
      .select(col("domain"), col("gid"))
  }

  /** Gate a URL table against a [[parseRobots]] frame: one row per
    * input id with `allowed` (contract clause 7 precedence; no rules /
    * no robots → true), the winning rule's length, and the matched-rule
    * count. The rule frame broadcasts; only (id, domain, narrow winner
    * struct) ever reaches the reduce exchange. */
  def robotsGate(
      urls: DataFrame,
      idCol: String,
      domainCol: String,
      pathCol: String,
      rules: DataFrame): DataFrame = {
    val r = rules.select(
      col("domain").as("__rdom"), col("is_allow").as("__rallow"),
      col("plen").as("__rplen"), col("rx").as("__rrx"))
    urls
      .select(col(idCol), col(domainCol).as("__dom"), col(pathCol).as("__path"))
      .join(broadcast(r), col("__dom") === col("__rdom"), "left_outer")
      .withColumn("__m",
        col("__rrx").isNotNull && regexp_like(col("__path"), col("__rrx")))
      .groupBy(col(idCol))
      .agg(
        max(when(col("__m"),
          struct(col("__rplen").as("plen"),
            col("__rallow").cast("int").as("allow")))).as("__w"),
        sum(when(col("__m"), 1L).otherwise(0L)).as("n_matched"))
      .select(col(idCol),
        coalesce(col("__w.allow") === 1, lit(true)).as("allowed"),
        col("__w.plen").as("winner_len"),
        col("n_matched"))
  }
}
