package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization, identity, filtering and link extraction
  * (SURVEY.md §2.2 F1–F6, §2.3 P1–P4, §2.1 S5).
  *
  * Behavioral rebuild of `/root/reference/src/newslookout/scraper_utils.py`
  * (retainValidArticles :78-105, removeInValidArticles :108-129,
  * is_valid_url :399-412, extractLinks :437-474, normalizeURL :477-490,
  * calculateCRC32 :531-550) and the unique-ID cascade
  * `/root/reference/src/newslookout/base_plugin.py:1063-1102`.
  *
  * All pure Catalyst column expressions — predicate-pushdown- and
  * codegen-friendly; no UDFs, no shuffles.
  */
object UrlFunctions {

  /** P1 normalizeURL: lowercase only (scraper_utils.py:477-490). */
  def normalizeUrl(url: Column): Column = lower(url)

  /** P2 getNetworkLocFromURL: network location (host[:port]) of a URL. */
  def host(url: Column): Column = try_parse_url(url, lit("HOST"))

  /** Path component (used by F4 same-url-without-query comparison). */
  def path(url: Column): Column = try_parse_url(url, lit("PATH"))

  /** P3 calculateCRC32 (scraper_utils.py:531-550): zlib.crc32 of the
    * UTF-8 bytes rendered like Python's `hex()` — lowercase, `0x` prefix,
    * NO zero padding. Spark's `crc32` is the same IEEE CRC-32 as zlib's.
    * `hex(bigint)` has no leading zeros, matching Python `hex()`.
    */
  def crc32Hex(s: Column): Column =
    concat(lit("0x"), lower(hex(crc32(encode(s, "UTF-8")))))

  /** F1 retainValidArticles: keep url iff it contains ANY whitelist
    * substring AND length > 9. Empty whitelist keeps everything
    * (scraper_utils.py:83-85 returns the input list unchanged — note the
    * reference skips the length check in that branch; we reproduce that).
    */
  def retainValid(url: Column, whitelist: Seq[String]): Column =
    if (whitelist.isEmpty) lit(true)
    else whitelist.map(w => url.contains(lit(w))).reduce(_ || _) && (length(url) > 9)

  /** F2 removeInValidArticles: drop url if it contains ANY blacklist
    * substring. Returns the KEEP predicate.
    */
  def notInvalid(url: Column, blacklist: Seq[String]): Column =
    if (blacklist.isEmpty) lit(true)
    else blacklist.map(b => !url.contains(lit(b))).reduce(_ && _)

  /** F5 has_noncont_str (base_plugin.py:564-578): url contains any
    * non-content substring (entries shorter than 2 chars are ignored by
    * the reference). Returns the KEEP predicate (i.e. negation).
    */
  def notNonContent(url: Column, nonContentStrings: Seq[String]): Column =
    notInvalid(url, nonContentStrings.filter(s => s != null && s.length >= 2))

  /** F3 is_valid_url: parseable with a registered-TLD host. Approximated
    * with host-extractability + a dotted-host shape check (the reference
    * delegates to the `tld` package's registry; the fixture corpus only
    * needs scheme + dotted host).
    */
  def isValidUrl(url: Column): Column = {
    val h = host(url)
    h.isNotNull && h.rlike("^[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")
  }

  /** P4 extractUniqueIDFromURL (base_plugin.py:1063-1102): first regex
    * whose group(`group`) matches wins, in stack order; else CRC32 of the
    * lowercase url (base_plugin.py:1369-1377 fallback).
    * `regexp_extract` returns '' on no-match → `nullif` turns it into a
    * null so `coalesce` falls through, preserving first-match-wins.
    */
  def uniqueId(url: Column, regexes: Seq[String], group: Int = 3): Column = {
    val tries = regexes.map(r => nullif(regexp_extract(url, r, group), lit("")))
    coalesce((tries :+ crc32Hex(lower(url))): _*)
  }

  /** Default unique-ID regex stack (base_plugin.py:131-138). */
  val defaultIdRegexes: Seq[String] = Seq(
    "(http.+\\/\\/)(www\\..+\\.com\\/.+\\-)([0-9]{5,})",
    "(http.+\\/\\/)(www\\..+\\.com\\/.+\\-)([0-9]{5,})(\\.html)",
    "(http.+\\/\\/)(www\\..+\\.in\\/.+\\/)([0-9]{5,})(\\.html)",
    "(http.+\\/\\/)(www\\..+\\.in\\/.+\\-)([0-9]{5,})",
    "(http.+\\/\\/)(www\\..+\\.in\\/.+\\/)([0-9]{5,})",
    "(http.+\\/\\/)(www\\..+\\.com\\/.+=)([0-9]{5,})"
  )

  /** Link-scheme prefixes dropped by S5 extractLinks
    * (scraper_utils.py:455-466).
    */
  val droppedLinkPrefixes: Seq[String] = Seq(
    "javascript:", "JavaScript:", "mailto:", "#", "?", "../", "tel:",
    "{{link}}", "{{showcmturl}}", "http://http://", "whatsapp:")

  /** S5 extractLinks (scraper_utils.py:437-474): every `<a href="...">`
    * in the HTML; relative links starting with '/' are resolved against
    * the page URL's scheme+host; junk schemes dropped. Returns an
    * ARRAY<STRING> column (explode at the call site). Pure Catalyst:
    * regexp_extract_all + transform + filter — one pass over the page,
    * no UDF, codegen'd.
    */
  def extractLinks(pageUrl: Column, html: Column): Column = {
    val hrefs = regexp_extract_all(
      html, lit("(?is)<a\\s[^>]*?href\\s*=\\s*[\"']([^\"'>]*)[\"']"), lit(1))
    val scheme = try_parse_url(pageUrl, lit("PROTOCOL"))
    val hostC = host(pageUrl)
    val resolved = transform(hrefs, l =>
      when(l.startsWith("/") && !l.startsWith("//"),
        concat(scheme, lit("://"), hostC, l)).otherwise(l))
    filter(resolved, l =>
      droppedLinkPrefixes.map(p => !l.startsWith(p)).reduce(_ && _) &&
        isValidUrl(l))
  }

  /** S1 RSS item-link pattern (base_plugin.py:708-773: per <channel>
    * <item>, the first <link> content; lxml-xml unwraps CDATA, so the
    * pattern accepts both plain and CDATA-wrapped links).
    */
  val rssLinkPattern: String =
    "(?s)<item>.*?<link\\s*>\\s*(?:<!\\[CDATA\\[)?([^<\\]]*)"

  /** S1: all item links of a feed XML, normalized (P1 lowercase). */
  def rssLinks(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit(rssLinkPattern), lit(1)),
      l => lower(trim(l)))

  /** F4 has_noncont_url (base_plugin.py:550-562): true if url has the
    * same (host, path) as any row of `nonContent(url)` — query params
    * ignored. Implemented as a left-anti join returning the KEPT rows.
    * `nonContent` is expected to be small (per-source config) → broadcast.
    */
  def dropNonContentUrls(candidates: DataFrame, urlCol: String,
                         nonContent: DataFrame, ncUrlCol: String): DataFrame = {
    val nc = nonContent.select(
      host(col(ncUrlCol)).as("_nc_host"), path(col(ncUrlCol)).as("_nc_path"))
      .distinct()
    candidates.join(broadcast(nc),
      host(col(urlCol)) === col("_nc_host") && path(col(urlCol)) === col("_nc_path"),
      "left_anti")
  }
}
