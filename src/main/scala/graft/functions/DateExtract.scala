package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P6 extractPublishedDate (SURVEY.md §2.3): the ordered dict of
  * (regex → strptime format) pairs from
  * /root/reference/src/newslookout/base_plugin.py:143-194, first match
  * whose group(2) parses to a non-future date wins (F9 rejection at
  * base_plugin.py:984-990). strptime tokens are translated to Java
  * DateTimeFormatter patterns (%a→EEE, %d→d (lenient), %b→MMM, %Y→yyyy,
  * %H:%M:%S→H:mm:ss, %z→Z, %B→MMMM).
  *
  * Pure Catalyst: a coalesce of `to_timestamp(regexp_extract(...))`
  * guarded by the future-date filter — runs inside the scan stage.
  */
object DateExtract {

  /** (regex, javaFormat) in the reference's insertion order. */
  val defaultDateRegexes: Seq[(String, String)] = Seq(
    // <meta name="created-date" content="Thu, 23 Jan 2020 11:00:00 +0530" />
    ("(<meta name=\"created-date\" content=\")" +
      "([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \\+0530)(\" \\/>)",
      "EEE, d MMM yyyy H:mm:ss Z"),
    // <meta http-equiv="Last-Modified" content="Sat, 15 May 2021 08:43:47 AM"/>
    ("(<meta http-equiv=\"Last-Modified\" content=\")" +
      "([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2})( [AMPamp]{2}\"\\/>)",
      "EEE, d MMM yyyy H:mm:ss"),
    // <meta name = "publish-date" ...>
    ("(<meta name = \"publish-date\" content = \")" +
      "([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \\+0530)(\" \\/>)",
      "EEE, d MMM yyyy H:mm:ss Z"),
    ("(<meta name=\"publish-date\" content=\")" +
      "([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \\+0530)(\" \\/>)",
      "EEE, d MMM yyyy H:mm:ss Z"),
    ("(\"datePublished\":\")" +
      "([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \\+0530)(\")",
      "EEE, d MMM yyyy H:mm:ss Z"),
    ("(\"dateModified\":\")" +
      "([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \\+0530)(\")",
      "EEE, d MMM yyyy H:mm:ss Z"),
    // "dateModified": "2020-01-30T22:15:00+05:30"
    ("(\"dateModified\": \")(20[0-9]{2}\\-[0-9]{2}\\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\\+05:30\")",
      "yyyy-MM-dd'T'HH:mm:ss"),
    ("('publishedDate': ')(20[0-9]{2}\\-[0-9]{2}\\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\\+05:30')",
      "yyyy-MM-dd'T'HH:mm:ss"),
    ("(\"datePublished\": \")(20[0-9]{2}\\-[0-9]{2}\\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\\+05:30\")",
      "yyyy-MM-dd'T'HH:mm:ss"),
    ("(content=\")([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \\+0530)(\">)",
      "EEE, d MMM yyyy H:mm:ss Z"),
    ("(content=\")(20[0-9]{2}\\-[0-9]{2}\\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\\+05:30\")",
      "yyyy-MM-dd'T'HH:mm:ss"),
    // Updated: February 26, 2021 5:45 pm IST
    ("(Updated: )([a-zA-Z]+ [0-9]{1,2}, 20[0-9]{2} [0-9]{1,2}:[0-9]{2})( [a-zA-Z]{2} IST)",
      "MMMM d, yyyy H:mm"),
    ("(<li class=\"date\">Updated: )([a-zA-Z]+ [0-9]{1,2}, 20[0-9]{2}, [0-9]{1,2}:[0-9]{2})( IST<\\/li>)",
      "MMMM d, yyyy, H:mm"),
    ("(data\\-date=\")([0-9]{4}\\-[0-9]{2}\\-[0-9]{2})(\">)", "yyyy-MM-dd"),
    ("(data\\-article\\-date=')([0-9]{4}\\-[0-9]{2}\\-[0-9]{2})(')", "yyyy-MM-dd")
  )

  /** First matching pattern whose parsed date is not after `asOf` wins
    * (F9). `try_to_timestamp` keeps a malformed match from failing the
    * whole cascade (reference catches per-pattern and tries the next).
    */
  def publishedDate(html: Column, asOf: Column,
                    extra: Seq[(String, String)] = Seq()): Column =
    cascade(html, asOf, extra ++ defaultDateRegexes)

  /** The ordered (regex → format) coalesce over an explicit pattern
    * list. `coalesce(cascade(extras), cascade(base))` ≡
    * `cascade(extras ++ base)` — callers dispatching per-source extras
    * use that identity to share ONE base cascade across all sources
    * instead of duplicating the 15-pattern stack per dispatch branch.
    */
  def cascade(html: Column, asOf: Column,
              patterns: Seq[(String, String)]): Column = {
    val tries = patterns.map { case (re, fmt) =>
      // runs of spaces collapse before parsing: Python strptime treats
      // whitespace runs as one (ecotimes' '%b %d, %Y  %H:%M:%S' extra
      // captures double-spaced values); Java patterns are strict.
      val raw = regexp_replace(
        nullif(regexp_extract(html, re, 2), lit("")), " +", " ")
      // Spark ≥3 forbids 'E' (day-of-week) in PARSING patterns — drop the
      // redundant "Thu, " prefix from the value instead.
      val (value, parseFmt) =
        if (fmt.startsWith("EEE, "))
          (regexp_replace(raw, "^[a-zA-Z]{3}, ", ""), fmt.stripPrefix("EEE, "))
        else (raw, fmt)
      val ts = try_to_timestamp(value, lit(parseFmt))
      when(to_date(ts) <= asOf, to_date(ts)) // F9: future ⇒ null ⇒ next
    }
    if (tries.isEmpty) lit(null).cast("date") else coalesce(tries: _*)
  }
}
