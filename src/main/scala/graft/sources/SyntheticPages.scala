package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-style pages table (BASELINE.json
  * input_hint shape: url, warc_ts, html binary, text, lang) with the
  * properties the 10^10-scale design must survive in miniature:
  * hot-host skew (a few hosts own ~30% of pages), an expanding link
  * graph, and HTML embedding the reference's structural formats
  * (div.artText body — mod_en_in_ecotimes.py format5; data-date meta —
  * base_plugin.py:188-191; story-NNNNN unique-id urls —
  * base_plugin.py:131-138).
  *
  * No randomness: everything is arithmetic on the row id (seeded hash via
  * xxhash64 where dispersion matters), so any two runs — at any
  * parallelism — generate byte-identical pages.
  */
object SyntheticPages {

  val LinksPerPage = 8

  /** Host id for a page id: pages with xxhash64(id)%10 < 3 land on one of
    * `hotHosts` hosts (~30% of the universe), the rest spread uniformly.
    */
  def hostIdOf(id: Column, hosts: Int, hotHosts: Int): Column =
    when(pmod(xxhash64(id), lit(10L)) < 3, pmod(id, lit(hotHosts.toLong)))
      .otherwise(lit(hotHosts.toLong) +
        pmod(xxhash64(id, lit(1L)), lit((hosts - hotHosts).toLong)))

  def hostOf(hostId: Column): Column =
    concat(lit("www.site"), hostId.cast("string"), lit(".com"))

  def urlOf(id: Column, hosts: Int, hotHosts: Int): Column =
    concat(lit("https://"), hostOf(hostIdOf(id, hosts, hotHosts)),
      lit("/articles/story-"), (id + 100000).cast("string"))

  /** Deterministic body text for a page (≥ 150 chars, so it passes the
    * default 400-char gate only with the html wrapper — mirrors F7/F8
    * thresholds being about raw vs text sizes).
    */
  def bodyTextOf(id: Column): Column =
    concat(
      lit("Market update number "), id.cast("string"),
      lit(": the index moved by "), pmod(id, lit(97L)).cast("string"),
      lit(" points on turnover of "), pmod(xxhash64(id, lit(2L)), lit(9999L)).cast("string"),
      lit(" crores. Analysts said outlook "), pmod(id, lit(7L)).cast("string"),
      lit(" remains steady and volumes were broadly unchanged across segments."))

  /** The pages table. Link graph: page id links to (id*31 + 7k) % n for
    * k = 1..LinksPerPage (plus junk links that S5 must drop).
    */
  def pages(spark: SparkSession, n: Long,
            hosts: Int = 50, hotHosts: Int = 3): DataFrame = {
    val id = col("id")
    val linkAnchors = (1 to LinksPerPage).map { k =>
      concat(lit("<a href=\""),
        urlOf(pmod(id * 31 + k * 7, lit(n)), hosts, hotHosts),
        lit("\">l"), lit(k.toString), lit("</a>"))
    }
    val html = concat(Seq(
      lit("<html><head><title>Story "), id.cast("string"),
      lit("</title></head><body><div data-date=\""),
      date_format(date_add(lit("2021-01-01").cast("date"),
        pmod(id, lit(364L)).cast("int")), "yyyy-MM-dd"),
      lit("\">published</div>"),
      lit("<div class=\"nav\"><a href=\"javascript:void(0)\">x</a>" +
        "<a href=\"/articles/story-"), (id + 100000).cast("string"),
      lit("?ref=self\">self</a></div>"),
      lit("<div data-brCount=\"4\" class=\"artText\">")) ++ Seq(bodyTextOf(id)) ++
      Seq(lit("</div><div class=\"rail\">")) ++ linkAnchors ++
      Seq(lit("</div></body></html>")): _*)
    spark.range(n).select(
      lower(urlOf(id, hosts, hotHosts)).as("url"),
      timestamp_seconds(
        unix_timestamp(lit("2021-06-01 00:00:00").cast("timestamp")) +
          pmod(id, lit(86400L))).as("warc_ts"),
      encode(html, "UTF-8").as("html"),
      bodyTextOf(id).as("text"),
      lit("en").as("lang"))
  }

  /** Seed frontier rows: the first `count` page urls, one source. */
  def seeds(spark: SparkSession, count: Int,
            hosts: Int = 50, hotHosts: Int = 3): DataFrame = {
    val id = col("id")
    spark.range(count).select(
      lower(urlOf(id, hosts, hotHosts)).as("url"),
      lit("synthetic").as("source"),
      lit(0).as("priority"),
      id.as("seq"))
  }
}
