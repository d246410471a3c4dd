package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HtmlExtract, TextClean, UrlFunctions => U}
import Tables._

/** Article-extraction pipeline queries (SURVEY.md §2.4 + §3.3): body
  * extraction via the BlockTextExpr Catalyst expression, publish-date
  * regex cascade (P6), and the full article assembly over synthetic pages
  * whose HTML embeds the reference's structural formats. The body
  * extraction itself is not SQL-expressible in DuckDB, so the oracle
  * reconstructs the expected output from the same deterministic synthesis.
  */
object ExtractQueries {

  /** Deterministic synthetic article page: ecotimes-format5-shaped body
    * (div.artText), a date meta, a title, link rail, and noise divs.
    * Body text derives from documents.text so content varies per row.
    */
  private def pageHtml(id: org.apache.spark.sql.Column,
                       text: org.apache.spark.sql.Column) = concat(
    lit("<html><head><title>Story "), id.cast("string"),
    lit("</title><meta name=\"created-date\" content=\"x\"/></head><body>"),
    lit("<div class=\"hdr\"><a href=\"/home\">home</a></div>"),
    lit("<div data-date=\""), date_format(
      date_add(lit("2020-01-01").cast("date"), (id % 365).cast("int")),
      "yyyy-MM-dd"),
    lit("\">ts</div>"),
    lit("<!-- ad block <div class=\"artText\">decoy</div> -->"),
    lit("<div data-brCount=\"3\" class=\"artText\"><p>"),
    substring(text, 1, 80),
    lit(" &amp; more.</p><p>Para two t&#39;s.</p></div>"),
    lit("<div class=\"ftr\">footer</div></body></html>"))

  /** q_body_extract — BlockTextExpr over div.artText (ecotimes format5,
    * mod_en_in_ecotimes.py:752-762): comment-decoy must be skipped,
    * entities decoded. Oracle reconstructs the expected text from the
    * same substring arithmetic.
    */
  private def bodyExtract(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    d.select(col("doc_id"),
        HtmlExtract.block_text(
          pageHtml(col("doc_id"), col("text")), "div", "artText").as("body"))
      .orderBy("doc_id")
  }

  private val bodyExtractSql =
    """SELECT doc_id,
      |  concat(substr(text, 1, 80), ' & more.Para two t''s.') AS body
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q_pubdate_extract — P6 extractPublishedDate cascade
    * (base_plugin.py:953-999): first matching (regex → format) pair wins;
    * here the data-date meta (base_plugin.py:188-191 pattern).
    */
  private def pubdateExtract(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val html = pageHtml(col("doc_id"), col("text"))
    val cascade = coalesce(
      to_date(nullif(
        regexp_extract(html, "(data\\-date=\")([0-9]{4}\\-[0-9]{2}\\-[0-9]{2})(\")", 2),
        lit("")), "yyyy-MM-dd"),
      to_date(nullif(
        regexp_extract(html, "(data\\-article\\-date=')([0-9]{4}\\-[0-9]{2}\\-[0-9]{2})(')", 2),
        lit("")), "yyyy-MM-dd"))
    d.select(col("doc_id"), cascade.as("pubdate")).orderBy("doc_id")
  }

  private val pubdateExtractSql =
    """SELECT doc_id,
      |  (DATE '2020-01-01' + INTERVAL (doc_id % 365) DAY)::DATE AS pubdate
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q_article_assembly — the §3.3 fetch-parse pipeline in one pass:
    * title, body (BlockTextExpr), pubdate (P6), uniqueId (P4), cleaned
    * text length gate (F8 analog with min length 10).
    */
  private def articleAssembly(s: SparkSession, dir: String): DataFrame = {
    val u = urls(s, dir)
    val d = documents(s, dir).select(col("doc_id"), col("text"))
    val pages = u.join(d, "doc_id")
      .withColumn("html", pageHtml(col("doc_id"), col("text")))
    val body = HtmlExtract.block_text(col("html"), "div", "artText")
    pages.select(
        col("doc_id"),
        col("url"),
        U.uniqueId(col("url"), U.defaultIdRegexes).as("unique_id"),
        regexp_extract(col("html"), "(?s)<title>(.*?)</title>", 1).as("title"),
        to_date(nullif(regexp_extract(col("html"),
          "(data\\-date=\")([0-9]{4}\\-[0-9]{2}\\-[0-9]{2})(\")", 2), lit("")),
          "yyyy-MM-dd").as("pubdate"),
        TextClean.cleanText(body).as("text_clean"),
        length(body).cast("bigint").as("text_size"))
      .filter(col("text_size") > 10)
      .orderBy("doc_id")
  }

  /** Oracle mirrors the synthesis arithmetic; cleanText on this input
    * only triggers the '&'-entity decode (already applied) and trim, plus
    * the sentence-gap fix 'more.Para' → 'more. Para'.
    */
  private val articleAssemblySql = withUrls(
    """SELECT doc_id, url,
      |  regexp_extract(url, '(http.+//)(www\..+\.com/.+-)([0-9]{5,})', 3) AS unique_id,
      |  concat('Story ', CAST(doc_id AS VARCHAR)) AS title,
      |  (DATE '2020-01-01' + INTERVAL (doc_id % 365) DAY)::DATE AS pubdate,
      |  trim(regexp_replace(concat(substr(text, 1, 80), ' & more.Para two t''s.'),
      |       '(\b[a-zA-Z]{2,})(\.)([A-Z][a-zA-Z])', '\1\2 \3', 'g')) AS text_clean,
      |  CAST(length(concat(substr(text, 1, 80), ' & more.Para two t''s.')) AS BIGINT) AS text_size
      |FROM urls JOIN documents USING (doc_id)
      |WHERE length(concat(substr(text, 1, 80), ' & more.Para two t''s.')) > 10
      |ORDER BY doc_id""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_body_extract", bodyExtract, Some(bodyExtractSql)),
    QueryDef("q_pubdate_extract", pubdateExtract, Some(pubdateExtractSql)),
    QueryDef("q_article_assembly", articleAssembly, Some(articleAssemblySql))
  )
}
