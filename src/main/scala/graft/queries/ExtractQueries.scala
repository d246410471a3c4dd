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

  /** q_article_assembly_full — the FULL per-source NewsEvent assembly
    * (VERDICT r01 item 1): rows cycle through the
    * ecotimes/timesofindia/trak/indiakanoon/generic profiles and run the
    * REAL SourceProfiles operators — P4 per-plugin url-ID stacks, P5
    * content-ID patterns (TOI data-articlemsid, trak shortlink), P6 date
    * cascade with per-plugin extras (ecotimes Last-Modified '%b %d, %Y',
    * indiakanoon title dates), P18 keyword-meta merge, P21 author stacks
    * (TOI unsplit, generic comma-split), P20 industries (ecotimes
    * sub-domain rule, trak article:tag findall) — over deterministic
    * synthetic pages; the oracle reconstructs every expected value from
    * the same synthesis arithmetic.
    */
  private def articleAssemblyFull(s: SparkSession, dir: String): DataFrame = {
    import graft.extract.SourceProfiles
    import graft.functions.DateExtract
    val d = documents(s, dir)
    val id = col("doc_id")
    val m = (id % 5).cast("int")
    val src = when(m === 0, "ecotimes").when(m === 1, "timesofindia")
      .when(m === 2, "trak").when(m === 3, "indiakanoon")
      .otherwise("generic")
    val dayS = (id % 28 + 1).cast("string")
    val kwN = (id % 7).cast("string")
    val url = when(m === 0,
        concat(lit("https://markets.economictimes.indiatimes.com/markets/story/"),
          (id + 10000).cast("string"), lit(".cms")))
      .when(m === 1, concat(lit("https://timesofindia.indiatimes.com/biz/story-"),
        id.cast("string")))
      .when(m === 2, concat(lit("https://trak.in/tags/business/story-"),
        id.cast("string"), lit("/")))
      .when(m === 3, concat(lit("https://indiankanoon.org/doc/"),
        (id + 50000).cast("string"), lit("/")))
      .otherwise(concat(lit("https://www.newsx.com/biz/article-"),
        (id + 10000).cast("string")))
    val kwMeta = concat(
      lit("<meta name=\"keywords\" content=\"alpha, beta "), kwN,
      lit("\"/><meta name=\"news_keywords\" content=\"beta "), kwN,
      lit(",gamma\"/>"))
    val dateBlock = when(m === 0,
        concat(lit("<meta http-equiv=\"Last-Modified\" content=\"Saturday, Jan "),
          dayS, lit(", 2020 10:30:05 AM\"/>")))
      .when(m === 3, concat(lit("<TITLE>Case Judgment on "), dayS,
        lit(" Mar, 2020</TITLE>")))
      .otherwise(concat(lit("<div data-date=\"2020-02-"), lpad(dayS, 2, "0"),
        lit("\">d</div>")))
    val authorBlock = when(m === 0,
        lit("<script>{\"publisher\":{\"@type\":\"Organization\",\"name\":\"ETMarkets\"}}</script>"))
      .when(m === 1, concat(lit("{\"author\":{\"@type\":\"Person\",\"name\":\"Reporter "),
        kwN, lit("\"}}")))
      .when(m === 2, lit("<span class=\"post-author-name\">By <b>Trak Author</b></span>"))
      .when(m === 3, lit("<div class=\"docsource_main\">Supreme Court</div>"))
      .otherwise(concat(lit("{\"author\":{\"@type\":\"Person\",\"name\":\"Reporter "),
        kwN, lit(", Staff Writer\"}}")))
    val idBlock = when(m === 1, concat(lit("<div data-articlemsid=\""),
        (id + 3000).cast("string"), lit("\">x</div>")))
      .when(m === 2, concat(lit("<link rel='shortlink' href='https://trak.in/?p="),
        (id + 4000).cast("string"), lit("' />")))
      .otherwise(lit(""))
    val indBlock = when(m === 2,
      lit("<meta property=\"article:tag\" content=\"Startups\" />" +
        "<meta property=\"article:tag\" content=\"Funding News\" />"))
      .otherwise(lit(""))
    val html = concat(lit("<html><head>"), dateBlock, kwMeta,
      lit("</head><body>"), idBlock, authorBlock, indBlock,
      lit("</body></html>"))
    d.select(id, src.as("source"), url.as("url"), html.as("html"))
      .select(col("doc_id"), col("source"),
        SourceProfiles.bySource(col("source"))(p =>
          SourceProfiles.uniqueId(p, col("url"), col("html"))).as("unique_id"),
        coalesce(
          SourceProfiles.bySource(col("source"))(p =>
            DateExtract.cascade(col("html"),
              lit("2021-01-01").cast("date"), p.dateExtras)),
          DateExtract.publishedDate(col("html"),
            lit("2021-01-01").cast("date"))).as("pubdate"),
        concat_ws("|", SourceProfiles.keywords(col("html")))
          .as("keywords_joined"),
        concat_ws("|", SourceProfiles.bySource(col("source"))(p =>
          SourceProfiles.authors(p, col("html")))).as("authors_joined"),
        concat_ws("|", SourceProfiles.bySource(col("source"))(p =>
          SourceProfiles.industries(p, col("url"), col("html"))))
          .as("industries_joined"))
      .orderBy("doc_id")
  }

  private val articleAssemblyFullSql =
    """SELECT doc_id,
      |  CASE m WHEN 0 THEN 'ecotimes' WHEN 1 THEN 'timesofindia'
      |         WHEN 2 THEN 'trak' WHEN 3 THEN 'indiakanoon'
      |         ELSE 'generic' END AS source,
      |  CAST(CASE m WHEN 0 THEN doc_id + 10000 WHEN 1 THEN doc_id + 3000
      |              WHEN 2 THEN doc_id + 4000 WHEN 3 THEN doc_id + 50000
      |              ELSE doc_id + 10000 END AS VARCHAR) AS unique_id,
      |  (CASE m WHEN 0 THEN DATE '2020-01-01' WHEN 3 THEN DATE '2020-03-01'
      |          ELSE DATE '2020-02-01' END
      |   + to_days(CAST(doc_id % 28 AS INT)))::DATE AS pubdate,
      |  concat('alpha|beta ', CAST(doc_id % 7 AS VARCHAR), '|gamma')
      |    AS keywords_joined,
      |  CASE m WHEN 0 THEN 'ETMarkets'
      |         WHEN 1 THEN concat('Reporter ', CAST(doc_id % 7 AS VARCHAR))
      |         WHEN 2 THEN 'Trak Author'
      |         WHEN 3 THEN 'Supreme Court'
      |         ELSE concat('Reporter ', CAST(doc_id % 7 AS VARCHAR),
      |                     '| Staff Writer') END AS authors_joined,
      |  CASE m WHEN 0 THEN 'markets' WHEN 2 THEN 'Startups|Funding News'
      |         ELSE '' END AS industries_joined
      |FROM (SELECT doc_id, CAST(doc_id % 5 AS INT) AS m FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q_article_assembly_six — the six remaining content-plugin profiles
    * (VERDICT r02 item 1): rows cycle through
    * hindu/moneycontrol/livemint/forbes/business_std/inexp_business and
    * run the REAL SourceProfiles operators — hindu's article-NNN.ece url
    * id + publish-date meta + setContentAuthor + keywords-meta industry;
    * moneycontrol's _NNNNNN.html id + to_timestamp date + unsplit author
    * + market_element industry; livemint's url id (config shell
    * otherwise); forbes' /NNNN/1 id + time-prefixed datePublished +
    * cutStrBetweenTags author chain; business_std's -NNNNN id + spaced
    * datePublished + author meta; inexp_business's BASE-FIRST id stack +
    * dateModified-suffixed datePublished (authors deliberately dead, as
    * in the reference). Oracle reconstructs every expected value from
    * the same synthesis arithmetic.
    */
  private def articleAssemblySix(s: SparkSession, dir: String): DataFrame = {
    import graft.extract.SourceProfiles
    import graft.functions.DateExtract
    val d = documents(s, dir)
    val id = col("doc_id")
    val m = (id % 6).cast("int")
    val src = when(m === 0, "hindu").when(m === 1, "moneycontrol")
      .when(m === 2, "livemint").when(m === 3, "forbes")
      .when(m === 4, "business_std").otherwise("inexp_business")
    val dayS = (id % 28 + 1).cast("string")
    val dd = lpad(dayS, 2, "0")
    val kwN = (id % 7).cast("string")
    val url = when(m === 0,
        concat(lit("https://www.thehindu.com/business/Industry/topic-article"),
          (id + 70000).cast("string"), lit(".ece")))
      .when(m === 1, concat(lit("https://www.moneycontrol.com/news/business/story_"),
        (id + 600000).cast("string"), lit(".html")))
      .when(m === 2, concat(lit("https://www.livemint.com/money/item-"),
        (id + 50000).cast("string"), lit(".html")))
      .when(m === 3, concat(lit("https://www.forbesindia.com/article/big-story/item/"),
        (id + 8000).cast("string"), lit("/1")))
      .when(m === 4, concat(lit("https://www.business-standard.com/article/pti-stories/story-"),
        (id + 90000).cast("string"), lit("_1.html")))
      .otherwise(concat(lit("https://www.newindianexpress.com/world/story-"),
        (id + 20000).cast("string"), lit(".html")))
    val kwMeta = concat(
      lit("<meta name=\"keywords\" content=\"alpha, beta "), kwN,
      lit("\"/><meta name=\"news_keywords\" content=\"beta "), kwN,
      lit(",gamma\"/>"))
    val dateBlock = when(m === 0,
        concat(lit("<meta name=\"publish-date\" content=\"2020-03-"), dd,
          lit("T10:00:00+05:30\">")))
      .when(m === 1, concat(
        lit("<input type=\"hidden\" id=\"to_timestamp\" value=\"202004"), dd,
        lit("103000\">")))
      .when(m === 2, concat(lit("<div data-date=\"2020-05-"), dd,
        lit("\">d</div>")))
      .when(m === 3, concat(lit("{\"datePublished\": \"10:52:14 AM IST Jun "),
        dayS, lit(", 2020\"}")))
      .when(m === 4, concat(lit("{\"datePublished\": \"2020-07-"), dd,
        lit("T12:00:00+05:30\"}")))
      .otherwise(concat(lit("{\"datePublished\":\"2020-08-"), dd,
        lit("T08:00:00+05:30\",\"dateModified\":\"x\"}")))
    val authorBlock = when(m === 0,
        lit("<script>tp.push([\"setContentAuthor\", \"Special Correspondent\"])</script>"))
      .when(m === 1, lit("{\"author\": \"MC News Desk\"}"))
      .when(m === 3, lit("<span class = \"author_des\">By <span>" +
        "<a href=\"https://x.com/f\" target = \"_blank\">Forbes Writer</a>" +
        "</span></span>"))
      .when(m === 4, lit("<meta name=\"author\" content=\"BS Reporter\">"))
      .otherwise(lit(""))
    val indBlock = when(m === 0,
        lit("<meta name=\"keywords\" content=\"Banking Sector\" />"))
      .when(m === 1, lit("<div class=\"market_element\">personal-finance</div>"))
      .otherwise(lit(""))
    val html = concat(lit("<html><head>"), dateBlock, kwMeta,
      lit("</head><body>"), authorBlock, indBlock,
      lit("</body></html>"))
    d.select(id, src.as("source"), url.as("url"), html.as("html"))
      .select(col("doc_id"), col("source"),
        SourceProfiles.bySource(col("source"))(p =>
          SourceProfiles.uniqueId(p, col("url"), col("html"))).as("unique_id"),
        coalesce(
          SourceProfiles.bySource(col("source"))(p =>
            DateExtract.cascade(col("html"),
              lit("2021-01-01").cast("date"), p.dateExtras)),
          DateExtract.publishedDate(col("html"),
            lit("2021-01-01").cast("date"))).as("pubdate"),
        concat_ws("|", SourceProfiles.keywords(col("html")))
          .as("keywords_joined"),
        concat_ws("|", SourceProfiles.bySource(col("source"))(p =>
          SourceProfiles.authors(p, col("html")))).as("authors_joined"),
        concat_ws("|", SourceProfiles.bySource(col("source"))(p =>
          SourceProfiles.industries(p, col("url"), col("html"))))
          .as("industries_joined"))
      .orderBy("doc_id")
  }

  private val articleAssemblySixSql =
    """SELECT doc_id,
      |  CASE m WHEN 0 THEN 'hindu' WHEN 1 THEN 'moneycontrol'
      |         WHEN 2 THEN 'livemint' WHEN 3 THEN 'forbes'
      |         WHEN 4 THEN 'business_std' ELSE 'inexp_business' END AS source,
      |  CAST(doc_id + CASE m WHEN 0 THEN 70000 WHEN 1 THEN 600000
      |                       WHEN 2 THEN 50000 WHEN 3 THEN 8000
      |                       WHEN 4 THEN 90000 ELSE 20000 END AS VARCHAR)
      |    AS unique_id,
      |  (CASE m WHEN 0 THEN DATE '2020-03-01' WHEN 1 THEN DATE '2020-04-01'
      |          WHEN 2 THEN DATE '2020-05-01' WHEN 3 THEN DATE '2020-06-01'
      |          WHEN 4 THEN DATE '2020-07-01' ELSE DATE '2020-08-01' END
      |   + to_days(CAST(doc_id % 28 AS INT)))::DATE AS pubdate,
      |  concat('alpha|beta ', CAST(doc_id % 7 AS VARCHAR), '|gamma')
      |    AS keywords_joined,
      |  CASE m WHEN 0 THEN 'Special Correspondent' WHEN 1 THEN 'MC News Desk'
      |         WHEN 3 THEN 'Forbes Writer' WHEN 4 THEN 'BS Reporter'
      |         ELSE '' END AS authors_joined,
      |  CASE m WHEN 0 THEN 'Banking Sector' WHEN 1 THEN 'personal-finance'
      |         ELSE '' END AS industries_joined
      |FROM (SELECT doc_id, CAST(doc_id % 6 AS INT) AS m FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q_generic_body — the generic paragraph-density fallback extractor
    * (HtmlExtract.generic_body; the reference's newspaper-library text
    * path, base_plugin.py:1253-1260) over a livemint-shaped synthetic
    * page: nav/share/footer boilerplate paragraphs are short and must be
    * dropped, the two long article paragraphs survive. The extraction
    * pipeline itself (regexp_extract_all → strip tags → density filter →
    * join) is expressed verbatim in DuckDB list functions, so the oracle
    * independently re-runs the extraction instead of re-synthesizing the
    * expected output.
    */
  private def genericBody(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val html = concat(
      lit("<html><body><div class=\"nav\"><p>Home</p><p class=\"m\">Sections</p></div>"),
      lit("<div id=\"mainArea\"><p class=\"p1\">"), substring(col("text"), 1, 120),
      lit(" end of lead paragraph.</p><p>Short share.</p><p class=\"p2\"><b>Body</b> "),
      substring(col("text"), 121, 160),
      lit(" closing sentence of the second paragraph.</p></div>"),
      lit("<p>(c) 2021 Newsroom</p></body></html>"))
    d.select(col("doc_id"),
        graft.functions.HtmlExtract.generic_body(html).as("body"))
      .orderBy("doc_id")
  }

  private val genericBodySql = {
    val body = graft.functions.HtmlExtract.genericBodySql("html")
    """WITH pages AS (
      |  SELECT doc_id,
      |    concat('<html><body><div class="nav"><p>Home</p><p class="m">Sections</p></div>',
      |      '<div id="mainArea"><p class="p1">', substr(text, 1, 120),
      |      ' end of lead paragraph.</p><p>Short share.</p><p class="p2"><b>Body</b> ',
      |      substr(text, 121, 160),
      |      ' closing sentence of the second paragraph.</p></div>',
      |      '<p>(c) 2021 Newsroom</p></body></html>') AS html
      |  FROM documents)
      |""".stripMargin +
      s"SELECT doc_id, $body AS body\nFROM pages ORDER BY doc_id"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_generic_body", genericBody, Some(genericBodySql)),
    QueryDef("q_body_extract", bodyExtract, Some(bodyExtractSql)),
    QueryDef("q_pubdate_extract", pubdateExtract, Some(pubdateExtractSql)),
    QueryDef("q_article_assembly", articleAssembly, Some(articleAssemblySql)),
    QueryDef("q_article_assembly_full", articleAssemblyFull,
      Some(articleAssemblyFullSql)),
    QueryDef("q_article_assembly_six", articleAssemblySix,
      Some(articleAssemblySixSql))
  )
}
