package graft

import org.apache.spark.sql.functions._

import graft.extract.{SourceProfiles, SourceRegistry}

/** The transcribed per-plugin crawl-source configuration, pinned against
  * the reference's own test assertions and class-body list sizes.
  */
class SourceRegistrySpec extends SparkTestBase {
  import spark.implicits._

  test("moneycontrol filterNonContentURLs reference pin " +
      "(test_mod_en_in_moneycontrol.py:131-137)") {
    val article = "https://www.moneycontrol.com/news/business/ipo/" +
      "zomato-ipo-improving-economics-growth-plans-and-strong-investor-" +
      "appetite-7173681.html"
    val nonUrl1 = "https://www.moneycontrol.com/glossary/"       // F4 hit
    val nonUrl2 = "https://www.moneycontrol.com/msite/" +
      "decoding-the-world-of-etf/?utmsrc=1234"                   // F5 hit
    val in = Seq(nonUrl1, nonUrl2, article).toDF("url")
    val kept = SourceRegistry.filterNonContentUrls(in, "url", "moneycontrol")
      .as[String].collect().toSet
    assert(kept == Set(article), s"got $kept")
  }

  test("hindu source filters: F1 retain, F4 non-content url, F5 " +
      "non-content substrings (mod_en_in_hindu.py:65-93)") {
    val spec = SourceRegistry.specs("hindu")
    val article = "https://www.thehindu.com/business/budget/some-story/" +
      "article30713792.ece"
    val in = Seq(
      article,
      "https://epaper.thehindu.com/reader",          // F5 substring
      "https://sportstar.thehindu.com/cricket/x",    // F5 substring
      "https://www.thehindu.com/business/Economy/",  // F4 exact host+path
      "https://www.thehindu.com/business/markets/?p=2") // F4 (query ignored)
      .toDF("url")
    val kept = SourceRegistry.filterNonContentUrls(in, "url", "hindu")
      .as[String].collect().toSet
    assert(kept == Set(article), s"got $kept")
    // F1 retention: only business-section urls pass the whitelist
    assert(spec.validSubstrings == Seq("https://www.thehindu.com/business/"))
    import graft.functions.{UrlFunctions => U}
    val retained = Seq(article, "https://www.thehindu.com/sport/x")
      .toDF("url")
      .filter(U.retainValid(col("url"), spec.validSubstrings))
      .as[String].collect().toSeq
    assert(retained == Seq(article))
  }

  test("registry covers all 11 plugins; min lengths agree with the " +
      "extraction profiles; list sizes match the reference class bodies") {
    val expectMin = Map("hindu" -> 200, "ndtv" -> 250,
      "inexp_business" -> 250).withDefaultValue(400)
    SourceProfiles.knownSources.foreach { srcName =>
      val spec = SourceRegistry.specs(srcName)
      assert(spec.minArticleLengthInChars == expectMin(srcName), srcName)
      assert(spec.minArticleLengthInChars ==
        SourceProfiles.registry(srcName).minArticleLengthInChars,
        s"$srcName: registry/profile min length drift")
    }
    // sizes pinned so an accidental truncation of the transcription is
    // loud (counts from the reference class bodies)
    def sz(n: String) = {
      val s = SourceRegistry.specs(n)
      (s.rssFeeds.size, s.invalidSubstrings.size, s.nonContentUrls.size,
        s.nonContentStrings.size)
    }
    assert(sz("ecotimes") == ((3, 72, 293, 10)))
    assert(sz("moneycontrol") == ((6, 9, 231, 27)))
    assert(sz("indiakanoon") == ((50, 1, 12, 0)))
    assert(sz("livemint") == ((2, 21, 104, 3)))
    assert(sz("hindu") == ((1, 0, 14, 6)))
    // the reference's own missing-comma concatenation inside
    // moneycontrol's nonContentStrings survives transcription verbatim
    assert(SourceRegistry.moneycontrol.nonContentStrings.contains(
      "www.moneycontrol.com/msite/decoding-the-world-of-etf/?" +
        "www.moneycontrol.com/mcplus/portfolio/logout.php?"))
  }

  test("domain→source routing (queue_manager.py:346-352): known hosts " +
      "route, no cross-plugin collisions, dead concat entry verbatim") {
    val m = SourceRegistry.domainToSource
    assert(m("www.thehindu.com") == "hindu")
    assert(m("economictimes.indiatimes.com") == "ecotimes")
    assert(m("www.newindianexpress.com") == "inexp_business")
    assert(m("indianexpress.com") == "inexp_business")
    assert(m("moneycontrol.com") == "moneycontrol")
    // every (domain, plugin) pair is unique → flatMap size == map size
    val pairs = SourceRegistry.specs.toSeq
      .flatMap { case (n, s) => s.allowedDomains.map(_ -> n) }
    assert(pairs.size == m.size, "cross-plugin domain collision")
    // the reference's missing-comma concatenated domain is kept dead
    assert(m.contains("hr.economictimes.indiatimes.com" +
      "prime.economictimes.indiatimes.com"))
    // column form routes per row from the url host
    val got = Seq(
      "https://www.thehindu.com/business/x",
      "https://www.livemint.com/money/y",
      "https://unknown.example.com/z").toDF("url")
      .select(SourceRegistry.routeByDomain(
        graft.functions.UrlFunctions.host(col("url"))).as("src"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("hindu"), Some("livemint"), None))
  }
}
