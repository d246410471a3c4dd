package graft

import org.apache.spark.sql.functions._

import graft.extract.SourceProfiles
import graft.functions.{TextClean, TopTerms}

/** P18 keyword pipeline pins (VERDICT r04 items 2-3) against the ACTUAL
  * reference outputs: every expected value below was computed by running
  * `NewsEvent.cleanText` / `setKeyWords`
  * (/root/reference/src/newslookout/news_event.py:206-218, :259-314)
  * directly on the same inputs. Clean-then-dedupe ORDER is what these
  * pins protect: two raw keywords that differ only by dirt (" alpha" vs
  * "alpha", "al’pha" vs "al'pha") must collapse to ONE entry, which only
  * happens when cleanText runs BEFORE the first-seen dedupe.
  */
class KeywordMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def evalArr(c: org.apache.spark.sql.Column): Seq[String] =
    Seq(1).toDF("x").select(c).as[Seq[String]].head()

  private def eval1(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).as[String].head()

  test("per-keyword cleanText matches reference NewsEvent.cleanText pins") {
    // expected values computed with the reference's own cleanText
    val cases = Seq(
      "Mc’Kinsey" -> "Mc'Kinsey",
      "cost ₹99" -> "cost  Rupees 99", // NO repeat collapse in cleanText
      " beta tech " -> "beta tech",
      "profit — up.Next" -> "profit - up. Next", // dash + sentence gap
      "€5bn“deal”" -> "Euros 5bn'deal'")
    cases.foreach { case (in, expect) =>
      assert(eval1(TextClean.cleanText(lit(in))) == expect, in)
    }
  }

  test("setKeyWords parity: clean FIRST, then first-seen dedupe, empties kept") {
    // reference: setKeyWords(["al’pha","be₹ta"," alpha","alpha","","x","al'pha"])
    //   == ["al'pha", "be Rupees ta", "alpha", "", "x"]
    val html = lit(
      "<meta name=\"keywords\" content=\"al’pha,be₹ta, alpha\"/>" +
        "<meta name=\"news_keywords\" content=\"alpha,,x,al'pha\"/>")
    assert(evalArr(SourceProfiles.keywords(html)) ===
      Seq("al'pha", "be Rupees ta", "alpha", "", "x"))
  }

  test("absent meta contributes nothing; present-but-empty contributes ['']") {
    val onlyKw = lit("<meta name=\"keywords\" content=\"alpha, beta\"/>")
    assert(evalArr(SourceProfiles.keywords(onlyKw)) === Seq("alpha", "beta"))
    val emptyKw = lit("<meta name=\"keywords\" content=\"\"/>")
    assert(evalArr(SourceProfiles.keywords(emptyKw)) === Seq(""))
    assert(evalArr(SourceProfiles.keywords(lit("<html></html>"))) === Seq())
  }

  test("top_terms: frequency desc, ties by first occurrence, stopwords out") {
    assert(evalArr(TopTerms.top_terms(
      lit("beta alpha beta alpha gamma"), 10)) ===
      Seq("beta", "alpha", "gamma"))
    // stopword table = the language-ID table; 'the'/'of' never rank
    assert(evalArr(TopTerms.top_terms(
      lit("the banks of the banks the rally banks"), 10)) ===
      Seq("banks", "rally"))
    // k caps the list; lowercasing folds case variants together
    assert(evalArr(TopTerms.top_terms(
      lit("Banks banks RALLY rally dip"), 2)) === Seq("banks", "rally"))
    assert(evalArr(TopTerms.top_terms(lit(""), 5)) === Seq())
  }

  test("useNlpKeywords prepends nlp terms before the meta merge") {
    // importNewspaperArticleData order (news_event.py:379-384):
    // newspaper keywords FIRST, then the two metas; dedupe runs over the
    // whole cleaned list, so a meta keyword already present as an nlp
    // term does not repeat
    val html = lit(
      "<meta name=\"keywords\" content=\"markets,fresh\"/>")
    val text = lit("banks banks markets rally")
    assert(evalArr(SourceProfiles.keywords(html, Some(text))) ===
      Seq("banks", "markets", "rally", "fresh"))
  }
}
