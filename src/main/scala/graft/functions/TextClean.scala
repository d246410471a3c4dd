package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning column pipeline (SURVEY.md §2.3 P7–P10, P15).
  *
  * Behavioral rebuild of the reference's ordered character-substitution
  * chain (`/root/reference/src/newslookout/news_event.py:259-314`) and the
  * sentence-gap / repeated-char fixers
  * (`/root/reference/src/newslookout/scraper_utils.py:259-297`).
  *
  * Everything here is pure Catalyst (`replace`/`regexp_replace`/
  * `translate`), i.e. whole-stage-codegen friendly and fully distributed:
  * at 100 TB these run inside the scan stage with zero shuffle.
  * Replacement ORDER is part of the spec (e.g. the `â€™` mojibake sequence
  * must be replaced before the lone `â`), so the chain is a Seq applied
  * left-to-right.
  */
object TextClean {

  /** Literal (non-regex) replace — codegen'd StringReplace. */
  private def rep(c: Column, search: String, replace: String): Column =
    call_function("replace", c, lit(search), lit(replace))

  /** Ordered literal substitutions (news_event.py:274-297).
    * First block replaces mojibake/specials with spaces, second block
    * swaps abbreviation/currency/dash/quote characters.
    */
  val orderedSubstitutions: Seq[(String, String)] = Seq(
    // replaceWithSpaces block
    "â€™" -> " ", // "â€™" mojibake — MUST precede lone "â"
    "🙂" -> " ",       // U+1F642 slightly-smiling face
    "â" -> " ",             // â
    "™" -> " ",             // ™
    "\t" -> " ",
    // specific alternates
    " Addl. " -> " Additional ",
    " M/s." -> " Messers",
    " m/s." -> " Messers",
    " Rs." -> " Rupees ",
    "₹" -> " Rupees ",      // ₹
    "$" -> " Dollars ",
    "€" -> " Euros ",       // €
    "—" -> "-",             // em-dash
    "–" -> "-",             // en-dash
    "’" -> "'",             // ’
    "‘" -> "'",             // ‘
    "”" -> "'",             // ”
    "“" -> "'",             // “
    "​" -> "'"              // zero-width space (reference maps it to ')
  )

  /** Second replaceWithSpaces block (news_event.py:303-309): a fixed list
    * of Devanagari characters plus stray control/latin-1 bytes → space.
    * Each is a single BMP char mapped to ' ', so one `translate` call is
    * equivalent to the reference's sequential replaces. U+200B appears in
    * both reference blocks; by then it is already gone (mapped to '), so
    * listing it here is a no-op kept for fidelity. U+1F642 is a surrogate
    * pair and cannot go through `translate`; it is already handled above.
    */
  val charsToSpace: String =
    "कयसचुाआबंगथ" +
      "मणरईदलअभतपउ" +
      "जोी​àª"

  /** fixSentenceGaps (scraper_utils.py:259-282): insert a space after a
    * full-stop gluing two sentences: `morning.A total` → `morning. A total`.
    */
  def fixSentenceGaps(c: Column): Column =
    regexp_replace(c, "(\\b[a-zA-Z]{2,})(\\.)([A-Z][a-zA-Z])", "$1$2 $3")

  /** filterRepeatedchars (scraper_utils.py:285-297): collapse runs of each
    * char to one occurrence. The reference's fixed-point pairwise replace
    * is equivalent to a single run-collapse regex per char (and for the
    * two-char sequence "\r\n", a run-collapse of the pair).
    */
  def collapseRepeats(c: Column, chars: Seq[String]): Column =
    chars.foldLeft(c) { (acc, ch) =>
      regexp_replace(acc, "(?:" + java.util.regex.Pattern.quote(ch) + "){2,}", ch)
    }

  /** Default repeated-char list used by plugin checkAndCleanText
    * (e.g. mod_en_in_ecotimes.py:779).
    */
  val defaultRepeatChars: Seq[String] = Seq(" ", "\t", "\n", "\r\n", "-", "_", ".")

  /** clean_non_utf8 (scraper_utils.py:132-151): UTF-8 round-trip with
    * replacement — scrubs unpaired surrogates exactly like Python's
    * errors='replace'.
    */
  def cleanNonUtf8(c: Column): Column = decode(encode(c, "UTF-8"), "UTF-8")

  /** Full NewsEvent.cleanText (news_event.py:259-314):
    * ordered substitutions → clean_non_utf8 → char-list spaces →
    * fixSentenceGaps → trim.
    */
  def cleanText(c: Column): Column = {
    val substituted = orderedSubstitutions.foldLeft(c) {
      case (acc, (s, r)) => rep(acc, s, r)
    }
    val utf8ed = cleanNonUtf8(substituted)
    val spaced = translate(utf8ed, charsToSpace, " " * charsToSpace.length)
    trim(fixSentenceGaps(spaced))
  }

  /** removeStartTrailQuotes (scraper_utils.py:154-161): Python
    * `.strip('"').strip("'")` — all leading/trailing `"` first, then all
    * leading/trailing `'`.
    */
  def removeStartTrailQuotes(c: Column): Column =
    regexp_replace(regexp_replace(c, "^\"+|\"+$", ""), "^'+|'+$", "")

  /** cutStrBetweenTags (scraper_utils.py:300-312): substring strictly
    * between the first startTag and the next endTag; empty string if
    * either is absent.
    */
  def cutBetween(c: Column, startTag: String, endTag: String): Column = {
    val startPos = locate(startTag, c) // 1-based; 0 = not found
    val afterStart = c.substr(startPos + lit(startTag.length), length(c))
    val endPos = locate(endTag, afterStart)
    when(startPos > 0 && endPos > 0, afterStart.substr(lit(1), endPos - 1))
      .otherwise(lit(""))
  }
}
