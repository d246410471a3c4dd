package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 19 trigger-word indicator flags
  * (/root/reference/src/newslookout/plugins/mod_keywordflags.py:57-91,
  * applied via re.search over lowercased text at :124-133).
  *
  * Patterns are transcribed verbatim (including the reference's
  * idiosyncrasies — e.g. FLAG_EVENT_TAXRAID's trailing empty alternative
  * `(…|fine|)` which makes its second branch fire on any
  * `(authorit|government|court).+`). They use only alternation, classes
  * and quantifiers, so Java regex (Spark `rlike`) and RE2 (DuckDB)
  * agree. Evaluated as one codegen'd projection — no shuffle.
  */
object KeywordFlags {

  val flagRegexes: Seq[(String, String)] = Seq(
    "FLAG_EVENT_STRIKE" ->
      ("((labo[u]*r|employee.+)[ \\-]+(strike|unrest|protest|.+disrupt|.+stay away)" +
        "|strike.+violen|violen.+strike|(man.*power|union).+problem|recalcitrant labo[u]*r|" +
        "accident.+fine|union.+petition)"),
    "FLAG_EVENT_LAYOFFS" ->
      "(employee (attrition|problem)|attrition.+employee|lay[ \\-]*off)",
    "FLAG_EVENT_DIR_CHNG" ->
      "(director.+[ \\-]*appoint|appoint.+director|change of director|director change)",
    "FLAG_EVENT_FINE" ->
      "(fined|fine of|impose.+fine|(fine|penalty).+impose)",
    "FLAG_EVENT_RESIGN" ->
      ("(director.+(quit|resign|step.+down|withdraw|retire|stand aside|bow out|cessation)|" +
        "withdraw.+director)"),
    "FLAG_EVENT_CUSTSATISFY" ->
      "(customer.+dis[\\-]*satisf)",
    "FLAG_EVENT_REGULATION" ->
      ("(regulatory (impact|change)|impact of regula|duty.+(hike|increase)|" +
        "(hike|increase).+(duty|tax))"),
    "FLAG_EVENT_OBSOLETE" ->
      "(obsolete product|obsolescence|outdate.+product|product.+(outdate|obsolete))",
    "FLAG_EVENT_FRAUD" ->
      ("(fraud|funds.+(diver|siphon)|suspect.+fraud|swindl|(diver|siphon).+fund|" +
        "fraud.+audit|money launder|red flag.+acc|audit.+suspect|forensic audit)"),
    "FLAG_EVENT_TAXRAID" ->
      ("((notice|raid|penalty|sanction|puni|forfeit|trial|sentence).+" +
        "(authorit|government|court|regulat)|(authorit|government|court).+" +
        "(sanction|puni|penalty|fine|))"),
    "FLAG_EVENT_LATEPAY" ->
      "(delay.+(payment|dues|statutary)|(pay.+statutary))",
    "FLAG_EVENT_CUSTLOSS" ->
      "(los[set].+customer|customer.+cancel)",
    "FLAG_EVENT_NONCORE" ->
      ("(business.+expan.+[non\\- core]{1,}|diversif.+non[\\- ]core|incorporat|" +
        "acqui[resition]{2,}|merge|joint venture|organic grow|key opportunit|" +
        "(additional|unforeseen) cost|recall|ban order|diversif.+business)"),
    "FLAG_EVENT_DISPUTE" ->
      ("(promoter.+(dispute|disagree|feud|conflict)|(dispute|conflict|feud).+" +
        "(promoter|management|director|partner)|infight)"),
    "FLAG_EVENT_PRODREJECT" ->
      ("(consignment.+reject|product.+reject|brand value.+(diminish|low|reduc)|" +
        "withdraw.+(product|good))"),
    "FLAG_EVENT_AUDITRESIGN" ->
      "((replace|change|in place of).+audit|auditor.+(change))",
    "FLAG_EVENT_SPONSWTHDR" ->
      ("(funds.+(decline|withdraw)|(not have|no longer|has no).+funds|disinvest|" +
        "withdraw.+from.+project|delay [ofin]{2}.+subsidy|subsidy.+stop)"),
    "FLAG_EVENT_YOYCAPDEC" ->
      "(low capacity utili|capacity expansion.+(hold|stop))",
    "FLAG_EVENT_UTILDISRUPT" ->
      ("((water|electric|power|utility).+(violation|disrupt|los[st])|" +
        "pollution control|los[st].+(water|electric|power|utility))"),
    "FLAG_EVENT_PROMOTPERSLOAN" ->
      "(promoter|director|founder|partner).+(personal loan)"
  )

  /** One 0/1 column per flag (re.search ≡ rlike on the lowercased text). */
  def flagColumns(text: Column): Seq[Column] =
    flagRegexes.map { case (name, re) =>
      when(lower(text).rlike(re), 1).otherwise(0).as(name.toLowerCase)
    }

  /** The triggerwords MAP<STRING,INT> column of the article record
    * (news_event.py:184-200).
    */
  def triggerWordsMap(text: Column): Column =
    map_from_arrays(
      array(flagRegexes.map(f => lit(f._1)): _*),
      array(flagRegexes.map { case (_, re) =>
        when(lower(text).rlike(re), 1).otherwise(0)
      }: _*))
}
