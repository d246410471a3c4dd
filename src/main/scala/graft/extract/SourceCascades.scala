package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DomWalk, HtmlExtract}

/** Per-source article-body extraction cascades (SURVEY.md §2.4) — the
  * reference's plugin `extractArticleBody` fallback chains, one entry per
  * news source, each rebuilt as a deterministic Scala function exposed
  * through one Catalyst expression. Fixture parity is pinned in
  * FixtureParitySpec (ecotimes 2914, timesofindia 1210, indiakanoon
  * 12287, ndtv >6000, inexp >5000, others 0 on their fixtures).
  */
object SourceCascades {

  /** mod_en_in_ecotimes.py:637-762 — five formats, first non-trivial
    * (len ≥ 5) wins. Gate conditions reproduced: format2/3/4 only fire if
    * their marker block exists (format4's trailing-space selector can
    * never match — kept for fidelity).
    */
  def ecotimes(html: String): String = {
    def f1 = { // article-body → post-text → div.Normal
      val outer = HtmlExtract.blockText(html, "div", "article-body")
      if (outer.isEmpty) ""
      else HtmlExtract.blockText(html, "div", "Normal")
    }
    def f2 = HtmlExtract.blockText(html, "article", "artData clr paywall") match {
      case "" => ""
      case _ => HtmlExtract.blockText(html, "div", "artText")
    }
    def f3 = HtmlExtract.blockParagraphText(html, "div", "main-content")
    def f4 = HtmlExtract.blockText(html, "article", "artData clr ")
    def f5 = HtmlExtract.blockText(html, "div", "artText")
    Seq(f1, f2, f3, f4, f5).find(_.length >= 5).getOrElse("")
  }

  /** mod_en_in_timesofindia.py:221-237. */
  def timesofindia(html: String): String =
    HtmlExtract.paragraphTextUntilTag(html, "div",
      "main-content single-article-content")

  /** mod_en_in_indiakanoon.py:213-251 — parent walk. */
  def indiakanoon(html: String): String = DomWalk.indiakanoonBody(html)

  /** mod_en_in_ndtv.py:259-282 — class-list paragraph scan + itemprop
    * articleBody blocks.
    */
  def ndtv(html: String): String =
    HtmlExtract.textOnlyParagraphs(html,
      Seq("ins_storybody", "content_text row description",
        "fullstoryCtrl_fulldetails")) +
      HtmlExtract.allBlocksTextByAttr(html, "span", "itemprop", "articleBody") +
      HtmlExtract.allBlocksTextByAttr(html, "div", "itemprop", "articleBody")

  /** mod_en_in_inexp_business.py:161 / mod_en_in_forbes.py:171 /
    * mod_en_in_hindu.py:182-185 — div.articlestorycontent (hindu also
    * scans p.body first).
    */
  def articleStoryContent(html: String): String =
    HtmlExtract.allBlocksText(html, "div", "articlestorycontent")

  /** mod_en_in_hindu.py:175-192: collects p.body paragraph text, then
    * UNCONDITIONALLY overwrites it with div.articlestorycontent's text
    * whenever that block EXISTS (`articleText = body_root[0].getText()`
    * runs after the paras loop) — the block has priority even when its
    * text is empty (a JS-populated empty container on a page with real
    * p.body paras must still end at "", exactly like the reference).
    */
  def hindu(html: String): String =
    if (HtmlExtract.hasBlock(html, "div", "articlestorycontent"))
      articleStoryContent(html)
    else
      // find_all('p', {"class": 'body'}) + get_text() per para — every
      // p.body ELEMENT's full subtree text, concatenated
      HtmlExtract.allBlocksText(html, "p", "body")

  /** mod_en_in_moneycontrol.py:425-433 — div.text_block text-only <p>s. */
  def moneycontrol(html: String): String =
    HtmlExtract.textOnlyParagraphs(html, Seq("text_block"))

  /** mod_en_in_livemint.py:254-258 / mod_en_in_business_std.py:185-192:
    * extractArticleBody returns "" unconditionally — config shells whose
    * body always comes from the newspaper-library path in the reference.
    */
  def emptyBody(html: String): String = ""

  /** Generic fallback (synthetic pages): div.artText. */
  def default(html: String): String =
    HtmlExtract.blockText(html, "div", "artText")

  val registry: Map[String, String => String] = Map[String, String => String](
    "ecotimes" -> (ecotimes(_)),
    "timesofindia" -> (timesofindia(_)),
    "indiakanoon" -> (indiakanoon(_)),
    "ndtv" -> (ndtv(_)),
    "inexp_business" -> (articleStoryContent(_)),
    "forbes" -> (articleStoryContent(_)),
    "hindu" -> (hindu(_)),
    "moneycontrol" -> (moneycontrol(_)),
    "livemint" -> (emptyBody(_)),
    "business_std" -> (emptyBody(_))
  ).withDefaultValue(default(_))

  /** Column API: body of `html` using the cascade for `source` (a
    * literal source name resolves the cascade at plan time; per-row
    * source dispatch uses SourceBodyExpr's binary form).
    */
  def body_text(html: Column, source: String): Column =
    ColumnBridge.column(
      SourceBodyExpr(ColumnBridge.expression(html), source))

  /** Column API with PER-ROW source dispatch: the crawl wave fetches a
    * mixed batch (many sources in one partition), so the cascade is
    * selected row-by-row from the source column — the Spark analog of
    * the reference's per-plugin `extractArticleBody` virtual call
    * (base_plugin.py:1301-1392).
    */
  def body_text_by_source(html: Column, source: Column): Column =
    ColumnBridge.column(SourceBodyDispatchExpr(
      ColumnBridge.expression(html), ColumnBridge.expression(source)))

  /** mod_en_in_ndtv.py:286-299 — extractArticleTitle: the concatenated
    * get_text() of every h1[itemprop=headline] (whitespace preserved,
    * exactly as BeautifulSoup's get_text leaves it). The only per-plugin
    * title override in the reference. Call-graph nuance kept honest: the
    * reference never invokes extractArticleTitle from its worker path
    * (the committed title comes from the newspaper library's parse,
    * news_event.py:375 setTitle) — here the override IS ndtv's title
    * source, and the generic `<title>` path stays the fallback both for
    * the other ten sources and for ndtv pages with no headline block
    * (mirroring the method's "" return).
    */
  def ndtvTitle(html: String): String =
    HtmlExtract.allBlocksTextByAttr(html, "h1", "itemprop", "headline")

  /** Per-source title overrides; sources absent here use the generic
    * `<title>` tag extraction at the call site.
    */
  val titleRegistry: Map[String, String => String] =
    Map("ndtv" -> (ndtvTitle(_)))

  /** Column API: per-row source-dispatched title override. NULL when the
    * source has no override or the override extracts "" — callers
    * coalesce with the generic `<title>` expression.
    */
  def title_by_source(html: Column, source: Column): Column =
    ColumnBridge.column(SourceTitleDispatchExpr(
      ColumnBridge.expression(html), ColumnBridge.expression(source)))

  /** Static entry points shared by interpreted eval and generated code
    * (VERDICT r04 item 8: the dispatch expressions were CodegenFallback,
    * which split the assembly projection's whole-stage span; a static
    * call keeps the span in one compiled unit — the string/regex work
    * still dominates, but the fallback plumbing disappears).
    */
  def dispatchBody(html: UTF8String, source: UTF8String): UTF8String =
    UTF8String.fromString(registry(source.toString)(html.toString))
  def dispatchBodyNamed(html: UTF8String, source: String): UTF8String =
    UTF8String.fromString(registry(source)(html.toString))
  def dispatchTitle(html: UTF8String, source: UTF8String): UTF8String =
    titleRegistry.get(source.toString) match {
      case Some(f) =>
        val t = f(html.toString)
        if (t.isEmpty) null else UTF8String.fromString(t)
      case None => null
    }
}

/** Catalyst expression dispatching to a per-source extraction cascade.
  * Codegen is a static call (the source name travels as a referenced
  * constant), so the expression stays inside the surrounding
  * whole-stage span.
  */
case class SourceBodyExpr(child: Expression, source: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    SourceCascades.dispatchBodyNamed(input.asInstanceOf[UTF8String], source)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val srcRef = ctx.addReferenceObj("source", source, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.extract.SourceCascades$$.MODULE$$.dispatchBodyNamed($c, $srcRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"body_text_$source"
}

/** Per-row dispatch for title overrides ([[SourceCascades.titleRegistry]]):
  * yields NULL (→ caller's generic fallback) for sources without an
  * override or when the override extracts nothing.
  */
case class SourceTitleDispatchExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(html: Any, source: Any): Any =
    SourceCascades.dispatchTitle(html.asInstanceOf[UTF8String],
      source.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (h, s) =>
      s"""
         |${ev.value} =
         |  graft.extract.SourceCascades$$.MODULE$$.dispatchTitle($h, $s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "title_by_source"
}

/** Per-row dispatch variant: cascade chosen from the source column. */
case class SourceBodyDispatchExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override protected def nullSafeEval(html: Any, source: Any): Any =
    SourceCascades.dispatchBody(html.asInstanceOf[UTF8String],
      source.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (h, s) =>
      s"graft.extract.SourceCascades$$.MODULE$$.dispatchBody($h, $s)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "body_text_by_source"
}
