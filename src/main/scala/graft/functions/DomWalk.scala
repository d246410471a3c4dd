package graft.functions

import scala.collection.mutable

import org.apache.commons.text.StringEscapeUtils

/** Minimal HTML DOM + the indiakanoon parent-walk body extraction
  * (/root/reference/src/newslookout/plugins/mod_en_in_indiakanoon.py:213-251).
  *
  * The reference finds div.docsource_main, then walks its PARENT's direct
  * children with three behaviors:
  *  - text node            → text with newlines→spaces
  *  - tag with >1 children and no ad_doc class
  *                         → "\n" + (" \n " + child-text) per child
  *  - any other tag        → its children spliced in raw (tags
  *                           re-serialized as markup, text as text)
  * and finally joins every item as " " + item.strip().
  *
  * Parity target: len == 12287 on fixture indiakanoon_49865912
  * (test_mod_en_in_indiakanoon.py:135), asserted in FixtureParitySpec.
  */
object DomWalk {

  sealed trait Node
  final case class Text(s: String) extends Node
  final case class Elem(name: String, attrs: Map[String, String],
                        children: mutable.ArrayBuffer[Node],
                        raw: String) extends Node

  private val VoidTags = Set("br", "img", "hr", "meta", "input", "link",
    "area", "base", "col", "embed", "source", "track", "wbr")

  private val tagRe =
    java.util.regex.Pattern.compile("(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>|<!--.*?-->")

  private val attrRe = java.util.regex.Pattern.compile(
    "([a-zA-Z_:][-a-zA-Z0-9_:.]*)\\s*(?:=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]*)))?")

  private def parseAttrs(s: String): Map[String, String] = {
    val m = attrRe.matcher(s)
    val b = Map.newBuilder[String, String]
    while (m.find()) {
      val v = Option(m.group(3)).orElse(Option(m.group(4)))
        .orElse(Option(m.group(5))).getOrElse("")
      b += m.group(1).toLowerCase -> v
    }
    b.result()
  }

  /** Parse the balanced block starting at the open tag at `start` into a
    * tree. Tag/attr names lowercased (lxml behavior); comments dropped;
    * raw source retained per element for the reference's str(Tag) splice.
    */
  def parseBlock(html: String, start: Int): Option[Elem] = {
    val m = tagRe.matcher(html)
    m.region(start, html.length)
    if (!m.find() || m.group(2) == null || m.group(1).nonEmpty) return None
    val rootName = m.group(2).toLowerCase
    val root = Elem(rootName, parseAttrs(Option(m.group(3)).getOrElse("")),
      mutable.ArrayBuffer(), "")
    val stack = mutable.Stack[Elem](root)
    val startOffsets = mutable.Stack[Int](start)
    var lastEnd = m.end()
    var result: Option[Elem] = None
    while (result.isEmpty && m.find()) {
      // text between tags goes to the current element
      if (m.start() > lastEnd && stack.nonEmpty)
        stack.top.children += Text(html.substring(lastEnd, m.start()))
      if (m.group(2) != null) {
        val name = m.group(2).toLowerCase
        val attrsStr = Option(m.group(3)).getOrElse("")
        if (m.group(1).isEmpty) { // open
          val selfClosing = attrsStr.trim.endsWith("/") || VoidTags(name)
          val e = Elem(name, parseAttrs(attrsStr), mutable.ArrayBuffer(),
            if (selfClosing) html.substring(m.start(), m.end()) else "")
          stack.top.children += e
          if (!selfClosing) { stack.push(e); startOffsets.push(m.start()) }
        } else { // close
          // pop until matching name (lenient recovery for stray closes)
          if (stack.exists(_.name == name)) {
            var done = false
            while (!done && stack.nonEmpty) {
              val e = stack.pop()
              val s0 = startOffsets.pop()
              val withRaw = e.copy(raw = html.substring(s0, m.end()))
              // patch the parent's reference (children hold the old one)
              if (stack.nonEmpty) {
                val idx = stack.top.children.lastIndexWhere(_ eq e)
                if (idx >= 0) stack.top.children(idx) = withRaw
                else () // shouldn't happen
              }
              if (e.name == name) {
                done = true
                if (stack.isEmpty) result = Some(withRaw)
              }
            }
          } // else ignore stray close
        }
      }
      lastEnd = m.end()
    }
    result.orElse(Some(root))
  }

  /** Find the Nth element with `cls` among its class tokens and return
    * (that element, its parent) inside a freshly parsed tree rooted at
    * the nearest enclosing parseable block.
    */
  def findWithParent(root: Elem, cls: String): Option[(Elem, Elem)] = {
    def rec(e: Elem): Option[(Elem, Elem)] = {
      e.children.collectFirst {
        case c: Elem if c.attrs.get("class").exists(
          _.split("\\s+").contains(cls)) => (c, e)
      }.orElse {
        e.children.collectFirst {
          case c: Elem if rec(c).isDefined => rec(c).get
        }
      }
    }
    rec(root)
  }

  /** getText: all descendant text, entities decoded. */
  def getText(n: Node): String = n match {
    case Text(s) => StringEscapeUtils.unescapeHtml4(s.replace("&apos;", "'"))
    case e: Elem => e.children.map(getText).mkString
  }

  /** str(NavigableString) / str(Tag): text verbatim (decoded) or the raw
    * markup of the element.
    */
  private def strOf(n: Node): String = n match {
    case Text(s) => StringEscapeUtils.unescapeHtml4(s.replace("&apos;", "'"))
    case e: Elem => e.raw
  }

  /** The get_child_tags walk over `parent`'s direct children
    * (mod_en_in_indiakanoon.py:230-251).
    */
  def childWalk(parent: Elem): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    parent.children.foreach {
      case Text(s) =>
        out += StringEscapeUtils.unescapeHtml4(s.replace("&apos;", "'"))
          .replace("\n", " ")
      case e: Elem
        if !e.attrs.get("class").exists(_.split("\\s+").contains("ad_doc")) &&
          e.children.length > 1 =>
        val sb = new StringBuilder("\n")
        e.children.foreach { sub =>
          sb.append(" \n ").append(sub match {
            case t: Text => StringEscapeUtils.unescapeHtml4(
              t.s.replace("&apos;", "'"))
            case el: Elem => getText(el)
          })
        }
        out += sb.toString
      case e: Elem =>
        e.children.foreach(c => out += strOf(c))
    }
    out.toSeq
  }

  /** extractArticleBody (mod_en_in_indiakanoon.py:213-227): body =
    * Σ (" " + item.strip()) over the walk items.
    */
  def indiakanoonBody(html: String): String = {
    // parse from the element ENCLOSING docsource_main: locate the marker,
    // then parse from the nearest '<div' at or before the enclosing
    // parent. Simpler: parse the whole <body> block.
    val bodyStart = html.toLowerCase.indexOf("<body")
    val start = if (bodyStart >= 0) bodyStart else 0
    parseBlock(html, start).flatMap { root =>
      findWithParent(root, "docsource_main").map { case (_, parent) =>
        val sb = new StringBuilder
        childWalk(parent).foreach(item => sb.append(" ").append(item.strip()))
        sb.toString
      }
    }.getOrElse("")
  }
}
