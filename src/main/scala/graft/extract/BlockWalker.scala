package graft.extract

import scala.collection.mutable.ArrayBuffer
import graft.html.{Elem, Node, TextNode}
import graft.model._

/** DOM -> ordered content blocks, the web analog of the reference's
  * slide -> shape-tree walk (accessibility_extractor_v2.py:321-379 document
  * order; content_extractor.py:17-100 block building). Document order IS
  * reading order (O1); no semantic reordering is applied to web pages — the
  * reference's O2 reorder is a placeholder-name quirk with no DOM analog.
  */
object BlockWalker {
  private val skipTags = Set("script", "style", "template", "noscript", "head",
    "meta", "link", "base", "iframe", "svg", "canvas", "video", "audio",
    "object", "embed", "button", "input", "select", "option", "textarea",
    "label", "form", "hr")
  private val inlineTags = Set("a", "b", "strong", "i", "em", "span", "code",
    "small", "sup", "sub", "u", "s", "abbr", "time", "mark", "cite", "q",
    "kbd", "samp", "var", "br", "wbr", "bdi", "bdo", "data", "dfn", "ins", "del")
  private val containerTags = Set("div", "section", "article", "main", "body",
    "figure", "figcaption", "details", "summary", "header", "blockquote",
    "address", "fieldset", "center", "font", "dl", "dt", "dd")

  def walk(root: Elem): Vector[Block] = {
    val blocks = new ArrayBuffer[Block]()
    val pending = new ArrayBuffer[Node]() // loose inline content buffer

    def flushPending(): Unit = {
      if (pending.nonEmpty) {
        val synth = new Elem("p", Map.empty)
        synth.children ++= pending
        pending.clear()
        Runs.paragraphOf(synth).foreach(p => blocks += TextBlock("content", Vector(p)))
      }
    }

    def handle(el: Elem): Unit = el.tag match {
      case t if skipTags.contains(t) => ()
      case t if Boilerplate.isBoilerplate(el) => ()
      case "h1" =>
        Runs.paragraphOf(el).foreach(p => blocks += TextBlock("title", Vector(p)))
      case "h2" =>
        Runs.paragraphOf(el).foreach(p => blocks += TextBlock("subtitle", Vector(p)))
      case "h3" | "h4" | "h5" | "h6" =>
        Runs.paragraphOf(el).foreach { p =>
          blocks += TextBlock("content",
            Vector(p.copy(hints = p.hints.copy(likelyHeading = true))))
        }
      case "p" =>
        Runs.paragraphOf(el).foreach(p => blocks += TextBlock("content", Vector(p)))
      case "pre" =>
        Runs.paragraphOf(el, verbatim = true)
          .foreach(p => blocks += TextBlock("content", Vector(p)))
      case "ul" | "ol" =>
        val paras = listParagraphs(el, 0)
        if (paras.nonEmpty) blocks += TextBlock("content", paras)
      case "table" =>
        val data = tableData(el)
        if (data.nonEmpty) blocks += TableBlock("other", data)
      case "img" =>
        val alt = el.attr("alt")
        if (Markdown.hasMeaningfulAltText(alt))
          blocks += ImageBlock("other", alt.trim, "")
      case "a" if linkWrappedImage(el).isDefined =>
        val img = linkWrappedImage(el).get
        blocks += ImageBlock("other", img.attr("alt").trim, UrlFix.fixUrl(el.attr("href")))
      case t if containerTags.contains(t) => walkInto(el)
      case t if inlineTags.contains(t) => pending += el
      case _ => walkInto(el) // unknown tags: recurse, err on inclusion
        // (content_extractor.py:289-300: "err on the side of inclusion")
    }

    def walkInto(el: Elem): Unit = {
      el.children.foreach {
        case t: TextNode =>
          if (t.value.exists(!_.isWhitespace)) pending += t
        case e: Elem if inlineTags.contains(e.tag) && !isBlockImageAnchor(e) =>
          pending += e
        case e: Elem =>
          flushPending()
          handle(e)
      }
      flushPending()
    }

    def isBlockImageAnchor(e: Elem): Boolean =
      e.tag == "a" && linkWrappedImage(e).isDefined

    walkInto(root)
    blocks.toVector
  }

  /** An <a> whose content is a single meaningful-alt <img> (and whitespace)
    * renders as a linked image block (X13 hyperlink wrap). */
  private def linkWrappedImage(a: Elem): Option[Elem] = {
    val significant = a.children.filter {
      case t: TextNode => t.value.exists(!_.isWhitespace)
      case _           => true
    }
    significant match {
      case Seq(img: Elem) if img.tag == "img" &&
        Markdown.hasMeaningfulAltText(img.attr("alt")) => Some(img)
      case _ => None
    }
  }

  /** <li> items (nested lists flatten in document order, level = nesting
    * depth) — the analog of bullet-level resolution X3-X5
    * (text_processor.py:193-285): <li> nesting depth is the level, <ol>
    * ancestry means numbered. */
  def listParagraphs(listEl: Elem, level: Int): Vector[Paragraph] = {
    val numbered = listEl.tag == "ol"
    listEl.children.toVector.flatMap {
      case li: Elem if li.tag == "li" =>
        val own = Runs.paragraphOf(li,
          isBullet = !numbered, isNumbered = numbered,
          bulletLevel = if (numbered) -1 else level,
          stopAtNestedLists = true)
        val nested = li.children.toVector.flatMap {
          case e: Elem if e.tag == "ul" || e.tag == "ol" =>
            listParagraphs(e, level + 1)
          case _ => Vector.empty
        }
        own.toVector ++ nested
      case _ => Vector.empty
    }
  }

  /** Table rows in document order; cell text is the normalized inline text
    * (content_extractor.py:334-366 analog: list-of-rows of strings). */
  def tableData(tableEl: Elem): Vector[Vector[String]] = {
    val rows = new ArrayBuffer[Vector[String]]()
    def findRows(el: Elem): Unit = el.children.foreach {
      case e: Elem if e.tag == "tr" =>
        val cells = e.children.collect {
          case c: Elem if c.tag == "td" || c.tag == "th" =>
            Runs.paragraphOf(c).map(_.cleanText).getOrElse("")
        }.toVector
        if (cells.nonEmpty) rows += cells
      case e: Elem if e.tag == "thead" || e.tag == "tbody" || e.tag == "tfoot" =>
        findRows(e)
      case _ => ()
    }
    findRows(tableEl)
    rows.toVector
  }
}
