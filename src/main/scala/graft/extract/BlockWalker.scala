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
      case "figure" if el.attr("data-chart").nonEmpty =>
        blocks += chartOf(el, "")
      case "a" if linkWrappedChart(el).isDefined =>
        blocks += chartOf(linkWrappedChart(el).get, UrlFix.fixUrl(el.attr("href")))
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
      e.tag == "a" && (linkWrappedImage(e).isDefined || linkWrappedChart(e).isDefined)

    walkInto(root)
    blocks.toVector
  }

  /** An <a> whose content is a single meaningful-alt <img> (and whitespace)
    * renders as a linked image block (X13 hyperlink wrap). */
  private def linkWrappedImage(a: Elem): Option[Elem] = {
    // .toVector: ArrayBuffer is mutable.Seq — the immutable Seq extractor
    // below would silently never match it (Scala 2.13)
    val significant = a.children.filter {
      case t: TextNode => t.value.exists(!_.isWhitespace)
      case _           => true
    }.toVector
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
          case c: Elem if c.tag == "td" || c.tag == "th" => cellContent(c)
        }.toVector
        if (cells.nonEmpty) rows += cells
      case e: Elem if e.tag == "thead" || e.tag == "tbody" || e.tag == "tfoot" =>
        findRows(e)
      case _ => ()
    }
    findRows(tableEl)
    rows.toVector
  }

  /** Cell content with list bulletization (content_extractor.py:344-360):
    * bullet paragraphs render as `"  "*level + "• " + text`, other
    * paragraphs as plain clean text, all joined with a single space. */
  private def cellContent(c: Elem): String = {
    val hasList = c.children.exists {
      case e: Elem => e.tag == "ul" || e.tag == "ol"
      case _       => false
    }
    if (!hasList) return Runs.paragraphOf(c).map(_.cleanText).getOrElse("")
    val parts = Vector.newBuilder[String]
    Runs.paragraphOf(c, stopAtNestedLists = true)
      .foreach(p => parts += p.cleanText)
    c.children.foreach {
      case e: Elem if e.tag == "ul" || e.tag == "ol" =>
        listParagraphs(e, 0).foreach { p =>
          parts += (if (p.hints.isBullet)
            ("  " * math.max(0, p.hints.bulletLevel)) + "• " + p.cleanText
          else p.cleanText)
        }
      case _ => ()
    }
    parts.result().filter(_.nonEmpty).mkString(" ")
  }

  /** X14 chart parse: `<figure data-chart="TYPE">` with optional
    * `<figcaption>` title and a data table whose header row carries the
    * categories (first cell is the series-name column header) and whose
    * body rows are one series each: name cell + value cells. */
  def chartOf(fig: Elem, hyperlink: String): ChartBlock = {
    val chartType = fig.attr("data-chart")
    val title = fig.find("figcaption")
      .flatMap(Runs.paragraphOf(_)).map(_.cleanText).getOrElse("")
    val data = fig.find("table").map(tableData).getOrElse(Vector.empty)
    val categories = data.headOption.map(_.drop(1)).getOrElse(Vector.empty)
    val series = data.drop(1).collect {
      case row if row.nonEmpty => ChartSeries(row.head, row.tail)
    }
    ChartBlock("other", chartType, title, categories, series, hyperlink)
  }

  /** An <a> whose content is a single `<figure data-chart>` (and whitespace)
    * renders as a hyperlink-wrapped chart (markdown_converter.py:323-325). */
  private def linkWrappedChart(a: Elem): Option[Elem] = {
    val significant = a.children.filter {
      case t: TextNode => t.value.exists(!_.isWhitespace)
      case _           => true
    }.toVector
    significant match {
      case Seq(fig: Elem) if fig.tag == "figure" &&
        fig.attr("data-chart").nonEmpty => Some(fig)
      case _ => None
    }
  }
}
