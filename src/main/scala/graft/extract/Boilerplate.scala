package graft.extract

import graft.html.{Elem, Node, TextNode}

/** Boilerplate-vs-content classification for DOM blocks — the web analog of
  * the reference's meaningless-shape filter (content_extractor.py:255-300, P3)
  * using the Boilerpipe-style word/link-density math the reference applies in
  * its text-density scorer (diagram_analyzer.py:584-618, A5).
  *
  * Deterministic rules (order matters):
  *  1. tag in {nav, footer, aside} -> boilerplate (structural furniture)
  *  2. class/id contains a furniture token (nav, menu, footer, sidebar,
  *     breadcrumb, cookie, banner, advert/ad, social, share, related,
  *     comment, pagination, skip) -> boilerplate
  *  3. link-density rule: for container blocks, if >50% of the subtree's
  *     visible characters sit inside <a> AND the subtree has <50 words,
  *     it is link furniture -> boilerplate
  */
object Boilerplate {
  private val boilerTags = Set("nav", "footer", "aside")
  private val furnitureToken =
    ("(?i)(?:^|[\\s_-])(?:nav|navbar|menu|footer|sidebar|breadcrumbs?|cookie|banner|" +
      "advert(?:isement)?|ads?|social|share|sharing|related|comments?|pagination|skip)(?:$|[\\s_-])").r
  private val containerTags = Set("div", "section", "ul", "ol", "table", "header")

  def isBoilerplate(el: Elem): Boolean = {
    if (boilerTags.contains(el.tag)) return true
    if (el.attrs.nonEmpty) {
      val marker = el.attr("class") + " " + el.attr("id")
      if (marker.trim.nonEmpty && furnitureToken.findFirstIn(marker).isDefined)
        return true
    }
    if (containerTags.contains(el.tag)) {
      val (total, inLink, words) = charCounts(el)
      if (total > 0) {
        if (inLink.toDouble / total > 0.5 && words < 50) return true
      }
    }
    false
  }

  /** (visible chars, visible chars under an <a>, word count) in ONE subtree
    * traversal — no intermediate string materialization. Aborts as soon as
    * the word count reaches 50: past that the link-density rule can never
    * fire, which bounds the cost of re-checking every nesting level of a
    * deep content container chain to O(50 words) per level instead of
    * O(subtree) (the walker calls this once per container element). */
  private def charCounts(el: Elem): (Int, Int, Int) = {
    var total = 0
    var linked = 0
    var words = 0
    def go(n: Node, inA: Boolean): Boolean = n match { // false = aborted
      case t: TextNode =>
        val v = t.value
        var i = 0
        var inWord = false
        while (i < v.length) {
          val c = v.charAt(i)
          if (!Character.isWhitespace(c)) {
            total += 1
            if (inA) linked += 1
            if (!inWord) {
              words += 1
              if (words >= 50) return false
            }
            inWord = true
          } else inWord = false
          i += 1
        }
        true
      case e: Elem =>
        e.tag match {
          case "script" | "style" | "template" | "noscript" => true
          case "a" => e.children.forall(go(_, inA = true))
          case _   => e.children.forall(go(_, inA))
        }
      case _ => true
    }
    go(el, inA = false)
    (total, linked, words)
  }
}
