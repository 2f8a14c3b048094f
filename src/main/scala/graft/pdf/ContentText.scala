package graft.pdf

import scala.collection.mutable.ArrayBuffer
import PdfParser._

/** Content-stream text extraction: tokenizes the page content stream and
  * interprets the text-positioning/showing operators
  * (BT ET Tf Td TD TL T* Tm Tj ' \" TJ), emitting positioned words.
  * Glyph-width math is approximated (0.5 em per char), which is exact
  * enough for rect-based anchor lookup on our synthesized corpus and sane
  * on real-world single-byte-encoded PDFs.
  */
object ContentText {

  def words(content: Array[Byte], doc: Doc): Vector[Word] = {
    val out = new ArrayBuffer[Word]()
    val lex = new Lexer(content, 0)
    val stack = new ArrayBuffer[PVal]()
    // text state
    var fontSize = 12.0
    var leading = 0.0
    // text line matrix translation (we track translation only — our subset
    // never rotates/scales text)
    var lmx = 0.0; var lmy = 0.0 // line matrix
    var tx = 0.0; var ty = 0.0   // current point

    def popNum(i: Int): Double = {
      // operand i counting from the END (0 = last)
      val idx = stack.length - 1 - i
      if (idx >= 0) stack(idx) match {
        case PNum(v) => v
        case _       => 0.0
      } else 0.0
    }

    def emit(s: String): Unit = {
      if (s.nonEmpty) {
        // split the shown string into words; x advances ~0.5 em per char
        var x = tx
        val h = fontSize
        var i = 0
        val parts = s.split(" ", -1)
        parts.foreach { w =>
          if (w.nonEmpty) {
            val width = 0.5 * fontSize * w.length
            out += Word(w, x, ty, width, h)
            x += width
          }
          x += 0.5 * fontSize // the space
          i += 1
        }
        tx = x - 0.5 * fontSize
      }
    }

    var tok = lex.pos
    while (lex.pos < content.length) {
      lex.skipWs()
      if (lex.pos >= content.length) {
        tok = lex.pos
      } else {
        val c = content(lex.pos)
        if (c == '(' || c == '<' || c == '[' || c == '/' ||
          isDigit(c) || c == '+' || c == '-' || c == '.') {
          stack += lex.readValue(doc)
        } else {
          val op = lex.readToken()
          op match {
            case "BT" => lmx = 0; lmy = 0; tx = 0; ty = 0
            case "ET" => ()
            case "Tf" => fontSize = popNum(0)
            case "TL" => leading = popNum(0)
            case "Td" =>
              lmx += popNum(1); lmy += popNum(0); tx = lmx; ty = lmy
            case "TD" =>
              leading = -popNum(0)
              lmx += popNum(1); lmy += popNum(0); tx = lmx; ty = lmy
            case "Tm" =>
              lmx = popNum(1); lmy = popNum(0); tx = lmx; ty = lmy
            case "T*" => lmy -= leading; tx = lmx; ty = lmy
            case "Tj" =>
              stack.lastOption match {
                case Some(PStr(s)) => emit(s)
                case _             => ()
              }
            case "'" =>
              lmy -= leading; tx = lmx; ty = lmy
              stack.lastOption match {
                case Some(PStr(s)) => emit(s)
                case _             => ()
              }
            case "\"" =>
              lmy -= leading; tx = lmx; ty = lmy
              stack.lastOption match {
                case Some(PStr(s)) => emit(s)
                case _             => ()
              }
            case "TJ" =>
              stack.lastOption match {
                case Some(PArr(items)) =>
                  items.foreach {
                    case PStr(s) => emit(s)
                    case PNum(k) => tx -= k / 1000.0 * fontSize
                    case _       => ()
                  }
                case _ => ()
              }
            case _ => () // ignore all non-text operators
          }
          if (op.nonEmpty && op != "[" && op != "]") stack.clear()
        }
        if (tok == lex.pos) lex.pos += 1 // safety: always make progress
        tok = lex.pos
      }
    }
    out.toVector
  }

  /** Reading order with column detection: split on the largest x gap when it
    * is wide (>25% of page width) and both sides carry multiple lines — the
    * PDFBox-style layout pass named by the north star; then sort each column
    * top-to-bottom, left-to-right, grouping lines by rounded y. */
  def orderWords(ws: Vector[Word], pageWidth: Double): Vector[Vector[Word]] = {
    if (ws.isEmpty) return Vector.empty
    val columns: Vector[Vector[Word]] = {
      // coverage-gap detection: merge word x-intervals, split at the widest
      // uncovered horizontal band (> 15% of page width) when both sides hold
      // multiple lines — glyph coverage, not start positions, defines columns
      val intervals = ws.map(w => (w.x, w.x + w.w)).sortBy(_._1)
      val merged = intervals.foldLeft(Vector.empty[(Double, Double)]) {
        case (acc, (s, e)) =>
          acc.lastOption match {
            case Some((ps, pe)) if s <= pe + 1.0 =>
              acc.init :+ (ps, math.max(pe, e))
            case _ => acc :+ (s, e)
          }
      }
      var bestGap = 0.0
      var split = Double.NaN
      merged.sliding(2).foreach {
        case Vector((_, e1), (s2, _)) =>
          if (s2 - e1 > bestGap) { bestGap = s2 - e1; split = (e1 + s2) / 2 }
        case _ => ()
      }
      if (bestGap > 0.15 * math.max(pageWidth, 1.0)) {
        val left = ws.filter(_.x < split)
        val right = ws.filter(_.x >= split)
        val leftLines = left.map(w => math.round(w.y)).distinct.size
        val rightLines = right.map(w => math.round(w.y)).distinct.size
        if (leftLines >= 2 && rightLines >= 2) Vector(left, right) else Vector(ws)
      } else Vector(ws)
    }
    columns.flatMap { col =>
      col.groupBy(w => math.round(w.y)).toVector
        .sortBy { case (y, _) => -y }
        .map { case (_, line) => line.sortBy(_.x) }
    }
  }

  /** Page text: lines joined with \n, words with spaces. */
  def pageText(page: Page): String =
    orderWords(page.words, page.width)
      .map(_.map(_.text).mkString(" "))
      .mkString("\n")
}
