package graft.pdf

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Deterministic minimal PDF writer for the synthetic corpus (FIXTURES.md §3
  * "%PDF- payloads: 1-2 pages, 1-2 columns, link annotations, inline
  * https:// urls in text"). Classic xref table, uncompressed content
  * streams, one Type1 font. Layout: letter page, 72pt margins, 14pt lines.
  */
object PdfGen {

  final case class PdfLink(rect: (Double, Double, Double, Double), uri: String)
  final case class PdfPage(lines: Seq[(Double, Double, String)], links: Seq[PdfLink])

  private def escStr(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** locale-independent fixed-point formatting (f"" uses default locale). */
  private def d1(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

  /** Build a PDF from pages of positioned lines, with an optional
    * document information dictionary (trailer /Info: Title/Author/
    * CreationDate/ModDate — dates as literal `D:YYYYMMDDHHmmSSZ` strings). */
  def build(pages: Seq[PdfPage], title: String = "", author: String = "",
      creationDate: String = "", modDate: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def write(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))

    write("%PDF-1.4\n")
    val nPages = pages.size
    // object numbering: 1=catalog, 2=pages, then per page: page, contents,
    // [annots...] ; font is the last object
    val pageObjBase = 3
    val objsPerPage = 2
    val annotBase = pageObjBase + nPages * objsPerPage
    val nAnnots = pages.map(_.links.size).sum
    val fontObj = annotBase + nAnnots
    val hasInfo = title.nonEmpty || author.nonEmpty ||
      creationDate.nonEmpty || modDate.nonEmpty
    val infoObj = fontObj + 1

    def obj(num: Int)(body: => Unit): Unit = {
      offsets += out.size()
      write(s"$num 0 obj\n")
      body
      write("endobj\n")
    }

    obj(1) { write(s"<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) {
      val kids = (0 until nPages).map(i => s"${pageObjBase + i * objsPerPage} 0 R").mkString(" ")
      write(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\n")
    }
    var annotNum = annotBase
    pages.zipWithIndex.foreach { case (p, i) =>
      val pageObj = pageObjBase + i * objsPerPage
      val contObj = pageObj + 1
      val annotRefs =
        if (p.links.isEmpty) ""
        else "/Annots [ " + p.links.indices.map(j => s"${annotNum + j} 0 R").mkString(" ") + " ] "
      obj(pageObj) {
        write(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
          annotRefs + s"/Contents $contObj 0 R >>\n")
      }
      val content = {
        val sb = new StringBuilder("BT\n/F1 11 Tf\n")
        p.lines.foreach { case (x, y, text) =>
          sb.append(s"1 0 0 1 ${d1(x)} ${d1(y)} Tm (${escStr(text)}) Tj\n")
        }
        sb.append("ET\n")
        sb.toString
      }
      obj(contObj) {
        write(s"<< /Length ${content.length} >>\nstream\n")
        write(content)
        write("\nendstream\n")
      }
      annotNum += p.links.size
    }
    // annotation objects
    var aNum = annotBase
    pages.foreach { p =>
      p.links.foreach { l =>
        val (x0, y0, x1, y1) = l.rect
        obj(aNum) {
          write(s"<< /Type /Annot /Subtype /Link /Rect [${d1(x0)} ${d1(y0)} ${d1(x1)} ${d1(y1)}] " +
            s"/Border [0 0 0] /A << /S /URI /URI (${escStr(l.uri)}) >> >>\n")
        }
        aNum += 1
      }
    }
    obj(fontObj) {
      write("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n")
    }
    if (hasInfo) obj(infoObj) {
      val t = if (title.nonEmpty) s"/Title (${escStr(title)}) " else ""
      val a = if (author.nonEmpty) s"/Author (${escStr(author)}) " else ""
      val c = if (creationDate.nonEmpty) s"/CreationDate (${escStr(creationDate)}) " else ""
      val m = if (modDate.nonEmpty) s"/ModDate (${escStr(modDate)}) " else ""
      write(s"<< $t$a$c$m>>\n")
    }

    val xrefPos = out.size()
    val total = (if (hasInfo) infoObj else fontObj) + 1
    write(s"xref\n0 $total\n")
    write("0000000000 65535 f \n")
    offsets.foreach(o => write(f"$o%010d 00000 n \n"))
    val infoRef = if (hasInfo) s" /Info $infoObj 0 R" else ""
    write(s"trailer\n<< /Size $total /Root 1 0 R$infoRef >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Deterministic synthetic PDF for the corpus: 2 pages, page 2 two-column,
    * a link annotation on page 1, inline URL on page 2. */
  def synthPdf(docId: Long, words: Array[String]): (Array[Byte], String) = {
    def take(n: Int, off: Int): String =
      (0 until n).map(i => words((off + i) % words.length)).mkString(" ")

    val top = 720.0
    val lh = 14.0
    // page 1: single column + link annotation around line 3 + inline URL
    val p1Lines = (0 until 6).map(i => (72.0, top - i * lh, take(6, i * 3))) :+
      ((72.0, top - 7 * lh,
        s"see https://inline-${docId % 100}.example.com/path for details"))
    val linkedLineY = top - 2 * lh
    val link = PdfLink((72, linkedLineY - 2, 72 + 150, linkedLineY + 10),
      s"https://annot-${docId % 100}.example.org/ref")
    // page 2: pure two-column layout (column-detection path)
    val leftCol = (0 until 5).map(i => (72.0, top - i * lh, take(4, 7 + i)))
    val rightCol = (0 until 5).map(i => (340.0, top - i * lh, take(4, 19 + i)))
    def cap(w: String): String =
      if (w.isEmpty) w else w.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + w.substring(1)
    val pdf = build(Seq(
      PdfPage(p1Lines, Seq(link)),
      PdfPage(leftCol ++ rightCol, Nil)),
      title = s"${cap(take(3, 0))} - doc $docId",
      author = s"Synth Author ${docId % 97}",
      // deterministic D:-format dates (M1 PDF date passthrough)
      creationDate = f"D:2021${docId % 9 + 1}%02d${docId % 28 + 1}%02d120000Z",
      modDate = f"D:2022${docId % 9 + 1}%02d${docId % 28 + 1}%02d093000Z")
    // the plain-text fallback rendering (reading order)
    val plain = (p1Lines.map(_._3) ++ leftCol.map(_._3) ++ rightCol.map(_._3))
      .mkString("\n")
    (pdf, plain)
  }
}
