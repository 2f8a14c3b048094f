package graft.extract

import graft.model._

/** Markdown assembly — exact ports of the reference's converters
  * (src/processors/powerpoint/markdown_converter.py):
  *  - emphasis/link assembly         :206-270 (X9)
  *  - paragraph structure            :121-155 (X10)
  *  - title/subtitle headings        : 84-119 (X11)
  *  - table with pipe escaping       :272-287 (X12)
  *  - image                          :289-298 (X13)
  * All separators are byte-exact ("\n" between paragraphs :113, "\n\n"
  * between blocks :65) — the golden-output invariant depends on them.
  */
object Markdown {

  /** Port of `_build_formatted_text_from_runs` (markdown_converter.py:206-270),
    * including its quirks: uniform bold/italic suppresses differing hyperlinks;
    * the per-run path iterates the ORIGINAL run list skipping empties.
    */
  def buildFormattedText(runs: Vector[Run], cleanText: String): String = {
    if (runs.isEmpty) return cleanText
    val textRuns = runs.filter(_.text.nonEmpty)
    if (textRuns.isEmpty) return cleanText

    val allBold = textRuns.forall(_.bold)
    val allItalic = textRuns.forall(_.italic)
    val allHaveLinks = textRuns.forall(_.hyperlink.nonEmpty)
    val allSameLink = allHaveLinks && textRuns.map(_.hyperlink).distinct.size == 1

    if (allBold && allItalic && !allSameLink) s"***$cleanText***"
    else if (allBold && !allSameLink) s"**$cleanText**"
    else if (allItalic && !allSameLink) s"*$cleanText*"
    else if (allSameLink) {
      val link = textRuns.head.hyperlink
      if (allBold && allItalic) s"[***$cleanText***]($link)"
      else if (allBold) s"[**$cleanText**]($link)"
      else if (allItalic) s"[*$cleanText*]($link)"
      else s"[$cleanText]($link)"
    } else {
      val sb = new StringBuilder
      runs.foreach { run =>
        if (run.text.nonEmpty) {
          var t = run.text
          if (run.bold && run.italic) t = s"***$t***"
          else if (run.bold) t = s"**$t**"
          else if (run.italic) t = s"*$t*"
          if (run.hyperlink.nonEmpty) t = s"[$t](${run.hyperlink})"
          sb.append(t)
        }
      }
      sb.toString
    }
  }

  /** Port of `_convert_paragraph_to_markdown` (markdown_converter.py:121-155). */
  def paragraphToMarkdown(p: Paragraph): String = {
    if (p.cleanText.isEmpty) return ""
    val formatted = buildFormattedText(p.runs, p.cleanText)
    val h = p.hints
    if (h.isBullet) {
      val level = math.max(0, h.bulletLevel)
      ("  " * level) + "- " + formatted
    } else if (h.isNumbered) "1. " + formatted
    else if (h.likelyHeading) {
      if (h.allCaps || p.cleanText.length < 30) "## " + formatted
      else "### " + formatted
    } else formatted
  }

  /** Port of `_convert_text_block_to_markdown` (markdown_converter.py:70-119):
    * role title -> "# ", subtitle -> "## ", else per-paragraph; paragraphs
    * joined with "\n".
    */
  def textBlockToMarkdown(b: TextBlock): String = {
    val lines: Vector[String] = b.role match {
      case "title" =>
        b.paragraphs.collect {
          case p if p.cleanText.nonEmpty => "# " + buildFormattedText(p.runs, p.cleanText)
        }
      case "subtitle" =>
        b.paragraphs.collect {
          case p if p.cleanText.nonEmpty => "## " + buildFormattedText(p.runs, p.cleanText)
        }
      case _ =>
        b.paragraphs.map(paragraphToMarkdown).filter(_.nonEmpty)
    }
    lines.mkString("\n")
  }

  /** Port of `_convert_table_to_markdown` (markdown_converter.py:272-287):
    * pipes escaped as "\|", "---" separator row after row 0, trailing "\n". */
  def tableToMarkdown(b: TableBlock): String = {
    if (b.data.isEmpty) return ""
    val sb = new StringBuilder
    b.data.zipWithIndex.foreach { case (row, i) =>
      val escaped = row.map(_.replace("|", "\\|"))
      sb.append("| ").append(escaped.mkString(" | ")).append(" |\n")
      if (i == 0)
        sb.append("| ").append(row.map(_ => "---").mkString(" | ")).append(" |\n")
    }
    sb.toString
  }

  /** Port of `_convert_image_to_markdown` (markdown_converter.py:289-298). */
  def imageToMarkdown(b: ImageBlock): String = {
    val img = s"![${b.altText}](image)"
    if (b.hyperlink.nonEmpty) s"[$img](${b.hyperlink})" else img
  }

  /** Port of `_convert_chart_to_markdown` (markdown_converter.py:300-326):
    * title/type header lines, "Data:" with first-5 values per named series
    * and a bare "..." truncation suffix, the `<!-- DIAGRAM_CANDIDATE -->`
    * marker, and the (quirky, multi-line) hyperlink wrap — all verbatim. */
  def chartToMarkdown(b: ChartBlock): String = {
    val sb = new StringBuilder
    sb.append(s"**Chart: ${b.title}**\n")
    sb.append(s"*Chart Type: ${b.chartType}*\n\n")
    if (b.categories.nonEmpty && b.series.nonEmpty) {
      sb.append("Data:\n")
      b.series.foreach { s =>
        if (s.name.nonEmpty) {
          sb.append(s"- ${s.name}: ")
          sb.append(s.values.take(5).mkString(", "))
          if (s.values.length > 5) sb.append("...")
          sb.append("\n")
        }
      }
    }
    sb.append(s"\n<!-- DIAGRAM_CANDIDATE: chart, type=${b.chartType} -->\n")
    if (b.hyperlink.nonEmpty) s"[${sb.toString}](${b.hyperlink})" else sb.toString
  }

  def blockToMarkdown(b: Block): String = b match {
    case t: TextBlock  => textBlockToMarkdown(t)
    case t: TableBlock => tableToMarkdown(t)
    case i: ImageBlock => imageToMarkdown(i)
    case c: ChartBlock => chartToMarkdown(c)
  }

  /** Port of `_has_meaningful_alt_text` (content_extractor.py:158-213):
    * generic/auto-generated alt text is dropped. Patterns verbatim. */
  private val meaninglessPatterns = List(
    "^image\\d*\\.?(png|jpg|jpeg|gif|bmp|svg|webp)?$",
    "^picture\\d*$", "^img\\d*$", "^graphic\\d*$", "^shape\\d*$",
    "^slide\\d+image\\d*$", "^\\d+$", "^[a-z]{1,3}$"
  ).map(_.r)
  private val genericWords =
    Set("image", "picture", "graphic", "shape", "photo", "diagram")

  def hasMeaningfulAltText(altText: String): Boolean = {
    if (altText == null) return false
    val t = altText.trim
    if (t.isEmpty) return false
    val lower = t.toLowerCase(java.util.Locale.ROOT)
    if (meaninglessPatterns.exists(p => p.pattern.matcher(lower).matches())) return false
    if (t.length < 3) return false
    if (genericWords.contains(lower)) return false
    true
  }
}
