package graft.extract

import graft.model._

/** Per-page structure ("diagram-likeness") scoring — the HTML analog of
  * src/processors/powerpoint/diagram_analyzer.py. The spatial/EMU rules have
  * no DOM equivalent; the text-driven rules port with their exact thresholds:
  *  - text density (avg words/para <= 5; >=70% -> +10, >=50% -> +5)  :584-618 (A5)
  *  - flow/action vocab (+20/+10; actions>=3 -> +10)                  :620-651 (A6)
  *  - negative indicators (>=2 paras >20 words -> -15;
  *    >80% bullets -> -10)                                            :653-695 (A7)
  *  - block-variety analog of shape variety (>=3 types -> +15,
  *    >=2 -> +10)                                                     :550-582 (A4)
  *  - score -> probability bucketing (95/75/40/10); report >= 40      :697-706 (A8)
  */
object StructureScore {
  private val flowKeywords =
    Array("start", "begin", "end", "finish", "process", "step", "decision")
  private val actionWords =
    Array("create", "update", "check", "verify", "send", "receive", "analyze")

  def scorePage(page: PageBlocks): PageScore = {
    val blocks = page.blocks
    val textBlocks = blocks.collect { case t: TextBlock => t }
    val reasons = Vector.newBuilder[String]
    var score = 0

    // A4 analog: block-type variety
    val kinds = blocks.map {
      case _: TextBlock  => "text"
      case _: TableBlock => "table"
      case _: ImageBlock => "image"
      case _: ChartBlock => "chart"
    }.distinct
    if (kinds.size >= 3) { score += 15; reasons += "high block variety" }
    else if (kinds.size >= 2) { score += 10; reasons += "moderate block variety" }

    // A5: text density — share of blocks whose avg words/para <= 5
    if (textBlocks.nonEmpty) {
      val shortCount = textBlocks.count { b =>
        val paras = b.paragraphs.filter(_.cleanText.nonEmpty)
        paras.nonEmpty && {
          val totalWords = paras.map(p => TextStats.wordCount(p.cleanText)).sum
          totalWords.toDouble / paras.size <= 5
        }
      }
      val ratio = shortCount.toDouble / textBlocks.size
      if (ratio >= 0.7) { score += 10; reasons += "70%+ short text blocks" }
      else if (ratio >= 0.5) { score += 5; reasons += "50%+ short text blocks" }
    }

    // A6: flow vocabulary over concatenated lowercase text
    val allText = {
      val sb = new StringBuilder
      textBlocks.foreach(_.paragraphs.foreach(p => sb.append(' ').append(p.cleanText.toLowerCase(java.util.Locale.ROOT))))
      sb.toString
    }
    val flowMatches = flowKeywords.count(allText.contains)
    val actionMatches = actionWords.count(allText.contains)
    if (flowMatches >= 2) { score += 20; reasons += "strong workflow vocabulary" }
    else if (flowMatches >= 1) { score += 10; reasons += "workflow vocabulary" }
    if (actionMatches >= 3) { score += 10; reasons += "action-heavy content" }

    // A7: negative indicators
    var longTextCount = 0
    var bulletCount = 0
    var totalParas = 0
    textBlocks.foreach(_.paragraphs.foreach { p =>
      if (p.cleanText.nonEmpty) {
        totalParas += 1
        if (TextStats.wordCount(p.cleanText) > 20) longTextCount += 1
        if (p.hints.isBullet) bulletCount += 1
      }
    })
    if (longTextCount >= 2) { score -= 15; reasons += "document-style long paragraphs" }
    if (totalParas > 0 && bulletCount.toDouble / totalParas > 0.8) {
      score -= 10; reasons += "bullet-heavy content"
    }

    // A8: probability bucketing (diagram_analyzer.py:697-706)
    val probability =
      if (score >= 60) 95
      else if (score >= 40) 75
      else if (score >= 20) 40
      else 10

    PageScore(page.pageNumber, score, probability, reasons.result(),
      blockCount = blocks.size, bulletCount = bulletCount,
      titleCount = textBlocks.count(_.role == "title"),
      subtitleCount = textBlocks.count(_.role == "subtitle"),
      contentCount = textBlocks.count(_.role == "content"))
  }

  /** All page scores (the sidecar carries every page; the reference's
    * report threshold — probability >= 40, diagram_analyzer.py:80,93 — is a
    * downstream filter, see SparkEntry "x_scores_reportable"). */
  def allPages(pages: Seq[PageBlocks]): Vector[PageScore] =
    pages.iterator.map(scorePage).toVector

  /** Pages worth reporting: probability >= 40 (diagram_analyzer.py:80,93). */
  def reportablePages(pages: Seq[PageBlocks]): Vector[PageScore] =
    allPages(pages).filter(_.probability >= 40)

  /** Diagram-analysis report rendered into the output document
    * (diagram_analyzer.py:104-117: probability/score/reasons per reported
    * page plus component counts and the analysis-method line). Returns ""
    * when no page reaches the 40% report threshold. */
  def diagramSection(scores: Seq[PageScore]): String = {
    val reportable = scores.filter(_.probability >= 40)
    if (reportable.isEmpty) return ""
    val sb = new StringBuilder("## DIAGRAM ANALYSIS\n\n")
    sb.append("**Pages with potential diagrams:**\n\n")
    reportable.foreach { s =>
      sb.append(s"- **Page ${s.page}**: ${s.probability}% probability ")
      sb.append(s"(Score: ${s.totalScore}) - ${s.reasons.mkString(", ")}\n")
      sb.append(s"  - Blocks: ${s.blockCount}, Bullets: ${s.bulletCount}\n")
      sb.append("  - Analysis method: structured_data_analysis\n\n")
    }
    sb.toString
  }
}
