package graft.extract

import graft.model._

/** Exact ports of reference behaviors that have no load-bearing role for
  * the HTML/PDF payload but are part of the reference's observable
  * semantics (SURVEY.md §2 rows O2, X21, X22, S2, M2, X23). They are unit-
  * tested against the reference's documented behavior so a user migrating
  * PPTX-derived workloads gets identical decisions.
  */
object Fidelity {

  /** X21: name-based semantic role classifier
    * (accessibility_extractor_v2.py:216-231). Precedence: title (name has
    * "title" but not "subtitle") > slide_number (name has "slide number") >
    * content (has text) > other. */
  def semanticRole(shapeName: String, textPreview: String): String = {
    val n = Option(shapeName).getOrElse("").toLowerCase(java.util.Locale.ROOT)
    if (n.contains("title") && !n.contains("subtitle")) "title"
    else if (n.contains("slide number")) "slide_number"
    else if (textPreview != null && textPreview.trim.nonEmpty) "content"
    else "other"
  }

  /** O2: the reference's semantic reorder quirk — titles ++ REVERSED
    * content ++ other; slide_number shapes are dropped from the output
    * (accessibility_extractor_v2.py:240-250, order at :243). `roles` is
    * parallel to `items`. */
  def semanticOrder[A](items: Seq[A], roles: Seq[String]): Seq[A] = {
    val titles = Vector.newBuilder[A]
    val content = Vector.newBuilder[A]
    val other = Vector.newBuilder[A]
    items.zip(roles).foreach {
      case (a, "title")        => titles += a
      case (_, "slide_number") => () // dropped
      case (a, "content")      => content += a
      case (a, _)              => other += a
    }
    titles.result() ++ content.result().reverse ++ other.result()
  }

  /** X22: arrow-type membership — 17-entry list, substring match on the
    * uppercased type name (content_extractor.py:513-537). */
  private val arrowTypes = Array(
    "LEFT_ARROW", "DOWN_ARROW", "UP_ARROW", "RIGHT_ARROW",
    "LEFT_RIGHT_ARROW", "UP_DOWN_ARROW", "QUAD_ARROW",
    "LEFT_RIGHT_UP_ARROW", "BENT_ARROW", "U_TURN_ARROW",
    "CURVED_LEFT_ARROW", "CURVED_RIGHT_ARROW",
    "CURVED_UP_ARROW", "CURVED_DOWN_ARROW",
    "STRIPED_RIGHT_ARROW", "NOTCHED_RIGHT_ARROW", "BLOCK_ARC")

  def isArrowShape(autoShapeType: String): Boolean = {
    if (autoShapeType == null || autoShapeType.isEmpty) return false
    val s = autoShapeType.toUpperCase(java.util.Locale.ROOT)
    arrowTypes.exists(s.contains)
  }

  /** S2/O4: input priority table (config.py:78-92); unknown kinds sort last
    * (folder_processor.py:102-114 returns 999 for unknown). */
  val processingPriorities: Map[String, Int] = Map(
    "pptx" -> 1, "ppt" -> 1, "docx" -> 2, "doc" -> 2, "pdf" -> 3,
    "xlsx" -> 4, "xls" -> 4, "html" -> 5, "htm" -> 5,
    "csv" -> 6, "json" -> 6, "xml" -> 6, "zip" -> 7)

  def processingPriority(kind: String): Int =
    processingPriorities.getOrElse(Option(kind).getOrElse("").toLowerCase(java.util.Locale.ROOT), 999)

  /** X5: bullet-level resolution precedence (text_processor.py:254-285):
    * xml-bullet+xml-level > xml-bullet+ppt-level > xml-bullet+0 >
    * ppt-level > -1. Our DOM analog (li nesting depth) uses this with
    * xmlLevel = nesting depth; ported exactly for PPTX-derived workloads. */
  def determineBulletLevel(isXmlBullet: Boolean, xmlLevel: Option[Int],
      pptLevel: Option[Int]): Int = {
    if (isXmlBullet) xmlLevel.getOrElse(pptLevel.getOrElse(0))
    else pptLevel.getOrElse(-1)
  }

  /** X23: MB formatting — bytes/1024^2 at 2 decimals
    * (metadata_extractor.py:504-505). */
  def formatMb(bytes: Long): Double =
    math.round(bytes / 1048576.0 * 100.0) / 100.0

  /** Python f-string `:.1f` formatting: round-half-even over the EXACT
    * binary double (ADVICE r2 — Java String.format %.1f is HALF_UP, so 0.25
    * rendered '0.3' here vs '0.2' in the reference's reason tags). */
  def pyFormat1f(d: Double): String =
    new java.math.BigDecimal(d)
      .setScale(1, java.math.RoundingMode.HALF_EVEN).toPlainString

  private val tsFormatter = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss", java.util.Locale.ROOT)
    .withZone(java.time.ZoneOffset.UTC)

  /** Render an epoch-micros instant the way the reference's metadata
    * comment renders datetimes (metadata_extractor.py:459-462 interpolates
    * the datetime object — Python str() of a naive UTC datetime is
    * `yyyy-MM-dd HH:mm:ss`, plus `.ffffff` whenever microsecond != 0, which
    * Python renders and a zero microsecond field omits). ADVICE r3: the
    * micros suffix was previously dropped unconditionally — latent on the
    * second-aligned synthetic corpus, wrong for any real warc_ts. */
  def formatEpochUs(us: Long): String = {
    val base = tsFormatter.format(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L)))
    val micros = Math.floorMod(us, 1000000L)
    if (micros == 0L) base
    else base + "." + String.format(java.util.Locale.ROOT, "%06d", Long.box(micros))
  }

  /** M2 analog: metadata prepended as an HTML comment block
    * (metadata_extractor.py:334-380 structure, our document fields).
    * Section order mirrors the reference's four format_* passes (:371-375):
    * document fields in the reference's field order (:412-430 — Title,
    * Author, Subject, Keywords, Category, `Document Comments:`, Language;
    * our HTML-specific Description slots before Keywords), then dates
    * (`Created Date:`/`Last Modified:`/`Last Modified By:`/`Last Printed:`
    * like :459-467, plus `Crawl Date:` — the always-available web-corpus
    * file date), then file info (`File Size: X.XX MB`, :503-505 — X23
    * formatMb wired), then structure (page count + `Layout Types:` like
    * :549-550). Revision is extracted into DocMeta but not rendered — the
    * reference extracts it (:216-219) without a format_* line.
    * Deterministic; only non-empty fields are emitted. */
  def metadataComment(meta: DocMeta, sizeBytes: Long = -1L): String = {
    val sb = new StringBuilder("\n<!-- DOCUMENT METADATA:\n")
    def add(k: String, v: String): Unit =
      if (v != null && v.nonEmpty) sb.append(s"$k: $v\n")
    add("Title", meta.title)
    add("Author", meta.author)
    add("Subject", meta.subject)
    add("Description", meta.description)
    add("Keywords", meta.keywords)
    add("Category", meta.category)
    add("Document Comments", meta.comments)
    add("Language", meta.htmlLang)
    add("Created Date", meta.createdDate)
    add("Last Modified", meta.modifiedDate)
    add("Last Modified By", meta.lastModifiedBy)
    add("Last Printed", meta.lastPrinted)
    add("Crawl Date", meta.crawlDate)
    if (sizeBytes >= 0)
      sb.append("File Size: ")
        .append(String.format(java.util.Locale.ROOT, "%.2f", Double.box(formatMb(sizeBytes))))
        .append(" MB\n")
    add("Created With", meta.application)
    add("Company", meta.company)
    if (meta.pageCount > 0) sb.append(s"Pages: ${meta.pageCount}\n")
    add("Layout Types", meta.layoutTypes)
    sb.append("-->\n")
    sb.toString
  }

  /** prepend like add_pptx_metadata_for_claude (:380). */
  def withMetadataComment(markdown: String, meta: DocMeta, sizeBytes: Long = -1L): String =
    metadataComment(meta, sizeBytes) + markdown
}
