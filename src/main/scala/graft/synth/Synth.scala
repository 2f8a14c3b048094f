package graft.synth

import graft.model.PageRow

/** Deterministic synthetic web-page corpus (FIXTURES.md §1/§3) — builds the
  * `pages(url, warc_ts, html, text, lang)` table of BASELINE.json
  * `input_hint` from seed text bodies (the driver's `documents` table), with
  * zero wall-clock or RNG state: every byte is a pure function of
  * (doc_id, words). Feature coverage follows FIXTURES.md §3: headings,
  * nested lists, bullet-char prefixes, formatted runs, scheme-less urls,
  * duplicate anchors, pipe-bearing tables, generic-vs-meaningful alts,
  * nav/footer boilerplate, multi-page sections, malformed HTML, metadata,
  * hot-domain skew.
  */
object Synth {

  /** xorshift64* — deterministic per-doc stream; no java.util.Random. */
  final class Rng(seed0: Long) {
    private var s: Long = if (seed0 == 0L) 0x9e3779b97f4a7c15L else seed0
    def nextLong(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545f4914f6cdd1dL
    }
    def nextInt(bound: Int): Int = {
      val r = (nextLong() >>> 1) % bound
      r.toInt
    }
  }

  private val hotDomains = Array("big.example.com", "hub.example.org")
  private val coldDomainCount = 1000

  def domainFor(docId: Long, rng: Rng): String = {
    // ~10% of docs land on 2 hot domains -> the skew the salting must defuse
    if (rng.nextInt(10) == 0) hotDomains(rng.nextInt(hotDomains.length))
    else s"site-${rng.nextInt(coldDomainCount)}.example.net"
  }

  def urlFor(docId: Long): String = {
    val rng = new Rng(docId * 0x9e3779b97f4a7c15L + 1)
    s"https://${domainFor(docId, rng)}/docs/doc-$docId"
  }

  /** warc_ts: fixed base instant + 10 minutes per doc (UTC, no wall clock;
    * spread so hourly-window streaming aggregations see many windows). */
  def tsFor(docId: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + docId * 600000L)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Build one deterministic page. `words` seeds the text content. */
  def pageFor(docId: Long, text: String, lang: String): PageRow = {
    val words: Array[String] = {
      val w = text.split("\\s+").filter(_.nonEmpty)
      if (w.isEmpty) Array("empty") else w
    }
    val rng = new Rng(docId * 0x9e3779b97f4a7c15L + 1)
    val domain = domainFor(docId, rng)
    val url = s"https://$domain/docs/doc-$docId"

    // ~6% of the corpus is PDF payloads (FIXTURES.md §1: "%PDF- payload for
    // the PDF branch"); chosen off the golden id range 0-9
    if (docId % 17 == 13) {
      val (pdf, plain) = graft.pdf.PdfGen.synthPdf(docId, words)
      return PageRow(url, tsFor(docId), pdf, plain, lang)
    }

    def take(n: Int, off: Int): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < n) { if (i > 0) sb.append(' '); sb.append(words((off + i) % words.length)); i += 1 }
      sb.toString
    }
    def cap(s: String): String =
      if (s.isEmpty) s else s.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + s.substring(1)

    val variant = (docId % 10).toInt
    val nPages = if (variant == 7) 3 else 1
    val html = new StringBuilder
    val plain = new StringBuilder

    html.append("<!DOCTYPE html>\n")
    html.append(s"""<html lang="${esc(lang)}"><head>""")
    html.append(s"<title>${esc(cap(take(3, 0)))} — doc $docId</title>")
    html.append(s"""<meta name="author" content="Synth Author ${docId % 97}">""")
    html.append(s"""<meta name="keywords" content="${esc(take(4, 5).replace(' ', ','))}">""")
    html.append(s"""<meta name="description" content="${esc(take(8, 2))}">""")
    // date metadata (M1): deterministic per-doc strings, consumed VERBATIM
    // (the reference does no date format conversion). Variant 4 carries BOTH
    // created sources (%2==0 and %3==1), pinning the
    // article:published_time > name=date precedence in the goldens.
    val variant0 = (docId % 10).toInt
    if (variant0 % 2 == 0)
      html.append(s"""<meta property="article:published_time" content="2021-0${docId % 9 + 1}-1${docId % 10}T0${docId % 10}:30:00+00:00">""")
    if (variant0 % 3 == 1)
      html.append(s"""<meta name="date" content="2019-1${docId % 2}-0${docId % 9 + 1}">""")
    if (variant0 % 4 == 2)
      html.append(s"""<meta http-equiv="last-modified" content="2022-0${docId % 9 + 1}-2${docId % 10} 18:0${docId % 10}:00">""")
    // core-props breadth metas (M1, round 4): subject/category/comments/
    // last-modified-by/revision/last-printed analogs, all VERBATIM. Variants
    // carrying BOTH sources of a field pin the precedence in the goldens
    // (name=subject > dcterms.subject; article:section > name=category;
    // last-modified-by > dcterms.contributor).
    if (variant0 % 3 == 0) {
      html.append(s"""<meta name="subject" content="${esc(take(3, 7))} study">""")
      if (variant0 % 6 == 0)
        html.append(s"""<meta name="dcterms.subject" content="ignored dc subject $docId">""")
    }
    if (variant0 % 3 == 1) {
      html.append(s"""<meta property="article:section" content="section-${docId % 12}">""")
      if (variant0 % 6 == 1)
        html.append(s"""<meta name="category" content="ignored category $docId">""")
    }
    if (variant0 % 4 == 1)
      html.append(s"""<meta name="comments" content="${esc(take(5, 9))}">""")
    if (variant0 % 4 == 2) {
      html.append(s"""<meta name="last-modified-by" content="Editor ${docId % 13}">""")
      if (variant0 % 8 == 2)
        html.append(s"""<meta name="dcterms.contributor" content="ignored contributor $docId">""")
    }
    if (variant0 % 2 == 1)
      html.append(s"""<meta name="revision" content="${docId % 7 + 1}">""")
    if (variant0 % 9 == 5)
      html.append(s"""<meta name="last-printed" content="2020-0${docId % 9 + 1}-15 10:30:00">""")
    if (variant0 % 5 == 0)
      html.append(s"""<meta name="generator" content="synthcms 1.${docId % 4}">""")
    if (variant0 % 5 == 3)
      html.append(s"""<meta property="og:site_name" content="Site ${docId % 21}">""")
    html.append("</head><body>\n")
    // boilerplate: nav + cookie banner (must be stripped)
    html.append("""<nav class="topnav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>""")
    html.append("""<div class="cookie-banner">We use cookies. <a href="/privacy">Privacy</a></div>""")
    html.append("<main>\n")

    var page = 1
    while (page <= nPages) {
      if (nPages > 1) html.append(s"""<section class="page">""")
      val off = (page - 1) * 13

      val title = cap(take(3, off))
      html.append(s"<h1>${esc(title)}</h1>\n")
      plain.append(title).append('\n')

      if (variant != 3) {
        val sub = cap(take(4, off + 3))
        html.append(s"<h2>${esc(sub)}</h2>\n")
        plain.append(sub).append('\n')
      }

      // paragraph with mixed runs + links (scheme-less to exercise fix_url)
      val p1a = cap(take(6, off + 1))
      val p1b = take(2, off + 8)
      val p1c = take(5, off + 4)
      val linkTarget = variant match {
        case 1 => s"www.ref-$docId.com/page"
        case 2 => s"contact-${docId % 50}@example.com"
        case _ => s"https://ref-${docId % 500}.example.org/t/${docId % 30}"
      }
      html.append(s"<p>${esc(p1a)} <b>${esc(p1b)}</b> and <a href=\"${esc(linkTarget)}\">${esc(p1c)}</a>.</p>\n")
      plain.append(s"$p1a $p1b and $p1c.").append('\n')

      // long paragraph (negative indicator / content-density signal)
      val p2 = cap(take(30, off + 6))
      html.append(s"<p>${esc(p2)}, <i>${esc(take(3, off + 11))}</i> ${esc(take(12, off + 2))}.</p>\n")
      plain.append(p2).append('\n')

      // duplicate anchor, longer text second (keep-longest dedup D2)
      if (variant == 4) {
        html.append(s"<p><a href=\"${esc(linkTarget)}\">${esc(take(1, off))}</a> then " +
          s"<a href=\"${esc(linkTarget)}\">${esc(take(1, off))} ${esc(take(4, off + 1))}</a></p>\n")
      }

      // list: nested for some variants; literal bullet chars for others
      if (variant % 3 == 0) {
        html.append("<ul>")
        var i = 0
        while (i < 4) {
          val item = take(3, off + i * 2)
          if (i == 2) {
            html.append(s"<li>${esc(item)}<ul><li>${esc(take(2, off + 9))}</li><li>${esc(take(2, off + 10))}</li></ul></li>")
          } else html.append(s"<li>${esc(item)}</li>")
          plain.append("- ").append(item).append('\n')
          i += 1
        }
        html.append("</ul>\n")
      } else if (variant == 5) {
        html.append("<ol><li>first " + esc(take(2, off)) + "</li><li>second " + esc(take(2, off + 2)) + "</li></ol>\n")
        html.append(s"<p>• ${esc(take(4, off + 3))}</p>\n") // literal bullet char -> stripped
      }

      // table with a pipe char in a cell + a cell containing a nested list
      // (X12 cell bulletization: "  "*lvl + "• " prep)
      if (variant % 4 == 1) {
        html.append("<table><tr><th>Key</th><th>Value</th></tr>")
        html.append(s"<tr><td>${esc(take(1, off))}</td><td>${esc(take(2, off + 1))}|x</td></tr>")
        html.append(s"<tr><td>${esc(take(1, off + 2))}</td><td><ul><li>${esc(take(2, off + 3))}</li>" +
          s"<li>${esc(take(1, off + 4))}<ul><li>${esc(take(2, off + 5))}</li></ul></li></ul></td></tr></table>\n")
      }

      // images: meaningful vs generic alt
      if (variant % 5 == 2) {
        html.append(s"""<img src="a.png" alt="${esc(cap(take(5, off + 7)))} overview chart">""")
        html.append("""<img src="b.png" alt="image1.png">""") // filtered (P4)
      }

      // entities + all-caps short heading for some docs; plus a hyperlink-
      // wrapped chart (X14 markdown hyperlink-wrap quirk path)
      if (variant == 6) {
        html.append(s"<h3>${esc(take(2, off).toUpperCase(java.util.Locale.ROOT))}</h3>\n")
        html.append(s"<p>${esc(take(3, off + 5))} &amp; ${esc(take(2, off + 6))} &mdash; ${esc(take(2, off + 7))}</p>\n")
        html.append(s"""<a href="https://charts.example.org/c/${docId % 40}">""" +
          s"""<figure data-chart="line"><figcaption>${esc(cap(take(2, off + 4)))} trend</figcaption>""" +
          "<table><tr><th>s</th><th>x</th><th>y</th></tr>" +
          "<tr><td>gamma</td><td>10</td><td>20</td></tr></table></figure></a>\n")
      }

      // malformed fragment (unclosed tags, stray close) — must not throw
      if (variant == 8) {
        html.append(s"<p>${esc(take(4, off))} <b>unclosed bold</div>\n")
      }

      // diagram-like page: short flow labels + arrows (scores >= 40 path,
      // exercising A5 text-density + A6 flow vocabulary + A4 variety)
      if (variant == 9) {
        // connector arrows (A2 glyph analog): ascii + unicode forms
        html.append("<p>Start -&gt; Process input &#8594; Decision point =&gt; End</p>\n")
        html.append("<ul><li>Start</li><li>Process input</li><li>Decision point</li>" +
          "<li>Create record</li><li>Update index</li><li>Check result</li><li>End</li></ul>\n")
        html.append("<table><tr><th>Step</th><th>Next</th></tr>" +
          "<tr><td>begin</td><td>verify</td></tr></table>\n")
        // chart block (X14): 6 values on the first series exercises the
        // first-5 + "..." truncation; 3 on the second does not
        html.append(s"""<figure data-chart="bar"><figcaption>${esc(cap(take(2, off)))} throughput</figcaption>""" +
          "<table><tr><th>series</th><th>c1</th><th>c2</th><th>c3</th><th>c4</th><th>c5</th><th>c6</th></tr>" +
          "<tr><td>alpha</td><td>1</td><td>2</td><td>3</td><td>4</td><td>5</td><td>6</td></tr>" +
          "<tr><td>beta</td><td>9</td><td>8</td><td>7</td></tr></table></figure>\n")
        plain.append("Start Process input Decision point End\n")
      }

      if (nPages > 1) html.append("</section>")
      page += 1
    }

    html.append("</main>\n")
    html.append("""<footer><a href="/tos">Terms</a> <a href="/privacy">Privacy</a> © synth</footer>""")
    html.append("</body></html>\n")

    PageRow(url, tsFor(docId), html.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      plain.toString, lang)
  }
}
