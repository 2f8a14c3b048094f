package graft.extract

/** URL normalization — exact port of the reference's `fix_url`
  * (src/converters/hyperlink_extractor.py:12-35), whose behavior is pinned by
  * the reference's own unit tests (tests/test_hyperlink_extractor.py:13-44).
  *
  * Rules, in order:
  *  1. null/empty          -> unchanged
  *  2. contains '@' and not already mailto: -> "mailto:" + url
  *  3. no known scheme prefix AND (starts with "www." OR lowercase contains a
  *     TLD-ish substring .com/.org/.net/.edu/.gov/.io) -> "https://" + url
  *  4. otherwise unchanged
  */
object UrlFix {
  private val schemes = Array("http://", "https://", "mailto:", "tel:", "ftp://", "#")
  private val tldish = Array(".com", ".org", ".net", ".edu", ".gov", ".io")

  def fixUrl(url: String): String = {
    if (url == null || url.isEmpty) return url
    if (url.contains("@") && !url.startsWith("mailto:")) return "mailto:" + url
    if (!schemes.exists(url.startsWith)) {
      val lower = url.toLowerCase(java.util.Locale.ROOT)
      if (url.startsWith("www.") || tldish.exists(lower.contains))
        return "https://" + url
    }
    url
  }
}
