package graft.extract

/** Allocation-free text statistics for the hot path. The reference
  * recompiles regexes and splits strings per call (e.g.
  * text_processor.py:441, diagram_analyzer.py:597 `clean_text.split()`);
  * at 200k docs/sec those allocations dominate — these helpers scan chars
  * instead (SURVEY.md §7.4 "allocation-lean ... hoist all Regex/charsets").
  */
object TextStats {

  /** whitespace-delimited token count == s.split("\\s+").count(_.nonEmpty) */
  def wordCount(s: String): Int = {
    var n = 0
    var inWord = false
    var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inWord) n += 1
      inWord = !ws
      i += 1
    }
    n
  }

  /** stripped.isupper() semantics of Python: no lowercase letters and at
    * least one cased letter (mirrors Hints allCaps without toUpperCase). */
  def isAllCaps(s: String): Boolean = {
    var hasLetter = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLowerCase(c)) return false
      if (Character.isLetter(c)) hasLetter = true
      i += 1
    }
    hasLetter
  }
}
