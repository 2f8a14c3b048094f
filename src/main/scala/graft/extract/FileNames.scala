package graft.extract

/** Sink-naming helpers — exact port of src/utils/file_utils.py:84-107
  * `safe_filename` (X19) and :11-21 `get_file_extension` (X20). Used when
  * materializing per-document sinks (the reference's markdown/ folder, S9).
  */
object FileNames {
  private val invalidChars = "<>:\"/\\|?*"

  def safeFilename(filename: String): String = {
    val sb = new StringBuilder(filename.length)
    filename.foreach { c =>
      if (c == ' ' || invalidChars.indexOf(c.toInt) >= 0) sb.append('_')
      else sb.append(c)
    }
    val safe = sb.toString
    if (safe.length > 255) {
      // os.path.splitext semantics: extension = suffix from the last dot,
      // unless the basename is all dots / starts with the only dot
      val slash = math.max(safe.lastIndexOf('/'), safe.lastIndexOf('\\'))
      val dot = safe.lastIndexOf('.')
      val (name, ext) =
        if (dot > slash + 1) (safe.substring(0, dot), safe.substring(dot))
        else (safe, "")
      name.take(250) + ext
    } else safe
  }

  def fileExtension(name: String): String = {
    val idx = name.lastIndexOf('.')
    if (idx < 0 || idx == name.length - 1) "" else name.substring(idx + 1).toLowerCase(java.util.Locale.ROOT)
  }
}
