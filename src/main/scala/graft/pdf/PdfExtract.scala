package graft.pdf

import graft.model.ExtractResult

/** PDF branch of the extraction dispatch (S4 magic-byte sniff -> S7 embedded
  * parser). Placeholder until the from-scratch content-stream parser lands:
  * falls back to the plain `text` column (R2 semantics, error stays null).
  */
object PdfExtract {
  def extract(bytes: Array[Byte], textFallback: String): ExtractResult =
    graft.extract.Extractor.fallback(textFallback, null)
}
