package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Extractor
import graft.synth.Synth
import graft.tools.GenGoldens

/** The north-rule invariant: extracted text is BYTE-IDENTICAL per url to the
  * frozen golden corpus (BASELINE.json: "matching the reference's extracted
  * text/spans per document (byte-identical extracted text per url)").
  * Goldens were generated once by graft.tools.GenGoldens and are frozen in
  * git; any change here is a semantics change and must be a reviewed golden
  * update.
  */
class GoldenSpec extends AnyFunSuite {
  private val dir = Paths.get("src/test/resources/golden")
  private val fixturesDir = Paths.get("src/test/resources/fixtures")

  import scala.jdk.CollectionConverters._
  Files.list(fixturesDir).iterator().asScala.toVector
    .filter(_.getFileName.toString.endsWith(".html")).sortBy(_.toString)
    .foreach { f =>
      val name = f.getFileName.toString.stripSuffix(".html")
      test(s"fixture $name extraction is byte-identical to golden") {
        val r = Extractor.extract(Files.readAllBytes(f), "")
        assert(r.error == null)
        val goldenText = new String(
          Files.readAllBytes(dir.resolve(s"fixture-$name.txt")), StandardCharsets.UTF_8)
        assert(r.extractedText == goldenText, s"fixture $name text diverged")
        val goldenLinks = new String(
          Files.readAllBytes(dir.resolve(s"fixture-$name.links.tsv")), StandardCharsets.UTF_8)
        val actualLinks = r.links.map(l => s"${l.page}\t${l.anchor}\t${l.target}").mkString("\n")
        assert(actualLinks == goldenLinks, s"fixture $name links diverged")
      }
    }

  GenGoldens.seedDocs.foreach { case (id, text, lang) =>
    test(s"doc-$id extraction is byte-identical to golden") {
      val page = Synth.pageFor(id, text, lang)
      // same warc_ts flow as GenGoldens: the Crawl Date line is golden-pinned
      val r = Extractor.extract(page.html, page.text, page.warc_ts.getTime * 1000L)
      assert(r.error == null)
      val goldenText = new String(
        Files.readAllBytes(dir.resolve(s"doc-$id.txt")), StandardCharsets.UTF_8)
      assert(r.extractedText == goldenText,
        s"extracted_text diverged from golden for doc-$id")
      val goldenSpans = new String(
        Files.readAllBytes(dir.resolve(s"doc-$id.spans.tsv")), StandardCharsets.UTF_8)
      val actualSpans = r.spans.map(s => s"${s.start}\t${s.end}\t${s.kind}").mkString("\n")
      assert(actualSpans == goldenSpans, s"spans diverged for doc-$id")
      val goldenLinks = new String(
        Files.readAllBytes(dir.resolve(s"doc-$id.links.tsv")), StandardCharsets.UTF_8)
      val actualLinks = r.links.map(l => s"${l.page}\t${l.anchor}\t${l.target}").mkString("\n")
      assert(actualLinks == goldenLinks, s"links diverged for doc-$id")
    }
  }
}
