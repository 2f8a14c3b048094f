package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Fidelity
import graft.model.DocMeta

class FidelitySpec extends AnyFunSuite {

  test("X21 semantic role precedence (accessibility_extractor_v2.py:216-231)") {
    assert(Fidelity.semanticRole("Title 1", "hello") == "title")
    assert(Fidelity.semanticRole("Subtitle 2", "hello") == "content") // subtitle excluded from title
    assert(Fidelity.semanticRole("Slide Number Placeholder 3", "4") == "slide_number")
    assert(Fidelity.semanticRole("TextBox 7", "body text") == "content")
    assert(Fidelity.semanticRole("Oval 9", "") == "other")
    assert(Fidelity.semanticRole("Oval 9", "   ") == "other")
  }

  test("O2 semantic order: titles ++ reversed(content) ++ other; slide numbers dropped") {
    val items = Seq("t1", "c1", "c2", "sn", "o1", "c3", "t2")
    val roles = Seq("title", "content", "content", "slide_number", "other", "content", "title")
    assert(Fidelity.semanticOrder(items, roles) ==
      Seq("t1", "t2", "c3", "c2", "c1", "o1"))
  }

  test("X22 arrow membership: substring match on 17-entry list") {
    assert(Fidelity.isArrowShape("MSO_AUTO_SHAPE_TYPE.LEFT_ARROW"))
    assert(Fidelity.isArrowShape("curved_up_arrow".toUpperCase))
    assert(Fidelity.isArrowShape("BLOCK_ARC (95)"))
    assert(!Fidelity.isArrowShape("RECTANGLE"))
    assert(!Fidelity.isArrowShape(""))
    assert(!Fidelity.isArrowShape(null))
  }

  test("S2 processing priorities (config.py:78-92); unknown -> 999") {
    assert(Fidelity.processingPriority("pptx") == 1)
    assert(Fidelity.processingPriority("PDF") == 3)
    assert(Fidelity.processingPriority("zip") == 7)
    assert(Fidelity.processingPriority("weird") == 999)
  }

  test("X5 bullet level precedence (text_processor.py:254-285)") {
    assert(Fidelity.determineBulletLevel(true, Some(2), Some(1)) == 2)
    assert(Fidelity.determineBulletLevel(true, None, Some(1)) == 1)
    assert(Fidelity.determineBulletLevel(true, None, None) == 0)
    assert(Fidelity.determineBulletLevel(false, Some(2), Some(1)) == 1)
    assert(Fidelity.determineBulletLevel(false, None, None) == -1)
  }

  test("X23 MB formatting: 2dp of bytes/1024^2") {
    assert(Fidelity.formatMb(1048576L) == 1.0)
    assert(Fidelity.formatMb(1572864L) == 1.5)
    assert(Fidelity.formatMb(123456789L) == 117.74)
  }

  test("formatEpochUs renders like Python str(datetime), incl. non-zero micros (ADVICE r3)") {
    assert(Fidelity.formatEpochUs(1700000000000000L) == "2023-11-14 22:13:20")
    assert(Fidelity.formatEpochUs(1700000000000001L) == "2023-11-14 22:13:20.000001")
    assert(Fidelity.formatEpochUs(1700000000123456L) == "2023-11-14 22:13:20.123456")
    assert(Fidelity.formatEpochUs(1700000000999999L) == "2023-11-14 22:13:20.999999")
    // negative epoch micros floor-divide into the previous second
    assert(Fidelity.formatEpochUs(-1L) == "1969-12-31 23:59:59.999999")
  }

  test("M2 metadata comment: prepended, only non-empty fields") {
    val meta = DocMeta("T", "", "D", "", "en", 2)
    val out = Fidelity.withMetadataComment("# Body", meta)
    assert(out.startsWith("\n<!-- DOCUMENT METADATA:\n"))
    assert(out.contains("Title: T\n"))
    assert(out.contains("Description: D\n"))
    assert(!out.contains("Author"))
    assert(out.contains("Pages: 2\n"))
    assert(out.endsWith("-->\n# Body"))
  }
}
