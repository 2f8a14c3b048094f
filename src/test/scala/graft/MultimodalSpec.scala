package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.extract.FileNames

class MultimodalSpec extends AnyFunSuite {

  test("media synthesis is deterministic and typed by id") {
    val a = Multimodal.synthMedia(42L)
    val b = Multimodal.synthMedia(42L)
    assert(a.media.sameElements(b.media))
    assert(Multimodal.synthMedia(0L).media_type == "image")
    assert(Multimodal.synthMedia(1L).media_type == "audio")
    assert(Multimodal.synthMedia(2L).media_type == "video")
  }

  test("decode parses the container headers it synthesized") {
    val img = Multimodal.decode(Multimodal.synthMedia(6L))
    assert(img.format == "img1")
    assert(img.width == Multimodal.widthFor(6L))
    assert(img.height == Multimodal.heightFor(6L))
    val aud = Multimodal.decode(Multimodal.synthMedia(7L))
    assert(aud.format == "aud1" && aud.sample_rate == Multimodal.sampleRateFor(7L))
    val vid = Multimodal.decode(Multimodal.synthMedia(8L))
    assert(vid.format == "vid1" && vid.n_frames == Multimodal.nFramesFor(8L))
  }

  test("decode tolerates garbage bytes") {
    val junk = Multimodal.MediaRow(9L, "image", Array[Byte](1, 2, 3))
    assert(Multimodal.decode(junk).format == "unknown")
  }

  test("safe_filename port: reference semantics (file_utils.py:84-107)") {
    assert(FileNames.safeFilename("my file.pptx") == "my_file.pptx")
    assert(FileNames.safeFilename("a<b>c:d\"e/f\\g|h?i*j") == "a_b_c_d_e_f_g_h_i_j")
    val long = ("x" * 300) + ".md"
    val safe = FileNames.safeFilename(long)
    assert(safe.length == 253 && safe.endsWith(".md"))
    assert(FileNames.fileExtension("doc.PDF") == "pdf")
    assert(FileNames.fileExtension("noext") == "")
  }
}
