package graft.tools

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** One-shot generator for the golden extraction corpus
  * (src/test/resources/golden/). Goldens are generated once, inspected, and
  * FROZEN in git — the byte-identical-per-url invariant
  * (BASELINE.json north_rule) is then enforced by GoldenSpec. Re-running
  * this tool after a semantics change is a deliberate golden update that
  * must be reviewed in the diff.
  */
object GenGoldens {
  /** Fixed seed corpus: doc ids 0..9 cover every Synth variant; the two
    * texts exercise short and long bodies. Never change these inputs —
    * they are part of the contract. */
  val seedDocs: Seq[(Long, String, String)] = {
    val textA = "the fast key order sort table scan merge part window small hash " +
      "scan join order batch batch batch stream spark window window dup"
    val textB = "spark group query row data slow small filter customer line the " +
      "batch value merge line table data line join agg line merge slow join sort " +
      "agg part merge column filter key data a part batch merge data row column " +
      "column big merge slow part slow spark table small part fast value merge"
    (0L until 10L).map(i => (i, if (i % 2 == 0) textA else textB,
      Seq("en", "de", "fr", "es", "zz")((i % 5).toInt))) :+
      (13L, textA, "en") // PDF payload route (docId % 17 == 13)
  }

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(
      if (args.nonEmpty) args(0) else "src/test/resources/golden")
    Files.createDirectories(outDir)
    // handcrafted fixtures (src/test/resources/fixtures/*.html): golden =
    // extraction over the file bytes with empty text fallback
    val fixturesDir = Paths.get("src/test/resources/fixtures")
    if (Files.isDirectory(fixturesDir)) {
      Files.list(fixturesDir).iterator().forEachRemaining { f =>
        if (f.getFileName.toString.endsWith(".html")) {
          val name = f.getFileName.toString.stripSuffix(".html")
          val r = graft.extract.Extractor.extract(Files.readAllBytes(f), "")
          require(r.error == null, s"fixture $name errored: ${r.error}")
          Files.write(outDir.resolve(s"fixture-$name.txt"),
            r.extractedText.getBytes(StandardCharsets.UTF_8))
          val linkLines = r.links.map(l => s"${l.page}\t${l.anchor}\t${l.target}").mkString("\n")
          Files.write(outDir.resolve(s"fixture-$name.links.tsv"),
            linkLines.getBytes(StandardCharsets.UTF_8))
        }
      }
    }
    seedDocs.foreach { case (id, text, lang) =>
      val page = graft.synth.Synth.pageFor(id, text, lang)
      // warc_ts flows into the Crawl Date metadata line (M1); fixtures above
      // deliberately pass none, pinning the absent-date path
      val r = graft.extract.Extractor.extract(page.html, page.text,
        page.warc_ts.getTime * 1000L)
      require(r.error == null, s"doc $id extraction errored: ${r.error}")
      Files.write(outDir.resolve(s"doc-$id.txt"),
        r.extractedText.getBytes(StandardCharsets.UTF_8))
      val spanLines = r.spans.map(s => s"${s.start}\t${s.end}\t${s.kind}").mkString("\n")
      Files.write(outDir.resolve(s"doc-$id.spans.tsv"),
        spanLines.getBytes(StandardCharsets.UTF_8))
      val linkLines = r.links.map(l => s"${l.page}\t${l.anchor}\t${l.target}").mkString("\n")
      Files.write(outDir.resolve(s"doc-$id.links.tsv"),
        linkLines.getBytes(StandardCharsets.UTF_8))
    }
    println(s"wrote goldens for ${seedDocs.size} docs to $outDir")
  }
}
