package graft.tools

import java.nio.charset.StandardCharsets

/** Single-threaded kernel stage profiler: where does a microsecond of
  * extraction go? Times (a) HTML parse only, (b) parse + block walk,
  * (c) the full kernel (markdown + links + scores + sections), over the
  * deterministic synth corpus. Run: sbt "runMain graft.tools.KernelProfile".
  */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val seeds = (0L until 50L).map(i =>
      graft.synth.Synth.pageFor(i, GenGoldens.seedDocs(1 + (i % 2).toInt)._2, "en"))
      .filter(p => !graft.extract.Extractor.isPdf(p.html))
    val htmls = Array.tabulate(n)(i => seeds((i % seeds.size).toInt))

    def time(label: String)(f: Int => Unit): Unit = {
      // warmup
      (0 until n / 4).foreach(f)
      val t0 = System.nanoTime()
      (0 until n).foreach(f)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${n / sec}%10.0f docs/s  (${sec / n * 1e6}%8.2f us/doc)")
    }

    time("parse only") { i =>
      graft.html.HtmlParser.parse(new String(htmls(i).html, StandardCharsets.UTF_8))
    }
    time("parse + walk") { i =>
      val dom = graft.html.HtmlParser.parse(new String(htmls(i).html, StandardCharsets.UTF_8))
      val body = dom.find("body").getOrElse(dom)
      graft.extract.BlockWalker.walk(body)
    }
    time("full kernel (body only)") { i =>
      graft.extract.Extractor.extract(htmls(i).html, htmls(i).text, Long.MinValue, bodyOnly = true)
    }
    time("full kernel + sections") { i =>
      graft.extract.Extractor.extract(htmls(i).html, htmls(i).text,
        htmls(i).warc_ts.getTime * 1000L)
    }
  }
}
