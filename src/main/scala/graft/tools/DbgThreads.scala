package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

object DbgThreads {
  def main(args: Array[String]): Unit = {
    val text = "spark group query row data slow small filter customer line the " * 8
    val pages = (0 until 4000).map(i => graft.synth.Synth.pageFor(i.toLong, text, "en")).toArray
    val htmlStrs = pages.map(p => new String(p.html, "UTF-8"))

    def bench(name: String, threads: Int, rounds: Int)(work: Int => Long): Unit = {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val tasks = (0 until threads).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            var acc = 0L
            var r = 0
            while (r < rounds) {
              var i = 0
              while (i < pages.length) { acc += work(i); i += 1 }
              r += 1
            }
            acc
          }
        })
      }
      val total = tasks.map(_.get()).sum
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name t=$threads%2d: ${threads.toLong * rounds * pages.length / sec}%.0f docs/s (sink=$total)")
    }

    def parseOnly(i: Int): Long =
      graft.html.HtmlParser.parse(htmlStrs(i)).children.length.toLong
    def extractFull(i: Int): Long = {
      val p = pages(i)
      graft.extract.Extractor.extract(p.html, p.text).extractedText.length.toLong
    }
    def walkOnly(i: Int): Long = {
      val dom = graft.html.HtmlParser.parse(htmlStrs(i))
      graft.extract.BlockWalker.walk(dom.find("body").getOrElse(dom)).length.toLong
    }

    bench("warmup ", 4, 1)(extractFull)
    bench("parse  ", 8, 4)(parseOnly)
    bench("parse  ", 32, 4)(parseOnly)
    bench("walk   ", 8, 2)(walkOnly)
    bench("walk   ", 32, 2)(walkOnly)
    bench("extract", 8, 2)(extractFull)
    bench("extract", 32, 2)(extractFull)
  }
}
