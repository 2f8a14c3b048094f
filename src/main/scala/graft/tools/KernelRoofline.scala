package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Pure-kernel roofline probe: runs `Extractor.extract` in K plain threads
  * with NO Spark, no shuffle, no shared engine state — each thread loops
  * over its own pre-materialized inputs. If aggregate docs/sec at 4N cores
  * scales sub-linearly vs N cores HERE, the ceiling is the host (shared
  * L3 / memory bandwidth / thermal throttling), not the engine: there is
  * nothing left to contend on except hardware.
  *
  * Spawned by graft.Bench in ActiveProcessorCount-pinned child JVMs to
  * produce the pair-B roofline line in BENCH.md.
  * Usage: KernelRoofline <threads> <seconds>
  */
object KernelRoofline {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val seconds = if (args.length > 1) args(1).toDouble else 10.0

    // representative inputs: every Synth variant incl. the PDF route
    val inputs: Array[(Array[Byte], String)] =
      (0L until 64L).map { i =>
        val (_, text, lang) = GenGoldens.seedDocs((i % 11).toInt)
        val p = graft.synth.Synth.pageFor(i, text, lang)
        (p.html, p.text)
      }.toArray

    // warmup (JIT) on one thread
    var w = 0
    while (w < 2000) { graft.extract.Extractor.extract(inputs(w % inputs.length)._1, inputs(w % inputs.length)._2); w += 1 }

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val done = new AtomicLong(0)
    val pool = (0 until threads).map { t =>
      val th = new Thread(() => {
        var i = t
        var n = 0L
        while (!stop.get()) {
          val (html, text) = inputs(i % inputs.length)
          val r = graft.extract.Extractor.extract(html, text)
          if (r.extractedText == null) throw new IllegalStateException("null output")
          i += 1; n += 1
        }
        done.addAndGet(n)
      })
      th.setDaemon(true); th.start(); th
    }
    val t0 = System.nanoTime()
    Thread.sleep((seconds * 1000).toLong)
    stop.set(true)
    pool.foreach(_.join(10000))
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"RESULT docs=${done.get()} sec=$sec")
  }
}
