package graft.tools

import org.apache.spark.sql.SparkSession

/** Child-JVM extraction benchmark: measures docs/sec at a given core count
  * inside a JVM launched with -XX:ActiveProcessorCount=<cores>, so GC
  * threads, codegen pools and Runtime.availableProcessors all match an
  * actual <cores>-core machine — the faithful stand-in for an N-core
  * executor. Spawned by graft.Bench; prints one RESULT line.
  * Usage: ExtractBench <cores> <sfDir> <targetDocs>
  */
object ExtractBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val sfDir = args(1)
    val target = args(2).toInt
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
    // body-only probe (round-3 / VERDICT r2 #2): the same kernel emitting
    // only body markdown — no metadata comment, hyperlink section or
    // diagram report. full-vs-body delta = the cost of the round-2 output
    // sections, separating output growth from engine regression.
    import org.apache.spark.sql.functions.{udf, col}
    val bodyUdf = udf((html: Array[Byte], text: String) =>
      graft.extract.Extractor.extract(html, text, Long.MinValue, bodyOnly = true)
        .extractedText.length)
    def bodyPass(): Double = {
      val t0 = System.nanoTime()
      pages.select(bodyUdf(col("html"), col("text")).as("n"))
        .selectExpr("sum(n)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    bodyPass()
    val bodySec = (1 to 3).map(_ => bodyPass()).min
    println(s"RESULT docs=$docs sec=$sec bodysec=$bodySec")
    spark.stop()
  }
}
