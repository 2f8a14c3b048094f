package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming face of the engine (SURVEY.md §2.2 streaming row):
  * the reference is strictly batch-per-folder, and its resumability maps to
  * incremental processing — here `readStream` over the pages table with
  * `Trigger.AvailableNow` + a checkpoint dir: each invocation processes only
  * files not yet seen by the checkpoint, then stops. This is the streaming
  * twin of lake.ResumableRun (file granularity instead of bucket
  * granularity); both exist because the north star names snapshot-checkpoint
  * resume while the builder mandate names Structured Streaming coverage.
  */
object StreamPipeline {

  /** input_hint schema (BASELINE.json) — SINGLE canonical definition lives
    * with the DSv2 connector; this is an alias (round-5 review: two
    * verbatim StructType copies could drift with no compile-time error). */
  val pagesSchema: StructType = graft.sources.PagesDataSource.pagesSchema

  /** Incrementally extract new page files from `inDir` into `outDir`;
    * returns after all currently-available input is processed. */
  def runExtractAvailableNow(spark: SparkSession, inDir: String,
      outDir: String, checkpointDir: String): Unit = {
    val pages = spark.readStream.schema(pagesSchema).parquet(inDir)
    val out = graft.pipeline.Pipeline.extracted(pages)
    val q = out.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Watermarked tumbling-window aggregation over the stream (1h windows on
    * warc_ts, counts per lang) — the standard streaming-agg shape. */
  def runWindowedCounts(spark: SparkSession, inDir: String,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    // append-mode emission needs the watermark to advance BETWEEN
    // micro-batches; cap files/trigger so AvailableNow yields several.
    // At cluster scale raise this to ~executor count x a few.
    val pages = spark.readStream.schema(pagesSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(inDir)
    val agg = pages
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 hour"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("lang"), col("n"))
    val q = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Batch view of what the windowed stream computes (for test oracles). */
  def windowedCountsBatch(pages: DataFrame): DataFrame =
    pages.groupBy(window(col("warc_ts"), "1 hour"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("lang"), col("n"))

  /** Stream-static broadcast join: the crawl stream enriched against a
    * STATIC dimension (here the hot-domain table the batch pre-pass
    * computes) — the standard enrichment shape for an unbounded ingest. The
    * static side is broadcast to every micro-batch, so the stream is never
    * shuffled; at 100 TB/day the dimension refresh is a redeploy (or a
    * foreachBatch re-read), never a stream-stream join. */
  def runEnrichAvailableNow(spark: SparkSession, inDir: String,
      staticHotDomains: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val pages = spark.readStream.schema(pagesSchema).parquet(inDir)
    val enriched = pages
      // SAME key derivation as the batch pre-pass that built the dimension
      // (round-5 review: an inlined regex copy could drift from
      // Pipeline.domainOf, silently turning every row is_hot=false)
      .withColumn("domain", graft.pipeline.Pipeline.domainOf)
      .join(broadcast(staticHotDomains), Seq("domain"), "left")
      .select(col("url"), col("domain"),
        coalesce(col("is_hot"), lit(false)).as("is_hot"))
    val q = enriched.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming dedup of a crawl stream: re-crawled urls (same content hash)
    * within the watermark are dropped exactly once via
    * `dropDuplicatesWithinWatermark` — the streaming twin of dd_exact.
    * State is bounded by the watermark horizon (eviction past 1 hour of
    * event time), the property that makes dedup viable on an unbounded
    * 100 TB/day crawl where an unbounded dropDuplicates would OOM. */
  def runDedupAvailableNow(spark: SparkSession, inDir: String,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    val pages = spark.readStream.schema(pagesSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(inDir)
    val deduped = pages
      // null-html rows (text-only records are legal per the nullable input
      // schema) must NOT share one null fingerprint — md5(NULL) is NULL and
      // the state store would treat every such page as a duplicate of the
      // first (round-5 review). A null body falls back to the url as the
      // dedup identity. The identity spaces are tagged ('h:' body bytes vs
      // 'u:' url bytes) so a body that happens to equal some null-html
      // record's url bytes can never collide with it (ADVICE r5).
      .withColumn("fp", md5(coalesce(
        concat(encode(lit("h:"), "UTF-8"), col("html")),
        concat(encode(lit("u:"), "UTF-8"), encode(col("url"), "UTF-8")))))
      .withWatermark("warc_ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .select(col("url"), col("warc_ts"), col("fp"))
    val q = deduped.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
