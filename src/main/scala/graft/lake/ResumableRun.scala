package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

/** Resumable extraction run: pages are hashed into salted buckets
  * (Pipeline.saltedBucket), each bucket is extracted and committed
  * atomically via SnapshotLog, and a restarted run skips every committed
  * bucket — the BASELINE.json requirement "resumes from Iceberg snapshot
  * checkpoints so a killed run restarts at partition granularity".
  *
  * Scale note: one Spark job per bucket keeps commit granularity, and each
  * job is a narrow scan->extract->write with no shuffle (the bucket filter
  * is a pushed-down predicate on the bucket column when pages are stored
  * bucket-partitioned; here it is an xxhash64 filter on the scan). At
  * cluster scale, nBuckets is sized to ~executors*4 so each commit unit
  * still saturates the cluster.
  */
object ResumableRun {

  /** Run (or resume) extraction into `tableDir`. `maxBuckets` caps how many
    * uncommitted buckets to process this invocation (used to simulate a
    * killed run in tests). Returns the buckets processed this run. */
  def run(spark: SparkSession, pages: DataFrame, tableDir: String,
      nBuckets: Int, maxBuckets: Int = Int.MaxValue): Vector[Int] = {
    val log = new SnapshotLog(tableDir)
    log.init()
    val done = log.committedBuckets()
    val hot = Pipeline.hotDomains(pages).keySet
    val withBucket = pages.withColumn("bucket",
      Pipeline.saltedBucket(hot, nBuckets))
    val todo = (0 until nBuckets).filterNot(done.contains).take(maxBuckets).toVector
    todo.foreach { b =>
      val staged = log.stagingDir(b)
      Pipeline.extracted(withBucket.filter(col("bucket") === b).drop("bucket"))
        .write.mode("overwrite").parquet(staged.toString)
      log.commitBucket(b, staged)
    }
    todo
  }

  /** Read the committed table back (all committed buckets). */
  def readTable(spark: SparkSession, tableDir: String): DataFrame = {
    val log = new SnapshotLog(tableDir)
    val paths = log.committedPaths()
    require(paths.nonEmpty, s"no committed snapshots under $tableDir")
    spark.read.parquet(paths: _*)
  }

  /** Time travel: read the table as of snapshot `version` (the Iceberg
    * `VERSION AS OF` analog — every manifest is retained by SnapshotLog). */
  def readTableAsOf(spark: SparkSession, tableDir: String, version: Int): DataFrame = {
    val log = new SnapshotLog(tableDir)
    val paths = log.committedPathsAt(version)
    require(paths.nonEmpty, s"no committed buckets at snapshot v$version under $tableDir")
    spark.read.parquet(paths: _*)
  }
}
