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
  * Scale note: ALL uncommitted buckets are extracted in ONE job — a single
  * input scan whose output is dynamic-partition-written to
  * `_tmp/stage-<v>/bucket=N/`, then each staged bucket dir is atomically
  * committed in its own snapshot. Commit granularity (and hence resume
  * granularity) is unchanged, but the input is scanned once instead of
  * nBuckets times (round-2 verdict: the per-bucket-job loop re-ran the full
  * page synthesis 16x, 32s on the x_content_stats bench line). The write is
  * a dynamic partition write with NO shuffle: each task streams rows to at
  * most nBuckets open files. At cluster scale, cap per-task open files via
  * nBuckets ~ executors*4 (or add a `.repartition(col("bucket"))` when
  * nBuckets is large enough that files-per-task dominates — a shuffle of
  * the OUTPUT, still strictly cheaper than re-scanning the input per
  * bucket).
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
    val todo = (0 until nBuckets).filterNot(done.contains).take(maxBuckets).toVector
    if (todo.isEmpty) return todo
    val hot = Pipeline.hotDomains(pages).keySet
    // The bucket is a pure function of url, so it is (re)computed on the
    // extracted OUTPUT — the kernel column set stays clean and the input
    // needs no bucket column threaded through the UDF.
    val input =
      if (todo.size == nBuckets) pages
      else pages.filter(Pipeline.saltedBucket(hot, nBuckets)
        .isin(todo.map(Integer.valueOf): _*))
    val stageRoot = log.stagingRoot()
    Pipeline.extracted(input)
      .withColumn("bucket", Pipeline.saltedBucket(hot, nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(stageRoot.toString)
    todo.foreach { b =>
      val staged = stageRoot.resolve(s"bucket=$b")
      // a bucket with zero input rows stages no dir; commit it as an empty
      // dir so resume never re-plans it (readers skip file-less dirs)
      if (!java.nio.file.Files.exists(staged))
        java.nio.file.Files.createDirectories(staged)
      log.commitBucket(b, staged)
    }
    // only write-protocol leftovers (_SUCCESS) remain under the stage root
    SnapshotLog.deleteRecursively(stageRoot)
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
