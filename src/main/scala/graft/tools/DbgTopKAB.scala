package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for VERDICT r4 #5: top-k per key over a LOW-CARDINALITY SKEWED
  * key (5 keys, the hottest holding ~60% of rows — the q_topk shape that
  * serializes a window plan at corpus scale), comparing
  *   (a) `row_number() OVER (PARTITION BY k ORDER BY v DESC) <= 5` — the
  *       oracle-shape window formulation: every row crosses the exchange
  *       and each key is fully sorted by one task, and
  *   (b) the custom TopKPerKey operator with its map-side partial — at most
  *       k rows per key per input partition cross the exchange; the reduce
  *       side streams a bounded input through a k-heap, no sort.
  * Prints wall seconds and shuffle records/bytes read per variant (captured
  * with a stage-completion listener). Run:
  *   sbt "runMain graft.tools.DbgTopKAB [nRows]"
  */
object DbgTopKAB {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 5 keys; key 0 holds 60% of rows, the rest split the remainder
    def data(n: Long) = spark.range(n).select(
      when(pmod(col("id"), lit(10)) < 6, 0L)
        .otherwise(pmod(col("id"), lit(10)) - 5L).as("k"),
      (xxhash64(col("id")) % 1000000L).cast("double").as("v"))

    @volatile var shuffleBytes = 0L
    @volatile var shuffleRecords = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleRecords += sc.stageInfo.taskMetrics.shuffleReadMetrics.recordsRead
      }
    }

    def measure(name: String)(f: org.apache.spark.sql.DataFrame => Long): Unit = {
      f(data(100000L)) // codegen/JIT warm-up on a small input
      shuffleBytes = 0L; shuffleRecords = 0L
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = f(data(rows)) // fresh lineage: no shuffle-file reuse between passes
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"$name%-12s out_rows=$n sec=$sec%.3f " +
        f"shuffle_records=$shuffleRecords shuffle_mb=${shuffleBytes / 1048576.0}%.2f")
    }

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
    // Honest note: Spark 4's InferWindowGroupLimit already inserts a
    // map-side WindowGroupLimit for `row_number() <= k` filters, bounding
    // the shuffle like our partial does — variant (a) shows that plan,
    // variant (b) disables the rule to expose the NAIVE window plan (what
    // the formulation costs on engines without the rewrite, and what any
    // non-row_number window filter still costs), variant (c) is ours. The
    // remaining custom win over (a) is sort elimination: WindowGroupLimit
    // still SORTS each map partition and the final partition; the k-heap
    // streams.
    measure("window") { d =>
      d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count()
    }
    measure("window_naive") { d =>
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
      try d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count()
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    measure("topk_custom") { d =>
      org.apache.spark.sql.graftbridge.GraftBridge
        .topKPerKey(d, Seq("k"), "v", 5).count()
    }
    spark.stop()
  }
}
