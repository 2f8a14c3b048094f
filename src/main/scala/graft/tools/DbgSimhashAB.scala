package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B timing for the round-4 simhash fusion (VERDICT r3 #3): the fused
  * graft_simhash64 expression vs the 64 interpreted aggregate() HOF folds
  * it replaced, same input, warm passes. Equality is pinned in
  * SparkJobsSpec; this measures the per-row win. */
object DbgSimhashAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hashes = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => length(x) > 0).as("t"))
      .withColumn("hashes", transform(col("t"), x => xxhash64(x)))
      .select("doc_id", "hashes").cache()
    println(s"docs=${hashes.count()}")
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        // pmod keeps the ANSI sum from overflowing 64-bit hash values
        hashes.select(pmod(c, lit(1000000007L)).as("s")).agg(sum(col("s"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warm
      val best = (1 to 3).map(_ => pass()).min
      println(f"$label: $best%.3f sec (best of 3 warm)")
    }
    time("fused graft_simhash64", graft.OpsQueries.simhashFused(col("hashes")))
    time("64x aggregate() HOF  ", graft.OpsQueries.simhashHof(col("hashes")))
    spark.stop()
  }
}
