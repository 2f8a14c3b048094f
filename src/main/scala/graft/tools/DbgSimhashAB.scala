package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B timings for the round-4 hash-kernel fusions: (1) the fused
  * graft_simhash64 expression vs the 64 interpreted aggregate() HOF folds
  * it replaced; (2) the fused graft_minhash_sigs signature stage vs the
  * r3 explode(shingles) -> min-agg -> doc_id-shuffle plan. Same input,
  * warm passes. Equality is pinned in SparkJobsSpec; this measures the
  * per-row / per-stage wins. */
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

    // ---- minhash signature stage A/B (round 4): fused per-row expression
    // vs the r3 explode(shingles) -> min-aggs -> doc_id shuffle plan,
    // measured to the same materialization (sum of sig[1] per doc).
    // CONSERVATIVE: the r3 reconstruction computes only 1 of the 16
    // min-aggregates, so the real old cost is higher than printed.
    val toksCol = filter(split(col("text"), " "), x => length(x) > 0)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), toksCol.as("t")).cache()
    d.count()
    def timeJob(label: String)(f: => Unit): Unit = {
      def pass(): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      pass()
      println(f"$label: ${(1 to 3).map(_ => pass()).min}%.3f sec (best of 3 warm)")
    }
    timeJob("fused graft_minhash_sigs   ") {
      d.select(pmod(element_at(
          graft.OpsQueries.minhashFused(col("t"), 3, 16), 1), lit(1000000007L)).as("s"))
        .agg(sum(col("s"))).collect()
    }
    timeJob("r3 explode+minagg signature") {
      val sh = when(size(col("t")) >= 3,
        transform(sequence(lit(1), size(col("t")) - 2),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
        .otherwise(array(concat_ws(" ", col("t"))))
      d.select(col("doc_id"), explode(sh).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
        .groupBy(col("doc_id"))
        .agg(min(xxhash64(col("h"), lit(0))).as("h0"))
        .select(pmod(col("h0"), lit(1000000007L)).as("s"))
        .agg(sum(col("s"))).collect()
    }
    spark.stop()
  }
}
