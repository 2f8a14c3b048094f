package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: the formatted physical plan of each headline query plus
  * automated checks of the plan properties that matter at 100 TB —
  * pushdown reaching the scan, pruned ReadSchema, broadcast joins where a
  * side is small, no Exchange on the extraction path, WholeStageCodegen
  * coverage. Run: `sbt "runMain graft.tools.PlanCheck"`.
  */
object PlanCheck {
  private def explainOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** The (doc_id, text, t) base relation the LSH queries build on — used to
    * plan-check the construction subtrees the final (checkpointed) plans no
    * longer show. */
  private def lshBase(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        filter(split(col("text"), " "), x => length(x) > 0).as("t"))
      .filter(size(col("t")) > 0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Vector(
      "x_extract", "x_links", "q_agg", "q_join_collect", "q_forward_fill",
      "q_topk", "q_topk_custom", "dd_minhash_lsh", "dd_jaccard_lsh", "dd_exact",
      "dd_embed_neardup", "ann_topk", "ann_ivf", "ta_langid",
      "q_time_window", "q_asof_join", "ta_sample", "dd_simhash",
      "q_bucketed_join")

    val md = new StringBuilder
    md.append("# PLANS — physical plans of headline queries (local mode)\n\n")
    md.append("Checked properties:\n")
    md.append("- extraction is one narrow map stage: no Exchange before the kernel\n")
    md.append("- parquet scans carry pruned ReadSchema (column pruning past the UDF)\n")
    md.append("- small-side joins broadcast (BroadcastHashJoin / BroadcastNestedLoopJoin)\n")
    md.append("- aggregations are partial->final HashAggregate (map-side combine)\n\n")

    var failures = 0
    interesting.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      md.append(s"## $name\n\n```\n$plan\n```\n\n")
      def check(label: String, ok: Boolean): Unit = {
        md.append(s"- ${if (ok) "PASS" else "FAIL"}: $label\n")
        if (!ok) failures += 1
      }
      name match {
        case "x_extract" =>
          check("kernel planned as the native graft_extract_doc expression",
            plan.contains("graft_extract_doc"))
          check("no Exchange before the extraction Project",
            !plan.split("Exchange").head.contains("graft_extract_doc"))
          // round 4: the scan is the DSv2 connector; pruning must drop the
          // unused lang column from the required set
          check("connector scan prunes to url,warc_ts,html,text (lang dropped)",
            plan.contains("GraftPagesScan") &&
              plan.contains("required=url,warc_ts,html,text"))
        case "q_agg" =>
          check("partial HashAggregate present", plan.contains("HashAggregate"))
        case "q_join_collect" =>
          check("broadcast join used", plan.contains("Broadcast"))
        case "q_forward_fill" =>
          // exactly 2 shuffles: window partitionBy + final deterministic sort
          val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
          check("one Window; shuffles limited to window + output sort",
            exchanges <= 2 && plan.contains("Window"))
        case "dd_exact" =>
          check("hash aggregate (not sort-based)", plan.contains("HashAggregate"))
        // Round 6: the LSH queries materialize their shared subtrees once
        // per invocation (localCheckpoint — the r5 plans re-executed the
        // collapse groupBy per reference, 7x for dd_embed_neardup), so the
        // FINAL plan reads checkpointed RDD scans and the fused-expression /
        // collapse properties live in the CONSTRUCTION sub-plans. Each
        // property is checked where it now lives: the final plan for the
        // materialize-once shape, the production helper's plan for the
        // fused-signature collapse and the band self-join key.
        case "dd_jaccard_lsh" =>
          check("shared subtrees materialized once (checkpointed scans)",
            plan.contains("Scan ExistingRDD"))
          check("rerank joins by candidate id (no BroadcastNestedLoopJoin)",
            !plan.contains("BroadcastNestedLoopJoin"))
          val groupsJ = graft.OpsQueries.minhashGroups(lshBase(spark, sfDir), 3, 16)
          check("fused graft_minhash_sigs planned in the collapse subtree",
            explainOf(groupsJ).contains("graft_minhash_sigs"))
          val candPlan = explainOf(graft.OpsQueries.repCandidates(
            graft.OpsQueries.bandBuckets(groupsJ, 16, 4)))
          // the join may be hash-partitioned (corpus scale) or broadcast
          // (AQE at test scale); either way it must be EQUI-KEYED on the
          // two band columns, never an all-pairs nested-loop/cartesian
          check("band self-join equi-keyed on (band, bucket), no all-pairs",
            "keys \\[2\\]: \\[band".r.findAllIn(candPlan).nonEmpty &&
              !candPlan.contains("BroadcastNestedLoopJoin") &&
              !candPlan.contains("CartesianProduct"))
        case "dd_minhash_lsh" =>
          check("shared subtrees materialized once (checkpointed scans)",
            plan.contains("Scan ExistingRDD"))
          // round 4: signatures are one fused per-row expression — no
          // shingle explode / min-agg before the join. The collapse
          // groupBy's min(doc_id)/min_by(sigs) rep selection is the ONLY
          // min-family aggregation allowed; the r3 regression shape carried
          // 16 per-signature min() aggregates.
          val groupsPlan = explainOf(
            graft.OpsQueries.minhashGroups(lshBase(spark, sfDir), 3, 16))
          check("fused graft_minhash_sigs planned in the collapse subtree",
            groupsPlan.contains("graft_minhash_sigs"))
          check("only the rep-collapse min/min_by aggregation (fused signatures)",
            "min\\(".r.findAllIn(groupsPlan).size ==
              "min\\(doc_id".r.findAllIn(groupsPlan).size)
          check("exact-duplicate collapse groups by content before banding",
            groupsPlan.contains("min_by"))
        case "dd_embed_neardup" =>
          check("no all-pairs BroadcastNestedLoopJoin",
            !plan.contains("BroadcastNestedLoopJoin"))
          check("candidate join is hash-keyed on (band, sig)",
            plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
        case "ann_topk" =>
          check("broadcast on the query side", plan.contains("Broadcast"))
        case "ann_ivf" =>
          check("broadcast on the probe/query side", plan.contains("Broadcast"))
          check("no all-pairs BroadcastNestedLoopJoin",
            !plan.contains("BroadcastNestedLoopJoin"))
        case "x_links" =>
          check("reads the committed extraction table, kernel not re-run",
            !plan.contains("MapElements") && plan.contains("Scan parquet"))
        case "q_asof_join" =>
          // one union of two prepared sides through ONE user_id window;
          // shuffles: click pre-agg + window partitioning + final sort
          check("single Window (forward-fill as-of, no range self-join)",
            "\\(\\d+\\) Window".r.findAllIn(plan).size == 1)
          check("no join operator at all (as-of composed via window)",
            !plan.contains("Join"))
        case "ta_sample" =>
          // VERDICT r3 #2: stratification counts must NOT run through a
          // count(*) over (partition by lang, split) window — ~8 partitions
          // would each funnel a whole language through one task
          check("no low-cardinality Window (groupBy + broadcast join back)",
            !plan.contains("Window") && plan.contains("BroadcastHashJoin"))
          check("partial->final HashAggregate for the counts",
            plan.contains("HashAggregate"))
        case "dd_simhash" =>
          // VERDICT r3 #3: the 64 per-bit HOF folds are fused into one
          // native expression evaluated once per row
          check("fused graft_simhash64 expression planned",
            plan.contains("graft_simhash64"))
          check("no interpreted per-bit aggregate() folds",
            !plan.contains("aggregate(hashes"))
        case "q_bucketed_join" =>
          check("bucketed scans on both sides", plan.contains("Bucketed: true"))
          check("sort-merge join over the bucket layout",
            plan.contains("SortMergeJoin"))
          check("neither join key ever repartitioned",
            !plan.contains("Exchange hashpartitioning(o_orderkey") &&
              !plan.contains("Exchange hashpartitioning(l_orderkey"))
        case "q_topk_custom" =>
          check("custom TopKPerKey exec planned", plan.contains("TopKPerKey"))
          // the only Sort allowed is the final deterministic output orderBy
          // ABOVE the operator — the top-k itself must not sort its input
          check("no Sort below the custom top-k",
            "\\(\\d+\\) Sort".r.findAllIn(plan).size <= 1)
        case _ => ()
      }
      md.append("\n")
    }
    // Round 4 (VERDICT r3 #5): Pipeline.pages is the DSv2 connector, so the
    // sampled hot-domain pre-pass must read urls WITHOUT synthesizing page
    // bodies — the scan's required column set shows the pruning.
    locally {
      import org.apache.spark.sql.functions._
      val prePass = graft.pipeline.Pipeline.pages(spark, sfDir)
        .filter(pmod(xxhash64(col("url")), lit(100)) === 0)
        .select(graft.pipeline.Pipeline.domainOf.as("domain"))
        .groupBy("domain").count()
      val plan = prePass.queryExecution.executedPlan.toString
      md.append("## hot-domain pre-pass (Pipeline.hotDomains sample scan)\n\n")
      md.append(s"```\n$plan\n```\n\n")
      def check(label: String, ok: Boolean): Unit = {
        md.append(s"- ${if (ok) "PASS" else "FAIL"}: $label\n")
        if (!ok) failures += 1
      }
      check("scan is the GraftPagesScan connector", plan.contains("GraftPagesScan"))
      check("scan reads url only — no html/text body synthesis",
        plan.contains("required=url") && !plan.contains("required=url,warc_ts,html"))
      md.append("\n")
    }
    // Round 5 (VERDICT r4 #8): AQE skew-join handling pinned on a
    // planted-skew join — the engine's RUNTIME answer to join skew,
    // complementing the write-time hot-domain salting in
    // Pipeline.saltedBucket. Thresholds are lowered so the planted skew
    // (90% of rows on one key) trips the optimizer at test scale; at
    // production scale the defaults (256MB / factor 5) play the same role.
    locally {
      import org.apache.spark.sql.functions._
      val tuned = Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
      val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val fact = spark.range(400000L).select(
          when(pmod(col("id"), lit(10)) < 9, 0L)
            .otherwise(pmod(col("id"), lit(97))).as("k"),
          col("id").as("payload"))
        val dim = spark.range(97L).select(col("id").as("k"),
          concat(lit("dim-"), col("id")).as("name"))
        val j = fact.join(dim, "k").groupBy(col("name"))
          .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
        j.collect() // AQE finalizes the plan only after execution
        val plan = j.queryExecution.executedPlan.toString
        md.append("## planted-skew join (AQE skew-split demonstration)\n\n")
        md.append("90% of a 400k-row fact lands on one join key; with the\n")
        md.append("skew thresholds scaled to test size, AQE must split the\n")
        md.append("skewed partition instead of serializing it through one task.\n\n")
        md.append(s"```\n$plan\n```\n\n")
        def check(label: String, ok: Boolean): Unit = {
          md.append(s"- ${if (ok) "PASS" else "FAIL"}: $label\n")
          if (!ok) failures += 1
        }
        check("AQE skew-join split engaged (skew=true marker on the join)",
          plan.contains("skew=true"))
        check("skewed shuffle read split into multiple sub-partitions",
          plan.contains("AQEShuffleRead") && plan.contains("skewed"))
        md.append("\n")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    md.append(s"\nAutomated checks failed: $failures\n")
    java.nio.file.Files.write(java.nio.file.Paths.get("PLANS.md"),
      md.toString.getBytes("UTF-8"))
    println(s"PLANS.md written; failures=$failures")
    spark.stop()
  }
}
