package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.lake.{ResumableRun, SnapshotLog}
import graft.pipeline.Pipeline
import graft.streaming.StreamPipeline

/** End-to-end Spark job tests: resumable lake runs, streaming, salting,
  * metrics. One shared local session (startup is the expensive part). */
class SparkJobsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-test").toString

  private def pages = Pipeline.pages(spark, "/root/testdata/sf0.001").cache()

  test("resumable run: killed run resumes at bucket granularity, result equals full run") {
    val p = pages
    val nBuckets = 8

    // reference: one uninterrupted run
    val fullDir = tmp()
    val full = ResumableRun.run(spark, p, fullDir, nBuckets)
    assert(full == (0 until nBuckets).toVector)
    val fullRows = ResumableRun.readTable(spark, fullDir)
      .select("url", "extracted_text").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap

    // "killed" run: only 3 buckets commit, then the process dies
    val dir = tmp()
    val first = ResumableRun.run(spark, p, dir, nBuckets, maxBuckets = 3)
    assert(first.size == 3)
    assert(new SnapshotLog(dir).committedBuckets() == first.toSet)

    // resume: processes exactly the remaining buckets
    val second = ResumableRun.run(spark, p, dir, nBuckets)
    assert(second.size == nBuckets - 3)
    assert((first ++ second).toSet == (0 until nBuckets).toSet)

    // third run: nothing left to do
    assert(ResumableRun.run(spark, p, dir, nBuckets).isEmpty)

    // content identical to the uninterrupted run (byte-identical per url)
    val resumedRows = ResumableRun.readTable(spark, dir)
      .select("url", "extracted_text").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(resumedRows == fullRows)
    assert(resumedRows.size == 500)

    // time travel: snapshot v3 (after the "killed" run) sees exactly the
    // first 3 committed buckets' rows; latest sees all 500
    val asOf3 = ResumableRun.readTableAsOf(spark, dir, 3)
    val expected3 = ResumableRun.readTable(spark, dir)
      .withColumn("b", Pipeline.saltedBucket(Pipeline.hotDomains(p).keySet, nBuckets))
      .filter(col("b").isin(first.map(Integer.valueOf): _*))
      .count()
    assert(asOf3.count() == expected3)
    assert(asOf3.count() < 500)
  }

  test("salted bucketing bounds hot-domain skew") {
    val p = pages
    val nBuckets = 16
    val hot = Pipeline.hotDomains(p)
    assert(hot.keySet == Set("big.example.com", "hub.example.org"),
      s"expected the synth hot domains, got $hot")
    // with salting: no bucket holds more than ~3x the mean
    val withB = p.withColumn("b", Pipeline.saltedBucket(hot.keySet, nBuckets))
    val sizes = withB.groupBy("b").count().collect().map(_.getLong(1))
    val mean = sizes.sum.toDouble / nBuckets
    assert(sizes.max < mean * 3, s"salted max=${sizes.max} mean=$mean")
    // without salting (domain hash only): the hot domains pile into 2 buckets
    val noSalt = p.withColumn("b", Pipeline.saltedBucket(Set.empty, nBuckets))
    val worst = noSalt.groupBy("b").count().collect().map(_.getLong(1)).max
    assert(worst > sizes.max, "salting should strictly reduce the max bucket")
  }

  test("streaming extract with AvailableNow processes increments exactly once") {
    val inDir = tmp(); val outDir = tmp() + "/out"; val ckpt = tmp() + "/ckpt"
    val p = pages
    p.filter(col("url").rlike("doc-[0-9]$")).write.mode("append").parquet(inDir)
    StreamPipeline.runExtractAvailableNow(spark, inDir, outDir, ckpt)
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 == 10)
    // append a second batch; rerun with same checkpoint -> only new rows
    p.filter(col("url").rlike("doc-1[0-9]$")).write.mode("append").parquet(inDir)
    StreamPipeline.runExtractAvailableNow(spark, inDir, outDir, ckpt)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 20)
    assert(out.select("url").distinct().count() == 20) // no reprocessing
  }

  test("streaming windowed counts match the batch computation") {
    val inDir = tmp(); val outDir = tmp() + "/out"; val ckpt = tmp() + "/ckpt"
    val p = pages
    // feed time-ordered chunks (how a crawl table actually lands): each file
    // is one micro-batch; the watermark advances between them and append
    // mode emits every closed window with its complete count
    (0 until 4).foreach { chunk =>
      p.filter(col("warc_ts").cast("long").between(
          1700000000L + chunk * 125 * 600, 1700000000L + (chunk + 1) * 125 * 600 - 1))
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    StreamPipeline.runWindowedCounts(spark, inDir, outDir, ckpt)
    // append-mode emits only watermark-closed windows; every emitted row
    // must match the batch aggregation exactly
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = StreamPipeline.windowedCountsBatch(p).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.subsetOf(batch))
    assert(streamed.nonEmpty)
  }

  test("streaming dedup within watermark drops re-crawled duplicates exactly once") {
    val inDir = tmp(); val outDir = tmp() + "/out"; val ckpt = tmp() + "/ckpt"
    val p = pages.filter(col("url").rlike("doc-[0-9]$")).cache() // 10 docs
    p.coalesce(1).write.mode("append").parquet(inDir)
    // same content re-crawled 10 minutes later: same fp, within the 1h
    // watermark -> must be dropped
    p.withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 10 MINUTES"))
      .coalesce(1).write.mode("append").parquet(inDir)
    // genuinely new docs
    pages.filter(col("url").rlike("doc-1[0-9]$")).coalesce(1).write.mode("append").parquet(inDir)
    StreamPipeline.runDedupAvailableNow(spark, inDir, outDir, ckpt)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 20, s"expected 20 unique docs, got ${out.count()}")
    assert(out.select("fp").distinct().count() == 20)
  }

  test("metrics sidecar counts docs and errors per partition") {
    val p = pages.repartition(4)
    val m = Pipeline.metrics(spark, p).collect()
    assert(m.map(_.docs).sum == 500)
    assert(m.map(_.errors).sum == 0)
    assert(m.forall(_.docs_per_sec > 0))
  }

  test("two-pass markdown link re-extraction agrees with the kernel links table") {
    val extracted = Pipeline.extracted(pages).cache()
    val kernelLinks = Pipeline.linksTable(extracted)
      .filter(col("url").endsWith("/doc-7")) // 3-page doc, plain anchors
      .select("page", "anchor", "target").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    // the appended "## Hyperlinks in Document" section re-lists body links
    // (the reference's app_v5 rescan sees them too); compare body-only here
    val twoPass = graft.ops.TwoPass.linksFromMarkdown(
        extracted.filter(col("url").endsWith("/doc-7"))
          .withColumn("extracted_text",
            substring_index(col("extracted_text"), "\n\n## Hyperlinks in Document", 1)))
      .select("page", "anchor", "target").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(kernelLinks.nonEmpty)
    assert(kernelLinks == twoPass)
  }

  test("x_meta_summary equals an independent recomputation (get_metadata_summary analog)") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x_meta_summary")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    // independent recomputation from the extracted table + page bytes,
    // driver-side (reference semantics: metadata_extractor.py:585-599 —
    // presence flags, 'Unknown' application default, Python round(x, 2)
    // i.e. HALF_EVEN on the binary double)
    val meta = Pipeline.extractedCommitted(spark, dir)
      .select(col("url"), col("meta.title"), col("meta.author"),
        col("meta.page_count"), col("meta.keywords"), col("meta.application"))
      .collect().map(r => r.getString(0) -> r).toMap
    val sizes = Pipeline.pages(spark, dir).select(col("url"), length(col("html")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out.keySet == meta.keySet)
    val flagCounts = Array(0, 0, 0) // has_title / has_author / has_keywords
    out.foreach { case (url, r) =>
      val m = meta(url)
      assert(r.getBoolean(1) == (m.getString(1) != ""), s"has_title($url)")
      assert(r.getBoolean(2) == (m.getString(2) != ""), s"has_author($url)")
      assert(r.getInt(3) == m.getInt(3), s"slide_count($url)")
      assert(r.getBoolean(6) == (m.getString(4) != ""), s"has_keywords($url)")
      // verbatim passthrough: the reference's 'Unknown' .get default is
      // dead code (the key is always initialized to '')
      assert(r.getString(7) == m.getString(5), s"application($url)")
      val expMb = new java.math.BigDecimal(sizes(url) / 1048576.0)
        .setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue()
      assert(math.abs(r.getDouble(8) - expMb) < 1e-9, s"file_size_mb($url)")
      if (r.getBoolean(1)) flagCounts(0) += 1
      if (r.getBoolean(2)) flagCounts(1) += 1
      if (r.getBoolean(6)) flagCounts(2) += 1
    }
    // at least one presence flag must show BOTH polarities in the corpus,
    // or the gate can't distinguish flags from constants (every synthetic
    // doc has a title, so the title flag alone is degenerate-true)
    assert(flagCounts.exists(c => c > 0 && c < out.size),
      s"all presence flags degenerate: ${flagCounts.mkString(",")} of ${out.size}")
  }

  test("graft_extract_text / graft_extract_doc Catalyst expressions match the kernel output") {
    graft.plans.ExtractText.register(spark)
    val p = pages.limit(20)
    p.createOrReplaceTempView("pages_v")
    // direct kernel calls on the same rows — the ground truth both
    // expressions must reproduce
    val rows = p.select("url", "html", "text", "warc_ts").collect().map { r =>
      (r.getString(0), r.getAs[Array[Byte]](1), r.getString(2),
        r.getTimestamp(3).getTime * 1000L)
    }
    // text-only scalar expression: kernel WITHOUT warc_ts (no Crawl Date)
    val viaText = spark.sql(
      "SELECT url, graft_extract_text(html, text) AS t FROM pages_v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (url, html, text, _) =>
      assert(viaText(url) == graft.extract.Extractor.extract(html, text).extractedText,
        s"graft_extract_text diverged for $url")
    }
    // full-struct hot-path expression (what Pipeline.extracted plans):
    // kernel WITH warc_ts
    val viaDoc = Pipeline.extracted(p)
      .select("url", "extracted_text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (url, html, text, tsUs) =>
      assert(viaDoc(url) == graft.extract.Extractor.extract(html, text, tsUs).extractedText,
        s"graft_extract_doc diverged for $url")
    }
    assert(viaText.size == 20 && viaDoc.size == 20)
  }

  test("graft_fix_url native codegen expression matches UrlFix and stays in WholeStageCodegen") {
    graft.plans.FixUrl.register(spark)
    val sp = spark
    import sp.implicits._
    // vector equality vs the Scala implementation (local relation —
    // Catalyst constant-folds it, which itself exercises interpreted eval)
    val raw = Seq("www.example.com", "test@example.com", "https://x.io/p",
      "#frag", "tel:+441234", "example.org/a b", "", "localhost/x")
    val got = raw.toDF("u").selectExpr("u", "graft_fix_url(u) AS fixed")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    raw.foreach(u => assert(got(u) == graft.extract.UrlFix.fixUrl(u), s"for '$u'"))
    // true doGenCode: over a real scan the projection stays inside
    // WholeStageCodegen (no interpreted-eval row boundary)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("concat('www.x-', doc_id, '.com') AS u")
      .selectExpr("graft_fix_url(u) AS fixed")
    // "*(1)" is the WholeStageCodegen stage marker: the Project carrying
    // our expression compiles into codegen stage 1 (no fallback boundary)
    val plan = docs.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_fix_url"), plan)
    assert(docs.collect().forall(_.getString(0).startsWith("https://www.x-")))
    // null propagates as null (UnaryExpression null-safe path)
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(1).selectExpr("CAST(NULL AS STRING) AS u")
      .selectExpr("graft_fix_url(u) AS fixed").collect()
    assert(n.head.isNullAt(0))
  }

  test("stateful streaming sessionization emits closed sessions matching batch") {
    val inDir = tmp(); val outDir = tmp() + "/out"; val ckpt = tmp() + "/ckpt"
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // 4 time-ordered chunks (events are roughly time-ordered by event_id)
    (0 until 4).foreach { chunk =>
      events.filter(col("event_id") >= chunk * 250 && col("event_id") < (chunk + 1) * 250)
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    graft.streaming.Sessionize.run(spark, inDir, outDir, ckpt)
    val streamed = spark.read.parquet(outDir)
      .select("user_id", "start_us", "end_us", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty)
    // every emitted session must appear in the batch sessionization
    val batch = SparkEntry.queries("q_sessionize")(spark, "/root/testdata/sf0.001")
      .select("user_id", "start_us", "end_us", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.subsetOf(batch),
      s"streamed sessions not in batch: ${streamed.diff(batch).take(3)}")
  }

  test("sessionize updateState min-merges an out-of-order event within the watermark") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.Sessionize
    import graft.streaming.Sessionize.{Ev, SessionState}
    def ev(sec: Long) = Ev(7L, new java.sql.Timestamp(sec * 1000L))
    // stored session: [2000s, 2500s], 2 events; a late event at 1800s arrives
    // in a later micro-batch (within the 30-min gap of end_us)
    val state = TestGroupState.create[SessionState](
      org.apache.spark.api.java.Optional.of(
        SessionState(2000L * 1000000L, 2500L * 1000000L, 2)),
      GroupStateTimeout.EventTimeTimeout(), 0L,
      org.apache.spark.api.java.Optional.of(1000L * 1000L), false)
    val out = Sessionize.updateState(7L, Iterator(ev(1800L)), state).toVector
    assert(out.isEmpty) // session extends, nothing closes
    val s = state.get
    assert(s.start_us == 1800L * 1000000L, "late event must lower session start")
    assert(s.end_us == 2500L * 1000000L)
    assert(s.n == 3)
  }

  test("DataSource V2 pages connector equals Pipeline.pages and prunes columns") {
    val dir = "/root/testdata/sf0.001"
    val dsv2 = spark.read.format("graft.sources.PagesDataSource")
      .option("path", dir).load()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("url", "unix_micros(warc_ts) AS ts", "md5(html) AS h", "text", "lang")
        .collect().map(_.toSeq).toSet
    // cross-check against the INDEPENDENT typed-map formulation
    // (Pipeline.pages itself is the connector since round 4)
    assert(key(dsv2) == key(Pipeline.pagesTyped(spark, dir)))
    // column pruning reaches the connector: html/text dropped from the scan
    val pruned = dsv2.select("url", "lang")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("required=url,lang"), scanDesc)
    assert(pruned.count() == 500)
    // aggregates work over the connector
    val langs = dsv2.groupBy("lang").count().collect().map(_.getLong(1)).sum
    assert(langs == 500)
    // filter pushdown reaches the connector (applied pre-body-synthesis)
    // and agrees with the un-pushed Dataset-map path
    val filtered = dsv2.filter(col("lang") === "en" &&
      col("url").startsWith("https://site-"))
    val desc = filtered.queryExecution.executedPlan.toString
    assert(desc.contains("EqualTo(lang,en)") && desc.contains("StringStartsWith(url,https://site-"), desc)
    val expected = Pipeline.pagesTyped(spark, dir)
      .filter(col("lang") === "en" && col("url").startsWith("https://site-"))
      .select("url").collect().map(_.getString(0)).toSet
    assert(filtered.select("url").collect().map(_.getString(0)).toSet == expected)
    assert(expected.nonEmpty)
  }

  test("pages connector sub-slices seed row groups for kernel parallelism") {
    val dir = "/root/testdata/sf0.001"
    // 500 seed rows at the 256-row default => 2 input partitions (round 4:
    // a single partition made small-corpus extraction single-threaded)
    val n = Pipeline.pages(spark, dir).rdd.getNumPartitions
    assert(n == 2, s"expected 2 slices for 500 rows @256, got $n")
    val n2 = spark.read.format("graft.sources.PagesDataSource")
      .option("path", dir).option("sliceRows", "100").load()
      .rdd.getNumPartitions
    assert(n2 == 5, s"expected 5 slices for 500 rows @100, got $n2")
  }

  test("bucketed tables co-locate the join: no Exchange on either side") {
    // the SCALE.md bucketing claim, demonstrated: two tables bucketBy'd on
    // the join key into the same bucket count join WITHOUT any shuffle —
    // the storage layout IS the partitioning (at 100 TB this is the
    // difference between a one-off layout cost and a per-query shuffle
    // of the fact table)
    val wh = tmp()
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$wh'")
    try {
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_bkt.orders_b")
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_bkt.lineitem_b")
      // hint("merge") keeps AQE from broadcasting the (tiny at test sf)
      // build side — at real scale both sides are fact-sized and SMJ is
      // what the bucketing exists for
      val j = spark.table("graft_bkt.orders_b").hint("merge")
        .join(spark.table("graft_bkt.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // neither join key is ever repartitioned — the bucketed layout IS the
      // partitioning (the only Exchange allowed is the groupBy above)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle either side:\n$plan")
      // sanity: result matches the unbucketed computation
      val expected = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt.orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_bkt.lineitem_b")
      spark.sql("DROP DATABASE IF EXISTS graft_bkt")
    }
  }

  test("pages round-trip through csv/json sources; links csv sink (S10)") {
    val p = pages.limit(50).cache()
    val csvDir = tmp() + "/pages_csv"
    graft.sources.PagesSource.writeCsv(p, csvDir)
    val backCsv = graft.sources.PagesSource.readCsv(spark, csvDir)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("url", "md5(html) AS h", "text", "lang").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(key(backCsv) == key(p))
    val jsonDir = tmp() + "/pages_json"
    graft.sources.PagesSource.writeJson(p, jsonDir)
    assert(key(graft.sources.PagesSource.readJson(spark, jsonDir)) == key(p))
    val links = Pipeline.linksTable(Pipeline.extracted(p))
    val linksDir = tmp() + "/links_csv"
    graft.sources.PagesSource.writeLinksCsv(links, linksDir)
    val back = graft.sources.PagesSource.readLinksCsv(spark, linksDir)
    assert(back.count() == links.count())
    assert(back.collect().map(_.toSeq).toSet == links.collect().map(_.toSeq).toSet)
  }

  test("custom TopKPerKey operator matches the window formulation, without a Sort") {
    import org.apache.spark.sql.graftbridge.GraftBridge
    import org.apache.spark.sql.expressions.{Window => W}
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val viaCustom = GraftBridge.topKPerKey(orders, Seq("o_custkey"), "o_totalprice", 3)
    // tie-safety: compare (custkey -> multiset of prices), not orderkeys
    val customSet = viaCustom.select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val w = W.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(customSet == viaWindow)
    // plan shape: map-side partial heap -> hash exchange -> final heap, and
    // NO Sort node (VERDICT r4 #5: at most k rows per key per input
    // partition cross the shuffle)
    val plan = viaCustom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"missing map-side partial:\n$plan")
    assert(plan.contains("TopKPerKey"))
    assert(plan.contains("Exchange"))
    assert(!plan.contains("Sort"), s"custom top-k must not sort:\n$plan")
    // the exchange must sit BETWEEN final and partial (partial below it)
    val iFinal = plan.indexOf("TopKPerKey ")
    val iEx = plan.indexOf("Exchange")
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    assert(iFinal >= 0 && iFinal < iEx && iEx < iPartial,
      s"expected final > Exchange > partial ordering:\n$plan")
    // memory fallback: with the partial capped to 4 keys, overflow-key rows
    // pass through un-heaped and the clustered final still prunes exactly
    spark.conf.set("spark.graft.topk.maxPartialKeys", "4")
    try {
      val viaCapped = GraftBridge.topKPerKey(orders, Seq("o_custkey"), "o_totalprice", 3)
        .select("o_custkey", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(viaCapped == viaWindow, "capped partial changed the result")
    } finally spark.conf.unset("spark.graft.topk.maxPartialKeys")
    // k <= 0 is rejected at plan construction, not an executor NPE
    intercept[IllegalArgumentException] {
      GraftBridge.topKPerKey(orders, Seq("o_custkey"), "o_totalprice", 0)
    }
  }

  test("dd_embed_neardup (banded LSH + exact rerank) equals brute force, no BNLJ") {
    val dir = "/root/testdata/sf0.001"
    val lsh = SparkEntry.queries("dd_embed_neardup")(spark, dir)
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup must not contain an all-pairs join:\n$plan")
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same twin-augmented corpus
    val e = graft.ops.Ann.withTwins(spark.read.parquet(s"$dir/embeddings.parquet"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ae"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("be"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim", graft.ops.Ann.cosine(col("ae"), col("be")))
      .filter(col("sim") >= 0.92)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"LSH pair set diverged: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(got.size == 100) // one twin pair per vec_id % 5 == 0 in 500 vecs
    assert(got.forall { case (x, y) => y == x + graft.ops.Ann.TwinOffset })
  }

  test("ann_lsh surfaces the planted twin at rank 1 for every twinned query") {
    val out = SparkEntry.queries("ann_lsh")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val rank1 = out.collect { case (q, 1, c) => q -> c }.toMap
    // queries are vec_id < 10; those with twins (vec_id % 5 == 0): 0 and 5
    Seq(0L, 5L).foreach { q =>
      assert(rank1.get(q).contains(q + graft.ops.Ann.TwinOffset),
        s"query $q: expected twin at rank 1, got ${rank1.get(q)}")
    }
  }

  test("ann_ivf recall@5 vs brute-force ann_topk is at least 0.65") {
    val dir = "/root/testdata/sf0.001"
    def top5(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = top5("ann_topk")
    val ivf = top5("ann_ivf")
    val recalls = exact.map { case (q, t) => ivf.getOrElse(q, Set.empty).intersect(t).size / 5.0 }
    val mean = recalls.sum / recalls.size
    // VERDICT r5 #6: pinned just below the bracketed measurement (~0.74)
    // instead of the original 0.5 slack — a 30% recall regression (e.g.
    // nprobe dropping to 1, which measures 0.52) now fails the gate
    assert(mean >= 0.65, s"ann_ivf mean recall@5 = $mean (per-query: $recalls)")
  }

  test("dd_minhash_lsh and dd_simhash surface planted mutated-copy twins") {
    // The rows-only CI class that bit round 1's ann_lsh (recall silently 0):
    // plant near-duplicates — long docs with one appended token — and assert
    // both hash-banding queries still surface them (VERDICT r2 next-round #6).
    val dir = tmp()
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val twins = base
      .filter(col("doc_id") % 25 === 0)
      .filter(size(split(col("text"), "\\s+")) >= 60)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
    val planted = twins.select(col("doc_id") - 100000L).collect().map(_.getLong(0)).toSet
    assert(planted.size >= 5, s"gate corpus too small: $planted")
    base.unionAll(twins).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // minhash gate: every planted pair must appear among the LSH candidates
    // (one appended token on a 60+-token doc => shingle Jaccard >= 0.98,
    // per-4-row-band agreement ~0.93, miss probability ~2e-5 over 4 bands)
    val pairs = SparkEntry.queries("dd_minhash_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    planted.foreach(id => assert(pairs.contains((id, id + 100000L)),
      s"dd_minhash_lsh missed planted twin pair ($id, ${id + 100000L})"))

    // dd_jaccard_lsh gate (round 4 — the scale path for exact Jaccard):
    // every planted pair must surface from the LSH candidates with its
    // EXACT 3-gram shingle Jaccard, and the value must equal an
    // INDEPENDENT string-shingle-set recomputation (the query works over
    // distinct shingle hashes; equality also certifies no collision)
    val jl = SparkEntry.queries("dd_jaccard_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val textOf = base.unionAll(twins)
      .filter(col("doc_id").isin((planted ++ planted.map(_ + 100000L)).toSeq.map(Long.box): _*))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def shset(t: String): Set[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty)
      if (w.isEmpty) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    planted.foreach { id =>
      val j = jl.get((id, id + 100000L))
      assert(j.isDefined && j.get >= 0.9,
        s"dd_jaccard_lsh missed/underrated planted pair ($id): $j")
      val a = shset(textOf(id)); val b = shset(textOf(id + 100000L))
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      assert(math.abs(j.get - exact) <= 5e-5,
        s"dd_jaccard_lsh($id) = ${j.get}, independent exact = $exact")
    }

    // simhash gate: twins stay within hamming distance 3 and (pigeonhole at
    // <=3 flipped bits over 4 bands) share at least one 16-bit band bucket
    val sh = SparkEntry.queries("dd_simhash")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), (2 to 5).map(r.getLong))).toMap
    planted.foreach { id =>
      val (h1, b1) = sh(id); val (h2, b2) = sh(id + 100000L)
      val ham = java.lang.Long.bitCount(h1 ^ h2)
      assert(ham <= 3, s"simhash hamming($id, twin) = $ham")
      assert(b1.zip(b2).exists { case (x, y) => x == y },
        s"simhash twin $id shares no band bucket")
    }
  }

  test("LSH dedup collapses exact-duplicate clusters: candidates stay flat, pairs expand exactly") {
    // VERDICT r4 #2: a big exact-duplicate cluster (mirrors/boilerplate — the
    // dominant real-world web-dedup skew mode) must NOT produce |cluster|^2
    // candidate pairs in the band self-join. Plant a ~1000-copy cluster and
    // assert (a) the rep-level candidate relation is IDENTICAL to the
    // corpus without the copies (the cluster collapses onto its existing
    // representative), (b) the expanded output still contains every
    // within-cluster pair and every cross pair — same semantics as banding
    // every doc, minus the quadratic join.
    val dir = tmp()
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val srcRow = base.filter(size(split(col("text"), "\\s+")) >= 60)
      .orderBy("doc_id").limit(1).collect()(0)
    val srcId = srcRow.getLong(0)
    val copies = spark.range(1000)
      .select((col("id") + 200000L).as("doc_id"), lit(srcRow.getString(1)).as("text"))
    base.unionAll(copies).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def prep(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), col("text"),
        filter(split(col("text"), " "), x => length(x) > 0).as("t"))
      .filter(size(col("t")) > 0)
    val groupsBase = OpsQueries.minhashGroups(prep(base), 3, 16)
    val groupsBig = OpsQueries.minhashGroups(
      prep(spark.read.parquet(s"$dir/documents.parquet")), 3, 16)
    // the 1000 copies join srcId's content group: distinct-content count unchanged
    assert(groupsBig.count() == groupsBase.count())
    val clusterMembers = groupsBig.filter(col("doc_id") === srcId)
      .select(size(col("members"))).first.getInt(0)
    assert(clusterMembers >= 1001, s"cluster not collapsed onto $srcId: $clusterMembers")
    // rep-level band candidates: EXACTLY the no-copies candidate set
    val candBase = OpsQueries.repCandidates(
      OpsQueries.bandBuckets(groupsBase, 16, 4)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val candBig = OpsQueries.repCandidates(
      OpsQueries.bandBuckets(groupsBig, 16, 4)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candBig == candBase,
      s"planted copies changed the rep-level candidate set: ${candBig.size} vs ${candBase.size}")

    // expanded output: every within-cluster pair present, count exact
    val out = SparkEntry.queries("dd_minhash_lsh")(spark, dir)
    val inCluster = (id: org.apache.spark.sql.Column) =>
      id === srcId || (id >= 200000L && id < 201000L)
    val withinCount = out.filter(inCluster(col("a_id")) && inCluster(col("b_id"))).count()
    val n = clusterMembers.toLong
    assert(withinCount == n * (n - 1) / 2,
      s"expected ${n * (n - 1) / 2} within-cluster pairs, got $withinCount")
    assert(out.filter(col("a_id") === srcId && col("b_id") === 200000L).count() == 1)
    assert(out.filter(col("a_id") === 200000L && col("b_id") === 200001L).count() == 1)

    // dd_jaccard_lsh: within-cluster pairs carry jaccard exactly 1.0
    val jOut = SparkEntry.queries("dd_jaccard_lsh")(spark, dir)
      .filter(col("a_id") === 200000L && col("b_id") === 200001L).collect()
    assert(jOut.length == 1 && jOut(0).getDouble(2) == 1.0, jOut.mkString(";"))

    // embedding edition: 200 copies of one vector (ids chosen % 5 != 0 so
    // withTwins adds no twins for them) — output grows by exactly the
    // within-cluster pair count, candidates stay at the no-copies set size
    val eBase = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val srcEmb = eBase.filter(col("vec_id") === 3L).select("embedding")
    val eCopies = spark.range(200).crossJoin(srcEmb)
      .select((col("id") * 5 + 300001L).as("vec_id"), col("embedding"))
    eBase.unionAll(eCopies).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val embOutBase = SparkEntry.queries("dd_embed_neardup")(spark, "/root/testdata/sf0.001").count()
    val embOut = SparkEntry.queries("dd_embed_neardup")(spark, dir)
    val m = 201L // vec 3 + 200 copies share one identical vector
    assert(embOut.count() == embOutBase + m * (m - 1) / 2,
      s"embed expansion off: ${embOut.count()} vs $embOutBase + ${m * (m - 1) / 2}")
    assert(embOut.filter(col("a_id") === 3L && col("b_id") === 300001L).count() == 1)
  }

  test("bucket-width cap bounds near-identical non-byte-equal pile-ups") {
    // the residual hazard the md5(text) collapse cannot reach: whitespace
    // variants have different raw text (distinct reps) but identical token
    // sequences, hence identical signatures — one bucket, quadratic again.
    // The maxBucket count pre-pass must drop the overflow bucket's pairs
    // while leaving every other candidate untouched.
    val sp = spark
    import sp.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 100)
    val srcRow0 = base.filter(size(split(col("text"), "\\s+")) >= 40)
      .orderBy("doc_id").limit(1).collect()(0)
    val srcId0 = srcRow0.getLong(0) // same tokens as the variants: in-cluster
    val srcText = srcRow0.getString(1)
    val variants = (0 until 150).map(k => (600000L + k, srcText + (" " * (k + 1))))
    val d = base.unionAll(variants.toDF("doc_id", "text"))
      .select(col("doc_id"), col("text"),
        filter(split(col("text"), " "), x => length(x) > 0).as("t"))
      .filter(size(col("t")) > 0)
    val groups = OpsQueries.minhashGroups(d, 3, 16)
    // distinct raw texts => the collapse does NOT merge the variants
    assert(groups.filter(col("doc_id") >= 600000L).count() == 150)
    val bands = OpsQueries.bandBuckets(groups, 16, 4)
    def inC(id: Long) = id == srcId0 || id >= 600000L // 151-member pile-up
    val uncapped = OpsQueries.repCandidates(bands).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count { case (a, b) => inC(a) && inC(b) } ==
      151 * 150 / 2, "expected the quadratic pile-up without a cap")
    val capped = OpsQueries.repCandidates(bands, maxBucket = Some(64)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => inC(a) && inC(b) },
      "cap must drop the overflow bucket's pairs")
    // every candidate outside the overflow bucket survives unchanged
    assert(capped == uncapped.filterNot { case (a, b) => inC(a) && inC(b) })
  }

  test("collapsed LSH banding equals direct banding of every doc (pair-set identity)") {
    // implementation-independent gate for the duplicate-cluster collapse:
    // on a corpus with duplicate clusters of sizes 1/2/3/7, the collapsed
    // pipeline's output pair set must EQUAL banding every doc directly
    // (the pre-round-5 formulation, reconstructed here from the same
    // primitives)
    val sp = spark
    import sp.implicits._
    val dir = tmp()
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 120)
    val srcs = base.filter(size(split(col("text"), "\\s+")) >= 40)
      .orderBy("doc_id").limit(3).collect()
    assert(srcs.length == 3)
    val clusters = Seq(srcs(0) -> 1, srcs(1) -> 2, srcs(2) -> 6).zipWithIndex
      .flatMap { case ((r, n), ci) =>
        (0 until n).map(k => (500000L + ci * 1000L + k, r.getString(1)))
      }
    base.unionAll(clusters.toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val collapsed = SparkEntry.queries("dd_minhash_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // direct banding of EVERY doc (no collapse) — the reference formulation
    val nHashes = 16; val bandRows = 4
    val every = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => length(x) > 0).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"),
        OpsQueries.minhashFused(col("t"), 3, nHashes).as("sigs"))
    val direct = OpsQueries.repCandidates(
      OpsQueries.bandBuckets(every, nHashes, bandRows)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collapsed == direct,
      s"collapse changed the pair set: only-collapsed=${(collapsed -- direct).take(5)} " +
        s"only-direct=${(direct -- collapsed).take(5)}")
    // sanity: the planted clusters actually produced within-pairs
    assert(collapsed.contains((501000L, 501001L)) && collapsed.contains((502000L, 502005L)))
  }

  test("native graft_cosine matches the HOF formulation and plans into WholeStageCodegen") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val x = e.select(col("vec_id").as("id"), col("embedding").as("ae"))
    val y = e.select((col("vec_id") - 1).as("id"), col("embedding").as("be"))
    val j = x.join(y, "id")
    val maxDiff = j.select(abs(graft.ops.Ann.cosine(col("ae"), col("be")) -
        graft.ops.Ann.cosineHof(col("ae"), col("be"))).as("d"))
      .agg(max(col("d"))).first.getDouble(0)
    assert(maxDiff <= 1e-12, s"native cosine diverged from HOF by $maxDiff")
    // the fused loop must sit INSIDE a WholeStageCodegen stage ("*(" marker);
    // run the query first so AQE materializes the FINAL plan (the lazy plan
    // prints isFinalPlan=false without codegen stage markers)
    val q = j.select(graft.ops.Ann.cosine(col("ae"), col("be")).as("s"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.split("\n").exists(l =>
      l.contains("graft_cosine") && l.trim.stripPrefix("+- ").startsWith("*(")), plan)
    // null ELEMENTS yield NaN (round-5 review: the SQL-registered cosine
    // previously read undefined bytes on a null slot); non-null arrays of
    // a containsNull=true type still compute exactly
    val sp2 = spark
    import sp2.implicits._
    val nd = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](1.0, 0.0), Seq[java.lang.Double](1.0, 0.0)))
      .toDF("a", "b")
      .select(graft.ops.Ann.cosine(col("a"), col("b")).as("s")).collect()
    assert(nd(0).getDouble(0).isNaN)
    assert(math.abs(nd(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("fused HyperplaneSigs equals the per-band unfused signature formulation") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bands = 6; val r = 12; val dims = 64
    val fused = graft.ops.Ann.bandedSigs(e, bands, r, dims)
      .select("vec_id", "band", "sig").collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x.getInt(2)).toMap
    val unfused = e.select(col("vec_id"),
        explode(array((0 until bands).map(b => struct(lit(b).as("band"),
          graft.ops.Ann.bandSig(col("embedding"), b, r, dims).as("sig"))): _*)).as("bs"))
      .select(col("vec_id"), col("bs.band"), col("bs.sig")).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x.getInt(2)).toMap
    assert(fused.size == unfused.size && fused.size == 500 * bands)
    assert(fused == unfused)
  }

  test("stream-static broadcast enrichment joins the hot-domain dim without shuffling the stream") {
    val sp = spark
    import sp.implicits._
    val inDir = tmp(); val outDir = tmp() + "/out"; val ckpt = tmp() + "/ckpt"
    pages.write.mode("append").parquet(inDir)
    val hotDim = Pipeline.hotDomains(pages).keySet.toSeq.toDF("domain")
      .withColumn("is_hot", lit(true))
    StreamPipeline.runEnrichAvailableNow(spark, inDir, hotDim, outDir, ckpt)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 500)
    val hotRows = out.filter(col("is_hot")).select("domain").distinct()
      .collect().map(_.getString(0)).toSet
    assert(hotRows == Set("big.example.com", "hub.example.org"))
    assert(out.filter(!col("is_hot")).count() > 0)
  }

  test("fused CentroidArgsort equals the literal struct-sort ranking") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.ops.Ann.trainCentroids(e, k = 16, iters = 1)
    val fused = e.select(col("vec_id"),
        graft.ops.Ann.centroidRanking(col("embedding"), cents).as("rk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val literal = e.select(col("vec_id"),
        graft.ops.Ann.centroidRankingLiteral(col("embedding"), cents).as("rk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(fused.size == 500)
    assert(fused == literal)
  }

  test("extraction plan is a single narrow map stage (no shuffle)") {
    val plan = Pipeline.extracted(pages)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction plan must not shuffle:\n$plan")
  }

  test("fused graft_simhash64 equals the 64-fold HOF formulation") {
    val sp = spark
    import sp.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => length(x) > 0).as("t"))
      .withColumn("hashes", transform(col("t"), x => xxhash64(x)))
    val both = d.select(col("doc_id"),
      OpsQueries.simhashFused(col("hashes")).as("f"),
      OpsQueries.simhashHof(col("hashes")).as("h")).cache()
    assert(both.count() == 500)
    assert(both.filter(col("f") =!= col("h")).count() == 0,
      "fused simhash diverged from the HOF formulation")
    // empty token list => all votes 0 => fingerprint 0 (typed Dataset: the
    // Seq[Long] encoder gives containsNull=false, which the expression now
    // REQUIRES — a containsNull array is an analysis error, ADVICE r4)
    val empty = Seq(Seq.empty[Long]).toDF("hashes")
      .select(OpsQueries.simhashFused(col("hashes")).as("f"))
      .first.getLong(0)
    assert(empty == 0L)
    // the stricter input check: containsNull=true arrays are rejected up
    // front instead of silently hashing garbage
    val err = intercept[Exception] {
      spark.sql("SELECT CAST(array() AS array<bigint>) AS hashes")
        .select(OpsQueries.simhashFused(col("hashes")).as("f")).collect()
    }
    assert(err.getMessage.contains("non-null elements"), err.getMessage)
    both.unpersist()
  }

  test("fused graft_minhash_sigs equals the pure-Column xxhash64 reference formulation") {
    val sp = spark
    import sp.implicits._
    val toks = filter(split(col("text"), " "), x => length(x) > 0)
    // real corpus docs + the short/empty edge cases the kernel must define
    val edge = Seq((100001L, "one"), (100002L, "two words"),
      (100003L, ""), (100004L, "   "), (100005L, "exactly three tokens"))
      .toDF("doc_id", "text")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).unionAll(edge)
      .select(col("doc_id"), toks.as("t"))
    val both = d.select(col("doc_id"),
      OpsQueries.minhashFused(col("t"), 3, 16).as("f"),
      OpsQueries.minhashRef(col("t"), 3, 16).as("r")).cache()
    assert(both.count() == 505)
    val diff = both.filter(not(col("f") === col("r")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
    // empty docs carry the Long.MaxValue sentinel in every position
    val empty = both.filter(col("doc_id") >= 100003L && col("doc_id") <= 100004L)
      .select(col("f")).collect()
    assert(empty.length == 2 &&
      empty.forall(_.getSeq[Long](0).forall(_ == Long.MaxValue)))
    both.unpersist()
    // generic k (ADVICE r4): at k=5, docs with 1..4 tokens hit the
    // short-doc branch — fused and Column-reference formulations must agree
    // there too (the old reference silently emitted NO shingle for 3..4)
    val short5 = Seq((1L, "one"), (2L, "two words"), (3L, "exactly three tokens"),
      (4L, "now four whole tokens"), (5L, "and here five whole tokens"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        OpsQueries.minhashFused(col("t"), 5, 8).as("f"),
        OpsQueries.minhashRef(col("t"), 5, 8).as("r"))
    val diff5 = short5.filter(not(col("f") === col("r")))
    assert(diff5.count() == 0, diff5.collect().mkString("; "))
    assert(short5.filter(size(col("f")) =!= 8).count() == 0)
  }

  test("HyperplaneSigs min-length semantics pinned against the unfused formulation on truncated embeddings") {
    // ADVICE r3: length-mismatched embeddings use min-length partial dots —
    // the same semantics as the DotProduct-based unfused bandSig. Pin the
    // fused == unfused equality on 48-of-64-dim arrays explicitly.
    val bands = 6; val r = 12; val dims = 64
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50).select(col("vec_id"), slice(col("embedding"), 1, 48).as("embedding"))
    val fused = graft.ops.Ann.bandedSigs(e, bands, r, dims)
      .select("vec_id", "band", "sig").collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x.getInt(2)).toMap
    val unfused = e.select(col("vec_id"),
        explode(array((0 until bands).map(b => struct(lit(b).as("band"),
          graft.ops.Ann.bandSig(col("embedding"), b, r, dims).as("sig"))): _*)).as("bs"))
      .select(col("vec_id"), col("bs.band"), col("bs.sig")).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x.getInt(2)).toMap
    assert(fused.size == 50 * bands)
    assert(fused == unfused)
  }

  test("chunked resumable run commits per chunk and equals the single-job table") {
    val p = pages
    val nBuckets = 8
    val dir = tmp()
    val done = ResumableRun.run(spark, p, dir, nBuckets, chunkBuckets = 3)
    assert(done == (0 until nBuckets).toVector)
    val got = ResumableRun.readTable(spark, dir)
      .select("url", "extracted_text").collect()
      .map(rw => (rw.getString(0), rw.getString(1))).toMap
    val expected = Pipeline.extracted(p)
      .select("url", "extracted_text").collect()
      .map(rw => (rw.getString(0), rw.getString(1))).toMap
    assert(got == expected)
    // every bucket still committed individually (resume granularity in the
    // log is unchanged; the chunking bounds work LOST to a mid-job kill)
    assert(new SnapshotLog(dir).latestVersion() == nBuckets)
  }

  test("resumable run on empty input commits schema-bearing buckets; readTable still works") {
    // ADVICE r3: an all-empty-bucket table used to have no parquet footers
    // to infer schema from, so readTable failed on an empty input
    val dir = tmp()
    val none = pages.filter(lit(false))
    ResumableRun.run(spark, none, dir, nBuckets = 4)
    val t = ResumableRun.readTable(spark, dir)
    assert(t.count() == 0)
    assert(t.schema.fieldNames.toSet.contains("extracted_text"))
  }

  test("bucket-stats pruning skips whole buckets on a clustered column; compaction carries stats") {
    // VERDICT r4 #6: manifests record per-bucket (url, lang) min/max at
    // commit time; a read with a pushable bound opens only buckets whose
    // bounds may match. Pruning needs the column CLUSTERED with the bucket
    // (the Iceberg reality too), so give each lang its own domain — the
    // salted bucket is a domain hash, keeping each bucket lang-narrow.
    import graft.lake.ColBound
    val dir = tmp()
    val p = pages
    // partition spec clustering lang with the bucket (the configurable-spec
    // path — the default salted url-hash spec defeats min/max pruning by
    // construction, like any hash partitioning)
    ResumableRun.run(spark, p, dir, nBuckets = 16,
      bucketExpr = Some(pmod(xxhash64(col("lang")), lit(16))))
    val log = new SnapshotLog(dir)
    val stats = log.bucketStats()
    assert(stats.nonEmpty, "no bucket stats recorded at commit time")
    val langs = p.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.size >= 3, s"corpus too monolingual for the gate: $langs")
    val target = langs.min
    val (kept, skipped) = ResumableRun.prunedPaths(dir, Seq(ColBound("lang", "=", target)))
    assert(skipped.nonEmpty, s"lang=$target pruned nothing: stats=$stats")
    assert(kept.size < log.committedPaths().size,
      s"pruned read must open fewer bucket paths (${kept.size} vs ${log.committedPaths().size})")
    // correctness: pruned read + row filter == full read + row filter
    val full = ResumableRun.readTable(spark, dir)
      .filter(col("lang") === target).select("url").collect().map(_.getString(0)).toSet
    val pruned = ResumableRun.readTablePruned(spark, dir, Seq(ColBound("lang", "=", target)))
      .filter(col("lang") === target).select("url").collect().map(_.getString(0)).toSet
    assert(full.nonEmpty && pruned == full)
    // a bound beyond every recorded max prunes every stats-bearing bucket;
    // the empty-survivor read still carries the table schema
    val beyond = "https://" + "\u007f" // > any "https://<ascii-domain>" url
    val (keptAll, _) = ResumableRun.prunedPaths(dir, Seq(ColBound("url", ">=", beyond)))
    assert(keptAll.size == log.committedPaths().size - stats.size)
    val none = ResumableRun.readTablePruned(spark, dir,
      Seq(ColBound("url", ">=", beyond), ColBound("lang", "=", "zz")))
    assert(none.count() == 0 && none.columns.contains("extracted_text"))
    // compaction re-commits buckets with stats CARRIED FORWARD (same rows)
    val compacted = graft.lake.Compaction.compact(spark, dir, maxFiles = 1)
    if (compacted.nonEmpty) {
      val after = new SnapshotLog(dir).bucketStats()
      assert(after == stats, "compaction must carry bucket stats forward")
      val prunedAfter = ResumableRun.readTablePruned(spark, dir,
        Seq(ColBound("lang", "=", target)))
        .filter(col("lang") === target).select("url").collect().map(_.getString(0)).toSet
      assert(prunedAfter == full)
    }
    // time travel to v1 still resolves (stats do not affect historical reads)
    assert(ResumableRun.readTableAsOf(spark, dir, 1).count() >= 0)

    // time-range pruning: a crawl table partitioned by time window answers
    // "read the recent snapshot" without opening older buckets (warc_ts
    // bounds ride the manifests as fixed-width UTC strings)
    val dirT = tmp()
    ResumableRun.run(spark, p, dirT, nBuckets = 16,
      bucketExpr = Some(pmod(floor(col("warc_ts").cast("long") / 21600L), lit(16))))
    val cut = "2023-11-16 00:00:00" // corpus spans ~3.5 days from 2023-11-14
    val (keptT, skippedT) = ResumableRun.prunedPaths(dirT,
      Seq(ColBound("warc_ts", ">=", cut)))
    assert(skippedT.nonEmpty, "time cut pruned no buckets")
    assert(keptT.size < new SnapshotLog(dirT).committedPaths().size)
    val fullT = ResumableRun.readTable(spark, dirT)
      .filter(col("warc_ts") >= lit(cut).cast("timestamp")).count()
    val prunedT = ResumableRun.readTablePruned(spark, dirT,
      Seq(ColBound("warc_ts", ">=", cut)))
      .filter(col("warc_ts") >= lit(cut).cast("timestamp")).count()
    assert(fullT > 0 && prunedT == fullT)
  }

  test("hash-distributed staging writes one file per bucket; observe-stats equal a recomputation") {
    val dir = tmp()
    ResumableRun.run(spark, pages, dir, nBuckets = 8)
    val log = new SnapshotLog(dir)
    // round 6: staging repartitions by bucket before the partitioned write
    // (Iceberg hash distribution), so each bucket dir holds at most one
    // data file instead of tasks-x-buckets fragments
    log.committedBuckets().foreach { b =>
      assert(graft.lake.Compaction.parquetFiles(log.bucketDataDir(b)).size <= 1,
        s"bucket $b fragmented") }
    // manifest stats now come from observe() on the staging job — they must
    // equal an independent aggregation over the committed data
    val stats = log.bucketStats()
    assert(stats.nonEmpty)
    stats.foreach { case (b, s) =>
      val r = spark.read.parquet(log.bucketDataDir(b).toString)
        .agg(min(col("url")), max(col("url")), min(col("lang")), max(col("lang")),
          date_format(min(col("warc_ts")), "yyyy-MM-dd HH:mm:ss"),
          date_format(max(col("warc_ts")), "yyyy-MM-dd HH:mm:ss")).first()
      assert(s.urlMin == r.getString(0) && s.urlMax == r.getString(1), s"url bounds b=$b")
      assert(s.langMin == r.getString(2) && s.langMax == r.getString(3), s"lang bounds b=$b")
      assert(s.tsMin == r.getString(4) && s.tsMax == r.getString(5), s"ts bounds b=$b")
    }
  }

  test("wide-chunk staging uses the staged-parquet stats fallback and matches the observe path") {
    // a chunk wider than maxObservedBuckets takes the re-read fallback;
    // bounds must come out identical to the observe path modulo bucket ids
    assert(ResumableRun.maxObservedBuckets < 66)
    val dir = tmp()
    ResumableRun.run(spark, pages, dir, nBuckets = 66)
    val stats = new SnapshotLog(dir).bucketStats()
    assert(stats.nonEmpty)
    stats.foreach { case (b, s) =>
      assert(s.urlMin.nonEmpty && s.urlMin <= s.urlMax, s"bucket $b url bounds")
      assert(s.tsMin.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"),
        s"bucket $b ts bound format: '${s.tsMin}'")
    }
    assert(ResumableRun.readTable(spark, dir).count() == 500)
  }

  test("compaction rewrites fragmented buckets; time travel survives; manifest expiry bounds the log") {
    val dir = tmp()
    val nBuckets = 4
    ResumableRun.run(spark, pages, dir, nBuckets)
    val log = new SnapshotLog(dir)
    // round 6: the hash-distributed staging write lays each bucket out as
    // ONE file, so the write itself no longer fragments; fragment a bucket
    // explicitly (the append / maxRecordsPerFile-split history compaction
    // exists for) by re-committing the same rows as 3 files
    val staged0 = log.stagingDir(0)
    spark.read.parquet(log.bucketDataDir(0).toString).repartition(3)
      .write.parquet(staged0.toString)
    log.commitBucket(0, staged0) // same rows: stats carry forward
    val before = ResumableRun.readTable(spark, dir).count()
    assert(before > 0)
    val vPre = log.latestVersion()
    assert((0 until nBuckets).exists(b =>
      graft.lake.Compaction.parquetFiles(log.bucketDataDir(b)).size > 1),
      "test setup: expected at least one fragmented bucket")

    val compacted = graft.lake.Compaction.compact(spark, dir)
    assert(compacted.nonEmpty)
    compacted.foreach(b =>
      assert(graft.lake.Compaction.parquetFiles(log.bucketDataDir(b)).size == 1))
    assert(ResumableRun.readTable(spark, dir).count() == before)
    // time travel to a PRE-compaction version still reads (resolving to the
    // compacted files — the documented manifests-not-data-copies caveat)
    assert(ResumableRun.readTableAsOf(spark, dir, vPre).count() == before)

    val removed = log.expireManifests(keepLast = 2)
    assert(removed.nonEmpty && removed.forall(_ <= log.latestVersion() - 2))
    assert(ResumableRun.readTable(spark, dir).count() == before) // LATEST untouched
    intercept[IllegalArgumentException] {
      ResumableRun.readTableAsOf(spark, dir, removed.head)
    }
  }
}
