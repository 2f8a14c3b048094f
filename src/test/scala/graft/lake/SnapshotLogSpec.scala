package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function vectors for the manifest stats encoding: the JSON
  * escape/parse round trip must survive hostile strings (quotes,
  * backslashes, control chars — all legal in real-crawl urls), and the
  * pruning predicate must stay conservative on non-ASCII and unknown
  * bounds. */
class SnapshotLogSpec extends AnyFunSuite {

  private def roundTrip(stats: Map[Int, BucketStats]): Map[Int, BucketStats] = {
    // uses the PRODUCTION encoder (SnapshotLog.encodeStats), so writer
    // drift fails this spec instead of silently breaking real manifests
    val json = s"""{"version":9,"buckets":[0],"stats":{${SnapshotLog.encodeStats(stats)}}}"""
    SnapshotLog.parseStats(json)
  }

  test("stats escape/parse round-trips hostile strings") {
    val nasty = BucketStats(
      urlMin = """https://a.example/path?q="x"&b=\ slash""",
      urlMax = "https://z.example/control\nnewline",
      langMin = "de", langMax = "fr",
      tsMin = "2023-11-14 22:13:20", tsMax = "2023-11-18 09:33:20")
    val plain = BucketStats("https://a", "https://b", "en", "en")
    val back = roundTrip(Map(3 -> nasty, 11 -> plain))
    assert(back == Map(3 -> nasty, 11 -> plain))
  }

  test("pre-timestamp manifests still parse (ts bounds read as unknown)") {
    val old = """{"version":2,"buckets":[0,4],"stats":{""" +
      """"4":{"url_min":"https://a","url_max":"https://b","lang_min":"en","lang_max":"fr"}}}"""
    val parsed = SnapshotLog.parseStats(old)
    assert(parsed == Map(4 -> BucketStats("https://a", "https://b", "en", "fr", "", "")))
    // unknown ts bounds never prune
    assert(!ColBound("warc_ts", ">=", "2024-01-01 00:00:00").prunes(parsed(4)))
  }

  test("mid-swap crash recovery: replaced-* restores a missing bucket dir, garbage still sweeps") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Files.createTempDirectory("snaplog-test")
    val log = new SnapshotLog(root.toString)
    log.init()
    // commit bucket 3 with one data file
    val staged = root.resolve("_tmp").resolve("3-0-stage")
    Files.createDirectories(staged)
    Files.write(staged.resolve("part-0.parquet"), "ORIGINAL".getBytes("UTF-8"))
    log.commitBucket(3, staged)
    assert(log.committedBuckets() == Set(3))
    // simulate a re-commit killed BETWEEN its two renames: the committed
    // data sits in replaced-3-1, the bucket dir is gone, the new data is
    // still in its stage dir
    val aside = root.resolve("_tmp").resolve("replaced-3-1")
    Files.move(log.bucketDataDir(3), aside, StandardCopyOption.ATOMIC_MOVE)
    val deadStage = root.resolve("_tmp").resolve("3-1-stage")
    Files.createDirectories(deadStage)
    Files.write(deadStage.resolve("part-0.parquet"), "UNCOMMITTED".getBytes("UTF-8"))
    assert(!Files.exists(log.bucketDataDir(3)))

    log.sweepStaleStages()
    // the manifest-referenced data is BACK, byte-identical
    val restored = new String(Files.readAllBytes(
      log.bucketDataDir(3).resolve("part-0.parquet")), "UTF-8")
    assert(restored == "ORIGINAL")
    // the dead stage and the (now consumed) aside dir are gone
    assert(!Files.exists(deadStage) && !Files.exists(aside))

    // a replaced-* whose bucket dir EXISTS is a completed swap's leftover:
    // swept, and the live data untouched
    val leftover = root.resolve("_tmp").resolve("replaced-3-2")
    Files.createDirectories(leftover)
    Files.write(leftover.resolve("part-0.parquet"), "OLD".getBytes("UTF-8"))
    log.sweepStaleStages()
    assert(!Files.exists(leftover))
    assert(new String(Files.readAllBytes(
      log.bucketDataDir(3).resolve("part-0.parquet")), "UTF-8") == "ORIGINAL")
    SnapshotLog.deleteRecursively(root)
  }

  test("two coexisting replaced-* dirs: the HIGHEST version is restored, the stale one swept") {
    import java.nio.file.{Files, StandardCopyOption}
    val root = Files.createTempDirectory("snaplog-test")
    val log = new SnapshotLog(root.toString)
    log.init()
    val staged = root.resolve("_tmp").resolve("5-0-stage")
    Files.createDirectories(staged)
    Files.write(staged.resolve("part-0.parquet"), "V2".getBytes("UTF-8"))
    log.commitBucket(5, staged)
    // simulate the ADVICE r5 scenario: an OLD crashed swap left replaced-5-1
    // (stale data), then a newer re-commit to the same bucket also crashed
    // mid-swap, leaving the current committed data in replaced-5-3
    val stale = root.resolve("_tmp").resolve("replaced-5-1")
    Files.createDirectories(stale)
    Files.write(stale.resolve("part-0.parquet"), "V1-STALE".getBytes("UTF-8"))
    Files.move(log.bucketDataDir(5), root.resolve("_tmp").resolve("replaced-5-3"),
      StandardCopyOption.ATOMIC_MOVE)
    log.sweepStaleStages()
    assert(new String(Files.readAllBytes(
      log.bucketDataDir(5).resolve("part-0.parquet")), "UTF-8") == "V2")
    assert(!Files.exists(stale))
    SnapshotLog.deleteRecursively(root)
  }

  test("ColBound.warcTs renders the instant in UTC regardless of JVM zone") {
    val at = java.time.Instant.parse("2023-11-14T22:13:20Z")
    assert(ColBound.warcTs(">=", at) ==
      ColBound("warc_ts", ">=", "2023-11-14 22:13:20"))
  }

  test("ColBound pruning truth table") {
    val s = BucketStats("https://c.example", "https://m.example", "de", "fr",
      "2023-11-14 00:00:00", "2023-11-15 00:00:00")
    // equality outside [min, max] prunes; inside keeps
    assert(ColBound("lang", "=", "zz").prunes(s))
    assert(ColBound("lang", "=", "aa").prunes(s))
    assert(!ColBound("lang", "=", "en").prunes(s))
    // <= below min prunes; >= above max prunes; overlapping keeps
    assert(ColBound("url", "<=", "https://a").prunes(s))
    assert(ColBound("url", ">=", "https://z").prunes(s))
    assert(!ColBound("url", ">=", "https://d").prunes(s))
    assert(ColBound("warc_ts", ">=", "2023-11-16 00:00:00").prunes(s))
    assert(!ColBound("warc_ts", ">=", "2023-11-14 12:00:00").prunes(s))
    // non-ASCII operands: conservative, never prune
    assert(!ColBound("lang", "=", "über").prunes(s))
    // unsupported column / op rejected eagerly
    intercept[IllegalArgumentException](ColBound("html", "=", "x"))
    intercept[IllegalArgumentException](ColBound("url", "<", "x"))
  }
}
