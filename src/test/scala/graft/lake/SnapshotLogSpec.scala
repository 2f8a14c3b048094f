package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function vectors for the manifest stats encoding: the JSON
  * escape/parse round trip must survive hostile strings (quotes,
  * backslashes, control chars — all legal in real-crawl urls), and the
  * pruning predicate must stay conservative on non-ASCII and unknown
  * bounds. */
class SnapshotLogSpec extends AnyFunSuite {

  private def roundTrip(stats: Map[Int, BucketStats]): Map[Int, BucketStats] = {
    val json = stats.toVector.sortBy(_._1).map { case (b, s) =>
      s""""$b":{"url_min":"${SnapshotLog.esc(s.urlMin)}","url_max":"${SnapshotLog.esc(s.urlMax)}",""" +
        s""""lang_min":"${SnapshotLog.esc(s.langMin)}","lang_max":"${SnapshotLog.esc(s.langMax)}",""" +
        s""""ts_min":"${SnapshotLog.esc(s.tsMin)}","ts_max":"${SnapshotLog.esc(s.tsMax)}"}"""
    }.mkString("""{"version":9,"buckets":[0],"stats":{""", ",", "}}")
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
