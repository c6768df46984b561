package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The driver parses the LAST stdout line of graft.Bench and keeps only
  * the final ~2000 chars of output — the canonical line must fit under
  * 1900 chars at any realistic query count while staying strict JSON.
  * These tests pin the degrade ladder's guarantees without a Spark
  * session (canonicalLine is a pure function of the results).
  */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** 80 names with the repo's real shape/length distribution. */
  private def names80: Seq[String] = {
    val fams = Seq("dedup", "text", "events", "corpus", "stream", "ann", "mm", "cc")
    val ops = Seq("jaccard_capped", "minhash_fast", "retention", "components",
      "fingerprint", "window", "topk", "resize", "quantiles", "boilerplate")
    (for (f <- fams; o <- ops) yield s"ext_${f}_$o").distinct.take(80)
  }

  test("80 queries: canonical line fits 1900 chars, parses, keeps 80 distinct per-query values") {
    val results = names80.zipWithIndex.map { case (n, i) =>
      (n, 2.0 + i * 0.01, 1.0 + i * 0.01, true)
    }
    val line = Bench.canonicalLine(results, "/root/testdata/sf0.1")
    assert(line.length <= 1900, s"line is ${line.length} chars")
    val root = mapper.readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("value").asDouble() > 0)
    val qs = root.get("queries")
    assert(qs.size() == 80, s"per-query map degraded to ${qs.size()} entries")
    // abbreviation must stay injective — 80 distinct keys
    val keys = {
      val it = qs.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(keys.distinct.size == 80)
    assert(root.get("errors").size() == 0)
  }

  test("current registry: per-query values survive (full or abbreviated)") {
    // the REAL names. The registry outgrew the full-name tier at 81
    // queries (the ladder's design case, not a failure): the line must
    // stay parseable under 1900 chars while KEEPING one value per query
    // — on whichever tier (full names or abbrev keys) fits
    val names = SparkEntry.queries.keys.toSeq.sorted
    // realistic-width values (6-char warm, e.g. "12.340") so the fit
    // proof holds for real benches, not just 5-char dummies
    val results = names.map(n => (n, 102.34, 12.34, true))
    val line = Bench.canonicalLine(results, "/root/testdata/sf0.1")
    assert(line.length <= 1900, s"line is ${line.length} chars at ${names.size} queries")
    val qs = mapper.readTree(line).get("queries")
    assert(qs.size() == names.size,
      s"per-query map degraded to ${qs.size()} of ${names.size} entries")
  }

  test("pathological failure: every query errored still yields a short, parseable line") {
    val results = names80.map(n => (n, 2.0, 1.0, false))
    val line = Bench.canonicalLine(results, "/root/testdata/sf0.1")
    assert(line.length <= 1900)
    val root = mapper.readTree(line)
    assert(root.get("errors").size() >= 1) // list or collapsed count
  }

  test("abbrev is deterministic and injective on colliding prefixes") {
    // jaccard/jacket abbreviate identically ("extdeja") pre-suffix
    val ns = Seq("ext_dedup_jaccard", "ext_dedup_jacket",
      "ext_dedup_jaccard_capped", "q01_denorm_joins")
    val a = Bench.abbrev(ns)
    assert(a.values.toSeq.distinct.size == ns.size)
    assert(a == Bench.abbrev(ns.reverse), "must not depend on input order")
  }
}
