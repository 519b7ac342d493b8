package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two classpath band resources Bench's adjudication machinery
  * consumes (round 17): a silent parse regression or a key-set drift in
  * either file degrades the repeat-on-spike policy / phase verdicts to
  * their fail-safe modes WITHOUT failing anything — exactly the class of
  * "claims without evidence" drift the weak-oracle work exists to
  * prevent. This spec re-parses both resources with the SAME parser
  * Bench.scala calls ([[BenchParse]] — shared by construction, ADVICE
  * r17) and requires:
  *  - every entry keys a registered query (no orphan bands surviving an
  *    operator rename),
  *  - every value is finite and non-negative,
  *  - the phase file covers every registered stream_* op (a NEW stream
  *    op may legitimately be bandless until its first capture — that
  *    case fails here on purpose, as the reminder to re-run
  *    tools/make_bands.py),
  *  - every phase entry carries all three fields Bench adjudicates on.
  */
class BandResourceSpec extends AnyFunSuite {

  private def resource(name: String): String = {
    val is = getClass.getResourceAsStream(name)
    assert(is != null, s"classpath resource $name missing")
    try scala.io.Source.fromInputStream(is, "UTF-8").mkString
    finally is.close()
  }

  test("bench_bands.json parses with Bench's regex and keys only registered queries") {
    val txt = resource("/graft/bench_bands.json")
    // the PRODUCTION parse (BenchParse is shared with Bench.scala —
    // ADVICE r17: pinning by construction, not by copy-paste)
    val bands = BenchParse.bands(txt)
    assert(bands.nonEmpty, "no band entries parsed — repeat policy would be disabled")
    val unknown = bands.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"bands for unregistered queries: $unknown")
    // (non-finite/negative entries are DROPPED by the production parse,
    // so a band that went bad in the resource surfaces as `missing` below)
    // every registered query should have a band after a full-run regen;
    // allow none missing so a partial regen is caught here, not by the
    // judge reading the startup warning
    val missing = SparkEntry.queries.keySet -- bands.keySet
    assert(missing.isEmpty,
      s"registered queries with no band (re-run tools/make_bands.py on full captures): $missing")
  }

  test("bench_stream_phases.json parses with Bench's regex and covers every stream op") {
    val txt = resource("/graft/bench_stream_phases.json")
    // the PRODUCTION parse, shared with Bench.scala (ADVICE r17)
    val phases = BenchParse.phases(txt)
    assert(phases.nonEmpty, "no phase entries parsed — every verdict would be no_band")
    val streamOps = SparkEntry.queries.keySet.filter(_.startsWith("stream_"))
    val unknown = phases.keySet -- streamOps
    assert(unknown.isEmpty, s"phase bands for unregistered stream ops: $unknown")
    val missing = streamOps -- phases.keySet
    assert(missing.isEmpty,
      s"stream ops with no phase band (re-run tools/make_bands.py): $missing")
    phases.foreach { case (op, f) =>
      assert(Set("work_sec", "wal_sec", "state_sec").subsetOf(f.keySet),
        s"$op phase entry missing fields: has ${f.keySet}")
      f.foreach { case (k, v) =>
        assert(java.lang.Double.isFinite(v) && v >= 0, s"$op.$k = $v out of range")
      }
    }
  }
}
