package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: oracle keys ⊆ query keys, flagship entry
  * returns rows, positional-bind trap behaves as documented. */
class ContractSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("every queries key has an oracle or sits on the documented no-oracle allowlist") {
    // The driver's correctness gate downgrades oracle-less operators to a
    // rows-only check — acceptable ONLY for hash/sketch-based semantics
    // that ANSI SQL cannot replay, each carrying a named ground-truth
    // spec. This list is the exhaustive set of such waivers; a new
    // operator landing without an oracle must either get one or be added
    // here WITH its spec, never silently.
    val waived = Map(
      "agg_hll_mergeable" -> "ApproxSpec",
      "agg_percentile_approx" -> "ApproxSpec",
      "agg_profile_approx" -> "ApproxSpec",
      "llm_dedup_minhash" -> "NearDupSpec",
      "llm_dedup_minhash_indexed" -> "NearDupSpec (byte-equality vs in-memory)",
      "llm_sig_index_build" -> "NearDupSpec (profile equality)",
      "llm_dedup_simhash" -> "FingerprintSpec",
      "llm_sim_index_build" -> "FingerprintSpec (profile vs index fold)",
      "llm_dedup_simhash_indexed" -> "FingerprintSpec (byte-equality vs in-memory)",
      "llm_fingerprint" -> "FingerprintSpec",
      "llm_similarity_ivf" -> "SimilaritySpec",
    )
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unexplained = unoracled -- waived.keySet
    assert(unexplained.isEmpty,
      s"operators with neither oracle nor documented ground-truth spec: $unexplained")
    val stale = waived.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"waivers for nonexistent operators: $stale")
    val shadowed = waived.keySet.intersect(SparkEntry.oracleSql.keySet)
    assert(shadowed.isEmpty, s"waived operators that now HAVE oracles (drop the waiver): $shadowed")
  }

  test("query names are unique across modules") {
    val all = Seq(
      graft.etl.Ingest.queries, graft.etl.Transforms.queries,
      graft.etl.Upsert.queries, graft.etl.Bucketing.queries,
      graft.analytics.Queries.queries,
      graft.analytics.Temporal.queries, graft.analytics.Advanced.queries,
      graft.streaming.StreamOps.queries, graft.llm.TextOps.queries,
      graft.llm.DedupOps.queries, graft.llm.SimilarityOps.queries,
      graft.llm.MultimodalOps.queries, graft.llm.SampleOps.queries)
    assert(all.map(_.size).sum == SparkEntry.queries.size, "duplicate query keys across modules")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("positional bind: aligned source round-trips; misaligned renames") {
    import org.apache.spark.sql.functions.col
    val cust = graft.tables.Tables(spark, sfDir, "customer")
    val target = cust.schema.fieldNames.toSeq
    val aligned = graft.etl.Ingest.insertPositional(cust, target)
    assert(aligned.schema.fieldNames.toSeq == target)
    // misaligned source: c_name lands under c_custkey — the documented trap
    val shuffled = cust.select("c_name", "c_custkey", "c_nationkey",
      "c_acctbal", "c_mktsegment")
    val bad = graft.etl.Ingest.insertPositional(shuffled, target)
    assert(bad.schema.fieldNames.toSeq == target)
    assert(bad.schema("c_custkey").dataType.typeName == "string")
  }
}
