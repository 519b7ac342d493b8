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
