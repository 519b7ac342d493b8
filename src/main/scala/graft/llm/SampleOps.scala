package graft.llm

import org.apache.spark.sql.functions._
import graft.QFn
import graft.tables.Tables

/** SURVEY.md §2.10 extension — corpus sampling for training-data mixes.
  * Rebalancing a multilingual corpus ("cap en at 25%, keep all zh") is a
  * per-stratum Bernoulli sample; at 100 TB it must be a stateless per-row
  * decision — no counters, no shuffle, reproducible across retries. The
  * hash-threshold rule here gives exactly that: keep iff
  * (doc_id mod 100) < quota(lang). The quota map is shared between the
  * plan and the DuckDB oracle (the TextOps.markerWords pattern).
  */
object SampleOps {

  /** Percent quota per language stratum. */
  val quotas: Seq[(String, Int)] =
    Seq("en" -> 25, "de" -> 50, "es" -> 50, "fr" -> 75, "zh" -> 100)

  /** Stratified sample: deterministic per-language downsampling. Output is
    * the surviving rows plus their stratum quota, so the oracle hash pins
    * the exact membership, not just counts. */
  val llmSampleStratified: QFn = (spark, sfDir) => {
    val quota = quotas.tail.foldLeft(
      when(col("lang") === quotas.head._1, quotas.head._2)) {
      case (acc, (l, q)) => acc.when(col("lang") === l, q)
    }.otherwise(0)
    Tables(spark, sfDir, "documents")
      .withColumn("quota_pct", quota)
      .filter(pmod(col("doc_id"), lit(100)) < col("quota_pct"))
      .select("doc_id", "lang", "quota_pct", "n_chars")
      .orderBy("doc_id")
  }

  val queries: Map[String, QFn] = Map(
    "llm_sample_stratified" -> llmSampleStratified,
  )

  private def quotaCaseSql: String =
    "CASE lang " + quotas.map { case (l, q) => s"WHEN '$l' THEN $q" }
      .mkString(" ") + " ELSE 0 END"

  val oracleSql: Map[String, String] = Map(
    "llm_sample_stratified" ->
      (s"SELECT doc_id, lang, CAST($quotaCaseSql AS INT) AS quota_pct, n_chars " +
        s"FROM documents WHERE doc_id % 100 < $quotaCaseSql ORDER BY doc_id"),
  )
}
