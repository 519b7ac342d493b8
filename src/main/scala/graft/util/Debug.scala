package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc local profiling main (not part of the driver contract).
  * Round 8 focus: the indexed-consumer inversion — BENCH_r07 measured
  * llm_dedup_minhash_indexed at 9× the in-memory twin even with the
  * bucketed table warmed untimed. */
object Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def timedN(name: String, n: Int)(f: => Long): Unit =
      (1 to n).foreach(i => timed(s"$name #$i")(println(s"[debug]   rows=$f")))

    // Round 9 focus (SPARK_GRAFT_DEBUG=profile_twins): the band showed
    // agg_profile_approx (HLL buffers, no Expand) at 1.5× its EXACT twin
    // at sf0.1 — is that steady-state HLL update cost or first-run JIT?
    if (sys.env.get("SPARK_GRAFT_DEBUG").contains("profile_twins")) {
      timedN("table_profile (exact, Expand)", 4)(
        graft.analytics.Advanced.aggTableProfile(spark, sfDir).count())
      timedN("profile_approx (HLL, no Expand)", 4)(
        graft.analytics.Advanced.aggProfileApprox(spark, sfDir).count())
      timedN("table_profile again (order swap)", 2)(
        graft.analytics.Advanced.aggTableProfile(spark, sfDir).count())
      spark.stop()
      return
    }

    // Round 9 (SPARK_GRAFT_DEBUG=funnel_writes): steady-state cost of the
    // three ops whose partitioned writes gained the pmod spreader — the
    // band medians (pre-fix: dpp 1.64 / upsert_po 1.29 / orc 1.25) are
    // the comparison point.
    if (sys.env.get("SPARK_GRAFT_DEBUG").contains("funnel_writes")) {
      timedN("join_dpp_prune", 4)(
        graft.etl.Bucketing.joinDppPrune(spark, sfDir).count())
      timedN("upsert_partition_overwrite", 4)(
        graft.etl.Upsert.upsertPartitionOverwrite(spark, sfDir).count())
      timedN("sink_orc_roundtrip", 4)(
        graft.etl.Ingest.sinkOrcRoundtrip(spark, sfDir).count())
      spark.stop()
      return
    }

    // ---- warmup exactly like Bench does (untimed) ----
    timed("warmup indexes")(graft.llm.Warmup.indexes(spark, sfDir))

    // ---- the two consumers as benched ----
    timedN("minhash in-memory", 3)(graft.llm.DedupOps.llmDedupMinhash(spark, sfDir).count())
    timedN("minhash indexed (as shipped: merge hint)", 3)(
      graft.llm.DedupOps.llmDedupMinhashIndexed(spark, sfDir).count())

    // ---- where does indexed time go? ----
    val tbl = graft.llm.DedupOps.sigTable(spark, sfDir)
    val idx = spark.table(tbl)
    timedN("sig table bare scan", 2)(idx.count())

    def pairs(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, Seq("band", "bhash"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("est",
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), m -> m))") / lit(32.0))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared_bands"),
          round(first(col("est")), 4).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
    val a = idx.withColumnsRenamed(Map("doc_id" -> "doc_a", "sig" -> "sig_a"))
    val b = idx.withColumnsRenamed(Map("doc_id" -> "doc_b", "sig" -> "sig_b"))
    timedN("indexed join, merge hint", 3)(pairs(a.hint("merge"), b).count())
    timedN("indexed join, no hint", 3)(pairs(a, b).count())
    timedN("indexed join, shuffle_hash hint", 3)(pairs(a.hint("shuffle_hash"), b).count())

    // ---- simhash pair ----
    timedN("simhash in-memory", 3)(graft.llm.DedupOps.llmDedupSimhash(spark, sfDir).count())
    timedN("simhash indexed (as shipped)", 3)(
      graft.llm.DedupOps.llmDedupSimhashIndexed(spark, sfDir).count())
    timedN("sim table bare scan", 2)(
      spark.table(graft.llm.DedupOps.simTable(spark, sfDir)).count())

    println("[debug] ---- plan: merge hint ----")
    println(pairs(a.hint("merge"), b).queryExecution.executedPlan.toString.take(4000))
    println("[debug] ---- plan: no hint ----")
    println(pairs(a, b).queryExecution.executedPlan.toString.take(4000))

    spark.stop()
  }
}
