package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-22 A/B for the containment verification stage (VERDICT r21 #1):
  * the top analytic rows left on the board are llm_dedup_containment /
  * _indexed, whose cost is the exact-verification joins moving per-pair
  * gram arrays (~hundreds of MB at fixture, linear at scale) through one
  * exchange. Three shapes, all RESULT-IDENTICAL (asserted here by full
  * row comparison before any timing is trusted):
  *
  *   A (current)  cand ⋈ sets(doc_a) ⋈ sets(doc_b) — the doc_b join
  *                shuffles the gs_a-carrying intermediate: ONE array per
  *                pair + the set table twice through exchanges.
  *   B (skinny)   pair-explode → ONE set join → regroup by pair — the
  *                VERDICT-sketched shape: arrays attach once per
  *                (pair, side) but the regroup exchange then carries TWO
  *                arrays per pair.
  *   C (bcast)    both set joins broadcast the SET side — zero
  *                array-carrying exchange at fixture; only sound below a
  *                docCount cap (sets are corpus-sized at scale), i.e. the
  *                size-gated pattern ContainBroadcastDocCap already uses.
  *
  * Prints per-variant medians; plans dumped to plans/r22/contain_ab_*.txt.
  * Not part of the driver contract. */
object R22ContainAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.Scratch.resetKeep("spark_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.util.Scratch.wipeExcept(Set("spark_local")) catch { case _: Throwable => () }
    graft.llm.Warmup.indexes(spark, sfDir)

    val cand = graft.llm.DedupOps.rarePairs(
      graft.llm.DedupOps.rareGramGroups(spark, sfDir)).distinct()
    val sets = graft.llm.DedupOps.gramSets(spark, sfDir)

    def finish(withSets: DataFrame): DataFrame = withSets
      .withColumn("n_shared",
        size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
      .filter(greatest(col("n_shared") / col("n_a"),
        col("n_shared") / col("n_b")) >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        round(col("n_shared").cast("double") / col("n_a"), 4).as("cont_a"),
        round(col("n_shared").cast("double") / col("n_b"), 4).as("cont_b"))
      .orderBy("doc_a", "doc_b")

    def variantA(): DataFrame = finish(cand
      .join(sets.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
        col("n").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
        col("n").as("n_b")), Seq("doc_b")))

    def variantB(): DataFrame = {
      val skinny = cand
        .select(col("doc_a"), col("doc_b"), col("doc_a").as("doc_id"), lit(true).as("is_a"))
        .unionByName(cand
          .select(col("doc_a"), col("doc_b"), col("doc_b").as("doc_id"), lit(false).as("is_a")))
      val attached = skinny.join(sets, Seq("doc_id"))
      finish(attached.groupBy("doc_a", "doc_b").agg(
        first(when(col("is_a"), col("gs")), ignoreNulls = true).as("gs_a"),
        first(when(col("is_a"), col("n")), ignoreNulls = true).as("n_a"),
        first(when(!col("is_a"), col("gs")), ignoreNulls = true).as("gs_b"),
        first(when(!col("is_a"), col("n")), ignoreNulls = true).as("n_b")))
    }

    def variantC(): DataFrame = finish(cand
      .join(broadcast(sets.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
        col("n").as("n_a"))), Seq("doc_a"))
      .join(broadcast(sets.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
        col("n").as("n_b"))), Seq("doc_b")))

    // result identity FIRST (hash-insensitive full-row comparison)
    val a = variantA().collect().map(_.toString).toSeq
    val b = variantB().collect().map(_.toString).toSeq
    val c = variantC().collect().map(_.toString).toSeq
    require(a == b, s"variant B diverges: ${a.size} vs ${b.size} rows")
    require(a == c, s"variant C diverges: ${a.size} vs ${c.size} rows")
    println(s"[ab] result identity OK over ${a.size} rows")

    val planDir = new java.io.File("/root/repo/plans/r22"); planDir.mkdirs()
    def dump(tag: String, df: DataFrame): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/root/repo/plans/r22/contain_ab_$tag.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dump("A_current", variantA())
    dump("B_skinny", variantB())
    dump("C_bcast", variantC())

    def time(tag: String, mk: () => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(s"contain_ab:$tag")
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.sparkContext.setJobDescription(null)
      println(f"[ab] $tag%-10s median=${ts(ts.size / 2)}%6.3f  reps=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
    // interleave to spread regime drift fairly across variants
    (1 to 1).foreach { _ =>
      time("A_current", () => variantA())
      time("B_skinny", () => variantB())
      time("C_bcast", () => variantC())
    }
    // DIAGNOSTIC (timing-only, different result): variant A's join spine
    // without the array_intersect — splits A's cost into "move the arrays"
    // vs "intersect the arrays" so the next optimization (if any) targets
    // the measured side.
    def variantD(): DataFrame = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
        col("n").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
        col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(col("gs_a")) + size(col("gs_b"))).as("w"))
    time("D_joinsOnly", () => variantD())
    spark.stop()
  }
}
